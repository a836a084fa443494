"""Empirical scale sweep of the IVFADC composition (r9 follow-on to the
r7/r8 LSH sweep in ann_scale_sweep.py).

`ivfpq_adc_topk` prunes the ADC scan to each query's `nprobe` nearest IVF
cells, so scored-pair volume should track n_queries * n * nprobe/n_cells
(for a trained, roughly balanced coarse quantizer) instead of
n_queries * n. This sweep builds the same deterministic synthetic corpus
as the LSH sweep (sin-hash vectors + one planted near-dup per 10 base
rows), TRAINS the codebooks and centroids on it (the production path —
training cost is sample-capped, corpus-size independent), runs the search
at n and K*n, and checks:

  1. planted recall: a query's near-duplicate encodes into the SAME cell
     almost surely (its vector is within 1e-4 per component), so cell
     pruning must not lose it — ivfpq planted-in-top-k >= 0.95x what the
     FLAT ADC scan finds on the identical codebooks;
  2. pruning-loss bound: RANK-1 agreement with the flat ADC scan
     >= 0.9 — IVF promises the HEAD survives when its cell is probed.
     (Full top-k overlap is reported but deliberately NOT bounded: on a
     near-uniform synthetic corpus every non-planted vector is almost
     equidistant from every query, so the flat scan's tail ranks are
     arbitrary near-ties that cell pruning legitimately swaps — a tail
     bound would measure the corpus, not the operator.);
  3. scored-pair volume: measured candidate pairs (cells joined per
     query) stay within 4x of the balanced-cell analytic prediction —
     a degenerate quantizer (all rows in one cell) blows through this;
  4. plan shape AT THE LARGE SIZE: the candidate join is a broadcast
     EQUI join on ivf_cell — no BroadcastNestedLoop / CartesianProduct
     (the flat scan's shape);
  5. wall factor: bounded by scored-volume growth times a cushion.

Usage: python tools/ivfpq_scale_sweep.py [n_base] [K]
Prints one JSON line; exits non-zero on any violated bound.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ann_scale_sweep import make_corpus  # noqa: E402  (same synthetic corpus)

M, KSUB, N_CELLS, NPROBE, TOPK = 8, 16, 32, 4, 5


def sweep(n_base: int, k: int) -> dict:
    from pyspark.sql import functions as F

    from glamr_omics_pipelines_spark.session import get_spark
    from glamr_omics_pipelines_spark.operators import similarity

    spark = get_spark("ivfpq-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_base": n_base, "k": k,
                 "m": M, "ksub": KSUB, "n_cells": N_CELLS,
                 "nprobe": NPROBE, "topk": TOPK}
    results = {}
    for label, n in (("small", n_base), ("large", n_base * k)):
        corpus = make_corpus(spark, n).persist()
        n_rows = corpus.count()
        books = similarity.train_pq_codebooks(corpus, "embedding", m=M,
                                              k=KSUB)
        cents = similarity.train_ivf_centroids(corpus, "embedding",
                                               k=N_CELLS)
        queries = (corpus.filter((F.col("vec_id") % 10 == 0)
                                 & (F.col("vec_id") < 500))
                   .select(F.col("vec_id").alias("query_id"), "embedding"))
        n_q = queries.count()
        idx = similarity.ivfpq_encode(corpus, "vec_id", "embedding",
                                      books, cents).persist()
        idx.count()
        got = similarity.ivfpq_adc_topk(idx, queries, books, cents,
                                        k=TOPK, nprobe=NPROBE)
        plan = got._jdf.queryExecution().executedPlan().toString()
        t0 = time.perf_counter()
        rows = got.collect()
        wall = time.perf_counter() - t0
        # scored-pair volume: per query, the total occupancy of its
        # probed cells (metadata-scale join: n_cells x n_q rows)
        cell_sizes = idx.groupBy("ivf_cell").count()
        probes = queries.select(
            "query_id", F.explode(F.expr(similarity._nearest_cells_expr(
                "embedding", cents, NPROBE)).cast("array<int>"))
            .alias("ivf_cell"))
        scored = (probes.join(cell_sizes, "ivf_cell")
                  .agg(F.sum("count")).collect()[0][0])
        analytic = n_q * n_rows * NPROBE / N_CELLS
        # flat ADC baseline on the identical codebooks
        codes = similarity.pq_encode(corpus, "vec_id", "embedding", books)
        flat = similarity.pq_adc_topk(codes, queries, books,
                                      k=TOPK).collect()
        corpus.unpersist()
        idx.unpersist()

        def planted(rs):
            return len({r.query_id for r in rs
                        if r.neighbor_id == r.query_id + 10_000_000})

        got_set = {(r.query_id, r.neighbor_id) for r in rows}
        flat_set = {(r.query_id, r.neighbor_id) for r in flat}
        got_r1 = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
        flat_r1 = {r.query_id: r.neighbor_id for r in flat if r.rank == 1}
        r1_agree = (sum(1 for q, nb in flat_r1.items()
                        if got_r1.get(q) == nb) / max(len(flat_r1), 1))
        results[label] = {
            "rows": n_rows, "queries": n_q,
            "scored_pairs": int(scored),
            "analytic_pairs": round(analytic),
            "wall_sec": round(wall, 3),
            "planted_ivfpq": planted(rows),
            "planted_flat": planted(flat),
            "overlap_vs_flat": round(len(got_set & flat_set)
                                     / max(len(flat_set), 1), 4),
            "rank1_agreement": round(r1_agree, 4),
            "bnlj_in_plan": ("BroadcastNestedLoop" in plan
                             or "CartesianProduct" in plan),
            "bhj_in_plan": "BroadcastHashJoin" in plan,
        }
    out["results"] = results
    s, l = results["small"], results["large"]
    vol_growth = l["scored_pairs"] / max(s["scored_pairs"], 1)
    out["wall_factor"] = round(l["wall_sec"] / max(s["wall_sec"], 1e-9), 2)
    out["volume_growth"] = round(vol_growth, 2)
    out["wall_bound"] = round(max(2 * k, vol_growth * 3), 2)
    violations = []
    for label, r in results.items():
        if r["planted_ivfpq"] < 0.95 * r["planted_flat"]:
            violations.append(
                f"{label}: cell pruning lost planted dups "
                f"({r['planted_ivfpq']} vs flat {r['planted_flat']})")
        if r["rank1_agreement"] < 0.9:
            violations.append(f"{label}: rank-1 agreement vs flat "
                              f"{r['rank1_agreement']} < 0.9")
        if r["scored_pairs"] > 4 * r["analytic_pairs"]:
            violations.append(f"{label}: scored pairs {r['scored_pairs']} "
                              f"> 4x analytic {r['analytic_pairs']}")
        if r["bnlj_in_plan"] or not r["bhj_in_plan"]:
            violations.append(f"{label}: candidate join is not a "
                              f"broadcast equi join")
    if out["wall_factor"] > out["wall_bound"]:
        violations.append(f"wall factor {out['wall_factor']} > bound "
                          f"{out['wall_bound']}")
    out["violations"] = violations
    spark.stop()
    return out


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out = sweep(n_base, k)
    print(json.dumps(out))
    return 1 if out["violations"] else 0


if __name__ == "__main__":
    sys.exit(main())
