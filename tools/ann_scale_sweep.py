"""Empirical scale sweep of the gated ANN pair generator (VERDICT r7 #6).

`lsh_candidate_pairs` is the DEFAULT pair source above
`_BRUTE_PAIRGEN_MAX_ROWS`, and its cost is bucket-occupancy dependent:
per table the self-join emits ~sum_buckets C(occ, 2) candidate pairs, so
for n roughly-uniform vectors over 2^b buckets the background candidate
count grows ~ L * n^2 / 2^b — quadratic in n but divided by the bucket
count, and the PLANTED near-duplicate pairs grow linearly. This sweep
builds a synthetic corpus (deterministic pseudo-random unit-ish vectors +
one planted near-dup per 10 base rows), runs the generator at n and K*n,
and checks:

  1. recall: every planted pair is found at the shape
     `lsh_params_for_threshold(0.999)` picks (analytic recall 0.958);
  2. candidate volume: measured candidates stay within 4x of the analytic
     background+planted prediction (degenerate bucketing — e.g. all rows
     hashing to one bucket — would blow straight through this);
  3. plan shape AT THE LARGE SIZE: the candidate join is an equi join on
     (lsh_table, lsh_bucket) — no BroadcastNestedLoop / CartesianProduct;
  4. wall factor: bounded by the candidate-volume growth times a cushion
     (the honest bound for a bucket-quadratic operator — a flat 2K gate
     would misread candidate DATA growth as a plan defect).

Usage: python tools/ann_scale_sweep.py [n_base] [K]
Prints one JSON line; exits non-zero on any violated bound.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(spark, n_base: int, dim: int = 64, dup_every: int = 10):
    """Deterministic synthetic embeddings: base vectors via a sin-hash
    (row-local, no driver data), plus a slightly-perturbed near-dup of
    every `dup_every`-th base row at vec_id + 10_000_000."""
    from pyspark.sql import functions as F
    base = spark.range(n_base).select(
        F.col("id").alias("vec_id"),
        F.expr(f"transform(sequence(0, {dim - 1}), j -> "
               "sin((id * 64 + j + 1) * 12.9898D) * 43758.5453D - "
               "floor(sin((id * 64 + j + 1) * 12.9898D) * 43758.5453D) "
               "- 0.5D)").alias("embedding"))
    dups = (base.filter(F.col("vec_id") % dup_every == 0)
            .select((F.col("vec_id") + 10_000_000).alias("vec_id"),
                    F.expr("transform(embedding, x -> x + 0.0001D)")
                    .alias("embedding")))
    return base.unionByName(dups)


def expected_candidates(n: int, num_planes: int, num_tables: int,
                        n_planted: int) -> float:
    """Analytic candidate-count prediction: planted near-dups (linear)
    plus background collisions if sign-buckets were uniform —
    L * C(n,2) / 2^b. Real vectors are not uniform over sign patterns,
    hence the 4x cushion at the call site."""
    background = num_tables * (n * (n - 1) / 2) / (2 ** num_planes)
    return background + n_planted


def sweep(n_base: int, k: int) -> dict:
    from glamr_omics_pipelines_spark.session import get_spark
    from glamr_omics_pipelines_spark.operators import similarity

    spark = get_spark("ann-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    params = similarity.lsh_params_for_threshold(0.999)

    out: dict = {"n_base": n_base, "k": k, "params": params,
                 "analytic_recall":
                     round(similarity.lsh_candidate_recall(0.999, **params),
                           4)}
    results = {}
    for label, n in (("small", n_base), ("large", n_base * k)):
        corpus = make_corpus(spark, n).persist()
        n_rows = corpus.count()                      # materialize
        n_planted = n // 10
        pairs = similarity.lsh_candidate_pairs(corpus, "vec_id",
                                               "embedding", **params)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        t0 = time.perf_counter()
        n_cand = pairs.count()
        wall = time.perf_counter() - t0
        # planted recall: candidate set must contain (i, i+10M) pairs
        from pyspark.sql import functions as F
        found = (pairs.filter(F.col("id_b") == F.col("id_a") + 10_000_000)
                 .count())
        corpus.unpersist()
        results[label] = {
            "rows": n_rows, "candidates": n_cand, "wall_sec": round(wall, 3),
            "planted": n_planted, "planted_found": found,
            "expected_candidates": round(expected_candidates(
                n_rows, params["num_planes"], params["num_tables"],
                n_planted)),
            "bnlj_in_plan": ("BroadcastNestedLoop" in plan
                             or "CartesianProduct" in plan),
        }
    out["results"] = results
    s, l = results["small"], results["large"]
    cand_growth = l["candidates"] / max(s["candidates"], 1)
    out["wall_factor"] = round(l["wall_sec"] / max(s["wall_sec"], 1e-9), 2)
    out["candidate_growth"] = round(cand_growth, 2)
    # the honest bound: wall tracks candidate volume (bucket-quadratic),
    # never worse than volume growth x cushion, and never superquadratic
    out["wall_bound"] = round(max(2 * k, cand_growth * 3), 2)
    violations = []
    for label, r in results.items():
        if r["planted_found"] < math.floor(0.95 * r["planted"] * 0.958):
            violations.append(f"{label}: planted recall "
                              f"{r['planted_found']}/{r['planted']}")
        if r["candidates"] > 4 * r["expected_candidates"]:
            violations.append(f"{label}: candidates {r['candidates']} "
                              f"> 4x analytic {r['expected_candidates']}")
        if r["bnlj_in_plan"]:
            violations.append(f"{label}: non-equi join in plan")
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
