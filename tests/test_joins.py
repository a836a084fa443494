"""as-of join + binned range join: semantics vs naive reference plans, and
the physical-plan properties that make them scale (one exchange, no
nested-loop non-equi join)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from glamr_omics_pipelines_spark.operators import joins  # noqa: E402


def _quotes(spark):
    # (key, ts, id, px) — two symbols, interleaved timelines
    rows = [("A", 1, 10, 1.0), ("A", 3, 11, 2.0), ("A", 3, 12, 3.0),
            ("A", 9, 13, 4.0), ("B", 5, 20, 9.0)]
    return spark.createDataFrame(rows, "sym string, ts long, qid long, px double")


def _trades(spark):
    rows = [("A", 0, 100), ("A", 3, 101), ("A", 4, 102), ("A", 20, 103),
            ("B", 5, 200), ("B", 4, 201), ("C", 7, 300)]
    return spark.createDataFrame(rows, "sym string, ts long, tid long")


def test_asof_backward_semantics(spark):
    out = joins.asof_join(_trades(spark), _quotes(spark), on=["sym"],
                          left_ts="ts", right_ts="ts", tiebreak="qid").collect()
    got = {r.tid: (r.right_qid, r.right_px) for r in out}
    assert len(got) == 7
    assert got[100] == (None, None)          # before any quote
    assert got[101] == (12, 3.0)             # equal-ts match, max-qid tiebreak
    assert got[102] == (12, 3.0)
    assert got[103] == (13, 4.0)
    assert got[200] == (20, 9.0)             # at-or-before includes equal ts
    assert got[201] == (None, None)
    assert got[300] == (None, None)          # key with no right rows at all


def test_asof_forward_and_tolerance(spark):
    fwd = joins.asof_join(_trades(spark), _quotes(spark), on=["sym"],
                          left_ts="ts", right_ts="ts", tiebreak="qid",
                          direction="forward").collect()
    got = {r.tid: r.right_qid for r in fwd}
    assert got[100] == 10 and got[101] == 11  # min-qid tiebreak going forward
    assert got[102] == 13 and got[103] is None
    tol = joins.asof_join(_trades(spark), _quotes(spark), on=["sym"],
                          left_ts="ts", right_ts="ts", tiebreak="qid",
                          tolerance=1).collect()
    got = {r.tid: r.right_qid for r in tol}
    assert got[102] == 12 and got[103] is None  # |4-3|<=1 in, |20-9|>1 out


def test_asof_single_exchange(spark):
    """The union-merge as-of is ONE hash exchange (plus the final window sort)
    — no join operator at all in the plan."""
    out = joins.asof_join(_trades(spark), _quotes(spark), on=["sym"],
                          left_ts="ts", right_ts="ts", tiebreak="qid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("SortMergeJoin", "BroadcastNestedLoop", "CartesianProduct"):
        assert bad not in plan


def test_range_join_matches_naive(spark):
    ev = (spark.range(0, 500)
          .select((F.col("id") % 7).alias("k"),
                  (F.col("id") * 37 % 1000).alias("pos"),
                  F.col("id").alias("pid")))
    iv = (spark.range(0, 40)
          .select((F.col("id") % 7).alias("k"),
                  (F.col("id") * 53 % 900).alias("lo"),
                  (F.col("id") * 53 % 900 + 120).alias("hi"),
                  F.col("id").alias("iid")))
    got = joins.range_join_binned(ev, iv, keys=["k"], point_col="pos",
                                  start_col="lo", end_col="hi", bin_width=100)
    naive = ev.join(iv, "k").filter(F.col("pos").between(F.col("lo"), F.col("hi")))
    g = {(r.pid, r.iid) for r in got.collect()}
    n = {(r.pid, r.iid) for r in naive.collect()}
    assert g == n and len(g) > 0


def test_range_join_is_equi_join(spark):
    """Binning must turn BETWEEN into an equi join — a nested-loop plan here
    is the exact failure mode the operator exists to avoid."""
    ev = spark.range(0, 100).select((F.col("id") % 3).alias("k"),
                                    F.col("id").alias("pos"))
    iv = spark.range(0, 10).select((F.col("id") % 3).alias("k"),
                                   (F.col("id") * 9).alias("lo"),
                                   (F.col("id") * 9 + 5).alias("hi"))
    out = joins.range_join_binned(ev, iv, keys=["k"], point_col="pos",
                                  start_col="lo", end_col="hi", bin_width=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) \
        or ("ShuffledHashJoin" in plan)


def test_top1_by_agg_matches_window(spark):
    from glamr_omics_pipelines_spark.operators import windows
    import pyspark.sql.functions as FF
    df = (spark.range(0, 3000)
          .select((FF.col("id") % 97).alias("g"),
                  (FF.col("id") * 31 % 1000).cast("double").alias("score"),
                  FF.col("id").alias("rid")))
    via_agg = windows.top1_by_agg(df, ["g"],
                                  order=[("score", False), ("rid", True)],
                                  payload=["rid", "score"])
    via_win = windows.top1_per_group(
        df, ["g"], [FF.col("score").desc(), FF.col("rid").asc()])
    a = {(r.g, r.rid, r.score) for r in via_agg.collect()}
    w = {(r.g, r.rid, r.score) for r in via_win.collect()}
    assert a == w and len(a) == 97
    plan = via_agg._jdf.queryExecution().executedPlan().toString()
    # struct-min lowers to SortAggregate (sort by GROUP KEY only) — the win
    # over row_number is map-side combine: one row per group crosses the
    # shuffle instead of every row. No Window/full-order sort allowed.
    assert "Window" not in plan
    assert "SortAggregate" in plan


def test_asof_null_keys_match_nothing(spark):
    """SQL equi-join semantics: NULL keys never match (window partitioning
    would otherwise happily pair null-keyed rows)."""
    left = spark.createDataFrame([(None, 5, 1), ("A", 5, 2)],
                                 "sym string, ts long, tid long")
    right = spark.createDataFrame([(None, 1, 10, 1.0), ("A", 1, 11, 2.0)],
                                  "sym string, ts long, qid long, px double")
    out = joins.asof_join(left, right, on=["sym"], left_ts="ts",
                          right_ts="ts", tiebreak="qid").collect()
    got = {r.tid: r.right_qid for r in out}
    assert got[1] is None      # null-keyed left row kept, but matches nothing
    assert got[2] == 11


def test_top1_by_agg_descending_timestamp(spark):
    from glamr_omics_pipelines_spark.operators import windows
    df = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1), ("a", "2024-01-02 09:00:00", 2),
         ("b", "2024-01-01 00:00:00", 3)],
        "g string, ts string, rid long").withColumn("ts", F.to_timestamp("ts"))
    out = windows.top1_by_agg(df, ["g"], order=[("ts", False), ("rid", True)],
                              payload=["rid"])
    got = {r.g: r.rid for r in out.collect()}
    assert got == {"a": 2, "b": 3}   # newest-per-group (W4 shape)


def test_asof_matches_naive_random(spark):
    """Randomized (seeded) equivalence: union-merge as-of == the naive
    join + argmax formulation, including ties and no-match keys."""
    import random
    rng = random.Random(7)
    left = [(rng.randrange(6), rng.randrange(50), i) for i in range(300)]
    right = [(rng.randrange(8), rng.randrange(50), 1000 + i,
              float(rng.randrange(100))) for i in range(200)]
    l = spark.createDataFrame(left, "k long, ts long, lid long")
    r = spark.createDataFrame(right, "k long, ts long, rid long, v double")
    out = {r_.lid: r_.right_rid for r_ in joins.asof_join(
        l, r, on=["k"], left_ts="ts", right_ts="ts", tiebreak="rid").collect()}
    # naive: per left row the max (ts, rid) among right rows at-or-before
    naive = {}
    for k, ts, lid in left:
        cands = [(rt, rid) for (rk, rt, rid, _) in right if rk == k and rt <= ts]
        naive[lid] = max(cands)[1] if cands else None
    assert out == naive


def test_tie_discard_agg_matches_window(spark):
    from glamr_omics_pipelines_spark.operators import windows
    import random
    rng = random.Random(11)
    rows = [(rng.randrange(40), float(rng.randrange(6)), i)
            for i in range(600)]
    df = spark.createDataFrame(rows, "g long, score double, rid long")
    via_win = windows.tie_discard_top1(df, ["g"], "score")
    via_agg = windows.tie_discard_top1_agg(df, ["g"], "score",
                                           payload=["rid"], tiebreak="rid")
    w = {(r.g, r.score, r.rid) for r in via_win.collect()}
    a = {(r.g, r.score, r.rid) for r in via_agg.collect()}
    assert w == a and 0 < len(a) < 40   # some groups tie-discarded
    plan = via_agg._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_interval_join_binned_overlaps(spark):
    """Overlap semantics incl. cross-bin spans: each overlapping pair appears
    EXACTLY once (first-shared-bin dedup), non-overlaps never."""
    from glamr_omics_pipelines_spark.operators import joins
    left = spark.createDataFrame(
        [("u1", 1, 0, 100),      # overlaps r1 (50..150) and r2 (90..95)
         ("u1", 2, 200, 300),    # overlaps nothing
         ("u1", 3, 0, 1000),     # wide: spans many bins; overlaps r1, r2, r3
         ("u2", 4, 0, 100)],     # same span, different key -> no match
        ["user", "lid", "l_start", "l_end"])
    right = spark.createDataFrame(
        [("u1", 1, 50, 150), ("u1", 2, 90, 95), ("u1", 3, 900, 1200)],
        ["user", "rid", "r_start", "r_end"])
    out = joins.interval_join_binned(left, right, ["user"],
                                     "l_start", "l_end", "r_start", "r_end",
                                     bin_width=64)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert got == [(1, 1), (1, 2), (3, 1), (3, 2), (3, 3)]


def test_geo_neighbor_pairs_basic(spark):
    from glamr_omics_pipelines_spark.operators.joins import geo_neighbor_pairs
    # Hancock-ish cluster: b is ~1.1 km east of a; c is ~157 km away.
    df = spark.createDataFrame([
        (1, 47.0, -88.50),
        (2, 47.0, -88.4855),   # ~1.1 km from 1
        (3, 47.0, -86.43),     # far
    ], ["sample_id", "lat", "lon"])
    out = geo_neighbor_pairs(df, "sample_id", radius_km=2.0).collect()
    pairs = {(r["id_a"], r["id_b"]): r["dist_km"] for r in out}
    assert set(pairs) == {(1, 2)}
    assert 1.0 < pairs[(1, 2)] < 1.3


def test_geo_neighbor_pairs_cross_cell_no_dups(spark):
    from glamr_omics_pipelines_spark.operators.joins import geo_neighbor_pairs
    # radius 5 km -> lat cell 0.045°; points straddle a cell boundary and
    # must still pair, exactly once.
    df = spark.createDataFrame([
        (1, 44.9999, -85.0),
        (2, 45.0001, -85.0),   # ~22 m apart, adjacent lat cells
    ], ["sample_id", "lat", "lon"])
    out = geo_neighbor_pairs(df, "sample_id", radius_km=5.0).collect()
    assert len(out) == 1
    assert out[0]["dist_km"] < 0.1


def test_bitset_prune_semi_join_exact_and_pruning(spark):
    """Result must equal a plain semi join for arbitrary keys (bitset is a
    superset filter; the exact join removes false positives), including a
    tiny bitset where collisions are guaranteed."""
    from pyspark.sql import Row, functions as F
    from glamr_omics_pipelines_spark.operators.joins import (
        bitset_prune_semi_join)
    big = spark.createDataFrame([Row(k=i, payload=f"p{i}")
                                 for i in range(500)])
    small = spark.createDataFrame([Row(k=i * 7) for i in range(30)])
    expect = sorted(r.k for r in big.join(small, "k", "left_semi").collect())
    for bits in (1 << 20, 256):   # 256 bits -> heavy collisions, still exact
        got = sorted(r.k for r in
                     bitset_prune_semi_join(big, small, "k", bits).collect())
        assert got == expect, f"num_bits={bits}"
    # pruning actually happens: with a selective small side the mask probe
    # discards most rows before the exact join (superset, but not trivial)
    pruned = bitset_prune_semi_join(big, small, "k", 1 << 20)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_nearest_station_argmin_and_ties(spark):
    from pyspark.sql import functions as F
    from glamr_omics_pipelines_spark.operators import joins as J
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 10.0)], "id int, lat double, lon double")
    # stations at lon 0 and 10; point 1 equidistant from two co-located
    # stations 5 and 7 -> tie breaks to smaller id
    st = spark.createDataFrame(
        [(5, 0.0, 0.0), (7, 0.0, 0.0), (9, 0.0, 10.0)],
        "sid int, lat double, lon double")
    out = {r.id: (r.station, r.dist_km) for r in
           J.nearest_station(pts, st, "id", "sid").collect()}
    assert out[1][0] == 5 and abs(out[1][1]) < 1e-9
    assert out[2][0] == 9
