"""Mergeable HLL sketch operators: accuracy + mergeability invariants.

Approximate operators carry pytest gates instead of DuckDB hash oracles
(implementation-specific estimates can't hash-match across engines).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.operators import sketches


def _events(spark, n=5000, users=700):
    return spark.range(n).select(
        (F.col("id") % 5).alias("day"),
        F.concat(F.lit("u"), (F.xxhash64("id") % users)).alias("user_id"))


def test_hll_estimate_within_tolerance(spark):
    df = _events(spark)
    exact = {r["day"]: r["n"] for r in
             df.groupBy("day").agg(F.countDistinct("user_id").alias("n")).collect()}
    est = sketches.hll_estimate(sketches.hll_sketch(df, ["day"], "user_id"))
    for r in est.collect():
        assert abs(r["approx_distinct"] - exact[r["day"]]) \
            <= 0.05 * exact[r["day"]] + 2, (r["day"], r["approx_distinct"])


def test_hll_rollup_merges_without_rescan(spark):
    """Union of per-day sketches must estimate the ALL-days distinct count —
    and agree with a sketch built directly over the whole table (mergeability
    is what makes the sketch warehouse pattern work)."""
    df = _events(spark)
    per_day = sketches.hll_sketch(df, ["day"], "user_id")
    total_from_union = sketches.hll_rollup(
        per_day.withColumn("all", F.lit(1)), ["all"]).collect()[0]
    direct = sketches.hll_estimate(
        sketches.hll_sketch(df.withColumn("all", F.lit(1)), ["all"], "user_id")
    ).collect()[0]
    assert total_from_union["approx_distinct"] == direct["approx_distinct"]
    exact = df.select("user_id").distinct().count()
    assert abs(total_from_union["approx_distinct"] - exact) <= 0.05 * exact + 2


def test_hll_sketch_column_survives_parquet(spark, tmp_path):
    """The sketch is a plain BINARY column: write, read back, roll up."""
    df = _events(spark, n=2000, users=300)
    path = str(tmp_path / "sketches.parquet")
    sketches.hll_sketch(df, ["day"], "user_id").write.parquet(path)
    back = spark.read.parquet(path)
    out = sketches.hll_rollup(back.withColumn("all", F.lit(1)), ["all"])
    exact = df.select("user_id").distinct().count()
    got = out.collect()[0]["approx_distinct"]
    assert abs(got - exact) <= 0.05 * exact + 2


def test_cms_never_underestimates_and_merges(spark):
    from pyspark.sql import functions as F
    from glamr_omics_pipelines_spark.operators import sketches
    rows = [("a",)] * 50 + [("b",)] * 10 + [("c",)] * 1
    df = spark.createDataFrame(rows, "item string")
    cms = sketches.cms_build(df, "item", depth=4, width=64)
    items = df.distinct()
    est = {r.item: r.est_count for r in
           sketches.cms_estimate(cms, items, "item", depth=4,
                                 width=64).collect()}
    true = {"a": 50, "b": 10, "c": 1}
    for k, t in true.items():
        assert est[k] >= t                      # CMS never underestimates
        assert est[k] <= t + 61                 # collision mass bounded by N
    # mergeability: sketch(A) + sketch(B) == sketch(A ∪ B)
    half1 = spark.createDataFrame(rows[:30], "item string")
    half2 = spark.createDataFrame(rows[30:], "item string")
    merged = (sketches.cms_build(half1, "item", depth=4, width=64)
              .unionByName(sketches.cms_build(half2, "item", depth=4,
                                              width=64))
              .groupBy("r", "b").agg(F.sum("n").alias("n")))
    est2 = {r.item: r.est_count for r in
            sketches.cms_estimate(merged, items, "item", depth=4,
                                  width=64).collect()}
    assert est2 == est


def test_cms_weighted_build_matches_raw(spark):
    """Hash-work hoisting: sketching the (item, count) pre-aggregate with
    weight_col produces the grid the raw stream produces — the equivalence
    q_cms_counts relies on to hash distinct items instead of fact rows."""
    from pyspark.sql import functions as F
    from glamr_omics_pipelines_spark.operators import sketches
    rows = [("a",)] * 50 + [("b",)] * 10 + [("c",)] * 1
    df = spark.createDataFrame(rows, "item string")
    raw = sketches.cms_build(df, "item", depth=4, width=64)
    pre = df.groupBy("item").agg(F.count(F.lit(1)).alias("w"))
    weighted = sketches.cms_build(pre, "item", depth=4, width=64,
                                  weight_col="w")
    assert (sorted(map(tuple, raw.collect()))
            == sorted(map(tuple, weighted.collect())))


# ---------------------------------------------------------------------------
# Bloom filter (bloom_build / bloom_novel)
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    from glamr_omics_pipelines_spark.operators import sketches
    keys = spark.createDataFrame([(f"k{i}",) for i in range(200)], ["k"])
    bloom = sketches.bloom_build(keys, "k", m_bits=2048, k=3)
    out = sketches.bloom_novel(keys, "k", bloom, m_bits=2048, k=3)
    # every built key must test maybe_seen — the no-false-negative law
    assert all(r["maybe_seen"] for r in out.collect())
    assert out.count() == 200


def test_bloom_novel_keys_mostly_pass(spark):
    from glamr_omics_pipelines_spark.operators import sketches
    hist = spark.createDataFrame([(f"k{i}",) for i in range(100)], ["k"])
    new = spark.createDataFrame([(f"n{i}",) for i in range(100)], ["k"])
    bloom = sketches.bloom_build(hist, "k", m_bits=4096, k=3)
    out = sketches.bloom_novel(new, "k", bloom, m_bits=4096, k=3)
    got = {r["k"]: r["maybe_seen"] for r in out.collect()}
    # at 100*3/4096 load the FP rate is ~0.03^3; allow a generous margin
    assert sum(got.values()) <= 5


def test_bloom_build_guards(spark):
    from glamr_omics_pipelines_spark.operators import sketches
    df = spark.createDataFrame([("a",)], ["k"])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sketches.bloom_build(df, "k", m_bits=100)   # not a multiple of 32
    with _pytest.raises(ValueError):
        sketches.bloom_build(df, "k", m_bits=64, k=0)


def test_bloom_bitmap_is_word_packed(spark):
    from glamr_omics_pipelines_spark.operators import sketches
    keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], ["k"])
    bloom = sketches.bloom_build(keys, "k", m_bits=1024, k=3).collect()
    assert len(bloom) <= 1024 // 32              # at most m/32 words
    assert all(0 <= r["word"] < 32 for r in bloom)
    assert all(r["bits"] != 0 for r in bloom)


# ---------------------------------------------------------------------------
# Histogram quantile sketch (hist_sketch / hist_rollup / hist_quantiles)
# ---------------------------------------------------------------------------


def test_hist_quantile_exact_on_bin_aligned_data(spark):
    from glamr_omics_pipelines_spark.operators import sketches
    # 100 values 0.5, 1.5, ..., 99.5 with width 1: rank math is exact
    df = spark.createDataFrame([("a", i + 0.5) for i in range(100)],
                               ["g", "v"])
    sk = sketches.hist_sketch(df, ["g"], "v", width=1.0)
    out = sketches.hist_quantiles(sk, ["g"], [0.5, 0.9, 1.0], width=1.0)
    got = {r["q"]: r["est"] for r in out.collect()}
    # rank q*100 interpolated in a 1-count bin: est = bin + (r - prev)
    assert got[0.5] == pytest.approx(50.0)
    assert got[0.9] == pytest.approx(90.0)
    assert got[1.0] == pytest.approx(100.0)


def test_hist_rollup_equals_direct_sketch(spark):
    from glamr_omics_pipelines_spark.operators import sketches
    import random
    rng = random.Random(9)
    rows = [("g1" if i % 2 else "g2", f"d{i % 5}", rng.uniform(0, 100))
            for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "day", "v"])
    fine = sketches.hist_sketch(df, ["g", "day"], "v", width=5.0)
    merged = sketches.hist_rollup(fine, ["g"])
    direct = sketches.hist_sketch(df, ["g"], "v", width=5.0)
    a = {(r["g"], r["bin"]): r["n"] for r in merged.collect()}
    b = {(r["g"], r["bin"]): r["n"] for r in direct.collect()}
    assert a == b                       # the mergeability identity


def test_hist_quantile_error_bound(spark):
    from glamr_omics_pipelines_spark.operators import sketches
    import random
    rng = random.Random(4)
    vals = sorted(rng.uniform(0, 50) for _ in range(400))
    df = spark.createDataFrame([("a", v) for v in vals], ["g", "v"])
    width = 2.0
    sk = sketches.hist_sketch(df, ["g"], "v", width=width)
    out = sketches.hist_quantiles(sk, ["g"], [0.25, 0.5, 0.75, 0.95],
                                  width=width)
    for r in out.collect():
        exact = vals[min(int(r["q"] * 400) - 1, 399)]
        assert abs(r["est"] - exact) <= width + 1e-9


def test_hist_sketch_guards(spark):
    from glamr_omics_pipelines_spark.operators import sketches
    df = spark.createDataFrame([("a", 1.0)], ["g", "v"])
    with pytest.raises(ValueError):
        sketches.hist_sketch(df, ["g"], "v", width=0.0)
    sk = sketches.hist_sketch(df, ["g"], "v", width=1.0)
    with pytest.raises(ValueError):
        sketches.hist_quantiles(sk, ["g"], [0.0], width=1.0)
    with pytest.raises(ValueError):
        sketches.hist_quantiles(sk, ["g"], [], width=1.0)
