"""Property tests for deterministic sampling/splits and the time rollup."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from glamr_omics_pipelines_spark.operators import sampling, timeseries  # noqa: E402


def test_hash_sample_partition_independent(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    a = {r.k for r in sampling.hash_sample(df, "k", 10).collect()}
    b = {r.k for r in sampling.hash_sample(df.repartition(13), "k", 10).collect()}
    assert a == b                      # membership is row-local, layout-free
    assert 100 < len(a) < 320          # ~10% of 2000, hash-binomial bounds


def test_hash_sample_salt_decorrelates(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    a = {r.k for r in sampling.hash_sample(df, "k", 10, salt="x").collect()}
    b = {r.k for r in sampling.hash_sample(df, "k", 10, salt="y").collect()}
    assert a != b and 0 < len(a & b) < len(a)


def test_stratified_split_stable_under_growth(spark):
    """A row's split must not change when the corpus grows — the property
    that keeps eval sets uncontaminated across dataset versions."""
    small = spark.range(0, 500).select(F.col("id").alias("k"))
    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    s = {r.k: r.split for r in sampling.stratified_split(small, "k").collect()}
    g = {r.k: r.split for r in sampling.stratified_split(big, "k").collect()}
    assert all(g[k] == v for k, v in s.items())
    parts = {v for v in g.values()}
    assert parts == {"train", "val", "test"}


def test_hypertable_rollup_levels_consistent(spark):
    ev = spark.createDataFrame(
        [(f"2024-01-0{d} 0{h}:15:00", float(d * 10 + h))
         for d in (1, 2) for h in (1, 2, 3)],
        "ts string, v double").withColumn("ts", F.to_timestamp("ts"))
    out = timeseries.hypertable_rollup(
        ev, "ts", [F.sum("v").alias("s")], levels=["day", "hour"]).collect()
    by_grain = {}
    for r in out:
        by_grain.setdefault(r.grain, []).append(r)
    assert len(by_grain[0]) == 1                      # grand total
    assert len(by_grain[1]) == 2 and len(by_grain[2]) == 6
    total = by_grain[0][0].s
    assert abs(sum(r.s for r in by_grain[1]) - total) < 1e-9
    assert abs(sum(r.s for r in by_grain[2]) - total) < 1e-9
    day1 = [r for r in by_grain[1] if r.bucket_day.day == 1][0]
    hours1 = [r.s for r in by_grain[2] if r.bucket_day.day == 1]
    assert abs(sum(hours1) - day1.s) < 1e-9


def test_cap_per_group_deterministic_and_bounded(spark):
    df = (spark.range(0, 900)
          .select((F.col("id") % 3).cast("string").alias("src"),
                  F.col("id").alias("k")))
    from glamr_omics_pipelines_spark.operators import sampling as S
    a = S.cap_per_group(df, ["src"], "k", 50)
    b = S.cap_per_group(df.repartition(17), ["src"], "k", 50)
    ra = {(r.src, r.k) for r in a.collect()}
    rb = {(r.src, r.k) for r in b.collect()}
    assert ra == rb                       # layout-independent selection
    counts = a.groupBy("src").count().collect()
    assert all(r["count"] == 50 for r in counts)


def test_hash_bucket_null_key_matches_sql_concat_skip(spark):
    """Salted hashing of a NULL key must hash the bare salt (engines' concat
    skips NULLs) — not null-propagate and silently drop the row."""
    import duckdb
    from glamr_omics_pipelines_spark.operators import sampling as S
    df = spark.createDataFrame([(None,), (7,)], "k int")
    got = {r.k: r.b for r in
           df.withColumn("b", S.hash_bucket("k", 100, salt="s1")).collect()}
    want_null = duckdb.sql(
        "SELECT CAST(concat('0x', substr(md5(concat('s1:', CAST(NULL AS "
        "VARCHAR))), 1, 8)) AS BIGINT) % 100").fetchone()[0]
    assert got[None] == want_null and got[7] is not None


def test_temperature_sample_rebalances_toward_uniform(spark):
    """alpha<1 keeps tail groups whole and down-samples head groups; alpha=1
    is (up to capping) a no-op; membership is deterministic."""
    from pyspark.sql import functions as F
    from glamr_omics_pipelines_spark.operators import sampling
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    out = sampling.temperature_sample(df, ["grp"], "doc_id", alpha=0.5)
    got = {r["grp"]: r["n"] for r in
           out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["small"] == 100            # f capped at 1: tail kept whole
    # f_big = N*sqrt(900)/(z*900) = 1000*30/(40*900) = 0.8333 -> E=750
    assert 700 < got["big"] < 800
    # deterministic: same call, same membership
    again = sampling.temperature_sample(df, ["grp"], "doc_id", alpha=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) \
        == sorted(r["doc_id"] for r in again.collect())
    # alpha=1: every fraction is exactly 1 -> identity
    ident = sampling.temperature_sample(df, ["grp"], "doc_id", alpha=1.0)
    assert ident.count() == 1000
