"""Unit tests for the window-operator family (W1-W6)."""

from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.operators import windows


def test_top1_per_group_deterministic(spark):
    df = spark.createDataFrame(
        [("g1", 1, 5.0), ("g1", 2, 9.0), ("g2", 1, 3.0), ("g2", 2, 3.0)],
        ["g", "i", "score"])
    out = windows.top1_per_group(df, ["g"], [F.col("score").desc(),
                                            F.col("i").asc()])
    got = {(r["g"], r["i"]) for r in out.collect()}
    assert got == {("g1", 2), ("g2", 1)}


def test_tie_discard_top1(spark):
    df = spark.createDataFrame(
        [("g1", 1, 5.0), ("g1", 2, 9.0),       # unique winner
         ("g2", 1, 3.0), ("g2", 2, 3.0),       # tied -> discarded
         ("g3", 1, 7.0)],
        ["g", "i", "score"])
    out = windows.tie_discard_top1(df, ["g"], "score")
    got = {(r["g"], r["i"]) for r in out.collect()}
    assert got == {("g1", 2), ("g3", 1)}


def test_lag_retention_ladder(spark):
    df = spark.createDataFrame(
        [("s1", 1, 100), ("s1", 2, 80), ("s1", 3, 40)],
        ["sample", "stage", "n"])
    out = windows.lag_retention_ladder(df, ["sample"], "stage", "n")
    by_stage = {r["stage"]: r["percent_retained"] for r in out.collect()}
    assert by_stage[1] is None
    assert abs(by_stage[2] - 80.0) < 1e-9
    assert abs(by_stage[3] - 50.0) < 1e-9


def test_anvio_stacked_filter_unique_or_significant(spark):
    # gene g1: two hits, one fully significant (score>=thr) -> that one wins.
    # gene g2: one candidate below full threshold but unique -> kept.
    # gene g3: two sub-threshold candidates (not unique) -> dropped.
    rows = [
        ("g1", "k1", 120.0, 100.0, 1e-7),
        ("g1", "k2", 60.0, 100.0, 1e-7),
        ("g2", "k3", 70.0, 100.0, 1e-7),
        ("g3", "k4", 60.0, 100.0, 1e-7),
        ("g3", "k5", 55.0, 100.0, 1e-7),
    ]
    df = spark.createDataFrame(rows, ["gene", "ko", "score", "thr", "e"])
    out = windows.anvio_stacked_filter(df, "gene", "score", "thr", "e",
                                       e_cutoff=1e-5, score_frac=0.5,
                                       tiebreak_cols=["ko"])
    got = {(r["gene"], r["ko"]) for r in out.collect()}
    assert got == {("g1", "k1"), ("g2", "k3")}


def test_sequential_ids(spark):
    df = spark.createDataFrame([("b", 2), ("a", 1), ("c", 3)], ["name", "mtime"])
    out = windows.sequential_ids(df, [F.col("mtime")])
    got = {r["name"]: r["seq_id"] for r in out.collect()}
    assert got == {"a": 1, "b": 2, "c": 3}


def test_sessionize_gap(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
         (1, "2024-01-01 01:00:00"), (2, "2024-01-01 00:00:00")],
        ["user", "ts"]).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.sessionize(df, "user", "ts", gap_seconds=1800)
    per_user = (out.groupBy("user").agg(F.max("session_id").alias("m"))
                .collect())
    got = {r["user"]: r["m"] for r in per_user}
    assert got == {1: 2, 2: 1}


def test_epoch_us_rejects_non_utc_session(spark):
    """The UTC session-tz contract is enforced, not just documented: a
    non-UTC session raises at expression-build time instead of silently
    shifting every derived epoch (NTZ casts reinterpret wall-clock)."""
    import pytest
    from glamr_omics_pipelines_spark.operators.windows import epoch_us
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Detroit")
        with pytest.raises(ValueError, match="timeZone=UTC"):
            epoch_us("ts")
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
    epoch_us("ts")  # restored UTC builds fine
