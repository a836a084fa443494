"""fastp sliding-window quality trim + low-complexity filter (P5 tail,
Snakefile:563-571) — hand-computed fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.functions import bio


def _qual(phreds, offset=33):
    return "".join(chr(offset + p) for p in phreds)


def test_sliding_window_trim_hand_computed(spark):
    rows = [
        # front: windows [10,10,10,10]=10, [10,10,10,30]=15, [10,10,30,30]=20
        # -> front_cut=2; tail: ending window at j=10 is (30,30,10,10)...
        ("r1", "ACGTACGTAC", _qual([10, 10, 10, 10, 30, 30, 30, 30, 10, 10])),
        # all high quality: untouched
        ("r2", "ACGTACGT", _qual([30] * 8)),
        # all low quality: fully trimmed to empty
        ("r3", "ACGTACGT", _qual([5] * 8)),
        # tail-only trim: [30]*6 + [10]*4 -> last passing ending-window is
        # j=8 (30,30,10,10)=20 -> tail_cut=2
        ("r4", "ACGTACGTAC", _qual([30] * 6 + [10] * 4)),
        ("r5", "", ""),
    ]
    df = spark.createDataFrame(rows, ["read_id", "seq", "qual"])
    out = bio.sliding_window_trim(df, window=4, min_mean_q=20)
    got = {r["read_id"]: (r["front_cut"], r["tail_cut"], r["trimmed_seq"],
                          r["trimmed_qual"])
           for r in out.collect()}
    # r1: front=2; ending windows: j=10 (30,30,10,10)=20 passes -> tail=10
    assert got["r1"] == (2, 0, "GTACGTAC", _qual([10, 10, 30, 30, 30, 30, 10, 10]))
    assert got["r2"] == (0, 0, "ACGTACGT", _qual([30] * 8))
    assert got["r3"] == (8, 0, "", "")
    assert got["r4"] == (0, 2, "ACGTACGT", _qual([30] * 6 + [10] * 2))
    assert got["r5"] == (0, 0, "", "")


def test_sliding_window_trim_front_only(spark):
    df = spark.createDataFrame(
        [("r1", "AAAACCCC", _qual([5, 5, 5, 5, 30, 30, 30, 30]))],
        ["read_id", "seq", "qual"])
    out = bio.sliding_window_trim(df, window=4, min_mean_q=20, cut_tail=False)
    r = out.collect()[0]
    # first passing window starts at i=4 (30,30,30,30)... but i=1..3 windows
    # mix low/high: i=1 (5,5,5,30)=11.25, i=2 (5,5,30,30)=17.5,
    # i=3 (5,30,30,30)=23.75 -> front=3
    assert (r["front_cut"], r["trimmed_seq"]) == (3, "ACCCC")


def test_sequence_complexity(spark):
    df = spark.createDataFrame(
        [("mono", "AAAAAAAAAA"),        # 0% complexity
         ("alt", "ACACACACAC"),          # 100%
         ("half", "AACCAACCAA"),         # transitions at 4 of 9 boundaries
         ("one", "A"), ("empty", "")],
        ["read_id", "seq"])
    out = df.select("read_id",
                    F.round(bio.sequence_complexity("seq"), 4).alias("c"))
    got = {r["read_id"]: r["c"] for r in out.collect()}
    assert got["mono"] == 0.0
    assert got["alt"] == 100.0
    assert got["half"] == round(100 * 4 / 9, 4)
    assert got["one"] == 0.0 and got["empty"] == 0.0


def test_low_complexity_filter(spark):
    df = spark.createDataFrame(
        [("keep", "ACGTACGTACGT"), ("drop", "AAAAAAAAAAAA")],
        ["read_id", "seq"])
    out = bio.low_complexity_filter(df, threshold=7.0)
    assert [r["read_id"] for r in out.collect()] == ["keep"]
