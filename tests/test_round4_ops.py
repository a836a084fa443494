"""Round-4 operators: cluster survivor selection, adaptive quantile gate,
text normalization, k-mer spectrum, native session windows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.functions import bio
from glamr_omics_pipelines_spark.operators import sampling, text
from glamr_omics_pipelines_spark.operators.dedup import keep_best_per_cluster


def test_keep_best_per_cluster_picks_highest_score(spark):
    corpus = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0)], "doc_id long, score double")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, label long")
    out = {r.doc_id: r for r in
           keep_best_per_cluster(corpus, labels, "doc_id", "score").collect()}
    # cluster {1,2,3}: 2 and 3 tie on score, min id wins
    assert out[2].kept and not out[1].kept and not out[3].kept
    # doc 4 absent from labels -> singleton cluster, survives
    assert out[4].kept and out[4].cluster_id == 4
    assert out[1].cluster_id == 1 and out[2].cluster_id == 1


def test_quantile_gate_exact_threshold(spark):
    rows = [("en", v) for v in [10, 20, 30, 40]] + [("fr", v) for v in [1, 100]]
    df = spark.createDataFrame(rows, "lang string, score long")
    kept = sampling.quantile_gate(df, ["lang"], "score", q=0.5)
    got = sorted((r.lang, r.score) for r in kept.collect())
    # en median = 25 (linear interpolation) -> keeps 30, 40;
    # fr median = 50.5 -> keeps 100
    assert got == [("en", 30), ("en", 40), ("fr", 100)]
    th = {r.lang: r.threshold for r in kept.collect()}
    assert th["en"] == 25.0 and th["fr"] == 50.5


def test_quantile_gate_keep_le(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("a", 3)],
                               "g string, score long")
    kept = sampling.quantile_gate(df, ["g"], "score", q=0.5, keep="le")
    assert sorted(r.score for r in kept.collect()) == [1, 2]


def test_normalize_text_strips_markup_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "  <b>hello</b>\n\t world  \r\n again "),
         (2, "plain"),
         (3, "<br/><br/>")],
        "doc_id long, text string")
    out = {r.doc_id: r.norm_text
           for r in text.normalize_text(df, "text").collect()}
    assert out[1] == "hello world again"
    assert out[2] == "plain"
    assert out[3] == ""


def test_kmer_spectrum_counts(spark):
    df = spark.createDataFrame([("acgta",), ("acg",), ("at",)], "seq string")
    out = {r.kmer: r.n for r in bio.kmer_spectrum(df, "seq", k=3).collect()}
    # "acgta" -> acg, cgt, gta ; "acg" -> acg ; "at" dropped (len < k)
    assert out == {"acg": 2, "cgt": 1, "gta": 1}


def test_session_window_boundary_semantics(spark):
    """An event exactly gap seconds after the previous one MERGES into the
    session (Spark extends while next_ts <= last_ts + gap); only a strictly
    larger gap starts a new session — the assumption the duckdb oracle's
    strict > encodes (matching windows.sessionize)."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, t0), (1, t0 + dt.timedelta(seconds=1800)),
            (1, t0 + dt.timedelta(seconds=1800 + 1801))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (df.groupBy("user_id", F.session_window("ts", "30 minutes"))
           .agg(F.count(F.lit(1)).alias("n")).collect())
    # event 2 is exactly 1800s after event 1 -> merged; event 3 is 1801s
    # after event 2 -> new session
    assert sorted(r.n for r in out) == [1, 2]
