"""Fixtures for SCD2 compression, transition counts, and doc chunking."""

import datetime as dt

import pytest
from pyspark.sql import Row

from glamr_omics_pipelines_spark.operators import text, timeseries, windows


def _d(day):
    return dt.datetime(2024, 1, day)


def test_scd2_compress_runs_and_intervals(spark):
    df = spark.createDataFrame([
        Row(k=1, ts=_d(1), ord=1, status="O"),
        Row(k=1, ts=_d(2), ord=2, status="O"),   # same run
        Row(k=1, ts=_d(3), ord=3, status="F"),   # change -> v2
        Row(k=1, ts=_d(4), ord=4, status="O"),   # back -> v3 (runs, not distinct)
        Row(k=2, ts=_d(1), ord=5, status="P"),
    ])
    out = {(r.k, r.version): (r.status, r.valid_from, r.valid_to, r.n_events)
           for r in windows.scd2_compress(
               df, ["k"], "ts", ["status"], ["ord"]).collect()}
    assert out[(1, 1)] == ("O", _d(1), _d(3), 2)
    assert out[(1, 2)] == ("F", _d(3), _d(4), 1)
    assert out[(1, 3)] == ("O", _d(4), None, 1)   # current row: open interval
    assert out[(2, 1)] == ("P", _d(1), None, 1)


def test_scd2_compress_null_attribute_runs(spark):
    # null-safe compare: null->null is NOT a change; null->value is
    df = spark.createDataFrame(
        [Row(k=1, ts=_d(1), ord=1, status=None),
         Row(k=1, ts=_d(2), ord=2, status=None),
         Row(k=1, ts=_d(3), ord=3, status="X")],
        "k int, ts timestamp, ord int, status string")
    rows = windows.scd2_compress(df, ["k"], "ts", ["status"], ["ord"]).collect()
    assert sorted((r.version, r.n_events) for r in rows) == [(1, 2), (2, 1)]


def test_transition_counts_bigrams_and_probs(spark):
    df = spark.createDataFrame([
        Row(u=1, ts=_d(1), e=1, s="view"),
        Row(u=1, ts=_d(2), e=2, s="click"),
        Row(u=1, ts=_d(3), e=3, s="view"),
        Row(u=2, ts=_d(1), e=4, s="view"),
        Row(u=2, ts=_d(2), e=5, s="buy"),
    ])
    out = {(r.state_from, r.state_to): (r.n, r.prob)
           for r in timeseries.transition_counts(
               df, ["u"], "ts", "s", ["e"]).collect()}
    # view -> click, view -> buy (1 each of 2 view-origins); click -> view
    assert out[("view", "click")] == (1, 0.5)
    assert out[("view", "buy")] == (1, 0.5)
    assert out[("click", "view")] == (1, 1.0)
    assert len(out) == 3  # last event per user emits no transition


def test_transition_counts_tie_ordering_is_deterministic(spark):
    # two events at the SAME ts order by the tiebreak column
    df = spark.createDataFrame([
        Row(u=1, ts=_d(1), e=1, s="a"),
        Row(u=1, ts=_d(1), e=2, s="b"),
        Row(u=1, ts=_d(2), e=3, s="c"),
    ])
    out = {(r.state_from, r.state_to)
           for r in timeseries.transition_counts(
               df, ["u"], "ts", "s", ["e"]).collect()}
    assert out == {("a", "b"), ("b", "c")}


def test_chunk_tokens_windows_and_tail(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")])
    out = {r.chunk_id: (r.chunk_text, r.n_tokens)
           for r in text.chunk_tokens(df, "doc_id", "text", 4, 3).collect()}
    # starts 0,3,6,9: full windows then a 1-token tail
    assert out[0] == ("t0 t1 t2 t3", 4)
    assert out[1] == ("t3 t4 t5 t6", 4)
    assert out[2] == ("t6 t7 t8 t9", 4)
    assert out[3] == ("t9", 1)


def test_chunk_tokens_short_and_empty_docs(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="only two"),
                                Row(doc_id=2, text="   "),
                                Row(doc_id=3, text="")])
    rows = text.chunk_tokens(df, "doc_id", "text", 16, 8).collect()
    assert len(rows) == 1
    assert rows[0].doc_id == 1 and rows[0].chunk_text == "only two"


def test_chunk_tokens_rejects_bad_params(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        text.chunk_tokens(df, "doc_id", "text", 0, 8)
    with pytest.raises(ValueError):
        text.chunk_tokens(df, "doc_id", "text", 16, 0)
