"""Brute-force parity property tests for the row-local text metrics —
independent Python implementations of the Gopher repetition rules and the
rolling fingerprint, on arbitrary hypothesis inputs."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings, strategies as st

from glamr_omics_pipelines_spark.operators import text as T

SETTINGS = dict(max_examples=8, deadline=None)

docs = st.lists(st.text(alphabet="ab c\tD.", min_size=0, max_size=30),
                min_size=1, max_size=6)


def _tok(s: str) -> list[str]:
    return [t for t in re.split(r"\s+", s.lower()) if t != ""]


@settings(**SETTINGS)
@given(docs)
def test_repetition_metrics_match_python_counter(spark, ds):
    df = spark.createDataFrame(list(enumerate(ds)), "doc_id int, text string")
    got = {r.doc_id: (r.dup_word_frac, r.dup_bigram_frac, r.top_bigram_frac)
           for r in T.repetition_metrics(df, "text").collect()}
    for i, s in enumerate(ds):
        w = _tok(s)
        n = len(w)
        dup_w = 0.0 if n == 0 else 1.0 - len(set(w)) / n
        bg = [f"{w[j - 1]} {w[j]}" for j in range(1, n)] if n >= 2 else []
        nb = len(bg)
        dup_b = 0.0 if nb == 0 else 1.0 - len(set(bg)) / nb
        top_b = 0.0 if nb == 0 else max(Counter(bg).values()) / nb
        assert abs(got[i][0] - dup_w) < 1e-12
        assert abs(got[i][1] - dup_b) < 1e-12
        assert abs(got[i][2] - top_b) < 1e-12


@settings(**SETTINGS)
@given(docs, st.integers(1, 80))
def test_doc_fingerprint_matches_python_rolling_hash(spark, ds, prefix):
    df = spark.createDataFrame(list(enumerate(ds)), "doc_id int, text string")
    got = {r.doc_id: r.fingerprint
           for r in T.doc_fingerprint(df, "text",
                                      prefix_len=prefix).collect()}
    for i, s in enumerate(ds):
        h = 0
        for ch in s[:prefix]:
            h = (h * 31 + ord(ch)) % 1000000007
        assert got[i] == h


@settings(**SETTINGS)
@given(docs)
def test_token_counts_match_python(spark, ds):
    df = spark.createDataFrame(list(enumerate(ds)), "doc_id int, text string")
    got = {r.doc_id: r.n_tokens
           for r in T.token_count(df, "text").collect()}
    bpe = {r.doc_id: r.n_bpe_tokens
           for r in T.bpe_ish_token_count(df, "text").collect()}
    for i, s in enumerate(ds):
        assert got[i] == len(_tok(s))
        assert bpe[i] == len(re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", s))
