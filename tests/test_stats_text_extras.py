"""Hand-computed fixtures for trend_fit, chi_square_test, inverted_index,
and key_skew_profile."""

from __future__ import annotations

import math

from glamr_omics_pipelines_spark.operators import stats, text, validate


def test_trend_fit_exact_line(spark):
    # y = 2x + 1 exactly -> slope 2, intercept 1, r2 = 1
    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(5)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = stats.trend_fit(df, ["k"], "x", "y").collect()[0]
    assert r.n == 5
    assert abs(r.slope - 2.0) < 1e-12 and abs(r.intercept - 1.0) < 1e-12
    assert abs(r.r2 - 1.0) < 1e-12


def test_trend_fit_degenerate_x(spark):
    df = spark.createDataFrame([("a", 1.0, 2.0), ("a", 1.0, 5.0)],
                               "k string, x double, y double")
    r = stats.trend_fit(df, ["k"], "x", "y").collect()[0]
    assert r.slope is None and r.r2 is None


def test_chi_square_independent_grid(spark):
    # perfectly independent 2x2 with equal counts -> chi2 = 0, dof = 1
    rows = [("f", r, c) for r in ("a", "b") for c in (0, 1) for _ in range(5)]
    df = spark.createDataFrame(rows, "f string, r string, c int")
    out = stats.chi_square_test(df, "f", "r", "c").collect()[0]
    assert out.n_obs == 20 and out.dof == 1 and abs(out.chi2) < 1e-12


def test_chi_square_perfect_association(spark):
    # r='a' always c=0, r='b' always c=1 (n=20) -> chi2 = n = 20
    rows = ([("f", "a", 0)] * 10) + ([("f", "b", 1)] * 10)
    df = spark.createDataFrame(rows, "f string, r string, c int")
    out = stats.chi_square_test(df, "f", "r", "c").collect()[0]
    assert abs(out.chi2 - 20.0) < 1e-9 and out.dof == 1


def test_chi_square_unobserved_cell_mass(spark):
    # 2x2 with one empty cell: verify against the dense-grid formula
    rows = ([("f", "a", 0)] * 4 + [("f", "a", 1)] * 2 + [("f", "b", 0)] * 2)
    df = spark.createDataFrame(rows, "f string, r string, c int")
    out = stats.chi_square_test(df, "f", "r", "c").collect()[0]
    n = 8.0
    obs = {("a", 0): 4, ("a", 1): 2, ("b", 0): 2, ("b", 1): 0}
    rt = {"a": 6, "b": 2}
    ct = {0: 6, 1: 2}
    want = sum((obs[(r, c)] - rt[r] * ct[c] / n) ** 2 / (rt[r] * ct[c] / n)
               for r in ("a", "b") for c in (0, 1))
    assert abs(out.chi2 - want) < 1e-9


def test_inverted_index_cap_and_df(spark):
    rows = [(i, "common special") if i < 5 else (i, "common") for i in range(9)]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.term: r for r in
           text.inverted_index(df, "id", "text", max_postings=3).collect()}
    assert out["common"].df_count == 9          # exact df despite cap
    assert out["common"].postings == [0, 1, 2]  # capped, smallest ids
    assert out["special"].df_count == 5
    assert out["special"].postings == [0, 1, 2]  # cap applies here too


def test_key_skew_profile_ranks_and_ratio(spark):
    rows = [("x", i) for i in [1] * 6 + [2, 2, 3]]
    df = spark.createDataFrame(rows, "pad string, k int")
    out = {r.rank: r for r in
           validate.key_skew_profile(df, ["k"], top_n=2).collect()}
    assert out[1].key_value == "1" and out[1].n == 6
    assert abs(out[1].share - 6 / 9) < 1e-6  # share is rounded to 6 dp
    # skew ratio = n * nvals / total = 6*3/9 = 2.0
    assert abs(out[1].skew_ratio - 2.0) < 1e-9
    assert out[2].key_value == "2" and len(out) == 2
