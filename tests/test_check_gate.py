"""The local oracle gate (tools/check.py) must be render-strict: the driver
hashes RENDERED values, so any numerically-equal-but-prints-differently split
(signed zero, int-vs-float, exponent form) has to fail locally too.

VERDICT r4 (#2, int-vs-float) and r5 (#1/#2, -0.0 vs 0.0) were both lost to
this blind spot; these fixtures pin the gate behavior without Spark/DuckDB.
"""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo/tools")
from check import compare  # noqa: E402


def test_signed_zero_split_fails():
    # Spark HALF_UP round gives +0.0, DuckDB round() preserves -0.0.
    spark_df = pd.DataFrame({"i": [0, 1], "cov": [0.0, 1.5]})
    duck_df = pd.DataFrame({"i": [0, 1], "cov": [-0.0, 1.5]})
    problems = compare("planted", spark_df, duck_df)
    assert problems, "-0.0 vs 0.0 must fail the render-strict gate"
    assert any("render split" in p for p in problems)


def test_int_vs_float_split_fails():
    spark_df = pd.DataFrame({"n": pd.array([4124, 7], dtype="int64")})
    duck_df = pd.DataFrame({"n": pd.array([4124.0, 7.0], dtype="float64")})
    problems = compare("planted", spark_df, duck_df)
    assert problems, "int64 vs float64 must fail (renders 4124 vs 4124.0)"


def test_float32_vs_float64_repr_split_fails():
    # Same value at float32 precision renders a different shortest-repr.
    import numpy as np
    spark_df = pd.DataFrame({"x": np.array([1 / 3], dtype="float32").astype("float64")})
    duck_df = pd.DataFrame({"x": np.array([1 / 3], dtype="float64")})
    problems = compare("planted", spark_df, duck_df)
    assert problems  # numeric 1e-9 also catches this one; either pass may fire


def test_equal_frames_pass():
    df = pd.DataFrame({"k": ["a", "b"], "v": [1.25, -0.5], "n": [3, 4]})
    assert compare("ok", df.copy(), df.copy()) == []


def test_nan_equal_passes():
    df = pd.DataFrame({"v": [float("nan"), 2.0]})
    assert compare("ok", df.copy(), df.copy()) == []


def test_numeric_mismatch_still_reported_first():
    spark_df = pd.DataFrame({"v": [1.0]})
    duck_df = pd.DataFrame({"v": [2.0]})
    problems = compare("planted", spark_df, duck_df)
    assert any("float col" in p for p in problems)
    assert not any("render split" in p for p in problems)
