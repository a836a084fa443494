"""Brute-force parity property tests for the deterministic md5 sampling
family — Python hashlib mirrors of the engine-portable membership rules."""

from __future__ import annotations

import hashlib
import math

import pytest
from collections import Counter
from decimal import Decimal, ROUND_HALF_UP

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.operators import sampling

SETTINGS = dict(max_examples=8, deadline=None)

keys = st.lists(st.text(alphabet="abc123", min_size=0, max_size=6),
                min_size=1, max_size=15, unique=True)


def _bucket(key: str, buckets: int, salt: str | None) -> int:
    s = key if salt is None else f"{salt}:{key}"
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % buckets


@settings(**SETTINGS)
@given(keys, st.sampled_from([None, "s1", "zz"]),
       st.sampled_from([10, 100, 1_000_000]))
def test_hash_bucket_matches_python_md5(spark, ks, salt, buckets):
    df = spark.createDataFrame([(k,) for k in ks], "k string")
    got = {r.k: r.b for r in df.select(
        "k", sampling.hash_bucket("k", buckets, salt).alias("b")).collect()}
    for k in ks:
        assert got[k] == _bucket(k, buckets, salt)


@settings(**SETTINGS)
@given(keys, st.integers(0, 100))
def test_hash_sample_membership_matches_python(spark, ks, pct):
    df = spark.createDataFrame([(k,) for k in ks], "k string")
    got = {r.k for r in sampling.hash_sample(df, "k", pct, salt="p").collect()}
    want = {k for k in ks if _bucket(k, 100, "p") < pct}
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.sampled_from(["g1", "g2"]),
                          st.text(alphabet="abc123", min_size=1, max_size=5)),
                min_size=1, max_size=15, unique=True),
       st.integers(1, 4))
def test_cap_per_group_matches_python(spark, rows, n):
    df = spark.createDataFrame(rows, "g string, k string")
    got = {(r.g, r.k) for r in
           sampling.cap_per_group(df, ["g"], "k", n).collect()}
    per: dict[str, list[str]] = {}
    for g, k in rows:
        per.setdefault(g, []).append(k)
    want = set()
    for g, ks in per.items():
        ks.sort(key=lambda k: (_bucket(k, 1 << 31, "cap"), k))
        want.update((g, k) for k in ks[:n])
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.sampled_from(["en", "de", "zh"]),
                          st.text(alphabet="abc123", min_size=1, max_size=5)),
                min_size=1, max_size=20, unique=True),
       st.sampled_from([0.0, 0.3, 0.5, 1.0]))
def test_temperature_sample_membership_matches_python(spark, rows, alpha):
    df = spark.createDataFrame(rows, "lang string, k string")
    got = {(r.lang, r.k) for r in
           sampling.temperature_sample(df, ["lang"], "k",
                                       alpha=alpha).collect()}
    n_g = Counter(g for g, _ in rows)
    total = sum(n_g.values())
    zsum = sum(n ** alpha for n in n_g.values())
    want = set()
    for g, k in rows:
        f = min(1.0, total * n_g[g] ** alpha / (zsum * n_g[g]))
        thresh = int(Decimal(f * 1_000_000).quantize(0, ROUND_HALF_UP))
        if _bucket(k, 1_000_000, "temp") < thresh:
            want.add((g, k))
    assert got == want
    # alpha=1 must be a no-op (every fraction is exactly 1)
    if alpha == 1.0:
        assert got == set(rows)


# ---------------------------------------------------------------------------
# leakage_safe_split
# ---------------------------------------------------------------------------


def test_leakage_safe_split_cluster_members_cotravel(spark):
    from glamr_omics_pipelines_spark.operators import sampling
    df = spark.createDataFrame([(i, f"doc {i}") for i in range(50)],
                               ["doc_id", "text"])
    # clusters: {1,2,3} labeled 1; {10,11} labeled 10
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], ["id", "label"])
    out = sampling.leakage_safe_split(df, "doc_id", labels, train_pct=70)
    got = {r["doc_id"]: (r["_rep"], r["split"]) for r in out.collect()}
    assert len(got) == 50
    assert got[1] == got[2] == got[3]          # same rep, same split
    assert got[10] == got[11]
    assert got[1][0] == 1 and got[10][0] == 10
    # singleton keeps its own id as representative
    assert got[42][0] == 42


def test_leakage_safe_split_ratio_and_determinism(spark):
    from glamr_omics_pipelines_spark.operators import sampling
    df = spark.createDataFrame([(i, "x") for i in range(1000)],
                               ["doc_id", "text"])
    empty = spark.createDataFrame([], "id long, label long")
    out = sampling.leakage_safe_split(df, "doc_id", empty, train_pct=80)
    frac = out.filter("split = 'train'").count() / 1000
    assert 0.75 < frac < 0.85                  # md5 bucket ~ uniform
    again = sampling.leakage_safe_split(df, "doc_id", empty, train_pct=80)
    assert out.collect() == again.collect()    # deterministic


def test_leakage_safe_split_guards(spark):
    from glamr_omics_pipelines_spark.operators import sampling
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    empty = spark.createDataFrame([], "id long, label long")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sampling.leakage_safe_split(df, "doc_id", empty, train_pct=0)
    with _pytest.raises(ValueError):
        sampling.leakage_safe_split(df, "doc_id", empty, train_pct=100)


# ---------------------------------------------------------------------------
# mixture_plan
# ---------------------------------------------------------------------------


def test_mixture_plan_uncapped_matches_alpha_weights(spark):
    from glamr_omics_pipelines_spark.operators import sampling
    rows = [("a", 100), ("a", 100), ("b", 800)]
    df = spark.createDataFrame(rows, ["g", "n"])
    plan, rounds = sampling.mixture_plan(
        df, "g", F.col("n"), token_budget=1000.0, alpha=0.5,
        max_epochs=100.0)
    assert rounds == 1
    got = {r["g"]: r for r in plan.collect()}
    import math
    z = math.sqrt(200) + math.sqrt(800)
    ea = (math.sqrt(200) / z) * 1000 / 200
    assert got["a"]["epochs"] == pytest.approx(ea)
    assert not got["a"]["clipped"] and not got["b"]["clipped"]
    # shares sum to 1 when nothing clips
    assert sum(r["share"] for r in got.values()) == pytest.approx(1.0)


def test_mixture_plan_waterfills_clipped_budget(spark):
    from glamr_omics_pipelines_spark.operators import sampling
    # tiny domain would repeat far beyond the cap; its excess goes to b
    rows = [("a", 10), ("b", 1000)]
    df = spark.createDataFrame(rows, ["g", "n"])
    plan, rounds = sampling.mixture_plan(
        df, "g", F.col("n"), token_budget=2000.0, alpha=0.5,
        max_epochs=2.0)
    got = {r["g"]: r for r in plan.collect()}
    assert rounds == 2
    assert got["a"]["clipped"] and got["a"]["epochs"] == 2.0
    # b absorbs the remaining budget exactly: (2000 - 20) / 1000
    assert got["b"]["epochs"] == pytest.approx(1.98)
    assert not got["b"]["clipped"]
    # total allocation == budget when at least one domain is unclipped
    alloc = sum(r["epochs"] * r["n_tokens"] for r in got.values())
    assert alloc == pytest.approx(2000.0)


def test_mixture_plan_all_clipped_and_guards(spark):
    from glamr_omics_pipelines_spark.operators import sampling
    df = spark.createDataFrame([("a", 10), ("b", 20)], ["g", "n"])
    # budget so large every domain hits the cap: allocation < budget
    plan, rounds = sampling.mixture_plan(
        df, "g", F.col("n"), token_budget=1e9, alpha=0.5, max_epochs=3.0)
    got = {r["g"]: r for r in plan.collect()}
    assert all(r["clipped"] and r["epochs"] == 3.0 for r in got.values())
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sampling.mixture_plan(df, "g", F.col("n"), token_budget=0.0)
    with _pytest.raises(ValueError):
        sampling.mixture_plan(df, "g", F.col("n"), token_budget=10.0,
                              max_epochs=0.0)
    with _pytest.raises(ValueError):
        sampling.mixture_plan(df.filter("n > 99"), "g", F.col("n"),
                              token_budget=10.0)
