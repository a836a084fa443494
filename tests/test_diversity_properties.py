"""Brute-force parity property tests for the diversity / coverage family —
independent Python implementations on arbitrary hypothesis inputs."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

from hypothesis import given, settings, strategies as st

from glamr_omics_pipelines_spark.operators import abundance, diversity

SETTINGS = dict(max_examples=8, deadline=None)

counts = st.lists(
    st.tuples(st.sampled_from(["s1", "s2", "s3"]),
              st.sampled_from(["t1", "t2", "t3", "t4"]),
              st.integers(0, 20)),
    min_size=1, max_size=20)


def _per_sample(rows):
    agg: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for s, t, n in rows:
        if n > 0:
            agg[s][t] += n
    return {s: dict(ts) for s, ts in agg.items() if ts}


@settings(**SETTINGS)
@given(counts)
def test_shannon_diversity_matches_python(spark, rows):
    df = spark.createDataFrame(rows, "sample string, taxon string, n long")
    # the operator's input grain is one row per (sample, taxon): pre-sum
    d = df.groupBy("sample", "taxon").sum("n") \
        .withColumnRenamed("sum(n)", "n")
    got = {r.sample: (r.shannon, r.richness, r.evenness)
           for r in diversity.shannon_diversity(d, "sample", "n").collect()}
    want = _per_sample(rows)
    assert set(got) == set(want)
    for s, ts in want.items():
        total = sum(ts.values())
        h = -sum((n / total) * math.log(n / total) for n in ts.values())
        rich = len(ts)
        assert abs(got[s][0] - h) < 1e-9
        assert got[s][1] == rich
        if rich > 1:
            assert abs(got[s][2] - h / math.log(rich)) < 1e-9
        else:
            assert got[s][2] is None


@settings(**SETTINGS)
@given(counts)
def test_bray_curtis_matches_python(spark, rows):
    df = spark.createDataFrame(rows, "sample string, taxon string, n long")
    got = {(r.sample_a, r.sample_b): r.bray_curtis
           for r in diversity.bray_curtis_pairs(df, "sample", "taxon",
                                                "n").collect()}
    want_samples = sorted(_per_sample(rows))
    expected_pairs = {(a, b) for i, a in enumerate(want_samples)
                      for b in want_samples[i + 1:]}
    assert set(got) == expected_pairs
    agg = _per_sample(rows)
    for a, b in expected_pairs:
        ta, tb = sum(agg[a].values()), sum(agg[b].values())
        minsum = sum(min(agg[a].get(t, 0), agg[b].get(t, 0))
                     for t in set(agg[a]) | set(agg[b]))
        assert abs(got[(a, b)] - (1 - 2 * minsum / (ta + tb))) < 1e-9


@settings(**SETTINGS)
@given(counts)
def test_chao1_matches_python(spark, rows):
    df = spark.createDataFrame(rows, "sample string, taxon string, n long")
    d = df.groupBy("sample", "taxon").sum("n").withColumnRenamed("sum(n)", "n")
    got = {r.sample: (r.s_obs, r.f1, r.f2, r.chao1)
           for r in diversity.chao1_richness(d, "sample", "n").collect()}
    for s, ts in _per_sample(rows).items():
        s_obs = len(ts)
        f1 = sum(1 for n in ts.values() if n == 1)
        f2 = sum(1 for n in ts.values() if n == 2)
        est = s_obs + f1 * (f1 - 1) / (2 * (f2 + 1))
        assert got[s][:3] == (s_obs, f1, f2)
        assert abs(got[s][3] - est) < 1e-9


depths = st.lists(
    st.tuples(st.sampled_from(["c1", "c2"]), st.integers(0, 30)),
    min_size=1, max_size=25)


@settings(**SETTINGS)
@given(depths, st.sampled_from([0.0, 0.05, 0.1, 0.25]))
def test_coverage_stats_matches_python_rank_trim(spark, rows, trim):
    df = spark.createDataFrame(rows, "contig string, depth long")
    got = {r.contig: r for r in
           abundance.coverage_stats(df, "contig", "depth",
                                    trim_frac=trim).collect()}
    per = defaultdict(list)
    for c, d in rows:
        per[c].append(d)
    assert set(got) == set(per)
    for c, vals in per.items():
        n = len(vals)
        svals = sorted(vals)
        cut = math.floor(n * trim)
        band = svals[cut: n - cut]
        r = got[c]
        assert abs(r["mean"] - sum(vals) / n) < 1e-9
        if band:
            assert abs(r["trimmed_mean"] - sum(band) / len(band)) < 1e-9
        else:
            assert r["trimmed_mean"] is None
        if n > 1:
            assert abs(r["variance"] - statistics.variance(vals)) < 1e-9
        else:
            assert r["variance"] is None
        assert r["covered_bases"] == sum(1 for v in vals if v > 0)
        assert r["count"] == n
