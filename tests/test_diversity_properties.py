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


ts_rows = st.lists(
    st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 50),
              st.integers(-5, 5), st.integers(-5, 5)),
    min_size=1, max_size=20)


@settings(**SETTINGS)
@given(ts_rows, st.integers(1, 20))
def test_rolling_corr_matches_python_comoments(spark, rows, W):
    """rolling_corr == a Python per-row trailing-RANGE scan: for every row,
    gather ALL group rows with sec in [sec−W, sec] (tie rows included —
    RANGE semantics), then the same six-co-moment Pearson formula with the
    same n≥2 / nonconstant guards."""
    import datetime
    from glamr_omics_pipelines_spark.operators import timeseries

    base = datetime.datetime(2024, 1, 1)
    data = [(g, base + datetime.timedelta(seconds=s), float(x), float(y))
            for g, s, x, y in rows]
    df = spark.createDataFrame(data, "g string, ts timestamp, x double, y double")
    got = [((r.g, r.ts, r.x, r.y), r.rolling_corr) for r in
           timeseries.rolling_corr(df, "g", "ts", "x", "y",
                                   window_seconds=W).collect()]

    from collections import defaultdict
    per = defaultdict(list)
    for g, s, x, y in rows:
        per[g].append((s, float(x), float(y)))
    for (g, ts, x, y), corr in got:
        sec = int((ts - base).total_seconds())
        win = [(xx, yy) for s, xx, yy in per[g] if sec - W <= s <= sec]
        n = len(win)
        sx = sum(a for a, _ in win); sy = sum(b for _, b in win)
        sxy = sum(a * b for a, b in win)
        sxx = sum(a * a for a, _ in win); syy = sum(b * b for _, b in win)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if n >= 2 and vx > 0 and vy > 0:
            want = (n * sxy - sx * sy) / math.sqrt(vx * vy)
            assert corr is not None and abs(corr - want) < 1e-9
        else:
            assert corr is None


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.sampled_from(["u1", "u2"]), st.integers(0, 30),
                          st.sampled_from(["A", "B", "C"])),
                min_size=1, max_size=15))
def test_transition_counts_match_python_bigrams(spark, rows):
    """transition_counts == Python consecutive-pair Counter per entity
    (deduplicated tie order via a tiebreak column)."""
    import datetime
    from collections import Counter, defaultdict
    from glamr_omics_pipelines_spark.operators import timeseries

    base = datetime.datetime(2024, 1, 1)
    data = [(u, base + datetime.timedelta(seconds=s), st_, i)
            for i, (u, s, st_) in enumerate(rows)]
    df = spark.createDataFrame(data, "u string, ts timestamp, state string, eid int")
    got = {(r.state_from, r.state_to): (r.n, r.prob) for r in
           timeseries.transition_counts(df, ["u"], "ts", "state",
                                        tiebreak_cols=["eid"]).collect()}
    per = defaultdict(list)
    for i, (u, s, st_) in enumerate(rows):
        per[u].append((s, i, st_))
    want = Counter()
    for u, evs in per.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1
    assert set(got) == set(want)
    by_from = Counter()
    for (a, _), c in want.items():
        by_from[a] += c
    for k, c in want.items():
        assert got[k][0] == c
        assert abs(got[k][1] - c / by_from[k[0]]) < 1e-12
