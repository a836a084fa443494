"""Brute-force parity property tests (hypothesis) for the statistics
family: each Spark co-moment / window-rank formulation is checked against
a direct pure-Python transcription of the textbook definition on
arbitrary small inputs — ties, duplicates, degenerate groups included."""

import math

from hypothesis import given, settings, strategies as st

from glamr_omics_pipelines_spark.operators import abundance, stats, timeseries

SETTINGS = dict(max_examples=8, deadline=None)


def _midranks(values):
    """Average-rank (midrank) assignment over a list, tie-aware."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and values[order[j]] == values[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of positions i+1 .. j
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


_two_group_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(-5, 5)),
    min_size=2, max_size=24)


@settings(**SETTINGS)
@given(_two_group_rows)
def test_rank_sum_matches_bruteforce(spark, rows):
    df = spark.createDataFrame([("f", g, float(v)) for g, v in rows],
                               "feat string, grp string, val double")
    got = stats.rank_sum_test(df, "feat", "grp", "val", "a", "b").collect()[0]
    vals = [float(v) for _, v in rows]
    ranks = _midranks(vals)
    r1 = sum(r for (g, _), r in zip(rows, ranks) if g == "a")
    n1 = sum(1 for g, _ in rows if g == "a")
    n2 = len(rows) - n1
    assert got["n1"] == n1 and got["n2"] == n2
    if n1 == 0:  # empty A side: U is undefined (null), like z
        assert got["u_stat"] is None and got["z_score"] is None
        return
    u = r1 - n1 * (n1 + 1) / 2.0
    assert abs(got["u_stat"] - u) < 1e-9
    sigma = math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    if sigma > 0:
        assert abs(got["z_score"] - (u - n1 * n2 / 2.0) / sigma) < 1e-9
    else:
        assert got["z_score"] is None


@settings(**SETTINGS)
@given(_two_group_rows)
def test_welch_t_matches_bruteforce(spark, rows):
    df = spark.createDataFrame([("f", g, float(v)) for g, v in rows],
                               "feat string, grp string, val double")
    got = stats.welch_t_test(df, "feat", "grp", "val", "a", "b").collect()[0]
    xa = [float(v) for g, v in rows if g == "a"]
    xb = [float(v) for g, v in rows if g == "b"]
    assert got["n_a"] == len(xa) and got["n_b"] == len(xb)
    if len(xa) < 2 or len(xb) < 2:
        assert got["t_stat"] is None and got["welch_dof"] is None
        return
    ma, mb = sum(xa) / len(xa), sum(xb) / len(xb)
    va = sum((x - ma) ** 2 for x in xa) / (len(xa) - 1)
    vb = sum((x - mb) ** 2 for x in xb) / (len(xb) - 1)
    sea, seb = va / len(xa), vb / len(xb)
    se2 = sea + seb
    if se2 <= 0:
        assert got["t_stat"] is None
        return
    assert abs(got["t_stat"] - (ma - mb) / math.sqrt(se2)) < 1e-6
    dof = se2 * se2 / (sea * sea / (len(xa) - 1) + seb * seb / (len(xb) - 1))
    assert abs(got["welch_dof"] - dof) < 1e-6
    ratio = (ma + 1) / (mb + 1) if mb != -1 else None
    if ratio is not None and ratio > 0:
        assert abs(got["log2_fc"] - math.log2(ratio)) < 1e-9
    else:  # log2 of a non-positive ratio: Spark yields null, not NaN/error
        assert got["log2_fc"] is None


_xy_rows = st.lists(st.tuples(st.integers(-4, 4), st.integers(-4, 4)),
                    min_size=2, max_size=20)


@settings(**SETTINGS)
@given(_xy_rows)
def test_spearman_matches_bruteforce(spark, rows):
    df = spark.createDataFrame([("g", float(x), float(y)) for x, y in rows],
                               "grp string, x double, y double")
    got = stats.spearman_corr(df, "grp", "x", "y").collect()[0]
    rx = _midranks([x for x, _ in rows])
    ry = _midranks([y for _, y in rows])
    n = len(rows)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    assert got["n"] == n
    if vx <= 0 or vy <= 0:  # constant variable: undefined rho
        assert got["spearman_rho"] is None
        return
    rho = (n * sxy - sx * sy) / math.sqrt(vx * vy)
    assert abs(got["spearman_rho"] - rho) < 1e-9


@settings(**SETTINGS)
@given(_two_group_rows)
def test_ks_matches_bruteforce(spark, rows):
    df = spark.createDataFrame([("f", g, float(v)) for g, v in rows],
                               "feat string, grp string, val double")
    got = stats.ks_test(df, "feat", "grp", "val", "a", "b").collect()[0]
    xa = sorted(float(v) for g, v in rows if g == "a")
    xb = sorted(float(v) for g, v in rows if g == "b")
    assert got["n_a"] == len(xa) and got["n_b"] == len(xb)
    if not xa or not xb:
        assert got["ks_d"] is None
        return
    grid = sorted(set(xa) | set(xb))
    d = max(abs(sum(1 for x in xa if x <= t) / len(xa)
                - sum(1 for x in xb if x <= t) / len(xb)) for t in grid)
    assert abs(got["ks_d"] - round(d, 6)) < 1e-6


_ab_rows = st.lists(st.tuples(st.sampled_from(["a", "b"]),
                              st.integers(0, 1)),
                    min_size=1, max_size=24)


@settings(**SETTINGS)
@given(_ab_rows)
def test_two_proportion_z_matches_bruteforce(spark, rows):
    df = spark.createDataFrame([("g", v, s) for v, s in rows],
                               "grp string, variant string, success int")
    got = stats.two_proportion_ztest(df, "grp", "variant", "success",
                                     "a", "b").collect()[0]
    na = sum(1 for v, _ in rows if v == "a")
    nb = sum(1 for v, _ in rows if v == "b")
    sa = sum(s for v, s in rows if v == "a")
    sb = sum(s for v, s in rows if v == "b")
    assert got["n_a"] == na and got["n_b"] == nb
    pool = (sa + sb) / len(rows)
    if na == 0 or nb == 0 or pool in (0.0, 1.0):
        assert got["z_score"] is None
        return
    z = ((sa / na - sb / nb)
         / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb)))
    assert abs(got["z_score"] - z) < 1e-9


_nonneg = st.lists(st.integers(0, 20), min_size=1, max_size=20)


@settings(**SETTINGS)
@given(_nonneg)
def test_gini_matches_bruteforce(spark, vals):
    df = spark.createDataFrame([("g", i, float(v)) for i, v in enumerate(vals)],
                               "grp string, tid int, val double")
    got = abundance.gini_coefficient(df, ["grp"], "val", "tid").collect()[0]
    n, s = len(vals), float(sum(vals))
    assert got["n"] == n
    if s == 0:
        assert got["gini"] is None
        return
    # ascending sort; the tiebreak makes rank order deterministic but ties
    # in value contribute symmetrically, so plain sorted() matches
    xs = sorted(float(v) for v in vals)
    g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * s) - (n + 1) / n
    assert abs(got["gini"] - g) < 1e-9
    assert -1e-9 <= got["gini"] <= 1  # concentration is bounded


_gap_secs = st.lists(st.integers(0, 3600), min_size=1, max_size=20)


@settings(**SETTINGS)
@given(_gap_secs)
def test_burstiness_matches_bruteforce(spark, secs):
    import datetime as dt
    base = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("k", i, base + dt.timedelta(seconds=s)) for i, s in enumerate(secs)],
        "key string, eid int, ts timestamp")
    rows = timeseries.burstiness(df, "key", "ts", "eid").collect()
    srt = sorted(secs)
    gaps = [float(b - a) for a, b in zip(srt, srt[1:])]
    if not gaps:
        assert rows == [] or rows[0]["n_gaps"] == 0
        return
    got = rows[0]
    assert got["n_gaps"] == len(gaps)
    mu = sum(gaps) / len(gaps)
    assert abs(got["mean_gap_sec"] - mu) < 1e-6
    if len(gaps) < 2:
        assert got["burstiness"] is None
        return
    var = sum((g - mu) ** 2 for g in gaps) / (len(gaps) - 1)
    sd = math.sqrt(var) if var >= 0 else None
    if sd is None or sd + mu <= 0:
        assert got["burstiness"] is None
    else:
        assert abs(got["burstiness"] - (sd - mu) / (sd + mu)) < 1e-6
