"""Statistical testing fixtures: Wilcoxon rank-sum midranks + BH FDR."""

import math

from pyspark.sql import Row

from glamr_omics_pipelines_spark.operators import stats


def test_rank_sum_hand_computed_with_ties(spark):
    # feature f: A = {1, 3, 3}, B = {2, 3}
    # sorted: 1(A) 2(B) 3 3 3 -> midrank of the three 3s = (3+4+5)/3 = 4
    # R1 = 1 + 4 + 4 = 9 ; U = 9 - 3*4/2 = 3
    df = spark.createDataFrame(
        [Row(f="f", g="A", v=1.0), Row(f="f", g="A", v=3.0),
         Row(f="f", g="A", v=3.0), Row(f="f", g="B", v=2.0),
         Row(f="f", g="B", v=3.0)])
    r = stats.rank_sum_test(df, "f", "g", "v", "A", "B").collect()[0]
    assert (r.n1, r.n2) == (3, 2)
    assert math.isclose(r.u_stat, 3.0, rel_tol=1e-12)
    mu, sigma = 3.0, math.sqrt(3 * 2 * 6 / 12.0)
    assert math.isclose(r.z_score, (3.0 - mu) / sigma, rel_tol=1e-12)


def test_rank_sum_symmetric_groups_z_zero(spark):
    # identical distributions -> U = n1*n2/2, z = 0
    rows = [Row(f="f", g=g, v=float(v)) for g in ("A", "B")
            for v in (1, 2, 5, 9)]
    r = stats.rank_sum_test(
        spark.createDataFrame(rows), "f", "g", "v", "A", "B").collect()[0]
    assert math.isclose(r.u_stat, 8.0, rel_tol=1e-12)
    assert abs(r.z_score) < 1e-12


def test_rank_sum_empty_side_yields_null_z(spark):
    df = spark.createDataFrame([Row(f="f", g="A", v=1.0),
                                Row(f="f", g="A", v=2.0)])
    r = stats.rank_sum_test(df, "f", "g", "v", "A", "B").collect()[0]
    assert r.z_score is None and r.n2 == 0


def test_bh_adjust_matches_reference_procedure(spark):
    # classic example: p = .01 .02 .03 .04 -> n/rank factors 4,2,4/3,1
    ps = [0.01, 0.04, 0.03, 0.02]
    df = spark.createDataFrame(
        [Row(id=i, p=p) for i, p in enumerate(ps)])
    out = {r.id: r.p_adj for r in stats.bh_adjust(df, "p", "id").collect()}
    # raw: .04, .04, .04, .04 -> all adjusted to 0.04
    for i in range(4):
        assert math.isclose(out[i], 0.04, rel_tol=1e-12)
    # monotone case: p = .01 .2 .9 -> adj = .03, .3, .9
    df2 = spark.createDataFrame([Row(id=0, p=0.01), Row(id=1, p=0.2),
                                 Row(id=2, p=0.9)])
    out2 = {r.id: r.p_adj for r in stats.bh_adjust(df2, "p", "id").collect()}
    assert math.isclose(out2[0], 0.03, rel_tol=1e-12)
    assert math.isclose(out2[1], 0.3, rel_tol=1e-12)
    assert math.isclose(out2[2], 0.9, rel_tol=1e-12)


def test_bh_adjust_capped_at_one_and_monotone(spark):
    df = spark.createDataFrame([Row(id=i, p=p) for i, p in
                                enumerate([0.5, 0.9, 0.95, 0.99])])
    rows = stats.bh_adjust(df, "p", "id").collect()
    by_p = sorted((r.p, r.p_adj) for r in rows)
    assert all(adj <= 1.0 for _, adj in by_p)
    for (_, a1), (_, a2) in zip(by_p, by_p[1:]):
        assert a1 <= a2  # step-up adjustment preserves order


def test_enrichment_2x2_hand_computed(spark):
    # 6 groups: flagged {1,2,3}; term X in {1,2,4}; term Y in {5}
    mem = spark.createDataFrame(
        [Row(g=1, t="X"), Row(g=2, t="X"), Row(g=4, t="X"), Row(g=5, t="Y"),
         Row(g=1, t="X")])  # duplicate membership row must dedup
    flags = spark.createDataFrame(
        [Row(g=i, flagged=i in (1, 2, 3)) for i in range(1, 7)])
    out = {r.t: r for r in stats.enrichment_2x2(
        mem, flags, "g", "t").collect()}
    x = out["X"]
    assert (x.n11, x.n10, x.n01, x.n00) == (2, 1, 1, 2)
    assert math.isclose(x.odds_ratio, 4.0, rel_tol=1e-12)
    # fold: (2/3) / (3/6) = 4/3
    assert math.isclose(x.fold_enrichment, 4 / 3, rel_tol=1e-12)
    y = out["Y"]
    assert (y.n11, y.n10, y.n01, y.n00) == (0, 3, 1, 2)
    assert y.odds_ratio == 0.0 or y.odds_ratio is None
    # margins always sum to the group total
    for r in (x, y):
        assert r.n11 + r.n10 + r.n01 + r.n00 == 6
