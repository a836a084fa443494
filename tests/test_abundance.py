"""Property tests for abundance math — the invariants the reference itself
asserts (SURVEY §5: TPM sums to 1e6 per sample; rel_abund sums to 1)."""

import math

from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.operators import abundance


def _fixture(spark):
    rows = [("s1", "g1", 10.0, 100), ("s1", "g2", 30.0, 300),
            ("s1", "g3", 60.0, 200), ("s2", "g1", 5.0, 100),
            ("s2", "g2", 15.0, 300)]
    return spark.createDataFrame(rows, ["sample", "gene", "n", "length"])


def test_rel_abund_sums_to_one(spark):
    df = abundance.rel_abund(_fixture(spark), "n", ["sample"])
    sums = {r["sample"]: r["s"] for r in
            df.groupBy("sample").agg(F.sum("rel_abund").alias("s")).collect()}
    assert all(math.isclose(v, 1.0, rel_tol=1e-12) for v in sums.values())


def test_tpm_sums_to_1e6_per_sample(spark):
    df = abundance.tpm(_fixture(spark), "n", "length", ["sample"])
    sums = {r["sample"]: r["s"] for r in
            df.groupBy("sample").agg(F.sum("tpm").alias("s")).collect()}
    assert all(math.isclose(v, 1e6, rel_tol=1e-9) for v in sums.values())


def test_rpkm_formula(spark):
    df = abundance.rpkm(_fixture(spark), "n", "length", ["sample"])
    got = {(r["sample"], r["gene"]): r["rpkm"] for r in df.collect()}
    # s1 total = 100; g1: 10*1e9/(100*100)
    assert math.isclose(got[("s1", "g1")], 10 * 1e9 / (100 * 100))
    assert math.isclose(got[("s2", "g2")], 15 * 1e9 / (20 * 300))


def test_weighted_mean(spark):
    df = spark.createDataFrame([("a", 2.0, 1.0), ("a", 4.0, 3.0)],
                               ["g", "v", "w"])
    out = df.groupBy("g").agg(
        abundance.weighted_mean("v", "w").alias("wm")).collect()[0]
    assert math.isclose(out["wm"], (2 * 1 + 4 * 3) / 4)


def test_coverage_stats_trimmed_mean(spark):
    rows = [("c1", float(d)) for d in [0, 1, 1, 1, 1, 1, 1, 1, 1, 100]]
    df = spark.createDataFrame(rows, ["contig", "depth"])
    out = abundance.coverage_stats(df, "contig", trim_frac=0.1).collect()[0]
    assert out["covered_bases"] == 9
    assert out["count"] == 10
    # trimmed mean excludes the 0 and the 100
    assert math.isclose(out["trimmed_mean"], 1.0)


def test_coverage_stats_quantile_close_to_rank(spark):
    """The sort-free quantile-band variant must agree with rank trimming on
    mean/variance/count exactly and on trimmed_mean within edge tolerance."""
    from glamr_omics_pipelines_spark.operators import abundance as A
    import pyspark.sql.functions as FF
    df = (spark.range(0, 2000)
          .select((FF.col("id") % 4).alias("contig"),
                  ((FF.col("id") * 7919 % 1000) / 10.0).alias("depth")))
    exact = {r.contig: r for r in A.coverage_stats(df, "contig").collect()}
    approx = {r.contig: r
              for r in A.coverage_stats_quantile(df, "contig").collect()}
    for c in exact:
        assert approx[c]["count"] == exact[c]["count"]
        assert abs(approx[c]["mean"] - exact[c]["mean"]) < 1e-9
        assert abs(approx[c]["variance"] - exact[c]["variance"]) < 1e-9
        rel = abs(approx[c]["trimmed_mean"] - exact[c]["trimmed_mean"]) \
            / exact[c]["trimmed_mean"]
        assert rel < 0.01
    plan = A.coverage_stats_quantile(df, "contig") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_quantile_normalize_equal_groups_identical_distributions(spark):
    """After QN, every group carries the SAME value multiset (the defining
    property), and values are the per-rank cross-group means."""
    from pyspark.sql import Row
    from glamr_omics_pipelines_spark.operators.abundance import (
        quantile_normalize)
    df = spark.createDataFrame(
        [Row(g="a", id=1, v=1.0), Row(g="a", id=2, v=5.0),
         Row(g="a", id=3, v=9.0),
         Row(g="b", id=4, v=2.0), Row(g="b", id=5, v=4.0),
         Row(g="b", id=6, v=12.0)])
    out = quantile_normalize(df, "g", "v", "id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.qnorm)
    assert sorted(by_g["a"]) == sorted(by_g["b"]) == [1.5, 4.5, 10.5]
    # lowest-ranked rows of each group map to the rank-1 mean
    lows = {r.id: r.qnorm for r in out}
    assert lows[1] == lows[4] == 1.5


def test_quantile_normalize_unequal_groups_tail_ranks(spark):
    from pyspark.sql import Row
    from glamr_omics_pipelines_spark.operators.abundance import (
        quantile_normalize)
    df = spark.createDataFrame(
        [Row(g="a", id=1, v=1.0), Row(g="a", id=2, v=3.0),
         Row(g="b", id=3, v=2.0)])
    out = {r.id: r.qnorm
           for r in quantile_normalize(df, "g", "v", "id").collect()}
    assert out[1] == 1.5 and out[3] == 1.5   # rank 1 mean of (1, 2)
    assert out[2] == 3.0                     # rank 2: only group a reaches it


def test_clr_transform_zero_mean_per_sample(spark):
    """Defining property: clr values sum to 0 within each sample; zero
    counts are excluded."""
    import math
    from pyspark.sql import Row
    from glamr_omics_pipelines_spark.operators.abundance import clr_transform
    df = spark.createDataFrame(
        [Row(s="a", t=1, c=1.0), Row(s="a", t=2, c=10.0),
         Row(s="a", t=3, c=100.0), Row(s="a", t=4, c=0.0),
         Row(s="b", t=1, c=5.0), Row(s="b", t=2, c=5.0)])
    out = clr_transform(df, "s", "c").collect()
    by = {}
    for r in out:
        by.setdefault(r.s, []).append(r.clr)
    assert abs(sum(by["a"])) < 1e-12 and len(by["a"]) == 3  # zero dropped
    assert by["b"] == [0.0, 0.0]  # equal parts -> clr 0
    # a's clr of the middle taxon: ln(10) - mean(ln 1, ln 10, ln 100) = 0
    mid = [r.clr for r in out if r.s == "a" and r.t == 2][0]
    assert abs(mid) < 1e-12


def test_deseq_size_factors_scale_recovery(spark):
    """Samples that are exact scalar multiples of a base profile must get
    size factors proportional to their scales (the DESeq2 guarantee)."""
    import math
    from pyspark.sql import Row
    from glamr_omics_pipelines_spark.operators.abundance import (
        deseq_size_factors)
    base = {1: 10.0, 2: 20.0, 3: 40.0}
    rows = []
    for s, scale in (("a", 1.0), ("b", 2.0), ("c", 0.5)):
        rows += [Row(s=s, t=t, c=v * scale) for t, v in base.items()]
    df = spark.createDataFrame(rows)
    out = {r.s: r.size_factor
           for r in deseq_size_factors(df, "s", "t", "c").collect()}
    assert math.isclose(out["b"] / out["a"], 2.0, rel_tol=1e-9)
    assert math.isclose(out["c"] / out["a"], 0.5, rel_tol=1e-9)


def test_deseq_size_factors_zero_taxon_excluded(spark):
    from pyspark.sql import Row
    from glamr_omics_pipelines_spark.operators.abundance import (
        deseq_size_factors)
    df = spark.createDataFrame(
        [Row(s="a", t=1, c=10.0), Row(s="a", t=2, c=0.0),
         Row(s="b", t=1, c=10.0), Row(s="b", t=2, c=99.0)])
    out = {r.s: r.size_factor
           for r in deseq_size_factors(df, "s", "t", "c").collect()}
    # taxon 2 has a zero in sample a -> excluded; only taxon 1 contributes
    # (exp(avg(ln)) round-trip leaves an ulp; compare with tolerance)
    import math as _m
    assert _m.isclose(out["a"], 1.0, rel_tol=1e-12)
    assert _m.isclose(out["b"], 1.0, rel_tol=1e-12)


def test_group_sum_attach_null_keys_and_no_window(spark):
    """r11: the group-total attach is an agg + null-safe join, not a
    partition-only window (which lands every fact row on <= #groups
    partitions). Null sample keys must still form ONE group, exactly as
    Window.partitionBy grouped them."""
    rows = [("s1", 10.0), ("s1", 30.0), (None, 5.0), (None, 15.0)]
    df = spark.createDataFrame(rows, ["sample", "n"])
    out = abundance.rel_abund(df, "n", ["sample"])
    got = {(r["sample"], r["n"]): r["rel_abund"] for r in out.collect()}
    assert math.isclose(got[("s1", 10.0)], 0.25)
    assert math.isclose(got[(None, 5.0)], 0.25)
    assert math.isclose(got[(None, 15.0)], 0.75)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
