"""Degenerate-input hardening under ANSI mode: operators whose denominators
can be exactly 0 (not null) must yield null / drop the row — never raise
SparkArithmeticException, which would kill a whole 100 TB job over one bad
group or vector. Each test here reproduces a case that previously crashed
(or guards one that was fixed in the same sweep)."""

from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.operators import (abundance, dedup,
                                                   sampling, similarity,
                                                   stats)


def test_rel_abund_all_zero_group_yields_null(spark):
    df = spark.createDataFrame(
        [("s1", "t1", 0.0), ("s1", "t2", 0.0),
         ("s2", "t1", 3.0), ("s2", "t2", 1.0)],
        "sample string, taxon string, n double")
    out = {(r["sample"], r["taxon"]): r["rel_abund"]
           for r in abundance.rel_abund(df, "n", ["sample"]).collect()}
    assert out[("s1", "t1")] is None and out[("s1", "t2")] is None
    assert abs(out[("s2", "t1")] - 0.75) < 1e-12


def test_tpm_and_rpkm_degenerate_groups_yield_null(spark):
    df = spark.createDataFrame(
        [("s1", 0.0, 100.0), ("s1", 0.0, 200.0), ("s2", 10.0, 0.0)],
        "sample string, n double, len double")
    t = abundance.tpm(df, "n", "len", ["sample"]).collect()
    assert all(r["tpm"] is None for r in t)  # s1 all-zero; s2 zero-length
    r = abundance.rpkm(df, "n", "len", ["sample"]).collect()
    assert all(x["rpkm"] is None for x in r)


def test_weighted_mean_zero_weights_yields_null(spark):
    df = spark.createDataFrame([(1.0, 0.0), (2.0, 0.0)], "v double, w double")
    got = df.agg(abundance.weighted_mean("v", "w").alias("m")).collect()[0]
    assert got["m"] is None


def test_cosine_sim_zero_vector_yields_null(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [1.0, 0.0])],
        "id int, a array<double>, b array<double>")
    got = {r["id"]: r["c"] for r in
           df.select("id", similarity.cosine_sim("a", "b").alias("c"))
           .collect()}
    assert got[1] is None and abs(got[2] - 1.0) < 1e-12


def test_embedding_dups_zero_vector_pair_dropped_not_crashed(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id int, emb array<double>")
    got = dedup.embedding_cosine_dups(df, "vec_id", "emb",
                                      threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(2, 3)]


def test_gram_matrix_single_embedding_sample_cov_null(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])],
                               "vec_id int, emb array<double>")
    got = similarity.gram_matrix(df, "emb", centered=True,
                                 sample_covariance=True).collect()
    assert len(got) == 4 and all(r["value"] is None for r in got)


def test_mixture_sample_zero_target_group_dropped(spark):
    df = spark.createDataFrame([("a", i) for i in range(20)]
                               + [("b", i) for i in range(20)],
                               "lang string, doc_id int")
    out = sampling.mixture_sample(df, "lang", "doc_id",
                                  {"a": 1.0, "b": 0.0})
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"a"}  # zero-target group excluded, no divide error


def test_ks_empty_side_yields_null_not_error(spark):
    # the original crash: every row in one group -> ECDF denominator 0
    df = spark.createDataFrame([("f", "a", float(v)) for v in (1, 2, 3)],
                               "feat string, grp string, val double")
    got = stats.ks_test(df, "feat", "grp", "val", "a", "b").collect()[0]
    assert got["n_b"] == 0 and got["ks_d"] is None
