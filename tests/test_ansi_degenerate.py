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


def test_parse_lineage_truncated_path_fills_null(spark):
    # a lineage shorter than the rank ladder must NA-fill the missing ranks
    # (merge_kraken_tax.R separate fill='right'), not raise ANSI OOB
    from glamr_omics_pipelines_spark.operators import taxonomy
    df = spark.createDataFrame([("d__Bacteria;p__Proteo",), ("d__Archaea",)],
                               "lineage string")
    out = taxonomy.parse_lineage(df, "lineage").collect()
    by = {r["lineage"]: r for r in out}
    assert by["d__Archaea"]["kingdom"] == "Archaea"
    assert by["d__Archaea"]["phylum"] is None  # truncated, not a crash
    assert by["d__Bacteria;p__Proteo"]["phylum"] == "Proteo"


def test_load_hmm_tblout_truncated_line_nulls_fields(spark, tmp_path):
    from glamr_omics_pipelines_spark.pipelines import glamr
    p = tmp_path / "hits.tblout"
    p.write_text(
        "# comment\n"
        "16S_bac - read1 - 5 900 12 880 10 890 1500 + 1e-50 250.0 1.1 ok\n"
        "SHORT LINE\n")  # truncated: far fewer whitespace fields
    rows = glamr.load_hmm_tblout(spark, str(p)).collect()
    assert len(rows) == 2
    bad = [r for r in rows if r["target_name"] == "SHORT"][0]
    assert bad["evalue"] is None and bad["score"] is None


def test_load_gene_abundance_malformed_header_nulls_fields(spark, tmp_path):
    from glamr_omics_pipelines_spark.pipelines import glamr
    p = tmp_path / "sampA_genes.rpkm"
    good = ("sampA_c1_1 # 10 # 400 # 1 # ID=1;gc_cont=0.50"
            "\t400\t100\t1.0\t10\t2.0\t5\t3.0")
    bad = "just_a_gene_name\t100\t10\t1.0\t1\t1.0\t1\t1.0"  # no ' # ' blocks
    p.write_text("#File\t_\n#Reads\t_\n#Mapped\t_\n#RefSequences\t_\n"
                 "#Name\tLength\tBases\tCoverage\tReads\tRPKM\tFrags\tFPKM\n"
                 + good + "\n" + bad + "\n")
    rows = glamr.load_gene_abundance(spark, str(p)).collect()
    by = {r["gene"]: r for r in rows}
    assert by["sampA_c1_1"]["left"] == 10
    assert abs(by["sampA_c1_1"]["gc_content"] - 0.5) < 1e-12
    mal = by["just_a_gene_name"]
    assert mal["left"] is None and mal["gc_content"] is None


def test_ks_empty_side_yields_null_not_error(spark):
    # the original crash: every row in one group -> ECDF denominator 0
    df = spark.createDataFrame([("f", "a", float(v)) for v in (1, 2, 3)],
                               "feat string, grp string, val double")
    got = stats.ks_test(df, "feat", "grp", "val", "a", "b").collect()[0]
    assert got["n_b"] == 0 and got["ks_d"] is None
