"""Bucketed co-located joins: same-key/same-count bucketed tables join with
NO shuffle exchange — the scale substitute for the reference's B-tree
secondary indexes around its biggest repeated join (tpm.R's 400M-row UniRef
lookup chain)."""

from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.sources.warehouse import Warehouse


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        wh = Warehouse(str(tmp_path / "wh"))
        facts = spark.range(0, 10_000).select(
            F.col("id").alias("target"), (F.col("id") % 97).alias("n"))
        dim = spark.range(0, 10_000).select(
            F.col("id").alias("target"), (F.col("id") * 3).alias("length"))
        wh.save_bucketed(facts, "b_facts", "target", buckets=8)
        wh.save_bucketed(dim, "b_dim", "target", buckets=8)
        joined = spark.table("b_facts").join(spark.table("b_dim"), "target")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert joined.count() == 10_000
        # sanity: the same join on plain parquet DOES shuffle
        pf, pd_ = str(tmp_path / "pf"), str(tmp_path / "pd")
        facts.write.parquet(pf)
        dim.write.parquet(pd_)
        plain = spark.read.parquet(pf).join(spark.read.parquet(pd_), "target")
        assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dim")
