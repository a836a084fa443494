"""pipe_tool external-command hatch + salted skew join."""

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from glamr_omics_pipelines_spark.operators.external import pipe_tool, salted_join


def test_pipe_tool_roundtrip_through_awk(spark):
    df = spark.createDataFrame(
        [("c1", 10), ("c2", 25), ("c3", 7)], ["contig", "depth"])
    out_schema = StructType([StructField("contig", StringType()),
                             StructField("double_depth", LongType())])
    # external "tool": awk doubles the depth column
    out = pipe_tool(df, "awk -F'\\t' '{print $1\"\\t\"($2*2)}'", out_schema)
    got = {r.contig: r.double_depth for r in out.collect()}
    assert got == {"c1": 20, "c2": 50, "c3": 14}


def test_pipe_tool_casts_to_contract(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    schema = StructType([StructField("k", StringType()),
                         StructField("score", DoubleType())])
    out = pipe_tool(df, "awk -F'\\t' '{print $1\"\\t\"($2/2)}'", schema)
    row = out.collect()[0]
    assert row.score == 0.5 and isinstance(row.score, float)


def test_salted_join_matches_plain_join(spark):
    # hot key: 'x' carries 90% of the large side
    large = spark.createDataFrame(
        [("x", i) for i in range(90)] + [("y", i) for i in range(10)],
        ["k", "v"])
    small = spark.createDataFrame([("x", "hot"), ("y", "cold"), ("z", "none")],
                                  ["k", "label"])
    salted = salted_join(large, small, "k", salt=4)
    plain = large.join(small, "k")
    assert salted.count() == plain.count() == 100
    assert (salted.groupBy("label").count().orderBy("label").collect()
            == plain.groupBy("label").count().orderBy("label").collect())
    # every large row kept exactly once despite the replication
    assert salted.select(F.count(F.lit(1))).collect()[0][0] == 100
