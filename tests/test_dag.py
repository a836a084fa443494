"""StageDAG control plane: topo order, target pruning, skip gates, ledger."""

import pytest
from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.plans.dag import StageDAG, read_ledger


def build_dag(ledger):
    dag = StageDAG(ledger_path=ledger)
    ran = []

    @dag.stage("scan")
    def scan(spark, ctx):
        ran.append("scan")
        return spark.range(10).withColumnRenamed("id", "n")

    @dag.stage("double", deps=["scan"], materialize=True)
    def double(spark, ctx):
        ran.append("double")
        return ctx["scan"].withColumn("n2", F.col("n") * 2)

    @dag.stage("total", deps=["double"])
    def total(spark, ctx):
        ran.append("total")
        return ctx["double"].agg(F.sum("n2").alias("s"))

    @dag.stage("unrelated")
    def unrelated(spark, ctx):
        ran.append("unrelated")
        return None

    return dag, ran


def test_topo_run_and_ledger(spark, tmp_path):
    ledger = str(tmp_path / "ledger.jsonl")
    dag, ran = build_dag(ledger)
    ctx = dag.run(spark)
    assert ctx["total"].collect()[0].s == 90
    assert ran.index("scan") < ran.index("double") < ran.index("total")
    rows = read_ledger(ledger)
    assert [r["stage"] for r in rows if not r["skipped"]] \
        == ["scan", "double", "total", "unrelated"]
    assert next(r for r in rows if r["stage"] == "double")["rows"] == 10


def test_target_pruning(spark, tmp_path):
    dag, ran = build_dag(str(tmp_path / "l.jsonl"))
    dag.run(spark, targets=["double"])
    assert ran == ["scan", "double"]  # 'total' and 'unrelated' not pulled


def test_skip_gate(spark, tmp_path):
    dag = StageDAG(ledger_path=str(tmp_path / "l.jsonl"))

    @dag.stage("a", skip_if=lambda s, c: True)
    def a(spark, ctx):
        raise AssertionError("must not run")

    dag.run(spark)
    rows = read_ledger(str(tmp_path / "l.jsonl"))
    assert rows[0]["skipped"] is True


def test_cycle_detection(spark):
    dag = StageDAG()

    @dag.stage("x", deps=["y"])
    def x(spark, ctx):
        return None

    @dag.stage("y", deps=["x"])
    def y(spark, ctx):
        return None

    with pytest.raises(ValueError, match="cycle"):
        dag.run(spark)
