"""Physical-plan regression tests (SURVEY §4): the scale guarantees —
predicate pushdown to the parquet scan, column pruning, dimension broadcast,
codegen — must survive refactors. These assert plan *properties*, not plan
strings."""

import re
import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return (E.queries()[name](spark, SF)
            ._jdf.queryExecution().executedPlan().toString())


def _pushed(plan: str) -> list[str]:
    return [p for p in re.findall(r"PushedFilters: \[[^\]]*\]", plan)
            if p != "PushedFilters: []"]


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "pricing_summary")
    assert any("LessThanOrEqual(l_shipdate" in p for p in _pushed(plan))
    plan = _plan(spark, "threshold_filter")
    assert any("GreaterThanOrEqual(value,150.0)" in p for p in _pushed(plan))


def test_column_pruning(spark):
    """The 6-agg pricing summary needs 7 lineitem columns, not 11."""
    plan = _plan(spark, "pricing_summary")
    cols = re.findall(r"ReadSchema: struct<([^>]*)", plan)
    assert cols and all(len(c.split(",")) <= 7 for c in cols)


def test_dimension_joins_broadcast(spark):
    """Dim-side joins (part, nation, region, orders-sized) must broadcast —
    a SortMergeJoin against a dimension at 100 TB is a lost shuffle."""
    for q in ["tpm", "topk_revenue", "anvio_stacked", "lca", "bin_summary_view"]:
        plan = _plan(spark, q)
        assert "BroadcastHashJoin" in plan, q
        assert "CartesianProduct" not in plan, q


def test_no_cartesian_in_pair_generators(spark):
    """LSH candidate generation must join on (band, bucket) — an accidental
    cross join here is quadratic in the corpus."""
    for q in ["minhash_dedup", "simhash_dedup", "lsh_ann"]:
        plan = _plan(spark, q)
        assert "CartesianProduct" not in plan, q


def test_whole_stage_codegen_active(spark):
    """'*(n)' markers = codegen'd stages; the scan+agg hot path must carry
    them (a codegen fallback means an interpreted row loop at scale).
    AQE only materializes the final (codegen-annotated) plan after execution."""
    df = E.queries()["pricing_summary"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"\*\(\d+\) HashAggregate", plan)


@pytest.mark.parametrize("query", ["exact_dedup", "text_quality", "token_counts",
                                   "doc_fingerprint", "lang_id"])
def test_text_pipeline_has_no_python_udf(spark, query):
    """Text/dedup operators promise pure-JVM expressions (SURVEY §2.9) —
    BatchEvalPython/ArrowEvalPython in the plan would mean a 10-100x hot-path
    regression at corpus scale."""
    plan = _plan(spark, query)
    assert "EvalPython" not in plan, query


def test_new_queries_pushdown_and_no_udf(spark):
    """binner_completion's custkey bound must reach the orders scan;
    newest_import's window must not silently cross join or drop to Python."""
    plan = _plan(spark, "binner_completion")
    assert any("LessThanOrEqual(o_custkey,200)" in p for p in _pushed(plan))
    for q in ["binner_completion", "newest_import"]:
        plan = _plan(spark, q)
        assert "EvalPython" not in plan, q
        assert "CartesianProduct" not in plan, q


def test_sampling_is_scan_stage_only(spark):
    """hash_sample / stratified_split are row-local: their plans must contain
    no Exchange at all before the (absent) aggregation — membership is a
    scan-stage predicate, which is what makes them free at 100 TB."""
    plan = _plan(spark, "hash_sample")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    plan = _plan(spark, "stratified_split")
    assert "Exchange" not in plan


def test_curation_pipeline_filters_reach_scan(spark):
    """The composed curation plan must push the language gate into the
    parquet scan and stay free of Python eval and cartesian joins."""
    plan = _plan(spark, "curation_pipeline")
    assert any("In(lang" in p for p in _pushed(plan))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_hypertable_rollup_single_scan(spark):
    """ROLLUP must expand grouping sets after one scan — two parquet scans
    would mean the per-granularity rescan the operator exists to avoid."""
    plan = _plan(spark, "hypertable_rollup")
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan


def test_round4_ops_no_python_no_cartesian(spark):
    """Round-4 operators promise pure-JVM plans; the only BroadcastNestedLoop
    allowed is the one-row scalar attach in tfidf_topk."""
    for q in ["dedup_keep_best", "quantile_gate", "normalize_text",
              "session_windows", "kmer_spectrum", "rolling_features",
              "percent_rank_norm", "tfidf_topk", "winsorize", "funnel",
              "snapshot_diff", "corr_stats", "pack_sequences",
              "mad_outliers"]:
        plan = _plan(spark, q)
        assert "EvalPython" not in plan, q
        assert "CartesianProduct" not in plan, q


def test_normalize_text_is_scan_stage(spark):
    """Canonicalization is a row-local regexp chain: no Exchange at all."""
    plan = _plan(spark, "normalize_text")
    assert "Exchange" not in plan


def test_funnel_single_exchange(spark):
    """Three stacked conditional-min windows must share ONE user-key
    exchange — per-stage re-shuffles would triple the funnel's cost."""
    plan = _plan(spark, "funnel")
    assert plan.count("Exchange hashpartitioning") == 1


def test_quantile_gate_threshold_broadcast(spark):
    """Per-group thresholds must come back as a broadcast, not a shuffled
    join of the fact table against itself."""
    plan = _plan(spark, "quantile_gate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_snapshot_diff_join_carries_hashes_not_bodies(spark):
    """The full-outer join input must be (key, md5) projections — the text
    column must not appear in the join's ReadSchema-downstream exchanges."""
    plan = _plan(spark, "snapshot_diff")
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    # the tree prints parents first: the classify Project ABOVE the join must
    # carry only hashes (no md5 computation); every md5 Project prints under
    # its Exchange — i.e. hashing happened map-side, before the shuffle.
    lines = plan.splitlines()
    top_project = next(ln for ln in lines if "Project" in ln)
    assert "md5" not in top_project
    md5_lines = [i for i, ln in enumerate(lines) if "md5(" in ln]
    exchange_lines = [i for i, ln in enumerate(lines) if "Exchange" in ln]
    assert md5_lines and all(any(e < m for e in exchange_lines)
                             for m in md5_lines)


def test_line_dedup_broadcast_anti_join_no_python(spark):
    """The boilerplate set must broadcast into the anti join; an accidental
    shuffled anti join re-exchanges every exploded line, and any Python eval
    would put the whole corpus through a Python worker."""
    plan = _plan(spark, "line_dedup")
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_geo_neighbors_equi_join_not_cross_product(spark):
    """The spatial join must be an equi join on the grid cell — a naive
    distance-predicate join would plan as BroadcastNestedLoop (O(n^2))."""
    plan = _plan(spark, "geo_neighbors")
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_span_dedup_broadcast_gram_join_no_python(spark):
    """The duplicated-gram set must broadcast back onto the gram explode;
    no Python eval anywhere, no cross product."""
    plan = _plan(spark, "span_dedup")
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
