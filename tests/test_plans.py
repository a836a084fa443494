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


def test_interval_toolkit_no_python_no_cartesian(spark):
    """Interval merge/coverage are window+agg only; nearest_feature is the
    union-merge (ONE shuffle), never a per-point probe join."""
    for q in ["interval_merge", "genome_coverage", "nearest_feature"]:
        plan = _plan(spark, q)
        assert "CartesianProduct" not in plan, q
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, q
    # nearest_feature must not contain ANY join operator — the union-merge
    # pattern replaces the join with two ordered windows
    nf = _plan(spark, "nearest_feature")
    assert "Join" not in nf


def test_fuzzy_pairs_blocking_is_equi_join(spark):
    """Deletion-neighborhood blocking joins on the variant key — a
    levenshtein theta-join (BroadcastNestedLoop/Cartesian) is the quadratic
    failure mode this operator exists to avoid."""
    plan = _plan(spark, "fuzzy_name_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashjoin" in plan.lower() or "SortMergeJoin" in plan


def test_weighted_sample_scoring_is_scan_stage(spark):
    """The E-S score is row-local arithmetic; the only exchange is the
    per-group top-k window."""
    plan = _plan(spark, "weighted_sample")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_scd2_and_transitions_single_key_shuffle(spark):
    """Run detection + interval emission reuse ONE key partitioning; the
    transition grid agg adds only the (tiny) bigram exchange."""
    scd = _plan(spark, "scd2_history")
    assert "ArrowEvalPython" not in scd and "BatchEvalPython" not in scd
    tr = _plan(spark, "event_transitions")
    assert "CartesianProduct" not in tr


def test_chunk_documents_row_local(spark):
    """Chunking is sequence/posexplode/slice HOFs: no shuffle, no Python."""
    plan = _plan(spark, "chunk_documents")
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_attribution_join_broadcast_interval(spark):
    """The event-time-bounded join keys on user_id (equi) with the time
    bound as residual — never a pure theta/cartesian join."""
    plan = _plan(spark, "attribution_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_data_quality_single_scan_per_table(spark):
    """Rule compilation promises ONE aggregate pass per expectations table:
    orders appears in 1 rule-scan + 2 FK sides, lineitem in 1 + 1."""
    plan = _plan(spark, "data_quality")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("FileScan parquet") <= 6  # 2 rule + 4 FK-side scans


def test_pagerank_iteration_reuses_edge_partitioning(spark):
    """Build ONE pagerank iteration by hand on a pre-partitioned edge frame:
    the rated-edge side must NOT re-exchange when joined on its partition
    key (the Pregel edge-reuse property pagerank's loop relies on)."""
    from pyspark.sql import functions as F
    from glamr_omics_pipelines_spark.operators import graph
    e = spark.createDataFrame(
        [(i, (i + 1) % 50, 1.0) for i in range(50)],
        "src long, dst long, weight double")
    ranks = graph.pagerank(e, iterations=2)
    assert abs(sum(r.rank for r in ranks.collect()) - 1.0) < 1e-9
    # reproduce one iteration's join on a persisted pre-partitioned edge
    # frame with broadcast off: the persisted side must NOT re-exchange
    # (persist keeps the repartition in-plan; localCheckpoint would not)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rated = e.repartition(n_part, F.col("src")).persist()
    rated.count()
    small = spark.createDataFrame([(i, 0.02) for i in range(50)],
                                  "node long, rank double")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = rated.join(small, rated["src"] == small["node"])
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        # the one-time REPARTITION_BY_NUM lives INSIDE the cached build plan
        # (below InMemoryRelation); the reuse property is that nothing above
        # the cache scan re-exchanges on src
        above_cache = plan.split("InMemoryRelation")[0]
        import re as _re
        rated_side_exchanges = _re.findall(
            r"Exchange hashpartitioning\(src", above_cache)
        assert not rated_side_exchanges, plan
        assert "InMemoryTableScan" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        rated.unpersist()


def test_bottomk_sketch_window_is_group_limited(spark):
    """The KMV rank window must NOT be a full per-group sort: Catalyst
    rewrites row_number()<=k into WindowGroupLimit nodes with the Partial
    one BELOW the group exchange, so each map partition ships only its k
    smallest hashes per group. If this rewrite ever regresses (config or
    Spark upgrade), the sketch build becomes a 10^7-row sort per genome at
    corpus scale — fail loudly here instead."""
    from pyspark.sql import functions as F
    from glamr_omics_pipelines_spark.operators import sketches
    d = spark.createDataFrame(
        [(i % 5, f"kmer{i}") for i in range(200)], "g int, s string")
    sk = sketches.bottomk_sketch(d, "g", "s", k=8)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    import re as _re
    # the Partial group-limit must sit BELOW (after, in top-down toString
    # order) the group-only exchange, so the shuffle itself is k-bounded
    # per map partition; the Final one consolidates above it
    group_ex = _re.search(r"Exchange hashpartitioning\(g#\d+, \d+\)", plan)
    assert group_ex, plan
    below = plan[group_ex.end():]
    assert _re.search(r"WindowGroupLimit .*row_number\(\), 8, Partial",
                      below), plan
    assert _re.search(r"WindowGroupLimit .*row_number\(\), 8, Final",
                      plan[:group_ex.start()]), plan


def test_zorder_key_is_scan_stage(spark):
    """The Morton key is a pure codegen expression: no shuffle, no Python,
    no window in the plan."""
    plan = _plan(spark, "zorder_key")
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rank_sum_feature_parallel(spark):
    """Midrank + tie windows must both partition on the feature key —
    a global window here would serialize a million-taxon test."""
    plan = _plan(spark, "rank_sum_test")
    # no single-partition exchange: every Exchange carries the taxon key
    assert "Exchange SinglePartition" not in plan


def test_normalization_trio_broadcast_not_shuffle(spark):
    """CLR/DESeq attach their group-grain statistics via broadcast joins;
    the fact table must not hash-shuffle for the attach."""
    for q in ["clr_transform", "deseq_size_factors"]:
        plan = _plan(spark, q)
        assert "BroadcastHashJoin" in plan, q
        assert "CartesianProduct" not in plan, q


def test_round4b_ops_no_python_no_cartesian(spark):
    """Round-4 continuation operators: pure-JVM plans; the only
    BroadcastNestedLoop allowed is the group-grain pair fan-out in
    mash_distance (sample pairs, corpus-size independent) and the
    documented brute-force pair gen inside dbscan."""
    for q in ["nx_ladder", "resample_fill", "interpolate", "changepoint",
              "triangle_count", "trend_fit", "chi_square", "inverted_index",
              "key_skew", "welch_t", "translate_dna", "seasonal_anomaly",
              "sensor_pipeline"]:
        plan = _plan(spark, q)
        assert "EvalPython" not in plan, q
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoop" not in plan, q


def test_single_exchange_aggregate_ops(spark):
    """trend_fit and welch_t are one-scan partial aggs: exactly one
    hash exchange (plus AQE reads), no windows, no joins."""
    for q in ["trend_fit", "welch_t"]:
        plan = _plan(spark, q)
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, q
        assert "SortMergeJoin" not in plan and "Window" not in plan, q


def test_nx_ladder_windows_share_one_exchange(spark):
    """cumsum + total + row_number must share a single group-key exchange."""
    plan = _plan(spark, "nx_ladder")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_translate_dna_zero_shuffle(spark):
    plan = _plan(spark, "translate_dna")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_seasonal_anomaly_baseline_broadcasts(spark):
    plan = _plan(spark, "seasonal_anomaly")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_triangle_count_caches_and_explodes_once(spark):
    """Regression guards for the two measured plan blowups: the shared edge
    frames must be persisted (InMemoryTableScan present — otherwise every
    reference re-inlines the co-occurrence join), and the per-corner fan-out
    must be ONE explode (Generate), never the 3-way self-union that
    re-executed the wedge+closing joins three times."""
    plan = _plan(spark, "triangle_count")
    assert "InMemoryTableScan" in plan
    # the degree computation's src∪dst union is legitimate; the corner
    # fan-out regression is caught by requiring the explode to be present
    assert "Generate" in plan


def test_late_round4_ops_no_python_no_cartesian(spark):
    for q in ["expanding_distinct", "doc_bigram_lm", "event_paths",
              "geo_clusters", "ab_test", "tfidf_doc_pairs", "shard_assign",
              "feature_hash", "cms_counts", "twap", "spearman",
              "debruijn_stats", "minimizers", "debounce", "session_stats",
              "group_mode", "class_tfidf", "kl_divergence",
              "nearest_station", "metagenome_qc"]:
        plan = _plan(spark, q)
        assert "EvalPython" not in plan, q
        assert "CartesianProduct" not in plan, q


def test_scan_stage_ops_have_zero_exchange(spark):
    """shard_assign and minimizers are pure row-local scans."""
    for q in ["shard_assign", "minimizers"]:
        plan = _plan(spark, q)
        assert "Exchange" not in plan, q


def test_nearest_station_broadcasts_the_dim(spark):
    """The x-fan-out side must be a broadcast (dim), never a shuffle of
    the point table against stations."""
    plan = _plan(spark, "nearest_station")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_final_round4_ops_no_python_no_cartesian(spark):
    for q in ["gini", "benford", "simpson", "zipf_slope", "oov_rate",
              "orf_count", "base_entropy", "burstiness"]:
        plan = _plan(spark, q)
        assert "EvalPython" not in plan, q
        assert "CartesianProduct" not in plan, q


def test_row_local_bio_ops_zero_exchange(spark):
    for q in ["orf_count", "base_entropy", "translate_dna"]:
        plan = _plan(spark, q)
        assert "Exchange" not in plan, q


def test_rfm_segments_no_global_window(spark):
    """The r4 form ran three UNPARTITIONED NTILE windows over the user
    aggregate (single-partition sort ×3, the judge-flagged scale killer);
    the threshold form must have ZERO window operators — just the 1-row
    percentile broadcast and row-local banding."""
    plan = _plan(spark, "rfm_segments")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row threshold attach


def test_gtdb_majority_vote_taxon_grain_plan(spark):
    """Votes reduce to (group, taxon) grain in ONE partial-aggregable
    exchange; both window aggregates share the (cluster, rank) partitioning
    and the final groupBy reuses it — two hash exchanges total, no joins,
    no sort-based most_common materialization anywhere."""
    plan = _plan(spark, "gtdb_majority_vote")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    assert "partial_count" in plan or "partial" in plan  # map-side combine


def test_cms_build_hashes_distinct_items_not_rows(spark):
    """The weighted cms_build path must aggregate to item grain BEFORE the
    md5 explode: the plan shows the count agg below the generate, so hash
    work is per distinct item, not per fact row."""
    plan = _plan(spark, "cms_counts")
    gen_pos = plan.find("Generate explode")
    assert gen_pos != -1
    # a hash aggregate on the item must appear BELOW (after, in the printed
    # tree) the explode that fans out the (r, b) grid keys
    below = plan[gen_pos:]
    assert "hashpartitioning(item" in below


def test_bottomk_sketch_distincts_raw_items_before_hash(spark):
    """bottomk_sketch dedups the raw k-mer (bytes) and hashes survivors;
    md5 must NOT appear below the distinct's exchange in the plan."""
    from glamr_omics_pipelines_spark.operators import sketches
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("g1", "ACGT")], ["g", "kmer"])
    plan = (sketches.bottomk_sketch(df, "g", "kmer", k=4)
            ._jdf.queryExecution().executedPlan().toString())
    # the distinct's exchange partitions on the RAW item column (_i), not
    # the md5 output — proof the hash is computed after the dedup
    assert "hashpartitioning(g#" in plan and ", _i#" in plan
    # and Spark's rank-limit pushdown keeps <=k rows per group per
    # partition ahead of the final window shuffle — assert it stays
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_basket_rules_reuses_distinct_exchange(spark):
    """association_rules reads the (group, item) distinct in three
    branches; Catalyst's ReuseExchange must serve ONE distinct shuffle to
    all of them (an explicit persist measured slower — see the operator
    docstring). If this count drops to zero a refactor broke subplan
    identity and the input scan now runs per branch."""
    df = E.queries()["basket_rules"](spark, SF)
    df.collect()  # AQE finalizes reuse at execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 2


# Catalog-wide anti-pattern lint: every BroadcastNestedLoopJoin in the
# engine belongs to one of three DOCUMENTED classes (PLANS.md): a 1-row
# scalar-aggregate attach (crossJoin of a broadcast one-row total), a
# group-grain pair fan-out (pairs of per-sample/class AGGREGATES, never
# fact rows), or a declared brute-force baseline whose scale path is a
# separate entry point. Anything else — and ANY CartesianProduct or
# row-at-a-time Python eval — is a quadratic/serial plan regression.
BNLJ_ALLOWLIST = {
    # 1-row scalar attach (broadcast single-row aggregate)
    "doc_lm_score", "doc_bigram_lm", "kl_divergence", "kl_top_terms",
    "benford", "rfm_segments", "mixture_sample", "temperature_sample",
    "tfidf_topk", "pmi_collocations", "basket_rules", "enrichment_2x2",
    "psi_drift", "class_tfidf",
    # r9: bm25's N/avgdl corpus stats — the same 1-row scalar attach
    "bm25_search",
    # group-grain pair fan-out (aggregate pairs, corpus-size independent)
    "bray_curtis", "js_divergence", "mash_distance",
    # broadcast-dimension argmin / small-side attach
    "nearest_station",
    # declared brute-force baselines (scale paths: lsh_ann / ivf_ann /
    # dbscan's candidates= hook) and the literal cross join
    "cosine_topk", "embedding_dups", "dbscan", "tfidf_doc_pairs",
    "cross_join_audit",
    # r8: the ADC scan — broadcast side is the QUERY frame carrying
    # precomputed m×k tables (a handful of rows); the scan side reads
    # only the PQ-coded corpus. The intended PQ shape at any scale.
    "pq_ann",
    # r9: the recall harness's EXACT ground-truth side is brute_force_topk
    # (method='brute' — the declared baseline class, same as cosine_topk);
    # the approx side under test is the IVF equi join.
    "ann_recall",
}


@pytest.mark.slow
def test_catalog_wide_plan_lint(spark):
    """Sweep EVERY catalog query's optimized plan: no CartesianProduct, no
    BatchEvalPython/ArrowEvalPython (row-at-a-time UDFs — Arrow-batched
    mapInPandas is a different operator and stays allowed), and
    BroadcastNestedLoopJoin only in the allowlisted, documented cases."""
    qs = E.queries()
    offenders = {}
    for name, fn in qs.items():
        plan = fn(spark, SF)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        flags = [p for p in ("CartesianProduct", "BatchEvalPython",
                             "ArrowEvalPython") if p in plan]
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWLIST:
            flags.append("BroadcastNestedLoopJoin")
        if flags:
            offenders[name] = flags
        spark.catalog.clearCache()
    assert not offenders, f"plan anti-patterns: {offenders}"
    # the allowlist must not rot: names that no longer exist (or no longer
    # plan a BNLJ) should be pruned so the lint stays meaningful
    assert BNLJ_ALLOWLIST <= set(qs), "allowlist names missing from catalog"


def test_benchmark_ledger_broadcast_sacct_and_partial_window(spark):
    """R7 ledger query: sacct (one accounting row per job — dimension-
    sized) must attach via BroadcastHashJoin, and the newest-per-
    (rule,sample) row_number()<=1 must carry the Partial WindowGroupLimit
    below the exchange so retries never ship more than one row per key
    per map partition."""
    plan = _plan(spark, "benchmark_ledger")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "EvalPython" not in plan
    body = plan.split("== Initial Plan ==")[0]
    assert re.search(r"WindowGroupLimit .*row_number\(\), 1, Partial", body)


def test_embedding_dups_above_gate_plan_is_equi_join(spark, monkeypatch):
    """VERDICT r6 #2 done-criterion at the catalog level: with the brute
    ceiling forced below the sf0.001 corpus size, the embedding_dups
    CATALOG query's plan must contain no nested-loop pair generation —
    the auto-derived LSH candidates turn it into equi joins."""
    from glamr_omics_pipelines_spark.operators import similarity
    monkeypatch.setattr(similarity, "_BRUTE_PAIRGEN_MAX_ROWS", 10)
    plan = _plan(spark, "embedding_dups")
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_pq_encode_zero_shuffle_and_adc_broadcast(spark):
    """PQ (r8): encoding is a pure projection — NO exchange, no python
    eval, single codegen scan — and the ADC join broadcasts the query
    side (never the coded corpus)."""
    from glamr_omics_pipelines_spark.operators import similarity
    rows = [(i, [float(i % 5), 1.0, 0.5, 0.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    books = similarity.pq_codebooks_random(m=2, k=4, dsub=2, seed=1)
    codes = similarity.pq_encode(df, "vec_id", "embedding", books)
    cplan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in cplan
    assert "EvalPython" not in cplan and "MapInPandas" not in cplan
    q = spark.createDataFrame([(99, [1.0, 1.0, 0.5, 0.0])],
                              "query_id int, embedding array<double>")
    out = similarity.pq_adc_topk(codes, q, books, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin BuildRight" in plan \
        or "BroadcastNestedLoopJoin BuildLeft" in plan
    # the broadcast build side must be the QUERY frame (query_id scan),
    # never the coded corpus (vec_id scan)
    bcast = plan.split("BroadcastExchange", 1)[1]
    assert "query_id" in bcast and "vec_id" not in bcast


def test_bpe_encode_fold_plan_pure_jvm_zero_shuffle(spark):
    """r9: the rebuilt fold form (Column tree + chunked projections) must
    stay what the r8 form was — a pure-JVM scan-stage op: no Python eval,
    no exchange, and the chunk barriers must SURVIVE optimization (more
    than one codegen-stage projection would collapse back into one
    optimizer-breaking expression only if the length-guard were folded
    away — guard against a Catalyst rule change un-pinning it)."""
    from glamr_omics_pipelines_spark.operators import text as T
    merges = [("a", "b")] * 300   # 3 chunks of 128/128/44
    df = spark.read.parquet(f"{SF}/documents.parquet").select("text")
    out = T.bpe_encode(df, "text", merges, strategy="fold")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan
    # the optimized plan keeps >= 2 chained Projects (the anti-collapse
    # guard held) — a single Project means CollapseProject re-inlined
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("Project") >= 2


def test_bpe_encode_rank_plan_is_single_arrow_scan(spark):
    """The real-vocab rank path is ONE Arrow-batched mapInPandas over the
    scan — zero shuffle (the 100-TB tokenization story)."""
    from glamr_omics_pipelines_spark.operators import text as T
    merges = [(f"Qa{i}", f"Qb{i}") for i in range(1500)]
    df = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id",
                                                              "text")
    out = T.bpe_encode(df, "text", merges)   # auto -> rank above 1024
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


def test_versions_ledger_joins_stay_group_grain(spark):
    """S19: both sides of the final env-grain join are aggregates of the
    version x env x (rule|package) grain — no fact-table fan-out, and the
    plan carries no nested loop."""
    plan = _plan(spark, "versions_ledger")
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_semdedup_cell_scoped_equi_join_no_python(spark):
    """semdedup's pair stage must be an EQUI join on ivf_cell (hash- or
    broadcast-hash) — a nested-loop/cartesian pair generator would be the
    global n^2 the cell scoping exists to avoid — and the whole plan stays
    JVM-side (centroids are expression literals, not a Python stage)."""
    plan = _plan(spark, "semdedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan \
        or "ShuffledHashJoin" in plan


def test_bloom_novelty_broadcast_bitmap_no_python(spark):
    """bloom_novel must attach the (word, bits) bitmap via a BROADCAST
    join — the bitmap is m/32 rows, shuffling the probe side against it
    would defeat the scan-stage gate — with md5 positions computed
    JVM-side."""
    plan = _plan(spark, "bloom_novelty")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_bm25_query_term_filter_before_tf_shuffle(spark):
    """bm25_search: the query-term isin filter must sit DIRECTLY on the
    token explode (pre-aggregation — the tf shuffle carries only query-term
    postings), every multi-row join must be broadcast hash (the only BNLJ
    is the allowlisted 1-row stats attach), and the per-query top-k gets
    the WindowGroupLimit partial pre-cut."""
    plan = _plan(spark, "bm25_search")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # top-down print: the Filter line prints immediately above its child
    # Generate — pin the adjacency (filter pre-agg, on the explode itself)
    f = plan.index(" IN (")
    g = plan.index("Generate explode", f)
    assert g - f < 300, plan[f:g]
    assert "WindowGroupLimit" in plan


def test_url_dedup_single_exchange(spark):
    """url_dedup: normalization is row-local; the URL-grain agg is the ONLY
    exchange (partial agg map-side)."""
    plan = _plan(spark, "url_dedup")
    assert plan.count("Exchange") <= 2  # final agg + AQE read side at most
    assert "Join" not in plan and "InPandas" not in plan


def test_web_curation_one_data_exchange_no_python(spark):
    """web_curation: blocklist/normalize/line-rules row-local; the
    normalized-URL window is the only data-grain exchange; no Python."""
    plan = _plan(spark, "web_curation")
    assert "InPandas" not in plan and "EvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # window sort exchange (+AQE reuse)


def test_phash_single_arrow_scan_banded_join(spark):
    """phash_dedup: the Arrow-batched hash pass feeds a PERSISTED bucket
    table (both self-join sides read the cache — the kernel runs once per
    materialization, the simhash convention); candidates via equi join on
    (band,bucket) — no nested loop."""
    plan = _plan(spark, "phash_dedup")
    assert "MapInPandas" in plan and "InMemoryTableScan" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rp_project_catalog_row_zero_shuffle(spark):
    plan = _plan(spark, "rp_project")
    assert "Exchange" not in plan and "InPandas" not in plan


def test_spread_gate_is_size_adaptive(spark):
    """r11 _spread: below one scan split the scan is fanned out round-robin
    (serial scan-stage work is the micro-file pathology); at or above the
    split size the helper must be a NO-OP returning _t's exact plan — the
    property that makes it scale-neutral (real tables never repartition)."""
    small = E._spread(spark, SF, "documents")
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan_small
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        big = E._spread(spark, SF, "documents")
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        assert "RoundRobinPartitioning" not in plan_big
        assert "Exchange" not in plan_big
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
