"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2,
implemented through the ``glamr_omics_pipelines_spark`` library, with a
value-identical DuckDB oracle in ``oracle_sql()``. Computed float columns are
rounded to 4 decimals on BOTH sides so partial-aggregation order cannot
perturb the value hash; computed integer columns are cast to bigint on both
sides so pandas dtypes agree.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from functools import reduce

from glamr_omics_pipelines_spark.operators import abundance, dedup, external, joins, multimodal
from glamr_omics_pipelines_spark.operators import diversity, entity, graph, intervals
from glamr_omics_pipelines_spark.operators import layout, sketches, stats, validate
from glamr_omics_pipelines_spark.operators import sampling, similarity, text, timeseries
from glamr_omics_pipelines_spark.operators import taxonomy, web, windows
from glamr_omics_pipelines_spark.operators.reshape import (
    pivot_longer, pivot_wider, separate_longer_delim)
from glamr_omics_pipelines_spark.functions import bio
from glamr_omics_pipelines_spark.sources import retention, sequences
from glamr_omics_pipelines_spark.sources import spreadsheets
from glamr_omics_pipelines_spark.sources import sqlite as sqlite_src
from glamr_omics_pipelines_spark.sources.warehouse import (
    agg_snapshot, merge_agg_snapshots,
    profile_table as warehouse_profile_table,
    snapshot_diff as warehouse_snapshot_diff)
from glamr_omics_pipelines_spark.streaming.ingest import (
    session_window_counts, stream_interval_join, windowed_event_counts)

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """_t plus a size-gated round-robin fan-out (guide §2.5, unsplittable
    input → repartition after read): a file smaller than one scan split is
    ONE task, so every scan-stage operator above it (shingle explodes, md5
    scoring, marker-token scans) runs serially on one core until the first
    exchange. Fanning the rows out first costs one tiny shuffle and buys
    #cores-way parallelism for that work. The gate is the FILE SIZE versus
    the scan split size, so on any multi-split table (every real table at
    scale) this is a no-op and the plan is byte-identical to _t's.

    Applied per-query ONLY where the scan-stage CPU dominates — it was
    A/B-measured per consumer (r11): shingle/hash-heavy rows win 25-70%
    (vocab_growth 2.27→0.69, mash sketch 3.49→1.28, weighted_sample
    1.49→1.02, lang_id 0.49→0.37), while cheap-scan aggregates LOSE
    (cms_counts 0.58→1.30, spearman, seqkit_stats, kmer_spectrum) because
    the extra exchange outweighs the parallelized work — so this must stay
    a per-call-site decision, not a _t default."""
    df = _t(spark, sf_dir, name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            # directory-layout table (normal Spark output): size = sum of
            # data files, NOT the directory inode (~4KB), which would
            # invert the gate and repartition every multi-split table
            sz = sum(os.path.getsize(os.path.join(r, f))
                     for r, _, fs in os.walk(path) for f in fs)
        else:
            sz = os.path.getsize(path)
    except OSError:
        return df
    conf = str(spark.conf.get("spark.sql.files.maxPartitionBytes",
                              "134217728")).strip().lower()
    m = re.fullmatch(r"(\d+)\s*(b|k|kb|m|mb|g|gb)?", conf)
    if m:
        mult = {"b": 1, None: 1, "k": 1 << 10, "kb": 1 << 10,
                "m": 1 << 20, "mb": 1 << 20,
                "g": 1 << 30, "gb": 1 << 30}[m.group(2)]
        split = int(m.group(1)) * mult
    else:
        split = 128 * 1024 * 1024
    if sz >= split:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts normalized to TimestampType.

    The driver's events.parquet stores TIMESTAMP(NANOS), which the vectorized
    Parquet reader rejects; read nanos as long (legacy conf, runtime-settable)
    and truncate to microseconds — the same floor the duckdb oracle's
    epoch_us() applies.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ→TIMESTAMP cast below is value-preserving only under UTC; the
    # driver may hand us a builder-default session, so pin it here (runtime-
    # settable) rather than relying on the library's get_spark having run.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = _t(spark, sf_dir, "events")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        # integer DIV, not /1000-then-cast: nanos exceed 2^53, so the double
        # round-trip perturbs values by up to ~128 ns — enough to flip a
        # microsecond boundary the duckdb oracle truncates exactly.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # value-preserving under the UTC session tz; unix_micros and window()
        # only accept TIMESTAMP, so normalize once at the chokepoint.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _r4(c):
    return F.round(c, 4)


def _r4n(c):
    """4dp round with a +1e-9 boundary nudge (see q_text_quality): for
    values whose exact double sits within ~1e-12 of a .xxxx5 decimal
    boundary, Spark (BigDecimal HALF_UP) and DuckDB (x*10^4 multiply
    then round) can disagree by one rendered digit; nudging both engines
    identically off the boundary makes the rendered values agree."""
    return F.round(F.col(c) + F.lit(1e-9) if isinstance(c, str)
                   else c + F.lit(1e-9), 4)


# ---------------------------------------------------------------------------
# Core relational operators (SURVEY §2.2-§2.7)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """A1/A3 multi-agg + P2 filter (the reference's group-stats shape,
    code/standardize_bins.R:153-157)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(_r4(F.sum("l_quantity")).alias("sum_qty"),
                 _r4(F.sum("l_extendedprice")).alias("sum_base_price"),
                 _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                 .alias("sum_disc_price"),
                 _r4(F.avg("l_quantity")).alias("avg_qty"),
                 _r4(F.avg("l_discount")).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def q_topk_revenue(spark, sf_dir):
    """J1 join chain + A1 agg + §2.6 sort/limit top-k."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    rev = (li.groupBy("l_orderkey")
           .agg(_r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .alias("revenue")))
    return (rev.join(o, rev.l_orderkey == o.o_orderkey)
            .select("o_orderkey", "o_orderpriority", "revenue")
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
            .limit(10))


def q_skew_join_salted(spark, sf_dir):
    """Salted skew join (SURVEY §4 AQE-skew alternative): lineitem⨝part with
    the small side replicated 8 ways and the fact side scattered across
    replicas — same result as the plain equi join (the oracle), with no
    single hot-key reducer. Revenue per brand."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice",
                                              "l_discount")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = external.salted_join(li.withColumnRenamed("l_partkey", "p_partkey"),
                             p, "p_partkey", salt=8)
    return (j.groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n"),
                 _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                 .alias("revenue")))


def q_rel_abund(spark, sf_dir):
    """A5 grouped normalize: rel_abund = n / sum(n) over sample
    (merge_bracken.R:64-65); sample≈o_orderpriority, taxon≈l_returnflag."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    n = (li.join(o, li.l_orderkey == o.o_orderkey)
         .groupBy("o_orderpriority", "l_returnflag")
         .agg(F.sum("l_quantity").alias("n")))
    out = abundance.rel_abund(n, "n", ["o_orderpriority"])
    return out.select("o_orderpriority", "l_returnflag",
                      _r4("n").alias("n"), _r4("rel_abund").alias("rel_abund"))


def q_tpm(spark, sf_dir):
    """A6 TPM: 1e6*(n/len)/sum(n/len) over sample (tpm.R:24-30);
    len≈p_size via the J4 length-attach join chain."""
    li, o, p = (_t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"),
                _t(spark, sf_dir, "part"))
    n = (li.join(o, li.l_orderkey == o.o_orderkey)
         .groupBy("o_orderpriority", "l_partkey")
         .agg(F.sum("l_quantity").alias("n"))
         .join(F.broadcast(p.select("p_partkey", "p_size")),
               F.col("l_partkey") == F.col("p_partkey")))
    out = abundance.tpm(n, "n", "p_size", ["o_orderpriority"])
    return (out.filter(F.col("l_partkey") < 200)
            .select("o_orderpriority", "l_partkey", _r4("tpm").alias("tpm")))


def q_rpkm(spark, sf_dir):
    """A6 RPKM: n*1e9/(sample_total*len) (summarize_marker_gene_read_mapping.R:45-52)."""
    li, o, p = (_t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"),
                _t(spark, sf_dir, "part"))
    n = (li.join(o, li.l_orderkey == o.o_orderkey)
         .groupBy("o_orderpriority", "l_partkey")
         .agg(F.sum("l_quantity").alias("n"))
         .join(F.broadcast(p.select("p_partkey", "p_size")),
               F.col("l_partkey") == F.col("p_partkey")))
    out = abundance.rpkm(n, "n", "p_size", ["o_orderpriority"])
    return (out.filter(F.col("l_partkey") < 200)
            .select("o_orderpriority", "l_partkey", _r4("rpkm").alias("rpkm")))


def q_top1_per_group(spark, sf_dir):
    """W1 slice_min/with_ties=FALSE: best line per order
    (summarize_hmmscan.R:58-62)."""
    li = _t(spark, sf_dir, "lineitem")
    best = windows.top1_by_agg(
        li, ["l_orderkey"],
        order=[("l_extendedprice", False), ("l_linenumber", True)],
        payload=["l_linenumber", "l_extendedprice"])
    return best.select("l_orderkey", "l_linenumber",
                       _r4("l_extendedprice").alias("best_price"))


def q_tie_discard_top1(spark, sf_dir):
    """W1 tie-discarding winner (hmm_summarize.py:125-153): max-quantity line
    per order kept only when uniquely held."""
    li = _t(spark, sf_dir, "lineitem")
    out = windows.tie_discard_top1_agg(li, ["l_orderkey"], "l_quantity",
                                       payload=["l_linenumber"],
                                       tiebreak="l_linenumber")
    return out.select("l_orderkey", "l_linenumber",
                      _r4("l_quantity").alias("best_qty"))


def q_retention_ladder(spark, sf_dir):
    """W3 lag-based retention (postgres.Rmd:270-280): day-over-day event
    counts per type."""
    ev = _events(spark, sf_dir)
    daily = (ev.groupBy("event_type",
                        F.date_format("ts", "yyyy-MM-dd").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    out = windows.lag_retention_ladder(daily, ["event_type"], "day", "n",
                                       out="pct_of_prev")
    return out.select("event_type", "day", "n", _r4("pct_of_prev").alias("pct_of_prev"))


def q_anvio_stacked(spark, sf_dir):
    """W2 the anvio stacked-window MV (postgres.Rmd:1418-1532): three window
    layers over candidate hits. gene≈order, hit≈lineitem, score≈extendedprice,
    threshold≈p_retailprice, e_value≈l_discount."""
    li, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    hits = (li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                    li.l_partkey == F.col("p_partkey"))
            .select(F.col("l_orderkey").alias("gene"),
                    F.col("l_partkey").alias("hit"),
                    F.col("l_extendedprice").alias("score"),
                    F.col("p_retailprice").alias("thrshld"),
                    F.col("l_discount").alias("e_value")))
    out = windows.anvio_stacked_filter(hits, "gene", "score", "thrshld",
                                       "e_value", e_cutoff=0.06,
                                       score_frac=0.5, tiebreak_cols=["hit"])
    return out.select("gene", "hit", _r4("score").alias("score"),
                      _r4("thrshld").alias("thrshld"))


def q_pivot_wider(spark, sf_dir):
    """R1 pivot_wider with values_fill=0 (merge_bracken.R:68-78):
    mktsegment × region customer counts."""
    c, n, r = (_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation"),
               _t(spark, sf_dir, "region"))
    joined = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    out = pivot_wider(joined, ["c_mktsegment"], "r_name",
                      F.count(F.lit(1)), values=REGIONS, fill=0)
    return out.orderBy("c_mktsegment")


def q_binner_completion(spark, sf_dir):
    """R2 completion-flag pivot (standardize_bins.R:104-112): did every
    'binner' (order status) produce output for each 'sample' (customer)?
    Pivot to bool flags + an all-complete column — the reference's
    7-binner completeness audit shape."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    counts = pivot_wider(o, ["o_custkey"], "o_orderstatus",
                         F.count(F.lit(1)), values=["F", "O", "P"], fill=0)
    flags = counts.select(
        "o_custkey",
        *[(F.col(s) > 0).alias(f"has_{s}") for s in ("F", "O", "P")])
    return (flags.withColumn(
        "complete", F.col("has_F") & F.col("has_O") & F.col("has_P"))
        .orderBy("o_custkey"))


def q_newest_import(spark, sf_dir):
    """W4 newest-row-per-group by time (import.Rmd:122-125: latest import
    per (sampleID, read_dir) by date): latest order per customer,
    orderkey-desc tiebreak."""
    o = _t(spark, sf_dir, "orders")
    newest = windows.top1_by_agg(
        o, ["o_custkey"],
        order=[("o_orderdate", False), ("o_orderkey", False)],
        payload=["o_orderkey", "o_orderdate"])
    return newest.select(
        "o_custkey", "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))


def q_pivot_longer(spark, sf_dir):
    """R4 pivot_longer (postgres.Rmd:270): per-nation stats to long form."""
    c, n = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    stats = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .groupBy("n_name")
             .agg(_r4(F.avg("c_acctbal")).alias("avg_acctbal"),
                  F.count(F.lit(1)).cast("double").alias("n_customers")))
    return pivot_longer(stats, ["n_name"], ["avg_acctbal", "n_customers"],
                        name_col="metric", value_col="value")


def q_anti_join(spark, sf_dir):
    """J6/P9 anti-join (new-files-only ingestion shape, postgres.Rmd:246-248):
    customers with no orders."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (c.join(o.select(F.col("o_custkey").alias("c_custkey")).distinct(),
                   "c_custkey", "left_anti")
            .select("c_custkey", "c_name"))


def q_semi_join(spark, sf_dir):
    """J5 semi join (ampliconTrunc.R:86): customers with an open order."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O") \
        .select(F.col("o_custkey").alias("c_custkey"))
    return (c.join(open_, "c_custkey", "left_semi")
            .select("c_custkey", "c_name"))


def q_bin_summary_view(spark, sf_dir):
    """J3 multi-way left-join view + §2.9 regexp_extract
    (bin_summary view, postgres.Rmd:124-165): supplier≈bin with its
    number regexp-extracted from the name."""
    s, n, r = (_t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation"),
               _t(spark, sf_dir, "region"))
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left")
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
            .select("s_suppkey", "s_name",
                    F.regexp_extract("s_name", r"Supplier#0*(\d+)", 1)
                    .cast("bigint").alias("sup_num"),
                    "n_name", "r_name",
                    _r4("s_acctbal").alias("s_acctbal")))


def q_rollup_ladder(spark, sf_dir):
    """§2.4 rank-ladder rollup: the bracken K/P/C/O/F/G/S one-row-per-rank
    table == GROUP BY ROLLUP (postgres.Rmd:708 semantics)."""
    c, n, r = (_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation"),
               _t(spark, sf_dir, "region"))
    joined = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    out = taxonomy.rank_ladder_rollup(
        joined, ["r_name", "n_name"],
        [_r4(F.sum("c_acctbal")).alias("sum_acctbal"),
         F.count(F.lit(1)).alias("n_customers")])
    return out.select(F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
                      F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
                      "sum_acctbal", "n_customers")


def q_subtree_rollup(spark, sf_dir):
    """A2 hierarchical subtree rollup via lineage-closure join
    (tax_abund_from_contigs.R:72-88): region→nation→customer tree,
    abundance = acctbal at the leaves; one shuffle replaces the reference's
    per-taxon taxonkit subprocess fan-out."""
    c, n, r = (_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation"),
               _t(spark, sf_dir, "region"))
    leaves = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
              .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node_id"),
                      F.array(F.concat(F.lit("r:"), F.col("r_name")),
                              F.concat(F.lit("n:"), F.col("n_name")),
                              F.concat(F.lit("c:"), F.col("c_custkey")))
                      .alias("path"),
                      F.col("c_acctbal").alias("abund")))
    closure = taxonomy.lineage_closure(leaves, "node_id", "path")
    abund = leaves.select(F.col("node_id"), F.col("abund"))
    out = taxonomy.subtree_rollup(abund, closure, "node_id", "abund")
    return out.select(F.col("node").alias("node_id"),
                      _r4("abund_direct").alias("abund_direct"),
                      _r4("abund_w_subtax").alias("abund_w_subtax"))


def q_lca(spark, sf_dir):
    """A11 LCA aggregate (AnnotateContigs.pl MakeLCA, mmseqs --lca-mode 3):
    per order, the most-specific common [region, nation] prefix of its
    suppliers — computed with the min/max lexicographic-prefix trick, no
    collect_list."""
    li, s, n, r = (_t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "supplier"),
                   _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region"))
    hits = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("l_orderkey", F.array("r_name", "n_name").alias("path")))
    out = taxonomy.lca_aggregate(hits, ["l_orderkey"], "path")
    return out.select(
        "l_orderkey",
        F.array_size("lca_path").cast("bigint").alias("lca_depth"),
        F.coalesce(F.try_element_at("lca_path", F.lit(-1)), F.lit("root")).alias("lca_name"))


def q_gtdb_majority_vote(spark, sf_dir):
    """GTDB→NCBI majority-vote translation
    (gtdb_to_ncbi_majority_vote.py:259-345): per cluster × rank, the winning
    *named* taxon over member votes, or 'none'.  Synthetic member votes from
    the customer table: clusters = nations; the genus vote has a 60%
    cluster-dominant taxon (majority exists), a 10% unnamed 'g__' slice, and
    a 30% segment-based minority; the species vote is deliberately
    fragmented (no majority → 'none').  Winner rule is integer-exact — see
    operators.taxonomy.ncbi_majority_vote."""
    c = _t(spark, sf_dir, "customer")
    genus = c.select(
        F.col("c_nationkey").cast("bigint").alias("cluster_id"),
        F.lit("genus").alias("rank_name"),
        F.when(F.col("c_custkey") % 10 == 0, F.lit("g__"))
         .when(F.col("c_custkey") % 10 <= 6,
               F.concat(F.lit("g__Cluster"),
                        (F.col("c_nationkey") % 7).cast("string")))
         .otherwise(F.concat(F.lit("g__"), F.col("c_mktsegment")))
         .alias("taxon"))
    species = c.select(
        F.col("c_nationkey").cast("bigint").alias("cluster_id"),
        F.lit("species").alias("rank_name"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("s__"))
         .otherwise(F.concat(F.lit("s__"), F.col("c_mktsegment"), F.lit("_"),
                             (F.col("c_custkey") % 2).cast("string")))
         .alias("taxon"))
    votes = genus.unionByName(species)
    return taxonomy.ncbi_majority_vote(
        votes, ["cluster_id", "rank_name"], "taxon")


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (streaming-shaped batch op): 30-min gap
    sessions per user over events."""
    ev = _events(spark, sf_dir)
    sess = windows.sessionize(ev, "user_id", "ts", gap_seconds=1800)
    return (sess.groupBy("user_id")
            .agg(F.max("session_id").cast("bigint").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


def q_windowed_counts(spark, sf_dir):
    """§2.10 event-time tumbling window + watermark semantics (batch form of
    streaming/ingest.windowed_event_counts)."""
    ev = _events(spark, sf_dir)
    out = windowed_event_counts(ev, "ts", "event_type", "1 hour")
    return out.select(F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
                      .alias("window_start"),
                      "event_type", "n", _r4("sum_value").alias("sum_value"))


def q_asof_join(spark, sf_dir):
    """As-of join (engine extension; the reference's nearest analog is
    interval containment by string convention, postgres.Rmd:1194-1199): each
    purchase event attached to the user's latest click at-or-before it.
    Union-merge implementation — ONE shuffle on user_id, zero join blowup."""
    ev = _events(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "event_id", "ts", "value"))
    out = joins.asof_join(purchases, clicks, on=["user_id"],
                          left_ts="ts", right_ts="ts", tiebreak="event_id",
                          right_prefix="click_")
    return out.select(
        "event_id", "user_id", windows.epoch_us("ts").alias("ts_us"),
        F.col("click_event_id").alias("click_id"),
        windows.epoch_us("click_ts").alias("click_ts_us"),
        _r4("click_value").alias("click_value"))


def q_range_join(spark, sf_dir):
    """Binned range join (engine extension; bedtools-style containment,
    SURVEY §2.3 note): per error event, activity of the same user inside the
    10-minute window starting at the error — point-in-interval as an EQUI
    join on (user_id, time_bin), never a nested-loop non-equi join."""
    ev = _events(spark, sf_dir).withColumn("ts_us", windows.epoch_us("ts"))
    win_us = 600 * 1_000_000
    intervals = (ev.filter(F.col("event_type") == "error")
                 .select(F.col("event_id").alias("error_id"), "user_id",
                         F.col("ts_us").alias("start_us"),
                         (F.col("ts_us") + win_us).alias("end_us")))
    points = ev.select("user_id", "ts_us", "value")
    hits = joins.range_join_binned(points, intervals, keys=["user_id"],
                                   point_col="ts_us", start_col="start_us",
                                   end_col="end_us", bin_width=win_us)
    return (hits.groupBy("error_id")
            .agg(F.count(F.lit(1)).alias("n_in_window"),
                 _r4(F.sum("value")).alias("sum_value")))


def q_interval_overlap(spark, sf_dir):
    """Interval-overlap join (bedtools-intersect analog): per error event,
    the user's purchase windows overlapping the error's 10-minute window —
    binned equi join, first-shared-bin dedup, no nested loop."""
    ev = _events(spark, sf_dir).withColumn("ts_us", windows.epoch_us("ts"))
    e_win, p_win = 600 * 1_000_000, 300 * 1_000_000
    errs = (ev.filter(F.col("event_type") == "error")
            .select(F.col("event_id").alias("error_id"), "user_id",
                    F.col("ts_us").alias("e_start"),
                    (F.col("ts_us") + e_win).alias("e_end")))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"), "user_id",
                     F.col("ts_us").alias("p_start"),
                     (F.col("ts_us") + p_win).alias("p_end")))
    hits = joins.interval_join_binned(errs, purch, ["user_id"],
                                      "e_start", "e_end", "p_start", "p_end",
                                      bin_width=e_win)
    return (hits.groupBy("error_id")
            .agg(F.count(F.lit(1)).alias("n_overlaps"),
                 F.min("purchase_id").alias("first_purchase_id")))


def q_embedding_covariance(spark, sf_dir):
    """Sample covariance matrix of the embedding corpus, long-form
    (operators/similarity.py:gram_matrix, strategy="arrow"): per-Arrow-batch
    BLAS partial Gramian XᵀX emitting ≤ d² rows per batch, merged by a
    bounded groupBy(i, j) — measured 2.3× faster than the nested-posexplode
    form at sf0.1 and ~d× less map-side CPU at 100 TB (the explode
    materializes d² cells per corpus ROW; the BLAS form touches each cell
    once per batch). Equivalence to the explode form is property-tested
    (test_gram_arrow_matches_explode). The PCA/whitening statistic whose
    eigen loop then runs driver-side (top_principal_component)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.gram_matrix(emb, "embedding", centered=True,
                                 sample_covariance=True, strategy="arrow")
    return out.select("i", "j", _r4("value").alias("cov"))


def q_sqlite_roundtrip(spark, sf_dir):
    """S10 driver row (sources/sqlite.py:read_sqlite; reference
    `code/bakta_db.R:6-12` reads annotation tables out of a SQLite file):
    a 50-row documents slice is written into a stdlib sqlite3 database
    (driver-side — the reference's SQLite tables are metadata-scale by
    contract), read back through the affinity-typed source, and rolled up
    per lang. The oracle aggregates the same slice straight off parquet,
    so the value hash checks the sqlite leg: declared-affinity typing,
    batched fetch, off-type tolerance."""
    import sqlite3
    import tempfile
    d = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
         .select("doc_id", "lang", "source", "n_chars"))
    rows = sorted((r.doc_id, r.lang, r.source, r.n_chars)
                  for r in d.collect())
    db = os.path.join(tempfile.gettempdir(),
                      f"glamr_sqlite_roundtrip_{os.getpid()}.db")
    if os.path.exists(db):
        os.remove(db)
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE docs (doc_id INTEGER, lang TEXT,"
                    " source TEXT, n_chars INTEGER)")
        con.executemany("INSERT INTO docs VALUES (?,?,?,?)", rows)
    con.close()
    back = sqlite_src.read_sqlite(spark, db, "docs")
    return (back.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.countDistinct("source").alias("n_sources")))


def q_xlsx_roundtrip(spark, sf_dir):
    """S5 driver row (sources/spreadsheets.py write_xlsx -> read_xlsx;
    reference `code/check_import_status.R:17-22` readxl::read_excel):
    a 40-row documents slice goes out through the stdlib SpreadsheetML
    writer and back through the reader (all-string contract, exactly how
    the reference pipes read_excel output into typed loaders), then a
    per-lang rollup after re-typing. The oracle aggregates the same slice
    off parquet, so the hash checks the xlsx leg: inline-string escaping,
    numeric cell round-trip, header handling."""
    import tempfile
    d = (_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
         .select("doc_id", "lang", "n_chars"))
    rows = sorted((r.doc_id, r.lang, r.n_chars) for r in d.collect())
    path = os.path.join(tempfile.gettempdir(),
                        f"glamr_xlsx_roundtrip_{os.getpid()}.xlsx")
    spreadsheets.write_xlsx(
        path, [["doc_id", "lang", "n_chars"]] + [list(r) for r in rows],
        sheet_name="documents")
    back = spreadsheets.read_xlsx(spark, path, sheet="documents")
    return (back.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("n_chars").cast("bigint")).alias("sum_chars"),
                 F.max(F.col("n_chars").cast("bigint")).alias("max_chars")))


def q_quantize_embeddings(spark, sf_dir):
    """Per-dimension min-max int8 quantization of embeddings, long form
    (operators/similarity.py:quantize_embeddings): d-row bounds broadcast
    back onto a row-local rescale — the storage-compression step before
    product quantization in a vector pipeline."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.quantize_embeddings(emb, "vec_id", "embedding")


def q_storage_reclaim(spark, sf_dir):
    """Warehouse retention/vacuum report (sources/retention.py;
    code/reduce_storage.R:17-45): a deterministic synthetic file inventory
    (megahit intermediate contigs + raw reads per sample, finished-assembly /
    decon-reads artifacts for a subset) is rolled up to the per-(rule,
    sample) "safe to delete, N bytes reclaimable" report. Both the engine
    and the oracle synthesize the identical inventory from `documents`, so
    the hash checks the path-parse -> existence-join -> rollup core."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    base = "data/omics/metagenomes/samp_%d"
    doc, k = F.col("doc_id"), F.col("k")
    inter = (d.select("doc_id", F.explode(F.array(
                F.lit(21), F.lit(33), F.lit(55))).alias("k"))
             .select(F.format_string(
                         base + "/assembly/megahit/intermediate_contigs/"
                                "k%d.contigs.fa", "doc_id", "k").alias("path"),
                     ((doc * 31 + k * 7) % 9000 + 1000).alias("file_size")))
    fin = (d.filter(doc % 3 != 0)
           .select(F.format_string(
                       base + "/assembly/megahit/final.contigs.renamed.fa",
                       "doc_id").alias("path"),
                   (doc % 500 + 64).alias("file_size")))
    raw = (d.select("doc_id", F.explode(F.array(
                F.lit("fwd"), F.lit("rev"))).alias("dirn"))
           .select(F.format_string(
                       base + "/reads/raw_%s_reads.fastq.gz",
                       "doc_id", "dirn").alias("path"),
                   ((doc * 17) % 50000 + 5000).alias("file_size")))
    dec = (d.filter(doc % 2 == 0)
           .select(F.format_string(
                       base + "/reads/decon_fwd_reads_fastp.fastq.gz",
                       "doc_id").alias("path"),
                   (doc % 300 + 32).alias("file_size")))
    inv = inter.unionByName(fin).unionByName(raw).unionByName(dec)
    rules = [
        retention.ReclaimRule(
            "megahit_intermediate",
            r"data/omics/metagenomes/(samp_\d+)/assembly/megahit/"
            r"intermediate_contigs/",
            r"data/omics/metagenomes/(samp_\d+)/assembly/megahit/"
            r"final\.contigs\.renamed\.fa$"),
        retention.ReclaimRule(
            "raw_reads",
            r"data/omics/metagenomes/(samp_\d+)/reads/"
            r"raw_(?:fwd|rev)_reads\.fastq\.gz$",
            r"data/omics/metagenomes/(samp_\d+)/reads/"
            r"decon_fwd_reads_fastp\.fastq\.gz$"),
    ]
    rep = retention.storage_reclaim(inv, rules)
    return rep.select("rule", "sample_id",
                      F.col("n_files").cast("bigint").alias("n_files"),
                      F.col("bytes").cast("bigint").alias("bytes"),
                      "eligible")


def q_streaming_replay_rollup(spark, sf_dir):
    """Batch-replay oracle row for the foreachBatch state machinery
    (VERDICT r6 #3; streaming/ingest.py:streaming_rollup_ingest — the
    always-on form of the reference's incremental re-aggregation,
    postgres.Rmd:246-292): the lineitem slice is split into three parquet
    files, drained by a REAL availableNow file-stream run with
    maxFilesPerTrigger=1 (three micro-batches through the crash-atomic
    versioned-snapshot state swap), and the FINAL state table is the
    result — which must equal the one-shot batch rollup the oracle
    computes over the same rows (sums of integral doubles are exact, so
    the 3-way incremental merge cannot drift). n_batches pins that the
    incremental path actually ran (three merges, not one pass-through)."""
    import shutil
    import tempfile
    from glamr_omics_pipelines_spark.streaming import ingest as s_ingest
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    root = tempfile.mkdtemp(prefix="stream_replay_")
    try:
        src = os.path.join(root, "src")
        for i in range(3):
            (li.filter(F.col("l_orderkey") % 3 == i)
             .coalesce(1).write.mode("append").parquet(src))
        stream = (spark.readStream.schema(li.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        s_ingest.streaming_rollup_ingest(
            stream, ["l_returnflag", "l_linestatus"], "l_quantity",
            state_dir=os.path.join(root, "state"),
            checkpoint=os.path.join(root, "ckpt"))
        st, applied = s_ingest._read_state(spark, os.path.join(root, "state"))
        # state is group-grain (a handful of rows) — materialize before
        # the temp dir is removed; the lazy plan would otherwise read a
        # deleted path at driver-collect time
        out = spark.createDataFrame(st.collect(), st.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return (out.select(
        "l_returnflag", "l_linestatus",
        F.col("agg_n").cast("bigint").alias("n"),
        _r4("agg_sum").alias("sum_qty"),
        _r4("agg_min").alias("min_qty"),
        _r4("agg_max").alias("max_qty"),
        _r4(F.col("agg_sum") / F.col("agg_n")).alias("mean_qty"))
        .withColumn("n_batches", F.lit(int(applied) + 1).cast("bigint")))


def q_bpe_encode(spark, sf_dir):
    """BPE tokenizer application (operators/text.py:bpe_encode — the
    inference side of learn_bpe_merges, the step a frozen tokenizer runs
    over the whole corpus): a FIXED merge list (the tokenizer model —
    data-independent, so the oracle replicates it literally, while the
    Lloyd-like trainer stays pytest-covered) with chained rules
    ('t'+'h'→'th' then 'th'+'e</w>'→'the</w>') exercising iterative
    merging and end-of-word merges. Output: token count + the first 12
    tokens — pins both the merge fold and the word/marker framing.

    r12: _spread — the 8-rule replace-chain is scan-stage CPU over a
    sub-split file (interleaved A/B min-of-6: 0.95 -> 0.35 s)."""
    d = _spread(spark, sf_dir, "documents")
    merges = [("t", "h"), ("th", "e</w>"), ("i", "n"), ("a", "n"),
              ("an", "d</w>"), ("e", "r"), ("o", "n"), ("in", "g</w>")]
    out = text.bpe_encode(d, "text", merges)
    return out.select(
        "doc_id",
        F.array_size("bpe_tokens").cast("bigint").alias("n_bpe"),
        F.array_join(F.slice("bpe_tokens", 1, 12), " ").alias("head_toks"))


def q_pq_ann(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.py:pq_encode /
    pq_adc_topk — the memory-compression search path beside IVF and LSH):
    the embeddings corpus is PQ-coded against DATA-INDEPENDENT seeded
    codebooks (pq_codebooks_random — the oracle regenerates the identical
    literals, so the encode + asymmetric-distance machinery gets a
    value-exact SQL oracle without the non-SQL Lloyd loop mattering),
    then each query ranks the coded corpus by ADC (m table lookups per
    pair). train_pq_codebooks (the production path) is covered by
    pytest.

    r12: _spread — the PQ encode argmins are scan-stage CPU over a sub-split file (interleaved A/B min-of-5: 0.67 -> 0.57 s)."""
    emb = _spread(spark, sf_dir, "embeddings")
    books = similarity.pq_codebooks_random(m=4, k=8, dsub=16, seed=7)
    codes = similarity.pq_encode(emb, "vec_id", "embedding", books)
    queries = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.pq_adc_topk(codes, queries, books, k=3)
    return out.select("query_id", "neighbor_id", _r4("adc").alias("adc"),
                      F.col("rank").cast("bigint").alias("rank"))


def q_ivfpq_ann(spark, sf_dir):
    """IVF+PQ composition (operators/similarity.py:ivfpq_encode /
    ivfpq_adc_topk — IVFADC, the canonical memory-AND-compute-bounded
    vector-store shape, VERDICT r8 #4): the corpus is indexed as
    (id, ivf_cell, pq_codes) in one row-local projection against
    DATA-INDEPENDENT seeded codebooks + centroids (the pq_ann oracle
    pattern — both engines regenerate identical literals, so the
    cell-assign + probe + ADC machinery is value-exact without the
    non-SQL Lloyd loops mattering); each query probes its 3 nearest of 8
    cells and ADC-ranks only those cells' rows through a broadcast EQUI
    join on ivf_cell — never the flat scan's nested loop. The trained
    forms (train_ivf_centroids + train_pq_codebooks) are pytest-covered,
    including probe-all == flat-ADC exactness.

    r12: _spread — the cell-assign + PQ encode are scan-stage CPU over a sub-split file (interleaved A/B min-of-4: 1.07 -> 0.75 s)."""
    emb = _spread(spark, sf_dir, "embeddings")
    books = similarity.pq_codebooks_random(m=4, k=8, dsub=16, seed=7)
    cents = similarity.ivf_centroids_random(k=8, dim=64, seed=11)
    idx = similarity.ivfpq_encode(emb, "vec_id", "embedding", books, cents)
    queries = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivfpq_adc_topk(idx, queries, books, cents, k=3,
                                    nprobe=3)
    return out.select("query_id", "neighbor_id", _r4("adc").alias("adc"),
                      F.col("rank").cast("bigint").alias("rank"))


def _ivfpq_ann_sql() -> str:
    """Oracle for q_ivfpq_ann: seeded codebooks AND centroids as VALUES
    literals; cell = argmin squared-L2 over centroids (struct-min over
    (dist, ci)), probes = the 3 nearest cells per query (row_number over
    dist asc, ci asc), candidates = enc ⨝ probes on the cell, ADC as in
    _pq_ann_sql. (x-y)*(x-y) and ascending-index sums on both sides so
    float folds associate identically."""
    from glamr_omics_pipelines_spark.operators import similarity as sim
    books = sim.pq_codebooks_random(m=4, k=8, dsub=16, seed=7)
    cents = sim.ivf_centroids_random(k=8, dim=64, seed=11)
    dsub, dim, nprobe = 16, 64, 3
    cb_vals = ", ".join(
        f"({s}, {j}, [{', '.join(repr(x) for x in cw)}]::DOUBLE[])"
        for s, cb in enumerate(books) for j, cw in enumerate(cb))
    ct_vals = ", ".join(
        f"({ci}, [{', '.join(repr(x) for x in cv)}]::DOUBLE[])"
        for ci, cv in enumerate(cents))
    return f"""
        WITH cb(s, j, cw) AS (VALUES {cb_vals}),
        ct(ci, cv) AS (VALUES {ct_vals}),
        q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 5),
        celld AS (
          SELECT e.vec_id, ct.ci,
                 list_sum(list_transform(generate_series(1, {dim}),
                   i -> (e.embedding[i]::DOUBLE - cv[i])
                        * (e.embedding[i]::DOUBLE - cv[i]))) AS dist
          FROM embeddings e, ct),
        cell AS (
          SELECT vec_id, (min(row(dist, ci)))[2] AS ivf_cell
          FROM celld GROUP BY vec_id),
        qcelld AS (
          SELECT q.query_id, ct.ci,
                 list_sum(list_transform(generate_series(1, {dim}),
                   i -> (q.qv[i] - cv[i]) * (q.qv[i] - cv[i]))) AS dist
          FROM q, ct),
        probes AS (
          SELECT query_id, ci FROM (
            SELECT query_id, ci,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY dist ASC, ci ASC) AS pr
            FROM qcelld) WHERE pr <= {nprobe}),
        d AS (
          SELECT e.vec_id, cb.s, cb.j,
                 list_sum(list_transform(generate_series(1, {dsub}),
                   i -> (e.embedding[cb.s * {dsub} + i]::DOUBLE - cw[i])
                        * (e.embedding[cb.s * {dsub} + i]::DOUBLE - cw[i])))
                   AS dist
          FROM embeddings e, cb),
        enc AS (
          SELECT vec_id, s, (min(row(dist, j)))[2] AS code
          FROM d GROUP BY vec_id, s),
        adc AS (
          SELECT q.query_id, cb.s, cb.j,
                 list_sum(list_transform(generate_series(1, {dsub}),
                   i -> (q.qv[cb.s * {dsub} + i] - cw[i])
                        * (q.qv[cb.s * {dsub} + i] - cw[i]))) AS t
          FROM q, cb),
        pair AS (
          SELECT a.query_id, e.vec_id AS neighbor_id, sum(a.t) AS adc
          FROM enc e
          JOIN cell c ON c.vec_id = e.vec_id
          JOIN probes p ON p.ci = c.ivf_cell
          JOIN adc a ON e.s = a.s AND e.code = a.j
                    AND a.query_id = p.query_id
          WHERE e.vec_id <> a.query_id
          GROUP BY a.query_id, e.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id, adc,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY round(adc, 6) ASC, neighbor_id ASC) AS rank
          FROM pair)
        SELECT query_id, neighbor_id, round(adc, 4) AS adc,
               CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 3
    """


def _semdedup_sql() -> str:
    """Oracle for q_semdedup: seeded centroids as VALUES literals; cell =
    argmin squared-L2 (struct-min over (dist, ci), index-asc on ties — the
    ivfpq convention); within-cell pairs with round-6 cosine >= 0.95;
    dup_of = min smaller same-cell id; keep = dup_of IS NULL."""
    from glamr_omics_pipelines_spark.operators import similarity as sim
    cents = sim.ivf_centroids_random(k=4, dim=64, seed=11)
    dim = 64
    ct_vals = ", ".join(
        f"({ci}, [{', '.join(repr(x) for x in cv)}]::DOUBLE[])"
        for ci, cv in enumerate(cents))
    return f"""
        WITH ct(ci, cv) AS (VALUES {ct_vals}),
        corpus AS (
          SELECT vec_id, embedding::DOUBLE[] AS e
          FROM embeddings WHERE vec_id < 100
          UNION ALL
          SELECT vec_id + 10000, embedding::DOUBLE[]
          FROM embeddings WHERE vec_id < 100),
        celld AS (
          SELECT c.vec_id, ct.ci,
                 list_sum(list_transform(generate_series(1, {dim}),
                   i -> (c.e[i] - cv[i]) * (c.e[i] - cv[i]))) AS dist
          FROM corpus c, ct),
        cell AS (
          SELECT vec_id, (min(row(dist, ci)))[2] AS ivf_cell
          FROM celld GROUP BY vec_id),
        base AS (
          SELECT c.vec_id, cell.ivf_cell, c.e
          FROM corpus c JOIN cell USING (vec_id)),
        dups AS (
          SELECT b.vec_id, min(a.vec_id) AS dup_of
          FROM base a JOIN base b
            ON a.ivf_cell = b.ivf_cell AND a.vec_id < b.vec_id
          WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.95
          GROUP BY b.vec_id)
        SELECT base.vec_id, CAST(base.ivf_cell AS BIGINT) AS ivf_cell,
               dups.dup_of, dups.dup_of IS NULL AS keep
        FROM base LEFT JOIN dups USING (vec_id)
    """


def _quality_classifier_sql() -> str:
    """Oracle for q_quality_classifier: the identical seeded weight array
    as a DOUBLE[] literal; per-token md5 bucket lookup summed per doc
    (fold order differs from the engine's array fold — round-4 absorbs
    the reassociation ulp, the standing convention); empty docs keep the
    bias-only score via the left join."""
    import random
    rng = random.Random(13)
    w = [rng.gauss(0.0, 0.5) for _ in range(256)]
    wl = "[" + ", ".join(repr(x) for x in w) + "]::DOUBLE[]"
    return f"""
        WITH t AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x <> '')) AS tok
          FROM documents),
        s AS (
          SELECT doc_id,
                 sum(({wl})[CAST(CAST(concat('0x', substr(md5(concat('feat:',
                       tok)), 1, 8)) AS BIGINT) % 256 AS INT) + 1]) AS z
          FROM t GROUP BY doc_id)
        SELECT d.doc_id,
               round(1.0 / (1.0 + exp(-(0.1 + coalesce(s.z, 0)))), 4)
                 AS score,
               (round(1.0 / (1.0 + exp(-(0.1 + coalesce(s.z, 0)))), 4)
                >= 0.5) AS keep
        FROM documents d LEFT JOIN s USING (doc_id)
    """


def _ann_recall_sql() -> str:
    """Oracle for q_ann_recall: replicate the IVF partial probe (cell
    argmin, top-2 probe cells per query by dist asc / ci asc, per-cell
    candidate ranking) and the exact brute-force ranking, then the hit
    join + query-grain recall arithmetic."""
    from glamr_omics_pipelines_spark.operators import similarity as sim
    cents = sim.ivf_centroids_random(k=8, dim=64, seed=11)
    dim, nprobe, k = 64, 2, 5
    ct_vals = ", ".join(
        f"({ci}, [{', '.join(repr(x) for x in cv)}]::DOUBLE[])"
        for ci, cv in enumerate(cents))
    return f"""
        WITH ct(ci, cv) AS (VALUES {ct_vals}),
        corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        q AS (SELECT vec_id AS query_id, e AS qe
              FROM corpus WHERE vec_id < 8),
        celld AS (
          SELECT c.vec_id, ct.ci,
                 list_sum(list_transform(generate_series(1, {dim}),
                   i -> (c.e[i] - cv[i]) * (c.e[i] - cv[i]))) AS dist
          FROM corpus c, ct),
        cell AS (SELECT vec_id, (min(row(dist, ci)))[2] AS ivf_cell
                 FROM celld GROUP BY vec_id),
        qcelld AS (
          SELECT q.query_id, ct.ci,
                 list_sum(list_transform(generate_series(1, {dim}),
                   i -> (q.qe[i] - cv[i]) * (q.qe[i] - cv[i]))) AS dist
          FROM q, ct),
        probes AS (
          SELECT query_id, ci FROM (
            SELECT query_id, ci,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY dist ASC, ci ASC) AS r
            FROM qcelld) WHERE r <= {nprobe}),
        cand AS (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 list_cosine_similarity(c.e, q.qe) AS cosine
          FROM corpus c
          JOIN cell ON cell.vec_id = c.vec_id
          JOIN probes p ON p.ci = cell.ivf_cell
          JOIN q ON q.query_id = p.query_id
          WHERE c.vec_id <> q.query_id),
        approx AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY round(cosine, 6) DESC, neighbor_id ASC) AS r
            FROM cand) WHERE r <= {k}),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id
                     ORDER BY round(list_cosine_similarity(c.e, q.qe), 6)
                       DESC, c.vec_id ASC) AS r
            FROM corpus c, q WHERE c.vec_id <> q.query_id) WHERE r <= {k})
        SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_exact,
               CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
               round(count(a.neighbor_id) * 1.0 / count(*), 4) AS recall
        FROM exact e
        LEFT JOIN approx a ON a.query_id = e.query_id
                          AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
    """


def _kmeans_lloyd_sql() -> str:
    """Oracle for q_kmeans_lloyd: both Lloyd iterations unrolled as CTEs
    (assign = struct-min argmin over squared L2, index-asc ties; update =
    per-(cell, pos) avg rounded to 6 — the engine's determinism barrier —
    with empty cells inheriting the previous centroid via the (ci, pos)
    grid left join)."""
    from glamr_omics_pipelines_spark.operators import similarity as sim
    cents = sim.ivf_centroids_random(k=4, dim=64, seed=19)
    dim = 64
    ct_vals = ", ".join(
        f"({ci}, [{', '.join(repr(x) for x in cv)}]::DOUBLE[])"
        for ci, cv in enumerate(cents))
    return f"""
        WITH ct(ci, cv) AS (VALUES {ct_vals}),
        corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        d1 AS (
          SELECT c.vec_id, ct.ci,
                 list_sum(list_transform(generate_series(1, {dim}),
                   i -> (c.e[i] - cv[i]) * (c.e[i] - cv[i]))) AS dist
          FROM corpus c, ct),
        a1 AS (SELECT vec_id, (min(row(dist, ci)))[2] AS ci
               FROM d1 GROUP BY vec_id),
        m1 AS (
          SELECT a1.ci, i - 1 AS pos, round(avg(c.e[i]), 6) AS m
          FROM corpus c JOIN a1 USING (vec_id),
               generate_series(1, {dim}) AS g(i)
          GROUP BY a1.ci, i),
        c0p AS (SELECT ci, i - 1 AS pos, cv[i] AS v
                FROM ct, generate_series(1, {dim}) AS g(i)),
        c1p AS (SELECT c0p.ci, c0p.pos, coalesce(m1.m, c0p.v) AS v
                FROM c0p LEFT JOIN m1 USING (ci, pos)),
        c1 AS (SELECT ci, list(v ORDER BY pos) AS cv
               FROM c1p GROUP BY ci),
        d2 AS (
          SELECT c.vec_id, c1.ci,
                 list_sum(list_transform(generate_series(1, {dim}),
                   i -> (c.e[i] - cv[i]) * (c.e[i] - cv[i]))) AS dist
          FROM corpus c, c1),
        a2 AS (SELECT vec_id, (min(row(dist, ci)))[2] AS ci
               FROM d2 GROUP BY vec_id),
        m2 AS (
          SELECT a2.ci, i - 1 AS pos,
                 round(round(avg(c.e[i]), 6), 4) AS val, count(*) AS n
          FROM corpus c JOIN a2 USING (vec_id),
               generate_series(1, {dim}) AS g(i)
          GROUP BY a2.ci, i)
        SELECT CAST(c1p.ci AS BIGINT) AS ci, CAST(c1p.pos AS BIGINT) AS pos,
               coalesce(m2.val, round(c1p.v, 4)) AS val,
               CAST(coalesce(m2.n, 0) AS BIGINT) AS n
        FROM c1p LEFT JOIN m2 ON c1p.ci = m2.ci AND c1p.pos = m2.pos
    """


def _pq_ann_sql() -> str:
    """Oracle for q_pq_ann: the SAME seeded codebooks as VALUES literals;
    encode = deterministic argmin (struct-min over (dist, j)), ADC table
    per (query, subspace, codeword), pair distance = sum of the m matched
    table entries. (x-y)*(x-y), never ^2 — POW may differ in low bits
    from the engine's multiply."""
    from glamr_omics_pipelines_spark.operators import similarity as sim
    books = sim.pq_codebooks_random(m=4, k=8, dsub=16, seed=7)
    dsub = 16
    values = ", ".join(
        f"({s}, {j}, [{', '.join(repr(x) for x in cw)}]::DOUBLE[])"
        for s, cb in enumerate(books) for j, cw in enumerate(cb))
    return f"""
        WITH cb(s, j, cw) AS (VALUES {values}),
        q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 5),
        d AS (
          SELECT e.vec_id, cb.s, cb.j,
                 list_sum(list_transform(generate_series(1, {dsub}),
                   i -> (e.embedding[cb.s * {dsub} + i]::DOUBLE - cw[i])
                        * (e.embedding[cb.s * {dsub} + i]::DOUBLE - cw[i])))
                   AS dist
          FROM embeddings e, cb),
        enc AS (
          SELECT vec_id, s, (min(row(dist, j)))[2] AS code
          FROM d GROUP BY vec_id, s),
        adc AS (
          SELECT q.query_id, cb.s, cb.j,
                 list_sum(list_transform(generate_series(1, {dsub}),
                   i -> (q.qv[cb.s * {dsub} + i] - cw[i])
                        * (q.qv[cb.s * {dsub} + i] - cw[i]))) AS t
          FROM q, cb),
        pair AS (
          SELECT a.query_id, e.vec_id AS neighbor_id, sum(a.t) AS adc
          FROM enc e JOIN adc a ON e.s = a.s AND e.code = a.j
          WHERE e.vec_id <> a.query_id
          GROUP BY a.query_id, e.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id, adc,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY round(adc, 6) ASC, neighbor_id ASC) AS rank
          FROM pair)
        SELECT query_id, neighbor_id, round(adc, 4) AS adc,
               CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 3
    """


def q_streaming_attribution_join(spark, sf_dir):
    """Batch-replay oracle row for the STREAM-STREAM join (VERDICT r7 #4;
    streaming/ingest.py:stream_interval_join — the ad-tech attribution
    shape, previously proven only by live availableNow tests): views and
    purchases are each split into three TIME-ORDERED parquet files
    (thirds of the event-time range, so replay is watermark-safe: no row
    is ever late), drained by a REAL two-sided availableNow run with
    maxFilesPerTrigger=1 — three micro-batches through the watermarked
    interval-join state machine — and the drained pair set is rolled up
    to the same last-touch frame as the batch `attribution_join` query.
    The oracle computes the identical time-bounded join in one batch
    pass; n_batches (max foreachBatch id + 1, stamped on every emitted
    row) pins that the join actually ran incrementally: a view matching
    a purchase two batches later can only be emitted if the join STATE
    carried it across micro-batches."""
    import shutil
    import tempfile
    from glamr_omics_pipelines_spark.streaming import ingest as s_ingest
    ev = _events(spark, sf_dir)
    lo, hi = (ev.agg(F.min(F.unix_micros("ts")),
                     F.max(F.unix_micros("ts"))).collect()[0])
    third = F.least(F.lit(2), F.floor(
        (F.unix_micros("ts") - F.lit(lo)) * 3 / F.lit(hi - lo + 1)))
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", F.col("event_id").alias("view_id"),
                     F.col("ts").alias("imp_ts"), third.alias("_third")))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("event_id").alias("purchase_id"),
                     F.col("ts").alias("conv_ts"), third.alias("_third")))
    root = tempfile.mkdtemp(prefix="stream_attr_")
    try:
        vsrc = os.path.join(root, "views")
        psrc = os.path.join(root, "purchases")
        # sequential writes → strictly increasing mtimes → the file
        # source replays the thirds oldest-first, one per trigger
        for i in range(3):
            (views.filter(F.col("_third") == i).drop("_third")
             .coalesce(1).write.mode("append").parquet(vsrc))
            (purch.filter(F.col("_third") == i).drop("_third")
             .coalesce(1).write.mode("append").parquet(psrc))
        v_schema = views.drop("_third").schema
        p_schema = purch.drop("_third").schema
        vs = (spark.readStream.schema(v_schema)
              .option("maxFilesPerTrigger", 1).parquet(vsrc))
        ps = (spark.readStream.schema(p_schema)
              .option("maxFilesPerTrigger", 1).parquet(psrc))
        j = s_ingest.stream_interval_join(vs, ps, "user_id",
                                          "imp_ts", "conv_ts",
                                          max_delay_seconds=1800)
        out_dir = os.path.join(root, "out")

        def sink(batch: DataFrame, batch_id: int) -> None:
            (batch.withColumn("_batch", F.lit(batch_id).cast("long"))
             .write.mode("append").parquet(out_dir))

        (j.writeStream.foreachBatch(sink)
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .trigger(availableNow=True).start().awaitTermination())
        pairs = spark.read.parquet(out_dir)
        last_batch = pairs.agg(F.max("_batch").alias("b")).collect()[0]["b"]
        if last_batch is None:
            # sparser event data at another sf could legally emit zero
            # pairs — fail diagnosably, never TypeError on None + 1
            raise ValueError("stream-stream replay emitted zero joined "
                             "pairs; cannot pin n_batches")
        n_batches = int(last_batch) + 1
        if n_batches != 3:
            # the oracle hard-codes 3; surface a scheduling change (file
            # source coalescing triggers, a zero-pair final micro-batch at
            # another sf) as a clear harness error, never an opaque
            # value-hash mismatch (ADVICE r8)
            raise ValueError(
                f"stream-stream replay ran {n_batches} emitting "
                f"micro-batches, expected 3 (maxFilesPerTrigger=1 over "
                f"three time-ordered thirds); the incremental-path pin "
                f"no longer holds at this scale factor")
        agg = (pairs.groupBy("purchase_id")
               .agg(F.count(F.lit(1)).alias("n_candidates"),
                    F.max(F.struct("imp_ts", "view_id")).alias("_best"))
               .select("purchase_id",
                       F.col("_best.view_id").alias("view_id"),
                       F.col("n_candidates").cast("bigint")
                       .alias("n_candidates")))
        # purchase-grain (small) — materialize before the temp dir goes
        out = spark.createDataFrame(agg.collect(), agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out.withColumn("n_batches",
                          F.lit(int(n_batches)).cast("bigint"))


def _stage_replay_files(spark, root: str, splits) -> str:
    """Stage each split DataFrame as ONE parquet file under root/src with
    STRICTLY INCREASING mtimes — FileStreamSource drains oldest-first, so
    batch order == split order (the order the unrolled oracles simulate).
    Raises if a split stages empty: an order-pinned replay needs every
    batch to carry rows (an empty band would run a micro-batch the
    oracle's cumulative row domain never sees — r9 review: at another
    scale factor that surfaced as an opaque 2-vs-3-row hash mismatch
    instead of a diagnosable error). Shared by the heavy-hitters and
    drift-monitor replay rows."""
    import glob as _glob
    import shutil
    src = os.path.join(root, "src")
    os.makedirs(src)
    for i, split in enumerate(splits):
        tmp = os.path.join(root, f"tmp{i}")
        split.coalesce(1).write.parquet(tmp)
        part = sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))[0]
        dst = os.path.join(src, f"{i:03d}.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (1_600_000_000 + i * 60, 1_600_000_000 + i * 60))
        if spark.read.parquet(dst).limit(1).count() == 0:
            raise ValueError(
                f"replay split {i} is empty at this scale factor; the "
                f"order-pinned replay oracle requires every staged batch "
                f"to carry rows")
    return src


def q_streaming_heavy_hitters(spark, sf_dir):
    """Batch-replay oracle row for the streaming heavy-hitters vocabulary
    (VERDICT r8 #3; streaming/ingest.py:streaming_vocab_ingest — the
    always-on corpus-vocabulary tracker with top-k + exact-OTHERS-mass
    truncation): the documents corpus is split into three files
    (doc_id % 3) staged with STRICTLY INCREASING mtimes — truncation is
    order-DEPENDENT, unlike the rollup's commutative sums, so the replay
    pins the batch order the oracle simulates — and drained by a REAL
    availableNow run with maxFilesPerTrigger=1 through three
    head-30-plus-OTHERS merge/truncate steps. The oracle is the SAME
    3-step lossy state machine unrolled as CTEs (the pagerank unrolled-
    loop convention): borderline tokens lose mass to <OTHERS> differently
    than a one-shot count would, so a state table that skipped the
    incremental path CANNOT hash-match; n_batches==3 is asserted
    engine-side (diagnosable, never an opaque mismatch)."""
    import shutil
    import tempfile
    from glamr_omics_pipelines_spark.streaming import ingest as s_ingest
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="stream_hh_")
    try:
        src = _stage_replay_files(spark, root, [
            docs.filter(F.col("doc_id") % 3 == i).select("text")
            for i in range(3)])
        stream = (spark.readStream.schema(docs.select("text").schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        s_ingest.streaming_vocab_ingest(
            stream, "text", state_dir=os.path.join(root, "state"),
            checkpoint=os.path.join(root, "ckpt"), top_k=30)
        st, applied = s_ingest._read_state(spark,
                                           os.path.join(root, "state"))
        n_batches = int(applied) + 1
        if n_batches != 3:
            raise ValueError(
                f"heavy-hitters replay ran {n_batches} micro-batches, "
                f"expected 3 (maxFilesPerTrigger=1 over three mtime-"
                f"ordered files); the incremental-path pin no longer "
                f"holds at this scale factor")
        # token-grain head+OTHERS (31 rows) — materialize before the temp
        # dir is removed
        out = spark.createDataFrame(st.collect(), st.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return (out.select("token", F.col("n").cast("bigint").alias("n"))
            .withColumn("n_batches", F.lit(3).cast("bigint")))


def _streaming_heavy_hitters_sql(top_k: int = 30) -> str:
    """Oracle for q_streaming_heavy_hitters: the 3-batch head-k+OTHERS
    truncation state machine unrolled as CTEs — per step, merge the
    incoming batch's token counts into the running state, keep the top-k
    real tokens (count desc, token asc — the engine's exact tiebreak),
    and fold everything else (including the prior <OTHERS> row) into
    <OTHERS>. MATERIALIZED: each step references its predecessor twice
    (head + anti mass)."""
    steps = []
    for step in (1, 2, 3):
        b = step - 1
        prev = ("SELECT token, n FROM bc WHERE b = 0" if step == 1 else
                f"SELECT token, n FROM s{step - 1} UNION ALL "
                f"SELECT token, n FROM bc WHERE b = {b}")
        steps.append(f"""
        m{step} AS MATERIALIZED (
          SELECT token, CAST(sum(n) AS BIGINT) AS n
          FROM ({prev}) GROUP BY token),
        h{step} AS MATERIALIZED (
          SELECT token, n FROM (
            SELECT token, n, row_number() OVER (
              ORDER BY n DESC, token ASC) AS rk
            FROM m{step} WHERE token <> '<OTHERS>')
          WHERE rk <= {top_k}),
        o{step} AS (
          SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n
          FROM m{step}
          WHERE token NOT IN (SELECT token FROM h{step})),
        s{step} AS MATERIALIZED (
          SELECT token, n FROM h{step}
          UNION ALL
          SELECT '<OTHERS>', n FROM o{step} WHERE n > 0)""")
    return f"""
        WITH tok AS (
          SELECT doc_id % 3 AS b,
                 unnest(list_filter(string_split_regex(lower(text),
                        '\\s+'), x -> x <> '')) AS token
          FROM documents),
        bc AS MATERIALIZED (
          SELECT b, token, CAST(count(*) AS BIGINT) AS n
          FROM tok GROUP BY b, token),
        {",".join(steps)}
        SELECT token, n, CAST(3 AS BIGINT) AS n_batches FROM s3
    """


def q_streaming_dedup(spark, sf_dir):
    """Batch-replay oracle row for STREAMING EXACT DEDUP — the fifth
    stateful shape under the hard oracle (streaming/ingest.py:stream_dedup,
    dropDuplicatesWithinWatermark): events are split into three files by
    event_id % 3 (mtime-staged so batch order is pinned) and drained by a
    REAL availableNow run with maxFilesPerTrigger=1; each micro-batch
    emits only the (user_id, event_type, day) keys NOT already in the
    dedup state, stamped with the batch id. first_batch therefore equals
    the key's minimum split index — a per-batch re-dedup without carried
    state would re-emit keys (row-count mismatch) and a one-shot dedup
    would stamp everything batch 0 (value mismatch). The day component
    keeps the key space growing — every batch carries new keys at every
    test sf; the coarser (user, type) key saturates by batch 1 and the
    n_batches pin below fires. The watermark delay (10 years) exceeds
    the data's time span so no key expires and no row is late within the
    replay; bounded-state expiry semantics are pytest-covered.
    n_batches==3 asserted engine-side."""
    import shutil
    import tempfile
    from glamr_omics_pipelines_spark.streaming import ingest as s_ingest
    ev = (_events(spark, sf_dir)
          .select("event_id", "user_id", "event_type", "ts",
                  F.date_format("ts", "yyyy-MM-dd").alias("day")))
    cols = ["user_id", "event_type", "day", "ts"]
    root = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        src = _stage_replay_files(spark, root, [
            ev.filter(F.col("event_id") % 3 == i).select(*cols)
            for i in range(3)])
        stream = (spark.readStream.schema(ev.select(*cols).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        deduped = s_ingest.stream_dedup(
            stream, ["user_id", "event_type", "day"], ts_col="ts",
            watermark="87600 hours")
        out_dir = os.path.join(root, "out")

        def sink(batch: DataFrame, batch_id: int) -> None:
            (batch.select("user_id", "event_type", "day")
             .withColumn("_batch", F.lit(batch_id).cast("long"))
             .write.mode("append").parquet(out_dir))

        (deduped.writeStream.foreachBatch(sink)
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .trigger(availableNow=True).start().awaitTermination())
        keys = spark.read.parquet(out_dir)
        last = keys.agg(F.max("_batch").alias("b")).collect()[0]["b"]
        n_batches = int(last) + 1 if last is not None else 0
        if n_batches != 3:
            raise ValueError(
                f"streaming-dedup replay emitted keys in {n_batches} "
                f"micro-batches, expected 3 (maxFilesPerTrigger=1 over "
                f"three mtime-ordered files; a batch with zero NEW keys "
                f"at this scale factor breaks the incremental-path pin)")
        # key-grain (<< events) — materialize before the temp dir goes
        out = spark.createDataFrame(keys.collect(), keys.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out.select("user_id", "event_type", "day",
                      F.col("_batch").alias("first_batch"),
                      F.lit(3).cast("bigint").alias("n_batches"))


# second offsets for the streaming_late_data event-time construction, keyed
# by event_id % 9 (batch = k % 3). Fixed hour buckets make the watermark
# algebra data-independent: max(b0)=12:00 (k=6), max(b1)=14:00 (k=4),
# max(all)=16:01 (k=8). ONE constant; the oracle CASE is generated from it.
_LATE_OFFSETS = {
    0: ("36000 + (event_id % 60) * 60", "10:xx on-time"),
    3: ("39600 + (event_id % 60) * 60", "11:xx on-time"),
    6: ("43200", "12:00 exact — pins max(batch0)"),
    1: ("46800 + (event_id % 60) * 60", "13:xx on-time"),
    4: ("50400", "14:00 exact — pins max(batch1)"),
    7: ("48600", "13:30 on-time"),
    2: ("28800 + (event_id % 60) * 60", "08:xx in batch 2 — TOO LATE"),
    5: ("45000", "12:30 in batch 2 — late but inside the watermark"),
    8: ("57660", "16:01 exact — pins the final watermark at 14:01"),
}
_LATE_TS_CASE = ("CASE CAST(event_id % 9 AS INT) "
                 + " ".join(f"WHEN {k} THEN {expr}"
                            for k, (expr, _) in _LATE_OFFSETS.items())
                 + " END")
_LATE_BASE = 1704067200  # 2024-01-01 00:00:00 UTC


def q_streaming_late_data(spark, sf_dir):
    """Batch-replay oracle row for WATERMARKED APPEND-MODE WINDOWED
    AGGREGATION (streaming/ingest.py:windowed_event_counts driven by a
    REAL availableNow run — the sixth stateful shape under the hard
    oracle, and the one that pins Spark's actual late-data machinery:
    the late-row DROP and the append-mode EMISSION CUT, neither of which
    a one-shot batch agg reproduces). Event times are synthesized into
    fixed hour buckets (_LATE_OFFSETS) so the watermark algebra is
    data-independent at every scale factor:

    batch 0 = 10:xx/11:xx/12:00 rows, batch 1 = 13:xx/13:30/14:00,
    batch 2 = 08:xx (too late), 12:30 (late but acceptable), 16:01.
    With a 2 h delay: the 08:xx rows land below the late-events
    watermark of batch 2 under BOTH watermark models Spark has shipped
    (dual: max(b0)−2h = 10:00; single: max(b0,b1)−2h = 12:00) → dropped;
    the 12:30 rows sit above both → kept (no batch-2 row is placed in
    the ambiguous [10:00,12:00) zone, so the oracle is
    implementation-robust — measured on this Spark: the dual-watermark
    behavior, late filter lagging eviction by one batch). Final
    watermark = 16:01−2h = 14:01 → append emits exactly the windows
    ending ≤ 14:01 ([10,11),[11,12),[12,13),[13,14)); the 14:00 and
    16:01 windows stay in state, and no window boundary sits AT 14:01,
    so inclusive-vs-exclusive eviction cannot flip the cut. Window
    [12,13) carries batch-0 AND late batch-2 rows — the hash can only
    match if state survived across batches AND the drop AND the cut all
    executed. Sums run in DECIMAL so reassociation is exact;
    n_batches==4 (3 files + the no-data watermark-advance batch)
    asserted engine-side."""
    import shutil
    import tempfile
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    e = ev.select(
        (F.col("event_id") % 3).alias("_b"), "event_type",
        F.col("value").cast("decimal(18,6)").alias("value"),
        F.timestamp_seconds(F.lit(_LATE_BASE)
                            + F.expr(_LATE_TS_CASE)).alias("ts"))
    cols = ["ts", "event_type", "value"]
    root = tempfile.mkdtemp(prefix="stream_late_")
    try:
        src = _stage_replay_files(spark, root, [
            e.filter(F.col("_b") == i).select(*cols) for i in range(3)])
        stream = (spark.readStream.schema(e.select(*cols).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        agg = windowed_event_counts(stream, ts_col="ts",
                                    key_col="event_type",
                                    window="1 hour", watermark="2 hours",
                                    value_col="value")
        out_dir = os.path.join(root, "out")

        def sink(batch: DataFrame, batch_id: int) -> None:
            (batch.withColumn("_bid", F.lit(batch_id).cast("long"))
             .write.mode("append").parquet(out_dir))

        (agg.writeStream.outputMode("append").foreachBatch(sink)
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .trigger(availableNow=True).start().awaitTermination())
        rows = spark.read.parquet(out_dir)
        last = rows.agg(F.max("_bid").alias("b")).collect()[0]["b"]
        n_batches = int(last) + 1 if last is not None else 0
        if n_batches != 4:
            raise ValueError(
                f"late-data replay emitted through micro-batch "
                f"{n_batches - 1}, expected the final append emission in "
                f"batch 3 (3 mtime-ordered files + the no-data "
                f"watermark-advance batch); the append/eviction pin no "
                f"longer holds on this Spark")
        # window-grain (handful of rows) — materialize before the temp
        # dir is removed
        out = spark.createDataFrame(rows.collect(), rows.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"),
        "event_type", F.col("n").cast("bigint").alias("n"),
        F.round(F.col("sum_value").cast("double"), 4).alias("sum_value"),
        F.lit(4).cast("bigint").alias("n_batches"))


def _streaming_late_data_sql() -> str:
    """Oracle for q_streaming_late_data: the watermark state machine in
    SQL — per-batch maxes from the SAME event-time construction
    (_LATE_TS_CASE reused verbatim), batch-2 rows below max(batch0)−2h
    dropped (the late-events watermark; by construction also below the
    single-watermark variant), windows ending after max(all)−2h withheld
    (append cut)."""
    return f"""
        WITH e AS (
          SELECT event_id % 3 AS b, event_type,
                 CAST(value AS DECIMAL(18,6)) AS value,
                 make_timestamp(({_LATE_BASE} + {_LATE_TS_CASE})
                                * 1000000) AS ts
          FROM events),
        mx AS (SELECT max(CASE WHEN b = 0 THEN ts END) AS m0,
                      max(ts) AS mall FROM e),
        kept AS (
          SELECT e.* FROM e, mx
          WHERE NOT (e.b = 2 AND e.ts < mx.m0 - INTERVAL 2 HOUR)),
        agg AS (
          SELECT date_trunc('hour', ts) AS ws, event_type,
                 count(*) AS n, sum(value) AS sv
          FROM kept GROUP BY 1, 2)
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, CAST(n AS BIGINT) AS n,
               round(CAST(sv AS DOUBLE), 4) AS sum_value,
               CAST(4 AS BIGINT) AS n_batches
        FROM agg, mx
        WHERE ws + INTERVAL 1 HOUR <= mall - INTERVAL 2 HOUR
    """


def q_streaming_drift_monitor(spark, sf_dir):
    """Batch-replay oracle row for the streaming drift gate
    (streaming/ingest.py:streaming_drift_monitor — the fourth stateful
    shape under the hard oracle, after rollup / stream-stream join /
    heavy-hitters): lineitem quantities split into a STATIC reference
    slice and a stream drained as three QUANTITY-BANDED files staged
    with increasing mtimes (batch 0 = low quantities only → large PSI;
    each later batch pulls the cumulative distribution toward the
    reference, so the per-batch PSI sequence pins every cumulative
    prefix, not just the final state). n_bins=8: quantile fractions at
    exact binary 0.125 steps, so both engines interpolate bit-identical
    edges and the v > edge binning cannot straddle an ulp. The oracle
    recomputes edges, per-prefix cumulative bin counts and the
    epsilon-clamped PSI in SQL; n_batches==3 asserted engine-side."""
    import shutil
    import tempfile
    from glamr_omics_pipelines_spark.streaming import ingest as s_ingest
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    ref = li.filter(F.col("l_orderkey") % 7 < 2).select("l_quantity")
    strm = li.filter(F.col("l_orderkey") % 7 >= 2).select("l_quantity")
    band = (F.when(F.col("l_quantity") <= 16, 0)
            .when(F.col("l_quantity") <= 33, 1).otherwise(2))
    root = tempfile.mkdtemp(prefix="stream_drift_")
    try:
        # the empty-band guard in _stage_replay_files is load-bearing
        # here: an empty band 0 would log an eps-only PSI row the
        # oracle's cumulative domain never generates
        src = _stage_replay_files(spark, root,
                                  [strm.filter(band == i) for i in range(3)])
        stream = (spark.readStream.schema(strm.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        state_dir = os.path.join(root, "state")
        s_ingest.streaming_drift_monitor(
            stream, ref, "l_quantity", state_dir=state_dir,
            checkpoint=os.path.join(root, "ckpt"), n_bins=8)
        log = spark.read.parquet(os.path.join(state_dir, "psi_log"))
        rows = log.collect()
        n_batches = 1 + max(r.batch_id for r in rows)
        if n_batches != 3 or len(rows) != 3:
            raise ValueError(
                f"drift replay logged {len(rows)} rows over {n_batches} "
                f"micro-batches, expected 3/3 (maxFilesPerTrigger=1 over "
                f"three mtime-ordered files); the incremental-path pin "
                f"no longer holds at this scale factor")
        out = spark.createDataFrame(rows, log.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out.select(F.col("batch_id").cast("bigint").alias("batch_id"),
                      _r4("psi").alias("psi"),
                      F.col("n_seen").cast("bigint").alias("n_seen"))


def _streaming_drift_monitor_sql(n_bins: int = 8) -> str:
    """Oracle for q_streaming_drift_monitor: quantile_cont edges over the
    static reference (type-7 == Spark percentile; 0.125 fractions are
    exact binary), bin index = count of edges strictly below the value
    (the engine's sum((v > e)::int)), cumulative prefix counts per
    replayed batch, and the epsilon-clamped PSI over the FULL bin domain
    — the same formula as ingest.py (eps 1e-6 floors both sides so mass
    in a reference-empty bin registers)."""
    probs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    return f"""
        WITH ref AS (SELECT l_quantity AS v FROM lineitem
                     WHERE l_orderkey % 7 < 2),
        strm AS (SELECT l_quantity AS v,
                        CASE WHEN l_quantity <= 16 THEN 0
                             WHEN l_quantity <= 33 THEN 1
                             ELSE 2 END AS b
                 FROM lineitem WHERE l_orderkey % 7 >= 2),
        e AS MATERIALIZED (
          SELECT unnest(quantile_cont(v, [{probs}])) AS edge FROM ref),
        refc AS MATERIALIZED (
          SELECT (SELECT count(*) FROM e WHERE r.v > e.edge) AS bin,
                 count(*) AS n
          FROM ref r GROUP BY 1),
        reft AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM refc),
        sb AS MATERIALIZED (
          SELECT b, (SELECT count(*) FROM e WHERE s.v > e.edge) AS bin
          FROM strm s),
        cum AS MATERIALIZED (
          SELECT k.k AS batch_id, sb.bin, count(*) AS n
          FROM (VALUES (0), (1), (2)) k(k)
          JOIN sb ON sb.b <= k.k GROUP BY k.k, sb.bin),
        tot AS (SELECT batch_id, CAST(sum(n) AS DOUBLE) AS t,
                       CAST(sum(n) AS BIGINT) AS n_seen
                FROM cum GROUP BY batch_id),
        dom AS (SELECT k.k AS batch_id, gs.b AS bin
                FROM (VALUES (0), (1), (2)) k(k),
                     (SELECT unnest(generate_series(0, {n_bins - 1}))
                      AS b) gs),
        psi AS (
          SELECT d.batch_id,
                 sum((greatest(coalesce(rc.n, 0) / reft.t, 1e-6)
                      - greatest(coalesce(c.n, 0) / tot.t, 1e-6))
                     * ln(greatest(coalesce(rc.n, 0) / reft.t, 1e-6)
                          / greatest(coalesce(c.n, 0) / tot.t, 1e-6)))
                   AS psi
          FROM dom d
          CROSS JOIN reft
          JOIN tot ON tot.batch_id = d.batch_id
          LEFT JOIN refc rc ON rc.bin = d.bin
          LEFT JOIN cum c ON c.batch_id = d.batch_id AND c.bin = d.bin
          GROUP BY d.batch_id)
        SELECT p.batch_id, round(p.psi, 4) AS psi, t.n_seen
        FROM psi p JOIN tot t ON t.batch_id = p.batch_id
    """


def q_checkout_delta(spark, sf_dir):
    """Checkout-file delta with mtime-versioned lineage
    (pipelines/glamr.py:checkout_delta; pypelib/post.py:235-374
    update_omics_checkout — the last post-production residue, VERDICT r7
    missing #3): a deterministic synthetic output-file inventory from
    `documents` (data-root files with a missing-mtime subset, plus
    scratch files outside the data root), an existing checkout ledger
    (equal / older / newer old-mtimes), and a 40-commit repository
    timeline. Both sides synthesize the identical history, so the hash
    checks path filtering, the ledger status classification
    (new/no_change/regression/ignored/missing) and the as-of version
    assignment (latest commit at-or-before each new file's mtime)."""
    from glamr_omics_pipelines_spark.pipelines.glamr import checkout_delta
    d = _t(spark, sf_dir, "documents").select("doc_id")
    doc = F.col("doc_id")
    rule = (F.when(doc % 3 == 0, F.lit("assembly"))
            .when(doc % 3 == 1, F.lit("mapping"))
            .otherwise(F.lit("binning")))
    base_mt = (F.lit(1700000000) + doc * 7).cast("long")
    data_rows = d.select(
        F.format_string("data/omics/samp_%d/out_%s.txt", "doc_id", rule)
        .alias("path"),
        rule.alias("rule"),
        F.when(doc % 13 == 0, F.lit(None).cast("long"))
        .otherwise(base_mt).alias("mtime"))
    scratch = d.filter(doc % 10 == 0).select(
        F.format_string("scratch/tmp_%d.txt", "doc_id").alias("path"),
        rule.alias("rule"), base_mt.alias("mtime"))
    inv = data_rows.unionByName(scratch)
    rel = F.format_string("data/omics/samp_%d/out_%s.txt", "doc_id", rule)
    ledger = (
        d.filter(doc % 4 == 0).select(rel.alias("relpath"),
                                      base_mt.alias("old_mtime"))
        .unionByName(d.filter(doc % 4 == 1).select(
            rel.alias("relpath"), (base_mt - 500).alias("old_mtime")))
        .unionByName(d.filter(doc % 8 == 6).select(
            rel.alias("relpath"), (base_mt + 500).alias("old_mtime"))))
    commits = spark.createDataFrame(
        [(1700000000 + i * 1000, f"v1.{i}") for i in range(40)],
        "commit_ts long, version string")
    out = checkout_delta(inv, ledger, commits)
    return out.select("relpath", "rule",
                      F.col("mtime").cast("bigint").alias("mtime"),
                      "version", "status")


def q_versions_ledger(spark, sf_dir):
    """Versions-ledger current-state view (pipelines/glamr.py:
    versions_ledger_current; pypelib/post.py:523-747 VersionInfoFile —
    the run-ledger residue, VERDICT r8 missing #4, the last reference
    query family without a named parity op): deterministic synthetic
    rule-assignment and package-snapshot ledgers from `documents`
    (rules migrating between envs across 8 pipeline versions, package
    sets churning per version, envs absent from some versions), folded
    to the env-grain current view — latest-assignment-wins rule
    ownership, latest package snapshot, churn count. Both sides
    synthesize the identical history."""
    from glamr_omics_pipelines_spark.pipelines.glamr import (
        versions_ledger_current)
    d = (_t(spark, sf_dir, "documents").select("doc_id")
         .filter(F.col("doc_id") < 400))
    doc = F.col("doc_id")
    pl = F.format_string("v%03d", (doc % 8).cast("int"))
    env = F.concat(F.lit("env"), (doc % 5).cast("string"))
    rules = (d.filter(doc % 9 != 0)
             .select(pl.alias("pl_version"), env.alias("env_name"),
                     F.concat(F.lit("rule"), (doc % 23).cast("string"))
                     .alias("rule"))
             .distinct())
    pkgs = (d.filter((doc % 5 + doc % 8) % 4 != 0)
            .select(pl.alias("pl_version"), env.alias("env_name"),
                    F.concat(F.lit("pkg"), (doc % 7).cast("string"))
                    .alias("package"),
                    F.concat(F.lit("1."),
                             ((doc % 7 + doc % 8) % 3).cast("string"))
                    .alias("pkg_version"))
            .distinct())
    return versions_ledger_current(rules, pkgs)


def _versions_ledger_sql() -> str:
    """Oracle for q_versions_ledger: the same synthetic ledgers from
    documents.doc_id; current env per rule and latest snapshot per env
    via struct-max (row() min/max — the pq_ann convention); churn via
    lag over the version order; fingerprints are the identically-sorted
    'pkg=ver' joins on both sides."""
    return """
        WITH d AS (SELECT doc_id AS i FROM documents WHERE doc_id < 400),
        rules AS (
          SELECT DISTINCT printf('v%03d', i % 8) AS pl,
                 'env' || (i % 5) AS env, 'rule' || (i % 23) AS rule
          FROM d WHERE i % 9 <> 0),
        pkgs AS (
          SELECT DISTINCT printf('v%03d', i % 8) AS pl,
                 'env' || (i % 5) AS env, 'pkg' || (i % 7) AS package,
                 '1.' || ((i % 7 + i % 8) % 3) AS pv
          FROM d WHERE (i % 5 + i % 8) % 4 <> 0),
        cur_env AS (
          SELECT rule, (max(row(pl, env)))[2] AS env
          FROM rules GROUP BY rule),
        env_rules AS (
          SELECT env, count(*) AS n_current_rules,
                 string_agg(rule, ',' ORDER BY rule) AS current_rules
          FROM cur_env GROUP BY env),
        snap AS (
          SELECT env, pl, count(*) AS n_pkgs,
                 string_agg(package || '=' || pv, '|'
                            ORDER BY package || '=' || pv) AS fp
          FROM pkgs GROUP BY env, pl),
        churn AS (
          SELECT env, pl, n_pkgs,
                 CASE WHEN lag(fp) OVER w IS NULL THEN 0
                      WHEN lag(fp) OVER w <> fp THEN 1 ELSE 0 END AS chg
          FROM snap WINDOW w AS (PARTITION BY env ORDER BY pl)),
        env_state AS (
          SELECT env, (max(row(pl, n_pkgs)))[1] AS latest_version,
                 (max(row(pl, n_pkgs)))[2] AS n_packages,
                 sum(chg) AS pkg_changes
          FROM churn GROUP BY env)
        SELECT s.env AS env_name, s.latest_version,
               CAST(s.n_packages AS BIGINT) AS n_packages,
               CAST(coalesce(r.n_current_rules, 0) AS BIGINT)
                 AS n_current_rules,
               coalesce(r.current_rules, '') AS current_rules,
               CAST(s.pkg_changes AS BIGINT) AS pkg_changes
        FROM env_state s LEFT JOIN env_rules r ON r.env = s.env
    """


def q_benchmark_ledger(spark, sf_dir):
    """Benchmark-harvest parity (pipelines/glamr.py:benchmark_ledger;
    pypelib/post.py:763-935 collect_benchmarks): a deterministic synthetic
    job history from `documents` — per-rule benchmark TSV paths (with a
    retry attempt for every 7th job), slurm-only jobs with no benchmark
    file, and an sacct accounting pull — composed through path-parse (S4)
    → newest-per-(rule,sample) (W4) → union blanks → broadcast sacct
    backfill. Both sides synthesize the identical history, so the hash
    checks the relational core of the reference's ledger collection."""
    from glamr_omics_pipelines_spark.pipelines.glamr import benchmark_ledger
    doc = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id")
    rule = (F.when(doc % 3 == 0, F.lit("assembly"))
            .when(doc % 3 == 1, F.lit("mapping"))
            .otherwise(F.lit("binning")))
    s_val = ((doc * 13) % 997) / F.lit(10.0) + F.lit(1.0)
    base = (d.filter(doc % 5 != 0).select(
        F.format_string("benchmarks/%s/samp_%d.txt", rule, doc).alias("path"),
        (F.lit(1700000000) + doc * 7).cast("long").alias("timestamp"),
        F.when(doc % 2 == 0, 90000 + doc).cast("long").alias("slurm_job"),
        s_val.alias("s"), (s_val * 0.8).alias("cpu_time"),
        ((doc % 4000) / F.lit(4.0)).alias("max_rss")))
    retry = (base.filter(
        F.regexp_extract("path", r"samp_(\d+)\.txt$", 1).cast("long") % 7 == 0)
        .select("path", (F.col("timestamp") + 1000).alias("timestamp"),
                "slurm_job", (F.col("s") + 5.0).alias("s"),
                "cpu_time", "max_rss"))
    bm_files = base.unionByName(retry)
    slurm_only = (d.filter(doc % 10 == 0).select(
        rule.alias("rule"),
        F.format_string("samp_%d", doc).alias("sample"),
        (90000 + doc).cast("long").alias("slurm_job")))
    sacct = (d.filter(doc % 2 == 0).select(
        (90000 + doc).cast("long").alias("job_id"),
        F.format_string("node%d", doc % 8).alias("node"),
        ((doc % 600) + F.lit(10.0)).alias("elapsed_s"),
        (((doc % 600) + F.lit(10.0)) * 2.0).alias("total_cpu_s"),
        ((doc % 1000 + 1) * F.lit(1048576)).cast("long").alias("mem_bytes"),
        (F.lit(1700005000) + doc).cast("long").alias("end_ts")))
    led = benchmark_ledger(bm_files, slurm_only, sacct)
    return led.select(
        "rule", "sample", F.col("slurm_job").cast("bigint").alias("slurm_job"),
        "node", F.col("timestamp").cast("bigint").alias("timestamp"),
        _r4("s").alias("s"), _r4("cpu_time").alias("cpu_time"),
        _r4("max_rss").alias("max_rss"))


def q_attribution_join(spark, sf_dir):
    """Event-time-bounded attribution join (streaming/ingest.py:
    stream_interval_join, the stream-stream join shape with state-expiry
    bounds): each purchase joins the user's views within the prior 30
    minutes; last-touch attribution picks the latest view (ties → larger
    view id) via a map-side-combinable struct-max — no window sort."""
    ev = _events(spark, sf_dir)
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", F.col("event_id").alias("view_id"),
                     F.col("ts").alias("imp_ts")))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("event_id").alias("purchase_id"),
                     F.col("ts").alias("conv_ts")))
    j = stream_interval_join(views, purch, "user_id", "imp_ts", "conv_ts",
                             max_delay_seconds=1800)
    out = (j.groupBy("purchase_id")
           .agg(F.count(F.lit(1)).alias("n_candidates"),
                F.max(F.struct("imp_ts", "view_id")).alias("_best")))
    return out.select("purchase_id",
                      F.col("_best.view_id").alias("view_id"),
                      F.col("n_candidates").cast("bigint")
                      .alias("n_candidates"))


def q_data_quality(spark, sf_dir):
    """Declarative expectations suite (operators/validate.py): the
    engine-level form of the reference's scattered import assertions
    (postgres.Rmd stopifnot/duplicated/NA guards) — per-table rules
    compile into ONE aggregate scan each, plus FK orphan anti-joins,
    emitting a (check, violations, passed) report frame."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    rep_o = validate.expectations_report(o, "orders", [
        validate.not_null("o_custkey"),
        validate.unique("o_orderkey"),
        validate.accepted("o_orderstatus", ["O", "F", "P"]),
        validate.in_range("o_totalprice", 0, 1_000_000_000)])
    rep_li = validate.expectations_report(li, "lineitem", [
        validate.not_null("l_orderkey"),
        validate.in_range("l_discount", 0.0, 1.0),
        validate.in_range("l_quantity", 1, 50)])
    ref_oc = validate.referential_report(
        o.select(F.col("o_custkey").alias("custkey")),
        c.select(F.col("c_custkey").alias("custkey")),
        ["custkey"], "orders->customer.referential")
    ref_lo = validate.referential_report(
        li.select(F.col("l_orderkey").alias("orderkey")),
        o.select(F.col("o_orderkey").alias("orderkey")),
        ["orderkey"], "lineitem->orders.referential",
        broadcast_parent=False)
    return rep_o.unionByName(rep_li).unionByName(ref_oc).unionByName(ref_lo)


def q_pagerank(spark, sf_dir):
    """Weighted PageRank (operators/graph.py:71) over the part co-purchase
    graph — 10 fixed iterations of the Pregel recipe in DataFrames
    (edges ⨝ ranks → partial-agg contributions → damping base), lineage
    truncated per iteration with eager localCheckpoints; completes the
    iterative-graph family next to star-contraction CC
    (operators/dedup.py). Oracle: the identical recurrence unrolled into
    10 SQL CTEs."""
    li = _t(spark, sf_dir, "lineitem")
    edges = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey",
                                     max_group_size=50)
    ranks = graph.pagerank(edges, iterations=10)
    return ranks.select("node", _r4("rank").alias("pr"))


def q_scd2_history(spark, sf_dir):
    """SCD2 history compression (operators/windows.py:scd2_compress): each
    customer's order-status runs collapsed to validity intervals
    (valid_from/valid_to, null = current) — the historical counterpart of
    the warehouse incremental MERGE (sources/warehouse.py:52, reference
    postgres.Rmd UPSERT blocks keep latest; SCD2 keeps when each state
    held). One key-partitioned window + one groupBy."""
    o = _t(spark, sf_dir, "orders")
    out = windows.scd2_compress(o, ["o_custkey"], "o_orderdate",
                                ["o_orderstatus"], ["o_orderkey"])
    return out.select("o_custkey", F.col("version").cast("bigint").alias("version"),
                      "o_orderstatus", "valid_from", "valid_to",
                      F.col("n_events").cast("bigint").alias("n_events"))


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over user event streams
    (operators/timeseries.py:transition_counts): consecutive event-type
    bigrams per user with per-origin probabilities — one lead window on
    the user key, count grid is state × state (tiny)."""
    ev = _events(spark, sf_dir)
    out = timeseries.transition_counts(ev, ["user_id"], "ts",
                                       "event_type", ["event_id"])
    return out.select("state_from", "state_to",
                      F.col("n").cast("bigint").alias("n"),
                      _r4("prob").alias("prob"))


def q_chunk_documents(spark, sf_dir):
    """Sliding-window document chunking (operators/text.py:chunk_tokens):
    16-token windows every 8 tokens over the documents table — the
    context-length chunking step before packing/embedding; pure JVM HOFs
    (sequence → posexplode → slice → array_join), row-local, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return text.chunk_tokens(docs, "doc_id", "text", 16, 8)


def q_gaps_islands(spark, sf_dir):
    """Gaps-and-islands over order dates per customer (the classic
    consecutive-run detector): island id = date − row_number() days, one
    customer-partitioned window + groupBy; runs of ≥2 consecutive days."""
    o = _t(spark, sf_dir, "orders")
    d = (o.select("o_custkey", F.to_date("o_orderdate").alias("d"))
         .distinct())
    w = Window.partitionBy("o_custkey").orderBy("d")
    runs = (d.withColumn("_rn", F.row_number().over(w))
            .withColumn("_isl", F.date_sub(F.col("d"), F.col("_rn")))
            .groupBy("o_custkey", "_isl")
            .agg(F.min("d").alias("run_start"), F.max("d").alias("run_end"),
                 F.count(F.lit(1)).alias("n_days"))
            .filter(F.col("n_days") >= 2))
    return runs.select("o_custkey", "run_start", "run_end",
                       F.col("n_days").cast("bigint").alias("n_days"))


def q_ntile_buckets(spark, sf_dir):
    """NTILE quartile banding of order value per status (§2.5 window
    parity): per-bucket count/min/max — deterministic under ties via the
    orderkey tiebreak; one window + one tiny rollup."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice",
                                                   "o_orderkey")
    return (o.withColumn("bucket", F.ntile(4).over(w))
            .groupBy("o_orderstatus", "bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 _r4(F.min("o_totalprice")).alias("lo"),
                 _r4(F.max("o_totalprice")).alias("hi"))
            .select("o_orderstatus", F.col("bucket").cast("bigint")
                    .alias("bucket"),
                    F.col("n").cast("bigint").alias("n"), "lo", "hi"))


def q_group_percentiles(spark, sf_dir):
    """Exact per-group percentile ladder (PERCENTILE_CONT parity, the
    reference's quantile-heavy summaries — summarize_hmmscan medians):
    p25/p50/p75 of order value per status in ONE percentile aggregate
    (array form), exploded to long rows."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, array(0.25d, 0.5d, 0.75d))")
        .alias("_ps"))
    return (agg.select("o_orderstatus",
                       F.posexplode("_ps").alias("_i", "_v"))
            .select("o_orderstatus",
                    F.element_at(F.array(F.lit(25), F.lit(50), F.lit(75)),
                                 F.col("_i") + 1).cast("bigint").alias("pct"),
                    _r4("_v").alias("value")))


def q_incremental_agg(spark, sf_dir):
    """Incremental rollup refresh (sources/warehouse.py:agg_snapshot /
    merge_agg_snapshots): lineitem split into two simulated ingest batches
    by hash, each snapshotted to mergeable (n, sum, min, max) state, then
    MERGED — snapshot-grain rows only; the oracle is the direct full-table
    aggregate, proving merge ≡ re-scan. Mean derives at read time."""
    li = _t(spark, sf_dir, "lineitem")
    # decimal sums: merge order then provably cannot perturb the total (a
    # float sum reassociated across batches drifts past the 4-dp grid)
    d = li.select(F.col("l_returnflag").alias("grp"),
                  F.col("l_extendedprice").cast("decimal(18,4)").alias("v"),
                  (F.xxhash64("l_orderkey", "l_linenumber") % 2 == 0)
                  .alias("_half"))
    s1 = agg_snapshot(d.filter(F.col("_half")).drop("_half"), ["grp"], "v")
    s2 = agg_snapshot(d.filter(~F.col("_half")).drop("_half"), ["grp"], "v")
    m = merge_agg_snapshots(s1, s2)
    total = F.col("agg_sum").cast("double")
    return m.select("grp", F.col("agg_n").cast("bigint").alias("n"),
                    _r4(total).alias("total"),
                    _r4(F.col("agg_min").cast("double")).alias("min_v"),
                    _r4(F.col("agg_max").cast("double")).alias("max_v"),
                    _r4(total / F.col("agg_n")).alias("mean_v"))


def q_interval_subtract(spark, sf_dir):
    """bedtools-subtract (operators/intervals.py:subtract_intervals): each
    user's purchase windows minus their error windows — one signed
    sweep-line pass (A:±1→depth_a, B:±1→depth_b, survivors depth_a>0 ∧
    depth_b=0, re-merged to maximal spans); B is never probed per-A-row."""
    ev = _events(spark, sf_dir).withColumn("ts_us", windows.epoch_us("ts"))
    a = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("ts_us").alias("iv_start"),
                 (F.col("ts_us") + 300 * 1_000_000).alias("iv_end")))
    b = (ev.filter(F.col("event_type") == "error")
         .select("user_id", F.col("ts_us").alias("iv_start"),
                 (F.col("ts_us") + 600 * 1_000_000).alias("iv_end")))
    return intervals.subtract_intervals(a, b, ["user_id"],
                                        "iv_start", "iv_end")


def q_fuzzy_name_pairs(spark, sf_dir):
    """SymSpell-style fuzzy matching (operators/entity.py:41): all supplier
    name pairs within Levenshtein distance 1 — deletion-neighborhood
    blocking (equi join on exploded variants, JVM HOFs) + exact
    ``levenshtein`` verify on candidates only; never an all-pairs distance
    scan. The scalable form of the reference's free-text sample-name
    reconciliation (pypelib/omics.py sample-to-path matching)."""
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sid"), F.col("s_name").alias("name"))
    out = entity.fuzzy_pairs_edit1(sup, "sid", "name")
    return out.select("id_a", "id_b", "text_a", "text_b",
                      F.col("dist").cast("int").alias("dist"))


def q_enrichment_2x2(spark, sf_dir):
    """Annotation-enrichment contingency tables (operators/stats.py:
    enrichment_2x2 — which brands are over-represented in URGENT orders,
    the KEGG-term-in-good-bins shape): membership dedup + group-flag
    broadcast + one feature-grain aggregate; odds ratio + fold."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    o = _t(spark, sf_dir, "orders")
    membership = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
                  .select(F.col("l_orderkey").alias("grp"),
                          F.col("p_brand").alias("term")))
    flags = o.select(F.col("o_orderkey").alias("grp"),
                     (F.col("o_orderpriority") == "1-URGENT")
                     .alias("flagged"))
    out = stats.enrichment_2x2(membership, flags, "grp", "term")
    return out.select("term", "n11", "n10", "n01", "n00",
                      _r4("odds_ratio").alias("odds_ratio"),
                      _r4("fold_enrichment").alias("fold_enrichment"))


def q_rank_sum_test(spark, sf_dir):
    """Per-feature Wilcoxon rank-sum (operators/stats.py:rank_sum_test —
    the differential-abundance test run on exactly the reference's
    taxon-count tables): midrank windows partitioned BY FEATURE, so a
    million taxa test in parallel; U + normal-approx z per feature."""
    li = _t(spark, sf_dir, "lineitem")
    d = li.select((F.col("l_partkey") % 100).alias("taxon"),
                  F.col("l_returnflag").alias("grp"),
                  F.col("l_quantity").cast("double").alias("v"))
    out = stats.rank_sum_test(d, "taxon", "grp", "v", "A", "R")
    return out.select("taxon", "n1", "n2", _r4("u_stat").alias("u_stat"),
                      _r4("z_score").alias("z_score"))


def q_bh_fdr(spark, sf_dir):
    """Benjamini-Hochberg FDR adjustment (operators/stats.py:bh_adjust)
    over empirical p-values (percent_rank of error-event magnitudes) —
    the multiple-testing correction every differential table reports;
    feature-grain global windows (documented metadata-scale)."""
    ev = (_events(spark, sf_dir).filter(F.col("event_type") == "error")
          .select("event_id", "value"))
    w = Window.orderBy(F.col("value").asc(), F.col("event_id").asc())
    withp = ev.withColumn("p", F.percent_rank().over(w))
    out = stats.bh_adjust(withp, "p", "event_id")
    return out.select("event_id", _r4("p").alias("p"),
                      _r4("p_adj").alias("p_adj"))


def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key (operators/layout.py:zorder_key):
    bit-interleaved (partkey, suppkey) — the codegen'd Column expression
    compact_zorder sorts files by so parquet min/max skipping works on
    BOTH filter columns; oracle is the identical shift/mask algebra."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") % 100 == 0)
          .withColumn("x", F.col("l_partkey") % 1024)
          .withColumn("y", F.col("l_suppkey") % 1024))
    return li.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"),
        F.col("x").cast("bigint").alias("x"),
        F.col("y").cast("bigint").alias("y"),
        layout.zorder_key(["x", "y"], bits=10).alias("zkey"))


def q_clr_transform(spark, sf_dir):
    """Centered log-ratio transform (operators/abundance.py:clr_transform,
    the Aitchison compositional normalization microbiome abundance tables
    need): sample-grain mean-of-logs broadcast + row-local subtract."""
    counts = _taxon_counts(spark, sf_dir)
    out = abundance.clr_transform(counts, "sample", "cnt")
    return out.select("sample", "taxon", _r4("clr").alias("clr"))


def q_deseq_size_factors(spark, sf_dir):
    """DESeq2 median-of-ratios size factors (operators/abundance.py:
    deseq_size_factors): taxon-grain geometric means (all-sample taxa
    only) broadcast back; per-sample exact median ratio — the depth
    normalizer for the reference's count tables."""
    counts = _taxon_counts(spark, sf_dir)
    out = abundance.deseq_size_factors(counts, "sample", "taxon", "cnt")
    return out.select("sample", _r4("size_factor").alias("size_factor"))


def q_quantile_normalize(spark, sf_dir):
    """Quantile normalization across groups (operators/abundance.py:
    quantile_normalize — the microarray/RNA-seq batch normalizer the
    reference's abundance tables feed into): per-group rank window +
    rank-grain cross-group means; id tiebreak keeps row-level output
    engine-reproducible."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") % 50 == 0))
    d = li.select(F.col("l_returnflag").alias("grp"),
                  (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
                  .alias("id"),
                  F.col("l_quantity").cast("double").alias("v"))
    out = abundance.quantile_normalize(d, "grp", "v", "id")
    return out.select("grp", "id", _r4("v").alias("v"),
                      _r4("qnorm").alias("qnorm"))


def q_basket_rules(spark, sf_dir):
    """Market-basket association rules over order→brand baskets
    (operators/graph.py:association_rules): directed A→B with
    support/confidence/lift — pair counts from the co-occurrence core
    (within-basket fan-out, mega-group guarded), supports broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    baskets = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
               .select(F.col("l_orderkey").alias("basket"),
                       F.col("p_brand").alias("item")))
    out = graph.association_rules(baskets, "basket", "item",
                                  min_pair_count=5)
    return out.select("antecedent", "consequent", "pair_count",
                      _r4("support").alias("support"),
                      _r4("confidence").alias("confidence"),
                      _r4("lift").alias("lift"))


def q_bitset_semi_join(spark, sf_dir):
    """Broadcast-bitset semi join (operators/joins.py:
    bitset_prune_semi_join — engine-level runtime bloom pruning): lineitems
    of URGENT orders via a 128 KB bitset probed at the scan stage, exact
    semi join on the survivors only; result identical to a plain semi
    join (the oracle), shuffle carries probable matches only."""
    li = _t(spark, sf_dir, "lineitem")
    urgent = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_orderkey").alias("l_orderkey")))
    hits = joins.bitset_prune_semi_join(li, urgent, "l_orderkey")
    return (hits.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 _r4(F.sum("l_extendedprice")).alias("revenue")))


def q_cube_report(spark, sf_dir):
    """GROUP BY CUBE with grouping_id (§2.4 companion to rollup_ladder's
    ROLLUP): order counts/value across every (status, priority) subset
    combination in ONE scan — the cross-tab report form ROLLUP cannot
    express; grouping_id disambiguates real nulls from subtotal rows."""
    o = _t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.grouping_id().cast("bigint").alias("gid"),
                 F.count(F.lit(1)).alias("n"),
                 _r4(F.sum("o_totalprice")).alias("total"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL"))
                    .alias("status"),
                    F.coalesce("o_orderpriority", F.lit("ALL"))
                    .alias("priority"),
                    "gid", F.col("n").cast("bigint").alias("n"), "total"))


def q_mixture_sample(spark, sf_dir):
    """Explicit corpus mixture (operators/sampling.py:mixture_sample):
    documents down-sampled to a 40/30/30 en/zh/de mix — feasibility-scaled
    so the binding language is kept whole; md5 membership keeps the sample
    reproducible across runs/engines/partitionings."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.mixture_sample(docs, "lang", "doc_id",
                                  {"en": 0.4, "zh": 0.3, "de": 0.3})
    return out.select("doc_id", "lang")


def q_fuzzy_resolve(spark, sf_dir):
    """Canonical fuzzy resolve (operators/entity.py:fuzzy_resolve_edit1):
    truncated supplier names (a deterministic 1-char typo) resolved back
    against the canonical vocabulary within one edit — broadcast canon
    variants, candidate-only levenshtein, deterministic (min dist, then
    lexicographic) tie rule; the reference's sample-name reconciliation
    made total instead of silently dropping rows."""
    sup = _t(spark, sf_dir, "supplier")
    data = sup.select(F.col("s_suppkey").alias("sid"),
                      F.expr("substring(s_name, 1, length(s_name) - 1)")
                      .alias("name"))
    canon = sup.select(F.col("s_name").alias("c"))
    out = entity.fuzzy_resolve_edit1(data, "sid", "name", canon, "c")
    return out.select("sid", "name", "resolved",
                      F.col("resolve_dist").cast("int").alias("resolve_dist"))


def q_weighted_sample(spark, sf_dir):
    """Efraimidis–Spirakis weighted sampling without replacement
    (operators/sampling.py): 20 lineitems per return flag, probability
    proportional to quantity, deterministic via md5-derived exponential
    keys — reproducible across runs/engines/partitionings."""
    li = _spread(spark, sf_dir, "lineitem")
    d = li.select(F.col("l_returnflag").alias("grp"),
                  (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
                  .alias("id"),
                  F.col("l_quantity").cast("double").alias("w"))
    out = sampling.weighted_sample(d, ["grp"], "id", "w", 20)
    return out.select("grp", "id", _r4("w").alias("weight"),
                      _r4("es_score").alias("es_score"))


def q_interval_merge(spark, sf_dir):
    """bedtools-merge islands (operators/intervals.py:38): each user's
    purchase windows flattened to maximal overlapping+book-ended spans —
    a running-max window marks island starts, one groupBy emits them.
    Companion to the reference's contig-span joins (postgres.Rmd contig
    views); one shuffle on the group key."""
    ev = _events(spark, sf_dir).withColumn("ts_us", windows.epoch_us("ts"))
    win = 300 * 1_000_000
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("ts_us").alias("iv_start"),
                     (F.col("ts_us") + win).alias("iv_end")))
    return intervals.merge_intervals(purch, ["user_id"], "iv_start", "iv_end")


def q_genome_coverage(spark, sf_dir):
    """bedtools-genomecov histogram (operators/intervals.py:66,97): depth
    distribution of overlapping 10-minute event windows per event type —
    sweep-line ±1 deltas + cumulative-sum window; a span costs 2 rows, not
    per-base explode. Mirrors the coverM per-base depth the reference's
    read-mapping rules compute (Snakefile coverage rules)."""
    ev = _events(spark, sf_dir).withColumn("ts_us", windows.epoch_us("ts"))
    win = 600 * 1_000_000
    iv = ev.select(F.col("event_type").alias("contig"),
                   F.col("ts_us").alias("iv_start"),
                   (F.col("ts_us") + win).alias("iv_end"))
    hist = intervals.coverage_histogram(iv, ["contig"], "iv_start", "iv_end")
    return hist.select("contig", "depth",
                       F.col("bases").cast("bigint").alias("bases"))


def q_nearest_feature(spark, sf_dir):
    """bedtools-closest (operators/intervals.py:113): nearest purchase to
    every error event per user, two-sided, via the union-merge pattern —
    ONE shuffle of points ∪ features, prev/next ordered windows, no
    per-point probe join; deterministic tie rules (min feature id)."""
    ev = _events(spark, sf_dir).withColumn("ts_us", windows.epoch_us("ts"))
    errs = (ev.filter(F.col("event_type") == "error")
            .select("user_id", F.col("event_id").alias("error_id"),
                    F.col("ts_us").alias("pos")))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("event_id").alias("purchase_id"),
                     F.col("ts_us").alias("fpos")))
    out = intervals.nearest_feature(errs, purch, ["user_id"],
                                    "error_id", "pos", "purchase_id", "fpos")
    return out.select("user_id", "error_id", "nearest_id", "distance")


def q_threshold_filter(spark, sf_dir):
    """P3 kraken minimizer-style threshold filter + column drop
    (Snakefile:1823): events with value >= 150, report columns only."""
    ev = _events(spark, sf_dir)
    return (ev.filter(F.col("value") >= 150)
            .select("event_id", "user_id", "event_type", _r4("value").alias("value")))


def q_weighted_mean(spark, sf_dir):
    """A9 weighted mean (ampliconTrunc.R:172-180) + §2.9 JSON field access:
    per event type, value weighted by the JSON prop k."""
    ev = _events(spark, sf_dir)
    w = (ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
         .groupBy("event_type")
         .agg(_r4(abundance.weighted_mean("value", "k")).alias("wmean_value"),
              F.sum("k").alias("sum_k")))
    return w


def q_json_histogram(spark, sf_dir):
    """S6 from_json: distribution of the embedded JSON prop k."""
    ev = _events(spark, sf_dir)
    parsed = ev.withColumn("j", F.from_json("props", "k BIGINT"))
    return (parsed.groupBy(F.col("j.k").alias("k"))
            .agg(F.count(F.lit(1)).alias("n")))


def q_date_multiformat(spark, sf_dir):
    """§2.9 multi-format date coercion (postgres.Rmd:74-82): orders dates
    re-rendered in 3 formats by key, then re-parsed with a try_to_date
    cascade (the lubridate ym/ymd/ymd_hms analog)."""
    o = _t(spark, sf_dir, "orders")
    raw = o.withColumn(
        "raw", F.when(F.col("o_orderkey") % 3 == 0,
                      F.date_format("o_orderdate", "yyyy-MM"))
        .when(F.col("o_orderkey") % 3 == 1,
              F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")))
    parsed = raw.withColumn(
        "parsed", F.coalesce(F.try_to_timestamp(F.col("raw"), F.lit("yyyy-MM-dd HH:mm:ss")).cast("date"),
                             F.try_to_timestamp(F.col("raw"), F.lit("yyyy-MM-dd")).cast("date"),
                             F.try_to_timestamp(F.col("raw"), F.lit("yyyy-MM")).cast("date")))
    return parsed.select("o_orderkey", "raw",
                         F.date_format("parsed", "yyyy-MM-dd").alias("parsed_date"),
                         F.year("parsed").alias("parsed_year"))


def q_coverage_stats(spark, sf_dir):
    """A12 coverM-style coverage aggregate (Snakefile:1663-1669): mean,
    rank-trimmed mean, variance, covered positions per contig;
    contig≈l_suppkey, depth≈l_quantity."""
    li = _t(spark, sf_dir, "lineitem")
    depths = li.select(F.col("l_suppkey").alias("contig"),
                       F.col("l_quantity").alias("depth"))
    cov = abundance.coverage_stats(depths, "contig", "depth", trim_frac=0.05)
    return cov.select("contig", _r4("mean").alias("mean"),
                      _r4("trimmed_mean").alias("trimmed_mean"),
                      _r4("variance").alias("variance"),
                      F.col("covered_bases").cast("bigint").alias("covered_bases"),
                      F.col("count").alias("n_rows"))


def q_separate_lineage(spark, sf_dir):
    """R6 separate with regex sep ';[a-z]__' (postgres.Rmd:180, 669, 865):
    lineage string parsed into rank columns."""
    c, n, r = (_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation"),
               _t(spark, sf_dir, "region"))
    df = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
          .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .select("c_custkey",
                  F.concat(F.lit("d__"), "r_name", F.lit(";p__"), "n_name",
                           F.lit(";c__"), "c_mktsegment").alias("lineage")))
    out = taxonomy.parse_lineage(df, "lineage")
    return out.select("c_custkey", "lineage", "kingdom", "phylum",
                      F.col("class").alias("class_"))


def q_explode_csv(spark, sf_dir):
    """R7 separate_longer_delim (update_output_status.R:12): csv cell → rows."""
    o = _t(spark, sf_dir, "orders")
    df = o.select("o_orderkey",
                  F.concat_ws(",", "o_orderstatus", "o_orderpriority").alias("items"))
    return separate_longer_delim(df, "items")


def q_cross_join_audit(spark, sf_dir):
    """J7 expected-output audit (update_output_status.R:22-41): catalog ×
    samples cross join, exists flags for rich customers per (segment, region)."""
    c, n, r = (_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation"),
               _t(spark, sf_dir, "region"))
    seg = c.select("c_mktsegment").distinct()
    reg = r.select("r_name").distinct()
    actual = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
              .filter(F.col("c_acctbal") > 9900)
              .groupBy("c_mktsegment", "r_name")
              .agg(F.count(F.lit(1)).alias("n")))
    return (seg.crossJoin(reg)
            .join(actual, ["c_mktsegment", "r_name"], "left")
            .select("c_mktsegment", "r_name",
                    F.coalesce("n", F.lit(0)).alias("n_present"),
                    F.col("n").isNotNull().alias("present")))


def q_read_count_ladder(spark, sf_dir):
    """A13 read-count QC ladder (Snakefile:775-794) + W3 lag retention:
    per-returnflag row counts through 4 filter stages."""
    li = _t(spark, sf_dir, "lineitem")
    c1 = F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    c2 = c1 & (F.col("l_quantity") < 45)
    c3 = c2 & (F.col("l_discount") > 0.01)
    stages = [("raw", None), ("shipped", c1), ("qty45", c2), ("lowdisc", c3)]
    parts = []
    for i, (name, cond) in enumerate(stages):
        d = li if cond is None else li.filter(cond)
        parts.append(d.groupBy("l_returnflag")
                     .agg(F.count(F.lit(1)).alias("n"))
                     .select("l_returnflag",
                             F.lit(i).cast("bigint").alias("stage_order"),
                             F.lit(name).alias("stage"), "n"))
    ladder = reduce(lambda a, b: a.unionByName(b), parts)
    out = windows.lag_retention_ladder(ladder, ["l_returnflag"], "stage_order",
                                       "n", out="pct_of_prev")
    return out.select("l_returnflag", "stage_order", "stage", "n",
                      _r4("pct_of_prev").alias("pct_of_prev"))


def q_kingdom_priority_lca(spark, sf_dir):
    """A11 MakeLCA kingdom-priority buckets (AnnotateContigs.pl:690-696):
    LCA within the highest-priority region present per order
    (ASIA > EUROPE > AFRICA > rest)."""
    li, s, n, r = (_t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "supplier"),
                   _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region"))
    hits = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("l_orderkey", "r_name",
                    F.array("r_name", "n_name").alias("path")))
    out = taxonomy.kingdom_priority_lca(hits, ["l_orderkey"], "path",
                                        "r_name", ["ASIA", "EUROPE", "AFRICA"])
    return out.select(
        "l_orderkey",
        F.array_size("lca_path").cast("bigint").alias("lca_depth"),
        F.coalesce(F.try_element_at("lca_path", F.lit(-1)), F.lit("root")).alias("lca_name"))


def q_union_missing_cols(spark, sf_dir):
    """§2.7 bind_rows with absent-column NA fill (standardize_bins.R:92,
    postgres.Rmd:97): customer ∪ supplier inventories."""
    c, s = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    cust = c.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
                    F.col("c_acctbal").alias("acctbal"),
                    F.lit("customer").alias("kind"))
    sup = s.select(F.col("s_suppkey").alias("id"), F.col("s_name").alias("name"),
                   F.lit("supplier").alias("kind"))
    out = cust.unionByName(sup, allowMissingColumns=True)
    return out.select("id", "name", "kind", _r4("acctbal").alias("acctbal"))


def q_sequential_ids(spark, sf_dir):
    """W6 global sequential renumbering (standardize_bins.R:94-97): documents
    renumbered by size. Single-partition window — metadata-scale only."""
    d = _t(spark, sf_dir, "documents")
    out = windows.sequential_ids(
        d, [F.col("n_chars").desc(), F.col("doc_id").asc()], out="new_id")
    return out.select("doc_id", F.col("new_id").cast("bigint").alias("new_id"))


def q_dna_reads_qc(spark, sf_dir):
    """P5/P6 + §2.9 bio scalars: acgt 'reads' derived from documents, fastp-
    style quality filter (min length, homopolymer drop), GC content, revcomp
    (postgres.Rmd:1196, RemovePolyPairs.pl:32-40)."""
    d = _t(spark, sf_dir, "documents")
    reads = d.select("doc_id", F.regexp_replace(F.lower("text"), "[^acgt]", "")
                     .alias("seq"))
    kept = bio.quality_filter(reads, "seq", min_len=30, max_n=0,
                              max_homopolymer=4)
    return kept.select(
        "doc_id", bio.seq_length("seq").cast("bigint").alias("seq_len"),
        _r4(bio.gc_content("seq")).alias("gc"),
        F.substring(bio.reverse_complement("seq"), 1, 10).alias("rc_prefix"))


def q_asv_matrix(spark, sf_dir):
    """A15 relational tail of ASV construction (ampliconTrunc.R:318-323):
    sample × ASV count matrix; sample≈source, ASV≈lang."""
    d = _t(spark, sf_dir, "documents")
    out = pivot_wider(d, ["source"], "lang", F.count(F.lit(1)),
                      values=["de", "en", "es", "fr", "zh"], fill=0)
    return out.orderBy("source")


def q_multimodal_features(spark, sf_dir):
    """North-star multimodal plumbing: opaque binary column → Arrow-batched
    mapInPandas feature extraction (stub decode: byte histogram), long form."""
    d = _t(spark, sf_dir, "documents")
    # ASCII-strip before encoding: the stub histograms UTF-8 BYTES (correct
    # for opaque media) while the SQL oracle can only walk characters — on
    # multi-byte text the two would diverge, so the gate input is pinned to
    # the byte==char subset on BOTH sides.
    ascii_text = F.regexp_replace("text", r"[^\x20-\x7e]", "")
    media = d.select(F.col("doc_id").alias("media_id"),
                     F.encode(ascii_text, "UTF-8").alias("content"))
    feats = multimodal.extract_image_features(media, feature_dim=8)
    return (feats.select("media_id", F.posexplode("feature").alias("k", "v"))
            .select("media_id", F.col("k").cast("bigint").alias("k"),
                    _r4("v").alias("feat")))


def _exact_key_pairs(media, pairs):
    """Collision-proof a max_hamming=0 signature gate: keep only pairs
    whose CONTENT is identical under (xxhash64, length) — equal payload
    always passes (equal bytes ⇒ equal signature ⇒ candidate in every
    band), so the filter only removes perceptual-hash collisions between
    unequal payloads, aligning the query with the equality-keyed oracle
    at any sf. Both joins are on the pair ids; at fixture scale AQE
    broadcasts the key frame. The key frame is persisted so the media
    lineage (documents scan + rpad/encode synthesis) is computed once,
    not once per join side; at warehouse scale the key would be a stored
    content-hash column, not a query-time recompute."""
    from glamr_omics_pipelines_spark.operators import _cache
    keys = _cache.register(
        media.select("media_id", F.xxhash64("content").alias("_ck"),
                     F.length("content").alias("_cl")))
    return (pairs
            .join(keys.select(F.col("media_id").alias("id_a"),
                              F.col("_ck").alias("_ka"),
                              F.col("_cl").alias("_la")), "id_a")
            .join(keys.select(F.col("media_id").alias("id_b"),
                              F.col("_ck").alias("_kb"),
                              F.col("_cl").alias("_lb")), "id_b")
            .filter((F.col("_ka") == F.col("_kb"))
                    & (F.col("_la") == F.col("_lb"))))


def q_phash_dedup(spark, sf_dir):
    """Perceptual-hash image near-dup (operators/multimodal.py:phash_images
    + operators/dedup.py:hamming_candidates — the image twin of
    simhash_dedup): documents are rendered as REAL 32×32 P5 images (header
    + ascii payload rpad'd to 1024 bytes with a constant pad), planted
    copies (doc_id % 20) added, hashed through the full decode→resize→
    DCT→sign pipeline, and paired by the banded Hamming equi join at
    max_hamming=0, then post-filtered on an exact content key
    (xxhash64 + length — advisor r9: a pHash is 63 DCT sign bits with a
    near-constant DC bit, so unrelated structured payloads collide far
    more often than 2⁻⁶⁴; the exact key makes the gate collision-proof
    at ANY sf, in the exact_dedup dual-hash assumption class). Near-dup
    (hamming > 0) behavior — brightness/resize invariance — is
    pytest-pinned where SQL can't follow."""
    d = _t(spark, sf_dir, "documents")
    ascii_text = F.regexp_replace("text", r"[^\x20-\x7e]", "")
    base = d.select("doc_id", F.rpad(ascii_text, 1024, ". ").alias("pix"))
    media = base.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.concat(F.lit("P5\n32 32\n255\n"), F.col("pix")),
                 "UTF-8").alias("content"))
    copies = (media.filter(F.col("media_id") % 20 == 0)
              .select((F.col("media_id") + 100000).alias("media_id"),
                      "content"))
    allm = media.unionByName(copies)
    hashes = multimodal.phash_images(allm, stub=False)
    pairs = dedup.hamming_candidates(hashes, "media_id", "phash",
                                     bands=4, max_hamming=0)
    return _exact_key_pairs(allm, pairs).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("hamming").cast("bigint").alias("hamming"))


_PHASH_DEDUP_SQL = """
    WITH base AS (
      SELECT doc_id,
             rpad(regexp_replace(text, '[^\\x20-\\x7e]', '', 'g'),
                  1024, '. ') AS pix
      FROM documents),
    allm AS (
      SELECT doc_id AS media_id, pix FROM base
      UNION ALL
      SELECT doc_id + 100000, pix FROM base WHERE doc_id % 20 = 0)
    SELECT CAST(a.media_id AS BIGINT) AS id_a,
           CAST(b.media_id AS BIGINT) AS id_b,
           CAST(0 AS BIGINT) AS hamming
    FROM allm a JOIN allm b
      ON a.pix = b.pix AND a.media_id < b.media_id
"""


def _wav_header(n: int) -> bytes:
    """44-byte RIFF header for a mono 8-bit-PCM 8 kHz WAV with exactly
    ``n`` data bytes, generated ONCE via the stdlib wave writer (sizes in
    the header are payload-length dependent, so the payload length is
    pinned to the rpad width). The afp row uses n=8192: a 1024-byte clip
    yields ONE spectrogram frame (16 band values — far fewer than 64
    independent sign bits, measured payload collisions at sf0.01); 8192
    gives 15 frames x 16 bands, enough entropy that unequal payloads
    separate."""
    import io
    import wave
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes(n))
    return bio.getvalue()[:-n]


def q_afp_dedup(spark, sf_dir):
    """Audio-fingerprint near-dup (operators/multimodal.py:afp_signatures
    + dedup.hamming_candidates — the audio member of the signature
    triangle beside simhash and phash): documents rendered as REAL mono
    8-bit PCM WAVs (stdlib-generated RIFF header + 1024 ascii sample
    bytes), planted copies added, decoded and fingerprinted through the
    full frame→rFFT→band→log→spectrogram-pHash pipeline, paired at
    max_hamming=0 and post-filtered on the exact (xxhash64, length)
    content key (the phash_dedup collision-proofing — spectrogram-pHash
    sign bits are far from uniform on structured payloads); gain
    invariance and discrimination are pytest-pinned where SQL can't
    follow.

    r12: _spread — the WAV decode+rFFT+phash pass is Python-kernel CPU
    over a sub-split scan (interleaved A/B min-of-4: 2.05 -> 1.32 s,
    values identical)."""
    d = _spread(spark, sf_dir, "documents")
    ascii_text = F.regexp_replace("text", r"[^\x20-\x7e]", "")
    # pad by cycling the TEXT ITSELF: a constant pad gives short docs a
    # shared periodic 8 KB tail that DOMINATES the spectrogram (measured:
    # 20k+ collision pairs at sf0.01); the oracle keys on pix equality, so
    # text-cycling stays consistent by construction
    base = (d.select("doc_id", ascii_text.alias("t"))
            .filter(F.length("t") > 0)
            .select("doc_id", F.rpad("t", 8192, F.col("t")).alias("pix")))
    media = base.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit(_wav_header(8192)),
                 F.encode("pix", "UTF-8")).alias("content"))
    copies = (media.filter(F.col("media_id") % 20 == 1)
              .select((F.col("media_id") + 100000).alias("media_id"),
                      "content"))
    allm = media.unionByName(copies)
    sig = multimodal.afp_signatures(allm, stub=False)
    pairs = dedup.hamming_candidates(sig, "media_id", "afp",
                                     bands=4, max_hamming=0)
    return _exact_key_pairs(allm, pairs).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("hamming").cast("bigint").alias("hamming"))


_AFP_DEDUP_SQL = """
    WITH base AS (
      SELECT doc_id, rpad(t, 8192, t) AS pix FROM (
        SELECT doc_id,
               regexp_replace(text, '[^\\x20-\\x7e]', '', 'g') AS t
        FROM documents) WHERE len(t) > 0),
    allm AS (
      SELECT doc_id AS media_id, pix FROM base
      UNION ALL
      SELECT doc_id + 100000, pix FROM base WHERE doc_id % 20 = 1)
    SELECT CAST(a.media_id AS BIGINT) AS id_a,
           CAST(b.media_id AS BIGINT) AS id_b,
           CAST(0 AS BIGINT) AS hamming
    FROM allm a JOIN allm b
      ON a.pix = b.pix AND a.media_id < b.media_id
"""


# frozen WordPiece vocabulary — ONE canonical constant; the oracle VALUES
# are generated from it. Includes nested pieces (spark ⊃ sp ⊃ s, so vs s)
# so greedy longest-match-first is load-bearing, continuation pieces, and
# enough coverage gaps that [UNK] words occur.
_WP_VOCAB = ["a", "the", "spark", "sp", "##ark", "s", "##park", "so",
             "##rt", "##ort", "table", "scan", "sc", "##an", "custom",
             "##er", "fil", "##ter", "da", "##ta", "key", "merge"]
_WP_STEPS = 12  # ≥ longest corpus word (8 chars) ⇒ the step cap is inert


def q_wordpiece_encode(spark, sf_dir):
    """WordPiece tokenizer application (operators/text.py:wordpiece_encode
    — BERT greedy longest-match-first, the second frozen-tokenizer family
    beside bpe_encode) over the corpus with the frozen 22-piece vocab.
    Output pins token count + the first 12 pieces (merge order,
    continuation framing, whole-word UNK).

    r12: strategy="pandas" (the Arrow-batched greedy with a per-TASK word
    cache — guide §4.5) replaces the pinned "fold" form: the fold's
    aggregate-over-sequence HOF evaluates INTERPRETED per word occurrence
    (~12 steps × 22-piece filter scans), while the pandas path encodes
    each distinct word once per task. Byte-identical output
    (property-tested in test_text_functions + A/B-verified here:
    2.44 s → 0.64 s min-of-4, values equal; fold+_spread measured 0.80,
    pandas+_spread 1.00 — the serial cached pandas form wins because the
    corpus' distinct-word set is small and one Arrow task beats 32-task
    scheduling at this SF). select() first: mapInPandas ships every
    column it is given (§4.2 column pruning)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = text.wordpiece_encode(d, "text", _WP_VOCAB,
                                max_steps=_WP_STEPS, strategy="pandas")
    # coalesce mirrors the oracle's LEFT JOIN + coalesce: a NULL-text doc
    # yields NULL wp_tokens here but 0/'' there (advisor r9 — latent until
    # a fixture carries NULL text)
    return out.select(
        "doc_id",
        F.coalesce(F.array_size("wp_tokens").cast("bigint"),
                   F.lit(0)).alias("n_wp"),
        F.coalesce(F.array_join(F.slice("wp_tokens", 1, 12), " "),
                   F.lit("")).alias("head_toks"))


def _wordpiece_sql() -> str:
    """Oracle for q_wordpiece_encode: the greedy state machine unrolled as
    _WP_STEPS CTE rounds at DISTINCT-WORD grain (the k_core unrolled-loop
    convention — corpus-size independent: the recursion runs on the
    vocabulary of words, then joins back to token positions). Per round:
    best match via max_by(piece, len(body)) over the LEFT-joined vocab
    (a length tie is impossible — same length + same prefix ⇒ identical
    body, and cont separates x from ##x); no match on a live word ⇒
    whole-word [UNK] (dead flag); rest unconsumed after the cap ⇒ [UNK]
    (the engine's step-capped contract, inert at 12 ≥ max word length)."""
    vals = ", ".join(
        f"({_dq(p)}, {_dq(p[2:] if p.startswith('##') else p)}, "
        f"{'true' if p.startswith('##') else 'false'})"
        for p in _WP_VOCAB)
    steps = []
    for i in range(1, _WP_STEPS + 1):
        steps.append(f"""
        s{i} AS MATERIALIZED (
          SELECT word,
                 CASE WHEN prev_rest = '' OR prev_dead THEN prev_rest
                      WHEN bp IS NULL THEN ''
                      ELSE substr(prev_rest, length(bb) + 1) END AS rest,
                 CASE WHEN prev_rest = '' OR prev_dead THEN prev_toks
                      WHEN bp IS NULL THEN ['[UNK]']
                      ELSE list_append(prev_toks, bp) END AS toks,
                 CASE WHEN prev_dead THEN true
                      WHEN prev_rest <> '' AND bp IS NULL THEN true
                      ELSE false END AS dead
          FROM (
            SELECT s.word, s.rest AS prev_rest, s.toks AS prev_toks,
                   s.dead AS prev_dead,
                   max_by(v.piece, length(v.body)) AS bp,
                   max_by(v.body, length(v.body)) AS bb
            FROM s{i - 1} s LEFT JOIN voc v
              ON v.cont = (len(s.toks) > 0)
                 AND starts_with(s.rest, v.body)
                 AND s.rest <> '' AND NOT s.dead
            GROUP BY s.word, s.rest, s.toks, s.dead))""")
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(ws) AS w,
                 generate_subscripts(ws, 1) AS wpos
          FROM (SELECT doc_id, list_filter(string_split_regex(lower(text),
                       '\\s+'), x -> x <> '') AS ws
                FROM documents)),
        words AS (SELECT DISTINCT w FROM tok),
        voc(piece, body, cont) AS (VALUES {vals}),
        s0 AS (SELECT w AS word, w AS rest,
                      CAST([] AS VARCHAR[]) AS toks, false AS dead
               FROM words),
        {",".join(steps)},
        fin AS (SELECT word,
                       CASE WHEN rest <> '' THEN ['[UNK]'] ELSE toks END
                         AS toks
                FROM s{_WP_STEPS}),
        docs AS (SELECT t.doc_id,
                        flatten(list(f.toks ORDER BY t.wpos)) AS flat
                 FROM tok t JOIN fin f ON t.w = f.word
                 GROUP BY t.doc_id)
        SELECT d.doc_id, CAST(coalesce(len(flat), 0) AS BIGINT) AS n_wp,
               coalesce(array_to_string(flat[1:12], ' '), '') AS head_toks
        FROM documents d LEFT JOIN docs USING (doc_id)
    """


def _dq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def q_video_dedup(spark, sf_dir):
    """Video near-dup (operators/multimodal.py:vhash_frames /
    video_dup_pairs — completing the signature family across text/image/
    audio/VIDEO): documents rendered as REAL mono Y4M clips (4 × 16×16
    luma frames windowed from the text-cycled payload), planted exact
    copies AND re-cut variants (frames shifted one window — the classic
    subsequence dup), decoded frame-by-frame through the Y4M parser +
    the DCT pHash kernel, paired by the frame-hash inverted-index join.
    Oracle = distinct-frame-payload intersection counts. Collision bound
    (advisor r9, documented honestly): a frame pHash is 63 DCT sign bits
    with a near-constant DC bit — on structured text-derived payloads its
    effective entropy is WELL below 64 bits, so the realistic cross-frame
    collision rate is birthday-style over maybe ~40–50 effective bits,
    not 2⁻⁶⁴. Measured collision-free at sf0.01 (2,500 distinct frames)
    and sf0.1; the gate is certified for the driver's sf range (≤ 0.1).
    An exact-payload post-filter is NOT applied here because pairing is
    frame-level containment, not whole-clip equality, so an exact key has
    no clean place to sit. The min_shared=2 floor suppresses only pairs
    whose SOLE overlap is one colliding frame; a pair sharing 1 genuine
    frame + 1 collision would still surface — the load-bearing defense is
    the measured collision-free frame population at the certified sf
    range, not the floor. Re-cuts land at containment 0.75 with the
    copies at 1.0.

    r12: _spread — the Y4M decode+DCT pass is Python-kernel CPU over a
    sub-split scan; fanning rows out first buys cores-way decode
    (interleaved A/B min-of-4: 2.44 -> 1.59 s, values identical).
    phash_dedup and multimodal_features measured LOSSES under the same
    A/B — their batched kernels are cheaper than the extra exchange —
    and keep _t."""
    d = _spread(spark, sf_dir, "documents")
    ascii_text = F.regexp_replace("text", r"[^\x20-\x7e]", "")
    base = (d.select("doc_id", ascii_text.alias("t"))
            .filter(F.length("t") > 0)
            .select("doc_id", F.rpad("t", 1280, F.col("t")).alias("pix")))

    def clip(off: int):
        return F.concat(
            F.lit("YUV4MPEG2 W16 H16 F25:1 Cmono\n"),
            *[c for o in range(off, off + 1024, 256)
              for c in (F.lit("FRAME\n"),
                        F.substring("pix", o + 1, 256))])

    media = base.select(F.col("doc_id").alias("media_id"),
                        F.encode(clip(0), "UTF-8").alias("content"))
    copies = (base.filter(F.col("doc_id") % 20 == 5)
              .select((F.col("doc_id") + 100000).alias("media_id"),
                      F.encode(clip(0), "UTF-8").alias("content")))
    recuts = (base.filter(F.col("doc_id") % 20 == 2)
              .select((F.col("doc_id") + 200000).alias("media_id"),
                      F.encode(clip(256), "UTF-8").alias("content")))
    allm = media.unionByName(copies).unionByName(recuts)
    fr = multimodal.vhash_frames(allm, stub=False)
    out = multimodal.video_dup_pairs(fr, min_shared=2)
    return out.select(F.col("id_a").cast("bigint").alias("id_a"),
                      F.col("id_b").cast("bigint").alias("id_b"),
                      F.col("n_shared").cast("bigint").alias("n_shared"),
                      "containment")


_VIDEO_DEDUP_SQL = """
    WITH base AS (
      SELECT doc_id, rpad(t, 1280, t) AS pix FROM (
        SELECT doc_id,
               regexp_replace(text, '[^\\x20-\\x7e]', '', 'g') AS t
        FROM documents) WHERE len(t) > 0),
    clips AS (
      SELECT doc_id AS media_id, 0 AS off, pix FROM base
      UNION ALL
      SELECT doc_id + 100000, 0, pix FROM base WHERE doc_id % 20 = 5
      UNION ALL
      SELECT doc_id + 200000, 256, pix FROM base WHERE doc_id % 20 = 2),
    frames AS (
      SELECT DISTINCT media_id,
             substr(pix, off + f * 256 + 1, 256) AS fr
      FROM clips, (SELECT unnest([0, 1, 2, 3]) AS f)),
    counts AS (SELECT media_id, count(*) AS n FROM frames
               GROUP BY media_id),
    pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             count(*) AS n_shared
      FROM frames a JOIN frames b
        ON a.fr = b.fr AND a.media_id < b.media_id
      GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared * 1.0 / least(ca.n, cb.n), 6) AS containment
    FROM pairs
    JOIN counts ca ON ca.media_id = id_a
    JOIN counts cb ON cb.media_id = id_b
"""


def q_dataset_card(spark, sf_dir):
    """Dataset-card report (composition — the per-source corpus summary a
    training-data release publishes): ONE pass over documents through
    quality_features, then a source-grain agg (docs, total/mean/median
    tokens, exact-dup rate via count-distinct text, mean quality score)
    plus the dominant language and its share (value-grain counts + one
    bounded rank window). At 100 TB the distinct-text term becomes
    count_distinct(xxhash64(text)) — the exact_dedup hash-grain contract;
    everything else is partial-agg map-side."""
    d = _t(spark, sf_dir, "documents")
    q = text.quality_features(d, "text")
    agg = (q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        _r4(F.avg("n_tokens")).alias("mean_tokens"),
        _r4(F.expr("percentile(n_tokens, 0.5)")).alias("p50_tokens"),
        _r4(F.lit(1.0) - F.count_distinct("text")
            / F.count(F.lit(1))).alias("dup_rate"),
        _r4(F.avg("quality_score")).alias("mean_quality")))
    lc = (d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("_n")))
    w = Window.partitionBy("source").orderBy(F.col("_n").desc(),
                                             F.col("lang").asc())
    top = (lc.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") == 1)
           .select("source", F.col("lang").alias("top_lang"),
                   F.col("_n").alias("_topn")))
    return (agg.join(top, "source")
            .select("source", F.col("n_docs").cast("bigint").alias("n_docs"),
                    "total_tokens", "mean_tokens", "p50_tokens",
                    "dup_rate", "mean_quality", "top_lang",
                    _r4(F.col("_topn") / F.col("n_docs"))
                    .alias("top_lang_share")))


_DATASET_CARD_SQL = """
    WITH f AS (
      SELECT source, lang, text,
             len(list_filter(string_split_regex(text, '\\s+'),
                 x -> x <> '')) AS n_tok,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS punct,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                 x -> x IN ('the','a','an','and','or','of','to','in',
                            'is','it'))) AS n_stop
      FROM documents),
    q AS (
      SELECT source, lang, text, n_tok,
             0.4 * least(n_tok / 100.0, 1.0)
             + 0.3 * (1.0 - punct::DOUBLE / greatest(n_chars, 1))
             + 0.3 * least(n_stop::DOUBLE / greatest(n_tok, 1) * 5, 1.0)
               AS score
      FROM f),
    agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             round(avg(n_tok), 4) AS mean_tokens,
             round(quantile_cont(n_tok, 0.5), 4) AS p50_tokens,
             round(1.0 - count(DISTINCT text) * 1.0 / count(*), 4)
               AS dup_rate,
             round(avg(score), 4) AS mean_quality
      FROM q GROUP BY source),
    lc AS (SELECT source, lang, count(*) AS n
           FROM documents GROUP BY source, lang),
    top AS (
      SELECT source, lang AS top_lang, n FROM (
        SELECT source, lang, n, row_number() OVER (
          PARTITION BY source ORDER BY n DESC, lang ASC) AS rk
        FROM lc) WHERE rk = 1)
    SELECT agg.source, n_docs, total_tokens, mean_tokens, p50_tokens,
           dup_rate, mean_quality, top_lang,
           round(top.n * 1.0 / n_docs, 4) AS top_lang_share
    FROM agg JOIN top USING (source)
"""


def q_compaction_plan(spark, sf_dir):
    """Small-file compaction planning (operators/layout.py:compaction_plan
    — the OPTIMIZE/rewrite-data-files maintenance step): a synthetic file
    listing derived from documents (path f{doc_id}, bytes n_chars,
    partitioned by source) binned toward a 4000-byte target via ONE
    exclusive-cumsum window at file-listing (metadata) scale."""
    d = _t(spark, sf_dir, "documents")
    files = d.select("source",
                     F.concat(F.lit("f"), F.col("doc_id").cast("string"))
                     .alias("path"),
                     F.col("n_chars").cast("bigint").alias("bytes"))
    out = layout.compaction_plan(files, "path", "bytes", 4000, ["source"])
    return out.select("source", F.col("bin").cast("bigint").alias("bin"),
                      F.col("n_files").cast("bigint").alias("n_files"),
                      "bin_bytes", "needs_compaction")


_COMPACTION_PLAN_SQL = """
    WITH files AS (
      SELECT source, 'f' || CAST(doc_id AS VARCHAR) AS path,
             CAST(n_chars AS BIGINT) AS bytes
      FROM documents),
    a AS (
      SELECT source, bytes,
             CAST(floor(coalesce(sum(bytes) OVER (
               PARTITION BY source ORDER BY path
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 4000.0) AS BIGINT) AS bin
      FROM files)
    SELECT source, bin, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS bin_bytes,
           count(*) > 1 AS needs_compaction
    FROM a GROUP BY source, bin
"""


def _docs_tag(spark, sf_dir) -> str:
    """Cache key for document-derived gate fixtures: path digest PLUS a
    content fingerprint (row count + xxhash64 over id/length), so a
    regenerated sf directory can never serve a stale fixture file."""
    import hashlib
    # bit_xor, not sum: order-independent AND overflow-free under ANSI mode
    row = (_t(spark, sf_dir, "documents")
           .agg(F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(doc_id, length(text)))").alias("h"))
           .collect()[0])
    pathtag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"{pathtag}_{row['n']}_{(row['h'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def _fasta_path(spark, sf_dir) -> str:
    """Deterministic FASTA rendering of documents' acgt-reduced text —
    generated once per (sf, content fingerprint) under /tmp (atomic rename),
    so the S2 reader can be exercised inside the correctness gate. The write
    streams via toLocalIterator — bounded driver memory at any sf."""
    path = f"/tmp/glamr_fasta_{_docs_tag(spark, sf_dir)}.fa"
    if not os.path.exists(path):
        rows = (_t(spark, sf_dir, "documents")
                .select("doc_id", "source", "lang",
                        F.regexp_replace(F.lower("text"), "[^acgt]", "")
                        .alias("seq"))
                .orderBy("doc_id").toLocalIterator())
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for r in rows:
                f.write(f">doc_{r.doc_id} source={r.source} lang={r.lang}\n")
                for i in range(0, len(r.seq), 60):
                    f.write(r.seq[i:i + 60] + "\n")
        os.replace(tmp, path)
    return path


def q_fasta_roundtrip(spark, sf_dir):
    """S2 FASTA reader (rename_contigs.R:46-83): split-safe '>'-delimited scan
    + header field extraction, verified against the source documents."""
    fa = sequences.read_fasta(spark, _fasta_path(spark, sf_dir))
    return fa.select(
        F.regexp_extract("header", r"doc_(\d+)", 1).cast("bigint").alias("doc_id"),
        F.regexp_extract("header", r"source=(\S+)", 1).alias("source"),
        F.regexp_extract("header", r"lang=(\S+)", 1).alias("lang"),
        F.length("seq").cast("bigint").alias("seq_len"))


def _fastq_path(spark, sf_dir) -> str:
    """Deterministic gzipped FASTQ derived from documents (S1 gate input):
    seq = first 20 acgt chars (docs with >=20 only), qual[i] = chr(33 +
    (doc_id + i + 1) % 40) — arithmetic the oracle reproduces without
    reading the file. Cache key includes the content fingerprint (_docs_tag);
    the write streams via toLocalIterator (bounded driver memory)."""
    import gzip
    path = f"/tmp/glamr_fastq_{_docs_tag(spark, sf_dir)}.fastq.gz"
    if not os.path.exists(path):
        rows = (_t(spark, sf_dir, "documents")
                .select("doc_id", F.regexp_replace(F.lower("text"), "[^acgt]", "")
                        .alias("seq"))
                .filter(F.length("seq") >= 20)
                .orderBy("doc_id").toLocalIterator())
        tmp = path + ".tmp"
        with gzip.open(tmp, "wt") as f:
            for r in rows:
                qual = "".join(chr(33 + (r.doc_id + i + 1) % 40)
                               for i in range(20))
                f.write(f"@doc_{r.doc_id}\n{r.seq[:20]}\n+\n{qual}\n")
        os.replace(tmp, path)
    return path


def q_fastq_roundtrip(spark, sf_dir):
    """S1 FASTQ(.gz) reader (pypelib/raw_reads.py:291-338) + §2.9 mean_qual /
    gc_content: 4-line gzip records parsed executor-side, Phred decode via
    higher-order functions."""
    fq = sequences.read_fastq(spark, _fastq_path(spark, sf_dir))
    return fq.select(
        F.regexp_extract("read_id", r"doc_(\d+)", 1).cast("bigint").alias("doc_id"),
        F.length("seq").cast("bigint").alias("read_len"),
        _r4(bio.gc_content("seq")).alias("gc"),
        _r4(bio.mean_qual("qual")).alias("mean_qual"))


def q_quality_window_trim(spark, sf_dir):
    """P5 tail — fastp sliding-window quality trim + low-complexity filter
    (Snakefile:563-571: --cut_front --cut_tail --cut_window_size=4
    --cut_mean_quality 20 --low_complexity_filter --complexity_threshold 7):
    higher-order Column expressions over the decoded Phred array of the S1
    FASTQ fixture — no Python in the plan.

    r12: repartition right after the parse — gzip is unsplittable, so a
    single .fastq.gz is ONE task at ANY scale and the interpreted
    Phred-array HOFs above it ran serially (guide §2.5's 'one huge
    unsplittable file → repartition immediately after the read', verbatim).
    Interleaved A/B min-of-6: 1.20 -> 1.04 s, values identical."""
    fq = sequences.read_fastq(spark, _fastq_path(spark, sf_dir)) \
        .repartition(spark.sparkContext.defaultParallelism)
    t = bio.sliding_window_trim(fq, seq="seq", qual="qual",
                                window=4, min_mean_q=20)
    t = t.withColumn("complexity", bio.sequence_complexity("seq"))
    return (t.filter(F.col("complexity") >= 7.0)
            .select(F.regexp_extract("read_id", r"doc_(\d+)", 1)
                    .cast("bigint").alias("doc_id"),
                    "front_cut", "tail_cut",
                    F.length("trimmed_seq").cast("bigint").alias("trimmed_len"),
                    "trimmed_seq",
                    _r4("complexity").alias("complexity")))


def q_xml_extract(spark, sf_dir):
    """S7 XML metadata extraction (pypelib/sra.py:28-75): xpath over an XML
    column, JVM-side (no UDF)."""
    o = _t(spark, sf_dir, "orders")
    xml = o.select("o_orderkey", F.concat(
        F.lit("<rec><status>"), "o_orderstatus",
        F.lit("</status><prio>"), "o_orderpriority",
        F.lit("</prio></rec>")).alias("xml"))
    return xml.select(
        "o_orderkey",
        F.xpath_string("xml", F.lit("/rec/status")).alias("status"),
        F.xpath_string("xml", F.lit("/rec/prio")).alias("prio"))


def q_quality_bands(spark, sf_dir):
    """P8 checkM quality banding (make_das_and_drep_inputs.R:36-38):
    case-when bands + per-band counts."""
    c = _t(spark, sf_dir, "customer")
    band = (F.when(F.col("c_acctbal") > 7500, "High")
            .when(F.col("c_acctbal") > 2500, "Medium")
            .otherwise("Low"))
    return (c.withColumn("band", band)
            .groupBy("c_mktsegment", "band")
            .agg(F.count(F.lit(1)).alias("n"),
                 _r4(F.avg("c_acctbal")).alias("avg_acctbal")))


def q_distinct_catalog(spark, sf_dir):
    """§2.7/A7 distinct-sample catalog (the loose-index-scan analog,
    postgres.Rmd:22-37): distinct priorities + per-priority distinct
    customer count."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n_customers"),
                 F.count(F.lit(1)).alias("n_orders")))


def q_na_handling(spark, sf_dir):
    """P4 NA normalization (postgres.Rmd:83, merge_kraken_tax.R:42):
    sentinel→NULL via when/otherwise, then replace_na."""
    d = _t(spark, sf_dir, "documents")
    lang_clean = F.when(F.col("lang").isin("zh", "und"), None) \
        .otherwise(F.col("lang"))
    return (d.withColumn("lang_clean", F.coalesce(lang_clean, F.lit("unknown")))
            .groupBy("lang_clean").agg(F.count(F.lit(1)).alias("n")))


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: dedup / similarity / text (north star)
# ---------------------------------------------------------------------------


def _planted_embeddings(spark, sf_dir, limit=100):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < limit) \
        .select("vec_id", "embedding")
    copy = e.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    return e.unionByName(copy)


def q_embedding_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs (>=0.999) on a corpus with planted
    exact duplicates — the LSH-verifiable extension of exact dedup."""
    corpus = _planted_embeddings(spark, sf_dir)
    out = dedup.embedding_cosine_dups(corpus, "vec_id", "embedding",
                                      threshold=0.999)
    return out.select("id_a", "id_b", _r4("cosine").alias("cosine"))


def q_semdedup(spark, sf_dir):
    """Cluster-scoped semantic dedup (operators/dedup.py:semdedup — the
    SemDeDup shape): embeddings are assigned to DATA-INDEPENDENT seeded
    k-means cells (ivf_centroids_random — both engines regenerate identical
    literals, the pq_ann oracle pattern), pairwise cosine runs ONLY within
    a cell (Σ|cell|² work through an EQUI join on the cell, never the
    global n² nested loop), and each row with a smaller-id near-duplicate
    (round-6 cosine >= 0.95) in its cell is marked dropped with the
    survivor recorded in dup_of. Corpus = planted exact duplicates so the
    drop set is non-trivial. Trained centroids (train_ivf_centroids /
    kmeans_lloyd) are pytest-covered."""
    corpus = _planted_embeddings(spark, sf_dir)
    cents = similarity.ivf_centroids_random(k=4, dim=64, seed=11)
    out = dedup.semdedup(corpus, "vec_id", "embedding", cents,
                         threshold=0.95)
    return out.select("vec_id", F.col("ivf_cell").cast("bigint")
                      .alias("ivf_cell"), "dup_of", "keep")


def q_minhash_incremental(spark, sf_dir):
    """Incremental near-dup detection against a persisted LSH index
    (operators/dedup.py:minhash_bands / minhash_lsh_candidates_vs — the
    near-dup twin of bloom_novelty's incremental story): the historical
    corpus's band-bucket rows are built once; the NEW batch (planted
    copies of half the history + guaranteed-novel reversed texts) hashes
    only itself and probes the stored bands through one (band, bucket)
    equi join; survivors are exactly-verified with candidate-restricted
    n-gram Jaccard. Oracle = exact cross-corpus Jaccard >= 0.9 over the
    same union (the minhash_dedup convention: at this corpus every
    qualifying pair is an exact duplicate, which LSH banding catches
    with certainty)."""
    d = _t(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") < 100).select("doc_id", "text")
    new = (d.filter(F.col("doc_id") < 50)
           .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
           .unionByName(
               d.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
               .select((F.col("doc_id") + 20000).alias("doc_id"),
                       F.reverse("text").alias("text"))))
    hb = dedup.minhash_bands(hist, "doc_id", "text", num_hashes=32,
                             bands=16, shingle_n=4)
    nb = dedup.minhash_bands(new, "doc_id", "text", num_hashes=32,
                             bands=16, shingle_n=4)
    cands = dedup.minhash_lsh_candidates_vs(nb, hb, "doc_id",
                                            dedup_pairs=False)
    union = hist.unionByName(new)
    pairs = dedup.ngram_jaccard_pairs(
        union, "doc_id", "text", shingle_n=4, threshold=0.9,
        candidates=cands.select(F.col("id_hist").alias("id_a"),
                                F.col("id_new").alias("id_b")))
    return pairs.select("id_a", "id_b", _r4("jaccard").alias("jaccard"))


def q_mixture_plan(spark, sf_dir):
    """Budget/epoch mixture planning (operators/sampling.py:mixture_plan
    — the data-mixing table a training run is configured from, completing
    the sampling family: temperature_sample rate-limits, mixture_sample
    hits target shares, mixture_plan PLANS the budget): α=0.5 weights
    over per-lang token mass, budget = 2× the corpus, epochs capped at
    2.5 with clipped domains' unused budget water-filled back over the
    rest. The budget is integer-exact on both engines (2.0 × an exact
    bigint sum), so the only cross-engine float drift is the 1-ulp
    pow/sum class round-4 absorbs. The oracle unrolls TWO water-filling
    rounds (idempotent when the fixed point lands in one); the engine
    asserts rounds ≤ 2 diagnosably (the n_batches pin pattern) — at
    sf0.01 round 1 clips 'de' and round 2 redistributes cleanly."""
    d = _t(spark, sf_dir, "documents")
    total = d.agg(F.sum("n_chars")).collect()[0][0]
    plan, rounds = sampling.mixture_plan(
        d, "lang", F.col("n_chars"), token_budget=2.0 * total,
        alpha=0.5, max_epochs=2.5)
    if rounds > 2:
        raise ValueError(
            f"mixture_plan ran {rounds} water-filling rounds at this "
            f"scale factor; the oracle unrolls 2 — a round-2 clip means "
            f"the fixture needs a deeper unroll, not a silent mismatch")
    return plan.select(F.col("lang"), "n_tokens",
                       _r4("epochs").alias("epochs"),
                       _r4("share").alias("share"), "clipped")


def q_incremental_curation(spark, sf_dir):
    """END-TO-END incremental ingestion curation in ONE lazy plan — the
    composition the session's incremental operators exist for: a new
    batch (exact copies of part of the history + guaranteed-novel
    reversed texts) is (a) exact-gated against the history's Bloom
    bitmap on the text content (maybe_seen=false GUARANTEES no exact
    match), (b) near-dup-probed against the history's persisted MinHash
    band index (history never re-hashed), (c) LSH survivors exactly
    verified with candidate-restricted Jaccard, and every new doc gets a
    verdict: 'dup' (verified near/exact duplicate of history),
    'flagged_exact' (Bloom hit but no verified near-dup — a false
    positive or sub-threshold match), or 'novel'. The oracle recomputes
    the Bloom bits (md5) and the exact cross-corpus Jaccard — verdict
    logic, gate semantics and aggregation all under the hash (candidate
    COUNTS are LSH-dependent and deliberately not output — the
    minhash_dedup oracle convention)."""
    d = _t(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") < 100).select("doc_id", "text")
    new = (d.filter(F.col("doc_id") < 50)
           .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
           .unionByName(
               d.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
               .select((F.col("doc_id") + 20000).alias("doc_id"),
                       F.reverse("text").alias("text"))))
    bloom = sketches.bloom_build(hist, "text", m_bits=4096, k=3)
    gate = sketches.bloom_novel(new, "text", bloom, m_bits=4096, k=3)
    hb = dedup.minhash_bands(hist, "doc_id", "text", num_hashes=32,
                             bands=16, shingle_n=4)
    nb = dedup.minhash_bands(new, "doc_id", "text", num_hashes=32,
                             bands=16, shingle_n=4)
    cands = dedup.minhash_lsh_candidates_vs(nb, hb, "doc_id",
                                            dedup_pairs=False)
    union = hist.unionByName(new)
    pairs = dedup.ngram_jaccard_pairs(
        union, "doc_id", "text", shingle_n=4, threshold=0.9,
        candidates=cands.select(F.col("id_hist").alias("id_a"),
                                F.col("id_new").alias("id_b")))
    dups = (pairs.groupBy(F.col("id_b").alias("doc_id"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_dups"),
                 F.max("jaccard").alias("best_jaccard")))
    out = (new.select("doc_id", "text")
           .join(gate, "text", "left")
           .join(dups, "doc_id", "left")
           .withColumn("n_dups", F.coalesce("n_dups", F.lit(0)))
           .withColumn("verdict",
                       F.when(F.col("n_dups") > 0, F.lit("dup"))
                       .when(F.col("maybe_seen"), F.lit("flagged_exact"))
                       .otherwise(F.lit("novel"))))
    return out.select("doc_id", "maybe_seen", "n_dups",
                      _r4("best_jaccard").alias("best_jaccard"), "verdict")


def q_quality_classifier(spark, sf_dir):
    """Hashed-linear quality-classifier inference (operators/text.py:
    hashed_linear_score — the fastText-style scan-stage filter of the
    CCNet/LLaMA pipelines): DATA-INDEPENDENT seeded weights (both
    engines regenerate the identical literal — the pq_ann pattern) score
    every document as sigmoid(bias + sum of per-token hashed-bucket
    weights); keep = score >= 0.5. The model IS the expression tree —
    zero shuffle, zero Python, zero broadcast round-trip."""
    import random
    rng = random.Random(13)
    w = [rng.gauss(0.0, 0.5) for _ in range(256)]
    d = _t(spark, sf_dir, "documents")
    out = text.hashed_linear_score(d, "text", w, bias=0.1)
    # threshold the ROUNDED score (the round-before->= convention —
    # semdedup's round-6 rationale): the raw sigmoid differs by ~1 ulp
    # across fold orders, and a z within an ulp of 0 would flip keep
    return out.select("doc_id", _r4("score").alias("score"),
                      (_r4("score") >= 0.5).alias("keep"))


def q_leakage_safe_split(spark, sf_dir):
    """Dedup-aware train/test split (operators/sampling.py:
    leakage_safe_split): the dup_clusters pipeline's cluster map decides
    splits at the CLUSTER grain — every near-dup pair co-travels
    (planted (d, d+10000) duplicates land together by construction,
    pinned by pytest), so the test set can never hold a training doc's
    near-duplicate. Split = md5 bucket of the cluster representative
    (label for clustered docs, own id for singletons) — the
    split-assignment half of the contamination story whose detection
    half is split_contamination."""
    corpus = _dup_corpus(spark, sf_dir)
    cands = dedup.minhash_lsh_candidates(corpus, "doc_id", "text",
                                         num_hashes=32, bands=16,
                                         shingle_n=4, dedup_pairs=False)
    pairs = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text",
                                      shingle_n=4, threshold=0.9,
                                      candidates=cands)
    labels = dedup.dup_clusters(pairs.select("id_a", "id_b"))
    out = sampling.leakage_safe_split(corpus, "doc_id", labels,
                                      train_pct=80)
    return out.select("doc_id", F.col("_rep").alias("rep"), "split")


def q_hist_quantile(spark, sf_dir):
    """Mergeable histogram quantile sketch (operators/sketches.py:
    hist_sketch/hist_rollup/hist_quantiles — the quantile member of the
    sketch family beside HLL/KMV/CMS): per-(event_type, day) fixed-width
    bin sketches are MERGED to event_type grain and quantiles answered
    from the merged bins. The oracle bins DIRECTLY at event_type grain —
    the hash match proves the mergeability identity (rolled-up fine bins
    == direct coarse bins), which is the property that lets a 100 TB
    warehouse answer percentiles from stored sketches without fact
    re-scans. Rank interpolation is exact integer+literal math on both
    sides."""
    ev = (_events(spark, sf_dir)
          .withColumn("day", F.date_format("ts", "yyyy-MM-dd")))
    fine = sketches.hist_sketch(ev, ["event_type", "day"], "value",
                                width=10.0)
    merged = sketches.hist_rollup(fine, ["event_type"])
    out = sketches.hist_quantiles(merged, ["event_type"],
                                  [0.5, 0.9, 0.99], width=10.0)
    return out.select("event_type", "q", _r4("est").alias("est"))


def q_ann_recall(spark, sf_dir):
    """ANN recall harness (operators/similarity.py:ann_recall — the
    measure-don't-guess eval every approximate index is tuned with):
    IVF at a REAL partial probe (nprobe=2 of 8 seeded cells — recall < 1
    for some queries by construction) evaluated against the exact
    brute-force top-5. The oracle replicates the cell assignment, probe
    ranking, per-cell candidate ranking AND the exact ranking, then the
    hit join — so the recall arithmetic, the dropped-query handling, and
    the IVF pruning are all under the hash. Centroids are
    DATA-INDEPENDENT seeded literals (the pq_ann oracle pattern).

    r12: _spread — both index and brute sides are scan-stage CPU over a sub-split file (interleaved A/B min-of-4: 1.14 -> 0.95 s). dataset_card / semdedup / kmeans_lloyd measured LOSSES in the same batch and keep _t."""
    emb = _spread(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids_random(k=8, dim=64, seed=11)
    queries_df = emb.filter(F.col("vec_id") < 8) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    approx = similarity.ivf_topk(emb, queries_df, "vec_id", "embedding",
                                 cents, k=5, nprobe=2)
    exact = similarity.brute_force_topk(emb, queries_df, "vec_id",
                                        "embedding", k=5, method="brute")
    return similarity.ann_recall(approx, exact)


def q_bloom_novelty(spark, sf_dir):
    """Bloom-filter novelty gate (operators/sketches.py:bloom_build /
    bloom_novel — the incremental-ingestion dedup sketch): a 1024-bit
    md5-position bitmap is aggregated over the even-doc_id half of the
    corpus (one scan + a bit_or partial agg on <=32 word keys), then the
    odd half probes it through a broadcast left join. The halves are
    disjoint, so every maybe_seen=true row is a PURE false positive —
    a deterministic, engine-reproducible set (the md5 positions are the
    temperature_sample oracle convention); maybe_seen=false rows are
    GUARANTEED novel (no false negatives — the property the 100 TB
    ingestion gate relies on, pinned by pytest)."""
    d = _t(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") % 2 == 0)
    inc = d.filter(F.col("doc_id") % 2 == 1)
    bloom = sketches.bloom_build(hist, "doc_id", m_bits=1024, k=3)
    return sketches.bloom_novel(inc, "doc_id", bloom, m_bits=1024, k=3)


def q_kmeans_lloyd(spark, sf_dir):
    """Distributed full-corpus Lloyd k-means
    (operators/similarity.py:kmeans_lloyd — what the SemDeDup/IVF
    quantizers train with when a bounded sample is not enough): 2
    iterations from DATA-INDEPENDENT seeded centroids over the embeddings
    corpus; per iteration the assignment rides as expression literals and
    the update is a map-side-combinable (cell, pos) avg — the k×dim
    driver round-trip per iteration is the pagerank broadcast-iteration
    convention. Round-6 means between iterations pin the argmin decisions
    across partial-agg orders; the oracle unrolls both iterations as CTEs
    (the pagerank unrolled-loop convention). Output: the final centroid
    grid (ci, pos, val) + last-update cell sizes."""
    emb = _t(spark, sf_dir, "embeddings")
    init = similarity.ivf_centroids_random(k=4, dim=64, seed=19)
    final, sizes = similarity.kmeans_lloyd(emb, "embedding", init, iters=2)
    rows = [(ci, pos, float(v), int(sizes[ci]))
            for ci, c in enumerate(final) for pos, v in enumerate(c)]
    out = spark.createDataFrame(
        rows, "ci bigint, pos bigint, val double, n bigint")
    return out.select("ci", "pos", _r4("val").alias("val"), "n")


def q_ivf_ann(spark, sf_dir):
    """IVF ANN (k-means coarse quantizer + nprobe cell scan): the second
    scale path beside LSH. Probing ALL cells makes IVF exact *by
    construction* — every corpus vector lives in exactly one cell and the
    probe set covers them all — so the full quantize/assign/probe machinery
    gets a value-exact brute-force SQL oracle without the (non-SQL) Lloyd
    loop mattering to the result. Partial-probe recall (nprobe < cells) is
    covered by tests/test_dedup_similarity.py.

    r12: _spread — the literal-centroid argmin + probe scoring are scan-stage CPU over a sub-split file (interleaved A/B min-of-5: 0.87 -> 0.72 s)."""
    emb = _spread(spark, sf_dir, "embeddings")
    cents = similarity.train_ivf_centroids(emb, "embedding", k=8, iters=4,
                                           sample_rows=512)
    queries_df = emb.filter(F.col("vec_id") < 8) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivf_topk(emb, queries_df, "vec_id", "embedding", cents,
                              k=4, nprobe=len(cents))
    return out.select("query_id", "neighbor_id", _r4("cosine").alias("cosine"),
                      F.col("rank").cast("bigint").alias("rank"))


def q_lsh_ann(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN (the scale path): probes join only their
    sign-pattern bucket instead of the full corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.lsh_topk(emb, queries, "vec_id", "embedding", k=3,
                              num_planes=8, dim=64)
    return out.select("query_id", "neighbor_id", _r4("cosine").alias("cosine"),
                      F.col("rank").cast("bigint").alias("rank"))

def q_temperature_sample(spark, sf_dir):
    """α=0.5 temperature rebalance across languages: head langs down-sampled
    toward sqrt-proportional shares, membership by deterministic key hash."""
    d = _t(spark, sf_dir, "documents")
    out = sampling.temperature_sample(d, ["lang"], "doc_id", alpha=0.5)
    return out.select("doc_id", "lang")


def q_split_contamination(spark, sf_dir):
    """Eval decontamination sweep: stratified split over the planted-dup
    corpus, then count 8-gram overlaps of each val/test doc with the train
    split — copies straddling the split boundary surface here."""
    corpus = _dup_corpus(spark, sf_dir)
    split = sampling.stratified_split(corpus, "doc_id")
    out = text.ngram_contamination(split, "doc_id", "text", "split", n=8)
    return out.select("doc_id", "split",
                      F.col("n_shared").cast("bigint").alias("n_shared"))


def q_doc_lm_score(spark, sf_dir):
    """Per-doc mean unigram log-probability under the corpus's own empirical
    distribution — cheap perplexity-style quality gate (CCNet-shaped)."""
    d = _t(spark, sf_dir, "documents")
    out = text.unigram_lm_score(d, "doc_id", "text")
    return out.select("doc_id", _r4("lm_score").alias("lm_score"),
                      F.col("n_tokens").cast("bigint").alias("n_tokens"))


def q_text_repetition(spark, sf_dir):
    """Gopher-style within-doc repetition gates (dup-word / dup-bigram /
    top-bigram fractions) — row-local HOF expressions, zero shuffle.

    r12: _spread — the Gopher repetition-gate HOFs are scan-stage CPU over a sub-split file (interleaved A/B min-of-3: 0.75 -> 0.37 s)."""
    d = _spread(spark, sf_dir, "documents")
    out = text.repetition_metrics(d, "text")
    return out.select("doc_id",
                      _r4("dup_word_frac").alias("dup_word_frac"),
                      _r4("dup_bigram_frac").alias("dup_bigram_frac"),
                      _r4("top_bigram_frac").alias("top_bigram_frac"))


def q_pii_scrub(spark, sf_dir):
    """PII redaction curation stage: synthetic email/URL/phone injected per
    doc (both sides inject identically), then the shared regex chain redacts
    and audits counts.

    r12: _spread — the regex redaction chain is scan-stage CPU over a sub-split file (interleaved A/B min-of-3: 0.55 -> 0.30 s)."""
    d = _spread(spark, sf_dir, "documents")
    seeded = d.withColumn("text2", F.concat(
        F.col("text"), F.lit(" contact doc"), F.col("doc_id"),
        F.lit("@example.com via https://ex.com/d/"), F.col("doc_id"),
        F.lit(" or +1 555-000-"), F.col("doc_id")))
    out = text.scrub_pii(seeded, "text2")
    return out.select("doc_id",
                      F.col("n_emails").cast("bigint").alias("n_emails"),
                      F.col("n_urls").cast("bigint").alias("n_urls"),
                      F.col("n_phones").cast("bigint").alias("n_phones"),
                      "clean_text")


def q_lsh_ann_multi(spark, sf_dir):
    """OR-amplified multi-table hyperplane LSH ANN: 3 independent hash tables
    (seeds 42/1042/2042); candidates matching in ANY table are scored once —
    recall 1-(1-p^b)^L vs the single-table p^b of q_lsh_ann.

    r12: _spread — the 3-table hyperplane hashing is scan-stage CPU over a sub-split file (interleaved A/B min-of-4: 1.09 -> 0.93 s)."""
    emb = _spread(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.lsh_topk_multi(emb, queries, "vec_id", "embedding", k=3,
                                    num_planes=8, dim=64, num_tables=3)
    return out.select("query_id", "neighbor_id", _r4("cosine").alias("cosine"),
                      F.col("rank").cast("bigint").alias("rank"))


def q_exact_dedup(spark, sf_dir):
    """Exact dedup via hash-groupBy (bbtools dedupe analog, Snakefile:469-473
    — its 1 TB single-node hash table becomes one shuffle): documents
    grouped by their first-3-token prefix."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    keyed = d.withColumn("prefix", F.concat_ws(" ", F.slice(toks, 1, 3)))
    out = dedup.dup_groups(keyed, ["prefix"], "doc_id")
    return out.select("prefix", "canonical_id", "dup_count")


def q_curation_pipeline(spark, sf_dir):
    """Flagship training-data curation composition over the planted-dup
    corpus: language gate → quality gate (token count) → exact dedup
    (content hash, keep min doc_id) → deterministic train/val/test split →
    per (lang, split) counts. Every stage is the engine operator the
    individual queries exercise; this query proves they compose into one
    lazy plan (scan-stage filters → ONE dedup shuffle → split predicate →
    final agg)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    copies = d.filter(F.col("doc_id") < 100) \
        .select((F.col("doc_id") + 10000).alias("doc_id"), "text", "lang")
    corpus = d.unionByName(copies)
    gated = (text.token_count(corpus, "text")
             .filter(F.col("n_tokens") >= 10)
             .filter(F.col("lang").isin("en", "es", "fr", "de")))
    deduped = dedup.exact_dedup(gated, ["text"], "doc_id")
    split = sampling.stratified_split(deduped, "doc_id")
    return (split.groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("doc_id").alias("min_id")))


def _dup_corpus(spark, sf_dir, limit=100):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < limit) \
        .select("doc_id", "text")
    copy = d.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    return d.unionByName(copy)


def q_minhash_dedup(spark, sf_dir):
    """MinHash+LSH near-dup pipeline (shingle→minhash→band→bucket-join;
    sourmash-analog, Snakefile:2529) on a corpus with planted duplicates,
    verified by exact n-gram Jaccard >= 0.9."""
    corpus = _dup_corpus(spark, sf_dir)
    cands = dedup.minhash_lsh_candidates(corpus, "doc_id", "text",
                                         num_hashes=32, bands=16, shingle_n=4,
                                         dedup_pairs=False)  # semi-join consumer
    pairs = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", shingle_n=4,
                                      threshold=0.9, candidates=cands)
    return pairs.select("id_a", "id_b", _r4("jaccard").alias("jaccard"))


def q_dup_clusters(spark, sf_dir):
    """Near-dup cluster formation (transitive closure over verified pairs):
    LSH candidates → exact-Jaccard verify → connected components → one
    cluster id + size per clustered doc. The survivor-selection step of a
    corpus dedup pipeline."""
    corpus = _dup_corpus(spark, sf_dir)
    cands = dedup.minhash_lsh_candidates(corpus, "doc_id", "text",
                                         num_hashes=32, bands=16, shingle_n=4,
                                         dedup_pairs=False)
    pairs = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", shingle_n=4,
                                      threshold=0.9, candidates=cands)
    labels = dedup.dup_clusters(pairs.select("id_a", "id_b"))
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (labels.join(sizes, "label")
            .select(F.col("id").alias("doc_id"),
                    F.col("label").alias("cluster_id"),
                    F.col("cluster_size").cast("bigint").alias("cluster_size")))


def q_dup_clusters_star(spark, sf_dir):
    """Same cluster formation as q_dup_clusters but via alternating
    large-star/small-star contraction (O(log n) rounds on any diameter) —
    the web-scale CC; identical output contract, identical oracle."""
    corpus = _dup_corpus(spark, sf_dir)
    cands = dedup.minhash_lsh_candidates(corpus, "doc_id", "text",
                                         num_hashes=32, bands=16, shingle_n=4,
                                         dedup_pairs=False)
    pairs = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", shingle_n=4,
                                      threshold=0.9, candidates=cands)
    labels = dedup.dup_clusters_star(pairs.select("id_a", "id_b"))
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (labels.join(sizes, "label")
            .select(F.col("id").alias("doc_id"),
                    F.col("label").alias("cluster_id"),
                    F.col("cluster_size").cast("bigint").alias("cluster_size")))


def q_simhash_dedup(spark, sf_dir):
    """SimHash near-dup candidates (64-bit, 4×16-bit bands) verified by exact
    Jaccard >= 0.999 (identical docs) on the planted-duplicate corpus."""
    corpus = _dup_corpus(spark, sf_dir)
    cands = dedup.simhash_candidates(corpus, "doc_id", "text", bands=4,
                                     dedup_pairs=False)  # semi-join consumer
    pairs = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", shingle_n=4,
                                      threshold=0.999, candidates=cands)
    return pairs.select("id_a", "id_b", _r4("jaccard").alias("jaccard"))


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard similarity pairs (LSH verification stage) over a
    bounded doc subset."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60) \
        .select("doc_id", "text")
    pairs = dedup.ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=4,
                                      threshold=0.15)
    return pairs.select("id_a", "id_b", _r4("jaccard").alias("jaccard"))


def q_ngram_containment(spark, sf_dir):
    """Asymmetric n-gram containment (sourmash containment analog,
    Snakefile:2529): planted prefix-fragment docs are fully CONTAINED in
    their source (containment 1.0) even though Jaccard is small — the
    detector for doc-inside-doc inclusion."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40) \
        .select("doc_id", "text")
    frags = d.select((F.col("doc_id") + 5000).alias("doc_id"),
                     F.substring("text", 1, 60).alias("text"))
    corpus = d.unionByName(frags)
    pairs = dedup.ngram_containment_pairs(corpus, "doc_id", "text",
                                          shingle_n=4, threshold=0.9)
    return pairs.select("id_a", "id_b",
                        _r4("containment_a").alias("containment_a"),
                        _r4("containment_b").alias("containment_b"))


def q_line_dedup(spark, sf_dir):
    """Inter-document line-level dedup (C4/RefinedWeb boilerplate removal):
    a footer planted into every third document is detected as a cross-doc
    repeated line (>= 5 distinct docs) and stripped; every other line
    survives in original order. Docs reduced to nothing come back as ''."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    footer = "Subscribe to our newsletter\nCopyright 2026 Example Corp"
    planted = d.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat_ws("\n", F.col("text"), F.lit(footer)))
        .otherwise(F.col("text")))
    out = dedup.line_dedup(planted, "doc_id", "text", min_docs=5)
    return out.select("doc_id", "clean_text",
                      F.length("clean_text").cast("bigint")
                      .alias("n_clean_chars"))


def q_pmi_collocations(spark, sf_dir):
    """Top-50 bigram collocations by PMI over the corpus (Church & Hanks):
    consecutive-pair explode, vocab-grain partial aggs, broadcast unigram
    attachments — the multi-word-expression detector for corpus analysis."""
    d = _t(spark, sf_dir, "documents").select("text")
    return text.pmi_collocations(d, "text", min_count=5, top_k=50)


def q_span_dedup(spark, sf_dir):
    """Duplicated-span removal (ExactSubstr dedup, Lee et al. 2022, token
    grain): prefix fragments planted alongside their source docs share long
    token runs; every 6-token window seen in >= 2 distinct docs marks its
    positions for removal, overlapping windows merging into maximal spans.
    Unique tails survive; fully-duplicated fragments reduce to ''."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40) \
        .select("doc_id", "text")
    frags = d.select((F.col("doc_id") + 5000).alias("doc_id"),
                     F.substring("text", 1, 120).alias("text"))
    corpus = d.unionByName(frags)
    out = dedup.span_dedup(corpus, "doc_id", "text", w=6, min_docs=2)
    return out.select("doc_id", "clean_text", "n_removed_tokens")


def q_geo_neighbors(spark, sf_dir):
    """Spatial proximity self-join over georeferenced samples (every GLAMR
    sample carries lat/lon, postgres.Rmd:65): all sample pairs within 3 km,
    grid-cell binned so the join is an equi join — never a cross product.
    Coordinates synthesized deterministically onto a Great-Lakes-ish
    lattice from customer keys; both engines derive identical doubles."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    pts = c.select(
        F.col("c_custkey").alias("sample_id"),
        (F.lit(41.0)
         + ((F.col("c_custkey") * 2654435761) % 600000) / F.lit(100000.0))
        .alias("lat"),
        (F.lit(-87.0)
         + ((F.col("c_custkey") * 2246822519) % 700000) / F.lit(100000.0))
        .alias("lon"))
    out = joins.geo_neighbor_pairs(pts, "sample_id", radius_km=3.0,
                                   max_abs_lat=50.0)
    return out.select("id_a", "id_b", _r4("dist_km").alias("dist_km"))


def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline over the embeddings table
    (zip_with/aggregate dot products — JVM-side, no UDF).

    r12: _spread — the zip_with dot products are scan-stage CPU over a sub-split file (interleaved A/B min-of-5: 0.69 -> 0.62 s)."""
    emb = _spread(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.brute_force_topk(emb, queries, "vec_id", "embedding", k=3)
    return out.select("query_id", "neighbor_id", _r4("cosine").alias("cosine"),
                      F.col("rank").cast("bigint").alias("rank"))


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (marker-word argmax, ties→lexicographically
    larger code, no hits→'und')."""
    d = _spread(spark, sf_dir, "documents")
    return text.lang_id(d, "text").select("doc_id", "lang", "pred_lang")


def q_text_quality(spark, sf_dir):
    """Quality scoring: token/punct/stopword features + composite score.

    Rounded through _r4n (epsilon-nudged) on BOTH sides: the composite's
    small-denominator rationals land EXACTLY on .xxxx5 decimal boundaries
    (score 0.84024999... at sf0.1 doc 1828), where Spark's exact-decimal
    HALF_UP and DuckDB's multiply-based round disagree by one ulp of the
    x*10^4 product. The +1e-9 shifts every value decisively off the
    boundary identically in both engines (both compute the same IEEE
    double), so the rendered 4dp values agree at any sf."""
    d = _spread(spark, sf_dir, "documents")
    out = text.quality_features(d, "text")
    return out.select("doc_id",
                      F.col("n_tokens").cast("bigint").alias("n_tokens"),
                      _r4n("punct_ratio").alias("punct_ratio"),
                      _r4n("stopword_ratio").alias("stopword_ratio"),
                      _r4n("quality_score").alias("quality_score"))


def q_token_counts(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex pre-tokens."""
    d = _t(spark, sf_dir, "documents")
    out = text.bpe_ish_token_count(text.token_count(d, "text"), "text")
    return out.select("doc_id",
                      F.col("n_tokens").cast("bigint").alias("n_tokens"),
                      F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"))


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: rolling polynomial hash (mod 1e9+7) of the
    first 40 chars — exact integer arithmetic, engine-portable."""
    d = _t(spark, sf_dir, "documents")
    out = text.doc_fingerprint(d, "text", prefix_len=40)
    return out.select("doc_id", "fingerprint")


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary top-k: token frequency with a deterministic
    (count desc, token asc) cut — map-side partial agg + TakeOrdered."""
    d = _t(spark, sf_dir, "documents")
    return text.vocab_topk(d, "text", k=20)


def q_hash_sample(spark, sf_dir):
    """Deterministic 10% corpus sample by key hash (reference analog: seeded
    test-env subsampling, pypelib/utils.py:357-376) — row-local predicate,
    no shuffle, engine-portable via md5."""
    d = _t(spark, sf_dir, "documents")
    return sampling.hash_sample(d, "doc_id", 10, salt="s1") \
        .select("doc_id", "lang", "source")


def q_stratified_split(spark, sf_dir):
    """Train/val/test split (80/10/10) by key hash: stable under
    repartitioning and corpus growth — the contamination-safe split."""
    d = _t(spark, sf_dir, "documents")
    return sampling.stratified_split(d, "doc_id") \
        .select("doc_id", "lang", "split")


def q_cap_per_source(spark, sf_dir):
    """Per-source corpus cap: at most 40 docs per source, deterministic by
    key-hash order — the per-domain balancing step of a curation pipeline."""
    d = _t(spark, sf_dir, "documents")
    capped = sampling.cap_per_group(d, ["source"], "doc_id", 40)
    return (capped.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("doc_id").alias("id_sum")))


def q_hypertable_rollup(spark, sf_dir):
    """Hypertable-style multi-granularity time rollup: day ⊃ hour levels +
    grand total in ONE scan via GROUP BY ROLLUP (grouping sets expand after
    partial agg)."""
    ev = _events(spark, sf_dir).select("ts", "value")
    out = timeseries.hypertable_rollup(
        ev, "ts", [F.count(F.lit(1)).alias("n"),
                   _r4(F.sum("value")).alias("sum_value")],
        levels=["day", "hour"])
    return out.select(
        F.date_format("bucket_day", "yyyy-MM-dd HH:mm:ss").alias("bucket_day"),
        F.date_format("bucket_hour", "yyyy-MM-dd HH:mm:ss").alias("bucket_hour"),
        "n", "sum_value", "grain")


def q_seqkit_stats(spark, sf_dir):
    """A14 seqkit-stats aggregate (Snakefile:4606-4619): per-source doc
    length stats with exact quartiles."""
    d = _t(spark, sf_dir, "documents")
    out = bio.seqkit_stats(d, ["source"], "n_chars")
    return out.select("source", "num_seqs", "sum_len", "min_len",
                      _r4("q1").alias("q1"), _r4("q2").alias("q2"),
                      _r4("q3").alias("q3"), "max_len")


def q_dedup_keep_best(spark, sf_dir):
    """Cluster survivor selection (the stage after dup_clusters): LSH
    candidates → exact-Jaccard verify → connected components → keep the
    longest doc per cluster (tie → min doc_id); singletons survive. One
    kept-flag row per doc — the complete dedup pipeline's final output."""
    corpus = _dup_corpus(spark, sf_dir).withColumn(
        "score", F.length("text").cast("double"))
    cands = dedup.minhash_lsh_candidates(corpus, "doc_id", "text",
                                         num_hashes=32, bands=16, shingle_n=4,
                                         dedup_pairs=False)
    pairs = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", shingle_n=4,
                                      threshold=0.9, candidates=cands)
    labels = dedup.dup_clusters(pairs.select("id_a", "id_b"))
    out = dedup.keep_best_per_cluster(corpus, labels, "doc_id", "score")
    return out.select("doc_id", "cluster_id", "kept")


def q_quantile_gate(spark, sf_dir):
    """Adaptive per-group quality gate: drop each language's shortest
    quartile (exact per-lang p25 threshold, broadcast back onto the scan) —
    the data-driven filtering a multilingual corpus needs so one language's
    length distribution doesn't set every language's cutoff."""
    d = _t(spark, sf_dir, "documents")
    kept = sampling.quantile_gate(d, ["lang"], "n_chars", q=0.25)
    return (kept.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 _r4(F.first("threshold")).alias("threshold"),
                 F.min("n_chars").cast("bigint").alias("min_kept_chars")))


def q_normalize_text(spark, sf_dir):
    """Text canonicalization before hashing/dedup: strip planted markup,
    collapse whitespace runs, trim; emit the canonical md5 + length. Pure
    codegen'd regexp chain — the scan-stage normalize every exact-dedup
    pipeline runs first."""
    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(F.lit("  <p class='x'>"), F.col("text"),
                 F.lit("</p>\n\t<br/> tail   end ")).alias("text"))
    out = text.normalize_text(planted, "text")
    return out.select("doc_id", F.md5("norm_text").alias("norm_hash"),
                      F.length("norm_text").cast("bigint").alias("norm_len"))


def q_session_windows(spark, sf_dir):
    """Native session_window gap sessionization (per-SESSION grain —
    complements q_sessionize's per-user rollup): Spark's built-in merging
    session operator, the same construct that runs stateful in Structured
    Streaming (streaming/ingest.py), here in batch with a 30-min gap."""
    ev = _events(spark, sf_dir)
    out = session_window_counts(ev, gap="30 minutes")
    return out.select("user_id",
                      F.date_format("session_start",
                                    "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                      "n_events", _r4("sum_value").alias("sum_value"))


def q_kmer_spectrum(spark, sf_dir):
    """k-mer spectrum (bio n-gram vocabulary; sourmash sketch input,
    Snakefile:2529): 4-mer counts over acgt reads derived from documents,
    top-20 by (count desc, kmer asc). Bounded output: ≤ 4^k rows cross the
    shuffle regardless of corpus size."""
    d = _t(spark, sf_dir, "documents")
    reads = d.select(F.regexp_replace(F.lower("text"), "[^acgt]", "")
                     .alias("seq"))
    spec = bio.kmer_spectrum(reads, "seq", k=4)
    return spec.orderBy(F.desc("n"), F.asc("kmer")).limit(20)


def q_rolling_features(spark, sf_dir):
    """Trailing 1h RANGE-frame features per user (rate/burst features):
    count + mean of value over the last hour at every event — O(n) sliding
    frame, not an O(n·w) self-join. Second-granularity frame on BOTH engines
    (epoch_us // 1e6) so the boundary is identical."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 50)
    out = timeseries.rolling_features(ev, "user_id", "ts", "value",
                                      window_seconds=3600)
    return out.select("event_id", "user_id",
                      F.col("trailing_n").cast("bigint").alias("trailing_n"),
                      _r4("trailing_mean").alias("trailing_mean"))


def q_percent_rank_norm(spark, sf_dir):
    """Within-group CDF normalization (percent_rank) of doc length per
    language — makes scores comparable across groups before any global
    cutoff."""
    d = _t(spark, sf_dir, "documents")
    out = windows.percent_rank_norm(d, ["lang"], "n_chars")
    return out.select("doc_id", "lang", _r4("score_pct").alias("score_pct"))


def q_tfidf_topk(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (keyword extraction): explode → tf
    partial agg, vocabulary-sized df agg broadcast back, bounded per-doc rank
    window. Rank on round(tfidf, 6) so float ulp differences between engines
    cannot flip the cut."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    out = text.tfidf_topk(d, "doc_id", "text", top_terms=3, rank_round=6)
    return out.select("doc_id", "term", F.col("tf").cast("bigint").alias("tf"),
                      _r4("tfidf").alias("tfidf"),
                      F.col("term_rank").cast("bigint").alias("term_rank"))


# frozen domain blocklist — ONE canonical constant shared by the engine
# query and the generated oracle (the translate_dna convention); includes a
# nested pair (es.org ⊂ src0.es.org) so longest-match is exercised
_DOMAIN_BLOCKLIST = ["es.org", "src0.es.org", "ads.src2.zh.org",
                     "src1.en.org"]

# raw-URL construction shared (conceptually) by q_url_dedup and its oracle:
# variants that MUST collapse under normalization — scheme/host case, www.,
# default port, tracking params + param order, fragment
_URL_SPARK = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.' ELSE 'http://' END, "
    "source, '.Example.com', "
    "CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END, "
    "'/', lang, '/D', CAST(doc_id % 25 AS STRING), "
    "CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&b=2&a=1' "
    "     WHEN doc_id % 5 = 1 THEN '?a=1&b=2' ELSE '' END, "
    "CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)")


def q_url_dedup(spark, sf_dir):
    """Exact dedup at normalized-URL grain (operators/web.py:normalize_url /
    url_dedup — the first gate of a crawl-corpus pipeline): deterministic
    raw-URL variants derived from documents (case/www/port/tracking-param/
    fragment noise) collapse to canonical URLs; survivor = min doc_id.
    Normalization is ONE row-local codegen column; the only shuffle is the
    URL-grain partial agg."""
    d = _t(spark, sf_dir, "documents")
    raw = d.select("doc_id", F.expr(_URL_SPARK).alias("url"))
    out = web.url_dedup(raw, "doc_id", "url")
    return out.select("normalized_url",
                      F.col("n_urls").cast("bigint").alias("n_urls"),
                      F.col("canonical_id").cast("bigint")
                      .alias("canonical_id"))


_URL_DUCK = _URL_SPARK.replace("AS STRING", "AS VARCHAR")

# host construction shared VERBATIM by the Spark queries and the DuckDB
# oracles (concat/CASE parse identically on both engines)
_HOST_EXPR = ("concat(CASE WHEN doc_id % 4 = 0 THEN 'ads.' "
              "            WHEN doc_id % 4 = 1 THEN 'www.' ELSE '' END, "
              "source, '.', lang, '.org')")


def _url_norm_ctes(src: str = "raw") -> str:
    """DuckDB CTE chain computing normalized_url ``n`` per doc_id from
    ``{src}(doc_id, u)`` — the oracle mirror of web.normalize_url, shared
    by the url_dedup and web_curation oracles. Yields CTE ``norm``."""
    return f"""
        s1 AS (SELECT doc_id, split_part(u, '#', 1) AS u1 FROM {src}),
        s2 AS (SELECT doc_id, u1, split_part(u1, '?', 1) AS pre,
                      CASE WHEN len(u1) > len(split_part(u1, '?', 1))
                           THEN substr(u1, len(split_part(u1, '?', 1)) + 2)
                           ELSE '' END AS q
               FROM s1),
        s3 AS (SELECT doc_id, q, string_split(pre, '/') AS parts FROM s2),
        s4 AS (SELECT doc_id, q,
                      lower(parts[1] || '//' || parts[3]) AS sh0,
                      CASE WHEN len(parts) > 3
                           THEN '/' || array_to_string(parts[4:], '/')
                           ELSE '' END AS path0
               FROM s3),
        s5 AS (SELECT doc_id, q, path0,
                      regexp_replace(
                        CASE WHEN starts_with(sh0, 'http://')
                               THEN regexp_replace(sh0, ':80$', '')
                             WHEN starts_with(sh0, 'https://')
                               THEN regexp_replace(sh0, ':443$', '')
                             ELSE sh0 END,
                        '^(https?://)www\\.', '\\1') AS sh
               FROM s4),
        s6 AS (SELECT doc_id, sh,
                      regexp_replace(path0, '/$', '') AS path,
                      -- array_to_string([]) is NULL in DuckDB, not ''
                      coalesce(array_to_string(list_sort(list_filter(
                        string_split(q, '&'),
                        x -> x <> '' AND NOT starts_with(x, 'utm_')
                             AND NOT starts_with(x, 'gclid=')
                             AND NOT starts_with(x, 'fbclid=')
                             AND NOT starts_with(x, 'ref='))), '&'), '')
                        AS params
               FROM s5),
        norm AS (SELECT doc_id,
                        sh || path || CASE WHEN params = '' THEN ''
                                           ELSE '?' || params END AS n
                 FROM s6)"""


def _url_dedup_sql() -> str:
    """Oracle for q_url_dedup: the same raw-URL construction (engine
    expression string reused with one type-name swap) + the shared
    normalize_url CTE chain."""
    return f"""
        WITH raw AS (SELECT doc_id, {_URL_DUCK} AS u FROM documents),
        {_url_norm_ctes('raw')}
        SELECT n AS normalized_url, CAST(count(*) AS BIGINT) AS n_urls,
               CAST(min(doc_id) AS BIGINT) AS canonical_id
        FROM norm GROUP BY n
    """


def q_domain_blocklist(spark, sf_dir):
    """Suffix-semantics domain-blocklist verdict
    (operators/web.py:domain_blocklist_filter, literal scan-stage form —
    zero shuffle, zero join, plan-pinned by test): hosts derived
    deterministically from documents; matched_rule = the LONGEST (most
    specific) matching rule, exercised by the nested es.org ⊂ src0.es.org
    pair in the frozen blocklist."""
    d = _t(spark, sf_dir, "documents")
    hosts = d.select("doc_id", F.expr(_HOST_EXPR).alias("host"))
    out = web.domain_blocklist_filter(hosts, "host", _DOMAIN_BLOCKLIST)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "host", "matched_rule", "is_blocked")


def _host_matches_duck() -> str:
    """DuckDB expression: ordered (longest-first) blocklist matches of the
    ``host`` column's dot-suffixes — shared by the domain_blocklist and
    web_curation oracles; rules generated from _DOMAIN_BLOCKLIST."""
    rules = ", ".join(f"'{r}'" for r in sorted(set(_DOMAIN_BLOCKLIST)))
    return f"""list_filter(
                   list_transform(range(1, len(string_split(host, '.')) + 1),
                     i -> array_to_string(list_slice(string_split(host, '.'),
                            i, len(string_split(host, '.'))), '.')),
                   s -> list_contains([{rules}], s))"""


def _domain_blocklist_sql() -> str:
    """Oracle for q_domain_blocklist: suffix list via range+list_slice;
    matches preserve suffix order (longest first), so matched = first
    filtered element."""
    return f"""
        WITH hosts AS (
          SELECT doc_id, {_HOST_EXPR} AS host FROM documents),
        sufs AS (
          SELECT doc_id, host, {_host_matches_duck()} AS matches
          FROM hosts)
        SELECT CAST(doc_id AS BIGINT) AS doc_id, host,
               CASE WHEN len(matches) > 0 THEN matches[1] END
                 AS matched_rule,
               len(matches) > 0 AS is_blocked
        FROM sufs
    """


def q_rp_project(spark, sf_dir):
    """Johnson–Lindenstrauss random projection 64→8
    (operators/similarity.py:rp_project / rp_matrix_random — the
    embedding-compression step upstream of ANN/clustering at index-budget
    scale): seeded matrix literals regenerated by both engines; output
    quantized to 1e-4 ints (CSV) so float rendering can't split the hash.
    Entirely row-local — zero shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    m = similarity.rp_matrix_random(64, 8, seed=13)
    out = similarity.rp_project(emb, "embedding", m)
    return out.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.array_join(F.transform(
            "proj", lambda x: F.round(x * 10000).cast("bigint")
            .cast("string")), ",").alias("proj_q"))


def _rp_project_sql() -> str:
    """Oracle for q_rp_project: the same seeded matrix regenerated
    (rp_matrix_random(64, 8, 13)) as a literal, applied with
    list_dot_product per output component."""
    from glamr_omics_pipelines_spark.operators.similarity import \
        rp_matrix_random
    m = rp_matrix_random(64, 8, seed=13)
    rows = ", ".join(
        "[" + ", ".join(repr(x) for x in r) + "]" for r in m)
    return f"""
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               array_to_string(list_transform([{rows}],
                 r -> CAST(CAST(round(list_dot_product(
                        embedding::DOUBLE[], r) * 10000) AS BIGINT)
                      AS VARCHAR)), ',') AS proj_q
        FROM embeddings
    """


def _framed_text():
    """Synthetic web-artifact framing (Spark side of _FRAMED_DUCK): SHOUTY
    header / terminal-punct stub / digit counter / rights footer around the
    document body — shared by q_line_quality and q_web_curation."""
    return F.concat(F.upper(F.substring("text", 1, 40)), F.lit("\n"),
                    F.col("text"), F.lit("\nok.\n"),
                    F.col("doc_id").cast("string"), F.lit(" 123 456"),
                    F.lit("\nAll Rights Reserved"))


def q_line_quality(spark, sf_dir):
    """Per-line intrinsic quality filtering
    (operators/text.py:line_quality_filter — the RefinedWeb/CCNet line-wise
    rules, line_dedup's no-cross-doc-evidence complement): documents are
    framed with synthetic web artifacts (a SHOUTY nav header, a digit
    counter, a rights-reserved footer) that the row-local HOF filter must
    strip while keeping the body — zero shuffle, scan-stage.

    r12: _spread — the line-rule HOF chain is scan-stage CPU over a
    sub-split file (interleaved A/B min-of-6: 0.68 -> 0.54 s)."""
    d = _spread(spark, sf_dir, "documents")
    framed = d.select("doc_id", _framed_text().alias("text"))
    out = text.line_quality_filter(framed, "text")
    return out.select("doc_id", "clean_text", "n_lines", "n_removed_lines")


def q_web_curation(spark, sf_dir):
    """Web-curation composition in ONE lazy plan (the crawl-side twin of
    incremental_curation): domain blocklist (X168, literal scan-stage) →
    URL normalization + canonical-per-URL (X167) → line-quality stats on
    survivors (X169). Verdict per doc: 'blocked' (host matched),
    'dup' (non-canonical variant of a surviving URL), 'kept' (canonical).
    Canonical = min doc_id among NON-blocked group members (a blocked doc
    is never a survivor), so the blocklist provably runs BEFORE dedup;
    line stats are reported only for kept docs (cheap gates first — the
    curation order a 100 TB pipeline runs). ONE data-grain exchange total
    (the normalized-URL window); everything else is row-local."""
    d = _t(spark, sf_dir, "documents")
    base = d.select("doc_id",
                    F.expr(_URL_SPARK).alias("url"),
                    F.expr(_HOST_EXPR).alias("host"),
                    _framed_text().alias("text"))
    flt = web.domain_blocklist_filter(base, "host", _DOMAIN_BLOCKLIST)
    lq = text.line_quality_filter(flt, "text")
    norm = lq.withColumn("normalized_url", web.normalize_url("url"))
    w = Window.partitionBy("normalized_url")
    canon = F.min(F.when(~F.col("is_blocked"),
                         F.col("doc_id"))).over(w)
    out = norm.withColumn("_canon", canon).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.when(F.col("is_blocked"), F.lit("blocked"))
        .when(F.col("doc_id") != F.col("_canon"), F.lit("dup"))
        .otherwise(F.lit("kept")).alias("verdict"),
        "matched_rule",
        F.when(~F.col("is_blocked"), F.col("_canon"))
        .cast("bigint").alias("canonical_id"),
        F.when((~F.col("is_blocked"))
               & (F.col("doc_id") == F.col("_canon")),
               F.col("n_removed_lines"))
        .cast("bigint").alias("n_removed_lines"))
    return out


def _web_curation_sql() -> str:
    """Oracle for q_web_curation: the shared URL-normalization CTE chain +
    the shared host-match and line-keep fragments, composed with the same
    blocked-never-canonical window rule."""
    return f"""
        WITH raw AS (SELECT doc_id, {_URL_DUCK} AS u FROM documents),
        {_url_norm_ctes('raw')},
        hosts AS (SELECT doc_id, {_HOST_EXPR} AS host FROM documents),
        blk AS (
          SELECT doc_id, m.matches FROM (
            SELECT doc_id, {_host_matches_duck()} AS matches
            FROM hosts) m),
        fr AS (SELECT doc_id,
                      string_split({_FRAMED_DUCK}, chr(10)) AS lines
               FROM documents),
        lq AS (SELECT doc_id,
                      len(lines) - len({_LINE_KEEP_DUCK}) AS n_removed
               FROM fr),
        j AS (SELECT b.doc_id, len(b.matches) > 0 AS is_blocked,
                     CASE WHEN len(b.matches) > 0 THEN b.matches[1] END
                       AS matched_rule,
                     norm.n, lq.n_removed
              FROM blk b JOIN norm USING (doc_id) JOIN lq USING (doc_id)),
        g AS (SELECT *, min(CASE WHEN NOT is_blocked THEN doc_id END)
                          OVER (PARTITION BY n) AS canon
              FROM j)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CASE WHEN is_blocked THEN 'blocked'
                    WHEN doc_id <> canon THEN 'dup'
                    ELSE 'kept' END AS verdict,
               matched_rule,
               CAST(CASE WHEN NOT is_blocked THEN canon END AS BIGINT)
                 AS canonical_id,
               CAST(CASE WHEN NOT is_blocked AND doc_id = canon
                         THEN n_removed END AS BIGINT) AS n_removed_lines
        FROM g
    """


# the line_quality_filter keep-predicate as a DuckDB list_filter lambda —
# shared by the line_quality oracle and the web_curation composition oracle
_LINE_KEEP_DUCK = """list_filter(lines, x -> NOT (
               (len(regexp_replace(x, '[^A-Za-z]', '', 'g')) > 0 AND
                len(regexp_replace(x, '[^A-Z]', '', 'g')) >
                  len(regexp_replace(x, '[^A-Za-z]', '', 'g')) * 0.6)
               OR
               (len(regexp_replace(x, '\\s', '', 'g')) > 0 AND
                len(regexp_replace(x, '[^0-9]', '', 'g')) >
                  len(regexp_replace(x, '\\s', '', 'g')) * 0.5)
               OR
               (len(list_filter(string_split_regex(x, '\\s+'),
                                t -> t <> '')) < 3 AND
                NOT regexp_matches(trim(x), '[.!?:]$'))
               OR contains(lower(x), 'cookie')
               OR contains(lower(x), 'javascript')
               OR contains(lower(x), 'click here')
               OR contains(lower(x), 'all rights reserved')))"""

# the synthetic web-artifact framing shared by q_line_quality and
# q_web_curation (SHOUTY header / terminal-punct stub / digit counter /
# rights footer)
_FRAMED_DUCK = """upper(substr(text, 1, 40)) || chr(10) || text || chr(10)
             || 'ok.' || chr(10) || CAST(doc_id AS VARCHAR) || ' 123 456'
             || chr(10) || 'All Rights Reserved'"""

_LINE_QUALITY_SQL = f"""
    WITH framed AS (
      SELECT doc_id, {_FRAMED_DUCK} AS text
      FROM documents),
    split AS (
      SELECT doc_id, string_split(text, chr(10)) AS lines FROM framed),
    kept AS (
      SELECT doc_id, lines,
             {_LINE_KEEP_DUCK} AS keep
      FROM split)
    SELECT doc_id,
           coalesce(array_to_string(keep, chr(10)), '') AS clean_text,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(lines) - len(keep) AS BIGINT) AS n_removed_lines
    FROM kept
"""


# frozen BM25 query set — ONE canonical constant; the oracle's VALUES
# clause is GENERATED from it (the translate_dna single-constant convention)
_BM25_QUERIES = [("q1", "spark table scan"), ("q2", "dup filter"),
                 ("q3", "fast vector query")]


def q_bm25_search(spark, sf_dir):
    """BM25 top-5 retrieval for a frozen 3-query set
    (operators/text.py:bm25_topk — the decontamination-lookup /
    targeted-audit retrieval step over the curation corpus): query-term
    isin filter BEFORE the only data-grain shuffle, one-row N/avgdl
    broadcast attach, ranking on round(score, 6) with doc-id tiebreak."""
    d = _t(spark, sf_dir, "documents")
    out = text.bm25_topk(d, "doc_id", "text", _BM25_QUERIES,
                         k1=1.2, b=0.75, top_k=5)
    return out.select("query_id", "doc_id", _r4("bm25").alias("bm25"),
                      F.col("rank").cast("bigint").alias("rank"))


def _bm25_search_sql(k1: float = 1.2, b: float = 0.75,
                     top_k: int = 5) -> str:
    """Oracle for q_bm25_search: same tokenize → restricted-tf → df →
    Lucene idf → BM25 sum → round-6-ranked top-k pipeline in DuckDB, the
    query VALUES generated from _BM25_QUERIES."""
    qrows = sorted({(qid, t) for qid, qtext in _BM25_QUERIES
                    for t in qtext.lower().split()})
    values = ", ".join(f"('{qid}', '{t}')" for qid, t in qrows)
    terms = ", ".join(f"'{t}'" for t in sorted({t for _, t in qrows}))
    return f"""
        WITH q(query_id, term) AS (VALUES {values}),
        base AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text),
                 '\\s+'), x -> x <> '') AS toks
          FROM documents),
        stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM base),
        tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                FROM base),
        tf AS (SELECT doc_id, term, max(dl) AS dl, count(*) AS tf
               FROM tok WHERE term IN ({terms}) GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
        scored AS (
          SELECT q.query_id, tf.doc_id,
                 ln(1.0 + (s.n - d.dft + 0.5) / (d.dft + 0.5))
                 * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) AS w
          FROM tf JOIN dfreq d USING (term) JOIN q USING (term)
          CROSS JOIN stats s),
        agg AS (SELECT query_id, doc_id, sum(w) AS bm25
                FROM scored GROUP BY query_id, doc_id),
        r AS (SELECT query_id, doc_id, bm25, row_number() OVER (
                PARTITION BY query_id
                ORDER BY round(bm25, 6) DESC, doc_id ASC) AS rank
              FROM agg)
        SELECT query_id, doc_id, round(bm25, 4) AS bm25,
               CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= {top_k}
    """


def q_winsorize(spark, sf_dir):
    """Per-group winsorization (robust-stats companion of coverM's
    trimmed_mean, Snakefile:1663-1669): clip doc length into the per-lang
    exact [p5, p95] band, then summarize the clipped distribution."""
    d = _t(spark, sf_dir, "documents")
    out = abundance.winsorize(d, ["lang"], "n_chars", lo=0.05, hi=0.95)
    return (out.groupBy("lang")
            .agg(_r4(F.avg("winsorized")).alias("clipped_mean"),
                 _r4(F.min("winsorized")).alias("clipped_min"),
                 _r4(F.max("winsorized")).alias("clipped_max")))


def q_funnel(spark, sf_dir):
    """Ordered conversion funnel (view → click → purchase, first-touch,
    strictly increasing timestamps) per user — stacked conditional-min
    windows sharing ONE user-key exchange, no per-stage self-join."""
    ev = _events(spark, sf_dir)
    out = timeseries.funnel_stages(ev, "user_id", "ts", "event_type",
                                   ["view", "click", "purchase"])
    fmt = "yyyy-MM-dd HH:mm:ss"
    return out.select(
        "user_id", F.col("funnel_stage").cast("bigint").alias("funnel_stage"),
        F.date_format("stage1_ts", fmt).alias("stage1_ts"),
        F.date_format("stage2_ts", fmt).alias("stage2_ts"),
        F.date_format("stage3_ts", fmt).alias("stage3_ts"))


def q_snapshot_diff(spark, sf_dir):
    """Snapshot delta audit (check_import_status.R / update_output_status.R
    generalized to content): classify every doc across two corpus versions
    as added/removed/changed/unchanged via pre-join md5 hashes — the join
    carries keys + hashes, never bodies."""
    base = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300) \
        .select("doc_id", "text")
    survived = (base.filter(F.col("doc_id") % 10 != 0)
                .withColumn("text",
                            F.when(F.col("doc_id") % 7 == 3,
                                   F.concat(F.col("text"), F.lit(" v2")))
                            .otherwise(F.col("text"))))
    added = base.filter(F.col("doc_id") < 30) \
        .select((F.col("doc_id") + 9000).alias("doc_id"), "text")
    new = survived.unionByName(added)
    out = warehouse_snapshot_diff(base, new, ["doc_id"], ["text"])
    return out.select("doc_id", "status")


def q_corr_stats(spark, sf_dir):
    """§2.9 statistical aggregates (merge-able co-moment form): Pearson
    corr, sample covariance and stddev of quantity vs price per return
    flag — one partial-aggregated scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(_r4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qp"),
                 _r4(F.covar_samp("l_quantity", "l_extendedprice"))
                 .alias("covar_qp"),
                 _r4(F.stddev_samp("l_quantity")).alias("stddev_qty")))


def q_pack_sequences(spark, sf_dir):
    """Deterministic doc packing into ~4000-token training bins across 8
    hash shards (prefix-sum window per shard; batch-construction step of an
    LLM pipeline), summarized at bin grain."""
    d = _t(spark, sf_dir, "documents")
    packed = sampling.pack_sequences(d, "doc_id", "n_chars",
                                     budget=4000, shards=8)
    return (packed.groupBy("shard", "bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_tokens")))


def q_mad_outliers(spark, sf_dir):
    """Robust per-group outlier detection (median/MAD, both exact): per-lang
    doc-length outliers at k=3 — the QC rule that survives the outliers it
    is hunting, unlike mean/stddev."""
    d = _t(spark, sf_dir, "documents")
    out = abundance.mad_outliers(d, ["lang"], "n_chars", k=3.0)
    return (out.groupBy("lang")
            .agg(_r4(F.first("med")).alias("med"),
                 _r4(F.first("mad")).alias("mad"),
                 F.sum(F.col("is_outlier").cast("int")).cast("bigint")
                 .alias("n_outliers"),
                 F.count(F.lit(1)).alias("n")))


def q_curation_pipeline_v2(spark, sf_dir):
    """Round-4 flagship composition — the full LLM training-data prep path
    in ONE lazy plan: canonicalize (markup/whitespace) → per-language
    adaptive quality gate (p10 of normalized length) → exact dedup on the
    CANONICAL text (formatting-immune) → deterministic split → pack the
    train split into ~4000-token bins across 4 hash shards. Scan-stage
    normalize + gates, one dedup shuffle, row-local split, one prefix-sum
    window — five operators, three shuffles total."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    copies = d.filter(F.col("doc_id") < 100) \
        .select((F.col("doc_id") + 10000).alias("doc_id"), "text", "lang")
    corpus = d.unionByName(copies)
    norm = text.normalize_text(corpus, "text") \
        .withColumn("norm_len", F.length("norm_text"))
    gated = sampling.quantile_gate(norm, ["lang"], "norm_len", q=0.1)
    deduped = dedup.exact_dedup(gated, ["norm_text"], "doc_id")
    split = sampling.stratified_split(deduped, "doc_id")
    train = split.filter(F.col("split") == "train")
    packed = sampling.pack_sequences(train, "doc_id", "norm_len",
                                     budget=4000, shards=4)
    return (packed.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("bin").alias("n_bins"),
                 F.sum("norm_len").alias("sum_tokens")))


def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroids in long form (class prototypes /
    cluster-quality audit): posexplode + partial-agg mean — the shuffle
    carries labels × dims partial sums, independent of corpus size."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.label_centroids(emb, "label", "embedding")
    # + 0.0 normalizes IEEE -0.0: a centroid component whose mean rounds
    # to zero from below renders '-0.0' (r10 sf0.1 robustness pass);
    # the oracle applies the same + 0.0
    return out.select(F.col("label").cast("bigint").alias("label"),
                      F.col("dim").cast("bigint").alias("dim"),
                      (_r4("mean_val") + F.lit(0.0)).alias("mean_val"), "n")


def q_profile_table(spark, sf_dir):
    """Column-profile audit (check_import_status.R analog): null counts,
    exact distincts, typed min/max per column — ONE scan, O(columns)
    output."""
    d = _t(spark, sf_dir, "documents")
    return warehouse_profile_table(
        d, ["doc_id", "text", "lang", "source", "n_chars"])


def _taxon_counts(spark, sf_dir):
    """sample × taxon abundance frame for the diversity family (lineitem
    re-read as an abundance table: returnflag≈sample, partkey≈taxon)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.select(F.col("l_returnflag").alias("sample"),
                      F.col("l_partkey").alias("taxon"),
                      F.col("l_quantity").alias("n"))
            .groupBy("sample", "taxon")
            .agg(F.sum("n").cast("double").alias("cnt")))


def q_shannon_diversity(spark, sf_dir):
    """Shannon H' + richness + Pielou evenness per sample (the diversity
    index ecologists run on exactly the reference's sample × taxon tables,
    plot_metacoder*.R territory): taxon-grain partial agg + one-row-per-
    sample totals broadcast."""
    counts = _taxon_counts(spark, sf_dir)
    out = diversity.shannon_diversity(counts, "sample", "cnt")
    return out.select("sample", _r4("shannon").alias("shannon"),
                      F.col("richness").cast("bigint").alias("richness"),
                      _r4("evenness").alias("evenness"))


def q_bray_curtis(spark, sf_dir):
    """Pairwise Bray-Curtis dissimilarity between samples — inner taxon
    join for the min-sums (absent taxa contribute 0), totals broadcast;
    pair fan-out at sample grain, never taxon × taxon."""
    counts = _taxon_counts(spark, sf_dir)
    out = diversity.bray_curtis_pairs(counts, "sample", "taxon", "cnt")
    return out.select("sample_a", "sample_b",
                      _r4("bray_curtis").alias("bray_curtis"))


def q_rarefaction(spark, sf_dir):
    """Rarefaction curve per sample at 10/50/100% deterministic hash-
    subsample depths — ONE scan, conditional count-distincts, engine-
    portable subsample (same md5 bucket as hash_sample)."""
    li = _t(spark, sf_dir, "lineitem")
    d = li.select(F.col("l_returnflag").alias("sample"),
                  F.col("l_partkey").alias("taxon"),
                  (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
                  .alias("read_id"))
    out = diversity.rarefaction_counts(d, "sample", "taxon", "read_id",
                                       [10, 50, 100])
    return out.select("sample",
                      F.col("depth_pct").cast("bigint").alias("depth_pct"),
                      F.col("richness").cast("bigint").alias("richness"))


def q_chao1(spark, sf_dir):
    """Chao1 estimated total richness per sample (bias-corrected singleton/
    doubleton estimator — the 'how many taxa did we miss' companion of the
    rarefaction curve) over row-count abundances."""
    li = _t(spark, sf_dir, "lineitem")
    counts = (li.groupBy(F.col("l_returnflag").alias("sample"),
                         F.col("l_partkey").alias("taxon"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    out = diversity.chao1_richness(counts, "sample", "cnt")
    return out.select("sample", "s_obs", "f1", "f2",
                      _r4("chao1").alias("chao1"))


def q_nx_ladder(spark, sf_dir):
    """Assembly Nx/Lx contiguity ladder (seqkit stats -a / QUAST N50 per
    assembly, Snakefile:4606-4619): per-source N50/L50/N90/L90 over doc
    lengths as stand-in contig lengths. Integer threshold arithmetic
    (cum*100 >= tot*pct) — no float boundary."""
    d = _t(spark, sf_dir, "documents")
    out = bio.nx_stats(d, ["source"], "n_chars", "doc_id",
                       fractions=(0.5, 0.9))
    return out.select(
        "source", "num_seqs", "total_len", "max_len", "n50",
        F.col("l50").cast("bigint").alias("l50"), "n90",
        F.col("l90").cast("bigint").alias("l90"))


def q_resample_fill(spark, sf_dir):
    """Time-series regularization: daily buckets per user with explicit
    zero-filled gap rows between each user's first and last active day —
    the dense-axis resample a rate model needs over sparse event data."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 40)
    out = timeseries.resample_fill(ev, "user_id", "ts", "value",
                                   step_seconds=86400)
    return out.select("user_id", "bucket_start",
                      F.col("n_events").cast("bigint").alias("n_events"),
                      _r4("total").alias("total"), "is_gap")


def q_interpolate(spark, sf_dir):
    """Linear interpolation of deterministically-masked missing values per
    user over second-grain samples (pandas interpolate(limit_direction=
    'both') semantics): two IGNORE-NULLS frames on one exchange."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 30)
    sec = F.floor(windows.epoch_us("ts") / F.lit(1_000_000)).cast("long")
    present = ~F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) \
        .isin("0", "1", "2", "3")
    d = (ev.groupBy("user_id", sec.alias("x"))
         .agg(F.max(F.when(present, F.col("value"))).alias("v")))
    out = timeseries.interpolate_linear(d, "user_id", "x", "v", "v_interp")
    return out.select("user_id", "x",
                      F.col("v").isNull().alias("was_missing"),
                      _r4("v_interp").alias("v_interp"))


def q_changepoint(spark, sf_dir):
    """CUSUM level-shift detection per user: argmax |cum_i − i·mean| over
    the time-ordered value series — Page's cumulative-sum statistic, one
    exchange per key, engine-reproducible via rounded-|S| tiebreak."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 60)
    sec = F.floor(windows.epoch_us("ts") / F.lit(1_000_000)).cast("long")
    d = ev.select("user_id", "event_id", sec.alias("sec"), "value")
    out = stats.cusum_changepoint(d, "user_id", "sec", "value", "event_id")
    return out.select(
        "user_id", F.col("changepoint_at").alias("changepoint_sec"),
        F.col("changepoint_idx").cast("bigint").alias("changepoint_idx"),
        "max_cusum", F.col("n_points").cast("bigint").alias("n_points"))


def q_triangle_count(spark, sf_dir):
    """Exact per-node triangle counts over the part co-order network
    (parts co-ordered in >= 2 shared orders): degree-ordered orientation,
    each triangle generated exactly once — network cohesion on the same
    co-occurrence core as pagerank/basket_rules."""
    li = _t(spark, sf_dir, "lineitem")
    sp = li.select(F.col("l_orderkey").alias("g"),
                   F.col("l_partkey").alias("i"))
    edges = graph.cooccurrence_edges(sp, "g", "i").filter(
        F.col("weight") >= 2)
    out = graph.triangle_count(edges, "src", "dst")
    return out.select(F.col("node").cast("bigint").alias("node"),
                      F.col("triangles").cast("bigint").alias("triangles"))


def q_mash_distance(spark, sf_dir):
    """Mash distance (Ondov 2016) between sources from bottom-64 KMV
    sketches of 4-shingles — the sourmash-style alignment-free distance
    (Snakefile:2529's sketch comparisons), engine-portable via md5."""
    d = _spread(spark, sf_dir, "documents")
    sh = (d.select("source", F.explode(F.expr(
        "transform(sequence(1, greatest(length(text) - 3, 1)), "
        "i -> substring(text, i, 4))")).alias("s"))
        .filter(F.length("s") > 0))
    sk = sketches.bottomk_sketch(sh, "source", "s", k=64)
    return sketches.mash_distance(sk, k=64, kmer_k=4)


def q_dbscan(spark, sf_dir):
    """DBSCAN density clustering over embeddings with planted triplet
    duplicates: each vec_id<50 appears 3× (cos=1 cliques → cores, clusters
    of 3), vec_id in [50,100) are noise. Exact-pair baseline; the LSH
    candidates= hook is the corpus-scale path."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = e.filter(F.col("vec_id") < 100)
    c1 = (e.filter(F.col("vec_id") < 50)
          .select((F.col("vec_id") + 10000).alias("vec_id"), "embedding"))
    c2 = (e.filter(F.col("vec_id") < 50)
          .select((F.col("vec_id") + 20000).alias("vec_id"), "embedding"))
    corpus = base.unionByName(c1).unionByName(c2)
    out = similarity.dbscan_cosine(corpus, "vec_id", "embedding",
                                   sim_eps=0.999, min_pts=2)
    return out.select(F.col("id").cast("bigint").alias("id"),
                      F.col("cluster_id").cast("bigint").alias("cluster_id"),
                      "role")


def q_trend_fit(spark, sf_dir):
    """Per-user OLS trend (slope/intercept/r²) of value over days since
    2024-01-01 — co-moment partial aggs, one scan, a million keys in one
    shuffle. x pre-centered to day offsets so the co-moment form stays
    well-conditioned (operator docstring contract)."""
    ev = _events(spark, sf_dir)
    base = 1704067200  # 2024-01-01 UTC
    x = F.floor((windows.epoch_us("ts") / F.lit(1_000_000.0) - base)
                / F.lit(86400.0))
    d = ev.select("user_id", x.alias("x"), "value")
    out = stats.trend_fit(d, ["user_id"], "x", "value")
    return out.select("user_id", "n",
                      F.round("slope", 6).alias("slope"),
                      _r4("intercept").alias("intercept"),
                      F.round("r2", 6).alias("r2"))


def q_chi_square(spark, sf_dir):
    """Per-source R×C chi-square of independence between lang and a doc
    bucket: observed-cell sums + closed-form unobserved mass — never a
    dense grid (general-contingency companion of enrichment_2x2)."""
    d = _t(spark, sf_dir, "documents").select(
        "source", "lang", (F.col("doc_id") % 3).alias("bucket"))
    out = stats.chi_square_test(d, "source", "lang", "bucket")
    return out.select("source", "n_obs", _r4("chi2").alias("chi2"), "dof",
                      _r4("cramers_v").alias("cramers_v"))


def q_inverted_index(spark, sf_dir):
    """Term → posting-list inverted index over the corpus (df >= 10 terms),
    posting lists capped at 20 doc ids with exact df_count — the honest-cap
    retrieval index built from the tokenize-once scan."""
    d = _t(spark, sf_dir, "documents")
    out = text.inverted_index(d, "doc_id", "text", max_postings=20)
    return (out.filter(F.col("df_count") >= 10)
            .select("term", "df_count",
                    F.array_join(F.transform(
                        "postings", lambda x: x.cast("string")), ",")
                    .alias("postings_csv")))


def q_key_skew(spark, sf_dir):
    """Join-key skew diagnostic over candidate lineitem keys: top-5 heaviest
    values per column with share and skew ratio — the pre-flight check that
    decides salting (X19) / AQE skew handling before the shuffle runs."""
    li = _t(spark, sf_dir, "lineitem")
    return validate.key_skew_profile(
        li, ["l_returnflag", "l_suppkey", "l_partkey"], top_n=5)


def q_welch_t(spark, sf_dir):
    """Per-feature Welch's t-test (O vs F line status over extended price,
    supplier-grain features) + log2 fold change — the parametric twin of
    rank_sum_test: one conditional-sum partial agg per feature."""
    li = _t(spark, sf_dir, "lineitem")
    d = li.select(F.col("l_suppkey").alias("f"),
                  F.col("l_linestatus").alias("g"),
                  F.col("l_extendedprice").alias("x"))
    out = stats.welch_t_test(d, "f", "g", "x", "O", "F")
    return out.select(F.col("f").alias("l_suppkey"), "n_a", "n_b",
                      _r4("t_stat").alias("t_stat"),
                      _r4("welch_dof").alias("welch_dof"),
                      F.round("log2_fc", 6).alias("log2_fc"))


def q_translate_dna(spark, sf_dir):
    """Frame-0 DNA → protein translation (standard genetic code) over the
    acgt reads derived from documents — codon map lookup entirely in
    whole-stage codegen, zero shuffle (the relational core of prodigal's
    product strings).

    r12: _spread — the codon-map translation is scan-stage CPU over a sub-split file (interleaved A/B min-of-3: 0.43 -> 0.33 s)."""
    d = _spread(spark, sf_dir, "documents")
    reads = (d.select("doc_id",
                      F.upper(F.regexp_replace(F.lower("text"), "[^acgt]", ""))
                      .alias("seq"))
             .filter(F.length("seq") >= 3))
    out = bio.translate_dna(reads, "seq", frame=0, out="protein")
    return out.select("doc_id", F.length("seq").cast("bigint")
                      .alias("seq_len"), "protein")


def q_seasonal_anomaly(spark, sf_dir):
    """Hour-of-week seasonal z-scores per event type: baseline = partial agg
    over ≤ |types|·168 cells broadcast back onto the scan; z row-local.
    The 'unusual for a Tuesday 3pm' detector."""
    ev = _events(spark, sf_dir)
    out = timeseries.seasonal_anomaly(ev, "event_type", "ts", "value",
                                      z_threshold=3.0)
    return out.select("event_id", "event_type",
                      F.col("hour_of_week").cast("bigint")
                      .alias("hour_of_week"),
                      _r4("z_score").alias("z_score"), "is_anomaly")


def q_sensor_pipeline(spark, sf_dir):
    """Composition: sensor-series repair in ONE lazy plan — daily resample
    with explicit gap rows (X95) → linear interpolation of the gap-day
    totals (X96). The dense, repaired series a downstream window model
    consumes. Gap rows carry null into the interpolator (not the 0 fill),
    so repaired values are the straight line between active days."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 25)
    daily = timeseries.resample_fill(ev, "user_id", "ts", "value",
                                     step_seconds=86400)
    holey = daily.withColumn(
        "day_total", F.when(~F.col("is_gap"), F.col("total")))
    out = timeseries.interpolate_linear(holey, "user_id", "bucket_start",
                                        "day_total", "repaired_total")
    return out.select("user_id", "bucket_start", "is_gap",
                      _r4("repaired_total").alias("repaired_total"))


def q_rolling_corr(spark, sf_dir):
    """Trailing-1h Pearson correlation of value vs time per user (local
    trend detector): six co-moments over ONE RANGE frame — one exchange,
    one sliding pass, never a self-join. Time pre-centered to keep the
    co-moment cancellation benign."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 50)
    base = 1704067200
    sec = F.floor(windows.epoch_us("ts") / F.lit(1_000_000)).cast("long")
    d = ev.select("event_id", "user_id", "ts", "value",
                  (sec - base).cast("double").alias("xc"))
    out = timeseries.rolling_corr(d, "user_id", "ts", "xc", "value",
                                  window_seconds=3600, out="corr_1h")
    return out.select("event_id", "user_id",
                      _r4("corr_1h").alias("corr_1h"))


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix: first-activity week per user (min
    bucket partial agg) × activity-week offsets → distinct users; exact
    integer bucket arithmetic, user-period pairs on the shuffle."""
    ev = _events(spark, sf_dir)
    out = timeseries.cohort_retention(ev, "user_id", "ts",
                                      period_seconds=604800)
    return out.select("cohort_start", "period_offset",
                      F.col("n_users").cast("bigint").alias("n_users"))


def q_cooccur_cosine(spark, sf_dir):
    """Ochiai/cosine-normalized co-order similarity between parts: shared
    baskets / sqrt(deg·deg) — popularity-corrected bipartite projection on
    the guarded co-occurrence core, degrees broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    sp = li.select(F.col("l_orderkey").alias("g"),
                   F.col("l_partkey").alias("i"))
    out = graph.cooccurrence_cosine(sp, "g", "i", min_pair_count=2)
    return out.select(F.col("src").cast("bigint").alias("src"),
                      F.col("dst").cast("bigint").alias("dst"),
                      "shared_groups",
                      F.round("cosine", 6).alias("cosine"))


def q_k_core(spark, sf_dir):
    """3-core of the part co-order network: fixed-round distributed peel
    (early exit exact under the monotone-shrink invariant) vs an UNROLLED
    12-round SQL oracle — the dense-backbone extraction after triangle
    counting."""
    li = _t(spark, sf_dir, "lineitem")
    sp = li.select(F.col("l_orderkey").alias("g"),
                   F.col("l_partkey").alias("i"))
    edges = graph.cooccurrence_edges(sp, "g", "i").filter(
        F.col("weight") >= 2)
    out = graph.k_core(edges, "src", "dst", k=3, rounds=12)
    return out.select(F.col("node").cast("bigint").alias("node"),
                      F.col("core_degree").cast("bigint")
                      .alias("core_degree"))


def q_metagenome_qc(spark, sf_dir):
    """Composition: the per-sample metagenome QC report in ONE lazy plan —
    read gates (length / N / homopolymer / fastp complexity, all
    scan-stage) → per-source pass counts + mean GC → Shannon diversity of
    the passing reads' 3-mer spectrum (X51 machinery at k-mer grain).
    The one-scan 'is this sample sequencable' dashboard."""
    d = _t(spark, sf_dir, "documents")
    reads = (d.select("doc_id", "source",
                      F.upper(F.regexp_replace(F.lower("text"),
                                               "[^acgt]", "")).alias("seq"))
             .filter(F.length("seq") >= 30))
    passing = bio.quality_filter(reads, "seq", min_len=30, max_n=0,
                                 max_homopolymer=6)
    passing = bio.low_complexity_filter(passing, "seq", threshold=30.0)
    # persist: the complexity gate is an interpreted higher-order filter
    # and `passing` feeds TWO downstream branches (pass stats + k-mer
    # explode) — unpersisted, each branch re-runs the whole gate chain
    # (measured 11.6 s -> the gate evaluated twice at sf0.1). Registered
    # for release via the library cache registry.
    from glamr_omics_pipelines_spark.operators import _cache
    passing = _cache.register(passing)
    totals = reads.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_reads"))
    pstats = passing.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_pass"),
        F.round(F.avg(bio.gc_content("seq")), 4).alias("mean_gc"),
        F.round(F.avg(F.length("seq")), 4).alias("mean_len"))
    kmers = passing.select("source", F.explode(F.expr(
        "transform(sequence(1, length(seq) - 2), "
        "i -> substring(seq, i, 3))")).alias("taxon"))
    kcounts = (kmers.groupBy("source", "taxon")
               .agg(F.count(F.lit(1)).alias("cnt")))
    div = (diversity.shannon_diversity(
        kcounts.withColumnRenamed("source", "sample"), "sample", "cnt")
        .select(F.col("sample").alias("source"),
                _r4("shannon").alias("kmer_shannon")))
    return (totals.join(pstats, "source", "left")
            .join(div, "source", "left")
            .select("source", F.col("n_reads").cast("bigint")
                    .alias("n_reads"),
                    F.coalesce(F.col("n_pass"), F.lit(0)).cast("bigint")
                    .alias("n_pass"),
                    "mean_gc", "mean_len", "kmer_shannon"))


def q_expanding_distinct(spark, sf_dir):
    """Running distinct-event-type count per user over time ('unique taxa
    seen so far' curve): first-occurrence flag + cumulative sum — the
    COUNT(DISTINCT)-over-window factorization, no set state."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 50)
    out = windows.expanding_distinct(ev, "user_id", "ts", "event_type",
                                     "event_id", out="distinct_so_far")
    return out.select("event_id", "user_id", "distinct_so_far")


def q_doc_bigram_lm(spark, sf_dir):
    """Interpolated bigram LM quality score per doc (λ=0.7) under the
    corpus's own counts — the rung above doc_lm_score; bigram tables join
    back at position grain."""
    d = _t(spark, sf_dir, "documents")
    out = text.bigram_lm_score(d, "doc_id", "text", lam=0.7,
                               out="lm2_score")
    return out.select("doc_id", _r4("lm2_score").alias("lm2_score"),
                      F.col("n_bigrams").cast("bigint").alias("n_bigrams"))


def q_event_paths(spark, sf_dir):
    """Top event-type trigram journeys across users (view→click→purchase
    mining): n−1 leads on ONE (user, time) window sort, path counts
    partial-agged over the observed-path grid."""
    ev = _events(spark, sf_dir)
    out = timeseries.path_ngrams(ev, ["user_id"], "ts", "event_type",
                                 n=3, tiebreak_cols=["event_id"])
    return (out.orderBy(F.col("n_paths").desc(), "s1", "s2", "s3")
            .limit(25)
            .select("s1", "s2", "s3",
                    F.col("n_paths").cast("bigint").alias("n_paths")))


def q_geo_clusters(spark, sf_dir):
    """Composition: spatial clusters of georeferenced samples — 3 km
    grid-binned neighbor pairs (X56) → min-label connected components
    (X26); singleton sites keep their own id. The 'sampling site
    grouping' step after proximity detection."""
    c = _t(spark, sf_dir, "customer").select("c_custkey").filter(
        F.col("c_custkey") < 400)
    pts = c.select(
        F.col("c_custkey").alias("sample_id"),
        (F.lit(41.0)
         + ((F.col("c_custkey") * 2654435761) % 600000) / F.lit(100000.0))
        .alias("lat"),
        (F.lit(-87.0)
         + ((F.col("c_custkey") * 2246822519) % 700000) / F.lit(100000.0))
        .alias("lon"))
    pairs = joins.geo_neighbor_pairs(pts, "sample_id", radius_km=3.0,
                                     max_abs_lat=50.0)
    labels = dedup.dup_clusters(pairs.select("id_a", "id_b"))
    out = (pts.join(labels, pts["sample_id"] == labels["id"], "left")
           .select("sample_id",
                   F.coalesce(F.col("label"), F.col("sample_id"))
                   .alias("cluster_id")))
    return out.select(F.col("sample_id").cast("bigint").alias("sample_id"),
                      F.col("cluster_id").cast("bigint").alias("cluster_id"))


def q_ab_test(spark, sf_dir):
    """Two-proportion z-test per event type: user_id parity as the variant
    assignment, value>50 as the success metric — the experiment-dashboard
    aggregate, one conditional-sum partial agg per group."""
    ev = _events(spark, sf_dir)
    d = ev.select("event_type",
                  F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
                  .alias("variant"),
                  (F.col("value") > 50).cast("int").alias("converted"))
    out = stats.two_proportion_ztest(d, "event_type", "variant",
                                     "converted", "A", "B")
    return out.select("event_type", "n_a", "n_b",
                      _r4("rate_a").alias("rate_a"),
                      _r4("rate_b").alias("rate_b"),
                      _r4("z_score").alias("z_score"))


def q_tfidf_doc_pairs(spark, sf_dir):
    """All-pairs TF-IDF cosine document similarity (Bayardo-style DF
    pruning bounds the inverted-index fan-out; unit vectors make the pair
    score one dot-product agg) — sparse-vector near-topic detection with
    no embedding model."""
    d = _t(spark, sf_dir, "documents")
    out = text.tfidf_doc_pairs(d, "doc_id", "text", max_df_frac=0.5,
                               threshold=0.25)
    return out.select("id_a", "id_b", _r4("cosine").alias("cosine"))


def q_shard_assign(spark, sf_dir):
    """Rendezvous (HRW) shard assignment over customers, 8 shards —
    row-local argmax of md5(key#shard), zero shuffle; the minimal-movement
    placement rule for resharding a 100 TB table."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    out = sampling.rendezvous_assign(c, "c_custkey", n_shards=8,
                                     out="shard")
    return out.select("c_custkey",
                      F.col("shard").cast("int").alias("shard"))


def q_feature_hash(spark, sf_dir):
    """Hashing-trick featurizer: 16-dim signed token-count vectors per doc
    (md5 bucket + sign bit), no vocabulary table — emitted as a csv string
    so the integer counts hash identically across engines."""
    d = _spread(spark, sf_dir, "documents")
    out = sampling.feature_hash(d, "doc_id", "text", n_features=16)
    return out.select(
        "doc_id",
        F.array_join(F.transform(
            "features",
            lambda x: x.cast("bigint").cast("string")), ",")
        .alias("features_csv"))


def q_cms_counts(spark, sf_dir):
    """Count-min sketch frequency estimates for part keys: md5-seeded
    grid is DETERMINISTIC, so the whole sketch gets a full-value oracle
    (the HLL family can't) — mergeable approximate counting with
    depth×width state."""
    li = _t(spark, sf_dir, "lineitem")
    stream = li.select(F.col("l_partkey").alias("item"))
    # hash-work hoist: pre-agg to (item, n) so the 4 md5s run once per
    # DISTINCT part, not once per fact row (value-identical grid)
    item_counts = stream.groupBy("item").agg(F.count(F.lit(1)).alias("_n"))
    cms = sketches.cms_build(item_counts, "item", depth=4, width=256,
                             weight_col="_n")
    items = stream.filter(F.col("item") < 100).distinct()
    out = sketches.cms_estimate(cms, items, "item", depth=4, width=256)
    return out.select(F.col("item").cast("bigint").alias("item"),
                      F.col("est_count").cast("bigint").alias("est_count"))


def q_twap(spark, sf_dir):
    """Time-weighted average value per user (TWAP): interval-weighted mean
    for irregular sampling — lead window + one key-grain agg, one
    exchange end to end."""
    ev = _events(spark, sf_dir)
    out = timeseries.time_weighted_avg(ev, "user_id", "ts", "value",
                                       "event_id")
    return out.select("user_id", _r4("twap").alias("twap"),
                      _r4("span_seconds").alias("span_seconds"),
                      F.col("n_intervals").cast("bigint")
                      .alias("n_intervals"))


def q_spearman(spark, sf_dir):
    """Per-event-type Spearman rank correlation between value and
    time-of-day second: midrank windows on one group exchange + co-moment
    Pearson over ranks."""
    ev = _events(spark, sf_dir)
    sec_of_day = (F.floor(windows.epoch_us("ts") / F.lit(1_000_000))
                  % 86400).cast("double")
    d = ev.select("event_type", sec_of_day.alias("x"),
                  F.col("value").alias("y"))
    out = stats.spearman_corr(d, "event_type", "x", "y")
    return out.select("event_type", "n",
                      _r4("spearman_rho").alias("spearman_rho"))


def q_debruijn_stats(spark, sf_dir):
    """de Bruijn graph tangle diagnostic over the acgt read set (k=5):
    node/edge/linear/branching/tip counts — consecutive-kmer edges explode
    row-locally, degrees bounded by 4^k, corpus-size independent."""
    d = _spread(spark, sf_dir, "documents")
    reads = (d.select(F.upper(F.regexp_replace(F.lower("text"),
                                               "[^acgt]", "")).alias("seq"))
             .filter(F.length("seq") >= 6))
    out = bio.debruijn_stats(reads, "seq", k=5)
    return out.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_linear").cast("bigint").alias("n_linear"),
        F.col("n_branching").cast("bigint").alias("n_branching"),
        F.col("n_tips").cast("bigint").alias("n_tips"),
        F.col("n_edges").cast("bigint").alias("n_edges"))


def q_minimizers(spark, sf_dir):
    """Minimizer (winnowing) sketch density per read (k=5, w=4): window
    minima over the md5 k-mer hash array, all row-local HOFs — zero
    shuffle, the minimap2-style seeding sketch as a scan.

    r12: _spread — the winnowing HOFs are scan-stage CPU over a sub-split file (interleaved A/B min-of-4: 0.74 -> 0.46 s)."""
    d = _spread(spark, sf_dir, "documents")
    reads = (d.select("doc_id",
                      F.upper(F.regexp_replace(F.lower("text"),
                                               "[^acgt]", "")).alias("seq")))
    out = bio.minimizer_stats(reads, "seq", k=5, w=4)
    return out.select("doc_id", "n_kmers", "n_minimizers", "density")


def q_debounce(spark, sf_dir):
    """Telemetry debounce: drop events whose same-(user,type) predecessor
    is younger than 60s (lag-gap form) — one (key,time) exchange, the
    batch twin of watermark dedup."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 60)
    out = windows.debounce(ev, ["user_id", "event_type"], "ts",
                           min_gap_seconds=60.0, tiebreak_col="event_id")
    return out.select("event_id", "user_id", "event_type")


def q_session_stats(spark, sf_dir):
    """Composition: sessionize (§2.10 gap rule) → per-session duration /
    event count / bounce flag → per-user session summary, ONE lazy plan
    on a single user-key exchange family."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 80)
    s = windows.sessionize(ev, "user_id", "ts", gap_seconds=1800)
    per_session = (s.groupBy("user_id", "session_id")
                   .agg(F.count(F.lit(1)).alias("n_events"),
                        (windows.epoch_us(F.max("ts"))
                         - windows.epoch_us(F.min("ts"))).alias("dur_us")))
    return (per_session.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
                 F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
                 .cast("bigint").alias("n_bounces"),
                 _r4(F.avg("n_events")).alias("avg_events"),
                 _r4(F.avg(F.col("dur_us") / 1e6)).alias("avg_dur_sec")))


def q_group_mode(spark, sf_dir):
    """Statistical mode per group (most frequent part per supplier, ties →
    smallest part key): value-grain counts then the map-side struct-min
    top-1 aggregate (W1 machinery) — never a per-group sort window."""
    li = _t(spark, sf_dir, "lineitem")
    counts = (li.groupBy("l_suppkey", "l_partkey")
              .agg(F.count(F.lit(1)).alias("n")))
    out = windows.top1_by_agg(counts, ["l_suppkey"],
                              order=[("n", False), ("l_partkey", True)],
                              payload=["l_partkey", "n"])
    return out.select("l_suppkey",
                      F.col("l_partkey").alias("mode_partkey"),
                      F.col("n").cast("bigint").alias("n"))


def q_class_tfidf(spark, sf_dir):
    """c-TF-IDF (BERTopic-shaped): top-5 characteristic terms per source —
    (class, term)-grain aggs, corpus-size independent; the
    'name this cluster' step after document clustering."""
    d = _t(spark, sf_dir, "documents")
    return text.class_tfidf_topk(d, "source", "text", k=5)


def q_kl_divergence(spark, sf_dir):
    """Per-source KL divergence from the corpus unigram blend — the
    domain-drift score for corpus mixing; grid-grain aggs with broadcast
    distributions."""
    d = _t(spark, sf_dir, "documents")
    return text.group_kl_divergence(d, "source", "text")


def q_nearest_station(spark, sf_dir):
    """Nearest-station spatial attach: every sample point (customer-derived
    lattice) assigned to the closest of 10 synthesized stations — broadcast
    dim fan-out + map-side struct-min argmin, ties to smaller station id."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    pts = c.select(
        F.col("c_custkey").alias("sample_id"),
        (F.lit(41.0)
         + ((F.col("c_custkey") * 2654435761) % 600000) / F.lit(100000.0))
        .alias("lat"),
        (F.lit(-87.0)
         + ((F.col("c_custkey") * 2246822519) % 700000) / F.lit(100000.0))
        .alias("lon"))
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 10)
    stations = n.select(
        F.col("n_nationkey").alias("station_id"),
        (F.lit(41.0) + F.col("n_nationkey") * 0.6).alias("lat"),
        (F.lit(-87.0) + F.col("n_nationkey") * 0.7).alias("lon"))
    out = joins.nearest_station(pts, stations, "sample_id", "station_id")
    return out.select("sample_id",
                      F.col("station").cast("bigint").alias("station"),
                      _r4("dist_km").alias("dist_km"))


def q_burstiness(spark, sf_dir):
    """Per-user burstiness index B = (σ−μ)/(σ+μ) over inter-event gaps —
    periodic vs Poisson vs bursty temporal fingerprint; one lag window +
    one co-moment agg on a single exchange."""
    ev = _events(spark, sf_dir)
    out = timeseries.burstiness(ev, "user_id", "ts", "event_id")
    return out.select("user_id", "n_gaps",
                      _r4("mean_gap_sec").alias("mean_gap_sec"),
                      _r4("burstiness").alias("burstiness"))


def q_gini(spark, sf_dir):
    """Gini concentration of taxon abundance per sample (Lorenz twin of
    Pielou evenness): one rank window + one co-moment agg per group."""
    counts = _taxon_counts(spark, sf_dir)
    out = abundance.gini_coefficient(counts, ["sample"], "cnt", "taxon")
    return out.select("sample", "n", _r4("gini").alias("gini"))


def q_benford(spark, sf_dir):
    """Benford first-digit conformity of extended prices per return flag —
    the fabricated-data / unit-mix-up audit: group×9 partial agg vs
    literal expectations."""
    li = _t(spark, sf_dir, "lineitem")
    out = validate.benford_deviation(li, ["l_returnflag"],
                                     "l_extendedprice")
    return out.select("l_returnflag", "n", "benford_chi2", "max_abs_dev")


def q_simpson(spark, sf_dir):
    """Simpson diversity (1 − Σp²) + inverse Simpson per sample — the
    dominance-weighted companion of Shannon (X51), same taxon-grain
    partial-agg + broadcast-totals shape."""
    counts = _taxon_counts(spark, sf_dir)
    totals = counts.groupBy("sample").agg(F.sum("cnt").alias("_t"))
    p = F.col("cnt") / F.col("_t")
    out = (counts.join(F.broadcast(totals), "sample")
           .groupBy("sample")
           .agg(F.sum(p * p).alias("_sp")))
    return out.select(
        "sample", _r4(1 - F.col("_sp")).alias("simpson"),
        _r4(1 / F.col("_sp")).alias("inv_simpson"))


def q_zipf_slope(spark, sf_dir):
    """Zipf slope of the corpus: OLS fit of ln(freq) ~ ln(rank) over the
    top-1000 vocabulary (healthy natural text ≈ −1; templated/synthetic
    corpora deviate) — vocab partial agg + a METADATA-scale global rank
    (bh_adjust contract) + the X101 co-moment fit."""
    d = _t(spark, sf_dir, "documents")
    vocab = (d.select(F.explode(F.transform(text.tokens("text"), F.lower))
                      .alias("t"))
             .groupBy("t").agg(F.count(F.lit(1)).alias("n")))
    w = Window.orderBy(F.col("n").desc(), F.col("t").asc())
    ranked = (vocab.withColumn("r", F.row_number().over(w))
              .filter(F.col("r") <= 1000)
              .select(F.lit(1).alias("k"),
                      F.log(F.col("r").cast("double")).alias("x"),
                      F.log(F.col("n").cast("double")).alias("y")))
    out = stats.trend_fit(ranked, ["k"], "x", "y")
    return out.select(F.col("n").alias("n_terms"),
                      _r4("slope").alias("zipf_slope"),
                      _r4("r2").alias("r2"))


def q_oov_rate(spark, sf_dir):
    """Out-of-vocabulary audit: per-language OOV token rate of the
    deterministic md5 val split against the train split's vocabulary —
    the train/val lexical-coverage check (contamination sweep's benign
    twin). Train vocab is a distinct-token table (vocab-sized, broadcast
    or shuffled equi join at web scale), val tokens left-join it once."""
    d = _t(spark, sf_dir, "documents")
    bucket = (F.conv(F.substring(F.md5(F.concat(F.lit("split:"),
                                                F.col("doc_id")
                                                .cast("string"))), 1, 8),
                     16, 10).cast("long") % 100)
    d = d.withColumn("_b", bucket)
    toks = d.select("lang", F.col("_b"), F.explode(
        F.transform(text.tokens("text"), F.lower)).alias("t"))
    train_vocab = (toks.filter(F.col("_b") < 80)
                   .select("t").distinct()
                   .withColumn("_seen", F.lit(1)))
    val = toks.filter(F.col("_b") >= 80)
    j = val.join(train_vocab, "t", "left")
    return (j.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_val_tokens"),
                 F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
                 .cast("bigint").alias("n_oov"),
                 F.round(F.avg(F.when(F.col("_seen").isNull(), 1.0)
                               .otherwise(0.0)), 6).alias("oov_rate")))


def q_orf_count(spark, sf_dir):
    """ORF census per read (frame 0): complete ORFs = 'M…*' spans in the
    X107 translation — regexp_count + extract_all/length over the protein
    string, all scan-stage (the relational shadow of prodigal's gene
    calls).

    r12: _spread — the translate+regexp spans are scan-stage CPU over a sub-split file (interleaved A/B min-of-5: 0.48 -> 0.31 s). benford, gini, doc_lm_score, doc_fingerprint, token_counts, chunk_documents, zorder_key measured loss/wash in the same batches and keep _t."""
    d = _spread(spark, sf_dir, "documents")
    reads = (d.select("doc_id",
                      F.upper(F.regexp_replace(F.lower("text"),
                                               "[^acgt]", "")).alias("seq"))
             .filter(F.length("seq") >= 3))
    t = bio.translate_dna(reads, "seq", frame=0, out="protein")
    orfs = F.expr(r"regexp_extract_all(protein, 'M[^*]*\\*', 0)")
    return t.select(
        "doc_id",
        F.size(orfs).cast("bigint").alias("n_orfs"),
        F.coalesce(F.array_max(F.transform(orfs, F.length)), F.lit(0))
        .cast("bigint").alias("longest_orf_aa"))


def q_base_entropy(spark, sf_dir):
    """Per-read Shannon entropy of base composition (0 for homopolymers,
    2 bits for uniform ACGT) — the low-complexity detector's
    information-theoretic twin, entirely row-local length arithmetic.

    r12: _spread — the 4-replace entropy chain is scan-stage CPU over a sub-split file (interleaved A/B min-of-5: 0.54 -> 0.43 s)."""
    d = _spread(spark, sf_dir, "documents")
    reads = (d.select("doc_id",
                      F.upper(F.regexp_replace(F.lower("text"),
                                               "[^acgt]", "")).alias("seq"))
             .filter(F.length("seq") >= 10))
    n = F.length("seq").cast("double")
    terms = []
    for b in "ACGT":
        cnt = (F.length("seq")
               - F.length(F.regexp_replace("seq", b, ""))).cast("double")
        p = cnt / n
        terms.append(F.when(cnt > 0, -p * F.log2(p)).otherwise(F.lit(0.0)))
    h = terms[0] + terms[1] + terms[2] + terms[3]
    return reads.select("doc_id",
                        F.length("seq").cast("bigint").alias("seq_len"),
                        _r4(h).alias("base_entropy_bits"))


def q_psi_drift(spark, sf_dir):
    """Population Stability Index of event values: reference = users < 75,
    current = the rest (deliberately the same distribution → PSI ≈ 0) —
    decile bins from ONE exact-percentile agg, binning a row-local fold,
    empty bins reported, never epsilon-fudged."""
    ev = _events(spark, sf_dir)
    ref = ev.filter(F.col("user_id") < 75).select("value")
    cur = ev.filter(F.col("user_id") >= 75).select("value")
    out = stats.population_stability(ref, cur, "value", n_bins=10)
    return out.select("psi",
                      F.col("n_empty_bins").cast("bigint")
                      .alias("n_empty_bins"),
                      F.col("n_bins").cast("bigint").alias("n_bins"))


def q_ks_test(spark, sf_dir):
    """Two-sample KS statistic per event type (user-parity arms over
    value): tie-exact ECDFs on ONE feature-key exchange — the binless
    distribution-shape companion of psi_drift."""
    ev = _events(spark, sf_dir)
    d = ev.select("event_type",
                  F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
                  .alias("arm"), "value")
    out = stats.ks_test(d, "event_type", "arm", "value", "A", "B")
    return out.select("event_type", "n_a", "n_b", "ks_d")


def q_js_divergence(spark, sf_dir):
    """Pairwise Jensen–Shannon divergence between sources (symmetric,
    ≤ ln 2): class-grain distributions fanned out at PAIR grain, one-sided
    terms kept — the corpus-mixing similarity matrix."""
    d = _t(spark, sf_dir, "documents")
    out = text.js_divergence_pairs(d, "source", "text")
    return out.select(F.col("ca").alias("source_a"),
                      F.col("cb").alias("source_b"), "js_divergence")


def q_kl_top_terms(spark, sf_dir):
    """Interpretability companion of kl_divergence: the top-3 terms
    DRIVING each source's divergence from the corpus blend (largest
    positive p·ln(p/q) contributions) — same grid-grain aggs, bounded
    rank window over the class-term grid."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.col("source").alias("cls"), F.explode(
        F.transform(text.tokens("text"), F.lower)).alias("t"))
    tfc = toks.groupBy("cls", "t").agg(F.count(F.lit(1)).alias("n"))
    ct = tfc.groupBy("cls").agg(F.sum("n").alias("ctot"))
    corpus = tfc.groupBy("t").agg(F.sum("n").alias("cf"))
    tot = F.broadcast(corpus.agg(F.sum("cf").alias("grand")))
    j = (tfc.join(F.broadcast(ct), "cls")
         .join(F.broadcast(corpus), "t").crossJoin(tot))
    p = F.col("n") / F.col("ctot")
    q = F.col("cf") / F.col("grand")
    contrib = p * F.log(p / q)
    w = Window.partitionBy("cls").orderBy(contrib.desc(), F.col("t").asc())
    return (j.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= 3)
            .select(F.col("cls").alias("source"),
                    F.col("t").alias("term"),
                    F.col("_rk").cast("bigint").alias("rank"),
                    F.round(contrib, 6).alias("kl_contrib")))


def q_vocab_growth(spark, sf_dir):
    """Vocabulary growth curve (Heaps' law view): new 6-shingle count per
    sequential ingest batch (50 docs each) + the cumulative vocabulary —
    shingle first-seen via one min-batch partial agg, cumulative via a
    BATCH-grain window (10 rows). The 'is the corpus still adding
    language' monitor for incremental ingestion."""
    d = _spread(spark, sf_dir, "documents")
    toks = (d.select((F.col("doc_id") / 50).cast("bigint").alias("batch"),
                     F.explode(F.expr(
                         "transform(sequence(1, greatest(length(text) - 5,"
                         " 1)), i -> substring(text, i, 6))")).alias("t"))
            .filter(F.length("t") == 6))
    first_seen = toks.groupBy("t").agg(F.min("batch").alias("batch"))
    new_per = (first_seen.groupBy("batch")
               .agg(F.count(F.lit(1)).alias("n_new_tokens")))
    w = (Window.orderBy("batch")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (new_per
            .withColumn("cum_vocab", F.sum("n_new_tokens").over(w))
            .select(F.col("batch").cast("bigint").alias("batch"),
                    F.col("n_new_tokens").cast("bigint")
                    .alias("n_new_tokens"),
                    F.col("cum_vocab").cast("bigint").alias("cum_vocab")))


def q_rfm_segments(spark, sf_dir):
    """RFM segmentation: per-user recency/frequency/monetary quintile
    scores via exact percentile THRESHOLDS (20/40/60/80) broadcast back and
    banded row-locally — score 1 = top quintile, ties share a bucket.

    Scale story (replaces the r4 form's three global user-grain NTILE
    windows, the judge-flagged single-partition sort): ONE user-grain
    partial aggregate, ONE exact-percentile aggregate producing a 1-row
    threshold frame (broadcast — the documented 1-row scalar-attach BNL
    class), then row-local banding.  No unpartitioned window anywhere; at
    100× the only global structure is the 12-number threshold row."""
    ev = _events(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(
        F.max(windows.epoch_us("ts")).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 4).alias("monetary"))
    qs = F.array(F.lit(0.2), F.lit(0.4), F.lit(0.6), F.lit(0.8))
    th = agg.agg(F.percentile("_last", qs).alias("r_th"),
                 F.percentile("frequency", qs).alias("f_th"),
                 F.percentile("monetary", qs).alias("m_th"))

    def band(v, t):  # descending quintiles: >= q80 -> 1, ... < q20 -> 5
        return (F.when(F.col(v) >= F.element_at(t, 4), 1)
                .when(F.col(v) >= F.element_at(t, 3), 2)
                .when(F.col(v) >= F.element_at(t, 2), 3)
                .when(F.col(v) >= F.element_at(t, 1), 4)
                .otherwise(5).cast("bigint"))

    out = (agg.join(F.broadcast(th))
           .withColumn("r_score", band("_last", F.col("r_th")))
           .withColumn("f_score", band("frequency", F.col("f_th")))
           .withColumn("m_score", band("monetary", F.col("m_th"))))
    return out.select(
        "user_id", "frequency", "monetary", "r_score", "f_score", "m_score",
        F.concat_ws("", "r_score", "f_score", "m_score").alias("rfm"))


def q_ohlc_bars(spark, sf_dir):
    """OHLC downsampling bars per (event_type, day): open/close via
    struct-min/max over (time, tiebreak, value) — map-side aggregates,
    no sort windows — plus high/low/volume; the M4-style plot-reduction
    primitive (a day of ticks → 4 numbers)."""
    ev = _events(spark, sf_dir)
    sec = F.floor(windows.epoch_us("ts") / F.lit(1_000_000)).cast("long")
    day = (F.floor(sec / F.lit(86400)) * 86400).cast("long")
    d = ev.select("event_type", day.alias("day"),
                  sec.alias("_s"), "event_id", "value")
    packed = F.struct(F.col("_s"), F.col("event_id"), F.col("value"))
    out = (d.groupBy("event_type", "day")
           .agg(F.min(packed).getField("value").alias("open"),
                F.max(packed).getField("value").alias("close"),
                F.max("value").alias("high"), F.min("value").alias("low"),
                F.count(F.lit(1)).alias("volume")))
    return out.select("event_type", "day",
                      _r4("open").alias("open"), _r4("high").alias("high"),
                      _r4("low").alias("low"), _r4("close").alias("close"),
                      F.col("volume").cast("bigint").alias("volume"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the §7.1 'bracken merge' end-to-end slice on sf0.001 —
    scan → broadcast join → window rel-abund → pivot to a sample-wide
    matrix (merge_bracken.R re-expressed)."""
    sf_dir = "/root/testdata/sf0.001"
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    n = (li.join(o, li.l_orderkey == o.o_orderkey)
         .groupBy("o_orderpriority", "l_returnflag")
         .agg(F.sum("l_quantity").alias("n")))
    ra = abundance.rel_abund(n, "n", ["o_orderpriority"])
    wide = pivot_wider(ra.withColumn("rel_abund", _r4("rel_abund")),
                       ["l_returnflag"], "o_orderpriority",
                       F.first("rel_abund"), fill=0.0)
    return wide.orderBy("l_returnflag")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering matters: the driver's correctness gate checks the FIRST 50
    # entries.  The full catalog lives in `full` (grouped by theme); the
    # per-round check window is the explicit _R7_WINDOW reorder below —
    # rotation = edit one list.  ROUND-7 WINDOW (VERDICT r6 #1, oldest
    # rows first): all 46 r3-era driver rows (rel_abund .. embedding_dups
    # — re-validated under the ANSI hardening / broadcast-iteration /
    # codec changes that landed since r3), the two NEW oracle rows
    # streaming_replay_rollup (the streaming family's first driver-oracle
    # row — batch-replayed availableNow foreachBatch state vs a batch
    # GROUP BY) and benchmark_ledger (pypelib/post.py:763-935 parity),
    # plus cosine_topk and dbscan re-checks (their pair-gen gained the
    # _BRUTE_PAIRGEN_MAX_ROWS auto-gate this round).  New entries
    # displaced banked re-checks per the no-growth rule.
    # ROUND-8 WINDOW (below): the 43 r4-era rows + 2 new oracle rows
    # (streaming_attribution_join, checkout_delta) + 4 r8-touched
    # re-checks + the oldest banked r5-era row.  After this round the
    # oldest remaining driver row is r5-era (46 rows, age 3:
    # attribution_join .. zorder_key, full list in ROUND8.md) — the R9
    # window is those 46 + re-checks of whatever r9 touches.
    full = {
        "embedding_covariance": q_embedding_covariance,
        "rolling_corr": q_rolling_corr,
        "cohort_retention": q_cohort_retention,
        "cooccur_cosine": q_cooccur_cosine,
        "k_core": q_k_core,
        "metagenome_qc": q_metagenome_qc,
        "expanding_distinct": q_expanding_distinct,
        "doc_bigram_lm": q_doc_bigram_lm,
        "event_paths": q_event_paths,
        "geo_clusters": q_geo_clusters,
        "ab_test": q_ab_test,
        "tfidf_doc_pairs": q_tfidf_doc_pairs,
        "shard_assign": q_shard_assign,
        "feature_hash": q_feature_hash,
        "cms_counts": q_cms_counts,
        "twap": q_twap,
        "spearman": q_spearman,
        "debruijn_stats": q_debruijn_stats,
        "minimizers": q_minimizers,
        "debounce": q_debounce,
        "session_stats": q_session_stats,
        "group_mode": q_group_mode,
        "class_tfidf": q_class_tfidf,
        "kl_divergence": q_kl_divergence,
        "nearest_station": q_nearest_station,
        "burstiness": q_burstiness,
        "gini": q_gini,
        "benford": q_benford,
        "simpson": q_simpson,
        "zipf_slope": q_zipf_slope,
        "oov_rate": q_oov_rate,
        "orf_count": q_orf_count,
        "base_entropy": q_base_entropy,
        "psi_drift": q_psi_drift,
        "ks_test": q_ks_test,
        "js_divergence": q_js_divergence,
        "kl_top_terms": q_kl_top_terms,
        "vocab_growth": q_vocab_growth,
        "rfm_segments": q_rfm_segments,
        "ohlc_bars": q_ohlc_bars,
        "storage_reclaim": q_storage_reclaim,
        # new S5/S10 rows + the pagerank plan-change re-check, then 6
        # banked re-checks close the 50-slot window
        "xlsx_roundtrip": q_xlsx_roundtrip,
        "sqlite_roundtrip": q_sqlite_roundtrip,
        "pagerank": q_pagerank,
        "lsh_ann": q_lsh_ann,
        "curation_pipeline": q_curation_pipeline,
        "exact_dedup": q_exact_dedup,
        "minhash_dedup": q_minhash_dedup,
        "dedup_keep_best": q_dedup_keep_best,
        "pricing_summary": q_pricing_summary,
        # --- banked green driver rows (rounds 1-5); tools/check.py still
        # --- covers every entry locally each round.
        "lang_id": q_lang_id,
        "token_counts": q_token_counts,
        "hash_sample": q_hash_sample,
        "pack_sequences": q_pack_sequences,
        "curation_pipeline_v2": q_curation_pipeline_v2,
        "cap_per_source": q_cap_per_source,
        "seqkit_stats": q_seqkit_stats,
        "gtdb_majority_vote": q_gtdb_majority_vote,
        "interval_merge": q_interval_merge,
        "genome_coverage": q_genome_coverage,
        "nearest_feature": q_nearest_feature,
        "gaps_islands": q_gaps_islands,
        "ntile_buckets": q_ntile_buckets,
        "group_percentiles": q_group_percentiles,
        "incremental_agg": q_incremental_agg,
        "interval_subtract": q_interval_subtract,
        "fuzzy_name_pairs": q_fuzzy_name_pairs,
        "fuzzy_resolve": q_fuzzy_resolve,
        "mixture_sample": q_mixture_sample,
        "cube_report": q_cube_report,
        "bitset_semi_join": q_bitset_semi_join,
        "basket_rules": q_basket_rules,
        "quantile_normalize": q_quantile_normalize,
        "zorder_key": q_zorder_key,
        "rank_sum_test": q_rank_sum_test,
        "enrichment_2x2": q_enrichment_2x2,
        "bh_fdr": q_bh_fdr,
        "clr_transform": q_clr_transform,
        "deseq_size_factors": q_deseq_size_factors,
        "weighted_sample": q_weighted_sample,
        "attribution_join": q_attribution_join,
        "quantize_embeddings": q_quantize_embeddings,
        "data_quality": q_data_quality,
        "scd2_history": q_scd2_history,
        "event_transitions": q_event_transitions,
        "chunk_documents": q_chunk_documents,
        "nx_ladder": q_nx_ladder,
        "resample_fill": q_resample_fill,
        "interpolate": q_interpolate,
        "changepoint": q_changepoint,
        "triangle_count": q_triangle_count,
        "mash_distance": q_mash_distance,
        "dbscan": q_dbscan,
        "trend_fit": q_trend_fit,
        "chi_square": q_chi_square,
        "inverted_index": q_inverted_index,
        "key_skew": q_key_skew,
        "welch_t": q_welch_t,
        "translate_dna": q_translate_dna,
        "seasonal_anomaly": q_seasonal_anomaly,
        "sensor_pipeline": q_sensor_pipeline,
        "interval_overlap": q_interval_overlap,
        "lsh_ann_multi": q_lsh_ann_multi,
        "dup_clusters_star": q_dup_clusters_star,
        "dup_clusters": q_dup_clusters,
        "quantile_gate": q_quantile_gate,
        "normalize_text": q_normalize_text,
        "session_windows": q_session_windows,
        "kmer_spectrum": q_kmer_spectrum,
        "rolling_features": q_rolling_features,
        "percent_rank_norm": q_percent_rank_norm,
        "tfidf_topk": q_tfidf_topk,
        "winsorize": q_winsorize,
        "funnel": q_funnel,
        "snapshot_diff": q_snapshot_diff,
        "corr_stats": q_corr_stats,
        "mad_outliers": q_mad_outliers,
        "label_centroids": q_label_centroids,
        "profile_table": q_profile_table,
        "simhash_dedup": q_simhash_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_containment": q_ngram_containment,
        "line_dedup": q_line_dedup,
        "span_dedup": q_span_dedup,
        "pmi_collocations": q_pmi_collocations,
        "geo_neighbors": q_geo_neighbors,
        "shannon_diversity": q_shannon_diversity,
        "bray_curtis": q_bray_curtis,
        "rarefaction": q_rarefaction,
        "chao1": q_chao1,
        "cosine_topk": q_cosine_topk,
        "text_quality": q_text_quality,
        "doc_fingerprint": q_doc_fingerprint,
        "vocab_topk": q_vocab_topk,
        "stratified_split": q_stratified_split,
        "hypertable_rollup": q_hypertable_rollup,
        "quality_window_trim": q_quality_window_trim,
        "text_repetition": q_text_repetition,
        "pii_scrub": q_pii_scrub,
        "doc_lm_score": q_doc_lm_score,
        "split_contamination": q_split_contamination,
        "temperature_sample": q_temperature_sample,
        "rel_abund": q_rel_abund,
        "rpkm": q_rpkm,
        "tpm": q_tpm,
        "top1_per_group": q_top1_per_group,
        "kingdom_priority_lca": q_kingdom_priority_lca,
        "multimodal_features": q_multimodal_features,
        "topk_revenue": q_topk_revenue,
        "anvio_stacked": q_anvio_stacked,
        "subtree_rollup": q_subtree_rollup,
        "lca": q_lca,
        "bin_summary_view": q_bin_summary_view,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "windowed_counts": q_windowed_counts,
        "coverage_stats": q_coverage_stats,
        "fasta_roundtrip": q_fasta_roundtrip,
        "fastq_roundtrip": q_fastq_roundtrip,
        "read_count_ladder": q_read_count_ladder,
        "dna_reads_qc": q_dna_reads_qc,
        "asv_matrix": q_asv_matrix,
        "skew_join_salted": q_skew_join_salted,
        "pivot_wider": q_pivot_wider,
        "tie_discard_top1": q_tie_discard_top1,
        "rollup_ladder": q_rollup_ladder,
        "retention_ladder": q_retention_ladder,
        "binner_completion": q_binner_completion,
        "newest_import": q_newest_import,
        "xml_extract": q_xml_extract,
        "pivot_longer": q_pivot_longer,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "threshold_filter": q_threshold_filter,
        "weighted_mean": q_weighted_mean,
        "json_histogram": q_json_histogram,
        "date_multiformat": q_date_multiformat,
        "separate_lineage": q_separate_lineage,
        "explode_csv": q_explode_csv,
        "cross_join_audit": q_cross_join_audit,
        "union_missing_cols": q_union_missing_cols,
        "sequential_ids": q_sequential_ids,
        "quality_bands": q_quality_bands,
        "distinct_catalog": q_distinct_catalog,
        "na_handling": q_na_handling,
        "ivf_ann": q_ivf_ann,
        "embedding_dups": q_embedding_dups,
        "streaming_replay_rollup": q_streaming_replay_rollup,
        "streaming_attribution_join": q_streaming_attribution_join,
        "streaming_heavy_hitters": q_streaming_heavy_hitters,
        "versions_ledger": q_versions_ledger,
        "streaming_drift_monitor": q_streaming_drift_monitor,
        "benchmark_ledger": q_benchmark_ledger,
        "checkout_delta": q_checkout_delta,
        "pq_ann": q_pq_ann,
        "ivfpq_ann": q_ivfpq_ann,
        # r8 catalog-only (the 50-slot window is fully claimed by the
        # r4-era rotation + 3 new rows + 4 touched re-checks): first in
        # line for the R9 window alongside the r5-era rotation
        "bpe_encode": q_bpe_encode,
        # r9 late-session catalog-only rows (the R9 window was already
        # declared and gate-verified when these landed): never-checked,
        # first in line for the next open window slots
        "semdedup": q_semdedup,
        "kmeans_lloyd": q_kmeans_lloyd,
        "bloom_novelty": q_bloom_novelty,
        "streaming_dedup": q_streaming_dedup,
        "ann_recall": q_ann_recall,
        "hist_quantile": q_hist_quantile,
        "leakage_safe_split": q_leakage_safe_split,
        "quality_classifier": q_quality_classifier,
        "minhash_incremental": q_minhash_incremental,
        "incremental_curation": q_incremental_curation,
        "mixture_plan": q_mixture_plan,
        "bm25_search": q_bm25_search,
        "url_dedup": q_url_dedup,
        "domain_blocklist": q_domain_blocklist,
        "line_quality": q_line_quality,
        "streaming_late_data": q_streaming_late_data,
        "rp_project": q_rp_project,
        "web_curation": q_web_curation,
        "phash_dedup": q_phash_dedup,
        "compaction_plan": q_compaction_plan,
        "afp_dedup": q_afp_dedup,
        "wordpiece_encode": q_wordpiece_encode,
        "video_dedup": q_video_dedup,
        "dataset_card": q_dataset_card,
    }
    window = [
        # ROUND-10 WINDOW (VERDICT r9 #2): all 26 catalog rows that have
        # NEVER been driver-checked (landed r9 after the window was drawn;
        # never-checked rows outrank banked re-checks — the bpe_encode
        # precedent)...
        "versions_ledger", "streaming_drift_monitor", "semdedup",
        "kmeans_lloyd", "bloom_novelty", "streaming_dedup", "ann_recall",
        "hist_quantile", "leakage_safe_split", "quality_classifier",
        "minhash_incremental", "incremental_curation", "mixture_plan",
        "bm25_search", "url_dedup", "domain_blocklist", "line_quality",
        "streaming_late_data", "rp_project", "web_curation", "phash_dedup",
        "compaction_plan", "afp_dedup", "wordpiece_encode", "video_dedup",
        "dataset_card",
        # ...plus 24 of the 50 r6-era banked rows (age 3, the ledger
        # maximum) — the ones whose machinery has NO newer green sibling,
        # so a driver re-check is the only fresh evidence available.  The
        # 26 deferred r6-era rows (age 4 for one round, front of R11) each
        # have a documented newer-green re-proof — full per-row rationale
        # in ROUND10.md's age ledger.
        "benford", "cms_counts", "cohort_retention", "debruijn_stats",
        "dedup_keep_best", "doc_bigram_lm", "embedding_covariance",
        "expanding_distinct", "feature_hash", "geo_clusters", "gini",
        "k_core", "kl_top_terms", "ks_test", "lsh_ann", "metagenome_qc",
        "minhash_dedup", "nearest_station", "ohlc_bars", "oov_rate",
        "orf_count", "pagerank", "rolling_corr", "session_stats",
    ]
    assert len(window) == 50 and len(set(window)) == 50
    return ({name: full[name] for name in window}
            | {k: v for k, v in full.items() if k not in set(window)})


# ---------------------------------------------------------------------------
# DuckDB oracles — value-identical ANSI SQL
# ---------------------------------------------------------------------------


def _k_core_sql(k: int = 3, rounds: int = 12) -> str:
    """Oracle for q_k_core: the fixed-round peel unrolled as chained CTEs
    (one alive-set per round) — the same unrolled-loop convention as the
    pagerank oracle; the engine's early exit is exact because alive sets
    shrink monotonically (a stable frontier stays stable)."""
    ctes = [
        "sp AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i "
        "FROM lineitem)",
        "pairs AS (SELECT a.i AS x, b.i AS y, count(*) AS w "
        "FROM sp a JOIN sp b ON a.g = b.g AND a.i < b.i GROUP BY 1, 2)",
        "e AS (SELECT x AS u, y AS v FROM pairs WHERE w >= 2)",
        # MATERIALIZED: each n_i references n_{i-1} twice, so default CTE
        # inlining would expand the chain 2^rounds times (observed as a
        # too-many-open-files parquet-scan explosion)
        "sym AS MATERIALIZED (SELECT u, v FROM e "
        "UNION ALL SELECT v, u FROM e)",
        f"n0 AS MATERIALIZED (SELECT u AS node FROM sym GROUP BY u "
        f"HAVING count(*) >= {k})",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"n{i} AS MATERIALIZED (SELECT s.u AS node FROM sym s "
            f"JOIN n{i - 1} a ON s.u = a.node "
            f"JOIN n{i - 1} b ON s.v = b.node "
            f"GROUP BY s.u HAVING count(*) >= {k})")
    return (
        "WITH " + ",\n        ".join(ctes) + f"""
        SELECT CAST(s.u AS BIGINT) AS node,
               CAST(count(*) AS BIGINT) AS core_degree
        FROM sym s
        JOIN n{rounds} a ON s.u = a.node
        JOIN n{rounds} b ON s.v = b.node
        GROUP BY s.u
    """)


def _orf_count_sql() -> str:
    """Oracle for q_orf_count: the frame-0 translation (same generated
    codon table as _translate_dna_sql) + M…* span extraction."""
    values = ", ".join(f"('{c}', '{a}')"
                       for c, a in sorted(bio.CODON_TABLE.items()))
    return f"""
        WITH reads AS (
          SELECT doc_id,
                 upper(regexp_replace(lower(text), '[^acgt]', '', 'g')) AS seq
          FROM documents),
        ok AS (SELECT doc_id, seq FROM reads WHERE length(seq) >= 3),
        cod AS (
          SELECT doc_id, i, substr(seq, i, 3) AS codon
          FROM ok, LATERAL (SELECT unnest(generate_series(1,
                 length(seq) - 2, 3)) AS i) g),
        tab(codon, aa) AS (VALUES {values}),
        j AS (SELECT doc_id, i, coalesce(aa, 'X') AS aa
              FROM cod LEFT JOIN tab USING (codon)),
        prot AS (
          SELECT ok.doc_id,
                 coalesce(p.protein, '') AS protein
          FROM ok LEFT JOIN (
            SELECT doc_id, string_agg(aa, '' ORDER BY i) AS protein
            FROM j GROUP BY doc_id) p USING (doc_id)),
        orfs AS (
          SELECT doc_id,
                 regexp_extract_all(protein, 'M[^*]*\\*', 0) AS o
          FROM prot)
        SELECT doc_id, CAST(len(o) AS BIGINT) AS n_orfs,
               CAST(coalesce(list_max(list_transform(o, s -> length(s))), 0)
                    AS BIGINT) AS longest_orf_aa
        FROM orfs
    """


def _translate_dna_sql() -> str:
    """Oracle for q_translate_dna: codon table as a 64-row VALUES relation
    (generated from the same bio.CODON_TABLE constant — no second hand-typed
    table to drift), explode codons, join, ordered string_agg."""
    values = ", ".join(f"('{c}', '{a}')"
                       for c, a in sorted(bio.CODON_TABLE.items()))
    return f"""
        WITH reads AS (
          SELECT doc_id,
                 upper(regexp_replace(lower(text), '[^acgt]', '', 'g')) AS seq
          FROM documents),
        ok AS (SELECT doc_id, seq FROM reads WHERE length(seq) >= 3),
        cod AS (
          SELECT doc_id, i, substr(seq, i, 3) AS codon
          FROM ok, LATERAL (SELECT unnest(generate_series(1,
                 length(seq) - 2, 3)) AS i) g),
        tab(codon, aa) AS (VALUES {values}),
        j AS (SELECT doc_id, i, coalesce(aa, 'X') AS aa
              FROM cod LEFT JOIN tab USING (codon))
        SELECT ok.doc_id, CAST(length(ok.seq) AS BIGINT) AS seq_len,
               coalesce(p.protein, '') AS protein
        FROM ok LEFT JOIN (
          SELECT doc_id, string_agg(aa, '' ORDER BY i) AS protein
          FROM j GROUP BY doc_id) p USING (doc_id)
    """


_SHINGLES4 = """
    SELECT DISTINCT doc_id, substr(text, i, 4) AS s
    FROM {src}, LATERAL (SELECT unnest(generate_series(1, greatest(length(text) - 3, 1))) AS i) g
    WHERE length(substr(text, i, 4)) > 0
"""


def _jaccard_sql(corpus_sql: str, threshold: float) -> str:
    sh = _SHINGLES4.format(src=f"({corpus_sql}) src")
    return f"""
    WITH sh AS ({sh}),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    j AS (
      SELECT id_a, id_b,
             i::DOUBLE / (sa.sz + sb.sz - i) AS jac
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b)
    SELECT id_a, id_b, round(jac, 4) AS jaccard FROM j WHERE jac >= {threshold}
    """


_DUP_CORPUS_SQL = """
    SELECT doc_id, text FROM documents WHERE doc_id < 100
    UNION ALL
    SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 100
"""

# shared by dup_clusters and dup_clusters_star: both algorithms implement the
# same connected-components contract, so one recursive-CTE oracle covers both.
_DUP_CLUSTERS_SQL = f"""
    WITH RECURSIVE pairs AS (
      SELECT id_a, id_b FROM ({{jaccard}}) j),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
    labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
    SELECT id AS doc_id, cluster_id,
           (count(*) OVER (PARTITION BY cluster_id))::BIGINT AS cluster_size
    FROM labels
"""


_LANG_SCORES = """
    SELECT doc_id, lang,
      len(list_filter(toks, x -> x IN ('the','and','of','to','a'))) AS s_en,
      len(list_filter(toks, x -> x IN ('el','la','de','que','y'))) AS s_es,
      len(list_filter(toks, x -> x IN ('le','la','de','et','un'))) AS s_fr,
      len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de
    FROM (SELECT doc_id, lang,
                 list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
          FROM documents)
"""


def _fingerprint_sql(prefix_len: int) -> str:
    return f"""
    SELECT doc_id,
      CAST(list_reduce(
        list_prepend(0::BIGINT,
          list_transform(
            list_filter(string_split(substr(text, 1, {prefix_len}), ''), c -> c <> ''),
            c -> ascii(c)::BIGINT)),
        (a, b) -> (a * 31 + b) % 1000000007) AS BIGINT) AS fingerprint
    FROM documents
    """


def _lsh_ann_multi_sql(num_planes: int = 8, dim: int = 64, seed: int = 42,
                       num_tables: int = 3, k: int = 3, nq: int = 5) -> str:
    """Replicate lsh_topk_multi's per-table planes (PRNG seeds
    seed + 1000*t) as SQL literals: per-(table) buckets, candidates sharing a
    bucket in ANY table, scored once per distinct pair."""
    import random
    rows = []
    for t in range(num_tables):
        rng = random.Random(seed + 1000 * t)
        for i, p in enumerate([[rng.gauss(0.0, 1.0) for _ in range(dim)]
                               for _ in range(num_planes)]):
            rows.append(
                f"({t}, {i}, [{', '.join(repr(x) for x in p)}]::DOUBLE[])")
    values = ",\n".join(rows)
    return f"""
    WITH planes AS (SELECT * FROM (VALUES {values}) AS t(tbl, p, v)),
    corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    buckets AS (
      SELECT vec_id, pl.tbl,
             CAST(sum(CASE WHEN list_dot_product(c.e, pl.v) >= 0
                           THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
      FROM corpus c, planes pl GROUP BY vec_id, pl.tbl),
    q AS (SELECT c.vec_id AS query_id, c.e AS qe, b.tbl, b.bucket
          FROM corpus c JOIN buckets b USING (vec_id) WHERE c.vec_id < {nq}),
    cand AS (
      SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id, c.e, q.qe
      FROM corpus c JOIN buckets b ON c.vec_id = b.vec_id
      JOIN q ON b.tbl = q.tbl AND b.bucket = q.bucket
      WHERE c.vec_id <> q.query_id),
    scored AS (
      SELECT query_id, neighbor_id,
             list_cosine_similarity(e, qe) AS cosine
      FROM cand),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(cosine, 6) DESC, neighbor_id ASC) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, round(cosine, 4) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _lsh_ann_sql(num_planes: int = 8, dim: int = 64, seed: int = 42,
                 k: int = 3, nq: int = 5) -> str:
    """Replicate hyperplane_buckets' deterministic planes (same PRNG, same
    seed) as SQL literals so the LSH path is value-checkable end-to-end."""
    import random
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)]
              for _ in range(num_planes)]
    rows = ",\n".join(
        f"({i}, [{', '.join(repr(x) for x in p)}]::DOUBLE[])"
        for i, p in enumerate(planes))
    return f"""
    WITH planes AS (SELECT * FROM (VALUES {rows}) AS t(p, v)),
    corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    buckets AS (
      SELECT vec_id, CAST(sum(CASE WHEN list_dot_product(c.e, pl.v) >= 0
                                   THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
      FROM corpus c, planes pl GROUP BY vec_id),
    q AS (SELECT c.vec_id AS query_id, c.e AS qe, b.bucket
          FROM corpus c JOIN buckets b USING (vec_id) WHERE c.vec_id < {nq}),
    cand AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(c.e, q.qe) AS cosine
      FROM corpus c JOIN buckets b ON c.vec_id = b.vec_id
      JOIN q ON b.bucket = q.bucket
      WHERE c.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(cosine, 6) DESC, neighbor_id ASC) AS rank
      FROM cand)
    SELECT query_id, neighbor_id, round(cosine, 4) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _zorder_sql(bits: int = 10) -> str:
    """The Morton interleave unrolled to shift/mask terms — identical
    algebra to operators/layout.py:zorder_key for 2 columns."""
    terms = []
    for i in range(bits):
        terms.append(f"(((x >> {i}) & 1) << {2 * i})")
        terms.append(f"(((y >> {i}) & 1) << {2 * i + 1})")
    z = " | ".join(terms)
    return f"""
            WITH d AS (SELECT l_orderkey * 8 + l_linenumber AS id,
                              (l_partkey % 1024)::BIGINT AS x,
                              (l_suppkey % 1024)::BIGINT AS y
                       FROM lineitem WHERE l_orderkey % 100 = 0)
            SELECT id, x, y, ({z})::BIGINT AS zkey FROM d
        """


def _pagerank_sql(iters: int = 10) -> str:
    """The pagerank recurrence unrolled into ``iters`` chained CTEs —
    term-for-term identical to operators/graph.py:pagerank (same damping
    base ``(1.0 - 0.85) / N``, same precomputed edge rate w/wout, same
    left-join-with-zero for rankless nodes)."""
    iter_ctes = ",\n".join(f"""
            r{i} AS (
              SELECT n.node, (1.0 - 0.85) / nn.c
                     + 0.85 * coalesce(s.c, 0) AS rank
              FROM n CROSS JOIN nn
              LEFT JOIN (SELECT rt.dst AS node,
                                sum(r{i - 1}.rank * rt.rate) AS c
                         FROM rt JOIN r{i - 1} ON rt.src = r{i - 1}.node
                         GROUP BY rt.dst) s ON s.node = n.node)"""
                          for i in range(1, iters + 1))
    return f"""
            WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
                        FROM lineitem),
            gs AS (SELECT g FROM li GROUP BY g HAVING count(*) <= 50),
            d AS (SELECT li.g, li.item FROM li JOIN gs USING (g)),
            e AS (SELECT a.item AS src, b.item AS dst,
                         count(*)::DOUBLE AS w
                  FROM d a JOIN d b ON a.g = b.g AND a.item != b.item
                  GROUP BY 1, 2),
            n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            nn AS (SELECT count(*)::DOUBLE AS c FROM n),
            od AS (SELECT src, sum(w) AS wout FROM e GROUP BY src),
            rt AS (SELECT e.src, e.dst, e.w / od.wout AS rate
                   FROM e JOIN od USING (src)),
            r0 AS (SELECT node, 1.0 / nn.c AS rank FROM n CROSS JOIN nn),
            {iter_ctes}
            SELECT node, round(rank, 4) AS pr FROM r{iters}
        """


def oracle_sql() -> dict[str, str]:
    return {
        "gtdb_majority_vote": """
            WITH votes AS (
              SELECT c_nationkey AS cluster_id, 'genus' AS rank_name,
                     CASE WHEN c_custkey % 10 = 0 THEN 'g__'
                          WHEN c_custkey % 10 <= 6
                            THEN 'g__Cluster' || CAST(c_nationkey % 7 AS VARCHAR)
                          ELSE 'g__' || c_mktsegment END AS taxon
              FROM customer
              UNION ALL
              SELECT c_nationkey, 'species',
                     CASE WHEN c_custkey % 3 = 0 THEN 's__'
                          ELSE 's__' || c_mktsegment || '_'
                               || CAST(c_custkey % 2 AS VARCHAR) END
              FROM customer),
            counts AS (
              SELECT cluster_id, rank_name, taxon, count(*) AS n,
                     length(taxon) > 3 AS named
              FROM votes GROUP BY 1, 2, 3),
            st AS (
              SELECT cluster_id, rank_name, taxon, n, named,
                     sum(n) OVER (PARTITION BY cluster_id, rank_name) AS total,
                     max(CASE WHEN named THEN n END)
                       OVER (PARTITION BY cluster_id, rank_name) AS nmax
              FROM counts)
            SELECT CAST(cluster_id AS BIGINT) AS cluster_id, rank_name,
                   CAST(max(total) AS BIGINT) AS n_votes,
                   CAST(max(nmax) AS BIGINT) AS top_named_count,
                   coalesce(
                     CASE WHEN 2 * max(nmax) >= max(total)
                           AND sum(CASE WHEN named AND n = nmax
                                        THEN 1 ELSE 0 END) = 1
                          THEN min(CASE WHEN named AND n = nmax
                                        THEN taxon END) END,
                     'none') AS mv_taxon
            FROM st GROUP BY cluster_id, rank_name
        """,
        "coverage_stats": """
            WITH ranked AS (
              SELECT l_suppkey AS contig, l_quantity AS depth,
                     row_number() OVER (PARTITION BY l_suppkey ORDER BY l_quantity) AS rn,
                     count(*) OVER (PARTITION BY l_suppkey) AS cnt
              FROM lineitem),
            t AS (SELECT *, floor(cnt * 0.05) AS cut FROM ranked)
            SELECT contig, round(avg(depth), 4) AS mean,
                   round(avg(CASE WHEN rn > cut AND rn <= cnt - cut THEN depth END), 4)
                     AS trimmed_mean,
                   round(var_samp(depth), 4) AS variance,
                   CAST(sum(CASE WHEN depth > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS covered_bases,
                   count(*) AS n_rows
            FROM t GROUP BY contig
        """,
        "separate_lineage": """
            SELECT c_custkey,
                   'd__' || r_name || ';p__' || n_name || ';c__' || c_mktsegment
                     AS lineage,
                   r_name AS kingdom, n_name AS phylum, c_mktsegment AS class_
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        "explode_csv": """
            SELECT o_orderkey,
                   unnest(string_split(o_orderstatus || ',' || o_orderpriority, ','))
                     AS items
            FROM orders
        """,
        "cross_join_audit": """
            WITH seg AS (SELECT DISTINCT c_mktsegment FROM customer),
            reg AS (SELECT DISTINCT r_name FROM region),
            actual AS (
              SELECT c_mktsegment, r_name, count(*) AS n
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE c_acctbal > 9900
              GROUP BY c_mktsegment, r_name)
            SELECT seg.c_mktsegment, reg.r_name,
                   coalesce(a.n, 0) AS n_present,
                   a.n IS NOT NULL AS present
            FROM seg CROSS JOIN reg
            LEFT JOIN actual a ON a.c_mktsegment = seg.c_mktsegment
                              AND a.r_name = reg.r_name
        """,
        "read_count_ladder": """
            WITH u AS (
              SELECT l_returnflag, 0 AS stage_order, 'raw' AS stage, count(*) AS n
              FROM lineitem GROUP BY l_returnflag
              UNION ALL
              SELECT l_returnflag, 1, 'shipped', count(*)
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              GROUP BY l_returnflag
              UNION ALL
              SELECT l_returnflag, 2, 'qty45', count(*)
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
                AND l_quantity < 45
              GROUP BY l_returnflag
              UNION ALL
              SELECT l_returnflag, 3, 'lowdisc', count(*)
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
                AND l_quantity < 45 AND l_discount > 0.01
              GROUP BY l_returnflag)
            SELECT l_returnflag, CAST(stage_order AS BIGINT) AS stage_order,
                   stage, n,
                   round(100.0 * n / lag(n) OVER (
                     PARTITION BY l_returnflag ORDER BY stage_order), 4)
                     AS pct_of_prev
            FROM u
        """,
        "kingdom_priority_lca": """
            WITH hits AS (
              SELECT l_orderkey, r_name, n_name,
                     CASE r_name WHEN 'ASIA' THEN 0 WHEN 'EUROPE' THEN 1
                                 WHEN 'AFRICA' THEN 2 ELSE 3 END AS prio
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey),
            b AS (SELECT l_orderkey, min(prio) AS bp FROM hits GROUP BY l_orderkey),
            f AS (SELECT h.* FROM hits h
                  JOIN b ON h.l_orderkey = b.l_orderkey AND h.prio = b.bp)
            SELECT l_orderkey,
                   CAST(CASE WHEN min(r_name) = max(r_name) THEN
                          CASE WHEN min(n_name) = max(n_name) THEN 2 ELSE 1 END
                        ELSE 0 END AS BIGINT) AS lca_depth,
                   CASE WHEN min(r_name) = max(r_name) THEN
                          CASE WHEN min(n_name) = max(n_name)
                               THEN min(n_name) ELSE min(r_name) END
                        ELSE 'root' END AS lca_name
            FROM f GROUP BY l_orderkey
        """,
        "union_missing_cols": """
            SELECT c_custkey AS id, c_name AS name, 'customer' AS kind,
                   round(c_acctbal, 4) AS acctbal
            FROM customer
            UNION ALL
            SELECT s_suppkey, s_name, 'supplier', CAST(NULL AS DOUBLE)
            FROM supplier
        """,
        "sequential_ids": """
            SELECT doc_id,
                   row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS new_id
            FROM documents
        """,
        "dna_reads_qc": """
            WITH reads AS (
              SELECT doc_id, regexp_replace(lower(text), '[^acgt]', '', 'g') AS seq
              FROM documents),
            f AS (SELECT * FROM reads
                  WHERE length(seq) >= 30
                    AND NOT regexp_matches(upper(seq), 'A{4,}|C{4,}|G{4,}|T{4,}'))
            SELECT doc_id, length(seq) AS seq_len,
                   round(length(regexp_replace(upper(seq), '[^GC]', '', 'g'))::DOUBLE
                         / greatest(length(seq), 1), 4) AS gc,
                   substr(reverse(translate(upper(seq), 'ACGTN', 'TGCAN')), 1, 10)
                     AS rc_prefix
            FROM f
        """,
        "asv_matrix": """
            SELECT source,
                   count(CASE WHEN lang = 'de' THEN 1 END) AS de,
                   count(CASE WHEN lang = 'en' THEN 1 END) AS en,
                   count(CASE WHEN lang = 'es' THEN 1 END) AS es,
                   count(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
                   count(CASE WHEN lang = 'zh' THEN 1 END) AS zh
            FROM documents GROUP BY source ORDER BY source
        """,
        "multimodal_features": """
            WITH ascii_docs AS (
              SELECT doc_id,
                     regexp_replace(text, '[^\\x20-\\x7e]', '', 'g') AS text
              FROM documents),
            chars AS (
              SELECT doc_id, (i - 1) % 8 AS k,
                     ascii(substr(text, i, 1))::DOUBLE AS v
              FROM ascii_docs,
                   LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) g),
            sums AS (SELECT doc_id, k, sum(v) AS s FROM chars GROUP BY doc_id, k),
            tot AS (SELECT doc_id, sum(s) AS t FROM sums GROUP BY doc_id)
            SELECT sums.doc_id AS media_id, CAST(k AS BIGINT) AS k,
                   round(s / greatest(t, 1), 4) AS feat
            FROM sums JOIN tot ON sums.doc_id = tot.doc_id
        """,
        "embedding_dups": """
            WITH corpus AS (
              SELECT vec_id, embedding::DOUBLE[] AS e
              FROM embeddings WHERE vec_id < 100
              UNION ALL
              SELECT vec_id + 10000, embedding::DOUBLE[]
              FROM embeddings WHERE vec_id < 100)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.e, b.e), 4) AS cosine
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.999
        """,
        "lsh_ann": _lsh_ann_sql(),
        "lsh_ann_multi": _lsh_ann_multi_sql(),
        "fasta_roundtrip": """
            SELECT doc_id, source, lang,
                   length(regexp_replace(lower(text), '[^acgt]', '', 'g')) AS seq_len
            FROM documents
        """,
        "fastq_roundtrip": """
            WITH reads AS (
              SELECT doc_id,
                     substr(regexp_replace(lower(text), '[^acgt]', '', 'g'), 1, 20)
                       AS seq
              FROM documents
              WHERE length(regexp_replace(lower(text), '[^acgt]', '', 'g')) >= 20),
            quals AS (
              SELECT doc_id,
                     (SELECT avg((doc_id + i + 1) % 40)
                      FROM generate_series(0, 19) AS g(i)) AS mq
              FROM reads)
            SELECT r.doc_id, length(r.seq)::BIGINT AS read_len,
                   round(length(regexp_replace(upper(r.seq), '[^GC]', '', 'g'))::DOUBLE
                         / greatest(length(r.seq), 1), 4) AS gc,
                   round(q.mq, 4) AS mean_qual
            FROM reads r JOIN quals q USING (doc_id)
        """,
        "temperature_sample": """
            WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
            tot AS (SELECT sum(pow(n, 0.5)) AS z, sum(n) AS N FROM c),
            f AS (SELECT lang,
                         least(1.0, tot.N * pow(c.n, 0.5) / (tot.z * c.n)) AS f
                  FROM c, tot)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN f USING (lang)
            WHERE CAST(concat('0x', substr(md5(concat('temp:',
                       CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 1000000
                  < CAST(round(f.f * 1000000) AS BIGINT)
        """,
        "split_contamination": f"""
            WITH corpus AS ({_DUP_CORPUS_SQL}),
            s AS (SELECT doc_id, text,
                         CASE WHEN b < 80 THEN 'train'
                              WHEN b < 90 THEN 'val' ELSE 'test' END AS split
                  FROM (SELECT doc_id, text,
                               CAST(concat('0x', substr(md5(concat('split:',
                                    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                                 % 100 AS b
                        FROM corpus)),
            w AS (SELECT doc_id, split,
                         list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x != '') AS ws
                  FROM s),
            g AS (SELECT doc_id, split,
                         unnest(list_distinct(list_transform(
                           generate_series(1, len(ws) - 7),
                           i -> array_to_string(list_slice(ws, i, i + 7), ' '))))
                           AS gram
                  FROM w WHERE len(ws) >= 8),
            train AS (SELECT DISTINCT gram FROM g WHERE split = 'train')
            SELECT g.doc_id, g.split, count(*)::BIGINT AS n_shared
            FROM g JOIN train USING (gram)
            WHERE g.split IN ('val', 'test')
            GROUP BY g.doc_id, g.split
        """,
        "interval_overlap": """
            WITH e AS (SELECT event_id AS error_id, user_id,
                              epoch_us(ts::TIMESTAMP) AS e_start,
                              epoch_us(ts::TIMESTAMP) + 600000000 AS e_end
                       FROM events WHERE event_type = 'error'),
                 p AS (SELECT event_id AS purchase_id, user_id,
                              epoch_us(ts::TIMESTAMP) AS p_start,
                              epoch_us(ts::TIMESTAMP) + 300000000 AS p_end
                       FROM events WHERE event_type = 'purchase')
            SELECT e.error_id, count(*)::BIGINT AS n_overlaps,
                   min(p.purchase_id) AS first_purchase_id
            FROM e JOIN p ON e.user_id = p.user_id
                         AND e.e_start <= p.p_end AND p.p_start <= e.e_end
            GROUP BY e.error_id
        """,
        "embedding_covariance": """
            WITH x AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
                              generate_subscripts(embedding, 1) - 1 AS dim
                       FROM embeddings),
            m AS (SELECT dim, avg(v) AS mu FROM x GROUP BY dim),
            c AS (SELECT x.vec_id, x.dim, x.v - m.mu AS cv
                  FROM x JOIN m USING (dim)),
            n AS (SELECT count(*)::DOUBLE AS cnt FROM embeddings)
            SELECT a.dim::BIGINT AS i, b.dim::BIGINT AS j,
                   -- + 0.0 normalizes IEEE signed zero: DuckDB round()
                   -- preserves -0.0 where Spark's HALF_UP yields +0.0; the
                   -- driver hashes rendered values, so "-0.0" != "0.0"
                   -- (VERDICT r5 #1: 128 near-zero cells at sf0.01).
                   round(sum(a.cv * b.cv) / (n.cnt - 1), 4) + 0.0 AS cov
            FROM c a JOIN c b ON a.vec_id = b.vec_id CROSS JOIN n
            GROUP BY a.dim, b.dim, n.cnt
        """,
        "sqlite_roundtrip": """
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources
            FROM documents WHERE doc_id < 50 GROUP BY lang
        """,
        "xlsx_roundtrip": """
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars
            FROM documents WHERE doc_id < 40 GROUP BY lang
        """,
        "quantize_embeddings": """
            WITH x AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
                              generate_subscripts(embedding, 1) - 1 AS dim
                       FROM embeddings),
            mm AS (SELECT dim, min(v) AS lo, max(v) AS hi
                   FROM x GROUP BY dim)
            SELECT x.vec_id, x.dim::BIGINT AS dim,
                   (CASE WHEN mm.hi = mm.lo THEN 0
                         ELSE round((x.v - mm.lo) / (mm.hi - mm.lo) * 255)
                    END)::BIGINT AS q
            FROM x JOIN mm USING (dim)
        """,
        "streaming_replay_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(count(l_quantity) AS BIGINT) AS n,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(min(l_quantity), 4) AS min_qty,
                   round(max(l_quantity), 4) AS max_qty,
                   round(sum(l_quantity) / count(l_quantity), 4) AS mean_qty,
                   CAST(3 AS BIGINT) AS n_batches
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "checkout_delta": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0 THEN 'assembly'
                          WHEN doc_id % 3 = 1 THEN 'mapping'
                          ELSE 'binning' END AS rule,
                     1700000000 + doc_id * 7 AS base_mt
              FROM documents),
            inv AS (
              SELECT 'data/omics/samp_' || CAST(doc_id AS VARCHAR)
                       || '/out_' || rule || '.txt' AS path,
                     rule,
                     CASE WHEN doc_id % 13 = 0 THEN NULL
                          ELSE base_mt END AS mtime
              FROM d
              UNION ALL
              SELECT 'scratch/tmp_' || CAST(doc_id AS VARCHAR) || '.txt',
                     rule, base_mt
              FROM d WHERE doc_id % 10 = 0),
            led AS (
              SELECT 'data/omics/samp_' || CAST(doc_id AS VARCHAR)
                       || '/out_' || rule || '.txt' AS relpath,
                     base_mt AS old FROM d WHERE doc_id % 4 = 0
              UNION ALL
              SELECT 'data/omics/samp_' || CAST(doc_id AS VARCHAR)
                       || '/out_' || rule || '.txt', base_mt - 500
              FROM d WHERE doc_id % 4 = 1
              UNION ALL
              SELECT 'data/omics/samp_' || CAST(doc_id AS VARCHAR)
                       || '/out_' || rule || '.txt', base_mt + 500
              FROM d WHERE doc_id % 8 = 6),
            commits AS (
              SELECT 1700000000 + i * 1000 AS ts,
                     'v1.' || CAST(i AS VARCHAR) AS version
              FROM (SELECT unnest(generate_series(0, 39)) AS i)),
            j AS (
              SELECT i.path, i.rule, i.mtime, l.old
              FROM inv i LEFT JOIN led l ON i.path = l.relpath),
            st AS (
              SELECT path, rule, mtime,
                     CASE WHEN path NOT LIKE 'data/%' THEN 'ignored'
                          WHEN mtime IS NULL THEN 'missing'
                          WHEN old IS NOT NULL AND mtime = old
                            THEN 'no_change'
                          WHEN old IS NOT NULL AND mtime < old
                            THEN 'regression'
                          ELSE 'new' END AS status
              FROM j)
            SELECT path AS relpath, rule, CAST(mtime AS BIGINT) AS mtime,
                   CASE WHEN status = 'new' THEN
                     (SELECT arg_max(version, ts) FROM commits c
                      WHERE c.ts <= st.mtime)
                   END AS version,
                   status
            FROM st
        """,
        "bpe_encode": """
            WITH toks AS (
              SELECT doc_id,
                     flatten(list_transform(
                       list_filter(string_split_regex(
                         lower(replace(text, chr(31), '')), '\\s+'),
                         w -> w <> ''),
                       x -> list_filter(string_split(replace(replace(replace(replace(replace(replace(replace(replace(regexp_replace(x, '(.)', '\\1', 'g') || '</w>', 'th', 'th'), 'the</w>', 'the</w>'), 'in', 'in'), 'an', 'an'), 'and</w>', 'and</w>'), 'er', 'er'), 'on', 'on'), 'ing</w>', 'ing</w>'), ''),
                                        s -> s <> ''))) AS bpe
              FROM documents)
            SELECT doc_id, CAST(len(bpe) AS BIGINT) AS n_bpe,
                   array_to_string(bpe[1:12], ' ') AS head_toks
            FROM toks
        """,
        "pq_ann": _pq_ann_sql(),
        "ivfpq_ann": _ivfpq_ann_sql(),
        "semdedup": _semdedup_sql(),
        "kmeans_lloyd": _kmeans_lloyd_sql(),
        "ann_recall": _ann_recall_sql(),
        "quality_classifier": _quality_classifier_sql(),
        "mixture_plan": """
            WITH c AS (SELECT lang, sum(n_chars)::DOUBLE AS n
                       FROM documents GROUP BY lang),
            p AS (SELECT 2.0 * (SELECT sum(n_chars) FROM documents) AS B),
            r1 AS (
              SELECT lang, n,
                     (pow(n, 0.5) / (SELECT sum(pow(n, 0.5)) FROM c))
                       * (SELECT B FROM p) / n AS e1
              FROM c),
            c1 AS (SELECT lang, n, e1 > 2.5 AS clip1 FROM r1),
            s AS (
              SELECT (SELECT B FROM p)
                       - coalesce(sum(CASE WHEN clip1 THEN 2.5 * n END), 0)
                       AS brem,
                     sum(CASE WHEN NOT clip1 THEN pow(n, 0.5) END) AS z2
              FROM c1),
            r2 AS (
              SELECT c1.lang, c1.n, c1.clip1,
                     CASE WHEN clip1 THEN 2.5
                          ELSE (pow(n, 0.5) / s.z2) * s.brem / n
                     END AS e2
              FROM c1, s)
            SELECT lang, n AS n_tokens, round(e2, 4) AS epochs,
                   round(e2 * n / (SELECT B FROM p), 4) AS share,
                   clip1 AS clipped
            FROM r2
        """,
        "incremental_curation": """
            WITH hist AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 100),
            new AS (
              SELECT doc_id + 10000 AS doc_id, text FROM documents
              WHERE doc_id < 50
              UNION ALL
              SELECT doc_id + 20000 AS doc_id, reverse(text) AS text
              FROM documents WHERE doc_id >= 50 AND doc_id < 100),
            pos AS (
              SELECT CAST(concat('0x', substr(md5(concat('bloom', g.h, ':',
                       text)), 1, 8)) AS BIGINT) % 4096 AS pos
              FROM hist, generate_series(0, 2) AS g(h)),
            words AS (SELECT CAST(pos // 32 AS INT) AS word,
                             bit_or(1::BIGINT << CAST(pos % 32 AS INT))
                               AS bits
                      FROM pos GROUP BY 1),
            probes AS (
              SELECT n.doc_id,
                     CAST(concat('0x', substr(md5(concat('bloom', g.h, ':',
                       n.text)), 1, 8)) AS BIGINT) % 4096 AS pos
              FROM new n, generate_series(0, 2) AS g(h)),
            gate AS (
              SELECT doc_id,
                     bool_and((coalesce(w.bits, 0)
                       & (1::BIGINT << CAST(p.pos % 32 AS INT))) <> 0)
                       AS maybe_seen
              FROM probes p
              LEFT JOIN words w ON CAST(p.pos // 32 AS INT) = w.word
              GROUP BY doc_id),
            corpus AS (SELECT * FROM hist UNION ALL SELECT * FROM new),
            grams AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       generate_series(1, greatest(length(text) - 3, 1)),
                       i -> substr(text, CAST(i AS INT), 4)))) AS s
              FROM corpus),
            sizes AS (SELECT doc_id, count(*) AS sz
                      FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM grams a JOIN grams b
                ON a.s = b.s AND a.doc_id < 10000 AND b.doc_id >= 10000
              GROUP BY a.doc_id, b.doc_id),
            j AS (
              SELECT id_a, id_b, i::DOUBLE / (sa.sz + sb.sz - i) AS jac
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b),
            dups AS (
              SELECT id_b AS doc_id, count(*)::BIGINT AS n_dups,
                     round(max(jac), 4) AS best_jaccard
              FROM j WHERE jac >= 0.9 GROUP BY id_b)
            SELECT n.doc_id, g.maybe_seen,
                   coalesce(d.n_dups, 0) AS n_dups, d.best_jaccard,
                   CASE WHEN coalesce(d.n_dups, 0) > 0 THEN 'dup'
                        WHEN g.maybe_seen THEN 'flagged_exact'
                        ELSE 'novel' END AS verdict
            FROM new n
            JOIN gate g USING (doc_id)
            LEFT JOIN dups d USING (doc_id)
        """,
        "minhash_incremental": f"""
            SELECT * FROM ({_jaccard_sql('''
                SELECT doc_id, text FROM documents WHERE doc_id < 100
                UNION ALL
                SELECT doc_id + 10000 AS doc_id, text FROM documents
                WHERE doc_id < 50
                UNION ALL
                SELECT doc_id + 20000 AS doc_id, reverse(text) AS text
                FROM documents WHERE doc_id >= 50 AND doc_id < 100
            ''', 0.9)}) x
            WHERE id_a < 10000 AND id_b >= 10000
        """,
        "hist_quantile": """
            WITH b AS (
              SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2),
            c AS (
              SELECT event_type, bin, n,
                     sum(n) OVER (PARTITION BY event_type
                                  ORDER BY bin) AS cum,
                     sum(n) OVER (PARTITION BY event_type) AS tot
              FROM b),
            g AS (SELECT c.*, q
                  FROM c, (SELECT unnest([0.5, 0.9, 0.99]) AS q))
            SELECT event_type, q,
                   round(bin * 10.0
                         + 10.0 * (q * tot - (cum - n)) / n, 4) AS est
            FROM g WHERE (cum - n) < q * tot AND cum >= q * tot
        """,
        "streaming_dedup": """
            SELECT user_id, event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(min(event_id % 3) AS BIGINT) AS first_batch,
                   CAST(3 AS BIGINT) AS n_batches
            FROM events
            GROUP BY user_id, event_type, day
        """,
        "bloom_novelty": """
            WITH pos AS (
              SELECT CAST(concat('0x', substr(md5(concat('bloom', g.h, ':',
                       CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                     % 1024 AS pos
              FROM documents, generate_series(0, 2) AS g(h)
              WHERE doc_id % 2 = 0),
            words AS (SELECT CAST(pos // 32 AS INT) AS word,
                             bit_or(1::BIGINT << CAST(pos % 32 AS INT))
                               AS bits
                      FROM pos GROUP BY 1),
            probes AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(concat('bloom', g.h, ':',
                       CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                     % 1024 AS pos
              FROM documents, generate_series(0, 2) AS g(h)
              WHERE doc_id % 2 = 1)
            SELECT p.doc_id,
                   bool_and((coalesce(w.bits, 0)
                             & (1::BIGINT << CAST(p.pos % 32 AS INT))) <> 0)
                     AS maybe_seen
            FROM probes p
            LEFT JOIN words w ON CAST(p.pos // 32 AS INT) = w.word
            GROUP BY p.doc_id
        """,
        "streaming_heavy_hitters": _streaming_heavy_hitters_sql(),
        "bm25_search": _bm25_search_sql(),
        "url_dedup": _url_dedup_sql(),
        "domain_blocklist": _domain_blocklist_sql(),
        "line_quality": _LINE_QUALITY_SQL,
        "streaming_late_data": _streaming_late_data_sql(),
        "rp_project": _rp_project_sql(),
        "web_curation": _web_curation_sql(),
        "phash_dedup": _PHASH_DEDUP_SQL,
        "compaction_plan": _COMPACTION_PLAN_SQL,
        "afp_dedup": _AFP_DEDUP_SQL,
        "wordpiece_encode": _wordpiece_sql(),
        "video_dedup": _VIDEO_DEDUP_SQL,
        "dataset_card": _DATASET_CARD_SQL,
        "versions_ledger": _versions_ledger_sql(),
        "streaming_drift_monitor": _streaming_drift_monitor_sql(),
        "streaming_attribution_join": """
            WITH v AS (SELECT user_id, event_id AS view_id, ts AS imp_ts
                       FROM events WHERE event_type = 'view'),
            p AS (SELECT user_id, event_id AS purchase_id, ts AS conv_ts
                  FROM events WHERE event_type = 'purchase'),
            j AS (SELECT p.purchase_id, v.view_id, v.imp_ts
                  FROM v JOIN p ON v.user_id = p.user_id
                   AND v.imp_ts <= p.conv_ts
                   AND v.imp_ts >= p.conv_ts - INTERVAL 1800 SECONDS)
            SELECT purchase_id, view_id, n_candidates,
                   CAST(3 AS BIGINT) AS n_batches FROM (
              SELECT purchase_id, view_id,
                     count(*) OVER (PARTITION BY purchase_id)::BIGINT
                       AS n_candidates,
                     row_number() OVER (PARTITION BY purchase_id
                                        ORDER BY imp_ts DESC, view_id DESC)
                       AS rn
              FROM j) t WHERE rn = 1
        """,
        "benchmark_ledger": """
            WITH d AS (SELECT doc_id FROM documents),
            base AS (
              SELECT CASE WHEN doc_id % 3 = 0 THEN 'assembly'
                          WHEN doc_id % 3 = 1 THEN 'mapping'
                          ELSE 'binning' END AS rule,
                     'samp_' || CAST(doc_id AS VARCHAR) AS sample,
                     doc_id,
                     1700000000 + doc_id * 7 AS ts,
                     CASE WHEN doc_id % 2 = 0 THEN 90000 + doc_id END
                         AS slurm_job,
                     ((doc_id * 13) % 997) / 10.0 + 1.0 AS s,
                     (((doc_id * 13) % 997) / 10.0 + 1.0) * 0.8 AS cpu_time,
                     (doc_id % 4000) / 4.0 AS max_rss
              FROM d WHERE doc_id % 5 <> 0),
            bm AS (
              SELECT rule, sample, ts, slurm_job, s, cpu_time, max_rss
              FROM base
              UNION ALL
              SELECT rule, sample, ts + 1000, slurm_job, s + 5.0,
                     cpu_time, max_rss
              FROM base WHERE doc_id % 7 = 0),
            newest AS (
              SELECT rule, sample, timestamp, slurm_job, s, cpu_time, max_rss
              FROM (
                SELECT rule, sample, ts AS timestamp, slurm_job, s,
                       cpu_time, max_rss,
                       row_number() OVER (PARTITION BY rule, sample
                                          ORDER BY ts DESC, slurm_job DESC)
                           AS rn
                FROM bm) WHERE rn = 1),
            blanks AS (
              SELECT CASE WHEN doc_id % 3 = 0 THEN 'assembly'
                          WHEN doc_id % 3 = 1 THEN 'mapping'
                          ELSE 'binning' END AS rule,
                     'samp_' || CAST(doc_id AS VARCHAR) AS sample,
                     CAST(NULL AS BIGINT) AS timestamp,
                     90000 + doc_id AS slurm_job,
                     CAST(NULL AS DOUBLE) AS s,
                     CAST(NULL AS DOUBLE) AS cpu_time,
                     CAST(NULL AS DOUBLE) AS max_rss
              FROM d WHERE doc_id % 10 = 0),
            ledger AS (
              SELECT * FROM newest UNION ALL SELECT * FROM blanks),
            acct AS (
              SELECT 90000 + doc_id AS job_id,
                     'node' || CAST(doc_id % 8 AS VARCHAR) AS node,
                     (doc_id % 600) + 10.0 AS elapsed_s,
                     ((doc_id % 600) + 10.0) * 2.0 AS total_cpu_s,
                     (doc_id % 1000 + 1) * 1048576 AS mem_bytes,
                     1700005000 + doc_id AS end_ts
              FROM d WHERE doc_id % 2 = 0)
            SELECT l.rule, l.sample,
                   CAST(l.slurm_job AS BIGINT) AS slurm_job,
                   coalesce(a.node, 'localhost') AS node,
                   CAST(coalesce(l.timestamp, a.end_ts) AS BIGINT)
                       AS timestamp,
                   round(coalesce(l.s, a.elapsed_s), 4) AS s,
                   round(coalesce(l.cpu_time, a.total_cpu_s), 4) AS cpu_time,
                   round(coalesce(l.max_rss,
                                  round(a.mem_bytes / 1048576.0, 2)), 4)
                       AS max_rss
            FROM ledger l LEFT JOIN acct a ON l.slurm_job = a.job_id
        """,
        "storage_reclaim": r"""
            WITH d AS (SELECT doc_id FROM documents),
            inter AS (
                SELECT printf('data/omics/metagenomes/samp_%d/assembly/megahit/intermediate_contigs/k%d.contigs.fa',
                              doc_id, k) AS path,
                       (doc_id * 31 + k * 7) % 9000 + 1000 AS file_size
                FROM d CROSS JOIN (VALUES (21), (33), (55)) kv(k)),
            fin AS (
                SELECT printf('data/omics/metagenomes/samp_%d/assembly/megahit/final.contigs.renamed.fa',
                              doc_id) AS path,
                       doc_id % 500 + 64 AS file_size
                FROM d WHERE doc_id % 3 <> 0),
            raw AS (
                SELECT printf('data/omics/metagenomes/samp_%d/reads/raw_%s_reads.fastq.gz',
                              doc_id, dirn) AS path,
                       (doc_id * 17) % 50000 + 5000 AS file_size
                FROM d CROSS JOIN (VALUES ('fwd'), ('rev')) dv(dirn)),
            dec AS (
                SELECT printf('data/omics/metagenomes/samp_%d/reads/decon_fwd_reads_fastp.fastq.gz',
                              doc_id) AS path,
                       doc_id % 300 + 32 AS file_size
                FROM d WHERE doc_id % 2 = 0),
            inv AS MATERIALIZED (
                SELECT * FROM inter UNION ALL SELECT * FROM fin
                UNION ALL SELECT * FROM raw UNION ALL SELECT * FROM dec),
            rules(rule, cand_re, art_re) AS (VALUES
                ('megahit_intermediate',
                 'data/omics/metagenomes/(samp_\d+)/assembly/megahit/intermediate_contigs/',
                 'data/omics/metagenomes/(samp_\d+)/assembly/megahit/final\.contigs\.renamed\.fa$'),
                ('raw_reads',
                 'data/omics/metagenomes/(samp_\d+)/reads/raw_(?:fwd|rev)_reads\.fastq\.gz$',
                 'data/omics/metagenomes/(samp_\d+)/reads/decon_fwd_reads_fastp\.fastq\.gz$')),
            cand AS (
                SELECT r.rule, regexp_extract(i.path, r.cand_re, 1) AS sample_id,
                       i.file_size
                FROM inv i CROSS JOIN rules r
                WHERE regexp_extract(i.path, r.cand_re, 1) <> ''),
            agg AS (
                SELECT rule, sample_id, CAST(count(*) AS BIGINT) AS n_files,
                       CAST(sum(file_size) AS BIGINT) AS bytes
                FROM cand GROUP BY rule, sample_id),
            art AS (
                SELECT DISTINCT r.rule,
                       regexp_extract(i.path, r.art_re, 1) AS sample_id
                FROM inv i CROSS JOIN rules r
                WHERE regexp_extract(i.path, r.art_re, 1) <> '')
            SELECT a.rule, a.sample_id, a.n_files, a.bytes,
                   (x.sample_id IS NOT NULL) AS eligible
            FROM agg a LEFT JOIN art x
              ON a.rule = x.rule AND a.sample_id = x.sample_id
        """,
        "attribution_join": """
            WITH v AS (SELECT user_id, event_id AS view_id, ts AS imp_ts
                       FROM events WHERE event_type = 'view'),
            p AS (SELECT user_id, event_id AS purchase_id, ts AS conv_ts
                  FROM events WHERE event_type = 'purchase'),
            j AS (SELECT p.purchase_id, v.view_id, v.imp_ts
                  FROM v JOIN p ON v.user_id = p.user_id
                   AND v.imp_ts <= p.conv_ts
                   AND v.imp_ts >= p.conv_ts - INTERVAL 1800 SECONDS)
            SELECT purchase_id, view_id, n_candidates FROM (
              SELECT purchase_id, view_id,
                     count(*) OVER (PARTITION BY purchase_id)::BIGINT
                       AS n_candidates,
                     row_number() OVER (PARTITION BY purchase_id
                                        ORDER BY imp_ts DESC, view_id DESC)
                       AS rn
              FROM j) t WHERE rn = 1
        """,
        "data_quality": """
            WITH r AS (
              SELECT 'orders.o_custkey.not_null' AS chk,
                     count(CASE WHEN o_custkey IS NULL THEN 1 END)::BIGINT
                       AS violations FROM orders
              UNION ALL
              SELECT 'orders.o_orderkey.unique',
                     (count(o_orderkey)
                      - count(DISTINCT o_orderkey))::BIGINT FROM orders
              UNION ALL
              SELECT 'orders.o_orderstatus.accepted',
                     count(CASE WHEN o_orderstatus IS NOT NULL
                                AND o_orderstatus NOT IN ('O', 'F', 'P')
                           THEN 1 END)::BIGINT FROM orders
              UNION ALL
              SELECT 'orders.o_totalprice.in_range',
                     count(CASE WHEN o_totalprice < 0
                                OR o_totalprice > 1000000000
                           THEN 1 END)::BIGINT FROM orders
              UNION ALL
              SELECT 'lineitem.l_orderkey.not_null',
                     count(CASE WHEN l_orderkey IS NULL THEN 1 END)::BIGINT
                FROM lineitem
              UNION ALL
              SELECT 'lineitem.l_discount.in_range',
                     count(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
                           THEN 1 END)::BIGINT FROM lineitem
              UNION ALL
              SELECT 'lineitem.l_quantity.in_range',
                     count(CASE WHEN l_quantity < 1 OR l_quantity > 50
                           THEN 1 END)::BIGINT FROM lineitem
              UNION ALL
              SELECT 'orders->customer.referential',
                     count(*)::BIGINT FROM orders o
               WHERE o.o_custkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)
              UNION ALL
              SELECT 'lineitem->orders.referential',
                     count(*)::BIGINT FROM lineitem l
               WHERE l.l_orderkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
            SELECT chk AS "check", violations,
                   violations = 0 AS passed
            FROM r
        """,
        "pagerank": _pagerank_sql(10),
        "scd2_history": """
            WITH l AS (
              SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
                     CASE WHEN o_orderstatus IS DISTINCT FROM
                               lag(o_orderstatus) OVER (
                                 PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey)
                          THEN 1 ELSE 0 END AS chg
              FROM orders),
            v AS (
              SELECT o_custkey, o_orderstatus, o_orderdate,
                     sum(chg) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS version
              FROM l),
            runs AS (
              SELECT o_custkey, version, o_orderstatus,
                     min(o_orderdate) AS valid_from,
                     count(*)::BIGINT AS n_events
              FROM v GROUP BY 1, 2, 3)
            SELECT o_custkey, version::BIGINT AS version, o_orderstatus,
                   valid_from,
                   lead(valid_from) OVER (PARTITION BY o_custkey
                                          ORDER BY version) AS valid_to,
                   n_events
            FROM runs
        """,
        "event_transitions": """
            WITH l AS (SELECT user_id, event_type,
                              lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
                       FROM events),
            c AS (SELECT event_type AS state_from, nxt AS state_to,
                         count(*)::BIGINT AS n
                  FROM l WHERE nxt IS NOT NULL GROUP BY 1, 2)
            SELECT state_from, state_to, n,
                   round(n::DOUBLE / sum(n) OVER (PARTITION BY state_from), 4)
                     AS prob
            FROM c
        """,
        "chunk_documents": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'),
                                 x -> x != '') AS t
              FROM documents),
            st AS (SELECT doc_id, t,
                          unnest(range(0, greatest(len(t), 1), 8)) AS s
                   FROM toks WHERE len(t) > 0)
            SELECT doc_id, (s / 8)::BIGINT AS chunk_id,
                   array_to_string(t[s + 1 : s + 16], ' ') AS chunk_text,
                   least(16, len(t) - s)::BIGINT AS n_tokens
            FROM st
        """,
        "gaps_islands": """
            WITH d AS (SELECT DISTINCT o_custkey,
                              CAST(o_orderdate AS DATE) AS d
                       FROM orders),
            r AS (SELECT o_custkey, d,
                         d - CAST(row_number() OVER (PARTITION BY o_custkey
                                                     ORDER BY d) AS INTEGER)
                           AS isl
                  FROM d)
            SELECT o_custkey, min(d) AS run_start, max(d) AS run_end,
                   count(*)::BIGINT AS n_days
            FROM r GROUP BY o_custkey, isl
            HAVING count(*) >= 2
        """,
        "ntile_buckets": """
            WITH b AS (SELECT o_orderstatus, o_totalprice,
                              ntile(4) OVER (PARTITION BY o_orderstatus
                                             ORDER BY o_totalprice,
                                                      o_orderkey) AS bucket
                       FROM orders)
            SELECT o_orderstatus, bucket::BIGINT AS bucket,
                   count(*)::BIGINT AS n,
                   round(min(o_totalprice), 4) AS lo,
                   round(max(o_totalprice), 4) AS hi
            FROM b GROUP BY 1, 2
        """,
        "group_percentiles": """
            WITH q AS (SELECT o_orderstatus,
                              quantile_cont(o_totalprice, 0.25) AS p25,
                              quantile_cont(o_totalprice, 0.50) AS p50,
                              quantile_cont(o_totalprice, 0.75) AS p75
                       FROM orders GROUP BY o_orderstatus)
            SELECT o_orderstatus, 25::BIGINT AS pct,
                   round(p25, 4) AS value FROM q
            UNION ALL
            SELECT o_orderstatus, 50, round(p50, 4) FROM q
            UNION ALL
            SELECT o_orderstatus, 75, round(p75, 4) FROM q
        """,
        "incremental_agg": """
            WITH d AS (SELECT l_returnflag AS grp,
                              CAST(l_extendedprice AS DECIMAL(18,4)) AS v
                       FROM lineitem)
            SELECT grp, count(v)::BIGINT AS n,
                   round(CAST(sum(v) AS DOUBLE), 4) AS total,
                   round(CAST(min(v) AS DOUBLE), 4) AS min_v,
                   round(CAST(max(v) AS DOUBLE), 4) AS max_v,
                   round(CAST(sum(v) AS DOUBLE) / count(v), 4) AS mean_v
            FROM d GROUP BY grp
        """,
        "interval_subtract": """
            WITH a AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS s,
                              epoch_us(ts::TIMESTAMP) + 300000000 AS e
                       FROM events WHERE event_type = 'purchase'),
            b AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS s,
                         epoch_us(ts::TIMESTAMP) + 600000000 AS e
                  FROM events WHERE event_type = 'error'),
            d AS (SELECT user_id, s AS pos, 1 AS da, 0 AS db FROM a
                  UNION ALL SELECT user_id, e, -1, 0 FROM a
                  UNION ALL SELECT user_id, s, 0, 1 FROM b
                  UNION ALL SELECT user_id, e, 0, -1 FROM b),
            c AS (SELECT user_id, pos, sum(da) AS da, sum(db) AS db
                  FROM d GROUP BY 1, 2),
            sw AS (SELECT user_id, pos,
                          sum(da) OVER w AS depth_a,
                          sum(db) OVER w AS depth_b,
                          lead(pos) OVER (PARTITION BY user_id
                                          ORDER BY pos) AS seg_end
                   FROM c
                   WINDOW w AS (PARTITION BY user_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)),
            f AS (SELECT user_id, pos, seg_end,
                         (depth_a > 0 AND depth_b = 0) AS live
                  FROM sw WHERE seg_end IS NOT NULL),
            g AS (SELECT user_id, pos, seg_end, live,
                         CASE WHEN live AND NOT coalesce(
                                lag(live) OVER (PARTITION BY user_id
                                                ORDER BY pos), FALSE)
                              THEN 1 ELSE 0 END AS new
                  FROM f),
            h AS (SELECT user_id, pos, seg_end, live,
                         sum(new) OVER (PARTITION BY user_id ORDER BY pos
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS span
                  FROM g)
            SELECT user_id, min(pos) AS sub_start, max(seg_end) AS sub_end
            FROM h WHERE live GROUP BY user_id, span
        """,
        "fuzzy_name_pairs": """
            SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
                   a.s_name AS text_a, b.s_name AS text_b,
                   levenshtein(a.s_name, b.s_name)::INT AS dist
            FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
            WHERE levenshtein(a.s_name, b.s_name) <= 1
        """,
        "enrichment_2x2": """
            WITH m AS (SELECT DISTINCT l.l_orderkey AS grp,
                              p.p_brand AS term
                       FROM lineitem l JOIN part p
                         ON l.l_partkey = p.p_partkey),
            fl AS (SELECT o_orderkey AS grp,
                          o_orderpriority = '1-URGENT' AS flag
                   FROM orders),
            tot AS (SELECT count(*)::DOUBLE AS ng,
                           sum(CASE WHEN flag THEN 1 ELSE 0 END)::DOUBLE
                             AS nf
                    FROM fl),
            per AS (SELECT m.term,
                           sum(CASE WHEN fl.flag THEN 1 ELSE 0 END)::DOUBLE
                             AS k,
                           count(*)::DOUBLE AS mm
                    FROM m JOIN fl USING (grp)
                    GROUP BY m.term)
            SELECT term,
                   k::BIGINT AS n11,
                   (nf - k)::BIGINT AS n10,
                   (mm - k)::BIGINT AS n01,
                   (ng - nf - mm + k)::BIGINT AS n00,
                   CASE WHEN (nf - k) * (mm - k) > 0 THEN
                     round(k * (ng - nf - mm + k)
                           / ((nf - k) * (mm - k)), 4) END AS odds_ratio,
                   CASE WHEN nf > 0 AND mm > 0 THEN
                     round((k / nf) / (mm / ng), 4) END AS fold_enrichment
            FROM per CROSS JOIN tot
        """,
        "rank_sum_test": """
            WITH d AS (SELECT l_partkey % 100 AS taxon,
                              l_returnflag AS grp,
                              CAST(l_quantity AS DOUBLE) AS v
                       FROM lineitem WHERE l_returnflag IN ('A', 'R')),
            r AS (SELECT taxon, grp, v,
                         rank() OVER (PARTITION BY taxon ORDER BY v) AS rk,
                         count(*) OVER (PARTITION BY taxon, v) AS ne
                  FROM d),
            m AS (SELECT taxon, grp, rk + (ne - 1) / 2.0 AS mid FROM r),
            a AS (SELECT taxon,
                         sum(CASE WHEN grp = 'A' THEN mid END) AS r1,
                         sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END)::DOUBLE
                           AS n1,
                         sum(CASE WHEN grp <> 'A' THEN 1 ELSE 0 END)::DOUBLE
                           AS n2
                  FROM m GROUP BY taxon)
            SELECT taxon::BIGINT AS taxon, n1::BIGINT AS n1,
                   n2::BIGINT AS n2,
                   round(r1 - n1 * (n1 + 1) / 2.0, 4) AS u_stat,
                   CASE WHEN n1 > 0 AND n2 > 0 THEN
                     round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                           / sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0), 4)
                   END AS z_score
            FROM a
        """,
        "bh_fdr": """
            WITH e AS (SELECT event_id, value FROM events
                       WHERE event_type = 'error'),
            p AS (SELECT event_id,
                         percent_rank() OVER (ORDER BY value, event_id) AS p
                  FROM e),
            r AS (SELECT event_id, p,
                         row_number() OVER (ORDER BY p, event_id) AS rk,
                         count(*) OVER () AS n
                  FROM p),
            adj AS (SELECT event_id, p,
                           min(p * n / rk) OVER (ORDER BY rk DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS pa
                    FROM r)
            SELECT event_id, round(p, 4) AS p,
                   round(least(1.0, pa), 4) AS p_adj
            FROM adj
        """,
        "zorder_key": _zorder_sql(10),
        "clr_transform": """
            WITH c AS (SELECT l_returnflag AS sample, l_partkey AS taxon,
                              CAST(sum(l_quantity) AS DOUBLE) AS cnt
                       FROM lineitem GROUP BY 1, 2),
            m AS (SELECT sample, avg(ln(cnt)) AS mlog
                  FROM c WHERE cnt > 0 GROUP BY 1)
            SELECT c.sample, c.taxon, round(ln(cnt) - m.mlog, 4) AS clr
            FROM c JOIN m USING (sample) WHERE c.cnt > 0
        """,
        "deseq_size_factors": """
            WITH c AS (SELECT l_returnflag AS sample, l_partkey AS taxon,
                              CAST(sum(l_quantity) AS DOUBLE) AS cnt
                       FROM lineitem GROUP BY 1, 2),
            tot AS (SELECT count(DISTINCT sample)::BIGINT AS ns FROM c),
            g AS (SELECT taxon, count(*) AS n, exp(avg(ln(cnt))) AS gm
                  FROM c WHERE cnt > 0 GROUP BY taxon),
            p AS (SELECT g.taxon, g.gm FROM g, tot WHERE g.n = tot.ns)
            SELECT c.sample,
                   round(quantile_cont(c.cnt / p.gm, 0.5), 4) AS size_factor
            FROM c JOIN p USING (taxon)
            GROUP BY c.sample
        """,
        "quantile_normalize": """
            WITH d AS (SELECT l_returnflag AS grp,
                              l_orderkey * 8 + l_linenumber AS id,
                              CAST(l_quantity AS DOUBLE) AS v
                       FROM lineitem WHERE l_orderkey % 50 = 0),
            r AS (SELECT grp, id, v,
                         row_number() OVER (PARTITION BY grp
                                            ORDER BY v, id) AS rk
                  FROM d),
            m AS (SELECT rk, avg(v) AS qm FROM r GROUP BY rk)
            SELECT r.grp, r.id, round(r.v, 4) AS v,
                   round(m.qm, 4) AS qnorm
            FROM r JOIN m USING (rk)
        """,
        "basket_rules": """
            WITH bk AS (SELECT DISTINCT l_orderkey AS basket,
                               p.p_brand AS item
                        FROM lineitem l JOIN part p
                          ON l.l_partkey = p.p_partkey),
            pairs AS (SELECT a.item AS antecedent, b.item AS consequent,
                             count(*)::DOUBLE AS w
                      FROM bk a JOIN bk b
                        ON a.basket = b.basket AND a.item != b.item
                      GROUP BY 1, 2
                      HAVING count(*) >= 5),
            items AS (SELECT item, count(*)::DOUBLE AS cnt
                      FROM bk GROUP BY item),
            tot AS (SELECT count(DISTINCT basket)::DOUBLE AS n FROM bk)
            SELECT p.antecedent, p.consequent, p.w::BIGINT AS pair_count,
                   round(p.w / t.n, 4) AS support,
                   round(p.w / a.cnt, 4) AS confidence,
                   round(p.w * t.n / (a.cnt * b.cnt), 4) AS lift
            FROM pairs p
            JOIN items a ON a.item = p.antecedent
            JOIN items b ON b.item = p.consequent
            CROSS JOIN tot t
        """,
        "bitset_semi_join": """
            SELECT l_returnflag, count(*)::BIGINT AS n,
                   round(sum(l_extendedprice), 4) AS revenue
            FROM lineitem l
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey
                            AND o.o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag
        """,
        "cube_report": """
            SELECT coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   grouping(o_orderstatus, o_orderpriority)::BIGINT AS gid,
                   count(*)::BIGINT AS n,
                   round(sum(o_totalprice), 4) AS total
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "mixture_sample": """
            WITH t AS (SELECT lang, tgt::DOUBLE AS tgt
                       FROM (VALUES ('en', 0.4), ('zh', 0.3),
                                    ('de', 0.3)) v(lang, tgt)),
            c AS (SELECT lang, count(*)::DOUBLE AS n
                  FROM documents GROUP BY lang),
            j AS (SELECT c.lang, c.n, t.tgt FROM c JOIN t USING (lang)),
            sc AS (SELECT min(n / tgt) AS cc FROM j),
            f AS (SELECT lang, least(1.0, sc.cc * tgt / n) AS frac
                  FROM j, sc)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN f USING (lang)
            WHERE CAST(concat('0x', substr(md5(concat('mix:',
                    CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 1000000
                  < round(f.frac * 1000000)
        """,
        "fuzzy_resolve": """
            WITH d AS (SELECT s_suppkey AS sid,
                              substring(s_name, 1, length(s_name) - 1)
                                AS name
                       FROM supplier),
            c AS (SELECT DISTINCT s_name AS cn FROM supplier)
            SELECT d.sid, d.name, r.cn AS resolved,
                   r.dist::INT AS resolve_dist
            FROM d LEFT JOIN LATERAL (
              SELECT cn, levenshtein(d.name, cn) AS dist
              FROM c WHERE levenshtein(d.name, cn) <= 1
              ORDER BY dist, cn LIMIT 1) r ON TRUE
        """,
        "weighted_sample": """
            WITH d AS (SELECT l_returnflag AS grp,
                              l_orderkey * 8 + l_linenumber AS id,
                              CAST(l_quantity AS DOUBLE) AS w
                       FROM lineitem WHERE l_quantity > 0),
            s AS (SELECT grp, id, w,
                         -ln((CAST(concat('0x', substr(md5(concat('wsample:',
                             CAST(id AS VARCHAR))), 1, 8)) AS BIGINT)
                             % 1048576 + 0.5) / 1048576.0) / w AS es
                  FROM d),
            r AS (SELECT grp, id, w, es,
                         row_number() OVER (PARTITION BY grp
                                            ORDER BY es, id) AS rn
                  FROM s)
            SELECT grp, id, round(w, 4) AS weight, round(es, 4) AS es_score
            FROM r WHERE rn <= 20
        """,
        "interval_merge": """
            WITH iv AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS s,
                               epoch_us(ts::TIMESTAMP) + 300000000 AS e
                        FROM events WHERE event_type = 'purchase'),
            m AS (SELECT user_id, s, e,
                         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pm
                  FROM iv),
            isl AS (SELECT user_id, s, e,
                           sum(CASE WHEN pm IS NULL OR s > pm
                                    THEN 1 ELSE 0 END)
                             OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS island
                    FROM m)
            SELECT user_id, min(s) AS merged_start, max(e) AS merged_end,
                   count(*)::BIGINT AS n_merged
            FROM isl GROUP BY user_id, island
        """,
        "genome_coverage": """
            WITH iv AS (SELECT event_type AS contig,
                               epoch_us(ts::TIMESTAMP) AS s,
                               epoch_us(ts::TIMESTAMP) + 600000000 AS e
                        FROM events),
            d AS (SELECT contig, s AS pos, 1 AS delta FROM iv
                  UNION ALL SELECT contig, e, -1 FROM iv),
            c AS (SELECT contig, pos, sum(delta) AS delta
                  FROM d GROUP BY 1, 2),
            sw AS (SELECT contig, pos,
                          sum(delta) OVER (PARTITION BY contig ORDER BY pos
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS depth,
                          lead(pos) OVER (PARTITION BY contig
                                          ORDER BY pos) AS seg_end
                   FROM c)
            SELECT contig, depth::BIGINT AS depth,
                   sum(seg_end - pos)::BIGINT AS bases
            FROM sw WHERE depth > 0 AND seg_end IS NOT NULL
            GROUP BY contig, depth
        """,
        "nearest_feature": """
            WITH p AS (SELECT user_id, event_id AS error_id,
                              epoch_us(ts::TIMESTAMP) AS pos
                       FROM events WHERE event_type = 'error'),
            f AS (SELECT user_id, event_id AS fid,
                         epoch_us(ts::TIMESTAMP) AS fpos
                  FROM events WHERE event_type = 'purchase')
            SELECT p.user_id, p.error_id, n.fid AS nearest_id,
                   n.dist AS distance
            FROM p, LATERAL (
              SELECT f.fid, abs(f.fpos - p.pos)::BIGINT AS dist
              FROM f WHERE f.user_id = p.user_id
              ORDER BY abs(f.fpos - p.pos), f.fid LIMIT 1) n
        """,
        "doc_lm_score": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x != '')) AS token
              FROM documents),
            vocab AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
            tot AS (SELECT sum(c) AS t FROM vocab),
            lp AS (SELECT token, ln(c::DOUBLE / t) AS logp FROM vocab, tot)
            SELECT doc_id, round(avg(logp), 4) AS lm_score,
                   count(*)::BIGINT AS n_tokens
            FROM toks JOIN lp USING (token) GROUP BY doc_id
        """,
        "text_repetition": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x != '') AS ws
              FROM documents),
            b AS (
              SELECT doc_id, ws, len(ws) AS n,
                     CASE WHEN len(ws) >= 2 THEN
                       list_transform(generate_series(1, len(ws) - 1),
                                      i -> ws[i] || ' ' || ws[i + 1])
                     ELSE [] END AS bg
              FROM w)
            SELECT doc_id,
                   round(CASE WHEN n <= 0 THEN 0.0
                         ELSE 1.0 - len(list_distinct(ws))::DOUBLE / n END, 4)
                     AS dup_word_frac,
                   round(CASE WHEN len(bg) <= 0 THEN 0.0
                         ELSE 1.0 - len(list_distinct(bg))::DOUBLE / len(bg) END, 4)
                     AS dup_bigram_frac,
                   round(CASE WHEN len(bg) <= 0 THEN 0.0
                         ELSE list_max(list_transform(list_distinct(bg),
                                d -> len(list_filter(bg, x -> x = d))))::DOUBLE
                              / len(bg) END, 4) AS top_bigram_frac
            FROM b
        """,
        "pii_scrub": """
            WITH seeded AS (
              SELECT doc_id,
                     text || ' contact doc' || doc_id ||
                     '@example.com via https://ex.com/d/' || doc_id ||
                     ' or +1 555-000-' || doc_id AS t
              FROM documents)
            , staged AS (
              SELECT doc_id, t,
                     regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
              FROM seeded),
            staged2 AS (
              SELECT doc_id, t, t1,
                     regexp_replace(t1, 'https?://[^\\s]+', '<URL>', 'g') AS t2
              FROM staged)
            SELECT doc_id,
                   len(regexp_extract_all(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT
                     AS n_emails,
                   len(regexp_extract_all(t1, 'https?://[^\\s]+'))::BIGINT AS n_urls,
                   len(regexp_extract_all(t2, '\\+?[0-9][0-9() \\-]{6,}[0-9]'))::BIGINT
                     AS n_phones,
                   regexp_replace(t2, '\\+?[0-9][0-9() \\-]{6,}[0-9]',
                                  '<PHONE>', 'g') AS clean_text
            FROM staged2
        """,
        "quality_window_trim": """
            WITH reads AS (
              SELECT doc_id,
                     substr(regexp_replace(lower(text), '[^acgt]', '', 'g'), 1, 20)
                       AS seq
              FROM documents
              WHERE length(regexp_replace(lower(text), '[^acgt]', '', 'g')) >= 20),
            ph AS (
              SELECT doc_id, seq,
                     list_transform(generate_series(0, 19),
                                    i -> (doc_id + i + 1) % 40) AS p
              FROM reads),
            fr AS (
              SELECT *, coalesce(
                  list_filter(generate_series(0, 19),
                    i -> list_aggregate(
                           list_slice(p, i + 1, least(i + 4, 20)), 'avg') >= 20)[1],
                  20) AS front
              FROM ph),
            tl AS (
              SELECT *, coalesce(
                  list_filter(generate_series(1, 20),
                    j -> j > front AND list_aggregate(
                           list_slice(p, greatest(j - 3, 1), j), 'avg') >= 20)[-1],
                  front) AS tail
              FROM fr),
            cx AS (
              SELECT *,
                     100.0 * list_sum(list_transform(generate_series(1, 19),
                       i -> CASE WHEN substr(seq, i, 1) != substr(seq, i + 1, 1)
                                 THEN 1 ELSE 0 END)) / 19 AS complexity
              FROM tl)
            SELECT doc_id, front::BIGINT AS front_cut,
                   (20 - tail)::BIGINT AS tail_cut,
                   (tail - front)::BIGINT AS trimmed_len,
                   substr(seq, front + 1, tail - front) AS trimmed_seq,
                   round(complexity, 4) AS complexity
            FROM cx WHERE complexity >= 7.0
        """,
        "xml_extract": """
            SELECT o_orderkey, o_orderstatus AS status, o_orderpriority AS prio
            FROM orders
        """,
        "quality_bands": """
            SELECT c_mktsegment,
                   CASE WHEN c_acctbal > 7500 THEN 'High'
                        WHEN c_acctbal > 2500 THEN 'Medium'
                        ELSE 'Low' END AS band,
                   count(*) AS n, round(avg(c_acctbal), 4) AS avg_acctbal
            FROM customer GROUP BY 1, 2
        """,
        "distinct_catalog": """
            SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
                   count(*) AS n_orders
            FROM orders GROUP BY o_orderpriority
        """,
        "na_handling": """
            SELECT coalesce(CASE WHEN lang IN ('zh', 'und') THEN NULL
                                 ELSE lang END, 'unknown') AS lang_clean,
                   count(*) AS n
            FROM documents GROUP BY 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "topk_revenue": """
            WITH rev AS (
              SELECT l_orderkey,
                     round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
              FROM lineitem GROUP BY l_orderkey)
            SELECT o_orderkey, o_orderpriority, revenue
            FROM rev JOIN orders ON l_orderkey = o_orderkey
            ORDER BY revenue DESC, o_orderkey ASC
            LIMIT 10
        """,
        "rel_abund": """
            WITH n AS (
              SELECT o_orderpriority, l_returnflag, sum(l_quantity) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority, l_returnflag)
            SELECT o_orderpriority, l_returnflag, round(n, 4) AS n,
                   round(n / sum(n) OVER (PARTITION BY o_orderpriority), 4) AS rel_abund
            FROM n
        """,
        "tpm": """
            WITH n AS (
              SELECT o_orderpriority, l_partkey, sum(l_quantity) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority, l_partkey),
            withlen AS (
              SELECT o_orderpriority, l_partkey, n, p_size
              FROM n JOIN part ON l_partkey = p_partkey),
            t AS (
              SELECT o_orderpriority, l_partkey,
                     round(1e6 * (n / p_size) /
                           sum(n / p_size) OVER (PARTITION BY o_orderpriority), 4) AS tpm
              FROM withlen)
            SELECT * FROM t WHERE l_partkey < 200
        """,
        "rpkm": """
            WITH n AS (
              SELECT o_orderpriority, l_partkey, sum(l_quantity) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority, l_partkey),
            withlen AS (
              SELECT o_orderpriority, l_partkey, n, p_size
              FROM n JOIN part ON l_partkey = p_partkey),
            t AS (
              SELECT o_orderpriority, l_partkey,
                     round(n * 1e9 / (sum(n) OVER (PARTITION BY o_orderpriority) * p_size),
                           4) AS rpkm
              FROM withlen)
            SELECT * FROM t WHERE l_partkey < 200
        """,
        "top1_per_group": """
            SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS best_price
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY l_orderkey
                    ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
                  FROM lineitem)
            WHERE rn = 1
        """,
        "tie_discard_top1": """
            SELECT l_orderkey, l_linenumber, round(l_quantity, 4) AS best_qty
            FROM (SELECT *,
                    rank() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS rk,
                    count(*) OVER (PARTITION BY l_orderkey, l_quantity) AS nt
                  FROM lineitem)
            WHERE rk = 1 AND nt = 1
        """,
        "retention_ladder": """
            WITH daily AS (
              SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
              FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d'))
            SELECT event_type, day, n,
                   round(100.0 * n / lag(n) OVER (
                     PARTITION BY event_type ORDER BY day), 4) AS pct_of_prev
            FROM daily
        """,
        "anvio_stacked": """
            WITH hits AS (
              SELECT l_orderkey AS gene, l_partkey AS hit,
                     l_extendedprice AS score, p_retailprice AS thrshld,
                     l_discount AS e_value
              FROM lineitem JOIN part ON l_partkey = p_partkey),
            step1 AS (
              SELECT * FROM hits WHERE score > 0.5 * thrshld AND e_value < 0.06),
            step2 AS (
              SELECT * FROM (
                SELECT *, count(*) OVER (PARTITION BY gene) AS n_hits FROM step1)
              WHERE n_hits = 1 OR score >= thrshld),
            step3 AS (
              SELECT * FROM (
                SELECT *, rank() OVER (PARTITION BY gene ORDER BY score DESC) AS rk
                FROM step2)
              WHERE rk = 1),
            step4 AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY gene ORDER BY thrshld DESC, score DESC, hit) AS rn
                FROM step3)
              WHERE rn = 1)
            SELECT gene, hit, round(score, 4) AS score, round(thrshld, 4) AS thrshld
            FROM step4
        """,
        "pivot_wider": """
            SELECT c_mktsegment,
                   count(CASE WHEN r_name = 'AFRICA' THEN 1 END) AS "AFRICA",
                   count(CASE WHEN r_name = 'AMERICA' THEN 1 END) AS "AMERICA",
                   count(CASE WHEN r_name = 'ASIA' THEN 1 END) AS "ASIA",
                   count(CASE WHEN r_name = 'EUROPE' THEN 1 END) AS "EUROPE",
                   count(CASE WHEN r_name = 'MIDDLE EAST' THEN 1 END) AS "MIDDLE EAST"
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment
        """,
        "binner_completion": """
            SELECT o_custkey,
                   count(CASE WHEN o_orderstatus = 'F' THEN 1 END) > 0 AS has_F,
                   count(CASE WHEN o_orderstatus = 'O' THEN 1 END) > 0 AS has_O,
                   count(CASE WHEN o_orderstatus = 'P' THEN 1 END) > 0 AS has_P,
                   count(CASE WHEN o_orderstatus = 'F' THEN 1 END) > 0
                   AND count(CASE WHEN o_orderstatus = 'O' THEN 1 END) > 0
                   AND count(CASE WHEN o_orderstatus = 'P' THEN 1 END) > 0
                     AS complete
            FROM orders WHERE o_custkey <= 200
            GROUP BY o_custkey ORDER BY o_custkey
        """,
        "newest_import": """
            SELECT o_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                  FROM orders)
            WHERE rn = 1
        """,
        "pivot_longer": """
            WITH stats AS (
              SELECT n_name, round(avg(c_acctbal), 4) AS avg_acctbal,
                     count(*)::DOUBLE AS n_customers
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name)
            SELECT n_name, 'avg_acctbal' AS metric, avg_acctbal AS value FROM stats
            UNION ALL
            SELECT n_name, 'n_customers' AS metric, n_customers AS value FROM stats
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        """,
        "bin_summary_view": """
            SELECT s_suppkey, s_name,
                   CAST(regexp_extract(s_name, 'Supplier#0*(\\d+)', 1) AS BIGINT) AS sup_num,
                   n_name, r_name, round(s_acctbal, 4) AS s_acctbal
            FROM supplier
            LEFT JOIN nation ON s_nationkey = n_nationkey
            LEFT JOIN region ON n_regionkey = r_regionkey
        """,
        "rollup_ladder": """
            SELECT coalesce(r_name, 'ALL') AS r_name,
                   coalesce(n_name, 'ALL') AS n_name,
                   round(sum(c_acctbal), 4) AS sum_acctbal,
                   count(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
        """,
        "subtree_rollup": """
            WITH leaves AS (
              SELECT 'c:' || c_custkey AS cnode, 'n:' || n_name AS nnode,
                     'r:' || r_name AS rnode, c_acctbal AS abund
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey)
            SELECT cnode AS node_id, round(abund, 4) AS abund_direct,
                   round(abund, 4) AS abund_w_subtax
            FROM leaves
            UNION ALL
            SELECT nnode, 0.0, round(sum(abund), 4) FROM leaves GROUP BY nnode
            UNION ALL
            SELECT rnode, 0.0, round(sum(abund), 4) FROM leaves GROUP BY rnode
        """,
        "lca": """
            WITH hits AS (
              SELECT l_orderkey, r_name, n_name
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey)
            SELECT l_orderkey,
                   CAST(CASE WHEN min(r_name) = max(r_name) THEN
                          CASE WHEN min(n_name) = max(n_name) THEN 2 ELSE 1 END
                        ELSE 0 END AS BIGINT) AS lca_depth,
                   CASE WHEN min(r_name) = max(r_name) THEN
                          CASE WHEN min(n_name) = max(n_name)
                               THEN min(n_name) ELSE min(r_name) END
                        ELSE 'root' END AS lca_name
            FROM hits GROUP BY l_orderkey
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts) OVER w ::TIMESTAMP) > 1800000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts))
            SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id
        """,
        "windowed_counts": """
            SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
        """,
        "curation_pipeline": """
            WITH corpus AS (
              SELECT doc_id, text, lang FROM documents
              UNION ALL
              SELECT doc_id + 10000 AS doc_id, text, lang FROM documents
              WHERE doc_id < 100),
            gated AS (
              SELECT * FROM corpus
              WHERE len(list_filter(string_split_regex(text, '\\s+'),
                        x -> x <> '')) >= 10
                AND lang IN ('en', 'es', 'fr', 'de')),
            deduped AS (
              SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                FROM gated) WHERE rn = 1),
            assigned AS (
              SELECT doc_id, lang,
                     CASE WHEN b < 80 THEN 'train'
                          WHEN b < 90 THEN 'val' ELSE 'test' END AS split
              FROM (SELECT doc_id, lang,
                           CAST(concat('0x', substr(md5(concat('split:',
                                CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                           % 100 AS b
                    FROM deduped))
            SELECT lang, split, count(*) AS n, min(doc_id) AS min_id
            FROM assigned GROUP BY lang, split
        """,
        "skew_join_salted": """
            SELECT p.p_brand, count(*) AS n,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand
        """,
        "asof_join": """
            WITH p AS (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS ts_us
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
                              value
                       FROM events WHERE event_type = 'click'),
                 m AS (SELECT p.event_id, c.event_id AS click_id,
                              c.ts_us AS click_ts_us, c.value AS click_value,
                              row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts_us DESC, c.event_id DESC) AS rn
                       FROM p JOIN c ON c.user_id = p.user_id
                                    AND c.ts_us <= p.ts_us)
            SELECT p.event_id, p.user_id, p.ts_us, m.click_id, m.click_ts_us,
                   round(m.click_value, 4) AS click_value
            FROM p LEFT JOIN m ON m.event_id = p.event_id AND m.rn = 1
        """,
        "range_join": """
            WITH i AS (SELECT event_id AS error_id, user_id,
                              epoch_us(ts::TIMESTAMP) AS start_us,
                              epoch_us(ts::TIMESTAMP) + 600000000 AS end_us
                       FROM events WHERE event_type = 'error'),
                 p AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, value
                       FROM events)
            SELECT i.error_id, count(*) AS n_in_window,
                   round(sum(p.value), 4) AS sum_value
            FROM i JOIN p ON p.user_id = i.user_id
                         AND p.ts_us BETWEEN i.start_us AND i.end_us
            GROUP BY i.error_id
        """,
        "threshold_filter": """
            SELECT event_id, user_id, event_type, round(value, 4) AS value
            FROM events WHERE value >= 150
        """,
        "weighted_mean": """
            SELECT event_type,
                   round(sum(value * k) / sum(k), 4) AS wmean_value,
                   CAST(sum(k) AS BIGINT) AS sum_k
            FROM (SELECT event_type, value,
                         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY event_type
        """,
        "json_histogram": """
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "date_multiformat": """
            WITH raw AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m')
                          WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%d')
                          ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS raw,
                     o_orderdate
              FROM orders)
            SELECT o_orderkey, raw,
                   strftime(coalesce(try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
                                     try_strptime(raw, '%Y-%m-%d'),
                                     try_strptime(raw, '%Y-%m')), '%Y-%m-%d') AS parsed_date,
                   CAST(year(coalesce(try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
                                      try_strptime(raw, '%Y-%m-%d'),
                                      try_strptime(raw, '%Y-%m'))) AS BIGINT) AS parsed_year
            FROM raw
        """,
        "exact_dedup": """
            SELECT array_to_string(list_filter(string_split_regex(text, '\\s+'),
                                               x -> x <> '')[1:3], ' ') AS prefix,
                   min(doc_id) AS canonical_id, count(*) AS dup_count
            FROM documents
            GROUP BY 1
        """,
        "minhash_dedup": _jaccard_sql(_DUP_CORPUS_SQL, 0.9),
        "dup_clusters": _DUP_CLUSTERS_SQL.format(
            jaccard=_jaccard_sql(_DUP_CORPUS_SQL, 0.9)),
        "dup_clusters_star": _DUP_CLUSTERS_SQL.format(
            jaccard=_jaccard_sql(_DUP_CORPUS_SQL, 0.9)),
        "dedup_keep_best": f"""
            WITH RECURSIVE corpus AS ({_DUP_CORPUS_SQL}),
            pairs AS (
              SELECT id_a, id_b FROM ({_jaccard_sql(_DUP_CORPUS_SQL, 0.9)}) j),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            nodes AS (SELECT DISTINCT u AS id FROM edges),
            reach(id, r) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
            labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
            scored AS (
              SELECT c.doc_id, coalesce(l.cluster_id, c.doc_id) AS cluster_id,
                     length(c.text)::DOUBLE AS score
              FROM corpus c LEFT JOIN labels l ON c.doc_id = l.id),
            ranked AS (
              SELECT doc_id, cluster_id,
                     row_number() OVER (PARTITION BY cluster_id
                       ORDER BY score DESC, doc_id ASC) AS rn
              FROM scored)
            SELECT doc_id, cluster_id, (rn = 1) AS kept FROM ranked
        """,
        "leakage_safe_split": f"""
            WITH RECURSIVE corpus AS ({_DUP_CORPUS_SQL}),
            pairs AS (
              SELECT id_a, id_b FROM ({_jaccard_sql(_DUP_CORPUS_SQL, 0.9)}) j),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            nodes AS (SELECT DISTINCT u AS id FROM edges),
            reach(id, r) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
            labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
            rep AS (
              SELECT c.doc_id, coalesce(l.cluster_id, c.doc_id) AS rep
              FROM corpus c LEFT JOIN labels l ON c.doc_id = l.id)
            SELECT doc_id, rep,
                   CASE WHEN CAST(concat('0x', substr(md5(concat('split:',
                          CAST(rep AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 80
                        THEN 'train' ELSE 'test' END AS split
            FROM rep
        """,
        "quantile_gate": """
            WITH th AS (
              SELECT lang, quantile_cont(n_chars, 0.25) AS threshold
              FROM documents GROUP BY lang)
            SELECT d.lang, count(*) AS n_kept,
                   round(any_value(th.threshold), 4) AS threshold,
                   CAST(min(d.n_chars) AS BIGINT) AS min_kept_chars
            FROM documents d JOIN th USING (lang)
            WHERE d.n_chars >= th.threshold
            GROUP BY d.lang
        """,
        "normalize_text": """
            WITH planted AS (
              SELECT doc_id,
                     '  <p class=''x''>' || text || '</p>' || chr(10) ||
                     chr(9) || '<br/> tail   end ' AS text
              FROM documents),
            norm AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'),
                                         '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS norm_text
              FROM planted)
            SELECT doc_id, md5(norm_text) AS norm_hash,
                   CAST(length(norm_text) AS BIGINT) AS norm_len
            FROM norm
        """,
        "session_windows": """
            WITH g AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts) OVER w ::TIMESTAMP) > 1800000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (
              SELECT user_id, ts, value,
                     sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM g)
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "chao1": """
            WITH c AS (
              SELECT l_returnflag AS sample, l_partkey AS taxon,
                     count(*) AS cnt
              FROM lineitem GROUP BY 1, 2),
            agg AS (
              SELECT sample, count(*) AS s_obs,
                     CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS f1,
                     CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS f2
              FROM c GROUP BY sample)
            SELECT sample, s_obs, f1, f2,
                   round(s_obs + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 4) AS chao1
            FROM agg
        """,
        "shannon_diversity": """
            WITH c AS (
              SELECT l_returnflag AS sample, l_partkey AS taxon,
                     CAST(sum(l_quantity) AS DOUBLE) AS cnt
              FROM lineitem GROUP BY 1, 2),
            t AS (SELECT sample, sum(cnt) AS total FROM c GROUP BY 1)
            SELECT c.sample,
                   round(-sum((cnt / total) * ln(cnt / total)), 4) AS shannon,
                   count(*) AS richness,
                   round(-sum((cnt / total) * ln(cnt / total))
                         / ln(count(*)::DOUBLE), 4) AS evenness
            FROM c JOIN t USING (sample)
            GROUP BY c.sample
        """,
        "bray_curtis": """
            WITH c AS (
              SELECT l_returnflag AS sample, l_partkey AS taxon,
                     CAST(sum(l_quantity) AS DOUBLE) AS cnt
              FROM lineitem GROUP BY 1, 2),
            t AS (SELECT sample, sum(cnt) AS total FROM c GROUP BY 1),
            shared AS (
              SELECT a.sample AS sample_a, b.sample AS sample_b,
                     sum(least(a.cnt, b.cnt)) AS minsum
              FROM c a JOIN c b ON a.taxon = b.taxon AND a.sample < b.sample
              GROUP BY 1, 2),
            -- pair universe from totals: disjoint sample pairs must appear
            -- with minsum 0 (BC = 1), matching the engine
            pairs AS (
              SELECT ta.sample AS sample_a, tb.sample AS sample_b,
                     ta.total AS tta, tb.total AS ttb
              FROM t ta JOIN t tb ON ta.sample < tb.sample)
            SELECT sample_a, sample_b,
                   round(1 - 2 * coalesce(minsum, 0) / (tta + ttb), 4)
                     AS bray_curtis
            FROM pairs LEFT JOIN shared USING (sample_a, sample_b)
        """,
        "rarefaction": """
            WITH d AS (
              SELECT l_returnflag AS sample, l_partkey AS taxon,
                     l_orderkey * 8 + l_linenumber AS read_id
              FROM lineitem),
            b AS (
              SELECT sample, taxon,
                     CAST(concat('0x', substr(md5(concat('rare:',
                       CAST(read_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100
                       AS bucket
              FROM d)
            SELECT sample, CAST(p AS BIGINT) AS depth_pct,
                   CAST(count(DISTINCT CASE WHEN bucket < p THEN taxon END)
                        AS BIGINT) AS richness
            FROM b, (VALUES (10), (50), (100)) v(p)
            GROUP BY sample, p
        """,
        "label_centroids": """
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dim - 1 AS BIGINT) AS dim,
                   round(avg(v), 4) + 0.0 AS mean_val, count(*) AS n
            FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
                         generate_subscripts(embedding, 1) AS dim
                  FROM embeddings)
            GROUP BY 1, 2
        """,
        "profile_table": """
            SELECT 'doc_id' AS "column",
                   CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
                   CAST(min(doc_id) AS VARCHAR) AS min_val,
                   CAST(max(doc_id) AS VARCHAR) AS max_val
            FROM documents
            UNION ALL
            SELECT 'text',
                   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(count(DISTINCT text) AS BIGINT),
                   min(text), max(text) FROM documents
            UNION ALL
            SELECT 'lang',
                   CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(count(DISTINCT lang) AS BIGINT),
                   min(lang), max(lang) FROM documents
            UNION ALL
            SELECT 'source',
                   CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(count(DISTINCT source) AS BIGINT),
                   min(source), max(source) FROM documents
            UNION ALL
            SELECT 'n_chars',
                   CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(count(DISTINCT n_chars) AS BIGINT),
                   CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
            FROM documents
        """,
        "curation_pipeline_v2": """
            WITH corpus AS (
              SELECT doc_id, text, lang FROM documents
              UNION ALL
              SELECT doc_id + 10000 AS doc_id, text, lang FROM documents
              WHERE doc_id < 100),
            norm AS (
              SELECT doc_id, lang,
                     trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'),
                                         '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS norm_text
              FROM corpus),
            lens AS (
              SELECT doc_id, lang, norm_text,
                     length(norm_text) AS norm_len
              FROM norm),
            th AS (
              SELECT lang, quantile_cont(norm_len, 0.1) AS t
              FROM lens GROUP BY lang),
            gated AS (
              SELECT l.* FROM lens l JOIN th USING (lang)
              WHERE l.norm_len >= th.t),
            deduped AS (
              SELECT doc_id, norm_len FROM (
                SELECT doc_id, norm_len,
                       row_number() OVER (PARTITION BY norm_text
                                          ORDER BY doc_id) AS rn
                FROM gated) WHERE rn = 1),
            train AS (
              SELECT doc_id, norm_len FROM deduped
              WHERE CAST(concat('0x', substr(md5(concat('split:',
                    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 80),
            sharded AS (
              SELECT doc_id, norm_len,
                     CAST(concat('0x', substr(md5(concat('pack:',
                       CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 4 AS shard,
                     CAST(concat('0x', substr(md5(concat('pack:',
                       CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                       % 1000000000 AS ord
              FROM train),
            packed AS (
              SELECT shard, norm_len,
                     CAST(floor(coalesce(sum(norm_len) OVER (PARTITION BY shard
                       ORDER BY ord, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       / 4000) AS BIGINT) AS bin
              FROM sharded)
            SELECT shard, count(*) AS n_docs,
                   count(DISTINCT bin) AS n_bins,
                   CAST(sum(norm_len) AS BIGINT) AS sum_tokens
            FROM packed GROUP BY shard
        """,
        "pack_sequences": """
            WITH d AS (
              SELECT doc_id, n_chars,
                     CAST(concat('0x', substr(md5(concat('pack:',
                       CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 8 AS shard,
                     CAST(concat('0x', substr(md5(concat('pack:',
                       CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                       % 1000000000 AS ord
              FROM documents),
            pre AS (
              SELECT shard, n_chars,
                     coalesce(sum(n_chars) OVER (PARTITION BY shard
                       ORDER BY ord, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS before
              FROM d)
            SELECT shard, CAST(floor(before / 4000) AS BIGINT) AS bin,
                   count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_tokens
            FROM pre GROUP BY shard, bin
        """,
        "mad_outliers": """
            WITH med AS (
              SELECT lang, quantile_cont(n_chars, 0.5) AS med
              FROM documents GROUP BY lang),
            dev AS (
              SELECT d.lang, abs(d.n_chars - m.med) AS abs_dev, m.med
              FROM documents d JOIN med m USING (lang)),
            m2 AS (
              SELECT lang, quantile_cont(abs_dev, 0.5) AS mad
              FROM dev GROUP BY lang)
            SELECT dev.lang, round(any_value(dev.med), 4) AS med,
                   round(any_value(m2.mad), 4) AS mad,
                   CAST(sum(CASE WHEN dev.abs_dev > 3 * m2.mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   count(*) AS n
            FROM dev JOIN m2 USING (lang)
            GROUP BY dev.lang
        """,
        "funnel": """
            WITH s1 AS (
              SELECT user_id, ts, event_type,
                     min(CASE WHEN event_type = 'view' THEN ts END)
                       OVER (PARTITION BY user_id) AS t1
              FROM events),
            s2 AS (
              SELECT *, min(CASE WHEN event_type = 'click'
                                 AND epoch_us(ts::TIMESTAMP) > epoch_us(t1::TIMESTAMP)
                            THEN ts END) OVER (PARTITION BY user_id) AS t2
              FROM s1),
            s3 AS (
              SELECT *, min(CASE WHEN event_type = 'purchase'
                                 AND epoch_us(ts::TIMESTAMP) > epoch_us(t2::TIMESTAMP)
                            THEN ts END) OVER (PARTITION BY user_id) AS t3
              FROM s2)
            SELECT DISTINCT user_id,
                   CAST(CASE WHEN t3 IS NOT NULL THEN 3
                             WHEN t2 IS NOT NULL THEN 2
                             WHEN t1 IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS funnel_stage,
                   strftime(t1, '%Y-%m-%d %H:%M:%S') AS stage1_ts,
                   strftime(t2, '%Y-%m-%d %H:%M:%S') AS stage2_ts,
                   strftime(t3, '%Y-%m-%d %H:%M:%S') AS stage3_ts
            FROM s3
        """,
        "snapshot_diff": """
            WITH base AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 300),
            nw AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 3 THEN text || ' v2' ELSE text END
                       AS text
              FROM base WHERE doc_id % 10 <> 0
              UNION ALL
              SELECT doc_id + 9000 AS doc_id, text FROM base WHERE doc_id < 30)
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.text <> n.text THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM base o FULL OUTER JOIN nw n ON o.doc_id = n.doc_id
        """,
        "corr_stats": """
            SELECT l_returnflag,
                   round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
                   round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
                   round(stddev_samp(l_quantity), 4) AS stddev_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "rolling_features": """
            SELECT event_id, user_id,
                   CAST(count(*) OVER w AS BIGINT) AS trailing_n,
                   round(avg(value) OVER w, 4) AS trailing_mean
            FROM events WHERE user_id < 50
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts::TIMESTAMP) // 1000000
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        """,
        "percent_rank_norm": """
            SELECT doc_id, lang,
                   round(percent_rank() OVER (PARTITION BY lang
                                              ORDER BY n_chars), 4) AS score_pct
            FROM documents
        """,
        "tfidf_topk": """
            WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
            toks AS (
              SELECT doc_id, lower(t) AS term
              FROM d, LATERAL (SELECT unnest(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> '')) AS t) g),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY doc_id, term),
            n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM d),
            dfreq AS (SELECT term, count(DISTINCT doc_id) AS df_count
                      FROM tf GROUP BY term),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf,
                     tf.tf * ln(n.n_docs::DOUBLE / dfreq.df_count) AS tfidf
              FROM tf JOIN dfreq USING (term) CROSS JOIN n),
            ranked AS (
              SELECT doc_id, term, tf, tfidf,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY round(tfidf, 6) DESC, term ASC) AS term_rank
              FROM scored)
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                   round(tfidf, 4) AS tfidf,
                   CAST(term_rank AS BIGINT) AS term_rank
            FROM ranked WHERE term_rank <= 3
        """,
        "winsorize": """
            WITH b AS (
              SELECT lang, quantile_cont(n_chars, 0.05) AS lo,
                     quantile_cont(n_chars, 0.95) AS hi
              FROM documents GROUP BY lang)
            SELECT d.lang,
                   round(avg(greatest(b.lo, least(b.hi, d.n_chars))), 4)
                     AS clipped_mean,
                   round(min(greatest(b.lo, least(b.hi, d.n_chars))), 4)
                     AS clipped_min,
                   round(max(greatest(b.lo, least(b.hi, d.n_chars))), 4)
                     AS clipped_max
            FROM documents d JOIN b USING (lang)
            GROUP BY d.lang
        """,
        "kmer_spectrum": """
            WITH reads AS (
              SELECT regexp_replace(lower(text), '[^acgt]', '', 'g') AS seq
              FROM documents),
            kmers AS (
              SELECT substr(seq, i, 4) AS kmer
              FROM (SELECT seq FROM reads WHERE length(seq) >= 4) r,
                   LATERAL (SELECT unnest(generate_series(1, length(seq) - 3)) AS i) g)
            SELECT kmer, count(*) AS n FROM kmers
            GROUP BY kmer
            ORDER BY n DESC, kmer ASC
            LIMIT 20
        """,
        "simhash_dedup": _jaccard_sql(_DUP_CORPUS_SQL, 0.999),
        "ngram_jaccard": _jaccard_sql(
            "SELECT doc_id, text FROM documents WHERE doc_id < 60", 0.15),
        "ngram_containment": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 40
              UNION ALL
              SELECT doc_id + 5000 AS doc_id, substr(text, 1, 60) AS text
              FROM documents WHERE doc_id < 40),
            sh AS ({_SHINGLES4.format(src="corpus")}),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b,
                   round(i::DOUBLE / sa.sz, 4) AS containment_a,
                   round(i::DOUBLE / sb.sz, 4) AS containment_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE greatest(i::DOUBLE / sa.sz, i::DOUBLE / sb.sz) >= 0.9
        """,
        "ivf_ann": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 8),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cosine
              FROM embeddings e, q WHERE e.vec_id <> q.query_id),
            ranked AS (
              SELECT query_id, neighbor_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cosine, 6) DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(cosine, 4) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 4
        """,
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cosine
              FROM embeddings e, q WHERE e.vec_id <> q.query_id),
            ranked AS (
              SELECT query_id, neighbor_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY round(cosine, 6) DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(cosine, 4) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "lang_id": f"""
            WITH scores AS ({_LANG_SCORES})
            SELECT d.doc_id, d.lang,
                   CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                        WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                        WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                        WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                        ELSE 'de' END AS pred_lang
            FROM documents d JOIN scores USING (doc_id)
        """,
        "text_quality": """
            WITH f AS (
              SELECT doc_id,
                     len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
                       AS n_tok,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '[^\\w\\s]')) AS punct,
                     len(list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x IN ('the','a','an','and','or','of','to','in','is','it')))
                       AS n_stop
              FROM documents)
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
                   -- + 1e-9 = the engine's _r4n boundary nudge (identical
                   -- doubles both sides, so the shift is identical too)
                   round(punct::DOUBLE / greatest(n_chars, 1) + 1e-9, 4)
                     AS punct_ratio,
                   round(n_stop::DOUBLE / greatest(n_tok, 1) + 1e-9, 4)
                     AS stopword_ratio,
                   round(0.4 * least(n_tok / 100.0, 1.0)
                         + 0.3 * (1.0 - punct::DOUBLE / greatest(n_chars, 1))
                         + 0.3 * least(n_stop::DOUBLE / greatest(n_tok, 1) * 5, 1.0)
                         + 1e-9, 4) AS quality_score
            FROM f
        """,
        "token_counts": """
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                        x -> x <> '')) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "doc_fingerprint": _fingerprint_sql(40),
        "vocab_topk": """
            WITH t AS (SELECT unnest(list_filter(
                           string_split_regex(lower(text), '\\s+'),
                           x -> x <> '')) AS token
                       FROM documents)
            SELECT token, count(*) AS n FROM t
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
        """,
        "hash_sample": """
            SELECT doc_id, lang, source FROM documents
            WHERE CAST(concat('0x', substr(md5(concat('s1:',
                       CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 10
        """,
        "stratified_split": """
            SELECT doc_id, lang,
                   CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'val' ELSE 'test' END AS split
            FROM (SELECT doc_id, lang,
                         CAST(concat('0x', substr(md5(concat('split:',
                              CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 AS b
                  FROM documents)
        """,
        "cap_per_source": """
            WITH h AS (
              SELECT source, doc_id,
                     CAST(concat('0x', substr(md5(concat('cap:',
                          CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                     % 2147483648 AS hb
              FROM documents),
            ranked AS (
              SELECT source, doc_id,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY hb ASC, doc_id ASC) AS rn
              FROM h)
            SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
            FROM ranked WHERE rn <= 40 GROUP BY source
        """,
        "hypertable_rollup": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket_day,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_hour,
                   count(*) AS n, round(sum(value), 4) AS sum_value,
                   CAST((1 - GROUPING(date_trunc('day', ts)))
                        + (1 - GROUPING(date_trunc('hour', ts))) AS BIGINT) AS grain
            FROM events
            GROUP BY ROLLUP(date_trunc('day', ts), date_trunc('hour', ts))
        """,
        "seqkit_stats": """
            SELECT source, count(*) AS num_seqs, CAST(sum(n_chars) AS BIGINT) AS sum_len,
                   min(n_chars) AS min_len,
                   round(quantile_cont(n_chars, 0.25), 4) AS q1,
                   round(quantile_cont(n_chars, 0.5), 4) AS q2,
                   round(quantile_cont(n_chars, 0.75), 4) AS q3,
                   max(n_chars) AS max_len
            FROM documents GROUP BY source
        """,
        "line_dedup": """
            WITH planted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0
                          THEN text || chr(10) || 'Subscribe to our newsletter'
                                    || chr(10) || 'Copyright 2026 Example Corp'
                          ELSE text END AS text
              FROM documents),
            l AS (
              SELECT doc_id,
                     unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos,
                     unnest(string_split(text, chr(10))) AS line
              FROM planted),
            common AS (
              SELECT line FROM l WHERE length(line) >= 1
              GROUP BY line HAVING count(DISTINCT doc_id) >= 5),
            kept AS (
              SELECT doc_id, pos, line FROM l
              WHERE line NOT IN (SELECT line FROM common)),
            rebuilt AS (
              SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
              FROM kept GROUP BY doc_id)
            SELECT p.doc_id,
                   coalesce(r.clean_text, '') AS clean_text,
                   length(coalesce(r.clean_text, '')) AS n_clean_chars
            FROM planted p LEFT JOIN rebuilt r USING (doc_id)
        """,
        "geo_neighbors": """
            WITH pts AS (
              SELECT c_custkey AS sample_id,
                     41.0 + ((c_custkey * 2654435761) % 600000) / 100000.0 AS lat,
                     -87.0 + ((c_custkey * 2246822519) % 700000) / 100000.0 AS lon
              FROM customer),
            pairs AS (
              SELECT a.sample_id AS id_a, b.sample_id AS id_b,
                     2 * 6371.0088 * asin(sqrt(
                       sin(radians(b.lat - a.lat)/2)
                         * sin(radians(b.lat - a.lat)/2)
                       + cos(radians(a.lat)) * cos(radians(b.lat))
                         * sin(radians(b.lon - a.lon)/2)
                         * sin(radians(b.lon - a.lon)/2))) AS dist_km
              FROM pts a JOIN pts b ON a.sample_id < b.sample_id)
            SELECT id_a, id_b, round(dist_km, 4) AS dist_km
            FROM pairs WHERE dist_km <= 3.0
        """,
        "span_dedup": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 40
              UNION ALL
              SELECT doc_id + 5000 AS doc_id, substring(text, 1, 120) AS text
              FROM documents WHERE doc_id < 40),
            tok AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '[ \t\n]+'),
                                 x -> x <> '') AS arr
              FROM corpus),
            grams AS (
              SELECT doc_id, i AS start, array_to_string(arr[i:i+5], ' ') AS gram
              FROM tok, unnest(CASE WHEN len(arr) >= 6
                                    THEN range(1, len(arr) - 4)
                                    ELSE CAST([] AS BIGINT[]) END) AS t(i)),
            dup AS (
              SELECT gram FROM grams
              GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
            cov AS (
              SELECT g.doc_id, p
              FROM grams g, unnest(range(g.start, g.start + 6)) AS u(p)
              WHERE g.gram IN (SELECT gram FROM dup)),
            tokrows AS (
              SELECT doc_id,
                     unnest(range(1, len(arr) + 1)) AS pos,
                     unnest(arr) AS tok
              FROM tok),
            kept AS (
              SELECT t.doc_id, t.pos, t.tok FROM tokrows t
              WHERE NOT EXISTS (SELECT 1 FROM cov c
                                WHERE c.doc_id = t.doc_id AND c.p = t.pos)),
            rebuilt AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id),
            totals AS (SELECT doc_id, len(arr) AS n_total FROM tok)
            SELECT c.doc_id,
                   coalesce(r.clean_text, '') AS clean_text,
                   CAST(t.n_total - coalesce(r.n_kept, 0) AS BIGINT)
                     AS n_removed_tokens
            FROM corpus c
            JOIN totals t USING (doc_id)
            LEFT JOIN rebuilt r USING (doc_id)
        """,
        "pmi_collocations": """
            WITH tok AS (
              SELECT doc_id,
                     list_transform(
                       list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> ''),
                       t -> lower(t)) AS arr
              FROM documents),
            pairs AS (
              SELECT arr[i] AS a, arr[i+1] AS b
              FROM tok, unnest(CASE WHEN len(arr) >= 2
                                    THEN range(1, len(arr))
                                    ELSE CAST([] AS BIGINT[]) END) AS t(i)),
            big AS (SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY a, b),
            lu AS (SELECT a, sum(c_ab) AS c_a FROM big GROUP BY a),
            ru AS (SELECT b, sum(c_ab) AS c_b FROM big GROUP BY b),
            tot AS (SELECT sum(c_ab) AS n_big FROM big)
            SELECT big.a, big.b, c_ab,
                   round(ln(n_big * c_ab / (c_a * c_b)), 6) AS pmi
            FROM big JOIN lu USING (a) JOIN ru USING (b) CROSS JOIN tot
            WHERE c_ab >= 5
            ORDER BY pmi DESC, a ASC, b ASC
            LIMIT 50
        """,
        "nx_ladder": """
            WITH c AS (
              SELECT source, n_chars,
                     sum(n_chars) OVER (PARTITION BY source
                         ORDER BY n_chars DESC, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                     sum(n_chars) OVER (PARTITION BY source) AS tot,
                     row_number() OVER (PARTITION BY source
                         ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents)
            SELECT source,
                   CAST(count(*) AS BIGINT) AS num_seqs,
                   CAST(max(tot) AS BIGINT) AS total_len,
                   CAST(max(n_chars) AS BIGINT) AS max_len,
                   CAST(max(CASE WHEN cum*100 >= tot*50 THEN n_chars END)
                        AS BIGINT) AS n50,
                   CAST(min(CASE WHEN cum*100 >= tot*50 THEN rn END)
                        AS BIGINT) AS l50,
                   CAST(max(CASE WHEN cum*100 >= tot*90 THEN n_chars END)
                        AS BIGINT) AS n90,
                   CAST(min(CASE WHEN cum*100 >= tot*90 THEN rn END)
                        AS BIGINT) AS l90
            FROM c GROUP BY source
        """,
        "resample_fill": """
            WITH e AS (
              SELECT user_id,
                     epoch_us(ts::TIMESTAMP) // 1000000 AS sec, value
              FROM events WHERE user_id < 40),
            b AS (
              SELECT user_id,
                     CAST(floor(sec / 86400) * 86400 AS BIGINT) AS bucket_start,
                     count(*) AS n_events, sum(value) AS total
              FROM e GROUP BY 1, 2),
            s AS (SELECT user_id, min(bucket_start) AS lo,
                         max(bucket_start) AS hi
                  FROM b GROUP BY 1),
            grid AS (
              SELECT user_id,
                     unnest(generate_series(lo, hi, 86400)) AS bucket_start
              FROM s)
            SELECT g.user_id, g.bucket_start,
                   CAST(coalesce(b.n_events, 0) AS BIGINT) AS n_events,
                   round(coalesce(b.total, 0.0), 4) AS total,
                   coalesce(b.n_events, 0) = 0 AS is_gap
            FROM grid g
            LEFT JOIN b ON b.user_id = g.user_id
                       AND b.bucket_start = g.bucket_start
        """,
        "interpolate": """
            WITH d AS (
              SELECT user_id,
                     epoch_us(ts::TIMESTAMP) // 1000000 AS x,
                     max(CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
                              NOT IN ('0','1','2','3') THEN value END) AS v
              FROM events WHERE user_id < 30 GROUP BY 1, 2),
            w AS (
              SELECT user_id, x, v,
                     last_value(v IGNORE NULLS) OVER wp AS pv,
                     last_value(CASE WHEN v IS NOT NULL
                                     THEN CAST(x AS DOUBLE) END IGNORE NULLS)
                       OVER wp AS px,
                     first_value(v IGNORE NULLS) OVER wn AS nv,
                     first_value(CASE WHEN v IS NOT NULL
                                      THEN CAST(x AS DOUBLE) END IGNORE NULLS)
                       OVER wn AS nx
              FROM d
              WINDOW wp AS (PARTITION BY user_id ORDER BY x
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     wn AS (PARTITION BY user_id ORDER BY x
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
            SELECT user_id, x, (v IS NULL) AS was_missing,
                   round(CASE WHEN v IS NOT NULL THEN v
                              WHEN pv IS NULL THEN nv
                              WHEN nv IS NULL OR nx = px THEN pv
                              ELSE pv + (nv - pv)
                                   * (CAST(x AS DOUBLE) - px) / (nx - px)
                         END, 4) AS v_interp
            FROM w
        """,
        "changepoint": """
            WITH d AS (
              SELECT user_id, event_id,
                     epoch_us(ts::TIMESTAMP) // 1000000 AS sec, value
              FROM events WHERE user_id < 60),
            w AS (
              SELECT user_id, sec,
                     count(*) OVER (PARTITION BY user_id) AS n,
                     sum(value) OVER (PARTITION BY user_id) AS tot,
                     sum(value) OVER (PARTITION BY user_id
                         ORDER BY sec, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                     row_number() OVER (PARTITION BY user_id
                         ORDER BY sec, event_id) AS i
              FROM d),
            s AS (SELECT user_id, sec, i, n,
                         round(abs(cum - i * tot / n), 6) AS s_abs
                  FROM w),
            p AS (SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY s_abs DESC, i) AS rk
                  FROM s)
            SELECT user_id, CAST(sec AS BIGINT) AS changepoint_sec,
                   CAST(i AS BIGINT) AS changepoint_idx,
                   s_abs AS max_cusum, CAST(n AS BIGINT) AS n_points
            FROM p WHERE rk = 1
        """,
        "triangle_count": """
            WITH sp AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                        FROM lineitem),
            pairs AS (SELECT a.i AS x, b.i AS y, count(*) AS w
                      FROM sp a JOIN sp b ON a.g = b.g AND a.i < b.i
                      GROUP BY 1, 2),
            e AS (SELECT x AS a, y AS b FROM pairs WHERE w >= 2),
            tri AS (SELECT e1.a AS p, e1.b AS q, e2.b AS r
                    FROM e e1 JOIN e e2 ON e1.b = e2.a
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            n AS (SELECT p AS node FROM tri
                  UNION ALL SELECT q FROM tri
                  UNION ALL SELECT r FROM tri)
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(count(*) AS BIGINT) AS triangles
            FROM n GROUP BY node
        """,
        "mash_distance": """
            WITH sh AS (
              SELECT DISTINCT source, md5(substr(text, i, 4)) AS h
              FROM documents, LATERAL (SELECT unnest(generate_series(1,
                     greatest(length(text) - 3, 1))) AS i) g
              WHERE length(substr(text, i, 4)) > 0),
            rk AS (SELECT source, h, row_number() OVER (
                     PARTITION BY source ORDER BY h) AS rk FROM sh),
            sk AS (SELECT source AS g, h FROM rk WHERE rk <= 64),
            gl AS (SELECT DISTINCT g FROM sk),
            pairs AS (SELECT a.g AS ga, b.g AS gb
                      FROM gl a JOIN gl b ON a.g < b.g),
            u AS (
              SELECT ga, gb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
                SELECT p.ga, p.gb, s.h, 1 AS in_a, 0 AS in_b
                FROM pairs p JOIN sk s ON s.g = p.ga
                UNION ALL
                SELECT p.ga, p.gb, s.h, 0, 1
                FROM pairs p JOIN sk s ON s.g = p.gb)
              GROUP BY 1, 2, 3),
            top AS (SELECT *, row_number() OVER (
                      PARTITION BY ga, gb ORDER BY h) AS rk FROM u),
            agg AS (SELECT ga, gb, sum(in_a * in_b) AS shared,
                           count(*) AS union_k
                    FROM top WHERE rk <= 64 GROUP BY 1, 2)
            SELECT ga, gb, CAST(shared AS BIGINT) AS shared,
                   CAST(union_k AS BIGINT) AS union_k,
                   round(shared * 1.0 / union_k, 6) + 0.0 AS jaccard_est,
                   round(CASE WHEN shared > 0 THEN
                         -ln(2.0 * (shared * 1.0 / union_k)
                             / (1 + shared * 1.0 / union_k)) / 4 END, 6)
                     + 0.0 AS mash_dist
            FROM agg
        """,
        "dbscan": """
            WITH RECURSIVE corpus AS (
              SELECT vec_id, embedding::DOUBLE[] AS e
              FROM embeddings WHERE vec_id < 100
              UNION ALL
              SELECT vec_id + 10000, embedding::DOUBLE[]
              FROM embeddings WHERE vec_id < 50
              UNION ALL
              SELECT vec_id + 20000, embedding::DOUBLE[]
              FROM embeddings WHERE vec_id < 50),
            pairs AS (
              SELECT a.vec_id AS u, b.vec_id AS v
              FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.e, b.e) >= 0.999),
            sym AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
            deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
            cores AS (SELECT u AS c FROM deg WHERE d >= 2),
            ce AS (SELECT s.u, s.v FROM sym s
                   JOIN cores a ON s.u = a.c JOIN cores b ON s.v = b.c),
            reach(id, r) AS (
              SELECT c, c FROM cores
              UNION
              SELECT e.u, reach.r FROM ce e JOIN reach ON e.v = reach.id),
            core_labels AS (SELECT id, min(r) AS cluster_id
                            FROM reach GROUP BY id),
            border AS (
              SELECT s.u AS id, min(cl.cluster_id) AS cluster_id
              FROM sym s JOIN core_labels cl ON s.v = cl.id
              WHERE s.u NOT IN (SELECT c FROM cores)
              GROUP BY s.u),
            lab AS (
              SELECT id, cluster_id, 'core' AS role FROM core_labels
              UNION ALL SELECT id, cluster_id, 'border' FROM border)
            SELECT CAST(c.vec_id AS BIGINT) AS id,
                   CAST(lab.cluster_id AS BIGINT) AS cluster_id,
                   coalesce(lab.role, 'noise') AS role
            FROM corpus c LEFT JOIN lab ON lab.id = c.vec_id
        """,
        "trend_fit": """
            WITH d AS (
              SELECT user_id,
                     floor((epoch_us(ts::TIMESTAMP) / 1000000.0 - 1704067200)
                           / 86400.0) AS x,
                     value AS y
              FROM events),
            a AS (
              SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
                     sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                     sum(x * x) AS sxx, sum(y * y) AS syy
              FROM d GROUP BY user_id)
            SELECT user_id, CAST(n AS BIGINT) AS n,
                   round(CASE WHEN n * sxx - sx * sx <> 0 THEN
                         (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6)
                     AS slope,
                   round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                          * sx) / n, 4) AS intercept,
                   round(CASE WHEN n * sxx - sx * sx <> 0
                              AND n * syy - sy * sy <> 0 THEN
                         ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6)
                     AS r2
            FROM a
        """,
        "chi_square": """
            WITH d AS (SELECT source, lang AS r, (doc_id % 3) AS c
                       FROM documents),
            cells AS (SELECT source, r, c, CAST(count(*) AS DOUBLE) AS o
                      FROM d GROUP BY 1, 2, 3),
            rm AS (SELECT source, r, sum(o) AS rt FROM cells GROUP BY 1, 2),
            cm AS (SELECT source, c, sum(o) AS ct FROM cells GROUP BY 1, 2),
            tt AS (SELECT source, sum(o) AS n,
                          count(DISTINCT r) AS nr, count(DISTINCT c) AS nc
                   FROM cells GROUP BY 1),
            j AS (SELECT cells.source, o, rt, ct, n, nr, nc
                  FROM cells JOIN rm USING (source, r)
                  JOIN cm USING (source, c) JOIN tt USING (source)),
            g AS (SELECT source,
                         sum((o - rt * ct / n) * (o - rt * ct / n)
                             / (rt * ct / n)) AS chi_obs,
                         sum(rt * ct / n) AS exp_obs,
                         first(n) AS n, first(nr) AS nr, first(nc) AS nc
                  FROM j GROUP BY source)
            SELECT source, CAST(n AS BIGINT) AS n_obs,
                   round(chi_obs + (n - exp_obs), 4) AS chi2,
                   CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
                   round(CASE WHEN least(nr - 1, nc - 1) > 0 THEN
                         sqrt((chi_obs + (n - exp_obs))
                              / (n * least(nr - 1, nc - 1))) END, 4)
                     AS cramers_v
            FROM g
        """,
        "inverted_index": """
            WITH pairs AS (
              SELECT DISTINCT lower(t) AS term, doc_id
              FROM documents, LATERAL (SELECT unnest(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> '')) AS t) g),
            agg AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df_count,
                     list_slice(list(doc_id ORDER BY doc_id), 1, 20) AS p
              FROM pairs GROUP BY term)
            SELECT term, df_count, array_to_string(p, ',') AS postings_csv
            FROM agg WHERE df_count >= 10
        """,
        "key_skew": """
            WITH stacked AS (
              SELECT 'l_returnflag' AS key_col,
                     CAST(l_returnflag AS VARCHAR) AS key_value FROM lineitem
              UNION ALL
              SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
              UNION ALL
              SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem),
            counts AS (SELECT key_col, key_value, count(*) AS n
                       FROM stacked GROUP BY 1, 2),
            w AS (SELECT key_col, key_value, n,
                         sum(n) OVER (PARTITION BY key_col) AS total,
                         count(*) OVER (PARTITION BY key_col) AS nvals,
                         row_number() OVER (PARTITION BY key_col
                             ORDER BY n DESC, key_value ASC) AS rk
                  FROM counts)
            SELECT key_col, key_value, CAST(rk AS BIGINT) AS rank,
                   CAST(n AS BIGINT) AS n,
                   round(n * 1.0 / total, 6) AS share,
                   round(n * nvals * 1.0 / total, 4) AS skew_ratio
            FROM w WHERE rk <= 5
        """,
        "welch_t": """
            WITH d AS (SELECT l_suppkey AS f, l_linestatus AS g,
                              l_extendedprice AS x
                       FROM lineitem WHERE l_linestatus IN ('O', 'F')),
            a AS (
              SELECT f,
                     CAST(sum(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS DOUBLE)
                       AS na,
                     CAST(sum(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS DOUBLE)
                       AS nb,
                     sum(CASE WHEN g = 'O' THEN x END) AS sa,
                     sum(CASE WHEN g = 'F' THEN x END) AS sb,
                     sum(CASE WHEN g = 'O' THEN x * x END) AS qa,
                     sum(CASE WHEN g = 'F' THEN x * x END) AS qb
              FROM d GROUP BY f),
            c AS (
              SELECT f, na, nb, sa / na AS ma, sb / nb AS mb,
                     (qa - na * (sa / na) * (sa / na)) / (na - 1) AS va,
                     (qb - nb * (sb / nb) * (sb / nb)) / (nb - 1) AS vb
              FROM a),
            e AS (
              SELECT f, na, nb, ma, mb,
                     va / na AS sea, vb / nb AS seb,
                     va / na + vb / nb AS se2
              FROM c)
            SELECT f AS l_suppkey,
                   CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   round(CASE WHEN na >= 2 AND nb >= 2 AND se2 > 0 THEN
                         (ma - mb) / sqrt(se2) END, 4) AS t_stat,
                   round(CASE WHEN na >= 2 AND nb >= 2 AND se2 > 0 THEN
                         (se2 * se2) / (sea * sea / (na - 1)
                                        + seb * seb / (nb - 1)) END, 4)
                     AS welch_dof,
                   round(log2((ma + 1) / (mb + 1)), 6) AS log2_fc
            FROM e
        """,
        "translate_dna": _translate_dna_sql(),
        "seasonal_anomaly": """
            WITH d AS (
              SELECT event_id, event_type, value,
                     dayofweek(ts::TIMESTAMP) * 24
                       + hour(ts::TIMESTAMP) AS how
              FROM events),
            b AS (
              SELECT event_type, how, CAST(count(*) AS DOUBLE) AS n,
                     sum(value) AS s, sum(value * value) AS q
              FROM d GROUP BY 1, 2),
            bb AS (
              SELECT event_type, how, s / n AS m,
                     CASE WHEN n >= 2
                          AND (q - n * (s / n) * (s / n)) / (n - 1) > 0
                          THEN sqrt((q - n * (s / n) * (s / n)) / (n - 1))
                     END AS sd
              FROM b)
            SELECT event_id, d.event_type,
                   CAST(d.how AS BIGINT) AS hour_of_week,
                   round((value - m) / sd, 4) AS z_score,
                   coalesce(abs((value - m) / sd) >= 3.0, FALSE) AS is_anomaly
            FROM d JOIN bb ON bb.event_type = d.event_type
                          AND bb.how = d.how
        """,
        "sensor_pipeline": """
            WITH e AS (
              SELECT user_id,
                     epoch_us(ts::TIMESTAMP) // 1000000 AS sec, value
              FROM events WHERE user_id < 25),
            b AS (
              SELECT user_id,
                     CAST(floor(sec / 86400) * 86400 AS BIGINT) AS bucket_start,
                     count(*) AS n_events, sum(value) AS total
              FROM e GROUP BY 1, 2),
            s AS (SELECT user_id, min(bucket_start) AS lo,
                         max(bucket_start) AS hi FROM b GROUP BY 1),
            grid AS (
              SELECT user_id,
                     unnest(generate_series(lo, hi, 86400)) AS bucket_start
              FROM s),
            filled AS (
              SELECT g.user_id, g.bucket_start,
                     coalesce(b.n_events, 0) = 0 AS is_gap,
                     CASE WHEN coalesce(b.n_events, 0) > 0
                          THEN b.total END AS day_total
              FROM grid g
              LEFT JOIN b ON b.user_id = g.user_id
                         AND b.bucket_start = g.bucket_start),
            w AS (
              SELECT user_id, bucket_start, is_gap, day_total AS v,
                     last_value(day_total IGNORE NULLS) OVER wp AS pv,
                     last_value(CASE WHEN day_total IS NOT NULL THEN
                         CAST(bucket_start AS DOUBLE) END IGNORE NULLS)
                       OVER wp AS px,
                     first_value(day_total IGNORE NULLS) OVER wn AS nv,
                     first_value(CASE WHEN day_total IS NOT NULL THEN
                         CAST(bucket_start AS DOUBLE) END IGNORE NULLS)
                       OVER wn AS nx
              FROM filled
              WINDOW wp AS (PARTITION BY user_id ORDER BY bucket_start
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     wn AS (PARTITION BY user_id ORDER BY bucket_start
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
            SELECT user_id, bucket_start, is_gap,
                   round(CASE WHEN v IS NOT NULL THEN v
                              WHEN pv IS NULL THEN nv
                              WHEN nv IS NULL OR nx = px THEN pv
                              ELSE pv + (nv - pv)
                                   * (CAST(bucket_start AS DOUBLE) - px)
                                   / (nx - px) END, 4) AS repaired_total
            FROM w
        """,
        "rolling_corr": """
            WITH d AS (
              SELECT event_id, user_id,
                     epoch_us(ts::TIMESTAMP) // 1000000 AS sec,
                     CAST(epoch_us(ts::TIMESTAMP) // 1000000
                          - 1704067200 AS DOUBLE) AS x,
                     value AS y
              FROM events WHERE user_id < 50),
            w AS (
              SELECT event_id, user_id,
                     CAST(count(*) OVER fr AS DOUBLE) AS n,
                     sum(x) OVER fr AS sx, sum(y) OVER fr AS sy,
                     sum(x * y) OVER fr AS sxy,
                     sum(x * x) OVER fr AS sxx,
                     sum(y * y) OVER fr AS syy
              FROM d
              WINDOW fr AS (PARTITION BY user_id ORDER BY sec
                            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))
            SELECT event_id, user_id,
                   round(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                              AND n * syy - sy * sy > 0 THEN
                         (n * sxy - sx * sy)
                         / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                         END, 4) AS corr_1h
            FROM w
        """,
        "cohort_retention": """
            WITH up AS (
              SELECT DISTINCT user_id,
                     CAST(floor((epoch_us(ts::TIMESTAMP) // 1000000)
                                / 604800.0) * 604800 AS BIGINT) AS b
              FROM events),
            c AS (SELECT user_id, min(b) AS cohort_start
                  FROM up GROUP BY user_id)
            SELECT cohort_start,
                   CAST((b - cohort_start) / 604800 AS BIGINT)
                     AS period_offset,
                   CAST(count(DISTINCT up.user_id) AS BIGINT) AS n_users
            FROM up JOIN c USING (user_id)
            GROUP BY 1, 2
        """,
        "cooccur_cosine": """
            WITH sp AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                        FROM lineitem),
            pairs AS (SELECT a.i AS src, b.i AS dst, count(*) AS w
                      FROM sp a JOIN sp b ON a.g = b.g AND a.i < b.i
                      GROUP BY 1, 2),
            deg AS (SELECT i, CAST(count(*) AS DOUBLE) AS d
                    FROM sp GROUP BY i)
            SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
                   CAST(w AS BIGINT) AS shared_groups,
                   round(w / sqrt(da.d * db.d), 6) AS cosine
            FROM pairs
            JOIN deg da ON da.i = pairs.src
            JOIN deg db ON db.i = pairs.dst
            WHERE w >= 2
        """,
        "k_core": _k_core_sql(k=3, rounds=12),
        "metagenome_qc": """
            WITH reads AS (
              SELECT doc_id, source,
                     upper(regexp_replace(lower(text), '[^acgt]', '', 'g'))
                       AS seq
              FROM documents),
            r AS (SELECT * FROM reads WHERE length(seq) >= 30),
            pass AS (
              SELECT * FROM r
              WHERE NOT regexp_matches(seq, 'A{6,}|C{6,}|G{6,}|T{6,}')
                AND length(regexp_replace(seq, '[^N]', '', 'g')) <= 0
                AND (CASE WHEN length(seq) <= 1 THEN 0.0
                     ELSE 100.0 * len(list_filter(
                            generate_series(2, length(seq)),
                            i -> substr(seq, i, 1) <> substr(seq, i - 1, 1)))
                          / (length(seq) - 1) END) >= 30.0),
            totals AS (SELECT source, count(*) AS n_reads
                       FROM r GROUP BY source),
            pstats AS (
              SELECT source, count(*) AS n_pass,
                     round(avg(length(regexp_replace(seq, '[^GC]', '', 'g'))
                               * 1.0 / greatest(length(seq), 1)), 4)
                       AS mean_gc,
                     round(avg(length(seq)), 4) AS mean_len
              FROM pass GROUP BY source),
            km AS (
              SELECT source, substr(seq, i, 3) AS kmer
              FROM pass, LATERAL (SELECT unnest(generate_series(1,
                     length(seq) - 2)) AS i) g),
            kc AS (SELECT source, kmer, count(*) AS cnt
                   FROM km GROUP BY 1, 2),
            kt AS (SELECT source, sum(cnt) AS tot FROM kc GROUP BY source),
            div AS (
              SELECT kc.source,
                     round(-sum((cnt * 1.0 / tot) * ln(cnt * 1.0 / tot)), 4)
                       AS kmer_shannon
              FROM kc JOIN kt USING (source) GROUP BY kc.source)
            SELECT t.source, CAST(t.n_reads AS BIGINT) AS n_reads,
                   CAST(coalesce(p.n_pass, 0) AS BIGINT) AS n_pass,
                   p.mean_gc, p.mean_len, d.kmer_shannon
            FROM totals t
            LEFT JOIN pstats p USING (source)
            LEFT JOIN div d ON d.source = t.source
        """,
        "expanding_distinct": """
            WITH d AS (SELECT event_id, user_id, event_type, ts
                       FROM events WHERE user_id < 50),
            f AS (SELECT event_id, user_id, ts,
                         CASE WHEN row_number() OVER (
                             PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) = 1
                              THEN 1 ELSE 0 END AS is_new
                  FROM d)
            SELECT event_id, user_id,
                   CAST(sum(is_new) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS distinct_so_far
            FROM f
        """,
        "doc_bigram_lm": """
            WITH tok AS (
              SELECT doc_id,
                     list_transform(
                       list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> ''),
                       t -> lower(t)) AS arr
              FROM documents),
            bg AS (
              SELECT doc_id, arr[i] AS a, arr[i + 1] AS b
              FROM tok, unnest(CASE WHEN len(arr) >= 2
                                    THEN range(1, len(arr))
                                    ELSE CAST([] AS BIGINT[]) END) AS t(i)),
            uni AS (
              SELECT w, count(*) AS cw FROM (
                SELECT unnest(arr) AS w FROM tok) GROUP BY w),
            tot AS (SELECT sum(cw) AS t FROM uni),
            big AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY a, b),
            scored AS (
              SELECT bg.doc_id,
                     -- (1.0 - 0.7), not 0.3: the engine computes 1-λ in
                     -- IEEE doubles (0.30000000000000004); match it exactly
                     ln(0.7 * cab / ua.cw + (1.0 - 0.7) * ub.cw / tot.t)
                       AS lp
              FROM bg
              JOIN big USING (a, b)
              JOIN uni ua ON ua.w = bg.a
              JOIN uni ub ON ub.w = bg.b
              CROSS JOIN tot)
            SELECT doc_id, round(avg(lp), 4) AS lm2_score,
                   CAST(count(*) AS BIGINT) AS n_bigrams
            FROM scored GROUP BY doc_id
        """,
        "event_paths": """
            WITH w AS (
              SELECT user_id, event_type AS s1,
                     lead(event_type, 1) OVER ww AS s2,
                     lead(event_type, 2) OVER ww AS s3
              FROM events
              WINDOW ww AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n_paths
            FROM w WHERE s3 IS NOT NULL
            GROUP BY 1, 2, 3
            ORDER BY n_paths DESC, s1, s2, s3
            LIMIT 25
        """,
        "geo_clusters": """
            WITH RECURSIVE pts AS (
              SELECT c_custkey AS sample_id,
                     41.0 + ((c_custkey * 2654435761) % 600000) / 100000.0
                       AS lat,
                     -87.0 + ((c_custkey * 2246822519) % 700000) / 100000.0
                       AS lon
              FROM customer WHERE c_custkey < 400),
            pairs AS (
              SELECT a.sample_id AS u, b.sample_id AS v
              FROM pts a JOIN pts b ON a.sample_id < b.sample_id
              WHERE 2 * 6371.0088 * asin(sqrt(
                      sin(radians(b.lat - a.lat)/2)
                        * sin(radians(b.lat - a.lat)/2)
                      + cos(radians(a.lat)) * cos(radians(b.lat))
                        * sin(radians(b.lon - a.lon)/2)
                        * sin(radians(b.lon - a.lon)/2))) <= 3.0),
            edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
            nodes AS (SELECT DISTINCT u AS id FROM edges),
            reach(id, r) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
            labels AS (SELECT id, min(r) AS cluster_id
                       FROM reach GROUP BY id)
            SELECT CAST(p.sample_id AS BIGINT) AS sample_id,
                   CAST(coalesce(l.cluster_id, p.sample_id) AS BIGINT)
                     AS cluster_id
            FROM pts p LEFT JOIN labels l ON l.id = p.sample_id
        """,
        "ab_test": """
            WITH d AS (
              SELECT event_type,
                     CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
                       AS variant,
                     CAST(value > 50 AS INT) AS converted
              FROM events),
            a AS (
              SELECT event_type,
                     CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
                          AS DOUBLE) AS na,
                     CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)
                          AS DOUBLE) AS nb,
                     sum(CASE WHEN variant = 'A'
                              THEN CAST(converted AS DOUBLE) END) AS sa,
                     sum(CASE WHEN variant = 'B'
                              THEN CAST(converted AS DOUBLE) END) AS sb
              FROM d GROUP BY event_type),
            c AS (
              SELECT event_type, na, nb, sa / na AS pa, sb / nb AS pb,
                     (sa + sb) / (na + nb) AS pool
              FROM a)
            SELECT event_type,
                   CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   round(pa, 4) AS rate_a, round(pb, 4) AS rate_b,
                   round(CASE WHEN na > 0 AND nb > 0
                              AND pool > 0 AND pool < 1 THEN
                         (pa - pb) / sqrt(pool * (1 - pool)
                                          * (1 / na + 1 / nb)) END, 4)
                     AS z_score
            FROM c
        """,
        "tfidf_doc_pairs": """
            WITH toks AS (
              SELECT doc_id AS id, lower(t) AS term
              FROM documents, LATERAL (SELECT unnest(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> '')) AS t)
                   g),
            tf AS (SELECT id, term, count(*) AS tf
                   FROM toks GROUP BY 1, 2),
            nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
            dfreq AS (
              SELECT term, ln(n * 1.0 / count(*)) AS idf
              FROM tf CROSS JOIN nd
              GROUP BY term, n HAVING count(*) <= n * 0.5),
            w AS (SELECT id, tf.term, tf.tf * idf AS w
                  FROM tf JOIN dfreq ON dfreq.term = tf.term),
            norms AS (SELECT id, sqrt(sum(w * w)) AS nrm
                      FROM w GROUP BY id),
            unit AS (
              SELECT w.term, w.id, w.w / nrm AS u
              FROM w JOIN norms ON norms.id = w.id
              WHERE nrm > 0)
            SELECT a.id AS id_a, b.id AS id_b,
                   round(sum(a.u * b.u), 4) AS cosine
            FROM unit a JOIN unit b
              ON a.term = b.term AND a.id < b.id
            GROUP BY 1, 2 HAVING sum(a.u * b.u) >= 0.25
        """,
        "shard_assign": """
            WITH s AS (
              SELECT c_custkey, sh,
                     md5(CAST(c_custkey AS VARCHAR) || '#' || sh) AS h
              FROM customer, unnest(range(0, 8)) AS t(sh)),
            r AS (SELECT c_custkey, sh, row_number() OVER (
                      PARTITION BY c_custkey ORDER BY h DESC, sh) AS rk
                  FROM s)
            SELECT c_custkey, CAST(sh AS INT) AS shard
            FROM r WHERE rk = 1
        """,
        "feature_hash": """
            WITH toks AS (
              SELECT doc_id, lower(t) AS t
              FROM documents, LATERAL (SELECT unnest(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> '')) AS t)
                   g),
            hb AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)
                       % 16 AS b,
                     CASE WHEN CAST(concat('0x', substr(md5(t), 9, 1))
                               AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
              FROM toks),
            agg AS (SELECT doc_id, b, sum(s) AS v FROM hb GROUP BY 1, 2),
            grid AS (
              SELECT doc_id, f
              FROM (SELECT DISTINCT doc_id FROM toks),
                   unnest(range(0, 16)) AS t(f)),
            dense AS (
              SELECT g.doc_id, g.f, coalesce(a.v, 0) AS v
              FROM grid g
              LEFT JOIN agg a ON a.doc_id = g.doc_id AND a.b = g.f)
            SELECT doc_id,
                   string_agg(CAST(v AS VARCHAR), ',' ORDER BY f)
                     AS features_csv
            FROM dense GROUP BY doc_id
        """,
        "cms_counts": """
            WITH s AS (SELECT l_partkey AS item FROM lineitem),
            grid AS (
              SELECT r,
                     CAST(concat('0x', substr(md5(r || '#'
                          || CAST(item AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 256 AS b,
                     count(*) AS n
              FROM s, unnest(range(0, 4)) AS t(r)
              GROUP BY 1, 2),
            items AS (SELECT DISTINCT item FROM s WHERE item < 100),
            probes AS (
              SELECT item, r,
                     CAST(concat('0x', substr(md5(r || '#'
                          || CAST(item AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 256 AS b
              FROM items, unnest(range(0, 4)) AS t(r))
            SELECT CAST(item AS BIGINT) AS item,
                   CAST(min(coalesce(n, 0)) AS BIGINT) AS est_count
            FROM probes LEFT JOIN grid USING (r, b)
            GROUP BY item
        """,
        "twap": """
            WITH d AS (
              SELECT user_id, event_id, value,
                     epoch_us(ts::TIMESTAMP) / 1000000.0 AS t
              FROM events),
            l AS (
              SELECT user_id, value, t,
                     lead(t) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id) - t AS dt
              FROM d)
            SELECT user_id,
                   round(sum(value * dt) / sum(dt), 4) AS twap,
                   round(sum(dt), 4) AS span_seconds,
                   CAST(count(*) AS BIGINT) AS n_intervals
            FROM l WHERE dt IS NOT NULL
            GROUP BY user_id
        """,
        "spearman": """
            WITH d AS (
              SELECT event_type,
                     CAST((epoch_us(ts::TIMESTAMP) // 1000000) % 86400
                          AS DOUBLE) AS x,
                     value AS y
              FROM events),
            r AS (
              SELECT event_type,
                     rank() OVER (PARTITION BY event_type ORDER BY x)
                       + (count(*) OVER (PARTITION BY event_type, x) - 1)
                         / 2.0 AS rx,
                     rank() OVER (PARTITION BY event_type ORDER BY y)
                       + (count(*) OVER (PARTITION BY event_type, y) - 1)
                         / 2.0 AS ry
              FROM d),
            a AS (
              SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
                     sum(rx) AS sx, sum(ry) AS sy,
                     sum(rx * ry) AS sxy,
                     sum(rx * rx) AS sxx, sum(ry * ry) AS syy
              FROM r GROUP BY event_type)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   round(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                              AND n * syy - sy * sy > 0 THEN
                         (n * sxy - sx * sy)
                         / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                         END, 4) AS spearman_rho
            FROM a
        """,
        "debruijn_stats": """
            WITH reads AS (
              SELECT upper(regexp_replace(lower(text), '[^acgt]', '', 'g'))
                       AS seq
              FROM documents),
            ok AS (SELECT seq FROM reads WHERE length(seq) >= 6),
            edges AS (
              SELECT DISTINCT substr(seq, i, 5) AS src,
                              substr(seq, i + 1, 5) AS dst
              FROM ok, LATERAL (SELECT unnest(generate_series(1,
                     length(seq) - 5)) AS i) g),
            od AS (SELECT src AS node, count(*) AS outdeg
                   FROM edges GROUP BY src),
            idg AS (SELECT dst AS node, count(*) AS indeg
                    FROM edges GROUP BY dst),
            nodes AS (
              SELECT coalesce(od.node, idg.node) AS node,
                     coalesce(indeg, 0) AS indeg,
                     coalesce(outdeg, 0) AS outdeg
              FROM od FULL JOIN idg ON od.node = idg.node)
            SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(sum(CASE WHEN indeg <= 1 AND outdeg <= 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_linear,
                   CAST(sum(CASE WHEN outdeg > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_branching,
                   CAST(sum(CASE WHEN indeg = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tips,
                   CAST(sum(outdeg) AS BIGINT) AS n_edges
            FROM nodes
        """,
        "minimizers": """
            WITH reads AS (
              SELECT doc_id,
                     upper(regexp_replace(lower(text), '[^acgt]', '', 'g'))
                       AS seq
              FROM documents),
            ok AS (SELECT doc_id, seq FROM reads WHERE length(seq) >= 8),
            h AS (
              SELECT doc_id,
                     list_transform(generate_series(1, length(seq) - 4),
                                    i -> md5(substr(seq, i, 5))) AS harr
              FROM ok),
            m AS (
              SELECT doc_id, harr,
                     list_distinct(list_transform(
                       generate_series(1, len(harr) - 3),
                       j -> list_min(harr[j:j+3]))) AS mins
              FROM h)
            SELECT doc_id, CAST(len(harr) AS BIGINT) AS n_kmers,
                   CAST(len(mins) AS BIGINT) AS n_minimizers,
                   round(len(mins) * 1.0 / len(harr), 4) AS density
            FROM m
        """,
        "debounce": """
            WITH d AS (SELECT event_id, user_id, event_type, ts
                       FROM events WHERE user_id < 60),
            g AS (
              SELECT event_id, user_id, event_type,
                     epoch_us(ts::TIMESTAMP)
                       - lag(epoch_us(ts::TIMESTAMP)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS gap
              FROM d)
            SELECT event_id, user_id, event_type
            FROM g WHERE gap IS NULL OR gap >= 60000000
        """,
        "session_stats": """
            WITH d AS (SELECT user_id, ts FROM events WHERE user_id < 80),
            g AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts::TIMESTAMP)
                             - epoch_us(lag(ts) OVER w ::TIMESTAMP)
                             > 1800000000
                          THEN 1 ELSE 0 END AS is_new
              FROM d
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (
              SELECT user_id, ts,
                     sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
              FROM g),
            per AS (
              SELECT user_id, session_id, count(*) AS n_events,
                     epoch_us(max(ts)::TIMESTAMP)
                       - epoch_us(min(ts)::TIMESTAMP) AS dur_us
              FROM s GROUP BY 1, 2)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_bounces,
                   round(avg(n_events), 4) AS avg_events,
                   round(avg(dur_us / 1000000.0), 4) AS avg_dur_sec
            FROM per GROUP BY user_id
        """,
        "group_mode": """
            WITH c AS (SELECT l_suppkey, l_partkey, count(*) AS n
                       FROM lineitem GROUP BY 1, 2),
            r AS (SELECT l_suppkey, l_partkey, n, row_number() OVER (
                      PARTITION BY l_suppkey
                      ORDER BY n DESC, l_partkey ASC) AS rk
                  FROM c)
            SELECT l_suppkey, l_partkey AS mode_partkey,
                   CAST(n AS BIGINT) AS n
            FROM r WHERE rk = 1
        """,
        "class_tfidf": """
            WITH toks AS (
              SELECT source AS cls, lower(t) AS t
              FROM documents, LATERAL (SELECT unnest(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> '')) AS t)
                   g),
            tfc AS (SELECT cls, t, count(*) AS tf
                    FROM toks GROUP BY 1, 2),
            fterm AS (SELECT t, sum(tf) AS f FROM tfc GROUP BY t),
            am AS (SELECT avg(m) AS a FROM (
                     SELECT cls, sum(tf) AS m FROM tfc GROUP BY cls)),
            w AS (
              SELECT cls, tfc.t, tf * ln(1 + a / f) AS weight
              FROM tfc JOIN fterm ON fterm.t = tfc.t CROSS JOIN am),
            r AS (SELECT cls, t, weight, row_number() OVER (
                      PARTITION BY cls ORDER BY weight DESC, t ASC) AS rk
                  FROM w)
            SELECT cls AS source, t AS term, CAST(rk AS BIGINT) AS rank,
                   round(weight, 4) AS weight
            FROM r WHERE rk <= 5
        """,
        "kl_divergence": """
            WITH toks AS (
              SELECT source AS cls, lower(t) AS t
              FROM documents, LATERAL (SELECT unnest(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> '')) AS t)
                   g),
            tfc AS (SELECT cls, t, count(*) AS n FROM toks GROUP BY 1, 2),
            ct AS (SELECT cls, sum(n) AS ctot FROM tfc GROUP BY cls),
            corpus AS (SELECT t, sum(n) AS cf FROM tfc GROUP BY t),
            tot AS (SELECT sum(cf) AS grand FROM corpus)
            SELECT cls AS source,
                   round(sum((n / ctot) * ln((n / ctot)
                             / (cf / grand))), 6) AS kl_bits_nat,
                   CAST(count(*) AS BIGINT) AS n_terms
            FROM tfc JOIN ct USING (cls) JOIN corpus USING (t)
            CROSS JOIN tot
            GROUP BY cls
        """,
        "nearest_station": """
            WITH pts AS (
              SELECT c_custkey AS sample_id,
                     41.0 + ((c_custkey * 2654435761) % 600000) / 100000.0
                       AS lat,
                     -87.0 + ((c_custkey * 2246822519) % 700000) / 100000.0
                       AS lon
              FROM customer),
            st AS (
              SELECT n_nationkey AS sid,
                     41.0 + n_nationkey * 0.6 AS slat,
                     -87.0 + n_nationkey * 0.7 AS slon
              FROM nation WHERE n_nationkey < 10),
            j AS (
              SELECT sample_id, sid,
                     2 * 6371.0088 * asin(sqrt(
                       sin(radians(slat - lat)/2) * sin(radians(slat - lat)/2)
                       + cos(radians(lat)) * cos(radians(slat))
                         * sin(radians(slon - lon)/2)
                         * sin(radians(slon - lon)/2))) AS d
              FROM pts CROSS JOIN st),
            r AS (SELECT *, row_number() OVER (PARTITION BY sample_id
                      ORDER BY d, sid) AS rk FROM j)
            SELECT sample_id, CAST(sid AS BIGINT) AS station,
                   round(d, 4) AS dist_km
            FROM r WHERE rk = 1
        """,
        "burstiness": """
            WITH g AS (
              SELECT user_id,
                     (epoch_us(ts::TIMESTAMP)
                      - lag(epoch_us(ts::TIMESTAMP)) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id))
                       / 1000000.0 AS gap
              FROM events),
            d AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL),
            a AS (
              SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
                     sum(gap) AS s, sum(gap * gap) AS q
              FROM d GROUP BY user_id),
            c AS (
              SELECT user_id, n, s / n AS mu,
                     CASE WHEN n >= 2
                          AND (q - n * (s / n) * (s / n)) / (n - 1) >= 0
                          THEN sqrt((q - n * (s / n) * (s / n)) / (n - 1))
                     END AS sd
              FROM a)
            SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
                   round(mu, 4) AS mean_gap_sec,
                   round(CASE WHEN sd IS NOT NULL AND sd + mu > 0
                              THEN (sd - mu) / (sd + mu) END, 4)
                     AS burstiness
            FROM c
        """,
        "gini": """
            WITH counts AS (
              SELECT l_returnflag AS sample, l_partkey AS taxon,
                     CAST(sum(l_quantity) AS DOUBLE) AS cnt
              FROM lineitem GROUP BY 1, 2),
            r AS (
              SELECT sample, cnt, row_number() OVER (
                       PARTITION BY sample ORDER BY cnt ASC, taxon ASC) AS i
              FROM counts WHERE cnt >= 0),
            a AS (
              SELECT sample, CAST(count(*) AS DOUBLE) AS n,
                     sum(cnt) AS s, sum(i * cnt) AS isum
              FROM r GROUP BY sample)
            SELECT sample, CAST(n AS BIGINT) AS n,
                   round(CASE WHEN s > 0 THEN
                         2 * isum / (n * s) - (n + 1) / n END, 4) AS gini
            FROM a
        """,
        "benford": """
            WITH d AS (
              SELECT l_returnflag AS g, abs(l_extendedprice) AS x
              FROM lineitem WHERE abs(l_extendedprice) > 0),
            fd0 AS (
              SELECT g, CAST(floor(x / pow(10.0, floor(log10(x)))) AS INT)
                       AS fd
              FROM d),
            fd1 AS (SELECT g, CASE WHEN fd > 9 OR fd < 1 THEN 1 ELSE fd END
                             AS fd FROM fd0),
            counts AS (SELECT g, fd, count(*) AS c FROM fd1 GROUP BY 1, 2),
            tot AS (SELECT g, sum(c) AS n FROM counts GROUP BY g),
            -- densify to all 9 digits: unobserved digits contribute p_d
            -- to the chi2 and the max deviation (matches the engine)
            dense AS (
              SELECT tot.g, dd.fd, coalesce(counts.c, 0) AS c, tot.n
              FROM tot CROSS JOIN (SELECT unnest(range(1, 10)) AS fd) dd
              LEFT JOIN counts ON counts.g = tot.g AND counts.fd = dd.fd),
            j AS (
              SELECT g, c * 1.0 / n AS p,
                     log10(1 + 1.0 / fd) AS e, n
              FROM dense)
            SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
                   round(sum((p - e) * (p - e) / e) * max(n), 4)
                     AS benford_chi2,
                   round(max(abs(p - e)), 4) AS max_abs_dev
            FROM j GROUP BY g
        """,
        "simpson": """
            WITH counts AS (
              SELECT l_returnflag AS sample, l_partkey AS taxon,
                     CAST(sum(l_quantity) AS DOUBLE) AS cnt
              FROM lineitem GROUP BY 1, 2),
            tot AS (SELECT sample, sum(cnt) AS t FROM counts
                    GROUP BY sample),
            s AS (
              SELECT counts.sample,
                     sum((cnt / t) * (cnt / t)) AS sp
              FROM counts JOIN tot USING (sample)
              GROUP BY counts.sample)
            SELECT sample, round(1 - sp, 4) AS simpson,
                   round(1 / sp, 4) AS inv_simpson
            FROM s
        """,
        "zipf_slope": """
            WITH vocab AS (
              SELECT lower(t) AS t, count(*) AS n
              FROM documents, LATERAL (SELECT unnest(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> '')) AS t)
                   g
              GROUP BY 1),
            ranked AS (
              SELECT ln(CAST(row_number() OVER (
                       ORDER BY n DESC, t ASC) AS DOUBLE)) AS x,
                     ln(CAST(n AS DOUBLE)) AS y
              FROM vocab
              QUALIFY row_number() OVER (ORDER BY n DESC, t ASC) <= 1000),
            a AS (
              SELECT CAST(count(*) AS DOUBLE) AS n,
                     sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                     sum(x * x) AS sxx, sum(y * y) AS syy
              FROM ranked)
            SELECT CAST(n AS BIGINT) AS n_terms,
                   round(CASE WHEN n * sxx - sx * sx <> 0 THEN
                         (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 4)
                     AS zipf_slope,
                   round(CASE WHEN n * sxx - sx * sx <> 0
                              AND n * syy - sy * sy <> 0 THEN
                         ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                         / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                         END, 4) AS r2
            FROM a
        """,
        "oov_rate": """
            WITH d AS (
              SELECT doc_id, lang, text,
                     CAST(concat('0x', substr(md5(concat('split:',
                          CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                       % 100 AS b
              FROM documents),
            toks AS (
              SELECT lang, b, lower(t) AS t
              FROM d, LATERAL (SELECT unnest(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> '')) AS t)
                   g),
            tv AS (SELECT DISTINCT t FROM toks WHERE b < 80),
            val AS (SELECT lang, toks.t, tv.t AS seen
                    FROM toks LEFT JOIN tv ON tv.t = toks.t
                    WHERE b >= 80)
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_val_tokens,
                   CAST(sum(CASE WHEN seen IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_oov,
                   round(avg(CASE WHEN seen IS NULL THEN 1.0 ELSE 0.0 END),
                         6) AS oov_rate
            FROM val GROUP BY lang
        """,
        "orf_count": _orf_count_sql(),
        "base_entropy": """
            WITH reads AS (
              SELECT doc_id,
                     upper(regexp_replace(lower(text), '[^acgt]', '', 'g'))
                       AS seq
              FROM documents),
            ok AS (SELECT doc_id, seq FROM reads WHERE length(seq) >= 10),
            c AS (
              SELECT doc_id, CAST(length(seq) AS DOUBLE) AS n,
                     CAST(length(seq)
                          - length(replace(seq, 'A', '')) AS DOUBLE) AS ca,
                     CAST(length(seq)
                          - length(replace(seq, 'C', '')) AS DOUBLE) AS cc,
                     CAST(length(seq)
                          - length(replace(seq, 'G', '')) AS DOUBLE) AS cg,
                     CAST(length(seq)
                          - length(replace(seq, 'T', '')) AS DOUBLE) AS ct
              FROM ok)
            SELECT doc_id, CAST(n AS BIGINT) AS seq_len,
                   round(
                     (CASE WHEN ca > 0 THEN -(ca/n) * log2(ca/n)
                           ELSE 0.0 END)
                     + (CASE WHEN cc > 0 THEN -(cc/n) * log2(cc/n)
                             ELSE 0.0 END)
                     + (CASE WHEN cg > 0 THEN -(cg/n) * log2(cg/n)
                             ELSE 0.0 END)
                     + (CASE WHEN ct > 0 THEN -(ct/n) * log2(ct/n)
                             ELSE 0.0 END), 4) AS base_entropy_bits
            FROM c
        """,
        "psi_drift": """
            WITH refd AS (SELECT value FROM events WHERE user_id < 75),
            curd AS (SELECT value FROM events WHERE user_id >= 75),
            edges AS (
              SELECT quantile_cont(value,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
              FROM refd),
            pb AS (
              SELECT len(list_filter(e, x -> value > x)) AS b,
                     count(*) AS cp
              FROM refd CROSS JOIN edges GROUP BY 1),
            qb AS (
              SELECT len(list_filter(e, x -> value > x)) AS b,
                     count(*) AS cq
              FROM curd CROSS JOIN edges GROUP BY 1),
            tp AS (SELECT sum(cp) AS tp FROM pb),
            tq AS (SELECT sum(cq) AS tq FROM qb),
            j AS (
              SELECT coalesce(cp, 0) * 1.0 / tp AS p,
                     coalesce(cq, 0) * 1.0 / tq AS q
              FROM pb FULL JOIN qb USING (b)
              CROSS JOIN tp CROSS JOIN tq)
            SELECT round(sum(CASE WHEN p > 0 AND q > 0
                               THEN (p - q) * ln(p / q) END), 6) AS psi,
                   CAST(sum(CASE WHEN p > 0 AND q > 0 THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_empty_bins,
                   CAST(count(*) AS BIGINT) AS n_bins
            FROM j
        """,
        "ks_test": """
            WITH d AS (
              SELECT event_type,
                     CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
                     value
              FROM events),
            g AS (
              SELECT event_type, value,
                     sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ca,
                     sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS cb
              FROM d GROUP BY 1, 2),
            w AS (
              SELECT event_type,
                     sum(ca) OVER wc * 1.0 / sum(ca) OVER wa AS fa,
                     sum(cb) OVER wc * 1.0 / sum(cb) OVER wa AS fb,
                     sum(ca) OVER wa AS na, sum(cb) OVER wa AS nb
              FROM g
              WINDOW wc AS (PARTITION BY event_type ORDER BY value
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW),
                     wa AS (PARTITION BY event_type))
            SELECT event_type,
                   CAST(max(na) AS BIGINT) AS n_a,
                   CAST(max(nb) AS BIGINT) AS n_b,
                   round(max(abs(fa - fb)), 6) AS ks_d
            FROM w GROUP BY event_type
        """,
        "js_divergence": """
            WITH toks AS (
              SELECT source AS cls, lower(t) AS t
              FROM documents, LATERAL (SELECT unnest(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> '')) AS t)
                   g),
            cnt AS (SELECT cls, t, count(*) AS n FROM toks GROUP BY 1, 2),
            tot AS (SELECT cls, sum(n) AS tt FROM cnt GROUP BY cls),
            p AS (SELECT cnt.cls, t, n / tt AS p
                  FROM cnt JOIN tot ON tot.cls = cnt.cls),
            cl AS (SELECT DISTINCT cls FROM p),
            pairs AS (SELECT a.cls AS ca, b.cls AS cb
                      FROM cl a JOIN cl b ON a.cls < b.cls),
            u AS (
              SELECT ca, cb, t, max(pa) AS pa, max(pb) AS pb FROM (
                SELECT pr.ca, pr.cb, p.t, p.p AS pa, 0.0 AS pb
                FROM pairs pr JOIN p ON p.cls = pr.ca
                UNION ALL
                SELECT pr.ca, pr.cb, p.t, 0.0, p.p
                FROM pairs pr JOIN p ON p.cls = pr.cb)
              GROUP BY 1, 2, 3)
            SELECT ca AS source_a, cb AS source_b,
                   round(sum(
                     (CASE WHEN pa > 0
                           THEN pa * ln(pa / ((pa + pb) / 2))
                           ELSE 0.0 END) / 2
                     + (CASE WHEN pb > 0
                             THEN pb * ln(pb / ((pa + pb) / 2))
                             ELSE 0.0 END) / 2), 6) AS js_divergence
            FROM u GROUP BY 1, 2
        """,
        "kl_top_terms": """
            WITH toks AS (
              SELECT source AS cls, lower(t) AS t
              FROM documents, LATERAL (SELECT unnest(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> '')) AS t)
                   g),
            tfc AS (SELECT cls, t, count(*) AS n FROM toks GROUP BY 1, 2),
            ct AS (SELECT cls, sum(n) AS ctot FROM tfc GROUP BY cls),
            corpus AS (SELECT t, sum(n) AS cf FROM tfc GROUP BY t),
            tot AS (SELECT sum(cf) AS grand FROM corpus),
            j AS (
              SELECT tfc.cls, tfc.t,
                     (n / ctot) * ln((n / ctot) / (cf / grand)) AS contrib
              FROM tfc JOIN ct USING (cls) JOIN corpus USING (t)
              CROSS JOIN tot),
            r AS (SELECT cls, t, contrib, row_number() OVER (
                      PARTITION BY cls ORDER BY contrib DESC, t ASC) AS rk
                  FROM j)
            SELECT cls AS source, t AS term, CAST(rk AS BIGINT) AS rank,
                   round(contrib, 6) AS kl_contrib
            FROM r WHERE rk <= 3
        """,
        "vocab_growth": """
            WITH toks AS (
              SELECT CAST(floor(doc_id / 50) AS BIGINT) AS batch,
                     substr(text, i, 6) AS t
              FROM documents, LATERAL (SELECT unnest(generate_series(1,
                     greatest(length(text) - 5, 1))) AS i) g
              WHERE length(substr(text, i, 6)) = 6),
            fs AS (SELECT t, min(batch) AS batch FROM toks GROUP BY t),
            np AS (SELECT batch, count(*) AS n_new_tokens
                   FROM fs GROUP BY batch)
            SELECT CAST(batch AS BIGINT) AS batch,
                   CAST(n_new_tokens AS BIGINT) AS n_new_tokens,
                   CAST(sum(n_new_tokens) OVER (ORDER BY batch
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_vocab
            FROM np
        """,
        "rfm_segments": """
            WITH a AS (
              SELECT user_id,
                     max(epoch_us(ts::TIMESTAMP)) AS last_us,
                     count(*) AS frequency,
                     round(sum(value), 4) AS monetary
              FROM events GROUP BY user_id),
            th AS (
              SELECT quantile_cont(last_us, [0.2, 0.4, 0.6, 0.8]) AS r_th,
                     quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS f_th,
                     quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS m_th
              FROM a),
            s AS (
              SELECT user_id, frequency, monetary,
                     CASE WHEN last_us >= r_th[4] THEN 1
                          WHEN last_us >= r_th[3] THEN 2
                          WHEN last_us >= r_th[2] THEN 3
                          WHEN last_us >= r_th[1] THEN 4 ELSE 5 END AS r_score,
                     CASE WHEN frequency >= f_th[4] THEN 1
                          WHEN frequency >= f_th[3] THEN 2
                          WHEN frequency >= f_th[2] THEN 3
                          WHEN frequency >= f_th[1] THEN 4 ELSE 5 END AS f_score,
                     CASE WHEN monetary >= m_th[4] THEN 1
                          WHEN monetary >= m_th[3] THEN 2
                          WHEN monetary >= m_th[2] THEN 3
                          WHEN monetary >= m_th[1] THEN 4 ELSE 5 END AS m_score
              FROM a, th)
            SELECT user_id, CAST(frequency AS BIGINT) AS frequency,
                   monetary,
                   CAST(r_score AS BIGINT) AS r_score,
                   CAST(f_score AS BIGINT) AS f_score,
                   CAST(m_score AS BIGINT) AS m_score,
                   concat(r_score, f_score, m_score) AS rfm
            FROM s
        """,
        "ohlc_bars": """
            WITH d AS (
              SELECT event_type,
                     CAST(floor((epoch_us(ts::TIMESTAMP) // 1000000)
                                / 86400) * 86400 AS BIGINT) AS day,
                     epoch_us(ts::TIMESTAMP) // 1000000 AS s,
                     event_id, value
              FROM events),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY event_type, day
                          ORDER BY s, event_id) AS ro,
                     row_number() OVER (PARTITION BY event_type, day
                          ORDER BY s DESC, event_id DESC) AS rc
              FROM d)
            SELECT event_type, day,
                   round(max(CASE WHEN ro = 1 THEN value END), 4) AS open,
                   round(max(value), 4) AS high,
                   round(min(value), 4) AS low,
                   round(max(CASE WHEN rc = 1 THEN value END), 4) AS close,
                   CAST(count(*) AS BIGINT) AS volume
            FROM r GROUP BY 1, 2
        """,
    }
