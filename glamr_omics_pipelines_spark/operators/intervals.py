"""Genomic-interval toolkit: merge / coverage-depth / nearest-feature.

The reference manipulates interval-shaped data throughout its mapping and
binning layers — contig spans joined to gene calls (postgres.Rmd
contig⨝gene views), per-base coverage from mapped reads (coverM in
Snakefile's read-mapping rules feeds `contig_abund`), and
feature-adjacency lookups in the annotation joins. The classic toolkit for
these shapes is bedtools (merge / genomecov / closest); these operators are
the Spark-first re-expressions over (group, start, end) interval rows:

  - merge_intervals: flatten overlapping + book-ended intervals per group
    into maximal islands (bedtools merge). One window over
    (group, start) — running max(end) over preceding rows marks island
    starts, a running sum numbers islands, one groupBy emits them.
  - coverage_depth: sweep-line depth segments (bedtools genomecov).
    Each interval contributes +1 at start and −1 at end (half-open);
    deltas collapse per position, a cumulative-sum window yields the
    depth between consecutive breakpoints.
  - nearest_feature: for each point, the nearest feature position in the
    same group (bedtools closest), via the engine's union-merge pattern
    (operators/joins.py as-of join): ONE shuffle of points ∪ features,
    prev/next neighbors from two ordered windows, no per-point probe join.

Scale: all three shuffle once on the group key and never materialize a
pair join. Window sort cost is per-group; genomic groups (contigs,
samples) are naturally bounded. Determinism: ties are resolved by
position then id, and equal-position features pre-collapse, so results
are layout-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(df: DataFrame, group_cols: list[str], start_col: str,
                    end_col: str) -> DataFrame:
    """bedtools-merge: collapse overlapping and book-ended (start == prev
    end) intervals per group into maximal islands.

    Output: group cols + ``merged_start``, ``merged_end``, ``n_merged``
    (intervals absorbed into the island). A new island begins where an
    interval's start exceeds the running max end of every earlier-sorted
    interval; the island id is the running count of such breaks, so the
    result is independent of tie order among equal starts.
    """
    w = Window.partitionBy(*group_cols).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(prev_max.isNull() | (F.col(start_col) > prev_max),
                    F.lit(1)).otherwise(F.lit(0))
    island = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (df.withColumn("_island", island)
            .groupBy(*group_cols, "_island")
            .agg(F.min(start_col).alias("merged_start"),
                 F.max(end_col).alias("merged_end"),
                 F.count(F.lit(1)).alias("n_merged"))
            .drop("_island"))


def coverage_depth(df: DataFrame, group_cols: list[str], start_col: str,
                   end_col: str) -> DataFrame:
    """bedtools-genomecov sweep: depth segments per group from half-open
    [start, end) intervals.

    Output: group cols + ``seg_start``, ``seg_end``, ``depth`` for every
    breakpoint-to-breakpoint span with depth > 0. The sweep is one
    explode (±1 deltas), one per-position collapse (makes the cumsum
    deterministic under ties), and one cumulative-sum window — never a
    per-base explode, so a 100 kb contig costs 2 rows, not 100k.
    """
    deltas = df.select(
        *group_cols,
        F.explode(F.array(
            F.struct(F.col(start_col).cast("long").alias("pos"),
                     F.lit(1).alias("delta")),
            F.struct(F.col(end_col).cast("long").alias("pos"),
                     F.lit(-1).alias("delta")))).alias("_e"))
    deltas = deltas.select(*group_cols, "_e.pos", "_e.delta")
    collapsed = (deltas.groupBy(*group_cols, "pos")
                 .agg(F.sum("delta").alias("delta")))
    w = Window.partitionBy(*group_cols).orderBy("pos")
    swept = (collapsed
             .withColumn("depth", F.sum("delta").over(
                 w.rowsBetween(Window.unboundedPreceding, 0)))
             .withColumn("seg_end", F.lead("pos").over(w)))
    return (swept.filter(F.col("depth") > 0)
            .filter(F.col("seg_end").isNotNull())
            .select(*group_cols, F.col("pos").alias("seg_start"),
                    "seg_end", F.col("depth").cast("long").alias("depth")))


def coverage_histogram(df: DataFrame, group_cols: list[str], start_col: str,
                       end_col: str) -> DataFrame:
    """bedtools genomecov's default histogram: per group and depth level,
    the total bases covered at exactly that depth (depth > 0). A
    groupBy over :func:`coverage_depth` segments — output is
    (group, depth, bases), tiny regardless of genome size.
    """
    segs = coverage_depth(df, group_cols, start_col, end_col)
    return (segs.groupBy(*group_cols, "depth")
            .agg(F.sum(F.col("seg_end") - F.col("seg_start")).alias("bases")))


def nearest_feature(points: DataFrame, features: DataFrame,
                    group_cols: list[str], point_id: str, point_pos: str,
                    feature_id: str, feature_pos: str) -> DataFrame:
    """bedtools-closest: for every point, the nearest feature position in
    its group, two-sided, via union-merge (single shuffle, no pair join).

    Tie rules (deterministic, layout-independent): features sharing a
    position pre-collapse to the MIN feature id; when the previous and
    next features are equidistant the smaller feature id wins. Points in
    groups with no feature are dropped (inner semantics, like
    ``bedtools closest`` on a chromosome absent from the feature file).

    Output: group cols + point id, ``nearest_id``, ``distance``.
    """
    pid_t = points.schema[point_id].dataType
    fid_t = features.schema[feature_id].dataType
    f1 = (features.groupBy(*group_cols, feature_pos)
          .agg(F.min(feature_id).alias("_fid"))
          .select(*group_cols, F.col(feature_pos).alias("_pos"),
                  F.lit(0).alias("_is_point"),
                  F.lit(None).cast(pid_t).alias("_pid"), "_fid"))
    p1 = points.select(*group_cols, F.col(point_pos).alias("_pos"),
                       F.lit(1).alias("_is_point"),
                       F.col(point_id).alias("_pid"),
                       F.lit(None).cast(fid_t).alias("_fid"))
    u = f1.unionByName(p1)
    # features sort before points at the same position, so a co-located
    # feature is visible to both the prev and the next scan (distance 0).
    asc = (Window.partitionBy(*group_cols).orderBy("_pos", "_is_point")
           .rowsBetween(Window.unboundedPreceding, 0))
    desc = (Window.partitionBy(*group_cols)
            .orderBy(F.col("_pos").desc(), F.col("_is_point"))
            .rowsBetween(Window.unboundedPreceding, 0))
    scanned = (u
               .withColumn("_prev_fid", F.last("_fid", True).over(asc))
               .withColumn("_prev_pos",
                           F.last(F.when(F.col("_fid").isNotNull(),
                                         F.col("_pos")), True).over(asc))
               .withColumn("_next_fid", F.last("_fid", True).over(desc))
               .withColumn("_next_pos",
                           F.last(F.when(F.col("_fid").isNotNull(),
                                         F.col("_pos")), True).over(desc)))
    pts = scanned.filter(F.col("_is_point") == 1)
    d_prev = F.col("_pos") - F.col("_prev_pos")
    d_next = F.col("_next_pos") - F.col("_pos")
    nearest_id = (F.when(F.col("_prev_fid").isNull(), F.col("_next_fid"))
                  .when(F.col("_next_fid").isNull(), F.col("_prev_fid"))
                  .when(d_prev < d_next, F.col("_prev_fid"))
                  .when(d_next < d_prev, F.col("_next_fid"))
                  .otherwise(F.least("_prev_fid", "_next_fid")))
    distance = (F.when(F.col("_prev_fid").isNull(), d_next)
                .when(F.col("_next_fid").isNull(), d_prev)
                .otherwise(F.least(d_prev, d_next)))
    return (pts.filter(F.col("_prev_fid").isNotNull()
                       | F.col("_next_fid").isNotNull())
            .select(*group_cols, F.col("_pid").alias(point_id),
                    nearest_id.alias("nearest_id"),
                    distance.cast("long").alias("distance")))


def subtract_intervals(a: DataFrame, b: DataFrame, group_cols: list[str],
                       start_col: str, end_col: str) -> DataFrame:
    """bedtools-subtract: the parts of A's intervals not covered by any B
    interval, per group — same sweep-line core as :func:`coverage_depth`
    but with SIGNED sources: A contributes ±1 to ``depth_a``, B to
    ``depth_b``, and surviving segments are those with depth_a > 0 and
    depth_b == 0 (adjacent survivors are re-merged so output is maximal
    spans, matching bedtools' merged-complement semantics).

    One union + one per-group ordered window pass — B is never probed
    per-A-interval; cost is O((|A|+|B|) log) within each group.
    """
    def deltas(df: DataFrame, tag: int) -> DataFrame:
        d = df.select(
            *group_cols,
            F.explode(F.array(
                F.struct(F.col(start_col).cast("long").alias("pos"),
                         F.lit(1).alias("d")),
                F.struct(F.col(end_col).cast("long").alias("pos"),
                         F.lit(-1).alias("d")))).alias("_e"))
        return d.select(*group_cols, "_e.pos",
                        (F.col("_e.d") * F.lit(1)).alias("da") if tag == 0
                        else F.lit(0).alias("da"),
                        F.lit(0).alias("db") if tag == 0
                        else F.col("_e.d").alias("db"))

    u = deltas(a, 0).unionByName(deltas(b, 1))
    collapsed = (u.groupBy(*group_cols, "pos")
                 .agg(F.sum("da").alias("da"), F.sum("db").alias("db")))
    w = Window.partitionBy(*group_cols).orderBy("pos")
    run = Window.partitionBy(*group_cols).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0)
    swept = (collapsed
             .withColumn("depth_a", F.sum("da").over(run))
             .withColumn("depth_b", F.sum("db").over(run))
             .withColumn("seg_end", F.lead("pos").over(w))
             .filter(F.col("seg_end").isNotNull()))
    live = (F.col("depth_a") > 0) & (F.col("depth_b") == 0)
    # merge adjacent surviving segments: a survivor starts a new span when
    # the previous row (by pos) was not a survivor
    prev_live = F.lag(live.cast("int")).over(w)
    seg = (swept
           .withColumn("_live", live)
           .withColumn("_new", ((~F.coalesce(prev_live.cast("boolean"),
                                             F.lit(False)))
                                & F.col("_live")).cast("int"))
           .withColumn("_span", F.sum("_new").over(run))
           .filter(F.col("_live")))
    return (seg.groupBy(*group_cols, "_span")
            .agg(F.min("pos").alias("sub_start"),
                 F.max("seg_end").alias("sub_end"))
            .drop("_span"))
