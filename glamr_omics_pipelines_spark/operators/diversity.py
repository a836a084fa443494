"""Ecological diversity metrics over abundance tables.

The reference computes community composition downstream of the warehouse
(metacoder heat trees, code/plot_metacoder*.R; amplicon ASV matrices,
code/ampliconTrunc.R:318-323) — the standard analytical companions are the
diversity indices ecologists run on exactly these sample × taxon count
tables. Implemented Spark-first:

  - shannon_diversity: per-sample H' = -Σ p·ln p, richness, and Pielou
    evenness — one taxon-grain partial agg + a group-grain totals broadcast.
  - bray_curtis_pairs: pairwise sample dissimilarity
    1 − 2·Σ min(aᵢ,bᵢ) / (Σa + Σb) — an INNER taxon join computes Σ min
    (absent taxa contribute 0 to the min-sum), totals broadcast per sample;
    the pair join is sample-grain, never taxon-grain × taxon-grain.
  - rarefaction_counts: expected richness at subsampled depths via the
    engine's deterministic md5-bucket subsample (operators/sampling.py) —
    ONE scan computes every depth with conditional count-distincts, and the
    subsample is engine-portable, so an ANSI oracle reproduces it exactly
    (classic rarefaction's hypergeometric expectation is a per-taxon
    driver-side formula; the hash form is the partition-parallel analog).

Scale: all three shuffle at taxon or sample grain (≪ reads); nothing
materializes a dense sample × taxon matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.operators.sampling import hash_bucket


def shannon_diversity(df: DataFrame, sample_col: str, count_col: str) -> DataFrame:
    """Per-sample Shannon index over taxon-count rows: H' = -Σ pᵢ ln pᵢ,
    richness (taxa with count > 0), Pielou evenness H'/ln(richness)
    (null for single-taxon samples). Input grain: one row per
    (sample, taxon) with a count column; zero/negative counts are dropped.
    """
    d = df.filter(F.col(count_col) > 0)
    totals = d.groupBy(sample_col).agg(F.sum(count_col).alias("_total"))
    p = (d.join(F.broadcast(totals), sample_col)
         .withColumn("_p", F.col(count_col) / F.col("_total")))
    out = (p.groupBy(sample_col)
           .agg((-F.sum(F.col("_p") * F.log("_p"))).alias("shannon"),
                F.count(F.lit(1)).alias("richness")))
    even = F.when(F.col("richness") > 1,
                  F.col("shannon") / F.log(F.col("richness").cast("double")))
    return out.withColumn("evenness", even)


def bray_curtis_pairs(df: DataFrame, sample_col: str, taxon_col: str,
                      count_col: str) -> DataFrame:
    """Pairwise Bray-Curtis dissimilarity between samples:
    BC(a,b) = 1 − 2·Σᵢ min(aᵢ, bᵢ) / (Σa + Σb), sample_a < sample_b.

    Shared-taxon min-sums come from an INNER equi join at taxon grain
    (taxa absent from either side add 0 to the min-sum, so the outer join
    is unnecessary); per-sample totals are a one-row-per-sample broadcast.
    The cross-pair fan-out happens at SAMPLE grain — pairs of aggregates,
    not pairs of taxon vectors.
    """
    d = (df.filter(F.col(count_col) > 0)
         .groupBy(sample_col, taxon_col)
         .agg(F.sum(count_col).alias("_n")))
    totals = d.groupBy(sample_col).agg(F.sum("_n").alias("_total"))
    a = d.select(F.col(sample_col).alias("sample_a"),
                 F.col(taxon_col).alias("_t"), F.col("_n").alias("_na"))
    b = d.select(F.col(sample_col).alias("sample_b"),
                 F.col(taxon_col).alias("_t"), F.col("_n").alias("_nb"))
    shared = (a.join(b, "_t").filter(F.col("sample_a") < F.col("sample_b"))
              .groupBy("sample_a", "sample_b")
              .agg(F.sum(F.least("_na", "_nb")).alias("_minsum")))
    ta = totals.select(F.col(sample_col).alias("sample_a"),
                       F.col("_total").alias("_ta"))
    tb = totals.select(F.col(sample_col).alias("sample_b"),
                       F.col("_total").alias("_tb"))
    return (shared.join(F.broadcast(ta), "sample_a")
            .join(F.broadcast(tb), "sample_b")
            .withColumn("bray_curtis",
                        1 - 2 * F.col("_minsum") / (F.col("_ta") + F.col("_tb")))
            .select("sample_a", "sample_b", "bray_curtis"))


def rarefaction_counts(df: DataFrame, sample_col: str, taxon_col: str,
                       key_col: str, depths_pct: list[int] = (10, 50, 100),
                       salt: str = "rare") -> DataFrame:
    """Observed richness per sample at deterministic subsample depths:
    for each depth p%, the distinct taxa among rows whose md5 bucket of
    ``key_col`` falls below p — the engine-portable rarefaction curve
    (depths nest: the 10% subset ⊆ the 50% subset ⊆ all).

    A taxon is observed at depth p iff its MINIMUM key bucket within the
    sample is < p, so the scan reduces to one (sample, taxon) min-bucket
    partial agg followed by plain conditional sums — no count-distinct, no
    Catalyst expand (the multi-distinct form shuffled the exploded input
    once PER DEPTH; this shape shuffles the taxon grain once, then a
    sample-grain rollup). Output long-form: (sample, depth_pct, richness).
    """
    b = hash_bucket(key_col, 100, salt)
    minb = (df.groupBy(sample_col, taxon_col)
            .agg(F.min(b).alias("_minb")))
    aggs = [F.sum((F.col("_minb") < p).cast("long")).alias(f"_d{p}")
            for p in depths_pct]
    wide = minb.groupBy(sample_col).agg(*aggs)
    parts = ", ".join(f"{p}, _d{p}" for p in depths_pct)
    return wide.selectExpr(
        sample_col,
        f"stack({len(depths_pct)}, {parts}) as (depth_pct, richness)")


def chao1_richness(df: DataFrame, sample_col: str, count_col: str) -> DataFrame:
    """Chao1 estimated total richness per sample (bias-corrected):
    S_obs + F1·(F1−1) / (2·(F2+1)), where F1/F2 are the singleton and
    doubleton taxon counts — the standard "how many taxa did we MISS"
    estimator reported next to rarefaction curves. Input grain: one row per
    (sample, taxon) with an integer observation count.

    One partial-aggregated groupBy per sample; the estimator is row-local
    arithmetic on three per-sample longs.
    """
    d = df.filter(F.col(count_col) > 0)
    agg = (d.groupBy(sample_col)
           .agg(F.count(F.lit(1)).alias("s_obs"),
                F.sum((F.col(count_col) == 1).cast("long")).alias("f1"),
                F.sum((F.col(count_col) == 2).cast("long")).alias("f2")))
    est = (F.col("s_obs")
           + F.col("f1") * (F.col("f1") - 1) / (2 * (F.col("f2") + 1)))
    return agg.withColumn("chao1", est)
