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
    # the pair UNIVERSE comes from the sample-grain totals (a cross at
    # sample grain — metadata-scale), not from the shared-taxon join:
    # sample pairs with NO shared taxa would otherwise be absent from the
    # output entirely, and a downstream ordination (pcoa_coordinates
    # defaults missing pairs to 0) would place the most dissimilar samples
    # at distance 0. Disjoint pairs get minsum 0 → BC = 1, the definition.
    universe = ta.crossJoin(tb).filter(F.col("sample_a") < F.col("sample_b"))
    return (universe.join(shared, ["sample_a", "sample_b"], "left")
            .withColumn("bray_curtis",
                        1 - 2 * F.coalesce(F.col("_minsum"), F.lit(0.0))
                        / (F.col("_ta") + F.col("_tb")))
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


def pcoa_coordinates(dist_pairs: DataFrame, sample_a: str = "sample_a",
                     sample_b: str = "sample_b",
                     dist_col: str = "bray_curtis",
                     n_components: int = 2,
                     iterations: int = 100) -> list[tuple]:
    """Principal-coordinates analysis (classical MDS / Gower 1966) over a
    pairwise-dissimilarity table — the ordination plot (vegan::pcoa /
    ape::pcoa) every amplicon analysis draws from its Bray-Curtis matrix
    (the reference's metacoder/vegan companion step).

    The hybrid spectral shape (same contract as top_principal_component,
    X74): the heavy part — computing the n×n dissimilarity table from a
    100 TB abundance matrix — is the DISTRIBUTED bray_curtis_pairs
    operator; this step collects that SAMPLE-grain table (n = number of
    samples, metadata-scale by definition) and runs double-centering +
    deflated power iteration driver-side. Returns
    [(sample, coord_1, ..., coord_k, eig_1, ..., eig_k)] with the usual
    sign convention (largest-|entry| positive per axis).

    Negative eigenvalues (Bray-Curtis is non-Euclidean) are left to the
    deflation loop: power iteration converges to the largest POSITIVE
    eigenvalues, which are the plotted axes.
    """
    rows = dist_pairs.select(sample_a, sample_b, dist_col).collect()
    samples = sorted({r[0] for r in rows} | {r[1] for r in rows})
    idx = {s: i for i, s in enumerate(samples)}
    n = len(samples)
    d2 = [[0.0] * n for _ in range(n)]
    for r in rows:
        i, j = idx[r[0]], idx[r[1]]
        d2[i][j] = d2[j][i] = float(r[2]) ** 2
    # Gower double-centering: B = -1/2 J D² J, J = I - 11ᵀ/n
    rm = [sum(row) / n for row in d2]
    gm = sum(rm) / n
    b = [[-0.5 * (d2[i][j] - rm[i] - rm[j] + gm) for j in range(n)]
         for i in range(n)]
    coords = [[] for _ in range(n)]
    eigs = []
    for _ in range(n_components):
        # NOT the uniform vector: double-centering makes every row of B sum
        # to 0, so the all-ones direction is exactly B's null space and the
        # iteration would stall at lambda=0. Structured starts (ramps) can
        # also land exactly orthogonal to an eigenvector on symmetric
        # configurations, so seed with a deterministic LCG sequence — full
        # reproducibility, no accidental orthogonality.
        state = 123456789 + 97 * len(eigs)
        v = []
        for _ in range(n):
            state = (1103515245 * state + 12345) % (2 ** 31)
            v.append(state / (2 ** 31) - 0.5)
        nv = sum(x * x for x in v) ** 0.5
        v = [x / nv for x in v]
        lam = 0.0
        for _ in range(iterations):
            w = [sum(b[i][j] * v[j] for j in range(n)) for i in range(n)]
            norm = sum(x * x for x in w) ** 0.5
            if norm == 0.0:
                break
            v = [x / norm for x in w]
            lam = sum(v[i] * sum(b[i][j] * v[j] for j in range(n))
                      for i in range(n))
        pivot = max(range(n), key=lambda i: abs(v[i]))
        if v[pivot] < 0:
            v = [-x for x in v]
        scale = (lam ** 0.5) if lam > 0 else 0.0
        for i in range(n):
            coords[i].append(v[i] * scale)
        eigs.append(lam)
        # deflate: B ← B − λ v vᵀ
        b = [[b[i][j] - lam * v[i] * v[j] for j in range(n)]
             for i in range(n)]
    return [tuple([samples[i]] + coords[i] + eigs) for i in range(n)]
