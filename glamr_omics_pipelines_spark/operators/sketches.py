"""Mergeable distinct-count sketches (HyperLogLog) for incremental rollups.

The reference counts distinct samples with a hand-rolled recursive-CTE skip
scan (postgres.Rmd:22-37) and re-scans on every refresh. At 100 TB the scale
pattern is a MERGEABLE sketch table: aggregate each ingest batch / fine
partition into an HLL sketch once, then answer any coarser-grain distinct
query by UNIONING sketches — no fact re-scan, error ~1.04/sqrt(2^lgk).

Built on Spark's native Datasketches bindings (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate, JVM-side, partial-aggregable): the
sketch column is a BINARY that parquet stores like any other column, so a
warehouse can keep (day, sample_type, sketch) and roll up to months on
demand.

Exact-vs-approx policy: estimates are approximate, so these operators are
pytest-verified (tolerance + mergeability invariants), not DuckDB
hash-oracled — a different HLL implementation would legitimately disagree in
the last digits (same disposition as the reference's own approx paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hll_sketch(df: DataFrame, group_cols: list[str], value_col: str,
               lgk: int = 12, out: str = "hll_sketch") -> DataFrame:
    """One HLL sketch per group over ``value_col`` (binary, mergeable).

    lgk = log2(#registers): error ~1.04/sqrt(2^lgk) (~1.6% at lgk=12).
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(out))


def hll_estimate(sketches: DataFrame, sketch_col: str = "hll_sketch",
                 out: str = "approx_distinct") -> DataFrame:
    """Attach the distinct-count estimate of each sketch row."""
    return sketches.withColumn(
        out, F.hll_sketch_estimate(F.col(sketch_col)))


def hll_rollup(sketches: DataFrame, coarse_cols: list[str],
               sketch_col: str = "hll_sketch",
               out: str = "approx_distinct") -> DataFrame:
    """Distinct counts at a coarser grain by UNIONING fine-grain sketches —
    no re-scan of the fact data, the entire point of keeping sketches.
    ``allowDifferentLgConfigK`` tolerates mixed-precision inputs (the union
    degrades to the coarsest precision present)."""
    merged = sketches.groupBy(*coarse_cols).agg(
        F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias(sketch_col))
    return merged.withColumn(out, F.hll_sketch_estimate(F.col(sketch_col)))


def bottomk_sketch(df: DataFrame, group_col: str, item_col: str,
                   k: int = 64) -> DataFrame:
    """Bottom-k (KMV) sketch per group: the k smallest md5 values over the
    group's DISTINCT items — the MinHash variant Mash/sourmash build genome
    sketches from. md5 (not xxhash64) so the sketch is engine-portable:
    any SQL engine reproduces it bit-for-bit.

    One distinct + one rank window on the group key; sketch size is k rows
    per group regardless of group cardinality — the whole point at 100 TB
    (a genome's 10^7 k-mers compress to k hashes).

    The distinct runs on the RAW item (k-mers are a few bytes) and md5
    only hashes the survivors — shuffling 32-char hex for rows that mostly
    die in the distinct was pure waste (~15% of the sketch build at
    sf0.1, more whenever items are shorter than a hash).

    The rank window is NOT a full per-group sort at scale: Catalyst
    rewrites ``row_number() ... filter <= k`` into a pair of
    WindowGroupLimit nodes, the Partial one BELOW the group exchange — so
    each map partition ships only its k smallest hashes per group and the
    final sort sees ≤ k·partitions rows per group, never the 10^7 k-mers
    (asserted in tests/test_plans.py; a hand-salted two-level bottom-k was
    A/B-measured to add nothing on top of it). Declare the window, let the
    optimizer bound it.
    """
    from pyspark.sql import Window
    hashed = (df.select(F.col(group_col).alias("g"),
                        F.col(item_col).cast("string").alias("_i"))
              .distinct()
              .select("g", F.md5("_i").alias("h")))
    w = Window.partitionBy("g").orderBy("h")
    return (hashed.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))


def mash_distance(sketches: DataFrame, k: int = 64,
                  kmer_k: int = 4) -> DataFrame:
    """Mash distance (Ondov et al. 2016) between every group pair from
    bottom-k sketches: the union-bottom-k Jaccard estimate
    j = |{k smallest of A∪B} ∩ A ∩ B| / k, mapped through the Mash
    formula d = −ln(2j/(1+j)) / kmer_k (d = null when j = 0, i.e. beyond
    the sketch's resolution). The alignment-free genome-distance estimator
    the reference's sourmash sketches feed (Snakefile:2529).

    All relational, pair grain = GROUP pairs (samples, not items): each
    sketch row fans out to its group's pairs via two joins on the tiny
    group list, the union's bottom-k is a rank window per pair (≤2k rows),
    and the shared count is one agg. Never touches the original corpora.
    """
    from pyspark.sql import Window

    from glamr_omics_pipelines_spark.operators import _cache

    # The sketch frame feeds THREE subplans (the group list and both join
    # sides); unpersisted, the whole upstream sketch build — typically a
    # corpus-scale shingle explode + rank window — runs three times. The
    # sketch itself is k rows per group at ANY corpus size, so persisting
    # it is free at scale and releasable via the library registry.
    sketches = _cache.register(sketches)
    groups = sketches.select(F.col("g")).distinct()
    pairs = (groups.select(F.col("g").alias("ga"))
             .join(groups.select(F.col("g").alias("gb")),
                   F.col("ga") < F.col("gb")))
    sa = sketches.select(F.col("g").alias("ga"), "h")
    sb = sketches.select(F.col("g").alias("gb"), "h")
    ua = (pairs.join(sa, "ga")
          .select("ga", "gb", "h", F.lit(1).alias("in_a"),
                  F.lit(0).alias("in_b")))
    ub = (pairs.join(sb, "gb")
          .select("ga", "gb", "h", F.lit(0).alias("in_a"),
                  F.lit(1).alias("in_b")))
    u = (ua.unionByName(ub)
         .groupBy("ga", "gb", "h")
         .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    w = Window.partitionBy("ga", "gb").orderBy("h")
    top = u.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)
    agg = (top.groupBy("ga", "gb")
           .agg(F.sum(F.col("in_a") * F.col("in_b")).alias("shared"),
                F.count(F.lit(1)).alias("union_k")))
    j = F.col("shared") / F.col("union_k")
    dist = F.when(j > 0, -F.log(2 * j / (1 + j)) / F.lit(float(kmer_k)))
    # + 0.0 normalizes IEEE negative zero: at j = 1 the formula is
    # -ln(1)/k = -0.0, which renders '-0.0' and splits a rendered-value
    # hash from an engine that normalizes (caught by the r10 sf0.1
    # robustness pass; the oracle applies the same + 0)
    return (agg.select("ga", "gb", F.col("shared").cast("bigint")
                       .alias("shared"),
                       F.col("union_k").cast("bigint").alias("union_k"),
                       (F.round(j, 6) + F.lit(0.0)).alias("jaccard_est"),
                       (F.round(dist, 6) + F.lit(0.0)).alias("mash_dist")))


def cms_build(df: DataFrame, item_col: str, depth: int = 4,
              width: int = 256,
              weight_col: str | None = None) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over an item
    stream: a depth × width counter grid where row r increments bucket
    md5('r#'||item) mod width. DETERMINISTIC by construction (md5 seeds,
    no RNG), so unlike HLL the whole sketch — and every estimate — is
    value-exact reproducible on any engine; and MERGEABLE (grids add),
    so per-partition/per-day sketches roll up without re-scanning facts.

    One scan: the depth-way explode is a row-local literal transform, and
    the grid is a (row, bucket) partial agg — sketch size depth·width
    counters regardless of stream length.

    ``weight_col``: each row adds that weight instead of 1.  The intended
    use is hash-work hoisting when distinct items ≪ rows: pre-aggregate
    the stream to (item, count) and sketch the weighted item frame —
    value-identical grid, depth·|distinct| md5 calls instead of
    depth·|rows| (measured 2.9 s → sub-second on the 600k-row / 20k-part
    bench stream).
    """
    item = F.col(item_col).cast("string")
    w = (F.col(weight_col).cast("long") if weight_col is not None
         else F.lit(1).cast("long"))
    rows = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 (F.conv(F.substring(F.md5(F.concat(F.lit(f"{r}#"), item)),
                                     1, 8), 16, 10).cast("long")
                  % width).alias("b"))
        for r in range(depth)])
    return (df.select(F.explode(rows).alias("rb"), w.alias("_w"))
            .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
            .agg(F.sum("_w").alias("n")))


def cms_estimate(cms: DataFrame, items: DataFrame, item_col: str,
                 depth: int = 4, width: int = 256,
                 out: str = "est_count") -> DataFrame:
    """Point-query the sketch for each item: min over the depth rows of
    the item's bucket counters (never underestimates; overestimates by
    collision mass bounded by 2N/width w.h.p.). The probe is an equi join
    of the item's depth (row, bucket) keys against the tiny grid —
    broadcast at any realistic width — then a min agg per item.
    """
    item = F.col(item_col).cast("string")
    keys = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 (F.conv(F.substring(F.md5(F.concat(F.lit(f"{r}#"), item)),
                                     1, 8), 16, 10).cast("long")
                  % width).alias("b"))
        for r in range(depth)])
    probes = (items.withColumn("_rb", F.explode(keys))
              .select(item_col, F.col("_rb.r").alias("r"),
                      F.col("_rb.b").alias("b")))
    return (probes.join(F.broadcast(cms), ["r", "b"], "left")
            .groupBy(item_col)
            .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias(out)))


# auto-broadcast ceiling for the bloom probe join: 2^28 bits = 8M
# (word, bits) rows — comfortably inside executor broadcast budgets;
# larger bitmaps go through the optimizer's join choice instead.
_BLOOM_BROADCAST_MAX_BITS = 1 << 28


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 4096,
                k: int = 3, salt: str = "bloom") -> DataFrame:
    """Aggregate a Bloom-filter bitmap over ``key_col`` — the incremental-
    ingestion dedup sketch: build it ONCE over the historical corpus, then
    gate every new batch with :func:`bloom_novel` (a guaranteed-novel key
    never needs the expensive exact/near-dup path; only maybe-seen keys do).

    Representation: ``m_bits`` bits packed 32-per-row as (word, bits) —
    ``m_bits/32`` rows. A 1-billion-key filter at 10 bits/key is 10^10
    bits = ~312M (word, bits) rows (several GB as a relation) — NOT
    broadcastable; :func:`bloom_novel` auto-broadcasts only below
    ``_BLOOM_BROADCAST_MAX_BITS`` and otherwise leaves the probe join to
    the optimizer (shard by word range / bucket the stored bitmap by
    ``word`` at that scale). Bit positions are md5-derived
    (:func:`sampling.hash_bucket` with salts ``{salt}0..{salt}{k-1}``) so
    any engine can reproduce them; the build is one scan + a ``bit_or``
    partial agg on ≤ ``m_bits/32`` keys — no row-grain shuffle.

    Beyond-reference training-data operator (SURVEY §8); reference
    precedent: the exact-dedup family (Snakefile:429-473) whose 1 TB hash
    table this sketch replaces for the cross-batch membership gate.
    """
    from glamr_omics_pipelines_spark.operators.sampling import hash_bucket
    if m_bits % 32 != 0:
        raise ValueError("bloom_build: m_bits must be a multiple of 32")
    if k < 1:
        raise ValueError("bloom_build: k must be >= 1")
    positions = F.array(*[hash_bucket(key_col, m_bits, f"{salt}{h}")
                          for h in range(k)])
    return (df.select(F.explode(positions).alias("pos"))
            .select(F.expr("CAST(pos DIV 32 AS INT)").alias("word"),
                    F.expr("shiftleft(1L, CAST(pos % 32 AS INT))")
                    .alias("mask"))
            .groupBy("word").agg(F.bit_or("mask").alias("bits")))


def bloom_novel(df: DataFrame, key_col: str, bloom: DataFrame,
                m_bits: int = 4096, k: int = 3,
                salt: str = "bloom") -> DataFrame:
    """Test each row's key against a :func:`bloom_build` bitmap.

    Output: one row per input row's key value grain — (``key_col``,
    ``maybe_seen``). ``maybe_seen = false`` GUARANTEES the key was not in
    the built corpus (no false negatives); ``true`` means probably-seen
    (false-positive rate ~(1 - e^{-kn/m})^k). ``m_bits``/``k``/``salt``
    must match the build.

    Plan shape: k scan-stage hash positions per key, a left join against
    the (word, bits) bitmap — broadcast when ``m_bits`` ≤
    ``_BLOOM_BROADCAST_MAX_BITS`` (the common case: a 2^28-bit filter is
    8M words ≈ low hundreds of MB), otherwise left to the optimizer so a
    multi-GB bitmap never hits the 8 GB broadcast wall — and a
    ``bool_and`` over the k probes. The novelty gate for 100 TB
    incremental ingestion: only ``maybe_seen`` rows proceed to the exact
    anti-join / near-dup stages.
    """
    from glamr_omics_pipelines_spark.operators.sampling import hash_bucket
    positions = F.array(*[hash_bucket(key_col, m_bits, f"{salt}{h}")
                          for h in range(k)])
    probes = (df.select(key_col, F.explode(positions).alias("pos"))
              .select(key_col,
                      F.expr("CAST(pos DIV 32 AS INT)").alias("word"),
                      F.expr("shiftleft(1L, CAST(pos % 32 AS INT))")
                      .alias("mask")))
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
           != 0)
    bitmap = (F.broadcast(bloom) if m_bits <= _BLOOM_BROADCAST_MAX_BITS
              else bloom)
    return (probes.join(bitmap, "word", "left")
            .withColumn("_hit", hit)
            .groupBy(key_col).agg(F.bool_and("_hit").alias("maybe_seen")))


def hist_sketch(df: DataFrame, group_cols: list[str], value_col: str,
                width: float = 1.0, bin_col: str = "bin",
                n_col: str = "n") -> DataFrame:
    """Fixed-width histogram sketch per group — the MERGEABLE quantile
    sketch beside HLL (distinct), KMV (similarity) and count-min
    (frequency): aggregate each ingest batch / fine partition into
    (group, bin, n) rows ONCE, roll any coarser grain up with
    :func:`hist_rollup` (bins sum — merging is exact, unlike quantile
    values which don't compose), and answer percentiles from the merged
    bins with :func:`hist_quantiles` at ±``width``/2 value error — no
    fact re-scan, no exact sort of 100 TB.

    Bins are data-INDEPENDENT (``floor(value/width)``), which is what
    makes two sketches built at different times mergeable; pick
    ``width`` from the domain (e.g. dollars for revenue), not the data.
    Beyond-reference operator (SURVEY §8); reference precedent: the
    median-heavy checkM/coverage aggregates (SURVEY §2.4 A4) re-cast in
    sketch form for incremental warehouses.
    """
    if width <= 0:
        raise ValueError("hist_sketch: width must be > 0")
    b = F.floor(F.col(value_col) / F.lit(float(width))).cast("bigint")
    return (df.groupBy(*group_cols, b.alias(bin_col))
            .agg(F.count(F.lit(1)).cast("bigint").alias(n_col)))


def hist_rollup(sketches: DataFrame, coarse_cols: list[str],
                bin_col: str = "bin", n_col: str = "n") -> DataFrame:
    """Merge histogram sketches to a coarser grain: bins sum. Exact —
    rolled-up bins equal the bins a direct scan at the coarse grain
    would produce (the mergeability identity the driver oracle pins)."""
    return (sketches.groupBy(*coarse_cols, bin_col)
            .agg(F.sum(n_col).cast("bigint").alias(n_col)))


def hist_quantiles(sketches: DataFrame, group_cols: list[str],
                   qs: list[float], width: float,
                   bin_col: str = "bin", n_col: str = "n") -> DataFrame:
    """Quantile estimates from a histogram sketch: for each q in ``qs``
    (0 < q <= 1), locate the bin containing rank ``q*N`` via a cumulative
    window, then interpolate linearly inside the bin — error <= ``width``
    per estimate. Output: (group_cols..., q, est).

    Plan shape: one group-partitioned cumulative window over the BIN
    table (bins << rows) + a literal-array explode for the q grid — cost
    is sketch-sized, independent of the fact table."""
    if not qs or any(not (0 < q <= 1) for q in qs):
        raise ValueError("hist_quantiles: each q must be in (0, 1]")
    wcum = (Window.partitionBy(*group_cols).orderBy(bin_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wtot = Window.partitionBy(*group_cols)
    d = (sketches
         .withColumn("_cum", F.sum(n_col).over(wcum))
         .withColumn("_tot", F.sum(n_col).over(wtot))
         .withColumn("q", F.explode(F.array(*[F.lit(float(q))
                                              for q in qs]))))
    r = F.col("q") * F.col("_tot")
    prev = F.col("_cum") - F.col(n_col)
    est = (F.col(bin_col) * F.lit(float(width))
           + F.lit(float(width)) * (r - prev) / F.col(n_col))
    return (d.filter((prev < r) & (F.col("_cum") >= r))
            .select(*group_cols, "q", est.alias("est")))
