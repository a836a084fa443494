"""Deterministic sampling / dataset-split operators for corpus curation.

A training-data pipeline needs samples and train/val/test splits that are
(a) reproducible across runs and engines, (b) stable under re-partitioning,
and (c) computable without any global state. `rand()`-based sampling fails
all three (seed × partition layout dependent); sampling on a content hash of
the KEY fails none: every engine that can md5 a string agrees on membership,
and membership is a pure row-local predicate — no shuffle, fully pushed into
the scan stage, embarrassingly parallel at 100 TB.

The reference's analog is seeded subsampling for test envs
(pypelib/utils.py:357-376, seed=67 RNG) — same intent, made engine-portable.

Hash primitive: first 8 hex chars of md5(key) as an integer, mod ``buckets``.
md5 (not xxhash64) so an ANSI-SQL oracle can reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int = 100,
                salt: str | None = None) -> Column:
    """Deterministic bucket in [0, buckets) from md5 of the key's string form.

    ``salt`` decorrelates independent uses (e.g. a sample and a split over
    the same key must not select the same rows).
    """
    k = F.col(key).cast("string") if isinstance(key, str) else key.cast("string")
    if salt is not None:
        # concat_ws, not concat: concat null-propagates in Spark but SKIPS
        # nulls in most SQL engines (incl. the DuckDB oracle) — concat_ws
        # matches the skip behavior, so a NULL key hashes identically
        # everywhere instead of silently vanishing from the sample.
        k = F.concat_ws("", F.lit(salt + ":"), k)
    h = F.conv(F.substring(F.md5(k), 1, 8), 16, 10).cast("bigint")
    return h % buckets


def hash_sample(df: DataFrame, key: str, fraction_pct: int,
                salt: str | None = None) -> DataFrame:
    """Keep ~fraction_pct% of rows, chosen by key hash — reproducible,
    partition-layout independent, and a pure scan-stage filter (no shuffle)."""
    return df.filter(hash_bucket(key, 100, salt) < fraction_pct)


def cap_per_group(df: DataFrame, group_cols: list[str], key: str, n: int,
                  salt: str | None = "cap") -> DataFrame:
    """Keep at most ``n`` rows per group, chosen deterministically by key
    hash order (tie-broken by the key itself) — the per-source/per-domain
    balancing cap of a corpus pipeline, reproducible across runs and engines.

    One window over (group, hash) — the shuffle is the same the group-by
    would pay; no sort of anything wider than the hash pair.
    """
    from pyspark.sql import Window
    w = Window.partitionBy(*group_cols).orderBy(
        hash_bucket(key, 1 << 31, salt).asc(), F.col(key).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))


def temperature_sample(df: DataFrame, group_cols: list[str], key: str,
                       alpha: float = 0.5, salt: str = "temp") -> DataFrame:
    """α-temperature rebalanced sampling across groups (languages, domains):
    keep each group with probability f_g = min(1, N·n_g^α / (Σn^α · n_g)) so
    group g's expected share moves from its natural proportion p_g toward
    p_g^α / Σp^α — the standard multilingual-pretraining rebalance (head
    groups down-sampled, tail groups kept whole; α=1 is a no-op, α→0
    approaches uniform shares). Down-sampling only: an f_g above 1 is capped
    (up-weighting needs replication, which changes row counts, not sampling).

    Membership is the md5 key-hash predicate of ``hash_bucket`` with the
    per-group fraction joined in (group-grain — broadcasts), so the sample
    is reproducible across runs, engines, and partitionings; the threshold
    integer is round(f*1e6) on both sides so independent float stacks agree
    on the cut.
    """
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    # distinct names from _n even case-insensitively (Spark's default
    # resolver treats _n/_N as the same reference)
    tot = counts.agg(F.sum(F.pow("_n", F.lit(alpha))).alias("_zsum"),
                     F.sum("_n").alias("_total"))
    frac = (counts.crossJoin(F.broadcast(tot))
            .withColumn("_f", F.least(
                F.lit(1.0),
                F.col("_total") * F.pow("_n", F.lit(alpha))
                / (F.col("_zsum") * F.col("_n"))))
            .select(*group_cols, "_f"))
    # round(f*1e6), NOT cast(round(f,6)*1e6): the product of a 6-dp-rounded
    # double with 1e6 can land epsilon BELOW the integer (248.999...97), and
    # Spark's double->bigint cast truncates while SQL CAST rounds — an
    # off-by-one threshold for ~1% of fractions. Rounding the product keeps
    # both engines on the same integer.
    thresh = F.round(F.col("_f") * 1_000_000).cast("bigint")
    return (df.join(F.broadcast(frac), group_cols)
            .filter(hash_bucket(key, 1_000_000, salt) < thresh)
            .drop("_f"))


def mixture_sample(df: DataFrame, group_col: str, key: str,
                   targets: dict, salt: str = "mix") -> DataFrame:
    """Down-sample groups to an EXPLICIT target mixture ("50% en, 30% zh,
    20% de") — the hand-tuned companion of :func:`temperature_sample`'s
    formulaic rebalance. Output is the largest corpus achievable by
    down-sampling only: the binding group (smallest n_g/t_g) is kept
    whole and every other group is thinned to match, so realized shares
    equal the targets exactly in expectation. Groups without a target are
    dropped (explicit mixtures are allow-lists).

    Same engine-portable machinery as temperature_sample: group-grain
    fractions (broadcast), md5 key-hash membership with a round(f·1e6)
    integer threshold so independent float stacks agree on the cut.
    """
    if not targets:
        raise ValueError("mixture_sample needs at least one target share")
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(g, float(t)) for g, t in targets.items()], [group_col, "_t"])
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    # zero/negative target = "exclude this group" (allow-list semantics);
    # it must not enter the feasibility min (n/0 is an ANSI divide error)
    j = counts.join(F.broadcast(tgt), group_col).filter(F.col("_t") > 0)
    # feasibility scale: c = min_g n_g / t_g -> group g keeps c*t_g rows
    c = j.agg(F.min(F.col("_n") / F.col("_t")).alias("_c"))
    frac = (j.crossJoin(F.broadcast(c))
            .withColumn("_f", F.least(F.lit(1.0),
                                      F.col("_c") * F.col("_t")
                                      / F.col("_n")))
            .select(group_col, "_f"))
    thresh = F.round(F.col("_f") * 1_000_000).cast("bigint")
    return (df.join(F.broadcast(frac), group_col)
            .filter(hash_bucket(key, 1_000_000, salt) < thresh)
            .drop("_f"))


def stratified_split(df: DataFrame, key: str, train_pct: int = 80,
                     val_pct: int = 10, salt: str | None = "split",
                     out: str = "split") -> DataFrame:
    """Assign each row to train/val/test by key hash (train_pct / val_pct /
    remainder). Row-local: no shuffle, stable under any partitioning, and a
    row's assignment never changes as the corpus grows — the property that
    keeps eval sets uncontaminated across dataset versions."""
    b = hash_bucket(key, 100, salt)
    return df.withColumn(
        out, F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val").otherwise("test"))


def weighted_sample(df: DataFrame, group_cols: list[str], key: str,
                    weight_col: str, k: int,
                    salt: str = "wsample") -> DataFrame:
    """Weighted sampling without replacement, k rows per group, by the
    Efraimidis–Spirakis exponential-key method made deterministic: each
    row draws u from its md5 key hash (engine-portable, layout-independent)
    and scores ``-ln(u) / w`` — an Exp(w) variate — and the k SMALLEST
    scores win, which samples without replacement with probability
    proportional to weight. The standard way to up-weight high-quality /
    rare-domain documents in a corpus sample while staying reproducible
    (same rows on every run, engine, and partitioning; rows keep their
    score as the corpus grows, so incremental re-samples are stable).

    Rows with non-positive weight are excluded (zero weight = never
    sampled; the Exp(w) key is undefined at w <= 0). One window over
    (group, score) — the same shuffle a per-group top-k pays; the score
    itself is row-local scan-stage arithmetic.
    """
    m = 1 << 20
    u = (hash_bucket(key, m, salt) + F.lit(0.5)) / F.lit(float(m))
    score = -F.log(u) / F.col(weight_col)
    d = (df.filter(F.col(weight_col) > 0)
         .withColumn("es_score", score))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("es_score").asc(), F.col(key).asc())
    return (d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def quantile_gate(df: DataFrame, group_cols: list[str], score_col: str,
                  q: float = 0.25, keep: str = "ge") -> DataFrame:
    """Adaptive per-group quantile threshold filter: keep rows whose
    ``score_col`` is >= (or <= with ``keep='le'``) the group's exact q-th
    quantile. The data-driven form of a quality gate — instead of one global
    cutoff, each group (language, source, domain) sheds its own worst
    fraction, so a low-resource language is not wiped out by a threshold
    tuned on the dominant one.

    Exact ``percentile`` (linear interpolation — same definition as ANSI
    PERCENTILE_CONT / DuckDB quantile_cont) so the gate is engine-portable.
    Scale: thresholds are one row per group (computed with a partial-agg
    groupBy), broadcast back onto the fact scan — the filter itself is a
    row-local comparison; the only full-data shuffle is none.
    """
    if keep not in ("ge", "le"):
        raise ValueError(f"keep must be 'ge' or 'le', got {keep!r}")
    th = (df.groupBy(*group_cols)
          .agg(F.expr(f"percentile({score_col}, {q}d)").alias("threshold")))
    joined = df.join(F.broadcast(th), group_cols)
    cmp = (F.col(score_col) >= F.col("threshold") if keep == "ge"
           else F.col(score_col) <= F.col("threshold"))
    return joined.filter(cmp)


def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   budget: int, shards: int = 32,
                   salt: str | None = "pack") -> DataFrame:
    """Deterministic document packing for fixed-budget training batches:
    assign each doc to a (shard, bin) so bins hold ~``budget`` tokens of
    consecutive docs. The batch-construction step of an LLM data pipeline —
    documents are concatenated into fixed-length streams, and packing
    controls padding waste.

    Semantics: docs are sharded by content hash (row-local), ordered within
    a shard by (hash, id) — a deterministic, engine-portable order — and
    ``bin = floor(prefix_sum_before / budget)``: each bin's doc list starts
    where the previous bin's token interval ended, so a bin overshoots by
    less than one document (streaming-concat-with-carryover semantics; an
    exact next-fit would be inherently sequential state).

    Scale: one shuffle on the shard key; the prefix sum is an ordered
    running-sum window per shard — O(n) per partition, and shard count
    scales parallelism independently of bin budget. No global ordering, no
    driver state.
    """
    d = (df.withColumn("_shard", hash_bucket(id_col, shards, salt))
         .withColumn("_ord", hash_bucket(id_col, 1_000_000_000, salt)))
    w = (Window.partitionBy("_shard").orderBy("_ord", id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return (d.withColumn("bin",
                         F.floor(before / F.lit(budget)).cast("bigint"))
            .withColumnRenamed("_shard", "shard").drop("_ord"))


def rendezvous_assign(df: DataFrame, key_col: str, n_shards: int,
                      out: str = "shard") -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each key goes
    to argmax over shards of md5(key || shard) — the deterministic,
    engine-portable placement rule whose defining property is MINIMAL
    MOVEMENT under resharding (changing n_shards from K to K+1 relocates
    only ~1/(K+1) of keys, vs ~all keys for mod-hashing).

    Row-local: the shard scores are a literal-array max over n_shards md5
    evaluations inside codegen — zero shuffle, usable as a scan-stage
    partitioning column before a write. n_shards is bounded (placement
    fan-out is per-row O(n_shards)); for thousands of shards use
    two-level rendezvous (groups then members).
    """
    key = F.col(key_col).cast("string")
    best = F.array_max(F.array(*[
        F.struct(F.md5(F.concat(key, F.lit(f"#{s}"))).alias("h"),
                 F.lit(s).alias("s"))
        for s in range(n_shards)]))
    return df.withColumn(out, best.getField("s"))


def feature_hash(df: DataFrame, id_col: str, text_col: str,
                 n_features: int = 64) -> DataFrame:
    """Hashing-trick vectorizer (Weinberger et al. 2009): token counts
    folded into a fixed ``n_features``-dim vector by md5(token) mod D,
    with the ± sign bit from the next hash hex digit canceling collision
    bias — the model-free featurizer that needs NO vocabulary table,
    broadcast, or training pass.

    Tokenize-once explode → row-local bucket/sign → one (doc, bucket)
    partial agg → dense vector assembled with a bounded map_from_entries
    lookup. Output dimension is a constant; the shuffle carries
    (doc, bucket) pairs bounded by doc length, never a vocabulary.
    """
    from glamr_omics_pipelines_spark.operators.text import lower_tokens
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(lower_tokens(text_col)).alias("t"))
    h = F.md5(F.col("t"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_features
    sign = F.when(F.conv(F.substring(h, 9, 1), 16, 10)
                  .cast("long") % 2 == 0, 1).otherwise(-1)
    agg = (toks.select("_id", bucket.alias("_b"), sign.alias("_s"))
           .groupBy("_id", "_b")
           .agg(F.sum("_s").cast("double").alias("_v")))
    vec = (agg.groupBy("_id")
           .agg(F.map_from_entries(F.collect_list(
               F.struct(F.col("_b"), F.col("_v")))).alias("_m")))
    dense = F.array(*[F.coalesce(F.col("_m").getItem(i), F.lit(0.0))
                      for i in range(n_features)])
    return vec.select(F.col("_id").alias(id_col),
                      dense.alias("features"))


def leakage_safe_split(df: DataFrame, id_col: str, labels: DataFrame,
                       train_pct: int = 80, salt: str = "split",
                       out: str = "split") -> DataFrame:
    """Dedup-aware train/test split: assign splits at the NEAR-DUP-CLUSTER
    grain so no near-duplicate pair ever straddles the boundary — the
    leakage a row-grain :func:`stratified_split` cannot prevent (a test
    document with a training-set near-duplicate inflates eval scores).

    ``labels`` is a cluster map as produced by
    :func:`dedup.dup_clusters` / ``dup_clusters_star`` — (id, label)
    rows for CLUSTERED docs only. Every row's split is decided by the
    md5 bucket of its cluster representative (its cluster label, or its
    own id for singletons), so cluster members co-travel by
    construction. Output: ``df``'s columns + ``_rep`` (the
    representative) + ``out`` ('train'/'test').

    Plan shape: one left join against the label map (clustered docs
    only — usually small, but UNBOUNDED on a heavy-duplication corpus,
    which is exactly this operator's target regime, so the join strategy
    is left to the optimizer: AQE auto-broadcasts a small map and falls
    back to a shuffled join when it isn't) + a scan-stage md5 bucket;
    deterministic, partition-layout independent. Beyond-reference
    operator (SURVEY §8) — the split half of the contamination story
    whose detection half is split_contamination.
    """
    if not (0 < train_pct < 100):
        raise ValueError("leakage_safe_split: train_pct must be in (0,100)")
    lab = labels.select(F.col("id").alias(id_col),
                        F.col("label").alias("_lab"))
    rep = (df.join(lab, id_col, "left")
           .withColumn("_rep", F.coalesce(F.col("_lab"), F.col(id_col)))
           .drop("_lab"))
    b = hash_bucket(F.col("_rep"), 100, salt)
    return rep.withColumn(
        out, F.when(b < train_pct, F.lit("train")).otherwise(F.lit("test")))


def mixture_plan(df: DataFrame, group_col: str, size_col,
                 token_budget: float, alpha: float = 0.5,
                 max_epochs: float = 4.0,
                 max_rounds: int = 8) -> tuple[DataFrame, int]:
    """α-weighted corpus-mixture planning with epoch caps — the
    data-mixing table a training run is configured from (the GPT-3 /
    DoReMi shape): domain weights ∝ n_tokensᵅ (α < 1 upweights small
    domains), scaled to ``token_budget``, with any domain that would
    repeat more than ``max_epochs`` times CLIPPED at the cap and its
    unused budget water-filled back over the unclipped domains
    (iterated to a fixed point — each round clips at least one new
    domain, so rounds ≤ #domains; ``max_rounds`` is a diagnostic
    backstop).

    Returns ``(plan, rounds)``: one row per domain — (``group_col``,
    n_tokens, epochs, share, clipped) with ``share`` = the fraction of
    the budget the domain receives — plus the number of water-filling
    rounds actually run (callers replaying a fixed-round oracle pin it).

    Scale shape: ONE partial-agg scan reduces the corpus to domain-grain
    (group, n_tokens) rows; the water-filling fixed point runs on that
    metadata-scale table driver-side (domains are tens-to-hundreds — the
    kmeans_lloyd k×dim collect contract). Beyond-reference operator
    (SURVEY §8); completes the sampling family: temperature_sample
    rate-limits rows, mixture_sample hits target shares, mixture_plan
    PLANS the budget.
    """
    if token_budget <= 0:
        raise ValueError("mixture_plan: token_budget must be > 0")
    if max_epochs <= 0:
        raise ValueError("mixture_plan: max_epochs must be > 0")
    size = (F.sum(size_col).cast("double") if size_col is not None
            else F.count(F.lit(1)).cast("double"))
    rows = (df.groupBy(group_col).agg(size.alias("n"))
            .filter(F.col("n") > 0).collect())     # domain-grain
    if not rows:
        raise ValueError("mixture_plan: empty corpus")
    doms = sorted((r[group_col], float(r["n"])) for r in rows)
    clipped: dict = {}
    rounds = 0
    while True:
        rounds += 1
        budget_rem = token_budget - sum(max_epochs * n
                                        for g, n in doms if g in clipped)
        free = [(g, n) for g, n in doms if g not in clipped]
        z = sum(n ** alpha for _, n in free)
        new_clip = False
        epochs = {}
        for g, n in free:
            e = (n ** alpha / z) * budget_rem / n if z > 0 else 0.0
            if e > max_epochs:
                clipped[g] = True
                new_clip = True
            else:
                epochs[g] = e
        if not new_clip or len(clipped) == len(doms):
            break
        if rounds >= max_rounds:
            raise ValueError(
                f"mixture_plan: no fixed point in {max_rounds} rounds "
                f"({len(clipped)}/{len(doms)} domains clipped)")
    spark = df.sparkSession
    out_rows = []
    for g, n in doms:
        e = max_epochs if g in clipped else epochs.get(g, 0.0)
        out_rows.append((g, float(n), float(e),
                         float(e * n / token_budget), g in clipped))
    plan = spark.createDataFrame(
        out_rows, f"`{group_col}` string, n_tokens double, epochs double,"
                  " share double, clipped boolean")
    return plan, rounds
