"""Time-hierarchy rollup (hypertable-style continuous aggregate, batch form).

The reference's only time-series surface is environmental sample metadata
(collection_date, postgres.Rmd:74-82) — no multi-granularity rollups exist
there. This operator supplies the batch form of the classic hypertable
continuous aggregate: ONE pass over the events computes every granularity
level of a time hierarchy (e.g. day ⊃ hour) via GROUP BY ROLLUP, with
partial aggregation combining map-side — no per-granularity rescan, no
self-union of G separate groupBys. At 100 TB the scan dominates, so G
granularities for the price of one is the whole game; the rollup's grouping
sets expand AFTER the partial agg, keeping the shuffle O(distinct buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hypertable_rollup(df: DataFrame, ts_col: str, agg_exprs: list,
                      levels: list[str] = ("day", "hour")) -> DataFrame:
    """Multi-granularity time rollup in one scan.

    ``levels`` are date_trunc granularities ordered coarse→fine; output has
    one column per level (null above a row's grain) plus ``grain`` = number
    of non-null levels (0 = grand total, matching GROUPING arithmetic).
    """
    cols = [F.date_trunc(lv, ts_col).alias(f"bucket_{lv}") for lv in levels]
    grain = None
    for lv in levels:
        # grouping() is only legal inside the rollup's agg list
        g = F.lit(1) - F.grouping(f"bucket_{lv}")
        grain = g if grain is None else grain + g
    return (df.select(*cols, *df.columns)
            .rollup(*[f"bucket_{lv}" for lv in levels])
            .agg(*agg_exprs, grain.cast("bigint").alias("grain")))


def rolling_features(df: DataFrame, group_col: str, ts_col: str,
                     value_col: str, window_seconds: int = 3600) -> DataFrame:
    """Trailing time-RANGE window features per entity: count and mean of
    ``value_col`` over the last ``window_seconds`` (inclusive both ends —
    RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW), attached to every
    row. The feature-engineering primitive behind rate limiting, burst
    detection, and per-user activity features in an event pipeline.

    Uses a rangeBetween frame over epoch SECONDS (not a self-join): one
    shuffle on the group key, then a single ordered pass per partition —
    O(n) with a sliding frame, vs the O(n·w) blowup of the naive
    point-in-interval self-join. The reference has no RANGE frames
    (SURVEY §2.5 'only default frames'); this is an extension operator.
    """
    from glamr_omics_pipelines_spark.operators.windows import epoch_us
    # floor, not cast-truncation: cast('long') truncates toward zero, which
    # diverges from the oracle's integer floor-division for pre-1970
    # timestamps (negative epochs)
    sec = F.floor(epoch_us(ts_col) / F.lit(1_000_000)).cast("long")
    d = df.withColumn("_sec", sec)
    w = (Window.partitionBy(group_col).orderBy("_sec")
         .rangeBetween(-window_seconds, 0))
    return (d.withColumn("trailing_n", F.count(F.lit(1)).over(w))
            .withColumn("trailing_mean", F.avg(value_col).over(w))
            .drop("_sec"))


def funnel_stages(df: DataFrame, user_col: str, ts_col: str, type_col: str,
                  stages: list[str]) -> DataFrame:
    """Ordered funnel analysis: for each user, how far through the ordered
    ``stages`` sequence they progressed, requiring each stage's event to
    occur STRICTLY AFTER the previous stage's first qualifying event
    (first-touch semantics). The conversion-funnel primitive of product
    analytics (view → click → purchase).

    One shuffle total: all stage timestamps are stacked conditional-min
    windows over the SAME user partitioning, so Catalyst reuses one exchange
    for every layer; no per-stage self-join, no collect_list of event
    histories. Output is user-grain.
    """
    w = Window.partitionBy(user_col)
    d = df
    prev_ts = None
    ts_cols = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev_ts is not None:
            cond = cond & (F.col(ts_col) > F.col(prev_ts))
        name = f"_t{i}"
        d = d.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_ts = name
        ts_cols.append(name)
    stage_n = None
    for i, c in enumerate(ts_cols):
        n = F.when(F.col(c).isNotNull(), i + 1).otherwise(0)
        stage_n = n if stage_n is None else F.greatest(stage_n, n)
    out = (d.withColumn("funnel_stage", stage_n)
           .select(user_col, "funnel_stage",
                   *[F.col(c).alias(f"stage{i + 1}_ts")
                     for i, c in enumerate(ts_cols)])
           .distinct())
    return out


def transition_counts(df: DataFrame, key_cols: list[str], ts_col: str,
                      state_col: str,
                      tiebreak_cols: list[str] = ()) -> DataFrame:
    """First-order state-transition (Markov bigram) counts: for each entity
    ordered by time, count consecutive (state → next state) pairs across
    all entities, with each origin state's transition probability. The
    sequence-mining companion to sessionization (user journeys, sample
    processing-state ladders).

    One shuffle on the entity key for the lead window (deterministic under
    timestamp ties via ``tiebreak_cols``); the bigram count is a partial
    agg over the tiny state × state grid, and the per-origin probability
    is a window over that grid — no second data-grain shuffle.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak_cols)
    d = (df.withColumn("_next", F.lead(state_col).over(w))
         .filter(F.col("_next").isNotNull()))
    counts = (d.groupBy(F.col(state_col).alias("state_from"),
                        F.col("_next").alias("state_to"))
              .agg(F.count(F.lit(1)).alias("n")))
    tot = Window.partitionBy("state_from")
    return counts.withColumn("prob", F.col("n") / F.sum("n").over(tot))


def resample_fill(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                  step_seconds: int = 86400) -> DataFrame:
    """Regularize an event series: bucket events into fixed ``step_seconds``
    bins per key, then emit EVERY bin between each key's first and last
    bucket — gaps appear as explicit zero rows (``is_gap`` = true). The
    resample/gap-fill primitive behind rate charts and downstream window
    models that assume a dense time axis (the reference's sample series are
    sparse by collection_date, postgres.Rmd:74-82).

    Two partial-agg shuffles on the key (bucket agg, span agg), then the
    dense grid is generated with sequence()+explode at KEY grain — grid size
    is span/step per key, independent of event volume — and left-joined back
    on (key, bucket). No driver-side calendar, no cross join against a
    global date dimension.
    """
    from glamr_omics_pipelines_spark.operators.windows import epoch_us
    sec = F.floor(epoch_us(ts_col) / F.lit(1_000_000)).cast("long")
    bucket = (F.floor(sec / F.lit(step_seconds)) * step_seconds).cast("long")
    actual = (df.withColumn("_b", bucket)
              .groupBy(key_col, "_b")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(value_col).alias("total")))
    spans = actual.groupBy(key_col).agg(F.min("_b").alias("_lo"),
                                        F.max("_b").alias("_hi"))
    grid = spans.select(
        key_col,
        F.explode(F.sequence("_lo", "_hi", F.lit(step_seconds).cast("long")))
        .alias("bucket_start"))
    return (grid.join(actual.withColumnRenamed("_b", "bucket_start"),
                      [key_col, "bucket_start"], "left")
            .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
            .withColumn("total", F.coalesce("total", F.lit(0.0)))
            .withColumn("is_gap", F.col("n_events") == 0))


def interpolate_linear(df: DataFrame, key_col: str, order_col: str,
                       value_col: str,
                       out_col: str = "value_interp") -> DataFrame:
    """Linear interpolation of missing (null) values per key, ordered by a
    numeric ``order_col``: each null is replaced by the straight line
    between its nearest non-null neighbors; leading/trailing nulls take the
    nearest edge value (pandas ``interpolate(limit_direction='both')``
    semantics). The sensor-series repair step a sparse environmental time
    series needs before modeling.

    Both neighbor lookups are IGNORE NULLS window frames over the SAME
    (key, order) sort — last_value back, first_value forward — so the whole
    operator costs one exchange and one ordered pass; no self-join against
    the non-null subset, no per-key collect. ``order_col`` values must be
    unique per key (caller supplies a tiebroken order); equal-order
    neighbors are guarded to avoid a 0/0 slope.
    """
    w_prev = (Window.partitionBy(key_col).orderBy(order_col)
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy(key_col).orderBy(order_col)
              .rowsBetween(0, Window.unboundedFollowing))
    v = F.col(value_col)
    x = F.col(order_col).cast("double")
    pv = F.last(v, ignorenulls=True).over(w_prev)
    px = F.last(F.when(v.isNotNull(), x), ignorenulls=True).over(w_prev)
    nv = F.first(v, ignorenulls=True).over(w_next)
    nx = F.first(F.when(v.isNotNull(), x), ignorenulls=True).over(w_next)
    interp = (F.when(v.isNotNull(), v)
              .when(pv.isNull(), nv)
              .when(nv.isNull() | (nx == px), pv)
              .otherwise(pv + (nv - pv) * (x - px) / (nx - px)))
    return df.withColumn(out_col, interp)


def seasonal_anomaly(df: DataFrame, group_col: str, ts_col: str,
                     value_col: str, z_threshold: float = 3.0) -> DataFrame:
    """Seasonal-baseline anomaly scoring: each event's value is z-scored
    against the mean/std of its (group, hour-of-week) cell — 'is this
    reading unusual FOR a Tuesday 3pm', the seasonality-aware version of a
    global z-score (which flags every rush hour as an anomaly).

    The baseline table is a partial agg over at most |groups|·168 cells —
    broadcast back onto the scan, so the whole operator is one scan + one
    tiny-dimension broadcast join; the z computation is row-local. Cells
    with n < 2 or zero variance yield null z (never flagged). Hour-of-week
    uses Sunday-origin day numbering (UTC session timezone contract, see
    windows.epoch_us).
    """
    how = ((F.dayofweek(ts_col) - 1) * 24 + F.hour(ts_col))
    x = F.col(value_col).cast("double")
    d = df.withColumn("_how", how)
    base = (d.groupBy(group_col, "_how")
            .agg(F.count(F.lit(1)).cast("double").alias("_n"),
                 F.sum(x).alias("_s"), F.sum(x * x).alias("_q")))
    m = F.col("_s") / F.col("_n")
    var = (F.col("_q") - F.col("_n") * m * m) / (F.col("_n") - 1)
    base = base.select(group_col, "_how", m.alias("_mean"),
                       F.when((F.col("_n") >= 2) & (var > 0), F.sqrt(var))
                       .alias("_std"))
    out = (d.join(F.broadcast(base), [group_col, "_how"])
           .withColumn("z_score", (x - F.col("_mean")) / F.col("_std"))
           .withColumn("is_anomaly",
                       F.coalesce(F.abs(F.col("z_score")) >= z_threshold,
                                  F.lit(False))))
    return (out.withColumnRenamed("_how", "hour_of_week")
            .drop("_mean", "_std"))


def rolling_corr(df: DataFrame, group_col: str, ts_col: str,
                 x_col, y_col, window_seconds: int = 3600,
                 out: str = "rolling_corr") -> DataFrame:
    """Trailing-window Pearson correlation between two series per entity
    (e.g. value vs time = a local trend detector; value vs a second sensor
    = co-movement): all six co-moments (n, Σx, Σy, Σxy, Σx², Σy²) are
    window aggregates over the SAME trailing RANGE frame, so the operator
    costs one exchange + one ordered sliding pass — never a
    point-in-interval self-join. Windows with n < 2 or a constant side
    yield null (guarded, not NaN).
    """
    from glamr_omics_pipelines_spark.operators.windows import epoch_us
    sec = F.floor(epoch_us(ts_col) / F.lit(1_000_000)).cast("long")
    d = df.withColumn("_sec", sec)
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    w = (Window.partitionBy(group_col).orderBy("_sec")
         .rangeBetween(-window_seconds, 0))
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(x).over(w)
    sy = F.sum(y).over(w)
    sxy = F.sum(x * y).over(w)
    sxx = F.sum(x * x).over(w)
    syy = F.sum(y * y).over(w)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when((n >= 2) & (vx > 0) & (vy > 0),
                  cov / F.sqrt(vx * vy))
    return d.withColumn(out, corr).drop("_sec")


def cohort_retention(df: DataFrame, user_col: str, ts_col: str,
                     period_seconds: int = 604800) -> DataFrame:
    """Cohort retention matrix: users bucketed by their FIRST-activity
    period (weekly by default), counted as retained in every later period
    they appear in — the (cohort, offset) → distinct-users grid behind
    every retention curve dashboard.

    One user-grain partial agg for cohort assignment (min bucket per user —
    mergeable), joined back user-grain, then a (cohort, offset)-grain
    count-distinct. The join is user × their activity periods (already
    deduplicated to period grain first, so the shuffle carries user-period
    pairs, not raw events). Offsets are exact integer bucket arithmetic —
    no calendar functions to disagree across engines.
    """
    from glamr_omics_pipelines_spark.operators.windows import epoch_us
    sec = F.floor(epoch_us(ts_col) / F.lit(1_000_000)).cast("long")
    bucket = (F.floor(sec / F.lit(period_seconds))
              * period_seconds).cast("long")
    up = (df.withColumn("_b", bucket)
          .select(F.col(user_col).alias("_u"), "_b").distinct())
    cohorts = up.groupBy("_u").agg(F.min("_b").alias("cohort_start"))
    j = up.join(cohorts, "_u")
    offset = ((F.col("_b") - F.col("cohort_start"))
              / period_seconds).cast("bigint")
    return (j.groupBy("cohort_start", offset.alias("period_offset"))
            .agg(F.count_distinct(F.col("_u")).alias("n_users")))


def path_ngrams(df: DataFrame, key_cols: list[str], ts_col: str,
                state_col: str, n: int = 3,
                tiebreak_cols: list[str] = ()) -> DataFrame:
    """Order-n journey mining: count every length-n run of consecutive
    states per entity (the generalization of transition_counts beyond
    bigrams) — 'view → click → purchase' path frequencies.

    One shuffle on the entity key; the n−1 lead() columns share that
    single (key, time) window sort, and the path count is a partial agg
    over the state^n grid (bounded by observed paths, not events).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak_cols)
    d = df
    cols = [F.col(state_col).alias("s1")]
    for i in range(1, n):
        d = d.withColumn(f"_s{i + 1}", F.lead(state_col, i).over(w))
        cols.append(F.col(f"_s{i + 1}").alias(f"s{i + 1}"))
    d = d.filter(F.col(f"_s{n}").isNotNull())
    return (d.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("n_paths")))


def time_weighted_avg(df: DataFrame, key_col: str, ts_col: str,
                      value_col: str,
                      tiebreak_col: str) -> DataFrame:
    """Time-weighted average per key (TWAP): each reading is weighted by
    how long it was in force (until the next reading), Σ vᵢ·Δtᵢ / Σ Δtᵢ —
    the correct mean for IRREGULARLY-sampled series (an arithmetic mean
    over-weights burst periods; environmental sensors sample exactly this
    unevenly). The last reading of each key carries no interval and is
    excluded (standard last-observation convention); single-reading keys
    yield null.

    One (key, time) window for the lead + one key-grain partial agg —
    a single exchange end to end.
    """
    from glamr_omics_pipelines_spark.operators.windows import epoch_us
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    sec = epoch_us(ts_col).cast("double") / 1e6
    d = (df.withColumn("_t", sec)
         .withColumn("_dt", F.lead("_t").over(w) - F.col("_t"))
         .filter(F.col("_dt").isNotNull()))
    # try_divide: all readings of a key at ONE timestamp → every interval 0,
    # span 0 — twap undefined (null), not an ANSI divide error
    return (d.groupBy(key_col)
            .agg(F.try_divide(F.sum(F.col(value_col) * F.col("_dt")),
                              F.sum("_dt")).alias("twap"),
                 F.sum("_dt").alias("span_seconds"),
                 F.count(F.lit(1)).alias("n_intervals")))


def burstiness(df: DataFrame, key_col: str, ts_col: str,
               tiebreak_col: str) -> DataFrame:
    """Burstiness index per entity (Goh & Barabási 2008):
    B = (σ − μ)/(σ + μ) over the inter-event gap distribution — −1 for a
    perfectly periodic signal, 0 for Poisson, → 1 for extreme bursts. The
    one-number temporal fingerprint that separates schedulers from humans
    from incident storms.

    One (key, time) window for the lag gaps, then one key-grain co-moment
    partial agg (n, Σg, Σg²) — a single exchange; keys with < 2 gaps or
    zero mean+std yield null.
    """
    from glamr_omics_pipelines_spark.operators.windows import epoch_us
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    gap = (epoch_us(ts_col) - F.lag(epoch_us(ts_col)).over(w)) / 1e6
    d = df.withColumn("_g", gap).filter(F.col("_g").isNotNull())
    agg = d.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_g").alias("_s"), F.sum(F.col("_g") * F.col("_g"))
        .alias("_q"))
    mu = F.col("_s") / F.col("_n")
    var = (F.col("_q") - F.col("_n") * mu * mu) / (F.col("_n") - 1)
    sd = F.when((F.col("_n") >= 2) & (var >= 0), F.sqrt(var))
    b = F.when(sd.isNotNull() & (sd + mu > 0), (sd - mu) / (sd + mu))
    return agg.select(key_col, F.col("_n").cast("bigint").alias("n_gaps"),
                      mu.alias("mean_gap_sec"), b.alias("burstiness"))
