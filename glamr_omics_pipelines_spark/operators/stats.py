"""Statistical testing operators: rank-sum tests + multiple-testing FDR.

The reference's downstream analyses are exactly this shape — differential
abundance between sample groups over the warehouse's taxon-count tables
(the metacoder/ALDEx2 companion analyses of its R layer). Spark-first:

  - rank_sum_test: Mann-Whitney/Wilcoxon U per feature between two groups,
    with midranks for ties and the normal-approximation z statistic —
    rank windows partitioned BY FEATURE, so a million taxa test in
    parallel with one shuffle (no per-taxon driver loop).
  - bh_adjust: Benjamini-Hochberg FDR-adjusted p-values — the post-test
    correction every differential-abundance table reports. The reverse
    running-min needs a total order over the p-value table, which is
    FEATURE-grain (taxa, genes), not fact-grain — the same documented
    metadata-scale contract as windows.sequential_ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_sum_test(df: DataFrame, feature_col: str, group_col: str,
                  value_col: str, group_a, group_b) -> DataFrame:
    """Per-feature two-sample Wilcoxon rank-sum: U statistic for
    ``group_a`` vs ``group_b`` and the tie-uncorrected normal-approximation
    z score (features with an empty side yield null z).

    Midranks: tied values share the average of their occupied rank
    positions (the standard treatment), computed as
    ``rank() + (n_equal − 1)/2`` — two windows on the SAME
    (feature, value) ordering, one exchange total.
    """
    d = df.filter(F.col(group_col).isin([group_a, group_b])
                  & F.col(value_col).isNotNull())
    w_rank = Window.partitionBy(feature_col).orderBy(value_col)
    w_tie = Window.partitionBy(feature_col, value_col)
    mid = (F.rank().over(w_rank)
           + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0)
    ranked = d.withColumn("_mid", mid)
    is_a = (F.col(group_col) == F.lit(group_a)).cast("int")
    agg = (ranked.groupBy(feature_col)
           .agg(F.sum(F.when(F.col(group_col) == F.lit(group_a),
                             F.col("_mid"))).alias("_r1"),
                F.sum(is_a).cast("double").alias("n1"),
                F.sum(1 - is_a).cast("double").alias("n2")))
    u = F.col("_r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    mu = F.col("n1") * F.col("n2") / 2.0
    sigma = F.sqrt(F.col("n1") * F.col("n2")
                   * (F.col("n1") + F.col("n2") + 1) / 12.0)
    z = F.when(sigma > 0, (u - mu) / sigma)
    return (agg.withColumn("u_stat", u).withColumn("z_score", z)
            .select(feature_col, F.col("n1").cast("bigint").alias("n1"),
                    F.col("n2").cast("bigint").alias("n2"),
                    "u_stat", "z_score"))


def bh_adjust(df: DataFrame, p_col: str, id_col: str,
              out: str = "p_adj") -> DataFrame:
    """Benjamini-Hochberg step-up FDR adjustment:
    ``p_adj(i) = min(1, min_{j ≥ i} p(j)·n/j)`` over p-values sorted
    ascending (ties ordered by ``id_col`` for determinism; tied p-values
    get identical adjusted values regardless, since p·n/j is evaluated at
    each position and the reverse min smooths it).

    Global ordered windows — feature-grain input (one p per taxon/gene),
    the documented metadata-scale contract; n enters via a count window,
    not a driver collect.
    """
    w_ord = Window.orderBy(F.col(p_col).asc(), F.col(id_col).asc())
    w_all = Window.partitionBy()
    ranked = (df.withColumn("_rk", F.row_number().over(w_ord))
              .withColumn("_n", F.count(F.lit(1)).over(w_all)))
    raw = F.col(p_col) * F.col("_n") / F.col("_rk")
    w_tail = (Window.orderBy(F.col("_rk").desc())
              .rowsBetween(Window.unboundedPreceding, 0))
    return (ranked.withColumn("_raw", raw)
            .withColumn(out, F.least(F.lit(1.0),
                                     F.min("_raw").over(w_tail)))
            .drop("_rk", "_n", "_raw"))


def enrichment_2x2(membership: DataFrame, flags: DataFrame,
                   group_col: str, feature_col: str,
                   flag_col: str = "flagged") -> DataFrame:
    """Per-feature 2×2 enrichment contingency tables: given group→feature
    membership pairs and a boolean flag per group (the "interesting set"),
    emit n11/n10/n01/n00, the odds ratio, and the fold enrichment — the
    annotation-enrichment shape (which KEGG terms are over-represented in
    high-quality bins) ready for a Fisher/chi-square test downstream.

      n11 = flagged groups WITH the feature    n10 = flagged without
      n01 = unflagged with                      n00 = unflagged without

    One feature-grain aggregate over the (deduplicated) membership joined
    with the group-grain flag (broadcast — groups ≪ memberships); totals
    enter as a broadcast one-row aggregate. Odds ratio is null when a
    margin cell is zero (report counts; a +0.5 Haldane correction is the
    caller's modeling choice, not silently applied).
    """
    m = membership.select(group_col, feature_col).distinct()
    fl = flags.select(group_col, F.col(flag_col).cast("boolean")
                      .alias("_flag"))
    tot = F.broadcast(fl.agg(
        F.count(F.lit(1)).cast("double").alias("_n_groups"),
        F.sum(F.col("_flag").cast("int")).cast("double").alias("_n_flag")))
    j = m.join(F.broadcast(fl), group_col)
    per = (j.groupBy(feature_col)
           .agg(F.sum(F.col("_flag").cast("int")).cast("double")
                .alias("_k"),
                F.count(F.lit(1)).cast("double").alias("_m")))
    out = (per.crossJoin(tot)
           .withColumn("n11", F.col("_k"))
           .withColumn("n10", F.col("_n_flag") - F.col("_k"))
           .withColumn("n01", F.col("_m") - F.col("_k"))
           .withColumn("n00", F.col("_n_groups") - F.col("_n_flag")
                       - F.col("_m") + F.col("_k")))
    denom = F.col("n10") * F.col("n01")
    odds = F.when(denom > 0,
                  (F.col("n11") * F.col("n00")) / denom)
    fold = F.when((F.col("_n_flag") > 0) & (F.col("_m") > 0),
                  (F.col("n11") / F.col("_n_flag"))
                  / (F.col("_m") / F.col("_n_groups")))
    return (out.withColumn("odds_ratio", odds)
            .withColumn("fold_enrichment", fold)
            .select(feature_col,
                    *[F.col(c).cast("bigint").alias(c)
                      for c in ("n11", "n10", "n01", "n00")],
                    "odds_ratio", "fold_enrichment"))


def cusum_changepoint(df: DataFrame, key_col: str, order_col: str,
                      value_col: str, tiebreak_col: str) -> DataFrame:
    """Single change-point detection per key via the classic CUSUM statistic:
    S_i = (cumulative sum through row i) − i·mean, with the change point at
    argmax |S_i| (Page's cumulative-sum test / binary-segmentation step 1).
    The level-shift detector an environmental monitoring series needs
    (when did this site's chemistry move?).

    One exchange on the key: the partition count, partition total, ordered
    cumulative sum, and row number all share the same hash partitioning, and
    the argmax is a row_number pick over the same partition — no second
    data-grain shuffle, no driver loop. |S| is rounded to 6 decimals before
    the argmax so the (|S| desc, index asc) tiebreak is reproducible across
    engines despite unordered-sum ulp noise; the cumulative sum itself is
    evaluated in the deterministic (order, tiebreak) order on both engines.
    """
    w = Window.partitionBy(key_col)
    w_ord = Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    d = (df.withColumn("_n", F.count(F.lit(1)).over(w))
         .withColumn("_tot", F.sum(value_col).over(w))
         .withColumn("_cum", F.sum(value_col).over(w_cum))
         .withColumn("_i", F.row_number().over(w_ord)))
    s_abs = F.round(F.abs(F.col("_cum")
                          - F.col("_i") * F.col("_tot") / F.col("_n")), 6)
    d = d.withColumn("_s", s_abs)
    w_pick = Window.partitionBy(key_col).orderBy(F.col("_s").desc(),
                                                 F.col("_i"))
    return (d.withColumn("_rk", F.row_number().over(w_pick))
            .filter(F.col("_rk") == 1)
            .select(key_col, F.col(order_col).alias("changepoint_at"),
                    F.col("_i").alias("changepoint_idx"),
                    F.col("_s").alias("max_cusum"),
                    F.col("_n").alias("n_points")))


def trend_fit(df: DataFrame, key_cols: list[str], x_col: str,
              y_col: str) -> DataFrame:
    """Per-key ordinary-least-squares trend line: slope, intercept, r² and n
    for y ~ x within each key — the 'is this site's chemistry trending'
    question over the reference's environmental sample series
    (collection_date vs measurement, postgres.Rmd:74-82), fit for every
    key in one pass.

    Pure co-moment partial aggregates (Σx, Σy, Σxy, Σx², Σy², n combine
    map-side), so a million keys fit in ONE scan + one key-grain shuffle —
    never a per-key driver loop or ML-library call. Degenerate keys
    (constant x) yield null slope; constant y yields r² = null (0/0
    guarded). Numerically: the co-moment form is fine for the centered-ish
    scales of measurement data; callers with astronomically offset x should
    pre-center (documented, not hidden).
    """
    # complete pairs only: n MUST count the same rows the sums cover — a
    # count(*) n with null-skipping sums silently skews every co-moment
    # (e.g. 2 on-line pairs + 1 null-x row reported slope -1.5 instead of 1)
    x0 = F.col(x_col).cast("double")
    y0 = F.col(y_col).cast("double")
    ok = x0.isNotNull() & y0.isNotNull()
    x, y = F.when(ok, x0), F.when(ok, y0)
    agg = df.groupBy(*key_cols).agg(
        F.sum(ok.cast("int")).cast("double").alias("_n"),
        F.sum(x).alias("_sx"), F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"), F.sum(y * y).alias("_syy"))
    sxx = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    syy = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    sxy = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = F.when(sxx != 0, sxy / sxx)
    intercept = (F.col("_sy") - slope * F.col("_sx")) / F.col("_n")
    r2 = F.when((sxx != 0) & (syy != 0), (sxy * sxy) / (sxx * syy))
    return agg.select(*key_cols,
                      F.col("_n").cast("bigint").alias("n"),
                      slope.alias("slope"), intercept.alias("intercept"),
                      r2.alias("r2"))


def chi_square_test(df: DataFrame, feature_col: str, row_col: str,
                    col_col: str) -> DataFrame:
    """Per-feature R×C chi-square statistic of independence over
    (row_var, col_var) observation pairs: χ² = Σ (obs − exp)²/exp with
    exp = row_total·col_total/n, plus degrees of freedom (R−1)(C−1) —
    the general-contingency companion of the fixed-2×2 enrichment tables
    (X93), e.g. taxon-presence vs site-category grids per taxon.

    Three feature-grain partial aggs (cell counts, row margins, col
    margins) joined back at CELL grain — the χ² sum is over observed cells
    only, with the unobserved-cell mass added in closed form
    (n − Σ_observed exp), so nothing ever materializes the full R×C grid
    densely. Shuffles carry (feature, category) pairs, bounded by the
    grid's support, not the fact table.
    """
    cells = (df.groupBy(feature_col, row_col, col_col)
             .agg(F.count(F.lit(1)).cast("double").alias("_o")))
    rowm = (cells.groupBy(feature_col, row_col)
            .agg(F.sum("_o").alias("_rt")))
    colm = (cells.groupBy(feature_col, col_col)
            .agg(F.sum("_o").alias("_ct")))
    tot = (cells.groupBy(feature_col).agg(
        F.sum("_o").alias("_n"),
        F.count_distinct(F.col(row_col)).alias("_r"),
        F.count_distinct(F.col(col_col)).alias("_c")))
    j = (cells.join(rowm, [feature_col, row_col])
         .join(colm, [feature_col, col_col])
         .join(tot, feature_col))
    exp = F.col("_rt") * F.col("_ct") / F.col("_n")
    # Σ over observed cells of (o-e)²/e, plus Σ over UNOBSERVED cells of e
    # (their (0-e)²/e = e): total expected mass is n, so unobserved mass =
    # n − Σ_observed e — closed form, no dense grid.
    per_feature = (j.groupBy(feature_col)
                   .agg(F.sum((F.col("_o") - exp) * (F.col("_o") - exp)
                              / exp).alias("_chi_obs"),
                        F.sum(exp).alias("_exp_obs"),
                        F.first("_n").alias("_n"),
                        F.first("_r").alias("_r"),
                        F.first("_c").alias("_c")))
    chi2 = F.col("_chi_obs") + (F.col("_n") - F.col("_exp_obs"))
    dof = (F.col("_r") - 1) * (F.col("_c") - 1)
    # Cramér's V effect size: √(χ²/(n·min(r−1, c−1))) — the
    # sample-size-free companion every χ² table should report
    mink = F.least(F.col("_r") - 1, F.col("_c") - 1)
    v = F.when(mink > 0, F.sqrt(chi2 / (F.col("_n") * mink)))
    return per_feature.select(
        feature_col, F.col("_n").cast("bigint").alias("n_obs"),
        chi2.alias("chi2"), dof.cast("bigint").alias("dof"),
        v.alias("cramers_v"))


def welch_t_test(df: DataFrame, feature_col: str, group_col: str,
                 value_col: str, group_a, group_b) -> DataFrame:
    """Per-feature Welch's unequal-variance t-test between two groups:
    t = (x̄_a − x̄_b) / √(s²_a/n_a + s²_b/n_b) with Welch–Satterthwaite
    degrees of freedom — the parametric twin of rank_sum_test for
    differential-abundance tables, plus the log2 fold change (pseudocount
    1) every such table reports.

    One scan, one feature-grain partial agg (n/Σx/Σx² per side as
    conditional sums) — a million features test in a single shuffle.
    Features with n < 2 on either side, or zero pooled variance, yield
    null t (guarded, not NaN).
    """
    # null observations are dropped entirely: the side counts must cover
    # exactly the rows the Σx/Σx² sums cover, or mean/variance skew silently
    x = F.col(value_col).cast("double")
    is_a = (F.col(group_col) == F.lit(group_a)) & x.isNotNull()
    is_b = (F.col(group_col) == F.lit(group_b)) & x.isNotNull()
    agg = (df.filter(is_a | is_b).groupBy(feature_col).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("double").alias("_na"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("double").alias("_nb"),
        F.sum(F.when(is_a, x)).alias("_sa"),
        F.sum(F.when(is_b, x)).alias("_sb"),
        F.sum(F.when(is_a, x * x)).alias("_qa"),
        F.sum(F.when(is_b, x * x)).alias("_qb")))
    ma = F.col("_sa") / F.col("_na")
    mb = F.col("_sb") / F.col("_nb")
    va = (F.col("_qa") - F.col("_na") * ma * ma) / (F.col("_na") - 1)
    vb = (F.col("_qb") - F.col("_nb") * mb * mb) / (F.col("_nb") - 1)
    sea = va / F.col("_na")
    seb = vb / F.col("_nb")
    se2 = sea + seb
    ok = (F.col("_na") >= 2) & (F.col("_nb") >= 2) & (se2 > 0)
    t = F.when(ok, (ma - mb) / F.sqrt(se2))
    dof = F.when(ok, (se2 * se2)
                 / (sea * sea / (F.col("_na") - 1)
                    + seb * seb / (F.col("_nb") - 1)))
    # try_divide: a side mean of exactly -1 zeroes the pseudocount
    # denominator — fold change undefined (null), not an ANSI divide error
    lfc = F.log2(F.try_divide(ma + 1, mb + 1))
    return agg.select(feature_col,
                      F.col("_na").cast("bigint").alias("n_a"),
                      F.col("_nb").cast("bigint").alias("n_b"),
                      t.alias("t_stat"), dof.alias("welch_dof"),
                      lfc.alias("log2_fc"))


def two_proportion_ztest(df: DataFrame, group_col: str, variant_col: str,
                         success_col: str, variant_a, variant_b) -> DataFrame:
    """Two-proportion z-test per group (the A/B-test primitive): compares
    success rates between two variants with the pooled-proportion z
    statistic z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)).

    One conditional-sum partial agg per group — experiment dashboards over
    a billion exposures cost one scan + one group shuffle. Degenerate
    groups (an empty arm, or pooled p̂ of 0/1 where the statistic is
    undefined) yield null z.
    """
    # exposures with a null outcome are dropped (the arm counts must cover
    # exactly the rows the success sums cover)
    s = F.col(success_col).cast("double")
    is_a = (F.col(variant_col) == F.lit(variant_a)) & s.isNotNull()
    is_b = (F.col(variant_col) == F.lit(variant_b)) & s.isNotNull()
    agg = (df.filter(is_a | is_b).groupBy(group_col).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("double").alias("_na"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("double").alias("_nb"),
        F.sum(F.when(is_a, s)).alias("_sa"),
        F.sum(F.when(is_b, s)).alias("_sb")))
    pa = F.col("_sa") / F.col("_na")
    pb = F.col("_sb") / F.col("_nb")
    pool = (F.col("_sa") + F.col("_sb")) / (F.col("_na") + F.col("_nb"))
    se = F.sqrt(pool * (1 - pool)
                * (1 / F.col("_na") + 1 / F.col("_nb")))
    ok = (F.col("_na") > 0) & (F.col("_nb") > 0) & (pool > 0) & (pool < 1)
    z = F.when(ok, (pa - pb) / se)
    return agg.select(group_col,
                      F.col("_na").cast("bigint").alias("n_a"),
                      F.col("_nb").cast("bigint").alias("n_b"),
                      pa.alias("rate_a"), pb.alias("rate_b"),
                      z.alias("z_score"))


def spearman_corr(df: DataFrame, group_col: str, x_col: str,
                  y_col: str) -> DataFrame:
    """Per-group Spearman rank correlation: Pearson correlation of the
    midranks of x and y — the monotonic-association test (robust to
    outliers and nonlinearity) every environmental-gradient analysis
    reports next to Pearson.

    Midranks via two rank windows per variable (rank + tie-count, the
    rank_sum_test treatment) over the SAME group partitioning, then the
    co-moment Pearson formula as one partial agg — the whole statistic
    costs the group exchange once. Groups with n < 2 or a constant
    variable yield null.
    """
    def midrank(col):
        w_rank = Window.partitionBy(group_col).orderBy(col)
        w_tie = Window.partitionBy(group_col, col)
        return (F.rank().over(w_rank)
                + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0)

    # pairwise-complete observations: a null x or y would otherwise be
    # RANKED (nulls order first) and silently distort rho
    d = (df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
         .withColumn("_rx", midrank(F.col(x_col)))
         .withColumn("_ry", midrank(F.col(y_col))))
    agg = d.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_rx").alias("_sx"), F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"))
    vx = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    rho = F.when((F.col("_n") >= 2) & (vx > 0) & (vy > 0),
                 cov / F.sqrt(vx * vy))
    return agg.select(group_col, F.col("_n").cast("bigint").alias("n"),
                      rho.alias("spearman_rho"))


def population_stability(ref: DataFrame, cur: DataFrame, value_col: str,
                         n_bins: int = 10) -> DataFrame:
    """Population Stability Index between a reference and a current sample
    of one numeric column: PSI = Σ (p̂ᵢ − q̂ᵢ)·ln(p̂ᵢ/q̂ᵢ) over the
    reference's ``n_bins`` quantile bins — the standard ML-ops drift gate
    (<0.1 stable, >0.25 shifted). Returns one row: psi over bins where
    both sides have mass, plus how many bins were empty on either side
    (reported, never silently epsilon-smoothed).

    Bin edges are ONE exact-percentile aggregate on the reference
    (interior quantiles, broadcast as a literal-free one-row frame);
    binning is a row-local fold over that array (value > edge counts),
    so each side costs one scan + one n_bins-grain agg. No epsilon
    fudging: empty-bin terms are excluded and counted.
    """
    probs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    edges = ref.agg(F.expr(
        f"percentile({value_col}, array({probs}))").alias("_edges"))

    def binned(df):
        b = F.aggregate(
            F.col("_edges"), F.lit(0),
            lambda acc, e: acc + (F.col(value_col) > e).cast("int"))
        return (df.crossJoin(F.broadcast(edges))
                .select(b.alias("_b"))
                .groupBy("_b").agg(F.count(F.lit(1)).alias("_c")))

    p = binned(ref).withColumnRenamed("_c", "_cp")
    q = binned(cur).withColumnRenamed("_c", "_cq")
    tp = F.broadcast(p.agg(F.sum("_cp").alias("_tp")))
    tq = F.broadcast(q.agg(F.sum("_cq").alias("_tq")))
    j = (p.join(q, "_b", "full")
         .crossJoin(tp).crossJoin(tq)
         .select((F.coalesce(F.col("_cp"), F.lit(0)) / F.col("_tp"))
                 .alias("_p"),
                 (F.coalesce(F.col("_cq"), F.lit(0)) / F.col("_tq"))
                 .alias("_q")))
    ok = (F.col("_p") > 0) & (F.col("_q") > 0)
    term = F.when(ok, (F.col("_p") - F.col("_q"))
                  * F.log(F.col("_p") / F.col("_q")))
    return j.agg(F.round(F.sum(term), 6).alias("psi"),
                 F.sum((~ok).cast("long")).alias("n_empty_bins"),
                 F.count(F.lit(1)).alias("n_bins"))


def ks_test(df: DataFrame, feature_col: str, group_col: str,
            value_col: str, group_a, group_b) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per feature:
    D = max_x |F̂_a(x) − F̂_b(x)| — the distribution-shape drift/difference
    test beside PSI (binless) and the rank-sum test (which only sees
    location). Ties handled exactly: the ECDFs are compared at each
    DISTINCT observed value after absorbing all its ties.

    Value-grain conditional counts partial-agg map-side; the running
    ECDFs and the per-feature totals share ONE feature-key exchange
    (ordered cumsum + unordered totals on the same partitioning); D is a
    feature-grain max. Features with an empty side yield null.
    """
    is_a = F.col(group_col) == F.lit(group_a)
    is_b = F.col(group_col) == F.lit(group_b)
    g = (df.filter((is_a | is_b) & F.col(value_col).isNotNull())
         .groupBy(feature_col, value_col)
         .agg(F.sum(F.when(is_a, 1).otherwise(0)).alias("_ca"),
              F.sum(F.when(is_b, 1).otherwise(0)).alias("_cb")))
    w_cum = (Window.partitionBy(feature_col).orderBy(value_col)
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy(feature_col)
    # try_divide, not /: an empty side makes the ECDF denominator 0, which
    # under ANSI mode would raise DIVIDE_BY_ZERO and kill the job for every
    # feature in the batch — the documented contract is a null ks_d for
    # that feature (caught by test_ks_matches_bruteforce).
    d = (g.withColumn("_fa", F.try_divide(F.sum("_ca").over(w_cum),
                                          F.sum("_ca").over(w_all)))
         .withColumn("_fb", F.try_divide(F.sum("_cb").over(w_cum),
                                         F.sum("_cb").over(w_all)))
         .withColumn("_na", F.sum("_ca").over(w_all))
         .withColumn("_nb", F.sum("_cb").over(w_all)))
    return (d.groupBy(feature_col)
            .agg(F.first("_na").cast("bigint").alias("n_a"),
                 F.first("_nb").cast("bigint").alias("n_b"),
                 F.round(F.max(F.abs(F.col("_fa") - F.col("_fb"))), 6)
                 .alias("ks_d")))
