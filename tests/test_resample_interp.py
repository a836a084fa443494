"""Hand-computed fixtures for the round-4 continuation operators:
nx_stats (assembly Nx/Lx ladder), resample_fill (dense-axis gap fill),
interpolate_linear (per-key linear repair), cusum_changepoint (level-shift
argmax). Values verified by hand in the docstrings below."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.functions import bio
from glamr_omics_pipelines_spark.operators import stats, timeseries


def test_nx_stats_hand_computed(spark):
    # lengths sorted desc: 80, 70, 30, 10, 10 -> total 200
    # cum: 80, 150, 180, 190, 200
    # N50: first cum >= 100 -> 70 (L50=2); N90: first cum >= 180 -> 30 (L90=3)
    rows = [("a", 1, 10), ("a", 2, 80), ("a", 3, 30), ("a", 4, 70),
            ("a", 5, 10)]
    df = spark.createDataFrame(rows, "g string, id int, len long")
    out = bio.nx_stats(df, ["g"], "len", "id").collect()[0]
    assert out.num_seqs == 5 and out.total_len == 200 and out.max_len == 80
    assert out.n50 == 70 and out.l50 == 2
    assert out.n90 == 30 and out.l90 == 3


def test_nx_stats_single_contig(spark):
    df = spark.createDataFrame([("a", 1, 42)], "g string, id int, len long")
    out = bio.nx_stats(df, ["g"], "len", "id").collect()[0]
    assert out.n50 == 42 and out.l50 == 1 and out.n90 == 42 and out.l90 == 1


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour, 0, 0)


def test_resample_fill_gaps(spark):
    # user 1 active on days 1 and 4 -> grid covers days 1,2,3,4 with two gaps
    rows = [(1, _ts(1), 10.0), (1, _ts(1, 6), 2.0), (1, _ts(4), 5.0)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {r.bucket_start: r for r in
           timeseries.resample_fill(df, "user_id", "ts", "value",
                                    step_seconds=86400).collect()}
    day1 = int(_ts(1).replace(tzinfo=datetime.timezone.utc).timestamp())
    assert len(out) == 4
    assert out[day1].n_events == 2 and out[day1].total == 12.0
    assert out[day1 + 86400].is_gap and out[day1 + 86400].total == 0.0
    assert out[day1 + 2 * 86400].is_gap
    assert out[day1 + 3 * 86400].n_events == 1


def test_interpolate_linear_middle_and_edges(spark):
    # key a: x=0 v=1.0, x=2 null, x=4 v=5.0 -> interp(2) = 3.0
    # key b: leading null takes next, trailing null takes prev
    rows = [("a", 0, 1.0), ("a", 2, None), ("a", 4, 5.0),
            ("b", 0, None), ("b", 1, 7.0), ("b", 2, None)]
    df = spark.createDataFrame(rows, "k string, x long, v double")
    out = {(r.k, r.x): r.vi for r in
           timeseries.interpolate_linear(df, "k", "x", "v", "vi").collect()}
    assert out[("a", 2)] == 3.0
    assert out[("a", 0)] == 1.0 and out[("a", 4)] == 5.0
    assert out[("b", 0)] == 7.0 and out[("b", 2)] == 7.0


def test_interpolate_all_null_key(spark):
    df = spark.createDataFrame([("c", 0, None), ("c", 1, None)],
                               "k string, x long, v double")
    out = timeseries.interpolate_linear(df, "k", "x", "v", "vi").collect()
    assert all(r.vi is None for r in out)


def test_cusum_changepoint_level_shift(spark):
    # values 0,0,0,10,10,10 -> mean 5; cum-i*mean: -5,-10,-15,-10,-5,0
    # argmax |S| at i=3 (x=2): the last point of the low regime
    rows = [(1, i, float(0 if i < 3 else 10)) for i in range(6)]
    df = spark.createDataFrame(rows, "k int, x long, v double")
    out = stats.cusum_changepoint(df, "k", "x", "v", "x").collect()[0]
    assert out.changepoint_idx == 3 and out.changepoint_at == 2
    assert out.max_cusum == 15.0 and out.n_points == 6


def test_cusum_constant_series_ties_to_first(spark):
    df = spark.createDataFrame([(1, i, 2.0) for i in range(4)],
                               "k int, x long, v double")
    out = stats.cusum_changepoint(df, "k", "x", "v", "x").collect()[0]
    assert out.max_cusum == 0.0 and out.changepoint_idx == 1


def test_seasonal_anomaly_flags_planted_outlier(spark):
    # 5 normal readings + one 100x outlier in the same (type, hour) cell;
    # a different cell with n=1 must yield null z, never a flag
    base = [(i, "a", _ts(1 + i // 24, i % 24), 10.0 + (i % 2)) for i in range(10)]
    rows = ([(100, "a", _ts(1, 0), 10.0), (101, "a", _ts(8, 0), 11.0),
             (102, "a", _ts(15, 0), 1000.0),   # same Mon-0h cell, outlier
             (103, "b", _ts(2, 5), 7.0)])      # singleton cell
    df = spark.createDataFrame(
        base + rows, "event_id int, event_type string, ts timestamp, value double")
    # with n=4 in the cell the outlier-inclusive z caps at (n-1)/sqrt(n)
    # ~= 1.5, so threshold below that
    out = {r.event_id: r for r in
           timeseries.seasonal_anomaly(df, "event_type", "ts", "value",
                                       z_threshold=1.4).collect()}
    assert out[102].is_anomaly and out[102].z_score > 1.4
    assert not out[100].is_anomaly
    assert out[103].z_score is None and not out[103].is_anomaly


def test_rolling_corr_perfect_line_and_window_bound(spark):
    # y = 2x within the window -> corr 1.0; first row n=1 -> null
    rows = [(1, _ts(1, 0), 0.0, 0.0), (2, _ts(1, 0).replace(minute=10), 1.0, 2.0),
            (3, _ts(1, 0).replace(minute=20), 2.0, 4.0),
            (4, _ts(1, 3), 5.0, -1.0)]  # 3h later: outside the 1h window
    df = spark.createDataFrame(rows, "event_id int, ts timestamp, x double, y double") \
        .withColumn("k", F.lit("u"))
    out = {r.event_id: r.c for r in
           timeseries.rolling_corr(df, "k", "ts", "x", "y",
                                   window_seconds=3600, out="c").collect()}
    assert out[1] is None                      # n=1
    assert abs(out[2] - 1.0) < 1e-12 and abs(out[3] - 1.0) < 1e-12
    assert out[4] is None                      # window holds only itself


def test_cohort_retention_matrix(spark):
    # users 1,2 first active week 0; user 1 returns week 1; user 3 starts week 1
    wk = 604800
    rows = [(1, 0), (2, 10), (1, wk + 5), (3, wk + 1), (3, wk + 2)]
    df = spark.createDataFrame(
        [(u, datetime.datetime.utcfromtimestamp(s)) for u, s in rows],
        "user_id int, ts timestamp")
    out = {(r.cohort_start, r.period_offset): r.n_users for r in
           timeseries.cohort_retention(df, "user_id", "ts", wk).collect()}
    assert out[(0, 0)] == 2 and out[(0, 1)] == 1
    assert out[(wk, 0)] == 1 and len(out) == 3


def test_cooccur_cosine_ochiai(spark):
    from glamr_omics_pipelines_spark.operators import graph
    # items a,b share both groups; deg(a)=deg(b)=2 -> cosine 1.0
    # items a,c share one group; deg(c)=1 -> cosine 1/sqrt(2)
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (1, "c")]
    df = spark.createDataFrame(rows, "g int, i string")
    out = {(r.src, r.dst): r.cosine for r in
           graph.cooccurrence_cosine(df, "g", "i").collect()}
    assert abs(out[("a", "b")] - 1.0) < 1e-12
    assert abs(out[("a", "c")] - 1 / 2 ** 0.5) < 1e-12


def test_path_ngrams_trigrams(spark):
    rows = [(1, i, s) for i, s in enumerate(["a", "b", "c", "a", "b", "c"])]
    df = spark.createDataFrame(rows, "u int, t int, s string")
    out = {(r.s1, r.s2, r.s3): r.n_paths for r in
           timeseries.path_ngrams(df, ["u"], "t", "s", n=3,
                                  tiebreak_cols=["t"]).collect()}
    # runs: abc, bca, cab, abc -> abc twice
    assert out[("a", "b", "c")] == 2
    assert out[("b", "c", "a")] == 1 and out[("c", "a", "b")] == 1
    assert sum(out.values()) == 4


def test_time_weighted_avg_hand_computed(spark):
    # value 10 for 100s, then 20 for 300s -> twap = (10*100+20*300)/400
    rows = [(1, 0, 10.0), (1, 100, 20.0), (1, 400, 99.0),  # last excluded
            (2, 0, 5.0)]                                    # single -> none
    df = spark.createDataFrame(
        [(u, datetime.datetime.utcfromtimestamp(s), v) for u, s, v in rows],
        "user_id int, ts timestamp, value double")
    out = {r.user_id: r for r in
           timeseries.time_weighted_avg(df, "user_id", "ts", "value",
                                        "value").collect()}
    assert abs(out[1].twap - (10 * 100 + 20 * 300) / 400) < 1e-9
    assert out[1].span_seconds == 400.0 and out[1].n_intervals == 2
    assert 2 not in out


def test_spearman_monotonic_and_reversed(spark):
    rows = ([("up", float(i), float(i * i)) for i in range(10)]
            + [("down", float(i), float(-i)) for i in range(10)])
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r.spearman_rho for r in
           stats.spearman_corr(df, "g", "x", "y").collect()}
    assert abs(out["up"] - 1.0) < 1e-12     # monotonic -> rho 1 (nonlinear ok)
    assert abs(out["down"] + 1.0) < 1e-12


def test_debruijn_stats_linear_chain_and_branch(spark):
    # single read ACGTA with k=2: edges AC->CG->GT->TA, a pure chain:
    # 5 nodes? kmers: AC,CG,GT,TA -> 4 nodes, 3 edges, all linear, 1 tip
    df = spark.createDataFrame([("ACGTA",)], "seq string")
    r = bio.debruijn_stats(df, "seq", k=2).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_tips) == (4, 3, 1)
    assert r.n_linear == 4 and r.n_branching == 0
    # add a branch: AC -> CA makes AC out-degree 2
    df2 = spark.createDataFrame([("ACGTA",), ("ACAT",)], "seq string")
    r2 = bio.debruijn_stats(df2, "seq", k=2).collect()[0]
    assert r2.n_branching >= 1


def test_minimizer_density_bounds(spark):
    import random
    random.seed(7)
    seqs = ["".join(random.choice("ACGT") for _ in range(200))
            for _ in range(5)]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)],
                               "doc_id int, seq string")
    out = bio.minimizer_stats(df, "seq", k=5, w=4).collect()
    for r in out:
        assert r.n_kmers == 196
        # winnowing density: >= 1/w (one pick per window can't be rarer)
        # and well below 1 on random sequence (expected 2/(w+1) = 0.4)
        assert 1.0 / 4 <= r.density <= 0.8


def test_debounce_lag_gap(spark):
    from glamr_omics_pipelines_spark.operators import windows as W
    # events at t=0, 30, 100, 190 with 60s gap: keep 0 (first), drop 30
    # (gap 30), keep 100 (gap 70 vs previous EVENT at 30), keep 190
    rows = [(i, 1, "a", datetime.datetime.utcfromtimestamp(t))
            for i, t in enumerate([0, 30, 100, 190])]
    df = spark.createDataFrame(rows, "event_id int, u int, k string, ts timestamp")
    kept = sorted(r.event_id for r in
                  W.debounce(df, ["u", "k"], "ts", 60.0, "event_id")
                  .collect())
    assert kept == [0, 2, 3]


def test_burstiness_periodic_vs_bursty(spark):
    # periodic user: equal gaps -> sd 0 -> B = -1
    per = [(1, i, datetime.datetime.utcfromtimestamp(i * 60))
           for i in range(6)]
    # bursty user: gaps 1,1,1,1,3600 -> B > 0? sd vs mu: mu=721, sd~1609 -> B~0.38
    bur_times = [0, 1, 2, 3, 4, 3604]
    bur = [(2, i, datetime.datetime.utcfromtimestamp(t))
           for i, t in enumerate(bur_times)]
    df = spark.createDataFrame(per + bur,
                               "user_id int, event_id int, ts timestamp")
    out = {r.user_id: r for r in
           timeseries.burstiness(df, "user_id", "ts", "event_id").collect()}
    assert abs(out[1].burstiness + 1.0) < 1e-9   # periodic -> -1
    assert out[2].burstiness > 0.3               # bursty -> positive
    assert out[1].n_gaps == 5


def test_orf_count_via_translation(spark):
    # ATG GCC TAA ATG TAA -> protein "MA*M*": two complete ORFs,
    # longest = 3 aa (MA*)
    df = spark.createDataFrame([(1, "ATGGCCTAAATGTAA")], "doc_id int, text string")
    from pyspark.sql import functions as FF
    reads = df.select("doc_id", FF.col("text").alias("seq"))
    t = bio.translate_dna(reads, "seq", frame=0, out="protein")
    r = t.select("protein",
                 FF.size(FF.expr(r"regexp_extract_all(protein, 'M[^*]*\\*', 0)"))
                 .alias("n")).collect()[0]
    assert r.protein == "MA*M*" and r.n == 2
