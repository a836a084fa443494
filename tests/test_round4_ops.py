"""Round-4 operators: cluster survivor selection, adaptive quantile gate,
text normalization, k-mer spectrum, native session windows."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.functions import bio
from glamr_omics_pipelines_spark.operators import sampling, text
from glamr_omics_pipelines_spark.operators.dedup import keep_best_per_cluster


def test_keep_best_per_cluster_picks_highest_score(spark):
    corpus = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0)], "doc_id long, score double")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, label long")
    out = {r.doc_id: r for r in
           keep_best_per_cluster(corpus, labels, "doc_id", "score").collect()}
    # cluster {1,2,3}: 2 and 3 tie on score, min id wins
    assert out[2].kept and not out[1].kept and not out[3].kept
    # doc 4 absent from labels -> singleton cluster, survives
    assert out[4].kept and out[4].cluster_id == 4
    assert out[1].cluster_id == 1 and out[2].cluster_id == 1


def test_quantile_gate_exact_threshold(spark):
    rows = [("en", v) for v in [10, 20, 30, 40]] + [("fr", v) for v in [1, 100]]
    df = spark.createDataFrame(rows, "lang string, score long")
    kept = sampling.quantile_gate(df, ["lang"], "score", q=0.5)
    got = sorted((r.lang, r.score) for r in kept.collect())
    # en median = 25 (linear interpolation) -> keeps 30, 40;
    # fr median = 50.5 -> keeps 100
    assert got == [("en", 30), ("en", 40), ("fr", 100)]
    th = {r.lang: r.threshold for r in kept.collect()}
    assert th["en"] == 25.0 and th["fr"] == 50.5


def test_quantile_gate_keep_le(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("a", 3)],
                               "g string, score long")
    kept = sampling.quantile_gate(df, ["g"], "score", q=0.5, keep="le")
    assert sorted(r.score for r in kept.collect()) == [1, 2]


def test_normalize_text_strips_markup_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "  <b>hello</b>\n\t world  \r\n again "),
         (2, "plain"),
         (3, "<br/><br/>")],
        "doc_id long, text string")
    out = {r.doc_id: r.norm_text
           for r in text.normalize_text(df, "text").collect()}
    assert out[1] == "hello world again"
    assert out[2] == "plain"
    assert out[3] == ""


def test_kmer_spectrum_counts(spark):
    df = spark.createDataFrame([("acgta",), ("acg",), ("at",)], "seq string")
    out = {r.kmer: r.n for r in bio.kmer_spectrum(df, "seq", k=3).collect()}
    # "acgta" -> acg, cgt, gta ; "acg" -> acg ; "at" dropped (len < k)
    assert out == {"acg": 2, "cgt": 1, "gta": 1}


def test_session_window_boundary_semantics(spark):
    """An event exactly gap seconds after the previous one MERGES into the
    session (Spark extends while next_ts <= last_ts + gap); only a strictly
    larger gap starts a new session — the assumption the duckdb oracle's
    strict > encodes (matching windows.sessionize)."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, t0), (1, t0 + dt.timedelta(seconds=1800)),
            (1, t0 + dt.timedelta(seconds=1800 + 1801))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (df.groupBy("user_id", F.session_window("ts", "30 minutes"))
           .agg(F.count(F.lit(1)).alias("n")).collect())
    # event 2 is exactly 1800s after event 1 -> merged; event 3 is 1801s
    # after event 2 -> new session
    assert sorted(r.n for r in out) == [1, 2]


def test_rolling_features_trailing_window(spark):
    from glamr_omics_pipelines_spark.operators.timeseries import rolling_features
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, t0, 10.0),
            (1, t0 + dt.timedelta(seconds=3600), 20.0),   # exactly 1h: in frame
            (1, t0 + dt.timedelta(seconds=7201), 30.0),   # 3601s after 2nd: out
            (2, t0, 100.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {(r.user_id, r.value): (r.trailing_n, r.trailing_mean)
           for r in rolling_features(df, "user_id", "ts", "value").collect()}
    assert out[(1, 10.0)] == (1, 10.0)
    assert out[(1, 20.0)] == (2, 15.0)      # 1h-old event still in frame
    assert out[(1, 30.0)] == (1, 30.0)      # previous events aged out
    assert out[(2, 100.0)] == (1, 100.0)    # partitioned per user


def test_percent_rank_norm_bounds_and_ties(spark):
    from glamr_omics_pipelines_spark.operators.windows import percent_rank_norm
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("a", 5), ("b", 7)],
        "g string, score long")
    out = percent_rank_norm(df, ["g"], "score").collect()
    got = sorted((r.g, r.score, r.score_pct) for r in out)
    # ties share a rank; min is 0, max is 1; single-row group is 0
    assert got == [("a", 1, 0.0), ("a", 2, 1 / 3), ("a", 2, 1 / 3),
                   ("a", 5, 1.0), ("b", 7, 0.0)]


def test_tfidf_topk_scores(spark):
    import math
    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry cherry")],
        "doc_id long, text string")
    out = text.tfidf_topk(df, "doc_id", "text", top_terms=1)
    got = {r.doc_id: (r.term, r.tfidf) for r in out.collect()}
    # 'apple' appears only in doc 1 with tf=2 -> 2*ln(3/1)
    assert got[1][0] == "apple"
    assert abs(got[1][1] - 2 * math.log(3.0)) < 1e-9
    # doc 3: 'cherry' tf=2, df=2 -> 2*ln(3/2)
    assert got[3] == ("cherry", got[3][1])
    assert abs(got[3][1] - 2 * math.log(1.5)) < 1e-9


def test_winsorize_clips_to_quantile_band(spark):
    from glamr_omics_pipelines_spark.operators.abundance import winsorize
    vals = list(range(1, 12))  # 1..11: p0=1, p100=11
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    out = winsorize(df, ["g"], "v", lo=0.1, hi=0.9)
    got = sorted(r.winsorized for r in out.collect())
    # p10 = 2.0, p90 = 10.0 (linear interpolation on 11 points)
    assert got[0] == 2.0 and got[-1] == 10.0
    assert got[5] == 6.0  # interior untouched


def test_funnel_stages_strict_ordering(spark):
    from glamr_omics_pipelines_spark.operators.timeseries import funnel_stages
    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1: full funnel in order
        (1, ts(0), "view"), (1, ts(10), "click"), (1, ts(20), "purchase"),
        # user 2: purchase BEFORE click -> stops at stage 2
        (2, ts(0), "view"), (2, ts(5), "purchase"), (2, ts(10), "click"),
        # user 3: click with no prior view -> stage 0
        (3, ts(0), "click"), (3, ts(5), "purchase"),
        # user 4: click at the SAME ts as view -> strict > excludes it
        (4, ts(0), "view"), (4, ts(0), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.user_id: r.funnel_stage
           for r in funnel_stages(df, "user_id", "ts", "event_type",
                                  ["view", "click", "purchase"]).collect()}
    assert out == {1: 3, 2: 2, 3: 0, 4: 1}


def test_snapshot_diff_classification(spark):
    from glamr_omics_pipelines_spark.sources.warehouse import snapshot_diff
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string")
    out = {r.k: r.status
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_vs_empty(spark):
    """NULL and '' must hash differently (coalesce sentinel, not '')."""
    from glamr_omics_pipelines_spark.sources.warehouse import snapshot_diff
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "")], "k long, v string")
    out = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert out[0].status == "changed"


def test_pack_sequences_bins_respect_budget_semantics(spark):
    from glamr_omics_pipelines_spark.operators.sampling import pack_sequences
    rows = [(i, 100) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", budget=300, shards=2)
    rows = out.collect()
    # every doc assigned exactly one (shard, bin)
    assert len(rows) == 50
    # bin starts where the previous bin's token interval ended: within a
    # shard, a bin's docs-before-it always total < (bin+1)*budget and the
    # bin ids are contiguous from 0
    from collections import defaultdict
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r.bin)
    for shard, bins in by_shard.items():
        got = sorted(set(bins))
        assert got == list(range(len(got)))  # contiguous from 0
    # deterministic: rerun gives identical assignment
    again = {(r.doc_id): (r.shard, r.bin)
             for r in pack_sequences(df, "doc_id", "n_tokens",
                                     budget=300, shards=2).collect()}
    first = {r.doc_id: (r.shard, r.bin) for r in rows}
    assert first == again


def test_pack_sequences_bin_sums_near_budget(spark):
    from glamr_omics_pipelines_spark.operators.sampling import pack_sequences
    df = spark.createDataFrame([(i, 70) for i in range(100)],
                               "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", budget=500, shards=1)
    import pyspark.sql.functions as SF
    sums = {r.bin: r.s for r in
            out.groupBy("bin").agg(SF.sum("n_tokens").alias("s")).collect()}
    # overshoot bounded by one doc: every full bin in [budget - max_doc + 1,
    # budget + max_doc - 1]; only the last bin may be smaller
    last = max(sums)
    for b, s in sums.items():
        if b != last:
            assert 500 - 70 < s < 500 + 70


def test_mad_outliers_flags(spark):
    from glamr_omics_pipelines_spark.operators.abundance import mad_outliers
    vals = [10, 11, 12, 13, 14, 1000]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    out = {r.v: r.is_outlier for r in mad_outliers(df, ["g"], "v").collect()}
    # median=12.5, MAD=1.5 -> 1000 is the only |dev| > 4.5
    assert out[1000] is True
    assert all(not out[v] for v in vals[:-1])


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-label per node
    return {n: find(n) for n in parent}


def test_dup_clusters_star_matches_union_find(spark):
    import random
    from glamr_omics_pipelines_spark.operators.dedup import (
        dup_clusters, dup_clusters_star)
    rng = random.Random(67)
    graphs = {
        # high-diameter path: the min-propagation worst case star-CC fixes
        "path": [(i, i + 1) for i in range(40)],
        "random": [(rng.randrange(60), rng.randrange(60)) for _ in range(50)],
        "two_cliques": [(a, b) for a in range(5) for b in range(a)] +
                       [(a, b) for a in range(20, 25) for b in range(20, a)],
    }
    for name, edges in graphs.items():
        edges = [(u, v) for u, v in edges if u != v]
        expected = _uf_components(edges)
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        star = {r.id: r.label for r in dup_clusters_star(df).collect()}
        assert star == expected, f"star CC wrong on {name}"
        prop = {r.id: r.label for r in dup_clusters(df, max_iter=50).collect()}
        assert prop == expected, f"label propagation wrong on {name}"


def test_label_centroids_elementwise_mean(spark):
    from glamr_omics_pipelines_spark.operators.similarity import label_centroids
    df = spark.createDataFrame(
        [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [10.0, 20.0])],
        "label int, embedding array<double>")
    out = {(r.label, r.dim): (r.mean_val, r.n)
           for r in label_centroids(df, "label", "embedding").collect()}
    assert out == {(0, 0): (2.0, 2), (0, 1): (4.0, 2),
                   (1, 0): (10.0, 1), (1, 1): (20.0, 1)}


def test_profile_table_stats(spark):
    from glamr_omics_pipelines_spark.sources.warehouse import profile_table
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a")], "k long, v string")
    out = {r.column: r for r in profile_table(df, ["k", "v"]).collect()}
    assert out["k"].n_nulls == 0 and out["k"].n_distinct == 3
    assert out["k"].min_val == "1" and out["k"].max_val == "3"
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 1
    assert out["v"].min_val == "a" and out["v"].max_val == "a"


def test_normalize_text_idempotent(spark):
    """Canonicalization must be a projection: normalize(normalize(x)) ==
    normalize(x) — otherwise dedup keys depend on how many times a pipeline
    ran the cleaner."""
    import random
    rng = random.Random(41)
    frag = ["<b>", "</p>", "  ", "\t", "\n", "word", "x y", "<br/>", "a"]
    rows = [(i, "".join(rng.choice(frag) for _ in range(12)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = text.normalize_text(df, "text", out="n1")
    twice = text.normalize_text(once.select("doc_id",
                                            F.col("n1").alias("text")),
                                "text", out="n2")
    joined = once.select("doc_id", "n1").join(twice.select("doc_id", "n2"),
                                              "doc_id")
    assert joined.filter(F.col("n1") != F.col("n2")).count() == 0


def test_winsorize_idempotent_and_bounded(spark):
    from glamr_omics_pipelines_spark.operators.abundance import winsorize
    import random
    rng = random.Random(42)
    rows = [("g%d" % (i % 3), rng.randrange(1000)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v long")
    w1 = winsorize(df, ["g"], "v", lo=0.1, hi=0.9)
    # clipped values lie inside the bounds that produced them
    again = winsorize(w1.select("g", F.col("winsorized").alias("v")),
                      ["g"], "v", lo=0.0, hi=1.0)  # identity pass
    assert again.filter(F.col("winsorized") != F.col("v")).count() == 0
    # winsorizing already-clipped data at the same band changes nothing:
    # the band of the clipped distribution is the band itself
    w2 = winsorize(w1.select("g", F.col("winsorized").alias("v")),
                   ["g"], "v", lo=0.1, hi=0.9)
    merged = (w1.groupBy("g").agg(F.min("winsorized").alias("lo1"),
                                  F.max("winsorized").alias("hi1"))
              .join(w2.groupBy("g").agg(F.min("winsorized").alias("lo2"),
                                        F.max("winsorized").alias("hi2")), "g"))
    for r in merged.collect():
        assert r.lo2 >= r.lo1 and r.hi2 <= r.hi1


def test_percent_rank_norm_in_unit_interval(spark):
    from glamr_omics_pipelines_spark.operators.windows import percent_rank_norm
    import random
    rng = random.Random(43)
    rows = [("g%d" % (i % 4), rng.randrange(100)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = percent_rank_norm(df, ["g"], "v")
    assert out.filter((F.col("score_pct") < 0) | (F.col("score_pct") > 1)) \
        .count() == 0


def test_keep_best_null_scores_rank_worst(spark):
    """A NULL-score doc must never beat a scored doc (struct-min would rank
    nulls first; the operator coalesces to -inf)."""
    corpus = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, None)], "doc_id long, score double")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "id long, label long")
    out = {r.doc_id: r.kept
           for r in keep_best_per_cluster(corpus, labels,
                                          "doc_id", "score").collect()}
    assert out == {1: True, 2: False, 3: True}  # all-null cluster: min id


def test_snapshot_diff_boundary_shift_detected(spark):
    """Values shifting across column boundaries must classify as changed
    (marked encoding, not raw concatenation)."""
    from glamr_omics_pipelines_spark.sources.warehouse import snapshot_diff
    old = spark.createDataFrame([(1, "a\x1f", "b")], "k long, c1 string, c2 string")
    new = spark.createDataFrame([(1, "a", "\x1fb")], "k long, c1 string, c2 string")
    out = snapshot_diff(old, new, ["k"], ["c1", "c2"]).collect()
    assert out[0].status == "changed"


def test_quantile_gate_rejects_bad_keep(spark):
    import pytest as _pytest
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with _pytest.raises(ValueError):
        sampling.quantile_gate(df, ["g"], "v", keep="GE")


def test_dup_clusters_star_keeps_self_loop_nodes(spark):
    """A node whose only pair is a self-pair still gets a self-label —
    same contract as dup_clusters."""
    from glamr_omics_pipelines_spark.operators.dedup import (
        dup_clusters, dup_clusters_star)
    df = spark.createDataFrame([(5, 5), (1, 2)], "id_a long, id_b long")
    star = {r.id: r.label for r in dup_clusters_star(df).collect()}
    prop = {r.id: r.label for r in dup_clusters(df).collect()}
    assert star == prop == {5: 5, 1: 1, 2: 1}


def test_normalize_text_vertical_tab_cross_engine(spark):
    """\\x0B folds into whitespace — via the explicit class, which RE2
    oracles reproduce (RE2's \\s would not match it)."""
    df = spark.createDataFrame([(1, "a\x0bb")], "doc_id long, text string")
    out = text.normalize_text(df, "text").collect()
    assert out[0].norm_text == "a b"


def test_ngram_containment_asymmetry(spark):
    """A fragment fully inside a larger doc has containment 1.0 on its side
    while Jaccard stays small — the inclusion case Jaccard misses."""
    from glamr_omics_pipelines_spark.operators.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs)
    big = "abcdefghijklmnopqrstuvwxyz0123456789"
    frag = big[:10]
    df = spark.createDataFrame([(1, big), (2, frag)], "doc_id long, text string")
    cont = ngram_containment_pairs(df, "doc_id", "text", shingle_n=4).collect()
    assert len(cont) == 1
    r = cont[0]
    assert r.id_a == 1 and r.id_b == 2
    assert r.containment_b == 1.0 and r.containment_a < 0.25
    jac = ngram_jaccard_pairs(df, "doc_id", "text", shingle_n=4).collect()
    assert jac[0].jaccard < 0.25  # Jaccard can't see the inclusion


def test_shannon_diversity_hand_computed(spark):
    import math
    from glamr_omics_pipelines_spark.operators.diversity import shannon_diversity
    # sample s1: counts 1,1,2 -> p = .25,.25,.5 -> H = 1.5*ln2; s2: single taxon
    df = spark.createDataFrame(
        [("s1", "t1", 1.0), ("s1", "t2", 1.0), ("s1", "t3", 2.0),
         ("s2", "t1", 7.0)],
        "sample string, taxon string, cnt double")
    out = {r.sample: r for r in shannon_diversity(df, "sample", "cnt").collect()}
    assert abs(out["s1"].shannon - 1.5 * math.log(2)) < 1e-9
    assert out["s1"].richness == 3
    assert abs(out["s1"].evenness - 1.5 * math.log(2) / math.log(3)) < 1e-9
    assert out["s2"].shannon == 0.0 and out["s2"].evenness is None


def test_bray_curtis_hand_computed(spark):
    from glamr_omics_pipelines_spark.operators.diversity import bray_curtis_pairs
    # a: {t1:6, t2:4}; b: {t1:2, t3:8} -> minsum=2, totals 10+10
    # BC = 1 - 2*2/20 = 0.8 ; identical samples -> 0
    df = spark.createDataFrame(
        [("a", "t1", 6.0), ("a", "t2", 4.0),
         ("b", "t1", 2.0), ("b", "t3", 8.0),
         ("c", "t1", 6.0), ("c", "t2", 4.0)],
        "sample string, taxon string, cnt double")
    out = {(r.sample_a, r.sample_b): r.bray_curtis
           for r in bray_curtis_pairs(df, "sample", "taxon", "cnt").collect()}
    assert abs(out[("a", "b")] - 0.8) < 1e-9
    assert abs(out[("a", "c")] - 0.0) < 1e-9


def test_rarefaction_monotone_in_depth(spark):
    from glamr_omics_pipelines_spark.operators.diversity import rarefaction_counts
    rows = [("s", f"t{i % 37}", i) for i in range(500)]
    df = spark.createDataFrame(rows, "sample string, taxon string, read_id long")
    out = {r.depth_pct: r.richness
           for r in rarefaction_counts(df, "sample", "taxon", "read_id",
                                       [10, 50, 100]).collect()}
    # nested subsamples: richness must be monotone, full depth sees all taxa
    assert out[10] <= out[50] <= out[100] == 37


def test_chao1_hand_computed(spark):
    from glamr_omics_pipelines_spark.operators.diversity import chao1_richness
    # s1: 3 observed taxa, 2 singletons, 1 doubleton ->
    # chao1 = 3 + 2*1/(2*2) = 3.5
    df = spark.createDataFrame(
        [("s1", "t1", 1), ("s1", "t2", 1), ("s1", "t3", 2),
         ("s2", "t1", 5)],
        "sample string, taxon string, cnt long")
    out = {r.sample: r for r in chao1_richness(df, "sample", "cnt").collect()}
    assert out["s1"].s_obs == 3 and out["s1"].f1 == 2 and out["s1"].f2 == 1
    assert abs(out["s1"].chao1 - 3.5) < 1e-9
    # no singletons -> estimator equals observed richness
    assert out["s2"].chao1 == 1.0


def test_hashed_linear_score_reference_math(spark):
    """Score equals a hand-computed sigmoid over the hashed buckets, the
    empty doc scores sigmoid(bias), and the plan stays scan-stage."""
    import hashlib
    import math
    from glamr_omics_pipelines_spark.operators import text as T
    w = [0.5, -1.0, 2.0, 0.25]
    df = spark.createDataFrame([(1, "Alpha beta alpha"), (2, "")],
                               ["doc_id", "text"])
    out = T.hashed_linear_score(df, "text", w, bias=0.3)
    got = {r["doc_id"]: r["score"] for r in out.collect()}

    def bucket(tok):
        return int(hashlib.md5(f"feat:{tok}".encode()).hexdigest()[:8],
                   16) % 4
    z = 0.3 + sum(w[bucket(t)] for t in ["alpha", "beta", "alpha"])
    assert got[1] == pytest.approx(1 / (1 + math.exp(-z)))
    assert got[2] == pytest.approx(1 / (1 + math.exp(-0.3)))

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan            # pure projection
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_hashed_linear_score_guards(spark):
    from glamr_omics_pipelines_spark.operators import text as T
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        T.hashed_linear_score(df, "text", [])


def test_hashed_linear_score_scratch_collision(spark):
    """Input columns named _w/_z must survive the scoring untouched."""
    from glamr_omics_pipelines_spark.operators import text as T
    df = spark.createDataFrame([(1, "hello world", 7, 9)],
                               ["doc_id", "text", "_w", "_z"])
    out = T.hashed_linear_score(df, "text", [0.1, -0.2, 0.3, 0.4])
    row = out.collect()[0]
    assert row["_w"] == 7 and row["_z"] == 9
    assert 0.0 < row["score"] < 1.0
