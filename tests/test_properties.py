"""Property-based tests (hypothesis) for the algebraic operators — the
invariants hold for ARBITRARY inputs, not just fixtures."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.operators import abundance, taxonomy
from glamr_omics_pipelines_spark.pipelines import glamr

SETTINGS = dict(max_examples=8, deadline=None)

paths = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=4),
    min_size=1, max_size=12)


@settings(**SETTINGS)
@given(paths)
def test_lca_is_common_prefix_of_all(spark, ps):
    df = spark.createDataFrame([(1, p) for p in ps], ["g", "path"])
    out = taxonomy.lca_aggregate(df, ["g"], "path").collect()[0].lca_path
    # out is a prefix of every path...
    assert all(list(p[:len(out)]) == list(out) for p in ps)
    # ...and maximal: extending by one more element breaks prefix-ness
    k = len(out)
    assert not all(len(p) > k and p[k] == ps[0][k] for p in ps) \
        or any(len(p) <= k for p in ps) or not all(
            p[k] == ps[0][k] for p in ps if len(p) > k)


counts = st.lists(st.tuples(st.sampled_from(["s1", "s2"]),
                            st.integers(min_value=1, max_value=10_000),
                            st.integers(min_value=1, max_value=5_000)),
                  min_size=2, max_size=20)


@settings(**SETTINGS)
@given(counts)
def test_tpm_always_sums_to_1e6(spark, rows):
    df = spark.createDataFrame(
        [(s, float(n), float(ln)) for s, n, ln in rows],
        ["sample", "n", "len"])
    out = abundance.tpm(df, "n", "len", ["sample"])
    sums = out.groupBy("sample").agg(F.sum("tpm").alias("t")).collect()
    assert all(abs(r.t - 1e6) < 1e-3 for r in sums)


def test_annotate_contigs_chain(spark):
    hits = spark.createDataFrame(
        [("c1_1", "U1", 1e-30, 200.0), ("c1_1", "U2", 1e-10, 90.0),
         ("c1_2", "U2", 1e-20, 150.0), ("c2_1", "U3", 1e-8, 70.0),
         ("c2_2", "U9", 1e-2, 30.0)],   # above cutoff -> dropped
        ["gene", "hit", "evalue", "bitscore"])
    lineage = spark.createDataFrame(
        [("U1", ["Bacteria", "Proteo", "Ecoli"]),
         ("U2", ["Bacteria", "Proteo", "Vibrio"]),
         ("U3", ["Archaea", "Eury"])],
        ["hit", "lineage_path"])
    funcs = spark.createDataFrame(
        [("U1", "K00001"), ("U2", "K00002"), ("U3", "K00003")],
        ["hit", "function"])
    genes, contig_lca, func_counts = glamr.annotate_contigs(
        hits, lineage, funcs)
    g = {r.gene: r for r in genes.collect()}
    assert g["c1_1"].hit == "U1"           # best e-value wins
    assert "c2_2" not in g                 # cutoff applied
    lca = {r.contig: r.lca_path for r in contig_lca.collect()}
    assert lca["c1"] == ["Bacteria", "Proteo"]   # Ecoli vs Vibrio
    assert lca["c2"] == ["Archaea", "Eury"]
    fc = {(r.contig, r["function"]): r.n_genes for r in func_counts.collect()}
    assert fc[("c1", "K00001")] == 1 and fc[("c1", "K00002")] == 1


texts = st.text(alphabet=st.sampled_from("acgt ACGT.@/:+-019\n"), max_size=80)
quals = st.lists(st.integers(min_value=0, max_value=41), max_size=60)


@settings(**SETTINGS)
@given(quals)
def test_sliding_window_trim_invariants(spark, phreds):
    """For ANY quality string: 0 <= front <= tail-ish bounds hold and the
    trimmed pieces are consistent slices of the originals."""
    from glamr_omics_pipelines_spark.functions import bio
    seq = "A" * len(phreds)
    q = "".join(chr(33 + p) for p in phreds)
    df = spark.createDataFrame([(seq, q)], ["seq", "qual"])
    r = bio.sliding_window_trim(df, window=4, min_mean_q=20).collect()[0]
    n = len(phreds)
    assert 0 <= r["front_cut"] <= n and 0 <= r["tail_cut"] <= n
    assert r["front_cut"] + r["tail_cut"] + len(r["trimmed_seq"]) == n
    assert len(r["trimmed_seq"]) == len(r["trimmed_qual"])
    assert r["trimmed_qual"] == q[r["front_cut"]: n - r["tail_cut"]]


@settings(**SETTINGS)
@given(st.lists(texts, min_size=1, max_size=6))
def test_repetition_fracs_bounded(spark, docs):
    from glamr_omics_pipelines_spark.operators import text as T
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    for r in T.repetition_metrics(df, "text").collect():
        for c in ["dup_word_frac", "dup_bigram_frac", "top_bigram_frac"]:
            assert 0.0 <= r[c] <= 1.0, (c, r[c])


@settings(**SETTINGS)
@given(st.lists(texts, min_size=1, max_size=6))
def test_pii_scrub_idempotent(spark, docs):
    """Scrubbing twice == scrubbing once (placeholders never re-match), and
    no email/URL survives a scrub."""
    from glamr_omics_pipelines_spark.operators import text as T
    import re
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    once = T.scrub_pii(df, "text").select(
        "doc_id", F.col("clean_text").alias("text"))
    twice = T.scrub_pii(once, "text")
    for r in twice.collect():
        assert r["text"] == r["clean_text"]
        assert not re.search(T.PII_PATTERNS[0][0], r["clean_text"])
        assert not re.search(T.PII_PATTERNS[1][0], r["clean_text"])


asof_rows = st.lists(st.tuples(st.sampled_from(["u1", "u2"]),
                               st.integers(min_value=0, max_value=100)),
                     min_size=1, max_size=15)


@settings(**SETTINGS)
@given(asof_rows, asof_rows)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    """For ANY inputs: each left row attaches the max right ts <= its ts
    (per key), ties broken by max tiebreak id — pandas.merge_asof semantics."""
    from glamr_omics_pipelines_spark.operators import joins
    left = spark.createDataFrame(
        [(u, t, i) for i, (u, t) in enumerate(lrows)], ["u", "ts", "lid"])
    right = spark.createDataFrame(
        [(u, t, i) for i, (u, t) in enumerate(rrows)], ["u", "ts", "rid"])
    out = joins.asof_join(left, right, on=["u"], left_ts="ts", right_ts="ts",
                          tiebreak="rid", right_prefix="r_")
    got = {r["lid"]: r["r_rid"] for r in out.collect()}
    for i, (u, t) in enumerate(lrows):
        cand = [(rt, j) for j, (ru, rt) in enumerate(rrows)
                if ru == u and rt <= t]
        expect = max(cand)[1] if cand else None
        assert got[i] == expect, (i, u, t, cand)


_line = st.sampled_from(["COOKIE BANNER", "alpha text", "beta words",
                         "gamma run", "", "tail bit"])
_docs_lines = st.lists(
    st.lists(_line, min_size=1, max_size=5), min_size=2, max_size=8)


@settings(**SETTINGS)
@given(_docs_lines)
def test_line_dedup_idempotent_and_subsequence(spark, docs):
    from glamr_omics_pipelines_spark.operators import dedup
    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        ["doc_id", "text"])
    once = dedup.line_dedup(df, "doc_id", "text", min_docs=2)
    got = {r["doc_id"]: r["clean_text"] for r in once.collect()}
    # surviving lines are an ordered subsequence of the input lines
    for i, lines in enumerate(docs):
        kept = got[i].split("\n") if got[i] != "" else []
        it = iter(lines)
        assert all(any(l == k for l in it) for k in kept), (lines, kept)
    # idempotent: surviving lines' doc-counts are unchanged by the removal,
    # so a second pass removes nothing
    again = dedup.line_dedup(
        once.select("doc_id", F.col("clean_text").alias("text")),
        "doc_id", "text", min_docs=2)
    got2 = {r["doc_id"]: r["clean_text"] for r in again.collect()}
    assert got2 == got


_tok = st.sampled_from(["one", "two", "three", "four", "xx", "yy"])
_docs_toks = st.lists(
    st.lists(_tok, min_size=1, max_size=10), min_size=2, max_size=6)


@settings(**SETTINGS)
@given(_docs_toks)
def test_span_dedup_token_conservation(spark, docs):
    from glamr_omics_pipelines_spark.operators import dedup
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"])
    out = dedup.span_dedup(df, "doc_id", "text", w=3, min_docs=2).collect()
    got = {r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
           for r in out}
    for i, toks in enumerate(docs):
        kept = got[i][0].split(" ") if got[i][0] != "" else []
        # kept + removed partitions the token stream
        assert len(kept) + got[i][1] == len(toks)
        # kept tokens are an ordered subsequence of the input
        it = iter(toks)
        assert all(any(t == k for t in it) for k in kept)


_pts = st.lists(
    st.tuples(st.floats(min_value=44.0, max_value=46.0,
                        allow_nan=False, allow_infinity=False),
              st.floats(min_value=-86.0, max_value=-84.0,
                        allow_nan=False, allow_infinity=False)),
    min_size=2, max_size=12)


@settings(**SETTINGS)
@given(_pts)
def test_geo_neighbors_matches_bruteforce(spark, pts):
    from glamr_omics_pipelines_spark.operators.joins import (
        geo_neighbor_pairs, haversine_km)
    df = spark.createDataFrame(
        [(i, lat, lon) for i, (lat, lon) in enumerate(pts)],
        ["sample_id", "lat", "lon"])
    fast = {(r["id_a"], r["id_b"])
            for r in geo_neighbor_pairs(df, "sample_id",
                                        radius_km=40.0).collect()}
    a = df.select(F.col("sample_id").alias("id_a"),
                  F.col("lat").alias("la"), F.col("lon").alias("lo"))
    b = df.select(F.col("sample_id").alias("id_b"),
                  F.col("lat").alias("lb"), F.col("lon").alias("lb2"))
    brute = {(r["id_a"], r["id_b"]) for r in
             a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
             .withColumn("d", haversine_km(F.col("la"), F.col("lo"),
                                           F.col("lb"), F.col("lb2")))
             .filter(F.col("d") <= 40.0).collect()}
    assert fast == brute


# --- interval toolkit invariants -------------------------------------------

iv_lists = st.lists(
    st.tuples(st.integers(0, 60), st.integers(1, 25)),  # (start, length)
    min_size=1, max_size=14)


@settings(**SETTINGS)
@given(iv_lists)
def test_merge_equals_covered_bases(spark, ivs):
    """Duality: the merged islands' total length equals the bases covered
    at depth >= 1 by the sweep — two independent operators, one measure."""
    from glamr_omics_pipelines_spark.operators import intervals
    df = spark.createDataFrame([("g", s, s + ln) for s, ln in ivs],
                               "g string, s long, e long")
    merged = intervals.merge_intervals(df, ["g"], "s", "e").collect()
    merged_len = sum(r.merged_end - r.merged_start for r in merged)
    hist = intervals.coverage_histogram(df, ["g"], "s", "e").collect()
    covered = sum(r.bases for r in hist)
    assert merged_len == covered
    # islands are disjoint and sorted-separated
    spans = sorted((r.merged_start, r.merged_end) for r in merged)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2  # book-ended islands would have merged


@settings(**SETTINGS)
@given(iv_lists)
def test_coverage_mass_conservation(spark, ivs):
    """Σ depth·seg_len over the sweep == Σ interval lengths (every base of
    every interval is accounted for exactly once)."""
    from glamr_omics_pipelines_spark.operators import intervals
    df = spark.createDataFrame([("g", s, s + ln) for s, ln in ivs],
                               "g string, s long, e long")
    segs = intervals.coverage_depth(df, ["g"], "s", "e").collect()
    swept = sum(r.depth * (r.seg_end - r.seg_start) for r in segs)
    assert swept == sum(ln for _, ln in ivs)


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 100), min_size=1, max_size=10),
       st.lists(st.integers(0, 100), min_size=1, max_size=10))
def test_nearest_feature_matches_brute_force(spark, ppos, fpos):
    from glamr_omics_pipelines_spark.operators import intervals
    pts = spark.createDataFrame(
        [("g", i, p) for i, p in enumerate(ppos)],
        "g string, pid long, pos long")
    feats = spark.createDataFrame(
        [("g", 1000 + i, p) for i, p in enumerate(fpos)],
        "g string, fid long, fpos long")
    got = {r.pid: (r.nearest_id, r.distance)
           for r in intervals.nearest_feature(
               pts, feats, ["g"], "pid", "pos", "fid", "fpos").collect()}
    for i, p in enumerate(ppos):
        best = min((abs(fp - p), 1000 + j) for j, fp in enumerate(fpos))
        # brute force: min distance, then min fid — but equal positions
        # collapse to min fid first, which the (dist, fid) min reproduces
        assert got[i] == (best[1], best[0]), (p, fpos)


# --- SCD2 / chunking invariants --------------------------------------------

scd_runs = st.lists(st.sampled_from(["A", "B", "C"]), min_size=1, max_size=12)


@settings(**SETTINGS)
@given(scd_runs)
def test_scd2_conserves_events_and_tiles_time(spark, states):
    import datetime as _dt
    from glamr_omics_pipelines_spark.operators import windows as W
    rows = [("k", _dt.datetime(2024, 1, 1) + _dt.timedelta(days=i), i, s)
            for i, s in enumerate(states)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, ord long, st string")
    out = sorted(W.scd2_compress(df, ["k"], "ts", ["st"], ["ord"]).collect(),
                 key=lambda r: r.version)
    assert sum(r.n_events for r in out) == len(states)
    # versions are 1..n_runs; intervals tile: valid_to == next valid_from
    assert [r.version for r in out] == list(range(1, len(out) + 1))
    for a, b in zip(out, out[1:]):
        assert a.valid_to == b.valid_from
    assert out[-1].valid_to is None
    # run compression matches an independent itertools groupby
    import itertools
    runs = [(k, len(list(g))) for k, g in itertools.groupby(states)]
    assert [(r.st, r.n_events) for r in out] == runs


@settings(**SETTINGS)
@given(st.lists(st.sampled_from(["tok%d" % i for i in range(9)]),
                min_size=1, max_size=30),
       st.integers(1, 8))
def test_chunk_tokens_exact_cover_when_stride_equals_size(spark, toks, size):
    from glamr_omics_pipelines_spark.operators import text as T
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    out = sorted(T.chunk_tokens(df, "doc_id", "text", size, size).collect(),
                 key=lambda r: r.chunk_id)
    # non-overlapping chunks reconstruct the document exactly
    rebuilt = " ".join(r.chunk_text for r in out)
    assert rebuilt == " ".join(toks)
    assert sum(r.n_tokens for r in out) == len(toks)


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 300), min_size=1, max_size=40, unique=True),
       st.lists(st.integers(0, 300), min_size=0, max_size=20, unique=True))
def test_bitset_semi_join_equals_plain_semi(spark, big_keys, small_keys):
    from glamr_omics_pipelines_spark.operators.joins import (
        bitset_prune_semi_join)
    big = spark.createDataFrame([(k,) for k in big_keys], "k long")
    small = spark.createDataFrame([(k,) for k in small_keys] or [(None,)],
                                  "k long")
    small = small.filter(F.col("k").isNotNull())
    expect = sorted(r.k for r in big.join(small, "k", "left_semi").collect())
    got = sorted(r.k for r in
                 bitset_prune_semi_join(big, small, "k", 512).collect())
    assert got == expect


ids_lens = st.lists(st.tuples(st.integers(0, 50),
                              st.integers(1, 500)),
                    min_size=1, max_size=25, unique_by=lambda t: t[0])


@settings(**SETTINGS)
@given(ids_lens)
def test_nx_stats_matches_bruteforce(spark, rows):
    from glamr_omics_pipelines_spark.functions import bio
    df = spark.createDataFrame([("g", i, n) for i, n in rows],
                               "g string, id int, len long")
    out = bio.nx_stats(df, ["g"], "len", "id").collect()[0]
    lens = sorted((n for _, n in rows), reverse=True)
    total = sum(lens)
    cum, n50, l50 = 0, None, None
    for pos, ln in enumerate(lens, 1):
        cum += ln
        if cum * 100 >= total * 50:
            n50, l50 = ln, pos
            break
    assert out.total_len == total and out.n50 == n50 and out.l50 == l50


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                min_size=1, max_size=30))
def test_triangle_count_matches_bruteforce(spark, raw):
    from glamr_omics_pipelines_spark.operators import graph
    import itertools
    edges = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    if not edges:
        return
    df = spark.createDataFrame(list(edges), "src int, dst int")
    got = {r.node: r.triangles for r in graph.triangle_count(df).collect()}
    nodes = {v for e in edges for v in e}
    want = {}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if ({(a, b), (a, c), (b, c)} <= edges):
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                min_size=1, max_size=30), st.integers(2, 4))
def test_k_core_matches_bruteforce(spark, raw, k):
    from glamr_omics_pipelines_spark.operators import graph
    edges = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    if not edges:
        return
    df = spark.createDataFrame(list(edges), "src int, dst int")
    got = {r.node: r.core_degree for r in
           graph.k_core(df, k=k, rounds=15).collect()}
    alive = {v for e in edges for v in e}
    while True:
        deg = {v: 0 for v in alive}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        new = {v for v in alive if deg[v] >= k}
        if new == alive:
            break
        alive = new
    want = {v: deg[v] for v in alive}
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(),
                          st.floats(-100, 100, allow_nan=False)),
                min_size=1, max_size=20))
def test_interpolate_idempotent_and_bounded(spark, vals):
    from glamr_omics_pipelines_spark.operators import timeseries
    df = spark.createDataFrame([("k", i, v) for i, v in enumerate(vals)],
                               "k string, x long, v double")
    out = sorted(timeseries.interpolate_linear(df, "k", "x", "v", "vi")
                 .collect(), key=lambda r: r.x)
    present = [v for v in vals if v is not None]
    if not present:
        assert all(r.vi is None for r in out)
        return
    lo, hi = min(present), max(present)
    for r in out:
        # repaired values never exceed the observed envelope (linearity)
        assert lo - 1e-9 <= r.vi <= hi + 1e-9
        if vals[r.x] is not None:
            assert r.vi == vals[r.x]


# votes: (cluster 0-2, taxon drawn from 2 named + the bare 'g__' prefix)
_vote_rows = st.lists(
    st.tuples(st.integers(0, 2),
              st.sampled_from(["g__A", "g__B", "g__"])),
    min_size=1, max_size=24)


def _ref_resolve(taxa: list[str]) -> str:
    """Direct transcription of the reference's resolve_majority_vote
    (gtdb_to_ncbi_majority_vote.py:259-320): most_common top-2 with the
    documented four cases; 'named' = longer than the 3-char rank prefix.
    Deterministic tie order (count desc, named first, taxon asc) — the
    ordering under which the reference's arbitrary Counter tie-break
    never changes the outcome (see operator docstring)."""
    from collections import Counter
    c = Counter(taxa)
    n = len(taxa)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], len(kv[0]) <= 3, kv[0]))
    (t1, n1) = ranked[0]
    req = 0.5 * n
    if n1 > req:
        return t1 if len(t1) > 3 else "none"
    if n1 < req:
        return "none"
    if len(ranked) == 1:
        return t1 if len(t1) > 3 else "none"
    (t2, n2) = ranked[1]
    if n2 < req:
        return t1 if len(t1) > 3 else "none"
    # two taxa at exactly 50%
    if len(t1) > 3 and len(t2) <= 3:
        return t1
    if len(t1) <= 3 and len(t2) > 3:
        return t2
    return "none"


@settings(**SETTINGS)
@given(_vote_rows)
def test_ncbi_majority_vote_matches_reference_transcription(spark, rows):
    df = spark.createDataFrame(rows, ["cluster", "taxon"])
    got = {r["cluster"]: r["mv_taxon"]
           for r in taxonomy.ncbi_majority_vote(df, ["cluster"],
                                                "taxon").collect()}
    from collections import defaultdict
    by_cluster = defaultdict(list)
    for cl, t in rows:
        by_cluster[cl].append(t)
    want = {cl: _ref_resolve(ts) for cl, ts in by_cluster.items()}
    assert got == want


_pack_docs = st.lists(
    st.tuples(st.integers(0, 500), st.integers(1, 900)),
    min_size=1, max_size=30, unique_by=lambda t: t[0])


@settings(**SETTINGS)
@given(_pack_docs)
def test_pack_sequences_bins_are_contiguous_prefix_intervals(spark, docs):
    """Packing invariants for arbitrary (id, n_tokens): within every
    shard, (a) bins are numbered from 0 without gaps, (b) each bin except
    the last holds >= budget... no — the CONTRACT is prefix-interval
    semantics: bin == floor(tokens_before/budget) under the deterministic
    (hash, id) order, so bins partition the shard's doc sequence into
    consecutive runs and every bin's starting offset is < (bin+1)*budget
    while its ending offset is >= bin*budget."""
    from glamr_omics_pipelines_spark.operators.sampling import pack_sequences
    budget = 1000
    df = spark.createDataFrame(docs, ["doc_id", "n_tokens"])
    out = pack_sequences(df, "doc_id", "n_tokens", budget=budget,
                         shards=4).collect()
    from collections import defaultdict
    shard_rows = defaultdict(list)
    for r in out:
        shard_rows[r["shard"]].append(r)
    assert sum(len(v) for v in shard_rows.values()) == len(docs)
    for rows in shard_rows.values():
        # reproduce the contract order: ascending (bin) must align with a
        # consistent doc order; verify via prefix sums in bin order
        by_bin = defaultdict(list)
        for r in rows:
            by_bin[r["bin"]].append(r)
        bins = sorted(by_bin)
        # bins numbered contiguously from 0
        assert bins[0] == 0 and bins == list(range(len(bins)))
        running = 0
        for b in bins:
            # bin b's first doc starts while the stream offset is inside
            # [b*budget, (b+1)*budget)
            start = running
            assert b * budget <= start < (b + 1) * budget or start == 0
            running += sum(r["n_tokens"] for r in by_bin[b])


_wins_rows = st.lists(st.tuples(st.integers(0, 1),
                                st.floats(-100, 100, allow_nan=False)),
                      min_size=3, max_size=40)


@settings(**SETTINGS)
@given(_wins_rows)
def test_winsorize_bounds_and_preserves_interior(spark, rows):
    """Winsorize invariants: outputs clamped to the group's [p_lo, p_hi],
    interior values pass through unchanged, row count conserved."""
    import numpy as np
    df = spark.createDataFrame(rows, ["g", "v"])
    out = abundance.winsorize(df, ["g"], "v", lo=0.1, hi=0.9).collect()
    assert len(out) == len(rows)
    from collections import defaultdict
    vals = defaultdict(list)
    for g, v in rows:
        vals[g].append(v)
    for g, vs in vals.items():
        lo = float(np.quantile(vs, 0.1))
        hi = float(np.quantile(vs, 0.9))
        got = [r for r in out if r["g"] == g]
        for r in got:
            w = r["winsorized"]
            assert lo - 1e-6 <= w <= hi + 1e-6
            if lo + 1e-9 < r["v"] < hi - 1e-9:
                assert abs(w - r["v"]) < 1e-6


@settings(**SETTINGS)
@given(iv_lists, iv_lists)
def test_subtract_intervals_matches_pointwise_set_difference(spark, ia, ib):
    """A − B computed by the signed sweep must equal the point-set
    difference: every integer point is in the output iff it is covered by
    A and not by B; output spans are maximal (book-ended spans merged)."""
    from glamr_omics_pipelines_spark.operators import intervals
    a = spark.createDataFrame([("g", s, s + ln) for s, ln in ia],
                              "g string, s long, e long")
    b = spark.createDataFrame([("g", s, s + ln) for s, ln in ib],
                              "g string, s long, e long")
    out = intervals.subtract_intervals(a, b, ["g"], "s", "e").collect()
    pa = {p for s, ln in ia for p in range(s, s + ln)}
    pb = {p for s, ln in ib for p in range(s, s + ln)}
    want = pa - pb
    got = {p for r in out for p in range(r["sub_start"], r["sub_end"])}
    assert got == want
    spans = sorted((r["sub_start"], r["sub_end"]) for r in out)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2  # maximal spans: adjacency would have merged


_hrw_keys = st.lists(st.integers(0, 10_000), min_size=1, max_size=40,
                     unique=True)


@settings(**SETTINGS)
@given(_hrw_keys, st.integers(2, 6))
def test_rendezvous_resharding_moves_only_to_the_new_shard(spark, keys, k):
    """The defining HRW property: growing K -> K+1 shards, every key
    either keeps its shard or moves to the NEW shard K — no key ever
    relocates between pre-existing shards (mod-hashing reshuffles ~all)."""
    from glamr_omics_pipelines_spark.operators.sampling import (
        rendezvous_assign)
    df = spark.createDataFrame([(x,) for x in keys], ["key"])
    before = {r["key"]: r["shard"]
              for r in rendezvous_assign(df, "key", k).collect()}
    after = {r["key"]: r["shard"]
             for r in rendezvous_assign(df, "key", k + 1).collect()}
    for key in keys:
        assert after[key] == before[key] or after[key] == k


_sess_ts = st.lists(st.integers(0, 20_000), min_size=1, max_size=30)


@settings(**SETTINGS)
@given(_sess_ts)
def test_sessionize_matches_bruteforce(spark, secs):
    """Gap sessionization vs a direct python fold over sorted event times:
    session ids must match per event for arbitrary (duplicated, unordered)
    second-grain timestamps."""
    import datetime as dt
    from glamr_omics_pipelines_spark.operators.windows import sessionize
    gap = 1800
    base = dt.datetime(2026, 1, 1)
    rows = [(1, base + dt.timedelta(seconds=s)) for s in secs]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = sorted((r["ts"], r["session_id"])
                 for r in sessionize(df, "user_id", "ts",
                                     gap_seconds=gap).collect())
    want, sid, last = [], 0, None
    for s in sorted(secs):
        if last is None or s - last > gap:
            sid += 1
        want.append((base + dt.timedelta(seconds=s), sid))
        last = s
    assert got == sorted(want)


_mode_rows = st.lists(st.tuples(st.integers(0, 2), st.integers(0, 5)),
                      min_size=1, max_size=40)


@settings(**SETTINGS)
@given(_mode_rows)
def test_top1_by_agg_mode_matches_counter(spark, rows):
    """group mode via the struct-min aggregate == Counter argmax with the
    documented tie-break (max count, then smallest value)."""
    from glamr_omics_pipelines_spark.operators.windows import top1_by_agg
    from collections import Counter, defaultdict
    df = spark.createDataFrame(rows, ["g", "v"])
    counts = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n"))
    out = {r["g"]: (r["v"], r["n"]) for r in
           top1_by_agg(counts, ["g"], order=[("n", False), ("v", True)],
                       payload=["v", "n"]).collect()}
    per_g = defaultdict(list)
    for g, v in rows:
        per_g[g].append(v)
    for g, vs in per_g.items():
        c = Counter(vs)
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        assert out[g] == best


_gate_rows = st.lists(st.tuples(st.integers(0, 1), st.integers(0, 1000)),
                      min_size=4, max_size=40)


@settings(**SETTINGS)
@given(_gate_rows)
def test_quantile_gate_threshold_semantics(spark, rows):
    """quantile_gate keeps exactly the rows >= the group's exact
    interpolated quantile (numpy type-7 == Spark percentile)."""
    import numpy as np
    from glamr_omics_pipelines_spark.operators.sampling import quantile_gate
    from collections import defaultdict
    df = spark.createDataFrame(rows, ["g", "v"])
    kept = [(r["g"], r["v"]) for r in
            quantile_gate(df, ["g"], "v", q=0.25).collect()]
    per_g = defaultdict(list)
    for g, v in rows:
        per_g[g].append(v)
    want = []
    for g, vs in per_g.items():
        t = float(np.quantile(vs, 0.25))
        want += [(g, v) for v in vs if v >= t]
    assert sorted(kept) == sorted(want)


_twap_rows = st.lists(
    st.tuples(st.integers(0, 5000), st.integers(-50, 50)),
    min_size=1, max_size=25, unique_by=lambda t: t[0])


@settings(**SETTINGS)
@given(_twap_rows)
def test_twap_matches_bruteforce(spark, rows):
    """Time-weighted average vs the direct python integral over sorted
    (t, v) readings: sum(v_i * dt_i) / sum(dt_i), last reading dropped."""
    import datetime as dt
    from glamr_omics_pipelines_spark.operators.timeseries import (
        time_weighted_avg)
    base = dt.datetime(2026, 1, 1)
    data = [(1, i, base + dt.timedelta(seconds=s), float(v))
            for i, (s, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, eid int, ts timestamp, v double")
    got = time_weighted_avg(df, "k", "ts", "v", "eid").collect()
    srt = sorted(rows)
    if len(srt) < 2:
        assert got == []
        return
    num = sum(v * (srt[i + 1][0] - s) for i, (s, v) in enumerate(srt[:-1]))
    den = sum(srt[i + 1][0] - s for i, (s, v) in enumerate(srt[:-1]))
    r = got[0]
    assert r["n_intervals"] == len(srt) - 1
    assert abs(r["span_seconds"] - den) < 1e-6
    assert abs(r["twap"] - num / den) < 1e-6


_island_days = st.lists(st.integers(0, 60), min_size=1, max_size=30)


@settings(**SETTINGS)
@given(_island_days)
def test_gaps_islands_matches_bruteforce(spark, days):
    """date − row_number() island detection vs the direct consecutive-run
    scan over deduplicated sorted day offsets (runs of length >= 2)."""
    import datetime as dt
    from pyspark.sql import Window
    base = dt.date(2026, 1, 1)
    df = spark.createDataFrame(
        [(1, base + dt.timedelta(days=d)) for d in days], "k int, d date")
    w = Window.partitionBy("k").orderBy("d")
    runs = (df.distinct()
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_isl", F.date_sub(F.col("d"), F.col("_rn")))
            .groupBy("k", "_isl")
            .agg(F.min("d").alias("s"), F.max("d").alias("e"),
                 F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 2))
    got = sorted((r["s"], r["e"], r["n"]) for r in runs.collect())
    uniq = sorted(set(days))
    want, start = [], None
    for i, d in enumerate(uniq):
        if start is None:
            start = d
        if i + 1 == len(uniq) or uniq[i + 1] != d + 1:
            n = d - start + 1
            if n >= 2:
                want.append((base + dt.timedelta(days=start),
                             base + dt.timedelta(days=d), n))
            start = None
    assert got == sorted(want)


_cusum_vals = st.lists(st.integers(-20, 20), min_size=2, max_size=30)


@settings(**SETTINGS)
@given(_cusum_vals)
def test_cusum_changepoint_matches_bruteforce(spark, vals):
    """CUSUM argmax vs the direct python scan: S_i = cumsum_i - i*mean,
    pick max |S| (6-dp rounded), first index on ties."""
    from glamr_omics_pipelines_spark.operators.stats import cusum_changepoint
    rows = [(1, i, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k int, x int, eid int, v double")
    r = cusum_changepoint(df, "k", "x", "v", "eid").collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    cum, best = 0.0, None
    for i, v in enumerate(vals, start=1):
        cum += v
        s = round(abs(cum - i * mean), 6)
        if best is None or s > best[1]:
            best = (i, s)
    assert (r["changepoint_idx"], r["max_cusum"]) == best
    assert r["n_points"] == n


_ws_rows = st.lists(
    st.tuples(st.integers(0, 100_000), st.integers(1, 50)),
    min_size=1, max_size=25, unique_by=lambda t: t[0])


@settings(**SETTINGS)
@given(_ws_rows)
def test_weighted_sample_matches_python_es_keys(spark, rows):
    """Efraimidis–Spirakis sampling vs a python reimplementation of the
    exact md5 key → u → -ln(u)/w score: the k winners (and tie order by
    key) must match bit-for-bit — the reproducibility the operator sells."""
    import hashlib
    import math
    from glamr_omics_pipelines_spark.operators.sampling import (
        weighted_sample)
    k = 5
    df = spark.createDataFrame(rows, ["key", "w"])
    got = sorted(r["key"] for r in
                 weighted_sample(df, [], "key", "w", k=k).collect())
    m = 1 << 20

    def score(key, w):
        h = int(hashlib.md5(f"wsample:{key}".encode()).hexdigest()[:8], 16)
        u = ((h % m) + 0.5) / m
        return -math.log(u) / w

    want = sorted(key for key, w in
                  sorted(rows, key=lambda t: (score(*t), t[0]))[:k])
    assert got == want
