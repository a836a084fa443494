"""Brute-force parity property tests for the dedup / similarity family —
independent Python set arithmetic vs the inverted-index / LSH / banding
plans, on arbitrary hypothesis inputs (the insurance layer the example
tests in test_dedup_similarity.py and the DuckDB oracle can't give: both
can share a misunderstanding with the Spark plan; Python sets can't)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from glamr_omics_pipelines_spark.operators import dedup, similarity

SETTINGS = dict(max_examples=8, deadline=None)

# tiny alphabet so random texts genuinely share shingles
texts = st.text(alphabet="abc ", min_size=0, max_size=14)


def _py_shingles(s: str, n: int) -> set[str]:
    """char_shingles' exact semantics: substr windows 1..max(len-n+1, 1) —
    a text shorter than n yields ONE shingle, the whole (possibly empty)
    text."""
    return {s[i:i + n] for i in range(max(len(s) - n + 1, 1))}


@settings(**SETTINGS)
@given(st.lists(texts, min_size=2, max_size=8), st.integers(2, 4))
def test_ngram_jaccard_pairs_matches_python_sets(spark, docs, n):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text",
                                              shingle_n=n).collect()}
    spark.catalog.clearCache()
    want = {}
    sh = {i: _py_shingles(s, n) for i, s in enumerate(docs)}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sh[a] & sh[b])
            if inter:
                want[(a, b)] = inter / len(sh[a] | sh[b])
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-12 for k in want)


@settings(**SETTINGS)
@given(st.lists(texts, min_size=2, max_size=8), st.integers(2, 4))
def test_ngram_containment_pairs_matches_python_sets(spark, docs, n):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    got = {(r.id_a, r.id_b): (r.containment_a, r.containment_b)
           for r in dedup.ngram_containment_pairs(df, "doc_id", "text",
                                                  shingle_n=n).collect()}
    spark.catalog.clearCache()
    sh = {i: _py_shingles(s, n) for i, s in enumerate(docs)}
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sh[a] & sh[b])
            if inter:
                want[(a, b)] = (inter / len(sh[a]), inter / len(sh[b]))
    assert set(got) == set(want)
    for k, (ca, cb) in want.items():
        assert abs(got[k][0] - ca) < 1e-12 and abs(got[k][1] - cb) < 1e-12


@settings(**SETTINGS)
@given(st.lists(texts.filter(lambda s: s.strip()), min_size=1, max_size=5))
def test_simhash_exact_copies_are_always_candidates(spark, docs):
    """An exact copy has the identical token multiset → identical 64-bit
    simhash → equal slice in EVERY band → the pair must always surface."""
    rows = [(i, s) for i, s in enumerate(docs)] + \
           [(i + 100, s) for i, s in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {(r.id_a, r.id_b) for r in
           dedup.simhash_candidates(df, "doc_id", "text").collect()}
    spark.catalog.clearCache()
    for i in range(len(docs)):
        assert (i, i + 100) in got


@settings(**SETTINGS)
@given(st.lists(texts, min_size=1, max_size=5))
def test_minhash_exact_copies_are_always_candidates(spark, docs):
    """An exact copy has the identical shingle set → identical minhash
    signature → equal band digest in EVERY band → always a candidate."""
    rows = [(i, s) for i, s in enumerate(docs)] + \
           [(i + 100, s) for i, s in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {(r.id_a, r.id_b) for r in
           dedup.minhash_lsh_candidates(df, "doc_id", "text", num_hashes=16,
                                        bands=4, shingle_n=3).collect()}
    spark.catalog.clearCache()
    for i in range(len(docs)):
        assert (i, i + 100) in got


vecs = st.lists(st.lists(st.integers(1, 5), min_size=3, max_size=3),
                min_size=3, max_size=10)


@settings(**SETTINGS)
@given(vecs, st.integers(1, 4))
def test_brute_force_topk_matches_numpy_cosines(spark, vs, k):
    """Per query: the returned cosines are exactly the k largest brute
    cosines (sorted, tolerance 1e-9) and each returned pair's cosine is
    the true cosine of that pair — tiebreak-agnostic parity."""
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id long, emb array<double>")
    queries = spark.createDataFrame(
        [(0, [float(x) for x in vs[0]])], "query_id long, emb array<double>")
    rows = similarity.brute_force_topk(corpus, queries, "vec_id", "emb",
                                       k=k).collect()
    spark.catalog.clearCache()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(x * x for x in b)))

    brute = sorted((cos(vs[0], v) for i, v in enumerate(vs) if i != 0),
                   reverse=True)[:k]
    got = sorted((r.cosine for r in rows), reverse=True)
    assert len(got) == len(brute)
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, brute))
    for r in rows:
        assert abs(r.cosine - cos(vs[0], vs[r.neighbor_id])) < 1e-9


# ---------------------------------------------------------------------------
# Late-r9 operators: semdedup / bloom / hist sketch vs Python references
# ---------------------------------------------------------------------------

_vecs = st.lists(
    st.lists(st.floats(min_value=-1.0, max_value=1.0,
                       allow_nan=False, allow_infinity=False,
                       width=32),
             min_size=3, max_size=3),
    min_size=2, max_size=8)


@settings(**SETTINGS)
@given(_vecs)
def test_semdedup_single_cell_matches_python_greedy(spark, vecs):
    """With ONE cell covering everything, semdedup's drop rule reduces to
    the global greedy keep-lowest-id law: row i is dropped iff some j < i
    has round-6 cosine >= threshold, and dup_of is the SMALLEST such j —
    verified against plain Python arithmetic."""
    th = 0.9
    df = spark.createDataFrame(list(enumerate(vecs)),
                               "vec_id int, embedding array<double>")
    out = dedup.semdedup(df, "vec_id", "embedding",
                         centroids=[[0.0, 0.0, 0.0]], threshold=th)
    got = {r["vec_id"]: (r["dup_of"], r["keep"]) for r in out.collect()}
    spark.catalog.clearCache()

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return None if na == 0 or nb == 0 else num / (na * nb)

    for i in range(len(vecs)):
        dup_of = None
        for j in range(i):
            c = cos(vecs[j], vecs[i])
            if c is not None and round(c, 6) >= th:
                dup_of = j
                break
        assert got[i] == (dup_of, dup_of is None), (i, vecs)


@settings(**SETTINGS)
@given(st.lists(st.text(alphabet="abcd", min_size=0, max_size=6),
                min_size=1, max_size=20),
       st.integers(1, 4))
def test_bloom_no_false_negatives_property(spark, keys, k):
    """The no-false-negative law on arbitrary key sets and hash counts:
    every key that went INTO the filter tests maybe_seen."""
    from glamr_omics_pipelines_spark.operators import sketches
    df = spark.createDataFrame([(x,) for x in keys], ["key"])
    bloom = sketches.bloom_build(df, "key", m_bits=256, k=k)
    out = sketches.bloom_novel(df, "key", bloom, m_bits=256, k=k)
    rows = out.collect()
    spark.catalog.clearCache()
    assert len(rows) == len(set(keys))
    assert all(r["maybe_seen"] for r in rows)


@settings(**SETTINGS)
@given(st.lists(st.floats(min_value=-100, max_value=100,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=40),
       st.sampled_from([0.5, 1.0, 7.5]))
def test_hist_quantile_bounds_property(spark, vals, width):
    """On arbitrary inputs: rollup of singleton-group sketches equals the
    direct sketch, and every quantile estimate lands within one bin width
    of a true order statistic."""
    from glamr_omics_pipelines_spark.operators import sketches
    rows = [("g", f"p{i % 3}", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["g", "part", "v"])
    fine = sketches.hist_sketch(df, ["g", "part"], "v", width=width)
    merged = sketches.hist_rollup(fine, ["g"])
    direct = sketches.hist_sketch(df, ["g"], "v", width=width)
    a = {(r["g"], r["bin"]): r["n"] for r in merged.collect()}
    b = {(r["g"], r["bin"]): r["n"] for r in direct.collect()}
    assert a == b
    out = sketches.hist_quantiles(merged, ["g"], [0.25, 0.5, 1.0],
                                  width=width)
    got = {r["q"]: r["est"] for r in out.collect()}
    spark.catalog.clearCache()
    svals = sorted(vals)
    n = len(svals)
    for q, est in got.items():
        rank = max(math.ceil(q * n) - 1, 0)
        assert abs(est - svals[rank]) <= width + 1e-9, (q, est, svals)


def test_hamming_candidates_pigeonhole_property(spark):
    """Property (pigeonhole): ANY pair within Hamming distance bands-1
    shares at least one exact band slice, so it is ALWAYS a candidate."""
    import random
    from glamr_omics_pipelines_spark.operators import dedup as D
    rng = random.Random(23)
    rows, want = [], set()
    mid = 0
    for trial in range(12):
        base = rng.getrandbits(64)
        # partner at hamming d <= 3 (bands=4 -> always caught)
        d = rng.randint(0, 3)
        partner = base
        for bit in rng.sample(range(64), d):
            partner ^= 1 << bit
        def sgn(v):
            return v - (1 << 64) if v >= 1 << 63 else v
        a, b = mid, mid + 1
        mid += 2
        rows += [(a, sgn(base)), (b, sgn(partner))]
        want.add((a, b, d))
    df = spark.createDataFrame(rows, "media_id long, phash long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in D.hamming_candidates(df, "media_id", "phash",
                                         bands=4).collect()}
    for a, b, d in want:
        if d == 0 and a != b:
            pass
        assert got.get((a, b)) == d, (a, b, d, got.get((a, b)))
