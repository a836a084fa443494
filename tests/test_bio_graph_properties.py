"""Brute-force parity property tests for the iterative-graph and row-local
bio-sketch operators — an independent Python reference implementation per
operator, checked on arbitrary hypothesis-generated inputs (the same
insurance layer test_properties.py gives the algebraic ops and
test_stats_properties.py gives the stats family: the DuckDB oracle can share
a misunderstanding with the Spark query; a from-scratch reference cannot).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.functions import bio
from glamr_omics_pipelines_spark.operators import graph

SETTINGS = dict(max_examples=8, deadline=None)

weighted_edges = st.dictionaries(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    st.integers(min_value=1, max_value=3),
    min_size=1, max_size=25)


@settings(**SETTINGS)
@given(weighted_edges, st.integers(1, 6))
def test_pagerank_matches_power_iteration(spark, raw, iters):
    """pagerank == a plain dict-based power iteration with the SAME
    conventions (nodes = src ∪ dst, dangling mass dropped, fixed
    iterations): rank ← (1−d)/N + d·Σ_in rank_src · w/wout_src."""
    edges = [(s, d, float(w)) for (s, d), w in sorted(raw.items())]
    df = spark.createDataFrame(edges, "src int, dst int, weight double")
    got = {r.node: r.rank
           for r in graph.pagerank(df, iterations=iters).collect()}

    nodes = sorted({v for s, d, _ in edges for v in (s, d)})
    n = len(nodes)
    damping = 0.85
    wout: dict[int, float] = defaultdict(float)
    for s, _, w in edges:
        wout[s] += w
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib: dict[int, float] = defaultdict(float)
        for s, d, w in edges:
            contrib[d] += ranks[s] * w / wout[s]
        ranks = {v: (1.0 - damping) / n + damping * contrib.get(v, 0.0)
                 for v in nodes}

    assert set(got) == set(ranks)
    assert all(abs(got[v] - ranks[v]) < 1e-9 for v in ranks)


dna = st.text(alphabet="ACGT", min_size=0, max_size=30)


@settings(**SETTINGS)
@given(st.lists(dna, min_size=1, max_size=8),
       st.integers(2, 4), st.integers(2, 4))
def test_minimizer_stats_matches_python_winnowing(spark, seqs, k, w):
    """minimizer_stats == a literal Python winnowing pass: md5-hash every
    k-mer, keep the min of each w-window, count distinct kept hashes.
    Sequences shorter than k+w−1 are dropped (too short for one window)."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)],
                               "id int, seq string")
    got = {r.id: (r.n_kmers, r.n_minimizers, r.density)
           for r in bio.minimizer_stats(df, "seq", k=k, w=w).collect()}

    want = {}
    for i, s in enumerate(seqs):
        if len(s) < k + w - 1:
            continue
        h = [hashlib.md5(s[j:j + k].encode()).hexdigest()
             for j in range(len(s) - k + 1)]
        mins = {min(h[j:j + w]) for j in range(len(h) - w + 1)}
        want[i] = (len(h), len(mins), round(len(mins) / len(h), 4))
    assert set(got) == set(want)
    for i, (nk, nm, dens) in want.items():
        assert got[i][0] == nk and got[i][1] == nm
        assert abs(got[i][2] - dens) < 1e-9


@settings(**SETTINGS)
@given(st.lists(dna, min_size=1, max_size=8), st.integers(2, 4))
def test_debruijn_stats_matches_python_census(spark, seqs, k):
    """debruijn_stats == a dict-based de Bruijn construction: consecutive
    k-mer edges within each read, dedup'd, then the in/out-degree census
    (linear / branching / tip classification)."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)],
                               "id int, seq string")
    row = bio.debruijn_stats(df, "seq", k=k).collect()[0]

    edges = set()
    for s in seqs:
        for j in range(len(s) - k):
            edges.add((s[j:j + k], s[j + 1:j + k + 1]))
    nodes = {v for e in edges for v in e}
    indeg = {v: 0 for v in nodes}
    outdeg = {v: 0 for v in nodes}
    for a, b in edges:
        outdeg[a] += 1
        indeg[b] += 1
    if not nodes:
        assert (row.n_nodes, row.n_edges) == (0, None) or row.n_nodes == 0
        return
    assert row.n_nodes == len(nodes)
    assert row.n_edges == len(edges)
    assert row.n_linear == sum(1 for v in nodes
                               if indeg[v] <= 1 and outdeg[v] <= 1)
    assert row.n_branching == sum(1 for v in nodes if outdeg[v] > 1)
    assert row.n_tips == sum(1 for v in nodes if indeg[v] == 0)


messy_dna = st.text(alphabet="ACGTacgtnN", min_size=0, max_size=25)


@settings(**SETTINGS)
@given(st.lists(messy_dna, min_size=1, max_size=8), st.integers(0, 2))
def test_translate_dna_matches_python_codon_walk(spark, seqs, frame):
    """translate_dna == a Python walk of CODON_TABLE over the uppercased
    sequence in the given frame (ambiguous codons → 'X', short → '')."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)],
                               "id int, seq string")
    got = {r.id: r.protein
           for r in bio.translate_dna(df, "seq", frame=frame).collect()}

    for i, s in enumerate(seqs):
        up = s.upper()
        if len(up) < frame + 3:
            assert got[i] == ""
            continue
        prot = "".join(
            bio.CODON_TABLE.get(up[j:j + 3], "X")
            for j in range(frame, len(up) - 2, 3))
        assert got[i] == prot


@settings(**SETTINGS)
@given(st.lists(dna, min_size=1, max_size=8), st.integers(2, 4))
def test_kmer_spectrum_matches_python_counter(spark, seqs, k):
    """kmer_spectrum == a Counter over every length-k substring."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)],
                               "id int, seq string")
    got = {r.kmer: r.n for r in bio.kmer_spectrum(df, "seq", k=k).collect()}
    want: dict[str, int] = defaultdict(int)
    for s in seqs:
        for j in range(len(s) - k + 1):
            want[s[j:j + k]] += 1
    assert got == dict(want)


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 45), min_size=0, max_size=12),
       st.integers(2, 5), st.integers(15, 25))
def test_sliding_window_trim_matches_python_fastp_walk(spark, phreds, W, Q):
    """sliding_window_trim == a literal Python walk of the documented fastp
    semantics: front = first position whose end-clipped window passes (none
    → trim to empty); tail = last position j > front whose start-clipped
    ENDING window passes (none → front)."""
    n = len(phreds)
    seq = "A" * n
    q = "".join(chr(33 + p) for p in phreds)
    df = spark.createDataFrame([(seq, q)], "seq string, qual string")
    r = bio.sliding_window_trim(df, window=W, min_mean_q=Q).collect()[0]

    front = n
    for i in range(n):
        win = phreds[i:i + W]
        if sum(win) / len(win) >= Q:
            front = i
            break
    tail = front
    for j in range(n, front, -1):
        win = phreds[max(0, j - W):j]
        if sum(win) / len(win) >= Q:
            tail = j
            break
    assert r["front_cut"] == front
    assert r["tail_cut"] == n - tail
    assert r["trimmed_seq"] == seq[front:tail]
    assert r["trimmed_qual"] == q[front:tail]


hits = st.lists(
    st.tuples(st.integers(0, 4),                       # gene
              st.text(alphabet="KQR", min_size=1, max_size=2),  # ko
              st.integers(0, 40),                      # score
              st.integers(1, 40),                      # threshold
              st.sampled_from([1e-6, 1e-4])),          # e_value
    min_size=1, max_size=20)


@settings(**SETTINGS)
@given(hits)
def test_anvio_stacked_filter_matches_python_walk(spark, raw):
    """anvio_stacked_filter == a literal Python walk of the four stacked
    layers from the reference MV (predicate gate → unique-or-significant →
    max-score rank → threshold/score/ko row_number winner)."""
    from glamr_omics_pipelines_spark.operators import windows
    df = spark.createDataFrame(
        [(g, k, float(s), float(t), e) for g, k, s, t, e in raw],
        "gene int, ko string, score double, thrshld double, e_value double")
    got = {(r.gene, r.ko, r.score, r.thrshld) for r in
           windows.anvio_stacked_filter(df, "gene", "score", "thrshld",
                                        "e_value", tiebreak_cols=["ko"])
           .collect()}

    per_gene = {}
    for g, k, s, t, e in raw:
        if s > 0.5 * t and e < 1e-5:                       # step 1
            per_gene.setdefault(g, []).append((k, float(s), float(t)))
    want = set()
    for g, rows in per_gene.items():
        rows2 = [r for r in rows
                 if len(rows) == 1 or r[1] >= r[2]]        # step 2
        if not rows2:
            continue
        mx = max(s for _, s, _ in rows2)
        rows3 = [r for r in rows2 if r[1] == mx]           # step 3 (rank==1)
        k, s, t = min(rows3, key=lambda r: (-r[2], -r[1], r[0]))  # step 4
        want.add((g, k, s, t))
    assert got == want


parent_links = st.lists(st.integers(0, 6), min_size=1, max_size=8)


@settings(**SETTINGS)
@given(parent_links)
def test_closure_from_parent_edges_matches_python_transitive(spark, links):
    """closure_from_parent_edges == Python transitive closure over a random
    forest (parent[i+1] = some earlier node), self-rows included for every
    node on either edge side."""
    from glamr_omics_pipelines_spark.operators import taxonomy, _cache
    edges = [(i + 1, min(p, i)) for i, p in enumerate(links)]
    df = spark.createDataFrame(edges, "child int, parent int")
    out = taxonomy.closure_from_parent_edges(df)
    got = {(r.ancestor, r.descendant) for r in out.collect()}
    _cache.release_caches()

    parent = {c: p for c, p in edges}
    nodes = {v for e in edges for v in e}
    want = {(v, v) for v in nodes}
    for v in nodes:
        a = v
        while a in parent:
            a = parent[a]
            want.add((a, v))
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.integers(-(1 << 23), (1 << 23) - 1),
                min_size=1, max_size=40),
       st.sampled_from([1, 2]))
def test_wav_decode_roundtrips_arbitrary_pcm24(spark, samples, nch):
    """_decode_wav_samples inverts a Python-packed 24-bit PCM WAV exactly —
    sign extension and channel averaging on arbitrary values (the hand
    fixtures in test_multimodal pin a few points; this pins the space)."""
    import io
    import wave
    from glamr_omics_pipelines_spark.operators.multimodal import (
        _decode_wav_samples)

    n = (len(samples) // nch) * nch
    if n == 0:
        return
    samples = samples[:n]
    raw = b"".join(
        int(s & 0xFFFFFF).to_bytes(3, "little") for s in samples)
    bio_buf = io.BytesIO()
    with wave.open(bio_buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(raw)
    got = _decode_wav_samples(bio_buf.getvalue())
    want = [sum(samples[i:i + nch]) / nch for i in range(0, n, nch)]
    assert len(got) == len(want)
    assert all(abs(a - b) < 1e-9 for a, b in zip(got.tolist(), want))


@settings(**SETTINGS)
@given(st.lists(st.integers(-(1 << 15), (1 << 15) - 1),
                min_size=1, max_size=40))
def test_wav_decode_roundtrips_arbitrary_pcm16(spark, samples):
    import io
    import struct
    import wave
    from glamr_omics_pipelines_spark.operators.multimodal import (
        _decode_wav_samples)

    bio_buf = io.BytesIO()
    with wave.open(bio_buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    got = _decode_wav_samples(bio_buf.getvalue())
    assert got.tolist() == [float(s) for s in samples]


@settings(**SETTINGS)
@given(st.integers(1, 4), st.integers(1, 4),
       st.lists(st.lists(st.integers(0, 255), min_size=1, max_size=16),
                min_size=0, max_size=4),
       st.sampled_from([None, "420jpeg", "422", "444", "mono"]))
def test_y4m_parse_roundtrips_arbitrary_frames(spark, w, h, raw, chroma):
    """_parse_y4m_luma_frames inverts a Python-packed Y4M stream exactly
    for arbitrary geometry / frame count / chroma mode."""
    from glamr_omics_pipelines_spark.operators.multimodal import (
        _parse_y4m_luma_frames)
    factor = {None: 1.5, "420jpeg": 1.5, "422": 2.0, "444": 3.0,
              "mono": 1.0}[chroma]
    lumas = [(vals * (w * h))[: w * h] for vals in raw]
    head = f"YUV4MPEG2 W{w} H{h} F25:1"
    if chroma:
        head += f" C{chroma}"
    buf = head.encode() + b"\n"
    for luma in lumas:
        pad = int(w * h * factor) - w * h
        buf += b"FRAME\n" + bytes(luma) + b"\x11" * pad
    frames = _parse_y4m_luma_frames(buf)
    assert [i for i, _ in frames] == list(range(len(lumas)))
    for (idx, y), luma in zip(frames, lumas):
        assert y.shape == (h, w)
        assert y.ravel().tolist() == luma
