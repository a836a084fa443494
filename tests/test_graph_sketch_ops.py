"""Hand-computed fixtures for triangle counting and Mash-distance sketches."""

from __future__ import annotations

import hashlib
import math

from glamr_omics_pipelines_spark.operators import graph, sketches


def test_triangle_count_two_sharing_an_edge(spark):
    # K3 {1,2,3} plus triangle {2,3,4}: nodes 2,3 in two triangles each
    edges = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(edges, "src int, dst int")
    out = {r.node: r.triangles for r in
           graph.triangle_count(df).collect()}
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_count_ignores_direction_dupes_and_loops(spark):
    # same K3 given as duplicated, reversed, and self-loop rows
    edges = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (1, 1)]
    df = spark.createDataFrame(edges, "src int, dst int")
    out = {r.node: r.triangles for r in
           graph.triangle_count(df).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_triangle_count_square_has_none(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src int, dst int")
    assert graph.triangle_count(df).count() == 0


def test_bottomk_sketch_is_k_smallest_md5(spark):
    rows = [("a", str(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, item string")
    got = sorted(r.h for r in
                 sketches.bottomk_sketch(df, "g", "item", k=5).collect())
    want = sorted(hashlib.md5(str(i).encode()).hexdigest()
                  for i in range(20))[:5]
    assert got == want


def test_mash_distance_identical_and_disjoint(spark):
    rows = ([("a", str(i)) for i in range(30)]
            + [("b", str(i)) for i in range(30)]          # b == a
            + [("c", str(i)) for i in range(100, 130)])   # c disjoint
    df = spark.createDataFrame(rows, "g string, item string")
    sk = sketches.bottomk_sketch(df, "g", "item", k=16)
    out = {(r.ga, r.gb): r for r in
           sketches.mash_distance(sk, k=16, kmer_k=4).collect()}
    ab = out[("a", "b")]
    assert ab.jaccard_est == 1.0 and ab.mash_dist == 0.0
    ac = out[("a", "c")]
    assert ac.shared == 0 and ac.mash_dist is None


def test_mash_distance_formula(spark):
    # a: items 0..19, d: items 10..29 -> true J = 10/30; with k larger than
    # the union the sketch is exact
    rows = ([("a", str(i)) for i in range(20)]
            + [("d", str(i)) for i in range(10, 30)])
    df = spark.createDataFrame(rows, "g string, item string")
    sk = sketches.bottomk_sketch(df, "g", "item", k=64)
    r = sketches.mash_distance(sk, k=64, kmer_k=4).collect()[0]
    j = r.shared / r.union_k
    assert r.shared == 10 and r.union_k == 30
    assert abs(r.mash_dist - (-math.log(2 * j / (1 + j)) / 4)) < 1e-6


def test_dbscan_core_border_noise(spark):
    from glamr_omics_pipelines_spark.operators import similarity
    # b = (a + c)/|..| sits between orthogonal a and c: cos(a,b)=cos(b,c)
    # ~= 0.707, cos(a,c) = 0. eps=0.7, min_pts=2 -> b core; a, c border
    # (cluster = b's own id since b is the only core); d far away -> noise
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.7071, 0.7071, 0.0]),
            (3, [0.0, 1.0, 0.0]), (4, [0.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "id int, v array<double>")
    out = {r.id: (r.cluster_id, r.role) for r in
           similarity.dbscan_cosine(df, "id", "v", sim_eps=0.7,
                                    min_pts=2).collect()}
    assert out[2] == (2, "core")
    assert out[1] == (2, "border") and out[3] == (2, "border")
    assert out[4] == (None, "noise")


def test_dbscan_two_cliques_merge_via_shared_core(spark):
    from glamr_omics_pipelines_spark.operators import similarity
    # identical triplets {1,2,3} and {10,11,12}: two clusters, min-id labels
    rows = ([(i, [1.0, 0.0]) for i in (1, 2, 3)]
            + [(i, [0.0, 1.0]) for i in (10, 11, 12)])
    df = spark.createDataFrame(rows, "id int, v array<double>")
    out = {r.id: (r.cluster_id, r.role) for r in
           similarity.dbscan_cosine(df, "id", "v", sim_eps=0.999,
                                    min_pts=2).collect()}
    assert all(out[i] == (1, "core") for i in (1, 2, 3))
    assert all(out[i] == (10, "core") for i in (10, 11, 12))


def test_k_core_peels_tail(spark):
    # triangle {1,2,3} (2-core) with a pendant chain 3-4-5: peeling at k=2
    # removes 5 then 4; the triangle survives with degree 2 each
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    out = {r.node: r.core_degree for r in
           graph.k_core(df, k=2, rounds=8).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_empty_when_k_too_high(spark):
    edges = [(1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src int, dst int")
    assert graph.k_core(df, k=3, rounds=5).count() == 0


def test_dbscan_candidates_hook_matches_bruteforce_when_complete(spark):
    """The advertised scale path: dbscan with an eps-complete candidate
    list (every true eps-pair present, plus junk pairs below eps) must
    equal the brute-force run exactly — the LSH hook only PRUNES pair
    generation, never changes semantics, and sub-eps junk candidates are
    filtered by the exact verify."""
    from glamr_omics_pipelines_spark.operators import similarity
    rows = ([(i, [1.0, 0.0, 0.0]) for i in (1, 2, 3)]
            + [(4, [0.7071, 0.7071, 0.0]), (5, [0.0, 0.0, 1.0])])
    df = spark.createDataFrame(rows, "id int, v array<double>")
    brute = {r.id: (r.cluster_id, r.role) for r in
             similarity.dbscan_cosine(df, "id", "v", sim_eps=0.9,
                                      min_pts=2).collect()}
    # complete: all true eps-pairs {1,2},{1,3},{2,3} + junk below eps
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (4, 5), (3, 5)],
        "id_a int, id_b int")
    hooked = {r.id: (r.cluster_id, r.role) for r in
              similarity.dbscan_cosine(df, "id", "v", sim_eps=0.9,
                                       min_pts=2,
                                       candidates=cand).collect()}
    assert hooked == brute
    assert brute[1] == (1, "core") and brute[5][1] == "noise"
