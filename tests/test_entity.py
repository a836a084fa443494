"""Entity-resolution fuzzy matching + weighted sampling fixtures."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.operators import entity, sampling


def test_fuzzy_pairs_edit1_catches_each_edit_kind(spark):
    df = spark.createDataFrame([
        Row(id=1, name="sample_A1"),
        Row(id=2, name="sample_B1"),   # substitution vs 1
        Row(id=3, name="sample_A12"),  # insertion vs 1
        Row(id=4, name="sampleA1"),    # deletion vs 1
        Row(id=5, name="totally_other"),
    ])
    out = {(r.id_a, r.id_b): r.dist
           for r in entity.fuzzy_pairs_edit1(df, "id", "name").collect()}
    assert out[(1, 2)] == 1 and out[(1, 3)] == 1 and out[(1, 4)] == 1
    assert not any(5 in p for p in out)
    # 2 vs 3 ("sample_B1" vs "sample_A12") is distance 2: absent
    assert (2, 3) not in out


def test_fuzzy_pairs_exact_duplicate_text_is_distance_zero(spark):
    df = spark.createDataFrame([Row(id=1, name="dup"), Row(id=2, name="dup")])
    rows = entity.fuzzy_pairs_edit1(df, "id", "name").collect()
    assert len(rows) == 1 and rows[0].dist == 0


def test_fuzzy_pairs_no_duplicate_candidates(spark):
    # short strings share MANY deletion variants; each pair must appear once
    df = spark.createDataFrame([Row(id=1, name="ab"), Row(id=2, name="ac")])
    rows = entity.fuzzy_pairs_edit1(df, "id", "name").collect()
    assert len(rows) == 1


def test_fuzzy_resolve_prefers_exact_then_lexicographic(spark):
    data = spark.createDataFrame([
        Row(id=1, name="samp1e_7"),   # typo of sample_7
        Row(id=2, name="sample_9"),   # exact canonical
        Row(id=3, name="zzzzz"),      # unresolvable
    ])
    canon = spark.createDataFrame([Row(c="sample_7"), Row(c="sample_9"),
                                   Row(c="sample_0")])
    out = {r.id: (r.resolved, r.resolve_dist)
           for r in entity.fuzzy_resolve_edit1(
               data, "id", "name", canon, "c").collect()}
    assert out[1] == ("sample_7", 1)
    assert out[2] == ("sample_9", 0)
    assert out[3] == (None, None)


def test_weighted_sample_is_deterministic_and_capped(spark):
    df = spark.createDataFrame(
        [Row(g="a", k=i, w=float(1 + i % 7)) for i in range(200)]
        + [Row(g="b", k=i, w=1.0) for i in range(5)])
    out1 = sampling.weighted_sample(df, ["g"], "k", "w", 10)
    got1 = sorted((r.g, r.k) for r in out1.collect())
    got2 = sorted((r.g, r.k) for r in
                  sampling.weighted_sample(
                      df.repartition(7), ["g"], "k", "w", 10).collect())
    assert got1 == got2, "must be layout-independent"
    by_g = {}
    for g, k in got1:
        by_g.setdefault(g, []).append(k)
    assert len(by_g["a"]) == 10
    assert len(by_g["b"]) == 5  # undersized group keeps all rows


def test_weighted_sample_scores_match_formula(spark):
    df = spark.createDataFrame([Row(g="a", k=1, w=2.0), Row(g="a", k=2, w=4.0)])
    rows = sampling.weighted_sample(df, ["g"], "k", "w", 2).collect()
    m = 1 << 20
    for r in rows:
        h = int(spark.sql(
            f"SELECT conv(substring(md5('wsample:{r.k}'), 1, 8), 16, 10)"
        ).collect()[0][0])
        u = (h % m + 0.5) / m
        assert math.isclose(r.es_score, -math.log(u) / r.w, rel_tol=1e-12)


def test_weighted_sample_drops_nonpositive_weights(spark):
    df = spark.createDataFrame([Row(g="a", k=1, w=0.0), Row(g="a", k=2, w=-3.0),
                                Row(g="a", k=3, w=1.0)])
    rows = sampling.weighted_sample(df, ["g"], "k", "w", 10).collect()
    assert [r.k for r in rows] == [3]


def test_weighted_sample_favors_heavy_rows(spark):
    # one row with overwhelming weight is (near-)always sampled into top-k
    df = spark.createDataFrame(
        [Row(g="a", k=i, w=1.0) for i in range(100)]
        + [Row(g="a", k=999, w=1e9)])
    rows = sampling.weighted_sample(df, ["g"], "k", "w", 5).collect()
    assert 999 in {r.k for r in rows}


def test_mixture_sample_shares_and_binding_group(spark):
    import pytest as _pytest
    df = spark.createDataFrame(
        [Row(g="a", k=i) for i in range(400)]
        + [Row(g="b", k=1000 + i) for i in range(100)]
        + [Row(g="c", k=2000 + i) for i in range(50)])
    out = sampling.mixture_sample(df, "g", "k",
                                  {"a": 0.5, "b": 0.5})
    rows = out.collect()
    by = {}
    for r in rows:
        by[r.g] = by.get(r.g, 0) + 1
    assert "c" not in by            # untargeted group dropped
    # binding group is b (100/0.5=200 < 400/0.5=800): kept whole
    assert by["b"] == 100
    # a thinned to ~c*t/n = 200*0.5/400 = 25% of 400 = ~100 (hash variance)
    assert 70 <= by["a"] <= 130
    # deterministic under repartitioning
    again = sampling.mixture_sample(df.repartition(7), "g", "k",
                                    {"a": 0.5, "b": 0.5}).collect()
    assert sorted((r.g, r.k) for r in again) == sorted(
        (r.g, r.k) for r in rows)
    with _pytest.raises(ValueError):
        sampling.mixture_sample(df, "g", "k", {})
