"""Similarity search over embedding columns (BASELINE.json north-star ext.).

Reference precedent: sourmash MinHash genome similarity (Snakefile:2529) — the
same sketch-then-bucket idea generalized to dense vectors.

Two tiers:
  - brute-force cosine top-k: exact baseline. The query side is small (top-k
    against a handful of probe vectors) so it broadcasts; the corpus scan
    stays partition-parallel and the per-partition top-k folds through a
    window on the query id (shuffle = O(queries × corpus-partition winners)).
  - LSH-bucketed (random hyperplane signs) cosine: the scale path — corpus
    hashed once into sign-pattern buckets, probes join only their bucket.

Dot products use higher-order functions (zip_with + aggregate) — JVM
expression tree, codegen'd, no Python and no UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def as_double_vec(col) -> Column:
    """Cast array<float> → array<double> for numerically-stable arithmetic."""
    return F.transform(col, lambda x: x.cast("double"))


def cosine_sim(a, b) -> Column:
    """Cosine similarity of two array columns (computed in double)."""
    da, db = as_double_vec(a), as_double_vec(b)
    return _dot(da, db) / (_norm(da) * _norm(db))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 5,
                     query_id: str = "query_id") -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    queries: (query_id, vec_col). Broadcast the (small) query side; rank per
    query with a deterministic tiebreak on neighbor id.
    Output: (query_id, neighbor_id, cosine, rank).
    """
    q = F.broadcast(queries.select(F.col(query_id),
                                   F.col(vec_col).alias("_qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"))
    scored = (c.crossJoin(q)
              .filter(F.col("neighbor_id") != F.col(query_id))
              .withColumn("cosine", cosine_sim("_cv", "_qv")))
    w = Window.partitionBy(query_id).orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, "neighbor_id", "cosine", "rank"))


def hyperplane_buckets(df: DataFrame, vec_col: str, num_planes: int = 16,
                       dim: int = 64, seed: int = 42,
                       out: str = "lsh_bucket") -> DataFrame:
    """Random-hyperplane LSH bucket id (sign pattern packed into a long).

    Hyperplanes are deterministic pseudo-random vectors (seeded PRNG) —
    reproducible across runs with zero driver→executor data movement: the
    planes are literals folded into the expression tree.

    Built as ONE SQL expression string: per-plane Column composition costs
    hundreds of py4j roundtrips (~5 s of driver time per call); a single
    F.expr is one roundtrip and compiles to the same JVM plan. Bucket =
    Σ 2^p over planes with dot(v, plane_p) >= 0 (bits disjoint ⇒ sum == OR).
    """
    import random
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
    planes_sql = "array(" + ",".join(
        "array(" + ",".join(f"{x!r}D" for x in p) + ")" for p in planes) + ")"
    expr = (
        "aggregate(zip_with("
        f"transform({planes_sql}, p -> aggregate(zip_with("
        f"transform(`{vec_col}`, x -> cast(x as double)), p, (x, y) -> x * y),"
        " 0D, (a, v) -> a + v)), "
        f"sequence(0, {num_planes - 1}), "
        "(d, i) -> CASE WHEN d >= 0D THEN shiftleft(1, i) ELSE 0 END), "
        "0, (acc, v) -> acc + v)")
    return df.withColumn(out, F.expr(expr))


def lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
             k: int = 5, num_planes: int = 12, dim: int = 64,
             query_id: str = "query_id") -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket.

    The scale path — corpus bucketed once (write it bucketed-by lsh_bucket
    for repeated probes); each query joins one bucket instead of the full
    corpus. Recall tunable via num_planes (fewer planes → bigger buckets).
    """
    cb = hyperplane_buckets(corpus, vec_col, num_planes, dim)
    qb = hyperplane_buckets(queries.select(query_id, vec_col),
                            vec_col, num_planes, dim)
    q = F.broadcast(qb.select(query_id, F.col(vec_col).alias("_qv"), "lsh_bucket"))
    c = cb.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("_cv"), "lsh_bucket")
    scored = (c.join(q, "lsh_bucket")
              .filter(F.col("neighbor_id") != F.col(query_id))
              .withColumn("cosine", cosine_sim("_cv", "_qv")))
    w = Window.partitionBy(query_id).orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, "neighbor_id", "cosine", "rank"))
