"""Entity resolution: fuzzy matching on short identifier strings.

The reference reconciles free-text identifiers across files repeatedly —
sample names joined across spreadsheets and filesystem paths
(pypelib/omics.py sample-to-path matching; the import Rmds join
user-typed StudyID/SampleID columns against warehouse keys) — where a
one-character typo silently drops rows from an inner join. The classic
scalable fix is SymSpell-style deletion-neighborhood blocking:

  two strings within Damerau/Levenshtein distance 1 always share at
  least one member of {s} ∪ {s with one char deleted}

so candidate generation is an EQUI join on exploded deletion variants
(O(n · len) blocking rows), never an all-pairs distance scan, and the
exact ``levenshtein`` verify (a JVM builtin) runs only on candidates.

Scale: for n names of length L the blocking table is n·(L+1) rows and the
shuffle key is a short string — at 100 M names × 30 chars that is ~3 G
small rows, a routine equi join; the all-pairs alternative is 10^16
comparisons. Long free-text columns should NOT go through this operator
(the variant fan-out is per-character) — use the fingerprint/minhash
dedup family (operators/dedup.py) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(text_col: str) -> F.Column:
    """{s} ∪ {s minus one character}: the edit-distance-1 blocking key set,
    built with JVM higher-order functions (no Python in the plan)."""
    dels = F.expr(
        f"transform(sequence(1, length({text_col})), "
        f"i -> concat(substring({text_col}, 1, i - 1), "
        f"substring({text_col}, i + 1, length({text_col}))))")
    return F.array_union(F.array(F.col(text_col)), dels)


def fuzzy_pairs_edit1(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """All pairs of rows whose ``text_col`` values are within Levenshtein
    distance 1, via deletion-neighborhood blocking + exact verify.

    Output: ``id_a < id_b`` with both texts and the exact ``dist``
    (0 = exact duplicate text under distinct ids, 1 = one edit apart).
    Candidates sharing several variants are deduplicated BEFORE the
    verify so each pair is scored once.
    """
    keyed = (df.select(F.col(id_col), F.col(text_col))
             .withColumn("_v", F.explode(deletion_variants(text_col))))
    a = keyed.select(F.col("_v"), F.col(id_col).alias("id_a"),
                     F.col(text_col).alias("text_a"))
    b = keyed.select(F.col("_v"), F.col(id_col).alias("id_b"),
                     F.col(text_col).alias("text_b"))
    cand = (a.join(b, "_v")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "text_a", "text_b")
            .distinct())
    return (cand.withColumn("dist", F.levenshtein("text_a", "text_b"))
            .filter(F.col("dist") <= 1))


def fuzzy_resolve_edit1(df: DataFrame, id_col: str, text_col: str,
                        canon: DataFrame, canon_col: str) -> DataFrame:
    """Left-resolve each row's ``text_col`` against a canonical vocabulary
    within one edit: adds ``resolved`` (the canonical string, or null) and
    ``resolve_dist``. Exact matches win over distance-1 matches; among
    equal-distance candidates the lexicographically smallest canonical
    string wins (deterministic).

    The canonical side is typically small (a sample sheet, a taxonomy) —
    its variant explosion broadcasts; the data side explodes only for the
    join key, never materializing pairs beyond candidates.
    """
    cv = (canon.select(F.col(canon_col).alias("_canon")).distinct()
          .withColumn("_v", F.explode(deletion_variants("_canon")))
          .select("_v", "_canon"))
    dv = df.withColumn("_v", F.explode(deletion_variants(text_col)))
    hits = (dv.join(F.broadcast(cv), "_v")
            .withColumn("_d", F.levenshtein(F.col(text_col), F.col("_canon")))
            .filter(F.col("_d") <= 1)
            .groupBy(id_col)
            .agg(F.min(F.struct("_d", "_canon")).alias("_best")))
    best = hits.select(
        F.col(id_col),
        F.col("_best._canon").alias("resolved"),
        F.col("_best._d").cast("int").alias("resolve_dist"))
    return df.join(best, id_col, "left")
