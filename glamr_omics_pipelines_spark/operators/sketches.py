"""Mergeable distinct-count sketches (HyperLogLog) for incremental rollups.

The reference counts distinct samples with a hand-rolled recursive-CTE skip
scan (postgres.Rmd:22-37) and re-scans on every refresh. At 100 TB the scale
pattern is a MERGEABLE sketch table: aggregate each ingest batch / fine
partition into an HLL sketch once, then answer any coarser-grain distinct
query by UNIONING sketches — no fact re-scan, error ~1.04/sqrt(2^lgk).

Built on Spark's native Datasketches bindings (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate, JVM-side, partial-aggregable): the
sketch column is a BINARY that parquet stores like any other column, so a
warehouse can keep (day, sample_type, sketch) and roll up to months on
demand.

Exact-vs-approx policy: estimates are approximate, so these operators are
pytest-verified (tolerance + mergeability invariants), not DuckDB
hash-oracled — a different HLL implementation would legitimately disagree in
the last digits (same disposition as the reference's own approx paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch(df: DataFrame, group_cols: list[str], value_col: str,
               lgk: int = 12, out: str = "hll_sketch") -> DataFrame:
    """One HLL sketch per group over ``value_col`` (binary, mergeable).

    lgk = log2(#registers): error ~1.04/sqrt(2^lgk) (~1.6% at lgk=12).
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(out))


def hll_estimate(sketches: DataFrame, sketch_col: str = "hll_sketch",
                 out: str = "approx_distinct") -> DataFrame:
    """Attach the distinct-count estimate of each sketch row."""
    return sketches.withColumn(
        out, F.hll_sketch_estimate(F.col(sketch_col)))


def hll_rollup(sketches: DataFrame, coarse_cols: list[str],
               sketch_col: str = "hll_sketch",
               out: str = "approx_distinct") -> DataFrame:
    """Distinct counts at a coarser grain by UNIONING fine-grain sketches —
    no re-scan of the fact data, the entire point of keeping sketches.
    ``allowDifferentLgConfigK`` tolerates mixed-precision inputs (the union
    degrades to the coarsest precision present)."""
    merged = sketches.groupBy(*coarse_cols).agg(
        F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias(sketch_col))
    return merged.withColumn(out, F.hll_sketch_estimate(F.col(sketch_col)))
