"""Time-hierarchy rollup (hypertable-style continuous aggregate, batch form).

The reference's only time-series surface is environmental sample metadata
(collection_date, postgres.Rmd:74-82) — no multi-granularity rollups exist
there. This operator supplies the batch form of the classic hypertable
continuous aggregate: ONE pass over the events computes every granularity
level of a time hierarchy (e.g. day ⊃ hour) via GROUP BY ROLLUP, with
partial aggregation combining map-side — no per-granularity rescan, no
self-union of G separate groupBys. At 100 TB the scan dominates, so G
granularities for the price of one is the whole game; the rollup's grouping
sets expand AFTER the partial agg, keeping the shuffle O(distinct buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hypertable_rollup(df: DataFrame, ts_col: str, agg_exprs: list,
                      levels: list[str] = ("day", "hour")) -> DataFrame:
    """Multi-granularity time rollup in one scan.

    ``levels`` are date_trunc granularities ordered coarse→fine; output has
    one column per level (null above a row's grain) plus ``grain`` = number
    of non-null levels (0 = grand total, matching GROUPING arithmetic).
    """
    cols = [F.date_trunc(lv, ts_col).alias(f"bucket_{lv}") for lv in levels]
    grain = None
    for lv in levels:
        # grouping() is only legal inside the rollup's agg list
        g = F.lit(1) - F.grouping(f"bucket_{lv}")
        grain = g if grain is None else grain + g
    return (df.select(*cols, *df.columns)
            .rollup(*[f"bucket_{lv}" for lv in levels])
            .agg(*agg_exprs, grain.cast("bigint").alias("grain")))
