"""Pivot / unpivot / separate operators (SURVEY §2.8 R1-R9).

Reference semantics:
  - pivot_wider with values_fill=0 (code/merge_bracken.R:68-78)
  - pivot_longer (postgres.Rmd:270, postgres.Rmd:2296-2302)
  - separate with regex seps (postgres.Rmd:180,1194-1197)
  - separate_longer_delim (code/update_output_status.R:12)

Scale note: wide pivots with thousands of key values explode the row width —
`pivot()` here takes an explicit values list when the caller knows it
(avoids the extra distinct-collection job AND caps width); prefer long
format + pivot-at-export for >~1k pivot values (SURVEY §7.3 hard part 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wider(df: DataFrame, group_cols: list[str], pivot_col: str,
                value_expr, values: list | None = None,
                fill=0) -> DataFrame:
    """groupBy().pivot().agg() with values_fill (merge_bracken.R:68-78)."""
    g = df.groupBy(*group_cols)
    p = g.pivot(pivot_col, values) if values is not None else g.pivot(pivot_col)
    out = p.agg(value_expr)
    return out.na.fill(fill) if fill is not None else out


def pivot_longer(df: DataFrame, id_cols: list[str], value_cols: list[str],
                 name_col: str = "name", value_col: str = "value") -> DataFrame:
    """Unpivot via the native stack() expression (one narrow projection,
    no shuffle)."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    expr = f"stack({len(value_cols)}, {pairs}) as (`{name_col}`, `{value_col}`)"
    return df.select(*id_cols, F.expr(expr))


def separate(df: DataFrame, col: str, into: list[str], sep: str,
             keep: bool = True) -> DataFrame:
    """Split a delimited column into named columns (regex sep supported).

    try_element_at, not getItem: rows with fewer fields than ``into``
    NULL-fill the tail (tidyr separate(fill='right')) — under the engine's
    ANSI mode getItem would raise INVALID_ARRAY_INDEX and kill the job on
    the first short row."""
    arr = F.split(F.col(col), sep)
    out = df
    for i, name in enumerate(into):
        v = F.try_element_at(arr, F.lit(i + 1))
        out = out.withColumn(name, F.when(v == "", None).otherwise(v))
    return out if keep else out.drop(col)


def separate_longer_delim(df: DataFrame, col: str, delim: str = ",") -> DataFrame:
    """Explode a csv-cell into rows (update_output_status.R:12)."""
    return df.withColumn(col, F.explode(F.split(F.col(col), delim)))
