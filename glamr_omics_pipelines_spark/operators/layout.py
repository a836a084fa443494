"""Data-layout optimization: Z-order clustering for multi-column skipping.

Parquet row-group skipping prunes on min/max stats, which only helps when
the file layout CORRELATES with the filter columns. Sorting by one column
destroys locality for the second; the Z-order (Morton) curve interleaves
the bits of several columns so that rows close in ANY filtered dimension
land close on disk — the OPTIMIZE ZORDER BY pattern of lakehouse engines,
here as plain DataFrame algebra:

  - zorder_key: a pure Column expression (bit shifts/masks, whole-stage
    codegen — no UDF) mapping N integer columns to their interleaved
    Morton code.
  - compact_zorder: repartitionByRange on the key (range partitioning ==
    contiguous curve segments per file) + sortWithinPartitions + parquet
    write; every file then covers a tight hyper-rectangle of the key
    space, so min/max skipping works for filters on EITHER column.

The reference's warehouse reads are sample- and taxon-filtered scans of
the same tables (postgres.Rmd dbplyr filters) — exactly the two-column
skipping problem Z-ordering solves at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton code of N non-negative integer columns: bit i of column j
    lands at output bit ``i*N + j``. ``bits`` low bits per column are
    interleaved (values are masked to that width first — quantize/rank
    wider domains upstream). Static expression tree: ``bits × N`` shift-
    mask-or terms, fully codegen'd, no UDF, no shuffle.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits={bits} x {n} cols exceeds a long's 63 bits")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.col(c).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def compact_zorder(df: DataFrame, cols: list[str], out_path: str,
                   num_files: int = 8, bits: int = 16) -> None:
    """Rewrite ``df`` as ``num_files`` parquet files clustered along the
    Z-order curve of ``cols``: range partitioning by the Morton key gives
    each file a contiguous curve segment, and the within-file sort makes
    row-group min/max stats tight on every interleaved column."""
    keyed = df.withColumn("_zkey", zorder_key(cols, bits))
    (keyed.repartitionByRange(num_files, F.col("_zkey"))
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(out_path))


def compaction_plan(files: DataFrame, path_col: str, bytes_col: str,
                    target_bytes: int,
                    partition_cols: list[str] | None = None) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE/rewrite-data-files step
    of lakehouse table maintenance): assign each file to a compaction bin
    so bins approach ``target_bytes``, deterministically — bin =
    floor(exclusive-cumsum(bytes) / target) over files ordered by path
    within a partition. The streaming bin-assignment rule: no
    driver-side greedy loop, one window over the FILE LISTING (metadata
    scale — millions of rows for a 100 TB table, the sequential_ids
    contract class), and a file larger than the target simply spans its
    own bin(s) without stalling the assignment.

    Output is bin-grain: partition cols + ``bin``, ``n_files``,
    ``bin_bytes``, ``needs_compaction`` (more than one file in the bin —
    single-file bins are already compact). Feed the bin → file mapping
    (the same window, pre-aggregation) to the rewrite job.
    """
    if target_bytes <= 0:
        raise ValueError("compaction_plan: target_bytes must be positive")
    pcols = partition_cols or []
    from pyspark.sql import Window
    w = (Window.partitionBy(*pcols).orderBy(path_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    pre = F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
    assigned = files.withColumn(
        "bin", F.floor(pre / F.lit(target_bytes)).cast("bigint"))
    return (assigned.groupBy(*pcols, "bin")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(bytes_col).cast("bigint").alias("bin_bytes"))
            .withColumn("needs_compaction", F.col("n_files") > 1))
