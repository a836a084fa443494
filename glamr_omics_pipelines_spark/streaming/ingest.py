"""Structured-Streaming incremental ingestion (SURVEY §2.10).

The reference's streaming-shaped behavior is batch-incremental: discover new
result files, anti-join against loaded sample IDs, append, nightly cron
(postgres.Rmd:239-292; code/check_import_status.R:8-9). Two Spark mappings:

  1. ``incremental_batch_load`` — the direct analog (anti-join + append),
     lives in sources.warehouse.Warehouse.incremental_append.
  2. ``file_stream_ingest`` here — the Structured Streaming file source with
     ``Trigger.AvailableNow``: checkpointed exactly-once file discovery
     replaces the hand-rolled "new files since last load" ledger. Each
     trigger drains all files not yet committed to the checkpoint and stops —
     cron-compatible, restart-safe, no duplicate loads even on crash
     (the checkpoint supplies the idempotence the reference gets from
     anti-joins).

Also provides a windowed-aggregation demo over event-time with a watermark —
the engine capability the reference's environmental time-series data supports
but never queries (SURVEY §2.10 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def file_stream_ingest(spark: SparkSession, src_dir: str, fmt: str,
                       schema: StructType, dest_dir: str, checkpoint: str,
                       partition_by: str | None = None,
                       transform=None) -> None:
    """Drain-all-new-files-then-stop ingestion (Trigger.AvailableNow)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("sep", "\t").option("header", True)
    df = reader.load(src_dir)
    if transform is not None:
        df = transform(df)
    writer = (df.writeStream.format("parquet")
              .option("path", dest_dir)
              .option("checkpointLocation", checkpoint)
              .trigger(availableNow=True))
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.start().awaitTermination()


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark.

    Works identically on a streaming or batch DataFrame (the batch form is
    what the correctness oracle checks).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (src.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("win.start").alias("window_start"), key_col, "n", "sum_value"))
