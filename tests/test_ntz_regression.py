"""TIMESTAMP_NTZ regression tests (the class of failure that broke round 2).

Parquet writers flip between TIMESTAMP and TIMESTAMP_NTZ for the same logical
data; ``F.unix_micros`` (and ``window()``) only accept TIMESTAMP, so any
time-based operator called on an NTZ-typed parquet column throws
AnalysisException unless it normalizes through ``windows.epoch_us`` /
``_events``. The in-memory fixtures elsewhere in the suite all use
TimestampType, so these tests round-trip through a real NTZ parquet file —
they fail if epoch_us is ever bypassed with a raw unix_micros call.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampNTZType)

from glamr_omics_pipelines_spark.operators import joins, windows

EPOCH_2024 = 1_704_067_200  # 2024-01-01T00:00:00 UTC, seconds


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def ntz_events_path(spark, tmp_path_factory):
    """events-shaped parquet whose ts column is TIMESTAMP_NTZ on disk."""
    schema = StructType([
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampNTZType()),
        StructField("value", DoubleType()),
    ])
    rows = [
        (1, "u1", "click", _ts(0), 1.0),
        (2, "u1", "click", _ts(10), 2.0),
        (3, "u1", "purchase", _ts(15), 3.0),
        (4, "u1", "click", _ts(2000), 4.0),   # gap 1990s > 1800s -> new session
        (5, "u2", "error", _ts(100), 5.0),
        (6, "u2", "click", _ts(400), 6.0),    # inside u2's 10-min error window
        (7, "u2", "click", _ts(900), 7.0),    # outside (100+600=700)
    ]
    path = str(tmp_path_factory.mktemp("ntz") / "events.parquet")
    spark.createDataFrame(rows, schema).write.parquet(path)
    df = spark.read.parquet(path)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz", "fixture must be NTZ on disk"
    return path


def test_epoch_us_on_ntz_parquet(spark, ntz_events_path):
    df = spark.read.parquet(ntz_events_path)
    got = (df.filter(F.col("event_id") == 1)
           .select(windows.epoch_us("ts").alias("us")).collect()[0]["us"])
    assert got == EPOCH_2024 * 1_000_000


def test_sessionize_on_ntz_parquet(spark, ntz_events_path):
    df = spark.read.parquet(ntz_events_path)
    out = windows.sessionize(df, user="user_id", ts="ts", gap_seconds=1800)
    got = {r["event_id"]: r["session_id"]
           for r in out.select("event_id", "session_id").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1, 6: 1, 7: 1}


def test_asof_join_on_ntz_parquet(spark, ntz_events_path):
    ev = spark.read.parquet(ntz_events_path)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "event_id", "ts", "value"))
    out = joins.asof_join(purchases, clicks, on=["user_id"],
                          left_ts="ts", right_ts="ts", tiebreak="event_id",
                          right_prefix="click_")
    rows = out.select("event_id", "click_event_id",
                      windows.epoch_us("click_ts").alias("click_us")).collect()
    assert len(rows) == 1
    # purchase @15s attaches to the latest click at-or-before: event 2 @10s
    assert rows[0]["click_event_id"] == 2
    assert rows[0]["click_us"] == (EPOCH_2024 + 10) * 1_000_000


def test_range_join_binned_on_ntz_parquet(spark, ntz_events_path):
    ev = (spark.read.parquet(ntz_events_path)
          .withColumn("ts_us", windows.epoch_us("ts")))
    win_us = 600 * 1_000_000
    intervals = (ev.filter(F.col("event_type") == "error")
                 .select(F.col("event_id").alias("error_id"), "user_id",
                         F.col("ts_us").alias("start_us"),
                         (F.col("ts_us") + win_us).alias("end_us")))
    points = ev.select("user_id", "ts_us", "value")
    hits = joins.range_join_binned(points, intervals, keys=["user_id"],
                                   point_col="ts_us", start_col="start_us",
                                   end_col="end_us", bin_width=win_us)
    got = sorted(r["value"] for r in hits.collect())
    # u2's window [100s, 700s] contains the error itself (5.0) and the click
    # at 400s (6.0); the 900s click is outside.
    assert got == [5.0, 6.0]


def test_events_chokepoint_normalizes_ntz(spark, ntz_events_path, tmp_path):
    """__spark_entry__._events must return TIMESTAMP for NTZ parquet input."""
    import __spark_entry__ as entrymod
    sf_dir = str(tmp_path)
    os.symlink(ntz_events_path, os.path.join(sf_dir, "events.parquet"))
    df = entrymod._events(spark, sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = (df.filter(F.col("event_id") == 4)
           .select(F.unix_micros("ts").alias("us")).collect()[0]["us"])
    assert got == (EPOCH_2024 + 2000) * 1_000_000
