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


def sessionize_stream(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", gap_seconds: int = 1800,
                      watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` (SURVEY §2.10/§2.11 — the streaming twin of
    ``windows.sessionize``).

    Per-user state = (session_count, last_event_ts, events_in_session).
    On timeout (gap elapsed with no events) the open session is emitted and
    the state kept as a zero-event TOMBSTONE carrying the session counter,
    so (user, session_id) stays unique across idle gaps; the tombstone
    itself expires after ``counter_retention_gaps`` further gaps (after
    which a returning user restarts numbering — disambiguate with
    session_start if that horizon matters). Scale: state is O(users seen
    within the retention horizon), partitioned by user — the same key the
    shuffle already uses.
    """
    import pandas as pd  # local import: executors need it, driver may not
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    user_type = dict(events.dtypes)[user_col]
    out_schema = (f"{user_col} {user_type}, session_id bigint, "
                  f"n_events bigint, "
                  f"session_start timestamp, session_end timestamp")
    # start_ts persisted too: a session can span micro-batches, and closing a
    # carried session must still emit its true start
    state_schema = ("session_id bigint, last_ts double, n_events bigint, "
                    "start_ts double")
    gap_ms = gap_seconds * 1000
    counter_retention_gaps = 30

    def fn(key, pdf_iter, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            sid, last_ts, n, start_ts = state.get
            if not n:          # tombstone expired: forget the counter
                state.remove()
                return
            # close the open session; keep a tombstone with the counter
            state.update((int(sid), float(last_ts), 0, float(start_ts)))
            state.setTimeoutDuration(gap_ms * counter_retention_gaps)
            yield pd.DataFrame({user_col: [user], "session_id": [sid],
                                "n_events": [n],
                                "session_start": [pd.Timestamp(start_ts, unit="s")],
                                "session_end": [pd.Timestamp(last_ts, unit="s")]})
            return
        rows = pd.concat(list(pdf_iter)).sort_values(ts_col)
        ts = rows[ts_col].astype("int64") / 1e9  # epoch seconds
        sid, last_ts, n, start = (state.get if state.exists
                                  else (0, None, 0, None))
        out = []
        for t in ts:
            # n == 0 means no OPEN session (fresh user or tombstone): any
            # event starts a new one — never resurrect an emitted session
            if last_ts is None or n == 0 or t - last_ts > gap_seconds:
                if n:  # close the previous session
                    out.append((user, sid, n, start, last_ts))
                sid, n, start = sid + 1, 0, t
            n += 1
            last_ts = t
        state.update((int(sid), float(last_ts), int(n), float(start)))
        state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(
            [{user_col: u, "session_id": s, "n_events": c,
              "session_start": pd.Timestamp(st, unit="s"),
              "session_end": pd.Timestamp(en, unit="s")}
             for u, s, c, st, en in out])

    return (events.withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.ProcessingTimeTimeout))


def stream_dedup(events: DataFrame, key_cols: list[str], ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on key columns with bounded state.

    The streaming twin of the reference's anti-join idempotence
    (postgres.Rmd:246-248): `dropDuplicatesWithinWatermark` keeps a key only
    until the watermark passes it, so state is O(keys per watermark window),
    not O(all keys ever) — the property that lets the dedup run forever.
    On a batch frame it degrades to plain dropDuplicates (oracle-checkable).
    """
    if events.isStreaming:
        return (events.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(key_cols))
    return events.dropDuplicates(key_cols)


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "1 hour",
                          watermark: str = "2 hours",
                          value_col: str = "value") -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark.

    Works identically on a streaming or batch DataFrame (the batch form is
    what the correctness oracle checks).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (src.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(value_col).alias("sum_value"))
            .select(F.col("win.start").alias("window_start"), key_col, "n", "sum_value"))


def session_window_counts(events: DataFrame, user_col: str = "user_id",
                          ts_col: str = "ts", value_col: str = "value",
                          gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Native merging session windows (``F.session_window``) — one code path
    for batch AND streaming. In streaming mode the watermark bounds state and
    closes sessions for append output; in batch it is the same merging
    aggregation q_session_windows oracle-checks. Where ``sessionize_stream``
    shows the CUSTOM stateful escape hatch (applyInPandasWithState), this is
    the built-in scale path: session merge runs JVM-side with partial
    aggregation, state is O(open sessions), partitioned on the user key.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (src.groupBy(user_col, F.session_window(F.col(ts_col), gap))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(value_col).alias("sum_value"))
            .select(user_col,
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events", "sum_value"))


def stream_interval_join(impressions: DataFrame, conversions: DataFrame,
                         key_col: str = "user_id",
                         imp_ts: str = "imp_ts", conv_ts: str = "conv_ts",
                         max_delay_seconds: int = 1800,
                         watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join within an event-time bound (the ad-tech
    click/impression attribution shape): each conversion joins impressions
    with the same key whose timestamp lies in
    ``[conv_ts − max_delay, conv_ts]``.

    One code path for batch AND streaming. In streaming mode BOTH sides
    carry watermarks and the join condition contains the event-time bound —
    exactly what Structured Streaming requires to expire join state (an
    impression older than conv watermark + max_delay can never match
    again, so state is O(events per delay window), not O(stream)). In
    batch mode the identical condition runs as a plain interval join,
    which is what the DuckDB oracle checks.
    """
    imp = impressions
    conv = conversions
    if imp.isStreaming:
        imp = imp.withWatermark(imp_ts, watermark)
    if conv.isStreaming:
        conv = conv.withWatermark(conv_ts, watermark)
    delay = F.expr(f"INTERVAL {max_delay_seconds} SECONDS")
    cond = ((imp[key_col] == conv[key_col])
            & (imp[imp_ts] <= conv[conv_ts])
            & (imp[imp_ts] >= conv[conv_ts] - delay))
    return imp.join(conv, cond).drop(conv[key_col])


def _read_state(spark: SparkSession, state_dir: str):
    """Read a foreachBatch parquet state table written by ``_write_state``.

    Returns ``(state_df_without_marker, last_applied_batch_id)`` —
    ``(None, None)`` only when the state genuinely does not exist yet.
    A corrupted/unreadable state dir RAISES instead of silently resetting
    accumulated state (ADVICE r4: the bare ``except Exception`` here used to
    treat corruption as 'first batch' and zero the counts).

    Contract: a state dir is PAIRED with its checkpoint — batch ids are
    monotonic only within one checkpoint lineage, so reusing an old state
    dir with a fresh checkpoint (ids restart at 0) skips genuinely new
    batches by design; start a fresh state dir with a fresh checkpoint.

    Same driver-local-POSIX restriction as ``_write_state``: the
    ``_CURRENT`` pointer is read with ``open``, so ``state_dir`` cannot be
    an ``hdfs://``/``s3a://`` URI (it would mis-resolve to a local path).
    """
    import os
    from pyspark.errors import AnalysisException
    cur = os.path.join(state_dir, "_CURRENT")
    if os.path.exists(cur):
        with open(cur) as fh:
            version = fh.read().strip()
        df = spark.read.parquet(os.path.join(state_dir, version))
    else:
        # legacy layout (parquet files directly in state_dir) or no state
        try:
            df = spark.read.parquet(state_dir)
        except AnalysisException as exc:  # only the missing-path case
            if ("PATH_NOT_FOUND" in str(exc)
                    or "Path does not exist" in str(exc)):
                return None, None
            raise
    applied = None
    if "_applied_batch" in df.columns:
        row = df.agg(F.max("_applied_batch").alias("b")).collect()[0]
        applied = row["b"]
        df = df.drop("_applied_batch")
    return df, applied


def _write_state(df: DataFrame, batch_id: int, state_dir: str) -> None:
    """Crash-atomic state replace: the new snapshot lands in a VERSIONED
    subdirectory (the live one is never touched), then a ``_CURRENT``
    pointer file is swapped with ``os.replace`` (atomic on POSIX). A crash
    anywhere leaves either the old pointer → intact old snapshot (the
    checkpoint replays the batch idempotently) or the new pointer → a
    fully-written new snapshot. A plain mode('overwrite') on the live dir
    had a delete-then-write window in which a crash erased ALL accumulated
    state and replay re-initialized it from one batch's data.

    The applied batch id is stamped as a COLUMN of the same parquet write
    (one atomic unit with the data — a sidecar id file could land after a
    crash window and replay would then double-count). Superseded versions
    are garbage-collected after the pointer swap, best-effort.

    RESTRICTION: ``state_dir`` must be a driver-local POSIX path. The
    pointer swap and GC use ``open``/``os.replace``/``shutil.rmtree``,
    which do not resolve Hadoop-FS URIs (``hdfs://``, ``s3a://``); on a
    cluster, point state at shared POSIX storage (NFS) or swap these three
    calls for the Hadoop FileSystem API (``create``+``rename``/``delete``
    — rename is atomic on HDFS, and S3 callers should prefer a
    conditional-put pointer object)."""
    import os
    import shutil
    version = f"v{batch_id}"
    (df.withColumn("_applied_batch", F.lit(batch_id).cast("long"))
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(state_dir, version)))
    tmp = os.path.join(state_dir, "_CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(version)
    os.replace(tmp, os.path.join(state_dir, "_CURRENT"))
    for name in os.listdir(state_dir):
        if name.startswith("v") and name != version:
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)


def read_state_table(spark: SparkSession, state_dir: str) -> DataFrame:
    """Public reader for a foreachBatch state table: the live snapshot
    without the ``_applied_batch`` marker. The on-disk layout (versioned
    snapshot subdirs + ``_CURRENT`` pointer) is an implementation detail of
    the crash-atomic swap — consumers read through this, never the
    directory itself. Raises FileNotFoundError when no state exists."""
    df, _ = _read_state(spark, state_dir)
    if df is None:
        raise FileNotFoundError(f"no state table at {state_dir}")
    return df


def streaming_rollup_ingest(stream: DataFrame, group_cols: list[str],
                            value_col: str, state_dir: str,
                            checkpoint: str) -> None:
    """Streaming incremental rollup: each micro-batch is reduced to its
    mergeable aggregate snapshot (sources/warehouse.py:agg_snapshot) and
    MERGED into a parquet state table via ``foreachBatch`` — the streaming
    twin of the batch snapshot-merge refresh, and the always-on form of
    the reference's nightly re-aggregation cron. State stays
    snapshot-grain (groups, never fact rows): a year of 100 TB/day
    ingest keeps the same few-KB state table.

    Exactly-once state: the write is a full atomic overwrite of the tiny
    state table per batch (read current → union batch snapshot → re-merge
    → overwrite).  The applied batch id is stamped INTO the state parquet
    (same atomic write), so a crash between the state write and the
    streaming checkpoint commit replays the batch into a skip — never a
    double count.  For at-least-once sources pair with stream_dedup
    upstream.
    """
    from glamr_omics_pipelines_spark.sources.warehouse import (
        agg_snapshot, merge_agg_snapshots)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        current, applied = _read_state(spark, state_dir)
        if applied is not None and batch_id <= applied:
            return  # replayed batch already applied before the crash
        snap = agg_snapshot(batch, group_cols, value_col)
        merged = snap if current is None else merge_agg_snapshots(current, snap)
        # materialize BEFORE overwrite: the merged plan reads state_dir
        rows = merged.collect()
        out = spark.createDataFrame(rows, merged.schema)
        _write_state(out, batch_id, state_dir)

    (stream.writeStream
     .foreachBatch(upsert)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())


def streaming_vocab_ingest(stream: DataFrame, text_col: str,
                           state_dir: str, checkpoint: str,
                           top_k: int = 1000) -> None:
    """Streaming heavy-hitters vocabulary: each micro-batch's token counts
    (tokenize-once explode + partial agg — the same plan as the batch
    vocab_topk) are merged into a parquet (token, n) state table via
    ``foreachBatch``. The always-on form of corpus vocabulary tracking:
    token-grain state, independent of ingest volume, with the working set
    optionally truncated to the ``top_k`` heaviest tokens + an OTHERS
    bucket so a web-scale tail cannot grow the state unboundedly (the
    truncation is recorded in the bucket, never silent).

    Lossy-truncation contract (stated, not hidden): a token's count is
    exact while it stays in the head; once truncated its mass moves into
    OTHERS irrecoverably and a reappearance restarts from its new counts.
    Total mass is always exact. (Misra-Gries would bound per-token error
    with less state — this keeps head exactness, the usual vocab need.)
    The previous OTHERS row never competes for head slots.
    """
    from glamr_omics_pipelines_spark.operators.text import lower_tokens

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        current, applied = _read_state(spark, state_dir)
        if applied is not None and batch_id <= applied:
            return  # replayed batch already applied before the crash
        snap = (batch.select(F.explode(
            lower_tokens(text_col)).alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("n")))
        merged = snap if current is None else (
            current.unionByName(snap)
            .groupBy("token").agg(F.sum("n").alias("n")))
        real = merged.filter(F.col("token") != "<OTHERS>")
        head = real.orderBy(F.col("n").desc(),
                            F.col("token").asc()).limit(top_k)
        others = (merged.join(head.select("token"), "token", "left_anti")
                  .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n"))
                  .select(F.lit("<OTHERS>").alias("token"), "n")
                  .filter(F.col("n") > 0))
        rows = head.unionByName(others).collect()
        out = spark.createDataFrame(rows, head.schema)
        _write_state(out, batch_id, state_dir)

    (stream.writeStream
     .foreachBatch(upsert)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())


def streaming_drift_monitor(stream: DataFrame, reference: DataFrame,
                            value_col: str, state_dir: str,
                            checkpoint: str, n_bins: int = 10) -> None:
    """Always-on drift gate: per micro-batch, bin the incoming values into
    the STATIC reference's quantile bins, merge the counts into a
    cumulative (bin, n) parquet state, and append the running PSI to a
    log table — the streaming form of the batch PSI gate (X144), with
    state bounded at n_bins rows regardless of ingest volume.

    The reference bin edges are computed ONCE (driver-side list of
    n_bins−1 doubles — the one legitimate collect: it is the model, not
    the data); each batch then costs one scan + an n_bins-grain agg.

    Replay contract: the cumulative bin STATE is exactly-once (batch id
    stamped in the state write; replays skip). The psi_log side table is
    at-least-once diagnostics — a crash between the state write and the
    log append loses that batch's log row (state stays correct), and a
    crash after both but before checkpoint commit replays into a skip, so
    the log never double-appends. Consumers needing exact logs should
    derive PSI from the state snapshots instead.
    """
    probs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    edges = reference.agg(F.expr(
        f"percentile({value_col}, array({probs}))").alias("e")) \
        .collect()[0]["e"]
    if edges is None:
        raise ValueError("streaming_drift_monitor: the reference frame is "
                         "empty — no quantile bins to drift against")
    # reference bin counts computed DISTRIBUTEDLY; only n_bins rows reach
    # the driver (the model, not the data)
    ref_bin = sum((F.col(value_col) > e).cast("int") for e in edges)
    ref_rows = (reference.select(ref_bin.alias("b"))
                .groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect())
    ref_counts = {r.b: r.n for r in ref_rows}
    ref_total = sum(ref_counts.values())

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        cur, applied = _read_state(spark, f"{state_dir}/bins")
        if applied is not None and batch_id <= applied:
            return  # replayed batch already applied before the crash
        cond = sum((F.col(value_col) > e).cast("int") for e in edges)
        snap = (batch.select(cond.alias("b"))
                .groupBy("b").agg(F.count(F.lit(1)).alias("n")))
        merged = snap if cur is None else (
            cur.unionByName(snap)
            .groupBy("b").agg(F.sum("n").alias("n")))
        rows = merged.collect()
        _write_state(spark.createDataFrame(rows, merged.schema), batch_id,
                     f"{state_dir}/bins")
        total = sum(r.n for r in rows) or 1
        import math
        # epsilon-clamped over the FULL bin domain: a bin the reference
        # never populated (degenerate reference, e.g. all one value) must
        # still register incoming mass — the p>0-and-q>0 skip would read
        # "no drift" precisely when traffic shifts somewhere new
        eps = 1e-6
        cur_counts = {r.b: r.n for r in rows}
        psi = 0.0
        for b in range(n_bins):
            p = max(ref_counts.get(b, 0) / ref_total, eps)
            q = max(cur_counts.get(b, 0) / total, eps)
            psi += (p - q) * math.log(p / q)
        spark.createDataFrame([(batch_id, float(psi), int(total))],
                              "batch_id long, psi double, n_seen long") \
            .coalesce(1).write.mode("append").parquet(f"{state_dir}/psi_log")

    (stream.writeStream
     .foreachBatch(upsert)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())
