"""Structured Streaming variants of the reference's hand-rolled batch
incrementals (SURVEY §2.10).

The reference consumes Kafka with repeated bounded reads + ~120 LoC of manual
JSON offset checkpointing per job (T1, ``transactions_processor.py:27-116``)
and recomputes windowed aggregates over the whole history (T5).  The
idiomatic replacements:

- ``readStream`` + ``Trigger.AvailableNow`` + engine-managed
  ``checkpointLocation`` → exactly-once bounded ingestion;
- watermarked tumbling-window aggregation → incremental window state instead
  of full recompute.

Kafka itself isn't in the container, so tests drive these with the file
source (identical semantics: source → watermark → window agg → sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    ts_from_nanos: str | None = "ts",
    glob: str | None = None,
) -> DataFrame:
    """File-source stream over parquet events (stand-in for the Kafka
    source; swap ``.format('kafka')`` + value decode on a real cluster).

    ``path`` must be a directory (file-source requirement); use ``glob`` to
    select one table's files inside it.
    """
    reader = spark.readStream.schema(schema_ddl).format("parquet")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if ts_from_nanos:
        # Normalize to TimestampType (not NTZ): watermarks require TIMESTAMP;
        # with the session pinned to UTC the instant equals the NTZ value and
        # the final result casts back to NTZ for oracle comparison.  A bigint
        # column is epoch-nanos (TIMESTAMP(NANOS) parquet under nanosAsLong);
        # anything else is already a timestamp and only needs the cast.
        if dict(df.dtypes).get(ts_from_nanos) == "bigint":
            # integer division, NOT `/1000` double division: epoch-nanos
            # (~1.7e18) exceed double's 2^53 exact range, so the double path
            # can truncate 1 µs off — and the batch path (entry_queries.load)
            # uses exact `div`, so stream and batch must agree bit-for-bit.
            df = df.withColumn(
                ts_from_nanos,
                F.timestamp_micros(F.expr(f"`{ts_from_nanos}` div 1000")),
            )
        else:
            df = df.withColumn(
                ts_from_nanos, F.col(ts_from_nanos).cast("timestamp")
            )
    return df


def bucketed_session_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    bucket_col: str = "__day",
    aggs: list | None = None,
) -> DataFrame:
    """The SKEW-ROBUST streaming sessionization stage (r11 VERDICT #2,
    the one measured past-bar scale shape: 15.31× max/median task at
    skew30): group by ``(key, to_date(ts), session_window(ts, gap))``
    instead of ``(key, session_window)``.

    The day bucket is a PLAIN derived column (``to_date``, not a second
    ``window()`` call — Spark's one-time-window restriction doesn't
    apply; probed in-sandbox, r12), so a hot key's session-window state
    splits across state-store partitions by day: the merge work per
    partition is bounded by the key's per-day activity, not its total
    history, and state for closed days is evicted by the watermark
    exactly as before.  The output is LOCAL (per-day) sessions; a
    downstream batch pass (:func:`operators.aggregates.stitch_sessions`)
    merges the ≤ 2 boundary sessions per (key, day) into global ones —
    the same two-pass shape as the batch ``sessionize_bucketed``.

    ``aggs`` must be SUM-combinable partials (the stitch sums them)."""
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            key_col,
            F.to_date(ts_col).alias(bucket_col),
            F.session_window(ts_col, gap).alias("__sw"),
        )
        .agg(*(aggs or [F.count("*").alias("n_events")]))
    )
    return out.select(
        key_col,
        bucket_col,
        F.col("__sw.start").alias("session_start"),
        F.col("__sw.end").alias("session_end"),
        *[c for c in out.columns if c not in (key_col, bucket_col, "__sw")],
    )


def hourly_event_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """T5 done right: watermarked tumbling window — state is bounded by the
    watermark horizon instead of recomputing all history each run."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("hw"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("hw.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_available_now_append(
    result: DataFrame, checkpoint_dir: str, target
) -> None:
    """Drain an APPEND-mode streaming aggregate into a real table sink
    (``ManagedTable`` — the parquet-snapshot Delta stand-in), exactly
    once per micro-batch via ``append_once`` txn markers.

    This is the PRODUCTION shape for watermark-closed session/window
    aggregates: append mode emits a window only after the watermark
    passes its end, so (a) sink rows are immutable — no complete-mode
    rewrite of the whole result per batch, and (b) driver/collect never
    sees the result set (the memory sink materializes the entire COMPLETE
    output on the driver, which caps the complete-mode oracle vehicle at
    ~sf3 — SCALING.md).  State is bounded by the watermark horizon;
    output volume per batch is just the newly-finalized windows.

    AvailableNow note: after the last data batch, the engine runs one
    more (empty) batch so windows finalized by the final watermark are
    flushed — the drained sink therefore holds every session whose end
    ≤ max(event time) − watermark delay, which is what the oracle
    checks."""
    q = (
        result.writeStream.foreachBatch(
            lambda batch, batch_id: target.append_once(
                batch, f"b{batch_id}"
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_complete_parquet(
    result: DataFrame, checkpoint_dir: str, path: str
) -> None:
    """Drain a COMPLETE-mode streaming aggregate into a parquet
    directory via ``foreachBatch`` overwrite — the scalable complete
    vehicle: each micro-batch rewrites the complete-so-far result
    executor-side, so NOTHING materializes on the driver (the memory
    sink collects the whole result there, which caps it at ~sf3 driver
    heap / spark.driver.maxResultSize — the r12 sf10 sweep hit exactly
    that on the bucketed session drain).  After ``awaitTermination`` the
    directory holds the final complete result."""
    q = (
        result.writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode("overwrite").parquet(path)
        )
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_parquet(
    result: DataFrame,
    checkpoint_dir: str,
    path: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain a bounded stream into a parquet directory EXECUTOR-SIDE and
    return a batch DataFrame over it — the memory sink's exact row
    semantics (complete: each batch replaces the result; append/update:
    each batch's output rows accumulate) without either driver-side
    materialization or a session-lifetime in-memory table.

    Why not the memory sink (r12 VERDICT #1): ``format("memory")`` (a)
    collects every batch's output to the DRIVER (caps complete mode at
    driver heap / maxResultSize — the sf10 sweep hit it), and (b)
    registers a temp view backed by driver memory that
    ``spark.catalog.clearCache()`` does NOT drop, so a long-lived
    session running many streaming queries accumulates dead result
    tables for its whole life.  foreachBatch writes stay on the
    executors, the returned frame reads ordinary parquet, and nothing
    outlives the caller's temp directory.

    The one-shot checkpoint is deleted after the drain: each invocation
    passes a FRESH checkpoint dir (the bounded replay is per-call), so
    keeping it would only leak disk across a many-query session.
    """
    import shutil

    mode = "overwrite" if output_mode == "complete" else "append"
    q = (
        result.writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode(mode).parquet(path)
        )
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(checkpoint_dir, ignore_errors=True)
    # explicit schema: exact streaming result types (and a valid empty
    # frame even if no batch produced rows)
    return result.sparkSession.read.schema(result.schema).parquet(path)


def run_available_now(
    result: DataFrame, checkpoint_dir: str, table_name: str,
    output_mode: str = "complete",
) -> None:
    """Drain everything currently available and stop — the streaming
    equivalent of the reference's nightly bounded Kafka read (T1).
    ``complete`` suits windowed aggs; joins use ``append``."""
    q = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
