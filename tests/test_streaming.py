"""Streaming layer tests: AvailableNow drains over file sources on tmp dirs.

No Kafka broker exists in the container; the file source exercises identical
streaming semantics (source → watermark → stateful op → sink).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.sources.sinks import ManagedTable
from e_commerce_data_lakehouse_spark.streaming import stateful as st


@pytest.fixture()
def event_dir(spark, tmp_path):
    """Two 'deliveries' of events with an overlapping (duplicated) key."""
    rows1 = [(i, f"2024-01-01 0{i % 8}:00:00", f"u{i % 3}") for i in range(20)]
    rows2 = [(i + 100, f"2024-01-01 0{i % 8}:30:00", f"u{i % 3}") for i in range(10)]
    rows2.append((5, "2024-01-01 05:00:00", "u2"))  # duplicate event_id=5
    for i, rows in enumerate([rows1, rows2]):
        df = spark.createDataFrame(
            rows, ["event_id", "ts_raw", "user_id"]
        ).withColumn("ts", F.col("ts_raw").cast("timestamp")).drop("ts_raw")
        df.coalesce(1).write.mode("append").parquet(str(tmp_path / "events"))
    return str(tmp_path / "events")


def _read_stream(spark, path):
    return (
        spark.readStream.schema("event_id long, user_id string, ts timestamp")
        .format("parquet")
        .load(path)
    )


def test_foreach_batch_merge_exactly_once(spark, tmp_path, event_dir):
    target = ManagedTable(spark, str(tmp_path / "tgt"))
    q = st.foreach_batch_merge(
        _read_stream(spark, event_dir),
        target,
        keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        order_col="ts",
    )
    q.awaitTermination()
    out = target.read()
    # 30 distinct event_ids (dup id=5 merged, not appended)
    assert out.count() == 30
    assert out.filter(F.col("event_id") == 5).count() == 1

    # restart with same checkpoint: no new input -> no change (idempotent)
    q2 = st.foreach_batch_merge(
        _read_stream(spark, event_dir),
        target,
        keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        order_col="ts",
    )
    q2.awaitTermination()
    assert target.read().count() == 30


def test_streaming_dedup_within_watermark(spark, tmp_path, event_dir):
    deduped = st.streaming_dedup(
        _read_stream(spark, event_dir), ["event_id"], "ts", watermark="12 hours"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("dedup_out")
    assert out.count() == 30  # duplicate id suppressed across batches
    assert out.select("event_id").distinct().count() == 30


def test_running_totals_stateful(spark, tmp_path, event_dir):
    totals = st.running_totals_per_key(
        _read_stream(spark, event_dir), "user_id", "ts"
    )
    q = (
        totals.writeStream.format("memory")
        .queryName("totals_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("totals_out")
    # last update per key must equal the true per-key counts (31 events over
    # 3 users); events_total is cumulative across micro-batches
    agg = (
        out.groupBy("key").agg(F.max("events_total").alias("final_total"))
    )
    got = {r["key"]: r["final_total"] for r in agg.collect()}
    assert sum(got.values()) == 31
    assert set(got) == {"u0", "u1", "u2"}
