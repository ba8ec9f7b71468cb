"""Streaming medallion end-to-end (VERDICT r01 backlog #6): bronze→silver
through ``eng/streaming`` — file-source micro-batches → clean → per-batch
keep-latest → order-aware foreachBatch MERGE — must land byte-identical to
the batch medallion's ``bronze_to_silver`` over the same input, including a
STALE re-delivery that arrives in a later micro-batch (the case plain
last-writer-wins merging gets wrong).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.plans import medallion as m
from e_commerce_data_lakehouse_spark.sources.sinks import ManagedTable
from e_commerce_data_lakehouse_spark.streaming import stateful as st

SCHEMA = "event_id long, ts timestamp, value long, status string"


def _drop(spark, path, rows):
    df = spark.createDataFrame(rows, ["event_id", "ts_raw", "value", "status"])
    df = df.withColumn("ts", F.col("ts_raw").cast("timestamp")).select(
        "event_id", "ts", "value", "status"
    )
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(0.05)  # distinct mtimes -> deterministic file-source order


@pytest.fixture()
def raw_dir(spark, tmp_path):
    path = str(tmp_path / "raw")
    # drop 1: initial 0..29
    _drop(
        spark,
        path,
        [(i, f"2024-01-01 00:{i:02d}:00", i, "v1") for i in range(30)],
    )
    # drop 2: 20..39 re-delivered NEWER (+1h) — should win
    _drop(
        spark,
        path,
        [(i, f"2024-01-01 01:{i - 20:02d}:00", i * 10, "v2") for i in range(20, 40)],
    )
    # drop 3: 10..14 re-delivered STALE (older ts) — must NOT clobber;
    # 40..44 new; one dirty row the clean step removes
    _drop(
        spark,
        path,
        [(i, "2023-12-31 23:00:00", -1 * i, "stale") for i in range(10, 15)]
        + [(i, f"2024-01-01 02:{i - 40:02d}:00", i, "v3") for i in range(40, 45)]
        + [(999, "2024-01-01 03:00:00", -5, "dirty")],
    )
    return path


def _clean(df):
    return df.filter(F.col("event_id").isNotNull() & (F.col("value") >= 0))


def test_streaming_medallion_equals_batch(spark, tmp_path, raw_dir):
    # ---- batch path (the reference's incremental scripts, engine form) ----
    bronze = ManagedTable(spark, str(tmp_path / "bronze"))
    bronze.create(spark.read.schema(SCHEMA).parquet(raw_dir))
    silver_batch = ManagedTable(spark, str(tmp_path / "silver_batch"))
    m.bronze_to_silver(
        bronze,
        silver_batch,
        key=["event_id"],
        ts_col="ts",
        clean_fn=_clean,
        min_retention=0.1,
    )

    # ---- streaming path: one micro-batch per file drop ----
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(raw_dir)
    )
    silver_stream = ManagedTable(spark, str(tmp_path / "silver_stream"))
    q = st.foreach_batch_merge(
        _clean(stream),
        silver_stream,
        keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        order_col="ts",
    )
    q.awaitTermination()

    got = sorted(map(tuple, silver_stream.read().collect()))
    want = sorted(map(tuple, silver_batch.read().collect()))
    assert got == want
    # the stale re-delivery did not clobber: ids 10..14 kept their v1 rows
    kept = {
        r["event_id"]: r["status"]
        for r in silver_stream.read().filter(F.col("event_id") < 15).collect()
    }
    assert all(s == "v1" for s in kept.values())
    # the newer re-delivery DID win: 20..29 are v2
    upgraded = silver_stream.read().filter(
        (F.col("event_id") >= 20) & (F.col("event_id") < 30)
    )
    assert {r["status"] for r in upgraded.collect()} == {"v2"}
    assert silver_stream.read().count() == 45  # 0..44, dirty row dropped


def test_merge_latest_stale_update_ignored(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "2024-01-02 00:00:00", "new")], ["id", "ts_raw", "v"]
        ).select("id", F.col("ts_raw").cast("timestamp").alias("ts"), "v")
    )
    t.merge_latest(
        spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", "old"), (2, "2024-01-01 00:00:00", "x")],
            ["id", "ts_raw", "v"],
        ).select("id", F.col("ts_raw").cast("timestamp").alias("ts"), "v"),
        ["id"],
        "ts",
    )
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {1: "new", 2: "x"}
