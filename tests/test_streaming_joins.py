"""Streaming joins: stream-static broadcast enrichment and watermarked
stream-stream interval join, driven by file sources with AvailableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.streaming import joins as sj


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def clicks_dir(spark, tmp_path):
    p = str(tmp_path / "clicks")
    rows = [
        (1, "u1", "2024-01-01 10:00:00"),
        (2, "u2", "2024-01-01 10:05:00"),
        (3, "u1", "2024-01-01 11:30:00"),
        (4, "u9", "2024-01-01 10:10:00"),  # user with no purchase / no dim row
    ]
    _write(spark, p, [(i, u, t) for i, u, t in rows], ["click_id", "user_id", "ts_raw"])
    return p


@pytest.fixture()
def purchases_dir(spark, tmp_path):
    p = str(tmp_path / "purchases")
    rows = [
        (100, "u1", "2024-01-01 10:20:00"),  # 20 min after click 1 -> match
        (101, "u2", "2024-01-01 12:00:00"),  # ~2h after click 2 -> outside 1h window
        (102, "u1", "2024-01-01 11:45:00"),  # 15 min after click 3 -> match
    ]
    _write(spark, p, rows, ["purchase_id", "user_id", "ts_raw"])
    return p


def _stream(spark, path, id_col):
    return (
        spark.readStream.schema(f"{id_col} long, user_id string, ts_raw string")
        .format("parquet")
        .load(path)
        .withColumn("ts", F.col("ts_raw").cast("timestamp"))
        .drop("ts_raw")
    )


def _drain(df, name, ckpt, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_static_enrich_broadcasts_dim(spark, tmp_path, clicks_dir):
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "silver")], ["user_id", "tier"]
    )
    out = sj.enrich_with_dim(_stream(spark, clicks_dir, "click_id"), dim, ["user_id"])
    _drain(out, "enriched", str(tmp_path / "ck1"))
    rows = {r["click_id"]: r["tier"] for r in spark.table("enriched").collect()}
    assert rows == {1: "gold", 2: "silver", 3: "gold", 4: None}


def test_stream_stream_interval_join(spark, tmp_path, clicks_dir, purchases_dir):
    purchases = _stream(spark, purchases_dir, "purchase_id").withColumnRenamed(
        "ts", "purchase_ts"
    )
    clicks = _stream(spark, clicks_dir, "click_id").withColumnRenamed("ts", "click_ts")
    joined = sj.interval_join(
        purchases,
        clicks.select("click_id", "user_id", "click_ts"),
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        upper="1 hour",
    ).select("purchase_id", "click_id")
    _drain(joined, "attributed", str(tmp_path / "ck2"))
    got = {(r["purchase_id"], r["click_id"]) for r in spark.table("attributed").collect()}
    # purchase 100 <- click 1 (20 min); purchase 102 <- click 3 (15 min);
    # purchase 101 matches nothing within 1h
    assert got == {(100, 1), (102, 3)}


def test_interval_join_requires_watermarks_for_state_cleanup(
    spark, tmp_path, clicks_dir, purchases_dir
):
    """The plan must carry event-time watermarks on both inputs (that is
    what bounds the state store at scale)."""
    purchases = _stream(spark, purchases_dir, "purchase_id").withColumnRenamed(
        "ts", "purchase_ts"
    )
    clicks = _stream(spark, clicks_dir, "click_id").withColumnRenamed("ts", "click_ts")
    joined = sj.interval_join(
        purchases,
        clicks.select("click_id", "user_id", "click_ts"),
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
    )
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
