"""The SAME sessionize expression must work under readStream with a
watermark — the streaming-capable claim in operators/aggregates.sessionize,
verified instead of asserted."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.operators import aggregates as agg


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    rows = [
        # u1: two sessions (10:00-10:10 block, then 11:00)
        ("u1", "2024-01-01 10:00:00"),
        ("u1", "2024-01-01 10:10:00"),
        ("u1", "2024-01-01 11:00:00"),
        # u2: one session
        ("u2", "2024-01-01 09:00:00"),
        ("u2", "2024-01-01 09:20:00"),
    ]
    src = str(tmp_path / "src")
    batch_df = (
        spark.createDataFrame(rows, ["user_id", "ts_raw"])
        .withColumn("ts", F.col("ts_raw").cast("timestamp"))
        .drop("ts_raw")
    )
    batch_df.coalesce(1).write.parquet(src)

    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in agg.sessionize(batch_df, "user_id", "ts", gap="30 minutes").collect()
    }
    assert len(batch) == 3

    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .format("parquet")
        .load(src)
        .withWatermark("ts", "1 hour")
    )
    q = (
        agg.sessionize(stream, "user_id", "ts", gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sess_out").collect()
    }
    assert streamed == batch
