"""Streaming joins: the streaming-native form of the reference's enrichment
joins (SURVEY §2.3 J1-J4 run as batch jobs per Airflow tick).

Two shapes Spark supports natively:

- **Stream-static** (:func:`enrich_with_dim`): each micro-batch joins
  against a batch dimension table.  The dim side is broadcast when small —
  per-batch map-side hash join, no shuffle of the stream, and dim updates
  are picked up on re-read per batch (SCD-1 friendly, same semantics as the
  reference re-reading its Delta dims each run,
  ``silver_to_gold_transactions.py:66``).
- **Stream-stream** (:func:`interval_join`): both sides buffered in state,
  matched on an equi-key plus an event-time interval.  Watermarks on BOTH
  inputs bound the state store — without the time bound Spark would have to
  keep every row forever; the interval condition is what lets it evict.
  This is the streaming form of the as-of/enrichment pattern
  (``operators/joins.py:asof_join`` is the batch form).

Scale notes: stream-stream state shards by the equi-join key across
executors; skewed keys skew state stores, so the key should be the
high-cardinality entity id (user_id/order_id), never a low-cardinality
status column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join (J1/J2/J4 in streaming form)."""
    right = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(right, on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join on ``on`` where
    ``right_ts ∈ [left_ts - upper, left_ts - lower]`` (right event happened
    up to ``upper`` before the left event).

    Both sides get event-time watermarks; the interval predicate plus the
    watermarks let Spark evict buffered rows, keeping state bounded by
    (watermark + interval width) per key.
    """
    l = left.withWatermark(left_ts, left_watermark).alias("l")
    r = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} - interval {lower}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - interval {upper}"))
    )
    return l.join(r, cond, "inner")
