"""Upsert / SCD-1 merge and high-watermark incremental operators.

The reference does SCD-1 with ``DeltaTable.merge`` —
``whenMatchedUpdateAll().whenNotMatchedInsertAll()`` for mutable dims
(S14, ``silver_to_gold_transactions.py:71-90``) and insert-only for immutable
dims (S15, ``silver_to_gold_customer_images.py:77-79``).  Delta isn't
available in this container, so the engine expresses MERGE as its relational
definition — updates ∪ (target anti-join updates) — which also serves as the
oracle-checkable semantics.  On a Delta/Iceberg-enabled cluster the
``DeltaTable.merge`` call is a drop-in physical replacement (and is the
recommended one: it rewrites only matched files instead of the whole table).

High-watermark incrementals are T2/T3 (``csv_bronze_to_silver.py:54-78``,
``silver_to_gold_transactions.py:28-35``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd1_merge(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """SCD type-1 upsert: update matched rows, insert new ones.

    Relationally: ``updates UNION ALL (target ANTI JOIN updates)``.
    The anti join shuffles both sides on the key once; with AQE the small
    updates side is broadcast.  Deterministic (no row_number tie risk)
    because ``updates`` must be unique per key — enforced here.
    """
    dup = updates.groupBy(*keys).count().filter(F.col("count") > 1)
    if dup.limit(1).count() > 0:
        raise ValueError(f"updates not unique on {keys}")
    unmatched = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return updates.unionByName(unmatched)


def scd1_merge_latest(
    target: DataFrame, updates: DataFrame, keys: list[str], ts_col: str
) -> DataFrame:
    """Order-aware SCD-1 upsert: a matched row is replaced only when the
    update is at least as new on ``ts_col`` (Delta's ``whenMatchedUpdate``
    with a ``source.ts >= target.ts`` condition).

    This is what a streaming bronze→silver MERGE needs: micro-batches can
    replay or arrive with late data, and a stale re-delivery must not
    clobber a newer silver row — plain :func:`scd1_merge` is last-writer-
    wins and would.  Relationally it's union-both-sides + keep-latest per
    key with the update side winning ties: one shuffle on the key.

    ``updates`` must be unique per key (pre-dedup with ``keep_latest``).
    """
    from e_commerce_data_lakehouse_spark.operators.dedup import keep_latest

    tagged_t = target.withColumn("__src", F.lit(0))
    tagged_u = updates.withColumn("__src", F.lit(1))
    unioned = tagged_t.unionByName(tagged_u)
    return keep_latest(unioned, keys, ts_col, tiebreakers=["__src"]).drop(
        "__src"
    )


def insert_only_merge(
    target: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """S15 insert-if-absent: immutable dims keep the existing row."""
    new_rows = updates.join(target.select(*keys).distinct(), keys, "left_anti")
    return target.unionByName(new_rows)


def high_watermark(df: DataFrame, ts_col: str):
    """T2/T3: MAX(ts) of the target table (None when empty)."""
    row = df.agg(F.max(ts_col).alias("wm")).collect()[0]
    return row["wm"]


def incremental_rows(
    source: DataFrame, target: DataFrame, ts_col: str
) -> DataFrame:
    """Rows of ``source`` newer than the target's high watermark — the
    bronze→silver / silver→gold incremental predicate (T2/T3).  Unlike the
    reference, the watermark is applied as a *typed column predicate* (which
    pushes down to the parquet scan) rather than string-interpolated SQL
    (``csv_bronze_to_silver.py:161-163``)."""
    import datetime

    wm = high_watermark(target, ts_col)
    if wm is None:
        return source
    if isinstance(wm, datetime.datetime):
        # A naive datetime through F.lit() becomes a TIMESTAMP_LTZ literal
        # converted with the *OS* timezone (TimestampType.toInternal uses
        # local mktime) — wrong for NTZ columns whenever host tz != UTC.
        # Re-embed as an ISO string cast to the column's own type instead:
        # string→NTZ parse is tz-independent, string→LTZ uses session tz.
        lit = F.lit(wm.isoformat(sep=" ")).cast(source.schema[ts_col].dataType)
    else:
        lit = F.lit(wm)
    return source.filter(F.col(ts_col) > lit)
