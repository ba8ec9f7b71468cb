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


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    effective_date,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD type-2 batch apply: full change history with effective dating.

    For each update whose ``tracked`` attributes differ from the key's
    CURRENT dimension row (or whose key is new), the current row is closed
    (``valid_to = effective_date``, ``is_current = false``) and a new
    current row opens at ``effective_date``.  No-op updates (identical
    tracked values) change nothing — the idempotence a replayed batch needs.

    Relational decomposition (each leg one equi-join on the key, AQE
    broadcasts the small update side; history rows are untouched and at
    scale would live in partition-pruned storage):

    - ``changed``  = updates ⋉-diff current  (new key, or any tracked diff)
    - ``closed``   = current ⋉ changed, end-dated
    - ``opened``   = changed rows as new current versions
    - result = history ∪ (current ∖ changed) ∪ closed ∪ opened

    ``updates`` must be unique per key.  On a Delta cluster the closed+opened
    legs map onto one ``DeltaTable.merge`` with a conditional
    ``whenMatchedUpdate`` + ``whenNotMatchedInsert`` — same semantics, file-
    level rewrite instead of table rebuild.
    """
    dup = updates.groupBy(*keys).count().filter(F.col("count") > 1)
    if dup.limit(1).count() > 0:
        raise ValueError(f"updates not unique on {keys}")

    eff = F.lit(effective_date).cast("date")
    cur = dim.filter(F.col(current_col))
    history = dim.filter(~F.col(current_col))

    joined = updates.alias("u").join(
        cur.alias("c"), [F.col(f"u.{k}") == F.col(f"c.{k}") for k in keys], "left"
    )
    diff = F.lit(False)
    for t in tracked:
        # null-safe inequality: a tracked change to/from NULL still counts
        diff = diff | ~F.col(f"u.{t}").eqNullSafe(F.col(f"c.{t}"))
    is_new = F.col(f"c.{keys[0]}").isNull()
    # carry EVERY update column (tracked cols only drive the diff test)
    changed = joined.filter(is_new | diff).select(
        *[F.col(f"u.{c}").alias(c) for c in updates.columns]
    )

    changed_keys = changed.select(*keys)
    closed = (
        cur.join(changed_keys, keys, "left_semi")
        .withColumn(end_col, eff)
        .withColumn(current_col, F.lit(False))
    )
    untouched = cur.join(changed_keys, keys, "left_anti")
    opened = (
        changed.withColumn(start_col, eff)
        .withColumn(end_col, F.lit(None).cast("date"))
        .withColumn(current_col, F.lit(True))
    )
    return (
        history.unionByName(untouched)
        .unionByName(closed)
        .unionByName(opened.select(*history.columns))
    )
