"""Sorts / limits / top-k (SURVEY §2.6).

O1-O4: ``orderBy(desc(metric)).limit(n)`` compiles to TakeOrderedAndProject —
a per-partition heap + single driver merge of n rows, NOT a global sort.
That's the correct plan at 100 TB: no full shuffle, O(n) driver memory.
All top-k here requires explicit tiebreaker columns so results are
deterministic (the reference sorts by metric alone, SURVEY §7.4-4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_n(
    df: DataFrame,
    metric: str,
    n: int,
    tiebreakers: list[str] | None = None,
    ascending: bool = False,
) -> DataFrame:
    order = [F.col(metric).asc() if ascending else F.col(metric).desc()]
    order += [F.col(t).asc() for t in (tiebreakers or [])]
    return df.orderBy(*order).limit(n)


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    metric: str,
    n: int,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Window-based per-group top-k (rank within partition) — one shuffle on
    the group key."""
    from pyspark.sql import Window

    order = [F.col(metric).desc()] + [F.col(t).asc() for t in (tiebreakers or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .withColumnRenamed("__rk", "rank")
    )
