"""Bucketed tables: pre-shuffled physical layout for co-located joins.

The reference's only physical layout is Hive date partitioning (SURVEY
§1.4); every fact-fact or fact-bigdim join therefore shuffles both sides at
query time.  At 100 TB the dominant cost of the gold/global-DW builds is
exactly those repeated shuffles on the same keys (order_id, customer_id).

Bucketing fixes the layout once at write time: both tables are hash-bucketed
into the same number of buckets on the join key, so Catalyst plans a
sort-merge join with ZERO Exchange on either side — the shuffle is paid once
at ingest and amortized over every downstream join/aggregate on that key.
Spark's bucketed write requires ``saveAsTable`` (bucket metadata lives in
the session catalog / metastore, not in the parquet files).

Usage shape for the medallion pipeline: bucket silver facts by their star
key at the silver write, then every silver→gold and gold→global join on
that key is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    ``n_buckets`` should be sized so one bucket of the big table fits an
    executor core's working memory at target scale (buckets are the unit of
    join parallelism — too few caps parallelism, too many makes small
    files).  Sorting within buckets lets the join skip its sort step.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    With both sides bucketed on ``on`` into the same bucket count, the
    planned join has no Exchange (verified by ``tests/test_bucketing.py``
    against the physical plan).  AQE is left on; it preserves bucketed
    scans.  Broadcast is disabled by the caller's table sizes, not here —
    if one side is tiny Spark may still (correctly) broadcast it.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
