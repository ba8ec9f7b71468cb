"""Driver contract for the spark-graft builder (PySpark target).

Each query below is implemented twice:
- Spark-first, via the engine library (``e_commerce_data_lakehouse_spark``);
- as ANSI SQL for the DuckDB oracle (hash-match correctness gate).

Float determinism: every double aggregate goes through exact decimal
arithmetic (see ``functions/exact.py``) so Spark and DuckDB produce
bit-identical values regardless of partitioning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star-schema revenue rollup
    by region/nation (broadcast star join + exact-decimal aggregate)."""
    return entry_queries.QUERIES["star_revenue_by_region"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in entry_queries.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI equivalents; omitted keys get the weaker rows-only check
    (only ops whose semantics depend on Spark-internal hashing omit it)."""
    return {
        name: q.oracle
        for name, q in entry_queries.QUERIES.items()
        if q.oracle is not None
    }
