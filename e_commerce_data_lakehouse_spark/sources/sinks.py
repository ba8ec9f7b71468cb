"""Sinks + managed-table ops: S4/S5 raw sinks, S11-S18 table lifecycle.

Raw sinks (S4 CSV, S5 JSON): the reference ``coalesce(1)``s every raw write
(``transactions_processor.py:295-306``, ``iot_sensors_processor.py:216-228``)
— a single-task write that serializes the whole dataset through one core; at
100 TB it simply never finishes.  The engine never coalesces: it bounds file
count with ``maxRecordsPerFile`` and lets AQE coalesce partitions, which
keeps writes parallel AND files right-sized.

Managed tables (S11-S18): the container has no Delta runtime, so
:class:`ManagedTable` provides the same lifecycle over parquet —
create/append/overwrite/merge/compact — with the Delta call noted per method
as the drop-in physical replacement on a cluster.  MERGE is a full-table
rewrite here (the relational definition); Delta/Iceberg MERGE rewrites only
matched files, which is why it's the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from e_commerce_data_lakehouse_spark.operators.merge import (
    insert_only_merge,
    scd1_merge,
)


def write_raw_csv(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("year", "month", "day"),
    max_records_per_file: int = 10_000,
) -> None:
    """S4: partitioned CSV raw-layer sink (``transactions_processor.py:295-306``),
    minus the ``coalesce(1)`` anti-pattern."""
    (
        df.write.mode("append")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_by)
        .csv(path)
    )


def write_raw_json(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("year", "month", "day"),
    max_records_per_file: int = 10_000,
    compression: str = "gzip",
) -> None:
    """S5: partitioned gzip JSON raw-layer sink
    (``iot_sensors_processor.py:216-228``), parallel write."""
    (
        df.write.mode("append")
        .option("compression", compression)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_by)
        .json(path)
    )


class ManagedTable:
    """Parquet-backed table with the Delta lifecycle the reference uses.

    Every method notes the Delta drop-in.  Readers see a consistent snapshot
    per Spark job; for multi-writer ACID use Delta/Iceberg on the cluster.
    """

    def __init__(self, spark: SparkSession, path: str,
                 partition_by: tuple[str, ...] = ()):
        self.spark = spark
        self.path = path
        self.partition_by = partition_by

    def exists(self) -> bool:
        try:
            self.spark.read.parquet(self.path).schema
            return True
        except Exception:
            return False

    def read(self) -> DataFrame:
        """S16 (``spark.read.format("delta").load(path)``)."""
        return self.spark.read.parquet(self.path)

    def _writer(self, df: DataFrame, mode: str):
        w = df.write.mode(mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return w

    def create(self, df: DataFrame) -> None:
        """S11: overwrite-create (Delta: ``overwrite`` +
        ``delta.autoOptimize.optimizeWrite``)."""
        self._writer(df, "overwrite").parquet(self.path)

    def append(self, df: DataFrame) -> None:
        """S12: append (Delta adds ``mergeSchema=true``)."""
        self._writer(df, "append").parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        """S13: overwrite with schema evolution (Delta:
        ``overwriteSchema=true``, ``create_global_dw.py:92-94``)."""
        self._writer(df, "overwrite").parquet(self.path)

    def merge_scd1(self, updates: DataFrame, keys: list[str]) -> None:
        """S14: ``whenMatchedUpdateAll().whenNotMatchedInsertAll()``
        (``silver_to_gold_transactions.py:71``).  Parquet form: rewrite from
        the merged result; Delta form rewrites only matched files."""
        merged = scd1_merge(self.read(), updates, keys) if self.exists() else updates
        self._rewrite(merged)

    def merge_insert_only(self, updates: DataFrame, keys: list[str]) -> None:
        """S15: insert-if-absent for immutable dims
        (``silver_to_gold_customer_images.py:77-79``)."""
        merged = (
            insert_only_merge(self.read(), updates, keys)
            if self.exists()
            else updates
        )
        self._rewrite(merged)

    def compact(self, target_partitions: int | None = None) -> None:
        """S18: OPTIMIZE-equivalent small-file compaction — rewrite at a
        bounded partition count (Delta: ``OPTIMIZE delta.`path```)."""
        df = self.read()
        if target_partitions:
            df = df.repartition(target_partitions, *self.partition_by) \
                if self.partition_by else df.repartition(target_partitions)
        self._rewrite(df)

    def _rewrite(self, df: DataFrame) -> None:
        # Parquet overwrite of the source being read requires materializing
        # first; a real deployment uses Delta's transactional rewrite.
        tmp = self.path.rstrip("/") + "__tmp_rewrite"
        self._writer(df, "overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        self._writer(final, "overwrite").parquet(self.path)
        # leave tmp cleanup to the caller's storage lifecycle; local tests
        # overwrite it on each call so it stays bounded.
