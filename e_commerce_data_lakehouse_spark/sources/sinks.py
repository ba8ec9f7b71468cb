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

    Versioning (S17): every mutation writes a new ``v=N`` snapshot directory
    and the table reads resolve to the latest — which gives ``history()``,
    ``versionAsOf`` time travel, and ``restore`` with plain parquet
    (`delta_reader.py:156, 162, 74-88` use the Delta equivalents).  Old
    snapshots are pruned beyond ``keep_versions`` (Delta: ``VACUUM``).
    """

    def __init__(self, spark: SparkSession, path: str,
                 partition_by: tuple[str, ...] = (), keep_versions: int = 3,
                 backend: str = "parquet", optimized_write: bool = False):
        from e_commerce_data_lakehouse_spark.sources.backends import (
            make_backend,
        )

        self.spark = spark
        self.path = path.rstrip("/")
        self.partition_by = partition_by
        self.keep_versions = keep_versions
        # the storage seam (r10 VERDICT ask #5): everything physical —
        # version listing, snapshot commit, file append, versioned read,
        # metadata row count — goes through the backend; everything
        # relational (MERGE variants, delete/update, idempotent append,
        # compaction policy) stays here on top of it.  backend="delta"
        # flips to real Delta on a cluster (import-gated in-sandbox);
        # the contract suite (tests/test_table_backends.py) runs the
        # same assertions against every available backend.
        self._backend = make_backend(
            backend, spark, self.path,
            partition_by=partition_by, keep_versions=keep_versions,
            optimized_write=optimized_write,
        )

    def set_partition_by(self, partition_by: tuple[str, ...]) -> None:
        """Set the physical partition grain before the FIRST commit.

        For pipelines that DERIVE the grain from measured batch volume
        at run time (``plans/medallion.measure_fact_partition_grain``):
        an un-run dag must not launch a measurement job at construction,
        so the table is built grainless and the writing task sets the
        grain just before the first write.  Refuses to re-grain a table
        that already has committed versions — existing snapshots were
        laid out under the old grain and a silent flip would make reads
        see mixed layouts (rewrite through a fresh table instead).  A
        RECONSTRUCTED grainless handle over an existing table (each
        ``orders_dag`` call builds fresh ``ManagedTable`` objects — the
        idempotent re-run path) is accepted when the requested grain
        matches the committed on-disk hive layout."""
        new = tuple(partition_by)
        if self._versions():
            current = tuple(self.partition_by) or self._on_disk_grain()
            if current != new:
                raise ValueError(
                    f"cannot change partition grain of committed table "
                    f"{self.path} from {current!r} to {new!r}"
                )
        self.partition_by = new
        self._backend.partition_by = new

    def _on_disk_grain(self) -> tuple[str, ...]:
        """The hive ``col=value`` directory chain of the latest committed
        version — the layout ground truth for :meth:`set_partition_by`'s
        mismatch check on reconstructed handles."""
        import os

        chain: list[str] = []
        try:
            d = self._vpath(self._versions()[-1])
            while True:
                subs = [
                    e for e in os.listdir(d)
                    if "=" in e and os.path.isdir(os.path.join(d, e))
                ]
                if not subs:
                    break
                chain.append(subs[0].split("=", 1)[0])
                d = os.path.join(d, subs[0])
        except OSError:
            # non-local storage (object-store backend): trust the caller
            return tuple(self.partition_by)
        return tuple(chain)

    # -- version bookkeeping ------------------------------------------------
    def _versions(self) -> list[int]:
        return self._backend.versions()

    def history(self) -> list[int]:
        """S17: ``DeltaTable.history()`` equivalent — committed versions."""
        return self._versions()

    def exists(self) -> bool:
        return bool(self._versions())

    def _vpath(self, version: int) -> str:
        return self._backend.vpath(version)

    def _resolve_version(self, version_as_of: int | None) -> int:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no committed versions at {self.path}")
        v = version_as_of if version_as_of is not None else vs[-1]
        if v not in vs:
            raise ValueError(f"version {v} not in {vs}")
        return v

    def read(self, version_as_of: int | None = None) -> DataFrame:
        """S16 (``spark.read.format("delta").load(path)``); pass
        ``version_as_of`` for S17 time travel (``versionAsOf``)."""
        return self._backend.read(self._resolve_version(version_as_of))

    def row_count(self, version_as_of: int | None = None) -> int:
        """Row count from storage metadata — parquet footers on the
        snapshot backend (no Spark job, no data read), transaction-log
        stats on Delta; at 100 TB a monitoring sweep over every table
        must stay metadata-only (the reference runs a full ``count()``
        job per table per catalog rebuild,
        ``create_global_dw.py:451-540``)."""
        return self._backend.row_count(self._resolve_version(version_as_of))

    def restore_to_version(self, version: int) -> None:
        """S17: ``restoreToVersion`` — re-commit an old snapshot as newest."""
        self._commit(self.read(version_as_of=version))

    def _commit(self, df: DataFrame) -> None:
        self._backend.commit(df)

    # -- lifecycle ----------------------------------------------------------
    def create(self, df: DataFrame) -> None:
        """S11: overwrite-create (Delta: ``overwrite`` +
        ``delta.autoOptimize.optimizeWrite``)."""
        self._commit(df)

    def append(self, df: DataFrame) -> None:
        """S12: append (Delta adds ``mergeSchema=true``).  Appends files
        into the CURRENT version directory — a parallel file-level append,
        never a table rewrite (at 100 TB an append must be O(new data)).
        Time-travel granularity for appends therefore comes from the next
        snapshot-producing op (merge/overwrite/compact), matching how one
        would checkpoint batches; Delta versions every append.

        CAVEAT (because append writes into the CURRENT version dir): if
        ``df`` — or any frame you will evaluate after this call — derives
        from ``self.read()``, detach it first with an eager
        ``localCheckpoint()``.  Spark's post-write path refresh
        invalidates and re-lists caches on the written path, so a merely
        ``persist()``-ed dependent frame silently re-includes the rows
        this call appends (found the hard way by the incremental corpus
        DAG: a cached stored-fingerprint frame swallowed the whole batch
        it was being appended from).  Snapshot ops (overwrite / merge)
        don't have this hazard — they commit to a NEW version directory."""
        if not self.exists():
            self._commit(df)
            return
        self._backend.append_files(df)

    def overwrite(self, df: DataFrame) -> None:
        """S13: overwrite with schema evolution (Delta:
        ``overwriteSchema=true``, ``create_global_dw.py:92-94``)."""
        self._commit(df)

    def merge_scd1(self, updates: DataFrame, keys: list[str]) -> None:
        """S14: ``whenMatchedUpdateAll().whenNotMatchedInsertAll()``
        (``silver_to_gold_transactions.py:71``).  Snapshot rewrite from the
        merged result; Delta's MERGE rewrites only matched files."""
        merged = scd1_merge(self.read(), updates, keys) if self.exists() else updates
        self._commit(merged)

    def merge_latest(
        self, updates: DataFrame, keys: list[str], ts_col: str
    ) -> None:
        """Order-aware upsert: matched rows are replaced only by updates at
        least as new on ``ts_col`` (Delta ``whenMatchedUpdate`` with a
        timestamp condition) — safe under streaming replay / late data."""
        from e_commerce_data_lakehouse_spark.operators.merge import (
            scd1_merge_latest,
        )

        merged = (
            scd1_merge_latest(self.read(), updates, keys, ts_col)
            if self.exists()
            else updates
        )
        self._commit(merged)

    def append_once(self, df: DataFrame, txn_id: str) -> bool:
        """Idempotent append — Delta's ``txnAppId``/``txnVersion`` contract
        for append-only streaming sinks: a batch identified by ``txn_id``
        lands exactly once no matter how many times ``foreachBatch`` replays
        it after a failure.  Returns False (no-op) if ``txn_id`` was already
        committed.  The ledger is a tiny text marker per transaction —
        O(committed batches), checked without reading any data.

        Emulation caveat (same class of caveat as the rest of
        ``ManagedTable``): the data append and the marker write are two
        steps, so a crash exactly between them re-appends on replay.  Delta
        closes that window by committing data files and the txn action in
        one atomic log entry — this method maps onto
        ``.option("txnAppId", ...).option("txnVersion", ...)`` there."""
        import os

        marker_dir = f"{self.path}/_txn"
        marker = f"{marker_dir}/{txn_id}"
        if os.path.exists(marker):
            return False
        self.append(df)
        os.makedirs(marker_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write(txn_id)
        return True

    def delete_where(self, condition) -> int:
        """Delta ``DELETE FROM table WHERE cond`` — the GDPR-erasure /
        bad-batch-removal path.  Returns the number of rows deleted and
        commits a new snapshot, so the deletion is itself versioned
        (auditable, and reversible until vacuum via time travel — exactly
        Delta's contract).  Snapshot rewrite here; Delta rewrites only the
        files whose stats overlap the predicate."""
        cur = self.read()
        keep = cur.filter(~condition)
        deleted = cur.count() - keep.count()
        if deleted:
            self._commit(keep)
        return deleted

    def update_where(self, condition, assignments: dict) -> int:
        """Delta ``UPDATE table SET ... WHERE cond``: conditional column
        rewrite, committed as a new version.  ``assignments`` maps column
        name -> Column expression applied only where ``condition`` holds."""
        from pyspark.sql import functions as _F

        cur = self.read()
        touched = cur.filter(condition).count()
        out = cur
        for col, expr in assignments.items():
            out = out.withColumn(
                col, _F.when(condition, expr).otherwise(_F.col(col))
            )
        if touched:
            self._commit(out)
        return touched

    def merge_insert_only(self, updates: DataFrame, keys: list[str]) -> None:
        """S15: insert-if-absent for immutable dims
        (``silver_to_gold_customer_images.py:77-79``)."""
        merged = (
            insert_only_merge(self.read(), updates, keys)
            if self.exists()
            else updates
        )
        self._commit(merged)

    def compact(self, target_partitions: int | None = None) -> None:
        """S18: OPTIMIZE-equivalent small-file compaction — rewrite at a
        bounded partition count (Delta: ``OPTIMIZE delta.`path```)."""
        df = self.read()
        if target_partitions:
            df = df.repartition(target_partitions, *self.partition_by) \
                if self.partition_by else df.repartition(target_partitions)
        self._commit(df)
