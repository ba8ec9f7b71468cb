"""S10: incremental file-set tracking (idempotent file ingest).

The reference keeps a ``processed_files.json`` list on S3, computes
``new = discovered - processed`` with a driver-side Python set, and rewrites
the whole list after a successful write (``csv_to_deltalake_table.py:29-125,
220-232, 642-644``).  That list is re-read and re-written in full every run —
O(total files ever) driver memory and IO.

The engine keeps the ledger as a *table* (parquet locally, Delta on a
cluster) and computes the new set with a ``left_anti`` join, which scales to
hundreds of millions of files and lets Catalyst broadcast the small side.
The ledger append happens only after the caller's write succeeds (same
at-least-once ordering the reference uses; pair with an idempotent/MERGE sink
for effective exactly-once).

On a real cluster the idiomatic replacement is the Structured Streaming file
source with ``Trigger.AvailableNow`` + checkpoint (see ``streaming/``), which
maintains this ledger internally; this module is the faithful batch form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

LEDGER_SCHEMA = StructType(
    [
        StructField("file_path", StringType(), False),
        StructField("processed_at", TimestampType(), False),
    ]
)


class FileLedger:
    """Processed-files ledger backed by a parquet directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def processed(self) -> DataFrame:
        # Probe existence BEFORE handing the path to the reader: a missing
        # first-run ledger otherwise makes the JVM analyzer log a full
        # FileNotFoundException stack at WARN (FileStreamSink metadata
        # probe) even though the Python except handles it — noise that
        # pollutes captured driver output.  The stat only applies to local
        # paths: an os.path.exists on a URI-style path (s3a://, hdfs://,
        # file:/) is always False, and short-circuiting there would treat
        # an EXISTING remote ledger as first-run — silent duplicate
        # ingestion.  Scheme'd paths fall through to the reader, whose
        # except still covers a genuinely missing ledger.
        import os
        from urllib.parse import urlparse

        scheme = urlparse(self.path).scheme
        local_path = self.path
        if scheme == "file":
            local_path = urlparse(self.path).path
        if scheme in ("", "file") and not os.path.exists(local_path):
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        try:
            return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)
        except Exception:  # raced/corrupt ledger: treat as first run
            return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def new_files(self, discovered: list[str] | DataFrame) -> list[str]:
        """discovered - processed, as a left_anti join (J7 done relationally
        instead of the reference's driver-side set difference)."""
        if isinstance(discovered, list):
            disc_df = self.spark.createDataFrame(
                [(p,) for p in discovered], ["file_path"]
            )
        else:
            disc_df = discovered.select("file_path")
        new = disc_df.join(self.processed(), "file_path", "left_anti")
        return sorted(r.file_path for r in new.collect())

    def mark_processed(self, files: list[str]) -> None:
        """Append to the ledger — call only AFTER the data write succeeds
        (the reference's ordering, ``csv_to_deltalake_table.py:642-644``)."""
        if not files:
            return
        df = self.spark.createDataFrame([(p,) for p in files], ["file_path"])
        df.withColumn("processed_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(self.path)


def ingest_new_files(
    ledger: FileLedger,
    discovered: list[str],
    read_fn,
    write_fn,
) -> int:
    """Idempotent ingest loop: read only unprocessed files, write, then mark.

    ``read_fn(paths: list[str]) -> DataFrame``; ``write_fn(df) -> None``.
    Returns the number of files ingested this run.
    """
    new = ledger.new_files(discovered)
    if not new:
        return 0
    write_fn(read_fn(new))
    ledger.mark_processed(new)
    return len(new)
