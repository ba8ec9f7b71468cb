"""Physical data layout for scan pruning: range-clustered parquet writes.

The reference's only layout tools are Hive date partitioning plus Delta
``OPTIMIZE`` compaction (`csv_to_deltalake_table.py:520, 583`) — queries
filtering on anything but the partition date read every file.  Range
clustering is the missing half of data skipping: ``repartitionByRange`` on
the cluster key gives each output file a disjoint key range, so every
file's parquet footer min/max excludes it from scans filtering on that key
(Delta's ZORDER serves the same purpose for multi-key cases).

At 100 TB this is the difference between a point-lookup reading one file
and reading the whole table: partition pruning handles the date axis,
range clustering handles the entity axis (user_id / order_id), and both
are free at read time — the cost is one range shuffle at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write parquet with files covering disjoint ``cluster_cols`` ranges.

    ``repartitionByRange`` samples the key distribution so files get
    balanced row counts even under skew; ``sortWithinPartitions`` tightens
    per-row-group min/max stats inside each file (row-group-level skipping
    on top of file-level).
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet file, from footer metadata only
    — the ranges a reader's data-skipping consults.  Diagnostic/test aid."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[column]
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    bits: int = 8,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Multi-key data skipping: cluster files along a Z-order
    (bit-interleaved) space-filling curve over ``cluster_cols`` — the
    engine-side analog of Delta's ``OPTIMIZE ... ZORDER BY``.

    Single-key range clustering leaves every OTHER key spanning the full
    value range in every file; interleaving the keys' bucket bits gives the
    curve locality in ALL dimensions at once, so each file's parquet
    min/max footer stats are tight on every cluster column and a filter on
    any of them skips most files.

    Mechanics (all scale-safe): per column, a bounded driver action fetches
    global min/max (2 scalars); rows map to ``2**bits`` uniform buckets via
    ``width_bucket`` (a stateless expression — swap in approxQuantile
    boundaries for heavily skewed keys); bucket bits interleave into one
    long via a codegen shift/or chain; then one ``repartitionByRange`` on
    the z-value + ``sortWithinPartitions`` writes files covering disjoint
    z-ranges.  Columns must be numeric (cast dates with ``datediff`` /
    ``unix_timestamp`` first).
    """
    from pyspark.sql import functions as F

    n_cols = len(cluster_cols)
    if n_cols < 2:
        raise ValueError("zorder needs >= 2 cluster columns; use "
                         "write_range_clustered for a single key")
    aggs = []
    for c in cluster_cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs).first()

    z = F.lit(0).cast("long")
    for idx, c in enumerate(cluster_cols):
        lo = float(bounds[f"__lo_{c}"])
        hi = float(bounds[f"__hi_{c}"])
        if hi <= lo:
            continue  # constant column contributes no bits
        bucket = (
            F.width_bucket(
                F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(2**bits)
            )
            - 1
        ).cast("long")
        # width_bucket puts v == hi into bucket 2**bits + 1 -> clamp
        bucket = F.least(bucket, F.lit(2**bits - 1))
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1).cast("long")),
                    b * n_cols + idx,
                )
            )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
