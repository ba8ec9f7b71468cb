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
