"""Range-clustered writes: files must carry disjoint cluster-key ranges
(the precondition every data-skipping reader consults)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.sources import layout as ly

SF = "/root/testdata/sf0.001"


def test_clustered_files_have_disjoint_ranges(spark, tmp_path):
    path = str(tmp_path / "orders_by_cust")
    ev = spark.read.parquet(f"{SF}/orders.parquet")
    ly.write_range_clustered(ev, path, ["o_custkey"], n_files=8)

    ranges = [r for r in ly.file_key_ranges(path, "o_custkey") if r[0] is not None]
    assert len(ranges) >= 4
    ranges.sort()
    # ranges may touch at boundaries (equal keys split across files) but
    # must never properly overlap
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2

    # row count preserved
    assert spark.read.parquet(path).count() == ev.count()


def test_point_lookup_filter_reaches_scan(spark, tmp_path):
    path = str(tmp_path / "ord2")
    ev = spark.read.parquet(f"{SF}/orders.parquet")
    ly.write_range_clustered(ev, path, ["o_custkey"], n_files=8)
    df = spark.read.parquet(path).filter(F.col("o_custkey") == 42)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # pushed filter + disjoint file ranges = file-level skipping at scale
    assert "PushedFilters" in plan and "o_custkey" in plan.split("PushedFilters")[1][:120]
