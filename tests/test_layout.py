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


def test_zorder_files_are_tight_on_both_keys(spark, tmp_path):
    """Z-order clustering must bound BOTH keys' per-file ranges, where
    single-key range clustering leaves the second key spanning the full
    range in every file."""
    ev = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .withColumn("o_days", F.datediff("o_orderdate", F.lit("1992-01-01")))
        .select("o_orderkey", "o_custkey", "o_days", "o_totalprice")
    )

    zpath = str(tmp_path / "z")
    ly.write_zorder_clustered(ev, zpath, ["o_custkey", "o_days"], n_files=16)
    rpath = str(tmp_path / "r")
    ly.write_range_clustered(ev, rpath, ["o_custkey"], n_files=16)

    assert spark.read.parquet(zpath).count() == ev.count()

    def avg_span_frac(path, col):
        ranges = [r for r in ly.file_key_ranges(path, col) if r[0] is not None]
        glo = min(r[0] for r in ranges)
        ghi = max(r[1] for r in ranges)
        return sum((hi - lo) / (ghi - glo) for lo, hi in ranges) / len(ranges)

    # single-key clustering: second key spans ~full range per file
    assert avg_span_frac(rpath, "o_days") > 0.8
    # z-order: BOTH keys materially bounded per file
    z_cust = avg_span_frac(zpath, "o_custkey")
    z_days = avg_span_frac(zpath, "o_days")
    assert z_cust < 0.6, z_cust
    assert z_days < 0.6, z_days


def test_zorder_rejects_single_column(spark, tmp_path):
    import pytest

    ev = spark.read.parquet(f"{SF}/orders.parquet")
    with pytest.raises(ValueError):
        ly.write_zorder_clustered(ev, str(tmp_path / "x"), ["o_custkey"])
