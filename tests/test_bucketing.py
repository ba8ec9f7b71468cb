"""Bucketed co-located joins: the shuffle paid once at write time must NOT
reappear in the join plan."""

from __future__ import annotations

import contextlib
import io

import pytest

from e_commerce_data_lakehouse_spark.sources import bucketing as bk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    bk.write_bucketed(
        orders, "bktest.orders_b", ["o_orderkey"], n_buckets=8,
        sort_cols=["o_orderkey"], path=str(base / "orders_b"),
    )
    bk.write_bucketed(
        lineitem, "bktest.lineitem_b", ["l_orderkey"], n_buckets=8,
        sort_cols=["l_orderkey"], path=str(base / "lineitem_b"),
    )
    yield "bktest.orders_b", "bktest.lineitem_b"
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # disable auto-broadcast so the test proves bucketing (not broadcast)
    # removed the shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bk.colocated_join(
            spark, lt, ot,
            spark.table(lt).l_orderkey == spark.table(ot).o_orderkey,
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_correct(spark, bucketed_tables):
    ot, lt = bucketed_tables
    got = (
        spark.table(lt)
        .join(spark.table(ot), spark.table(lt).l_orderkey == spark.table(ot).o_orderkey)
        .count()
    )
    # ground truth: every lineitem row matches exactly one order
    assert got == spark.read.parquet(f"{SF}/lineitem.parquet").count()
