"""asof_join tolerance semantics on constructed timelines."""

from __future__ import annotations

import datetime as dt

from e_commerce_data_lakehouse_spark.operators import joins as jn


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10, 0), "p1"),   # view 30 min before -> kept
            (1, _ts(13, 0), "p2"),   # nearest view 3h before -> nulled
            (2, _ts(9, 0), "p3"),    # no view at all -> null
            (3, _ts(12, 0), "p4"),   # view exactly 1h before -> boundary kept
        ],
        "user_id int, lts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(9, 30), "v1"),
            (3, _ts(11, 0), "v2"),
        ],
        "user_id int, rts timestamp, vid string",
    )
    out = {
        r["pid"]: r["vid"]
        for r in jn.asof_join(
            left,
            right,
            on="user_id",
            left_ts="lts",
            right_ts="rts",
            right_cols=["vid"],
            tolerance="1 HOUR",
        ).collect()
    }
    assert out == {"p1": "v1", "p2": None, "p3": None, "p4": "v2"}


def test_asof_without_tolerance_unchanged(spark):
    """tolerance=None must reproduce the unbounded backward as-of."""
    left = spark.createDataFrame(
        [(1, _ts(13, 0), "p2")], "user_id int, lts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [(1, _ts(9, 30), "v1")], "user_id int, rts timestamp, vid string"
    )
    rows = jn.asof_join(
        left, right, "user_id", "lts", "rts", ["vid"]
    ).collect()
    assert rows[0]["vid"] == "v1"
