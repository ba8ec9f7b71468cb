"""Skew-robustness machinery (r9 VERDICT #8): the aggregate-based
keep-latest must equal the window form wherever the determinism
contract holds, and the skew generator must plant the 20% hot key it
promises.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.operators.dedup import (
    keep_latest,
    keep_latest_agg,
)


def _rows(seed: int, n: int, with_nulls: bool = False):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        key = rng.randrange(8) if rng.random() > 0.3 else 7  # hot key
        ts = None if (with_nulls and rng.random() < 0.1) else rng.randrange(50)
        out.append((key, ts, i, f"p{i}"))
    return out


def test_agg_equals_window_with_discriminating_tiebreaker(spark):
    df = spark.createDataFrame(
        _rows(11, 400), "k long, ts long, uid long, payload string"
    )
    a = keep_latest_agg(df, ["k"], "ts", ["uid"])  # uid unique -> contract
    w = keep_latest(df, ["k"], "ts", ["uid"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, w.collect()))


def test_agg_equals_window_with_null_order_values(spark):
    """desc() windows put nulls last; struct-max treats null fields as
    smallest — both forms must pick the same survivor."""
    df = spark.createDataFrame(
        _rows(13, 300, with_nulls=True),
        "k long, ts long, uid long, payload string",
    )
    a = keep_latest_agg(df, ["k"], "ts", ["uid"])
    w = keep_latest(df, ["k"], "ts", ["uid"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, w.collect()))


def test_agg_plan_is_partial_aggregated(spark):
    """The whole point: the physical plan must be a hash aggregate with
    a map-side partial (skew combines before the shuffle), NOT a window
    sort."""
    import contextlib
    import io

    df = spark.createDataFrame(
        _rows(17, 100), "k long, ts long, uid long, payload string"
    )
    out = keep_latest_agg(df, ["k"], "ts", ["uid"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    # struct-max aggregates via SortAggregate (struct buffers aren't
    # hash-aggregable) — the property that matters is the PARTIAL pass
    # running before the Exchange, combining a hot key map-side
    # (partial_* functions only ever appear in the pre-shuffle stage)
    assert "partial_max" in plan


def test_skew_generator_plants_hot_key(tmp_path):
    import subprocess
    import sys

    import pyarrow.parquet as pq

    r = subprocess.run(
        [sys.executable, "tools/gen_skew_data.py", "0.01",
         "--out", str(tmp_path)],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    ev = pq.read_table(
        f"{tmp_path}/skew0.01/events_skew.parquet", columns=["user_id"]
    )["user_id"].to_pylist()
    hot = sum(1 for u in ev if u == 7)
    assert abs(hot / len(ev) - 0.20) < 0.005
    od = pq.read_table(
        f"{tmp_path}/skew0.01/orders_skew.parquet", columns=["o_custkey"]
    )["o_custkey"].to_pylist()
    assert abs(sum(1 for c in od if c == 7) / len(od) - 0.20) < 0.005
