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


def _session_rows(seed: int, n: int, hot_frac: float = 0.4):
    """Events engineered to cross 1-day bucket boundaries: bursts around
    midnight, exact-gap ties, multi-day marathon sessions."""
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    out = []
    for i in range(n):
        key = 7 if rng.random() < hot_frac else rng.randrange(5)
        day = rng.randrange(6)
        if rng.random() < 0.3:  # midnight-straddling burst
            minute = rng.randrange(-40, 40)
        else:
            minute = rng.randrange(0, 24 * 60)
        ts = base + dt.timedelta(days=day, minutes=minute,
                                 seconds=rng.randrange(60))
        out.append((key, ts, float(rng.randrange(100)), i))
    # one marathon session spanning 3 days: events every 20 minutes
    t = base + dt.timedelta(days=10)
    for j in range(3 * 72):
        out.append((3, t, 1.0, 10_000 + j))
        t += dt.timedelta(minutes=20)
    # exact-gap edge: session_window MERGES an event at exactly +30min
    # (probed r10, defect class #9) — both forms must agree on the tie
    edge = base + dt.timedelta(days=20)
    out.append((4, edge, 5.0, 20_000))
    out.append((4, edge + dt.timedelta(minutes=30), 6.0, 20_001))
    return out


def test_sessionize_bucketed_equals_session_window(spark):
    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    df = spark.createDataFrame(
        _session_rows(23, 800),
        "user_id long, ts timestamp, value double, event_id long",
    )
    one_pass = agg.sessionize(
        df, "user_id", "ts", gap="30 minutes",
        aggs=[F.count("*").alias("n_events"),
              F.sum(F.col("value").cast("decimal(30,6)"))
              .cast("double").alias("sum_value")],
    )
    bucketed = agg.sessionize_bucketed(
        df, "user_id", "ts", gap="30 minutes", bucket="1 day",
        partial_aggs=[F.count("*").alias("n_events"),
                      F.sum(F.col("value").cast("decimal(30,6)"))
                      .alias("__sv")],
        tiebreakers=["event_id"],
    ).select("user_id", "session_start", "session_end", "n_events",
             F.col("__sv").cast("double").alias("sum_value"))
    a = sorted(map(tuple, one_pass.collect()))
    b = sorted(map(tuple, bucketed.collect()))
    assert a == b
    # the marathon session (key 3, days 10-13) must have been stitched
    # back into ONE row despite spanning three bucket boundaries
    import datetime as dt

    d10 = dt.datetime(2024, 1, 11)
    marathon = [r for r in b if r[0] == 3 and r[1] >= d10]
    assert len(marathon) == 1 and marathon[0][3] == 3 * 72
    # the exact-gap tie (key 4, day 20) merged into ONE session in BOTH
    # forms (session_window's inclusive merge, defect class #9)
    d20 = dt.datetime(2024, 1, 21)
    tie = [r for r in b if r[0] == 4 and r[1] >= d20]
    assert len(tie) == 1 and tie[0][3] == 2 and tie[0][4] == 11.0


def test_sessionize_bucketed_drops_null_ts_like_session_window(spark):
    """session_window silently DROPS null-timestamp rows; the bucketed
    form must match (r10 ADVICE: it used to emit a NULL-start/NULL-end
    session per key instead — a contract break on NULL-degradation
    shapes invisible on the non-null data vintages)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    base = dt.datetime(2024, 3, 1)
    rows = [
        (1, base, 1.0, 1),
        (1, None, 2.0, 2),  # null ts: dropped by session_window
        (1, base + dt.timedelta(minutes=5), 3.0, 3),
        (2, None, 4.0, 4),  # key with ONLY null ts: no session at all
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    one = agg.sessionize(df, "user_id", "ts", gap="30 minutes",
                         aggs=[F.count("*").alias("n_events")])
    buck = agg.sessionize_bucketed(
        df, "user_id", "ts", gap="30 minutes", bucket="1 day",
        partial_aggs=[F.count("*").alias("n_events")],
        tiebreakers=["event_id"],
    )
    a = sorted(map(tuple, one.collect()))
    b = sorted(map(tuple, buck.collect()))
    assert a == b
    assert len(a) == 1 and a[0][0] == 1 and a[0][3] == 2


def test_sessionize_bucketed_rejects_bucket_lt_gap(spark):
    import pytest as pt

    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    df = spark.createDataFrame(
        [(1, None, 1.0, 1)],
        "user_id long, ts timestamp, value double, event_id long",
    )
    with pt.raises(ValueError, match="bucket"):
        agg.sessionize_bucketed(df, "user_id", "ts",
                                gap="1 day", bucket="1 hour")


def test_agg_equals_window_with_nan_order_values(spark):
    """Spark orders NaN as GREATER than every double in both window
    sorts and struct comparison — the two keep-latest forms must pick
    the same survivor when the order column carries NaNs."""
    rows = []
    for i in range(60):
        ts = float("nan") if i % 7 == 0 else float(i % 13)
        rows.append((i % 4, ts, i, f"p{i}"))
    df = spark.createDataFrame(
        rows, "k long, ts double, uid long, payload string"
    )
    import math

    def norm(rows):
        return sorted(
            (tuple("NaN" if isinstance(x, float) and math.isnan(x) else x
                   for x in r) for r in rows),
            key=repr,
        )

    a = keep_latest_agg(df, ["k"], "ts", ["uid"])
    w = keep_latest(df, ["k"], "ts", ["uid"])
    got_a = norm(map(tuple, a.collect()))
    got_w = norm(map(tuple, w.collect()))
    assert got_a == got_w
    # and the survivor per key is a NaN row (NaN outranks all doubles)

    assert all(r[1] == "NaN" for r in got_a)


def test_sequence_number_bucketed_equals_window(spark):
    """W2 robust sibling (r10 VERDICT ask #3): per-(key, bucket) local
    row_number + prefix-sum offsets must equal the plain per-key
    ROW_NUMBER window — swept across seeds, with a marathon key spanning
    many buckets, exact bucket-boundary timestamps, and tie rows."""
    import datetime as dt
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    for seed in (11, 47):
        rng = random.Random(seed)
        base = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(600):
            key = 7 if rng.random() < 0.3 else rng.randrange(6)
            ts = base + dt.timedelta(
                days=rng.randrange(8), seconds=rng.randrange(86_400)
            )
            rows.append((key, ts, i))
        # exact midnight boundaries + duplicate timestamps (tiebreaker path)
        mid = dt.datetime(2024, 1, 5)
        rows += [(3, mid, 9_000), (3, mid, 9_001), (3, mid + dt.timedelta(days=1), 9_002)]
        df = spark.createDataFrame(rows, "k long, ts timestamp, eid long")
        w = Window.partitionBy("k").orderBy("ts", "eid")
        want = df.withColumn("seq", F.row_number().over(w).cast("long"))
        got = agg.sequence_number_bucketed(
            df, "k", "ts", tiebreakers=["eid"], out_col="seq", bucket="1 day"
        )
        assert sorted(map(tuple, want.collect())) == sorted(
            map(tuple, got.collect())
        ), f"seed={seed}"


def test_sequence_number_bucketed_null_ts_first(spark):
    """NULL order values sort FIRST in both forms (Spark ASC default),
    via the sentinel bucket in the robust form; NULL KEYS survive as
    their own partition exactly like the window form (r11 review: the
    plain offsets equi-join silently dropped them — eqNullSafe now)."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    rows = [
        (1, dt.datetime(2024, 2, 1), 3),
        (1, None, 1),
        (1, None, 2),
        (1, dt.datetime(2024, 2, 9), 4),
        (2, None, 5),
        (None, dt.datetime(2024, 2, 2), 6),  # NULL key: its own partition
        (None, dt.datetime(2024, 2, 3), 7),
        (None, None, 8),  # NULL key AND NULL ts
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, eid long")
    w = Window.partitionBy("k").orderBy(F.col("ts").asc_nulls_first(), "eid")
    want = df.withColumn("seq", F.row_number().over(w).cast("long"))
    got = agg.sequence_number_bucketed(
        df, "k", "ts", tiebreakers=["eid"], out_col="seq", bucket="1 day"
    )
    assert sorted(map(tuple, want.collect()), key=repr) == sorted(
        map(tuple, got.collect()), key=repr
    )


def test_keep_latest_agg_requires_orderable_columns(spark):
    """Documented type restriction (r10 ADVICE): keep_latest_agg packs
    every payload column into the max(struct) comparator, so a
    map-typed column is rejected at analysis time — while the window
    form, which only ORDERS by (order_col, ties), handles it fine."""
    import pytest as pt
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k long, ts long, v string"
    ).withColumn("attrs", F.create_map(F.lit("src"), F.col("v")))
    got = keep_latest(df, ["k"], "ts").select("k", "v").collect()
    assert sorted((r.k, r.v) for r in got) == [(1, "b"), (2, "c")]
    with pt.raises(AnalysisException):
        keep_latest_agg(df, ["k"], "ts").collect()


def test_sessionize_bucketed_equivalence_multi_seed(spark):
    """The single-seed equivalence test, swept across seeds and
    (gap, bucket) shapes — including bucket == gap, the tightest legal
    configuration, where a session can span MANY consecutive buckets."""
    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    for seed, gap, bucket in [
        (101, "30 minutes", "30 minutes"),
        (202, "30 minutes", "2 hours"),
        (303, "1 hour", "1 day"),
    ]:
        df = spark.createDataFrame(
            _session_rows(seed, 400),
            "user_id long, ts timestamp, value double, event_id long",
        )
        one = agg.sessionize(
            df, "user_id", "ts", gap=gap,
            aggs=[F.count("*").alias("n_events")],
        )
        buck = agg.sessionize_bucketed(
            df, "user_id", "ts", gap=gap, bucket=bucket,
            partial_aggs=[F.count("*").alias("n_events")],
            tiebreakers=["event_id"],
        )
        a = sorted(map(tuple, one.collect()))
        b = sorted(map(tuple, buck.collect()))
        assert a == b, f"seed={seed} gap={gap} bucket={bucket}"


def _seq_frame(spark, n=600, hot_share=0.3, seed=23):
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        key = 9 if rng.random() < hot_share else rng.randrange(12)
        ts = base + dt.timedelta(
            days=rng.randrange(6), seconds=rng.randrange(86_400)
        )
        rows.append((key, ts, i))
    rows.append((None, base, 10_000))  # NULL key survives routing
    rows.append((None, None, 10_001))  # NULL key AND NULL ts
    return spark.createDataFrame(rows, "k long, ts timestamp, eid long")


def test_sequence_hybrid_equals_window_across_routing_regimes(spark):
    """r11 VERDICT #1: the heat-routed hybrid must equal the plain
    window in EVERY routing regime — mixed hot/cold split, all-cold
    (no key over threshold), and the all-bucketed fallback (more hot
    keys than the literal-list cap)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    df = _seq_frame(spark)
    w = Window.partitionBy("k").orderBy(F.col("ts").asc_nulls_first(), "eid")
    want = sorted(
        map(tuple, df.withColumn("seq", F.row_number().over(w).cast("long"))
            .collect()),
        key=repr,
    )
    regimes = {
        # hot key 9 (~30% of rows) routes bucketed, the rest window
        "mixed": dict(hot_multiple=2.0, straggler_task_multiple=0.0),
        # nothing exceeds 1000x the mean: pure window path
        "all_cold": dict(hot_multiple=1000.0, straggler_task_multiple=0.0),
        # every key "hot" but the cap is 0: all-bucketed fallback
        "fallback": dict(
            hot_multiple=0.0, straggler_task_multiple=0.0, max_hot_keys=0
        ),
    }
    for name, kw in regimes.items():
        got = sorted(
            map(tuple, agg.sequence_number_hybrid(
                df, "k", "ts", tiebreakers=["eid"], out_col="seq", **kw
            ).collect()),
            key=repr,
        )
        assert got == want, f"regime={name}"


def test_sequence_hybrid_routes_only_hot_keys(spark):
    """The router's point: with a planted hot key and a discriminating
    threshold, the cold branch must be a plain window (no bucketed temp
    machinery) and the hot branch bucketed — verified on the physical
    plan: a mixed run contains BOTH a union and exactly one offsets
    join; an all-cold run contains neither."""
    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    df = _seq_frame(spark)
    mixed = agg.sequence_number_hybrid(
        df, "k", "ts", tiebreakers=["eid"],
        hot_multiple=2.0, straggler_task_multiple=0.0,
    )
    plan = mixed._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in plan
    cold = agg.sequence_number_hybrid(
        df, "k", "ts", tiebreakers=["eid"],
        hot_multiple=1000.0, straggler_task_multiple=0.0,
    )
    cold_plan = cold._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in cold_plan and "Join" not in cold_plan


def test_bucketed_forms_reject_temp_column_collisions(spark):
    """r11 ADVICE: an input already carrying an internal temp name would
    be silently overwritten and dropped — both bucketed forms must
    refuse it loudly."""
    import datetime as dt

    import pytest as pt

    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, 0)],
        "k long, ts timestamp, eid long, __bkt long",
    )
    with pt.raises(ValueError, match="__bkt"):
        agg.sequence_number_bucketed(df, "k", "ts", tiebreakers=["eid"])
    with pt.raises(ValueError, match="__bkt"):
        agg.sessionize_bucketed(df, "k", "ts")


def test_sequence_hybrid_sampled_heat_equals_window(spark):
    """r12: heat measured on a 50% seeded sample must still produce the
    exact window result — routing is a purely physical decision, so ANY
    sampled routing split is output-equivalent; what the test pins is
    that the sampled-units thresholds don't break either branch."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    df = _seq_frame(spark)
    w = Window.partitionBy("k").orderBy(F.col("ts").asc_nulls_first(), "eid")
    want = sorted(
        map(tuple, df.withColumn("seq", F.row_number().over(w).cast("long"))
            .collect()),
        key=repr,
    )
    got = sorted(
        map(tuple, agg.sequence_number_hybrid(
            df, "k", "ts", tiebreakers=["eid"], out_col="seq",
            hot_multiple=2.0, straggler_task_multiple=0.0,
            sample_fraction=0.5, min_sampled_rows=2,
        ).collect()),
        key=repr,
    )
    assert got == want


def test_sequence_hybrid_sampled_floor_blocks_poisson_flukes(spark):
    """``min_sampled_rows`` floors the sampled-units threshold: on a
    frame whose every key is far too small to straggle, a tiny sample
    with a high floor must route NOTHING — pure window plan, no Union,
    regardless of which rows the sample happened to keep."""
    from e_commerce_data_lakehouse_spark.operators import aggregates as agg

    df = _seq_frame(spark)
    out = agg.sequence_number_hybrid(
        df, "k", "ts", tiebreakers=["eid"],
        hot_multiple=0.0, straggler_task_multiple=0.0,
        sample_fraction=0.05, min_sampled_rows=1_000_000,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan and "Join" not in plan
