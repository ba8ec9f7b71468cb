"""Mergeable HLL distinct-count sketches: the exact-merge property that
makes them the scalable COUNT(DISTINCT) replacement."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.operators import aggregates as agg

SF = "/root/testdata/sf0.001"


def _events(spark):
    from e_commerce_data_lakehouse_spark import entry_queries as eq

    return eq.load(spark, SF, "events")["events"].withColumn(
        "d", F.to_date("ts")
    )


def test_sketch_merge_equals_direct(spark):
    """Union of per-day partial sketches must estimate EXACTLY the same as
    one sketch over all rows (HLL union is associative, not approximate-
    on-top-of-approximate)."""
    ev = _events(spark)
    daily = agg.sketch_distinct_rollup(ev, ["event_type", "d"], "user_id")
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in agg.sketch_union_estimate(daily, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in agg.sketch_union_estimate(
            agg.sketch_distinct_rollup(ev, ["event_type"], "user_id"),
            ["event_type"],
        ).collect()
    }
    assert merged == direct


def test_sketch_estimate_accuracy_and_storage(spark, tmp_path):
    ev = _events(spark)
    daily = agg.sketch_distinct_rollup(ev, ["d"], "user_id")
    # the sketch column survives a parquet round trip (binary) — the gold
    # storage shape for incremental maintenance
    p = str(tmp_path / "sketches")
    daily.write.parquet(p)
    stored = spark.read.parquet(p)
    est = agg.sketch_union_estimate(stored, []).collect()[0]["approx_distinct"]
    true = ev.select("user_id").distinct().count()
    assert abs(est - true) / true < 0.05


def test_percentile_approx_error_bound(spark):
    """GK-sketch percentiles must land within the 1/accuracy rank-error
    bound of the exact percentiles (they are the scale substitute for the
    exact global-sort path)."""
    from e_commerce_data_lakehouse_spark import entry_queries as eq

    o = eq.load(spark, "/root/testdata/sf0.01", "orders")["orders"]
    exact = o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.count("*").alias("n"),
    )
    raw = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx")
    )
    ex = {r["o_orderstatus"]: (r["p50"], r["n"]) for r in exact.collect()}
    for r in raw.collect():
        p50_exact, n = ex[r["o_orderstatus"]]
        # rank error <= n/accuracy; convert to a value tolerance by
        # comparing against the exact quantile neighbourhood: with
        # accuracy=10000 and n in the low thousands the sketch is exact.
        assert abs(r["p50_approx"] - p50_exact) <= max(
            1e-6, 0.02 * abs(p50_exact)
        )
    # the registry query (oracle-upgraded in r4) verifies the GK rank
    # bound in-engine and emits booleans — all must hold
    approx = eq.QUERIES["order_percentiles_approx"].spark_fn(
        spark, "/root/testdata/sf0.01"
    )
    for r in approx.collect():
        assert r["p25_ok"] and r["p50_ok"] and r["p75_ok"] and r["p99_ok"]


# ---------------------------------------------------------------------------
# Count-min sketch (aggregates.cms_cells / cms_estimates)
# ---------------------------------------------------------------------------
def test_cms_merge_equals_direct_and_overestimates(spark):
    """Cell-wise addition of two shard sketches == sketch of the union
    (the mergeable contract), and every estimate >= the true count."""
    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.operators import aggregates as ag

    rows = [(f"tok{i % 37}", 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "token string, n long")
    half_a = spark.createDataFrame(rows[:1000], "token string, n long")
    half_b = spark.createDataFrame(rows[1000:], "token string, n long")

    def counts(d):
        return d.groupBy("token").agg(F.sum("n").cast("long").alias("n"))

    direct = {
        (r.j, r.bucket): r.c for r in ag.cms_cells(counts(df)).collect()
    }
    merged: dict = {}
    for part in (half_a, half_b):
        for r in ag.cms_cells(counts(part)).collect():
            merged[(r.j, r.bucket)] = merged.get((r.j, r.bucket), 0) + r.c
    assert merged == direct

    cells = ag.cms_cells(counts(df))
    true = {r.token: r.n for r in counts(df).collect()}
    probes = spark.createDataFrame(
        [(t,) for t in true] + [("never-seen",)], "token string"
    )
    est = {
        r.token: r.cms_count
        for r in ag.cms_estimates(cells, probes).collect()
    }
    for t, n in true.items():
        assert est[t] >= n
    # an absent token can only be overestimated, never negative
    assert est["never-seen"] >= 0
