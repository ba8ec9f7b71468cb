"""The declared query inventory: Spark implementation + DuckDB oracle SQL.

Each ``Query`` pairs a Spark-first implementation (built on the operator
library) with the equivalent ANSI SQL the DuckDB oracle runs on the same
parquet tables.  Column names and value arithmetic are aligned exactly —
see ``functions/exact.py`` for why aggregates go through decimals.

Queries whose semantics depend on Spark-internal hash functions (MinHash /
SimHash blocking) have ``oracle=None`` → the driver records a rows-only
check for those.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.catalog import testdata_catalog
from e_commerce_data_lakehouse_spark.functions.exact import (
    avg_money,
    sql_avg_money,
    sql_sum_money,
    sum_money,
)
from e_commerce_data_lakehouse_spark.operators import (
    aggregates as agg,
)
from e_commerce_data_lakehouse_spark.operators import dedup as dd
from e_commerce_data_lakehouse_spark.operators import joins as jn
from e_commerce_data_lakehouse_spark.operators import topk as tk

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    spark_fn: SparkFn
    oracle: str | None


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None):
    def deco(fn: SparkFn) -> SparkFn:
        QUERIES[name] = Query(spark_fn=fn, oracle=oracle)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load testdata tables with engine session settings applied.

    Settings are applied at runtime so this works inside the driver's own
    SparkSession: UTC timestamps (deterministic, matches the DuckDB oracle)
    and nanos-as-long for the events table (its parquet uses TIMESTAMP(NANOS)
    which Spark has no native type for; we truncate to micros exactly like
    DuckDB does).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cat = testdata_catalog(spark, sf_dir)
    out = {}
    for n in names:
        df = cat.load(n)
        if n == "events":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        out[n] = df
    return out


# ---------------------------------------------------------------------------
# Core analytics (SURVEY §2.2-2.6 over the TPC-H-ish tables)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       {sql_sum_money('l_quantity')} AS sum_qty,
       {sql_sum_money('l_extendedprice')} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
           AS sum_disc_price,
       {sql_avg_money('l_quantity')} AS avg_qty,
       {sql_avg_money('l_extendedprice')} AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + pushed-down range filter + hash aggregate
    (A1/A3/A4, P4, P7).  Filter reaches the parquet scan (PushedFilters)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_money("l_quantity").alias("sum_qty"),
            sum_money("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            avg_money("l_quantity").alias("avg_qty"),
            avg_money("l_extendedprice").alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "daily_revenue",
    f"""
SELECT CAST(o_orderdate AS DATE) AS order_date,
       {sql_sum_money('o_totalprice')} AS revenue,
       COUNT(*) AS n_orders,
       {sql_avg_money('o_totalprice')} AS avg_order_value
FROM orders
GROUP BY 1
""",
)
def daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: daily operational rollup (``create_global_dw.py:279-287``)."""
    orders = load(spark, sf_dir, "orders")["orders"]
    return (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            sum_money("o_totalprice").alias("revenue"),
            F.count("*").alias("n_orders"),
            avg_money("o_totalprice").alias("avg_order_value"),
        )
    )


@register(
    "star_revenue_by_region",
    f"""
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       {sql_sum_money('o.o_totalprice')} AS revenue,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o.o_custkey) AS n_customers
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
)
def star_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3 star join: fact ⋈ dims with explicit broadcast of the small
    dimensions (nation/region); customer joins via AQE (shuffle hash /
    sort-merge at scale — never broadcast a 100 TB-side dim)."""
    t = load(spark, sf_dir, "orders", "customer", "nation", "region")
    fact = t["orders"].join(
        t["customer"], t["orders"].o_custkey == t["customer"].c_custkey
    )
    starred = jn.star_join(
        fact,
        [
            (t["nation"], fact.c_nationkey == t["nation"].n_nationkey, "inner"),
            (
                t["region"],
                t["nation"].n_regionkey == t["region"].r_regionkey,
                "inner",
            ),
        ],
    )
    return (
        starred.groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            sum_money("o_totalprice").alias("revenue"),
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "top_customers",
    f"""
SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
       {sql_sum_money('o.o_totalprice')} AS total_spent,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
ORDER BY total_spent DESC, customer_id ASC
LIMIT 10
""",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 top-N (``explore_global_dw_aggregates.py:36-64``) with a
    deterministic tiebreaker; compiles to TakeOrderedAndProject (heap, no
    global sort)."""
    t = load(spark, sf_dir, "orders", "customer")
    per_cust = (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .groupBy(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
        )
        .agg(
            sum_money("o_totalprice").alias("total_spent"),
            F.count("*").alias("n_orders"),
        )
    )
    return tk.top_n(per_cust, "total_spent", 10, tiebreakers=["customer_id"])


@register(
    "dedup_latest_events",
    """
SELECT user_id, event_type, event_id, ts, value
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type
    ORDER BY ts DESC, event_id DESC) = 1
""",
)
def dedup_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 dedup-keep-latest (``iot_bronze_to_silver.py:178-205``) with the
    deterministic tiebreaker the reference lacks (SURVEY §7.4-4)."""
    ev = load(spark, sf_dir, "events")["events"]
    return dd.keep_latest(
        ev, ["user_id", "event_type"], "ts", tiebreakers=["event_id"]
    ).select("user_id", "event_type", "event_id", "ts", "value")


@register(
    "hourly_device_health",
    """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value), 6)
           AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       COUNT(*) AS n_readings,
       MAX(ts) AS last_reading_in_window
FROM events
GROUP BY 1, 2
""",
)
def hourly_device_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/A3: tumbling 1-hour multi-aggregate — the IoT device-health shape
    (``silver_to_gold_iot_sensors.py:98-116``), streaming-capable."""
    ev = load(spark, sf_dir, "events")["events"]
    return agg.hourly_health(ev, "ts", ["event_type"], "value")


@register(
    "customer_360",
    """
SELECT user_id,
       SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
       SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
       SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
       SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(30,6))
                ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE) AS purchase_value,
       SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 3
         + SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * 2
         + SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 1
         AS customer_score
FROM events
GROUP BY user_id
""",
)
def customer_360(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6 conditional aggregation + weighted score
    (``create_global_dw.py:362-381``)."""
    ev = load(spark, sf_dir, "events")["events"]
    return agg.customer_360(ev)


@register(
    "event_type_share",
    """
SELECT event_type, COUNT(*) AS n,
       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 2) AS pct
FROM events
GROUP BY event_type
""",
)
def event_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/W3 percentage-of-total via unbounded window
    (``csv_bronze_to_silver.py:333-341``)."""
    ev = load(spark, sf_dir, "events")["events"]
    return agg.pct_of_total(ev, ["event_type"])
