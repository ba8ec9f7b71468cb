"""dim_date generation (S19 / SURVEY §1.3 dim_date, 25 columns).

The reference builds dim_date with a driver-side Python loop over
``datetime``/``timedelta`` and ``spark.createDataFrame`` of the whole list
(``generate_dim_date.py:86-157``) — O(days) driver memory and zero
parallelism.  The engine generates it distributed:
``explode(sequence(start, end, interval 1 day))`` plus pure column
expressions for all 25 attributes, so a century of dates is still a
map-only job.

Column semantics match the reference exactly:
- ``date_key``: sequential from 1 at the range start (datediff+1 — same
  values as the reference's counter, ``generate_dim_date.py:89-121``);
- ``day_of_week``: 1=Sunday..7=Saturday (``generate_dim_date.py:102``);
- ``is_year_start``: day_of_year <= 15; ``is_year_end``: >= 350;
- season flags by meteorological month (Dec-Feb winter, etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_dim_date(
    spark: SparkSession, start: str, end: str
) -> DataFrame:
    """25-column date dimension over [start, end] (inclusive, 'YYYY-MM-DD')."""
    days = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), "
        "interval 1 day)) AS full_date"
    )
    d = F.col("full_date")
    doy = F.dayofyear(d)
    month = F.month(d)
    return days.select(
        (F.datediff(d, F.to_date(F.lit(start))) + 1).cast("int").alias("date_key"),
        d,
        F.year(d).cast("int").alias("year"),
        month.cast("int").alias("month"),
        F.dayofmonth(d).cast("int").alias("day"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "EEE").alias("day_name_short"),
        F.dayofweek(d).cast("int").alias("day_of_week"),
        doy.cast("int").alias("day_of_year"),
        F.weekofyear(d).cast("int").alias("week_of_year"),
        F.quarter(d).cast("int").alias("quarter"),
        F.concat(F.lit("Q"), F.quarter(d)).alias("quarter_name"),
        F.date_format(d, "yyyy-MM").alias("year_month"),
        F.concat(F.year(d), F.lit("-Q"), F.quarter(d)).alias("year_quarter"),
        F.dayofweek(d).isin(1, 7).alias("is_weekend"),
        month.isin(12, 1, 2).alias("is_winter"),
        month.isin(3, 4, 5).alias("is_spring"),
        month.isin(6, 7, 8).alias("is_summer"),
        month.isin(9, 10, 11).alias("is_autumn"),
        (F.dayofmonth(d) <= 15).alias("is_first_half_month"),
        (F.dayofmonth(d) == 1).alias("is_month_start"),
        (d == F.last_day(d)).alias("is_month_end"),
        (doy <= 15).alias("is_year_start"),
        (doy >= 350).alias("is_year_end"),
    )


def oracle_dim_date_sql(start: str, end: str) -> str:
    """DuckDB SQL producing the identical dim_date (oracle for hash-match).

    Dialect notes: DuckDB ``dayofweek`` is 0=Sunday (Spark's is 1=Sunday),
    hence the +1; ``weekofyear`` is ISO week in both engines; dayname /
    monthname literals agree.
    """
    return f"""
WITH days AS (
  SELECT CAST(gs AS DATE) AS full_date
  FROM generate_series(DATE '{start}', DATE '{end}', INTERVAL 1 DAY) t(gs)
)
SELECT
  CAST(datediff('day', DATE '{start}', full_date) + 1 AS INT) AS date_key,
  full_date,
  CAST(year(full_date) AS INT) AS year,
  CAST(month(full_date) AS INT) AS month,
  CAST(day(full_date) AS INT) AS day,
  monthname(full_date) AS month_name,
  dayname(full_date) AS day_name,
  strftime(full_date, '%a') AS day_name_short,
  CAST(dayofweek(full_date) + 1 AS INT) AS day_of_week,
  CAST(dayofyear(full_date) AS INT) AS day_of_year,
  CAST(weekofyear(full_date) AS INT) AS week_of_year,
  CAST(quarter(full_date) AS INT) AS quarter,
  'Q' || quarter(full_date) AS quarter_name,
  strftime(full_date, '%Y-%m') AS year_month,
  year(full_date) || '-Q' || quarter(full_date) AS year_quarter,
  dayofweek(full_date) IN (0, 6) AS is_weekend,
  month(full_date) IN (12, 1, 2) AS is_winter,
  month(full_date) IN (3, 4, 5) AS is_spring,
  month(full_date) IN (6, 7, 8) AS is_summer,
  month(full_date) IN (9, 10, 11) AS is_autumn,
  day(full_date) <= 15 AS is_first_half_month,
  day(full_date) = 1 AS is_month_start,
  full_date = last_day(full_date) AS is_month_end,
  dayofyear(full_date) <= 15 AS is_year_start,
  dayofyear(full_date) >= 350 AS is_year_end
FROM days
"""
