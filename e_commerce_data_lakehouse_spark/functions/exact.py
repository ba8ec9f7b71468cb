"""Deterministic (order-insensitive) aggregate helpers.

The reference stores money as ``double`` (SURVEY §1.2 — it has no
DecimalType anywhere) and aggregates it with plain ``sum``/``avg``.  A naive
double sum is NOT reproducible across engines or even across runs: Spark adds
partial sums in shuffle-arrival order, the oracle adds sequentially, and IEEE
addition is not associative.  At 100 TB the partial-sum tree is thousands
deep and the drift is real.

Fix: aggregate through an exact decimal, then cast the *final* scalar back to
double.  Decimal addition is associative, so the result is bit-identical
regardless of partitioning/parallelism — the property the DuckDB hash-match
oracle needs, and the property a re-run on a different cluster layout needs.

The same expressions are mirrored in the oracle SQL strings
(``__spark_entry__.oracle_sql``), so both engines compute the identical
decimal arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# enough integer headroom for 100 TB-scale sums of 2-dp money values
MONEY_DEC = "decimal(30,2)"
VALUE_DEC = "decimal(30,6)"


def dsum(col: Column | str, dec: str = VALUE_DEC) -> Column:
    """Order-insensitive sum of a double column via exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(dec)).cast("double")


def sum_money(col: Column | str) -> Column:
    """sum() of a 2-decimal money double, reproducible across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY_DEC)).cast("double")


def avg_money(col: Column | str, scale: int = 6) -> Column:
    """avg() of a money double: exact decimal sum cast to double, one double
    division by the count, then round — a single, order-independent float op,
    identical in Spark and DuckDB (decimal *division* rules differ between
    engines, so we deliberately divide in double space)."""
    c = F.col(col) if isinstance(col, str) else col
    dec_sum = F.sum(c.cast(MONEY_DEC)).cast("double")
    return F.round(dec_sum / F.count(c), scale)


def idiv(num: Column, den: Column) -> Column:
    """Exact integral division of NON-NEGATIVE longs in the Column API
    (which has no ``div`` operator): ``(num - pmod(num, den)) / den``.
    The adjusted numerator is exactly divisible, so the double division
    is exact — valid while ``num < 2^53`` (callers document their bound).
    For wider operands build the expression with ``F.expr('a div b')``.
    """
    return ((num - F.pmod(num, den)) / den).cast("long")


def idiv_half_up(num: Column, den: Column) -> Column:
    """round_half_up(num/den) for non-negative longs, exactly:
    ``(2·num + den) div (2·den)``.  Same ``2·num < 2^53`` bound as
    :func:`idiv`.  This is the engine-portable replacement for
    ``ROUND(double, k)`` on a rational value: rounding a DOUBLE is not
    portable within 1 ulp of a decimal boundary (the r9 gen-sf1 oracle
    gate caught Spark 0.833437 vs DuckDB 0.833438), while integer
    arithmetic is bit-identical everywhere."""
    return idiv(2 * num + den, 2 * den)


def sql_sum_money(expr: str) -> str:
    """Oracle-side (DuckDB) rendering of :func:`sum_money`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,2))) AS DOUBLE)"


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


def sql_avg_money(expr: str, scale: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(30,2))) AS DOUBLE)"
        f" / COUNT({expr}), {scale})"
    )
