"""Vector/embedding functions: cosine similarity, dot product, norms.

Implemented as Catalyst higher-order functions (``zip_with`` +
``aggregate``) over ``array<float>`` columns cast to double — JVM-side,
codegen-friendly, no UDF.  The fold order inside one array is fixed
(left-to-right), so results are deterministic; final values are rounded
before they participate in ranking or hashing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, scale: int = 6) -> Column:
    """Rounded cosine similarity.  Rounding (default 1e-6) absorbs the
    associativity noise between engines so ranking and hash-matching are
    stable."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), scale)
