"""Set operators: schema-conformed unions (U1).

The reference unions three per-domain activity DataFrames positionally after
hand-aligning select lists with typed ``lit(None)`` padding
(``create_global_dw.py:196-253``) — fragile to column order (SURVEY §7.4-5).
We conform by *name*: compute the union schema, pad each input with typed
nulls, and ``unionByName``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_conform(dfs: list[DataFrame]) -> DataFrame:
    """Union DataFrames by name, padding missing columns with typed nulls.

    Column types for pad columns are taken from the first DataFrame that has
    the column; conflicting types raise (explicit is better than positional
    coercion).
    """
    if not dfs:
        raise ValueError("union_conform needs at least one DataFrame")
    types: dict[str, str] = {}
    order: list[str] = []
    for df in dfs:
        for f in df.schema.fields:
            if f.name in types:
                if types[f.name] != f.dataType.simpleString():
                    raise TypeError(
                        f"conflicting types for column {f.name!r}: "
                        f"{types[f.name]} vs {f.dataType.simpleString()}"
                    )
            else:
                types[f.name] = f.dataType.simpleString()
                order.append(f.name)
    out = None
    for df in dfs:
        have = set(df.columns)
        conformed = df.select(
            *[
                F.col(c) if c in have else F.lit(None).cast(types[c]).alias(c)
                for c in order
            ]
        )
        out = conformed if out is None else out.unionByName(conformed)
    return out
