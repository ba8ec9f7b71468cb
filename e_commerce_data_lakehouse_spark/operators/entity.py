"""Entity-resolution primitives: blocked edit-distance candidate pairs.

The record-linkage problem in the reference's customer domain (find
same-entity rows whose names differ by typos) is quadratic if blocked
only on a low-cardinality key (nation has ~25 values, so the in-block
pair count grows with the SQUARE of the table — ~4.5e10 pairs at
gen-sf10, the one documented quadratic-by-contract skip left after r8).

The scale path here is the symmetric-delete neighborhood (the public
SymSpell technique; also the deletion-variant index of Boitsov's
"Indexing methods for approximate dictionary searching", JEA 2008):
two strings with Levenshtein distance <= k ALWAYS share at least one
string obtainable by deleting <= k characters from each —

    proof: fix an optimal alignment with s substitutions, i chars
    present only in a, d chars present only in b (s+i+d = ed <= k).
    Deleting a's s substituted + i unaligned chars (s+i <= k deletions)
    and b's s substituted + d unaligned chars (s+d <= k) both leave the
    common aligned subsequence — the same string.

so an equi-join on (block, deletion-variant) is a LOSSLESS candidate
generator, and the banded ``levenshtein(a, b, k)`` verify makes the
whole pipeline exact: same result set as the all-pairs block join, at
O(n · C(len, k)) linear row expansion instead of O(n²/blocks) pairs.
Unlike PassJoin-style segment blocking, a shared corporate prefix
("Customer#000...") does NOT degenerate the key: a deletion variant
retains nearly the whole string, so two names share one only when they
are genuinely close.

Reference parity: the exact form is `fuzzy_name_matches`
(entry_queries.py, nation-blocked + salted); this module is its
documented 100 TB sibling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants_sql(col: str, max_dist: int = 2) -> str:
    """SQL expression: all distinct strings from deleting up to
    ``max_dist`` (0, 1 or 2) characters of ``col`` — pure Catalyst
    sequence/transform/substring expressions, whole-stage codegen, no
    Python.  Built as a parsed SQL string because a 3-level nested
    lambda is ~50 py4j round-trips as Column objects (the driver-side
    construction trap documented in SCALING.md)."""
    if max_dist not in (0, 1, 2):
        raise ValueError("deletion_variants_sql supports max_dist in {0,1,2}")
    s = col
    parts = [f"array({s})"]
    if max_dist >= 1:
        parts.append(
            f"transform(sequence(1, greatest(length({s}), 1)), i -> "
            f"concat(substring({s}, 1, i - 1), "
            f"substring({s}, i + 1, length({s}))))"
        )
    if max_dist >= 2:
        parts.append(
            f"flatten(transform(sequence(1, greatest(length({s}) - 1, 1)), "
            f"i -> transform(sequence(i + 1, greatest(length({s}), i + 1)), "
            f"j -> concat(substring({s}, 1, i - 1), "
            f"substring({s}, i + 1, j - i - 1), "
            f"substring({s}, j + 1, length({s}))))))"
        )
    return f"array_distinct(concat({', '.join(parts)}))"


def edit_distance_pairs_blocked(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_dist: int = 2,
) -> DataFrame:
    """Exact within-block pairs with ``levenshtein(name_a, name_b) <=
    max_dist`` (id_a < id_b) — the deletion-neighborhood rework of the
    all-pairs block self-join.

    Plan shape (all linear in the table, no quadratic block):

    1. Explode each row into its deletion variants; the join key is an
       8-byte ``xxhash64(variant)`` (a hash collision can only ADD a
       candidate — the verify kills it — so hashing the key is lossless
       and shuffles longs instead of strings), with the original name
       carried alongside so the verify never re-joins the base table.
    2. Self-equi-join the variant stream on (blocks..., hash) with
       ``id_a < id_b`` and verify INLINE with the banded
       ``levenshtein(a, b, max_dist)`` (early-exit DP, -1 past the band;
       for survivors the banded value IS the exact distance).  Key
       cardinality is O(n·variants) and a key is shared only by
       near-identical names, so there is no Zipf head to salt — and no
       broadcast anywhere: on degenerate data (dense numeric suffixes)
       the RESULT itself is output-quadratic, and routing it through a
       name-lookup join invites the planner to broadcast an
       output-sized intermediate (the r9 sf10 find: >1 GiB broadcast
       abort).  A shuffle self-join keeps every stage linear in
       input + output.
    3. One distinct on verified (id_a, id_b) — the distance is
       deterministic per pair, so the dedupe is the only
       output-sized shuffle.

    Losslessness is the symmetric-delete pigeonhole (module docstring);
    the brute-force pytest and the unchanged exact oracle pin it.
    """
    variants = F.expr(deletion_variants_sql(name_col, max_dist))
    slim = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.col(name_col).alias("__name"),
        F.explode(variants).alias("__v"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.col("__name"),
        F.xxhash64("__v").alias("__vh"),
    )
    a = slim.alias("va")
    b = slim.alias("vb")
    cond = [F.col(f"va.{c}") == F.col(f"vb.{c}") for c in block_cols]
    cond.append(F.col("va.__vh") == F.col("vb.__vh"))
    cond.append(F.col(f"va.{id_col}") < F.col(f"vb.{id_col}"))
    d = F.levenshtein(
        F.col("va.__name"), F.col("vb.__name"), max_dist
    ).cast("int")
    return (
        a.join(b, cond)
        .select(
            F.col(f"va.{id_col}").alias("id_a"),
            F.col(f"vb.{id_col}").alias("id_b"),
            d.alias("edit_distance"),
        )
        .filter(
            (F.col("edit_distance") >= 0)
            & (F.col("edit_distance") <= max_dist)
        )
        .dropDuplicates(["id_a", "id_b"])
    )
