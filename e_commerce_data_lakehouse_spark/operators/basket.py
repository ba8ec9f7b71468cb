"""Market-basket association-rule mining.

Extends the co-occurrence primitive (``copurchase_part_pairs`` /
reference: the star schema's order->part fact,
``Pyspark Jobs/silver_to_gold_transactions.py`` gold layer) into the full
"frequently bought together" recommendation signal: directional rules
``antecedent -> consequent`` scored by support, confidence, and lift —
the a-priori 2-itemset pass every retail analytics stack ships.

Determinism: confidence and lift are emitted in exact integer
parts-per-million (``(x * 1_000_000) div y``) — no float division, so
Spark and DuckDB agree bit-for-bit and result hashes are stable under
any partitioning.

Scale shape (100 TB of order lines):
- The basket de-dup and the item-count table are single hash aggregates.
- The a-priori prune (drop items below ``min_support`` BEFORE pairing)
  bounds the self-join input: an item that cannot appear in a frequent
  pair never enters the pair generation.
- Pair generation is a SELF-EQUI-JOIN on the basket key — co-partitioned
  hash shuffle, never a cross join; per-basket fanout is (distinct items
  per basket choose 2), a small constant for retail orders.
- Item counts re-attach by broadcast (O(catalog) rows, not O(lines)).
- The BIGINT ppm arithmetic is exact while ``pair_count * n_baskets *
  1e6 < 2^63`` — beyond ~1e12 basket-pair products, widen to
  DECIMAL(38,0) on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.caching import tracked_persist


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    out_a: str = "item_a",
    out_b: str = "item_b",
    count_col: str = "n_groups",
) -> DataFrame:
    """Distinct co-occurring item pairs per group with group-support
    counts: one row per ``item_a < item_b`` with the number of groups
    (orders, baskets, sessions) containing both.

    This is the pair primitive under the co-purchase graph family
    (``copurchase_part_pairs`` / PageRank / triangles / k-core edges) and
    the a-priori pair stage.  The obvious plan — ``distinct`` on
    (group, item), SELF-EQUI-JOIN on group, pair aggregate — pays three
    wide shuffles of the line-level data (the distinct hashes on both
    columns, so the join re-shuffles both sides on the group key).  Here
    the same pair multiset is produced with TWO:

    1. ``groupBy(group).agg(collect_set(item))`` — one shuffle of
       (group, item) rows with map-side partial sets; the set also
       replaces the explicit distinct (repeat purchases collapse).
    2. pair expansion as an ARRAY EXPRESSION over the sorted set —
       ``(s[i], s[j]) for i < j`` via transform+slice+flatten, generated
       inside the scan stage, no join — then the (a, b) count aggregate
       (the second shuffle, identical to the join plan's last stage).

    Per-group fanout is (distinct items per group choose 2) — exactly the
    self-join's output volume, so skew behavior is unchanged; what
    disappears is the join's re-shuffle and compare work.  Measured on
    the co-purchase edge build at sf0.1: first-touch 5.1 → 3.5 s, warm
    parity (the removed shuffle is the part that grows with data — at
    gen-sf3 the downstream part_pagerank dropped 50.1 → 41.5 s warm).
    """
    sets = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.array_sort(F.collect_set(F.col(item_col))).alias("__items")
    )
    pairs = sets.filter(F.size("__items") >= 2).select(
        F.explode(
            F.expr(
                "flatten(transform(__items, (x, i) ->"
                " transform(slice(__items, i + 2, size(__items)),"
                " y -> struct(x AS a, y AS b))))"
            )
        ).alias("__p")
    )
    return pairs.groupBy(
        F.col("__p.a").alias(out_a), F.col("__p.b").alias(out_b)
    ).agg(F.count("*").cast("long").alias(count_col))


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Directional 2-item association rules with exact integer metrics.

    Returns one row per ordered rule ``(antecedent, consequent)`` whose
    unordered pair co-occurs in at least ``min_support`` baskets:
    ``pair_baskets``, ``antecedent_baskets``, ``consequent_baskets``,
    ``confidence_ppm`` = P(consequent | antecedent) and ``lift_ppm`` =
    confidence / P(consequent), both in integer parts-per-million.
    """
    baskets = tracked_persist(
        df.select(
            F.col(basket_col).alias("__basket"),
            F.col(item_col).alias("__item"),
        ).distinct()
    )
    # bounded scalar: total basket count enters the lift arithmetic as a
    # literal (one count job — the alternative 1-row cross join plans as a
    # BroadcastNestedLoopJoin, which the repo-wide plan sweep forbids)
    n_baskets = baskets.select("__basket").distinct().count()
    item_cnt = baskets.groupBy("__item").agg(
        F.count("*").cast("long").alias("__icnt")
    )
    # a-priori prune: an item below min_support cannot be in a frequent
    # pair.  Single consumer now (the pair stage reads it once — the old
    # self-join read it twice and needed a persist), so no cache.
    freq = baskets.join(
        F.broadcast(
            item_cnt.filter(F.col("__icnt") >= min_support).select(
                "__item"
            )
        ),
        "__item",
    )
    pairs = cooccurrence_pairs(
        freq, "__basket", "__item", "ia", "ib", "pair_baskets"
    ).filter(F.col("pair_baskets") >= min_support)
    rules = pairs.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "pair_baskets",
    ).unionByName(
        pairs.select(
            F.col("ib").alias("antecedent"),
            F.col("ia").alias("consequent"),
            "pair_baskets",
        )
    )
    ante = item_cnt.select(
        F.col("__item").alias("antecedent"),
        F.col("__icnt").alias("antecedent_baskets"),
    )
    cons = item_cnt.select(
        F.col("__item").alias("consequent"),
        F.col("__icnt").alias("consequent_baskets"),
    )
    return (
        rules.join(F.broadcast(ante), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .select(
            "antecedent",
            "consequent",
            "pair_baskets",
            "antecedent_baskets",
            "consequent_baskets",
            F.expr(
                "(pair_baskets * 1000000L) div antecedent_baskets"
            ).alias("confidence_ppm"),
            F.expr(
                f"(pair_baskets * {n_baskets}L * 1000000L)"
                " div (antecedent_baskets * consequent_baskets)"
            ).alias("lift_ppm"),
        )
    )


def association_rules_oracle(
    table: str, basket_col: str, item_col: str, min_support: int = 2
) -> str:
    """DuckDB rendering of :func:`association_rules` (same arithmetic)."""
    return f"""
WITH baskets AS (
  SELECT DISTINCT {basket_col} AS basket, {item_col} AS item FROM {table}
),
n AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM baskets),
icnt AS (SELECT item, COUNT(*)::BIGINT AS icnt FROM baskets GROUP BY item),
freq AS (
  SELECT b.basket, b.item FROM baskets b
  JOIN icnt ON icnt.item = b.item AND icnt.icnt >= {min_support}
),
pairs AS (
  SELECT a.item AS ia, b.item AS ib, COUNT(*)::BIGINT AS pair_baskets
  FROM freq a JOIN freq b
    ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_support}
),
rules AS (
  SELECT ia AS antecedent, ib AS consequent, pair_baskets FROM pairs
  UNION ALL
  SELECT ib AS antecedent, ia AS consequent, pair_baskets FROM pairs
)
SELECT r.antecedent, r.consequent, r.pair_baskets,
       ia.icnt AS antecedent_baskets,
       ic.icnt AS consequent_baskets,
       (r.pair_baskets * 1000000) // ia.icnt AS confidence_ppm,
       (r.pair_baskets * (SELECT n_baskets FROM n) * 1000000)
           // (ia.icnt * ic.icnt) AS lift_ppm
FROM rules r
JOIN icnt ia ON ia.item = r.antecedent
JOIN icnt ic ON ic.item = r.consequent
"""
