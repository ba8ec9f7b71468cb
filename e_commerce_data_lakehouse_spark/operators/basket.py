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
    # pair.  Persisted: both self-join sides read it (recomputing it per
    # side re-builds the item-count broadcast twice — measured ~1 s
    # slower at sf0.1 than the one-time persist).
    freq = tracked_persist(
        baskets.join(
            F.broadcast(
                item_cnt.filter(F.col("__icnt") >= min_support).select(
                    "__item"
                )
            ),
            "__item",
        )
    )
    a = freq.alias("a")
    b = freq.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__basket") == F.col("b.__basket"))
            & (F.col("a.__item") < F.col("b.__item")),
        )
        .groupBy(
            F.col("a.__item").alias("ia"), F.col("b.__item").alias("ib")
        )
        .agg(F.count("*").cast("long").alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= min_support)
    )
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
