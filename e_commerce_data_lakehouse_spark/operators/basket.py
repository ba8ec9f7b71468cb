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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.caching import tracked_persist


# target per-task group count for the pair aggregate: ~1.5M (a, b, cnt)
# hash-table entries ≈ 75 MB — comfortably inside a per-core executor
# share, so the aggregate never falls back to sort-spill merging
_PAIR_GROUPS_PER_PARTITION = 1_500_000


def pairs_from_sets(
    sets: DataFrame,
    items_col: str,
    out_a: str = "item_a",
    out_b: str = "item_b",
    count_col: str = "n_groups",
) -> DataFrame:
    """Pair-count aggregate over PRE-BUILT per-group item sets (one row
    per group, ``items_col`` a sorted array) — the second half of
    :func:`cooccurrence_pairs`, exposed so callers that already hold the
    sets (the a-priori rule miner, anything reusing one persisted
    basket frame) skip rebuilding them.

    ``sets`` should be persisted by the caller: the exact pair total is
    first computed from the array sizes (one cheap O(groups) job) to
    size the pair aggregate's partitioning.  With a min-support-style
    workload most generated pairs are SINGLETON groups — map-side
    combine cannot shrink them, so the aggregate's hash table is ~the
    full pair count and the default partition count (32 in this repo's
    sessions) hands each task a multi-GB table that spills to
    sort-merge runs: the superlinearity the r6 gen-sf10 sweep measured
    (295 s).  Sizing partitions as ``total_pairs / 1.5M`` keeps every
    task's table in memory — committed re-measures (SCALE_BENCH.json):
    gen-sf1 6.1 → 3.7 s, gen-sf3 20.7 → 9.8 s warm, sf1→sf3 now ~2.7×
    for 3× data (~linear).
    """
    # integral `div`, not `/`: float division would accumulate the sum in
    # DOUBLE and lose exactness above ~2^53 pairs — the very regime this
    # sizing exists for
    total_pairs = (
        sets.select(F.size(items_col).alias("__s"))
        .agg(F.sum(F.expr("CAST(__s AS BIGINT) * (__s - 1) div 2")))
        .first()[0]
        or 0
    )
    pairs = sets.filter(F.size(items_col) >= 2).select(
        F.explode(
            F.expr(
                f"flatten(transform({items_col}, (x, i) ->"
                f" transform(slice({items_col}, i + 2, size({items_col})),"
                " y -> struct(x AS a, y AS b))))"
            )
        ).alias("__p")
    )
    keyed = pairs.select(
        F.col("__p.a").alias(out_a), F.col("__p.b").alias(out_b)
    )
    default = int(
        sets.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    nparts = int(math.ceil(total_pairs / _PAIR_GROUPS_PER_PARTITION))
    if nparts > default:
        # explicit numPartitions: AQE never coalesces it back, and the
        # following groupBy reuses the hash partitioning (no 2nd shuffle)
        keyed = keyed.repartition(nparts, out_a, out_b)
    return keyed.groupBy(out_a, out_b).agg(
        F.count("*").cast("long").alias(count_col)
    )


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
       (the second shuffle, identical to the join plan's last stage,
       partition-sized from the exact pair total: see
       :func:`pairs_from_sets`).

    Per-group fanout is (distinct items per group choose 2) — exactly the
    self-join's output volume, so skew behavior is unchanged; what
    disappears is the join's re-shuffle and compare work.  Measured on
    the co-purchase edge build at sf0.1: first-touch 5.1 → 3.5 s, warm
    parity (the removed shuffle is the part that grows with data — at
    gen-sf3 the downstream part_pagerank dropped 50.1 → 41.5 s warm).

    The per-group sets are persisted for the duration of the two jobs
    (pair-total sizing + the aggregate itself) — serialized storage,
    O(distinct line items) bytes.
    """
    sets = tracked_persist(
        df.groupBy(F.col(group_col).alias("__g")).agg(
            F.array_sort(F.collect_set(F.col(item_col))).alias("__items")
        )
    )
    return pairs_from_sets(sets, "__items", out_a, out_b, count_col)


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
    # ONE basket shuffle: collect_set both dedups repeat purchases (the
    # old explicit distinct was a second full shuffle of line-level data
    # for nothing) and yields the per-basket sets the pair stage reads
    sets = tracked_persist(
        df.groupBy(F.col(basket_col).alias("__basket")).agg(
            F.array_sort(F.collect_set(F.col(item_col))).alias("__items")
        )
    )
    # bounded scalar: total basket count enters the lift arithmetic as a
    # literal (one count job — the alternative 1-row cross join plans as a
    # BroadcastNestedLoopJoin, which the repo-wide plan sweep forbids)
    n_baskets = sets.count()
    item_cnt = tracked_persist(
        sets.select(F.explode("__items").alias("__item"))
        .groupBy("__item")
        .agg(F.count("*").cast("long").alias("__icnt"))
    )
    # a-priori prune: an item below min_support cannot be in a frequent
    # pair — but on dense retail data EVERY item clears min_support=2
    # (measured gen-sf10: 2M/2M items frequent), so the prune pass is
    # pure overhead there.  Probe the infrequent count (bounded scalar on
    # the persisted O(catalog) frame) and rebuild the sets only when the
    # prune actually removes something; pruning never changes the rule
    # output either way, so both branches hash identically.
    infreq = item_cnt.filter(F.col("__icnt") < min_support)
    if infreq.count() > 0:
        # persisted: pairs_from_sets runs TWO jobs over its input (the
        # pair-total sizing pass + the aggregate) — without this the
        # explode/anti-join/re-collect rebuild executes twice
        freq_sets = tracked_persist(
            sets.select("__basket", F.explode("__items").alias("__item"))
            # anti-join against the SMALL side: the infrequent list is
            # what shrinks as data grows, the frequent list tracks the
            # whole catalog
            .join(F.broadcast(infreq.select("__item")), "__item", "left_anti")
            .groupBy("__basket")
            .agg(F.array_sort(F.collect_set("__item")).alias("__items"))
        )
    else:
        freq_sets = sets
    pairs = pairs_from_sets(
        freq_sets, "__items", "ia", "ib", "pair_baskets"
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
