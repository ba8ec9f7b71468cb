"""Association-rule mining (operators/basket.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.operators import basket as bk


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket long, item long")


def _rules(df):
    return {
        (r["antecedent"], r["consequent"]): r.asDict() for r in df.collect()
    }


def test_known_rule_metrics(spark):
    # items 1,2 together in 2 of 4 baskets; item 1 in 3, item 2 in 2.
    df = _baskets(
        spark,
        [(10, 1), (10, 2), (20, 1), (20, 2), (30, 1), (30, 3), (40, 4)],
    )
    got = _rules(bk.association_rules(df, "basket", "item", min_support=2))
    assert set(got) == {(1, 2), (2, 1)}
    r12 = got[(1, 2)]
    # confidence(1->2) = 2/3, lift = (2*4)/(3*2) = 4/3
    assert r12["pair_baskets"] == 2
    assert r12["antecedent_baskets"] == 3
    assert r12["consequent_baskets"] == 2
    assert r12["confidence_ppm"] == 2 * 1_000_000 // 3
    assert r12["lift_ppm"] == 2 * 4 * 1_000_000 // (3 * 2)
    r21 = got[(2, 1)]
    # confidence(2->1) = 2/2 = 1, same lift (lift is symmetric)
    assert r21["confidence_ppm"] == 1_000_000
    assert r21["lift_ppm"] == r12["lift_ppm"]


def test_repeat_item_in_basket_counts_once(spark):
    # the same (basket, item) line twice must not inflate support
    df = _baskets(spark, [(1, 7), (1, 7), (1, 8), (2, 7), (2, 8)])
    got = _rules(bk.association_rules(df, "basket", "item", min_support=2))
    assert got[(7, 8)]["pair_baskets"] == 2
    assert got[(7, 8)]["antecedent_baskets"] == 2


def test_min_support_prunes_rare_pairs(spark):
    df = _baskets(spark, [(1, 1), (1, 2), (2, 1), (2, 3), (3, 3), (3, 4)])
    got = _rules(bk.association_rules(df, "basket", "item", min_support=2))
    # every pair co-occurs exactly once -> nothing survives support 2
    assert got == {}


def test_negative_association_lift_below_one(spark):
    # 2/10 joint vs 6/10 * 6/10 marginals -> lift = 20/36 < 1
    rows = []
    for i in range(6):
        rows.append((i, 1))
    for i in range(4, 10):
        rows.append((i, 2))
    df = _baskets(spark, rows)
    got = _rules(bk.association_rules(df, "basket", "item", min_support=2))
    assert got[(1, 2)]["lift_ppm"] == 2 * 10 * 1_000_000 // (6 * 6)
    assert got[(1, 2)]["lift_ppm"] < 1_000_000


def test_matches_duckdb_oracle(spark, tmp_path):
    import duckdb

    rows = [
        (b, i)
        for b in range(1, 30)
        for i in range(1, 8)
        if (b * 7 + i * 13) % 3 != 0
    ]
    df = _baskets(spark, rows)
    p = str(tmp_path / "b.parquet")
    df.write.parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    oracle = con.sql(
        bk.association_rules_oracle("t", "basket", "item", 2)
    ).fetchall()
    got = bk.association_rules(df, "basket", "item", min_support=2)
    assert sorted(map(tuple, got.collect())) == sorted(oracle)


def test_cooccurrence_pairs_equals_self_join_reference(spark):
    """The collect_set + array-expansion pair builder must produce the
    EXACT pair multiset of the textbook distinct→self-join→agg plan,
    including repeat items within a group (deduped), singleton groups
    (no pairs), and items appearing in many groups (summed support)."""
    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.operators import basket as bk

    rows = []
    # group 1: repeat purchase of item 5 (must dedup), 3 distinct items
    rows += [(1, 5), (1, 5), (1, 7), (1, 9)]
    # group 2: singleton (no pairs)
    rows += [(2, 7)]
    # group 3: shares the (5, 7) pair with group 1 (support 2)
    rows += [(3, 7), (3, 5)]
    # group 4: two items, reversed insertion order (sorting must fix)
    rows += [(4, 9), (4, 3)]
    df = spark.createDataFrame(rows, "g long, item long")

    got = {
        (r["item_a"], r["item_b"]): r["n_groups"]
        for r in bk.cooccurrence_pairs(df, "g", "item").collect()
    }

    op = df.distinct()
    a, b = op.alias("a"), op.alias("b")
    ref = {
        (r["ia"], r["ib"]): r["n"]
        for r in a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("ia"), F.col("b.item").alias("ib")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == ref
    assert got[(5, 7)] == 2          # cross-group support summed
    assert (5, 9) in got and (7, 9) in got
    assert all(x < y for (x, y) in got)   # canonical orientation
