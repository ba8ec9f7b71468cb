"""Physical-plan audits: the scale properties the engine promises must be
visible in the executed plan, not just asserted in docstrings.

Each check reads `.explain("formatted")` output: filters reach the parquet
scan (PushedFilters), projections prune the read schema (ReadSchema), small
dims broadcast, and no blocked similarity op ever degenerates into a
cartesian / nested-loop product.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from e_commerce_data_lakehouse_spark import entry_queries as eq

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = eq.QUERIES[name].spark_fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # nothing in the hot path falls out of the JVM into row-at-a-time Python
    assert "BatchEvalPython" not in plan


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(spark, "daily_revenue")
    # ReadSchema must carry only the two consumed columns, not all 5
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" in read and "o_totalprice" in read
    assert "o_orderstatus" not in read and "o_custkey" not in read


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "star_revenue_by_region")
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "CartesianProduct" not in plan


def test_date_key_lookup_broadcasts_dim_date(spark):
    plan = plan_of(spark, "date_key_lookup")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    ["near_dup_minhash_lsh", "near_dup_simhash", "near_dup_token_jaccard",
     "embedding_near_dup"],
)
def test_blocked_similarity_never_cartesian(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, f"{name} degenerated to all-pairs"


def test_topk_uses_heap_not_global_sort(spark):
    plan = plan_of(spark, "top_customers")
    assert "TakeOrderedAndProject" in plan


def test_q3_shape_topk_and_broadcast(spark):
    """Q3 shape: deterministic top-10 must plan as a bounded heap
    (TakeOrderedAndProject, not a global sort), the selective customer
    filter must broadcast, and both date filters must reach their scans."""
    plan = plan_of(spark, "shipping_priority_top10")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("PushedFilters: [") >= 2


def test_anti_and_semi_joins_plan_as_joins(spark):
    """J7 relationally: anti/semi joins must be real join operators (the
    reference diffs file sets driver-side, csv_to_deltalake_table.py:222)."""
    anti = plan_of(spark, "inactive_customers_1998")
    semi = plan_of(spark, "big_spender_customers")
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi
    # no distinct/aggregate needed after a semi join
    assert "HashAggregate" not in semi


def test_langid_scoring_join_is_broadcast(spark):
    """The learned profile (n_langs x 50 rows) must be the broadcast side of
    the scoring join — classification is map-side, never a corpus shuffle
    against the profile — and trigram extraction stays in codegen."""
    plan = plan_of(spark, "langid_predictions")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_fuzzy_decontamination_broadcasts_benchmark(spark):
    """The decontamination premise: the benchmark side is bounded, so the
    corpus must stream map-side through a broadcast join — a SortMergeJoin
    here would shuffle the 100 TB side."""
    plan = plan_of(spark, "fuzzy_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_containment_join_is_blocked_equi_join(spark):
    plan = plan_of(spark, "containment_dup_flags")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
