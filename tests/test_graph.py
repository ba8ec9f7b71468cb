"""Connected-components operator (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.operators import graph as gr


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _comp_map(df):
    return {r["id"]: r["comp"] for r in df.collect()}


def test_two_components_and_min_labels(spark):
    e = _edges(spark, [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)])
    got = _comp_map(gr.connected_components(e))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges_with_pointer_doubling(spark):
    # A 40-vertex path: O(diameter) naive propagation would need 39 rounds;
    # pointer doubling must close it well inside max_iter.
    e = _edges(spark, [(i, i + 1) for i in range(40)])
    got = _comp_map(gr.connected_components(e, max_iter=10))
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_duplicate_and_reversed_edges_are_harmless(spark):
    e = _edges(spark, [(5, 6), (6, 5), (5, 6), (6, 7)])
    got = _comp_map(gr.connected_components(e))
    assert got == {5: 5, 6: 5, 7: 5}


def test_cluster_members_sizes(spark):
    e = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    rows = {
        r["id"]: (r["comp"], r["cluster_size"])
        for r in gr.cluster_members(e).collect()
    }
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 8: (7, 2)}


def test_dedup_by_components_keeps_reps_and_isolated(spark):
    df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in gr.dedup_by_components(df, "doc_id", pairs).collect()
    )
    # 2, 3, 8 are non-representative members; everything else survives.
    assert kept == [0, 1, 4, 5, 6, 7, 9]


def test_distributed_path_matches_driver_path(spark):
    """broadcast_threshold=0 forces the O(log n) shuffle rounds (the
    100 TB path); results must be identical to the driver union-find fast
    path on the same graph — chain, clique, isolated pair, dup edges."""
    pairs = (
        [(i, i + 1) for i in range(20)]           # chain 0..20
        + [(100, 101), (101, 102), (100, 102)]    # triangle
        + [(500, 501), (501, 500)]                # dup/reversed pair
    )
    e = _edges(spark, pairs)
    fast = _comp_map(gr.connected_components(e))
    dist = _comp_map(gr.connected_components(e, broadcast_threshold=0))
    assert fast == dist
    assert set(fast.values()) == {0, 100, 500}


def test_driver_path_long_chain(spark):
    e = _edges(spark, [(i, i + 1) for i in range(500)])
    got = _comp_map(gr.connected_components(e))
    assert set(got.values()) == {0} and len(got) == 501


def test_dedup_by_components_policy_keeps_best(spark):
    """Policy dedup keeps the best-ranked member per cluster (longest,
    ties -> min id), not the min id; isolated docs always survive."""
    df = spark.createDataFrame(
        [(i, (10 + i) if i != 2 else 99) for i in range(10)],
        "doc_id long, quality long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in gr.dedup_by_components_policy(
            df, "doc_id", pairs,
            [F.col("quality").desc(), F.col("doc_id").asc()],
        ).collect()
    )
    # cluster {1,2,3}: doc 2 has quality 99 -> survives (min-id would keep 1)
    # cluster {7,8}: tie-free, 8 has higher quality -> survives
    assert kept == [0, 2, 4, 5, 6, 8, 9]


def test_dedup_by_components_policy_min_id_equiv(spark):
    """With the ordering (id asc) the policy dedup must equal the min-id
    dedup exactly."""
    df = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 20, 2)] + [(25, 26), (26, 27)],
        "id_a long, id_b long",
    )
    a = sorted(
        r["doc_id"]
        for r in gr.dedup_by_components(df, "doc_id", pairs).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in gr.dedup_by_components_policy(
            df, "doc_id", pairs, [F.col("doc_id").asc()]
        ).collect()
    )
    assert a == b


def test_pagerank_fixed_known_graph(spark):
    """Exact integer PageRank on a hand-checkable graph: a 3-cycle plus a
    pendant vertex.  Invariants: determinism (bit-equal reruns), symmetry
    (the two cycle nodes not attached to the pendant tie exactly), and the
    attachment node outranks them."""
    from e_commerce_data_lakehouse_spark.operators.graph import pagerank_fixed

    und = [(1, 2), (2, 3), (1, 3), (3, 4)]  # triangle 1-2-3, pendant 4
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    got = {
        r["id"]: r for r in pagerank_fixed(edges, "src", "dst").collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["deg"] == 2 and got[3]["deg"] == 3 and got[4]["deg"] == 1
    # 1 and 2 are structurally identical -> identical fixed-point ranks
    assert got[1]["rank_fp"] == got[2]["rank_fp"]
    # the hub (3) collects the pendant's mass and outranks the others
    assert got[3]["rank_fp"] > got[1]["rank_fp"] > 0
    assert got[3]["rank_fp"] > got[4]["rank_fp"]
    # total mass stays within the flooring-loss bound of the unit scale
    total = sum(r["rank_fp"] for r in got.values())
    assert total <= 10**12
    assert total >= 10**12 - (len(got) + 2 * len(edges.collect())) * 6
    # bit-equal on rerun
    again = {
        r["id"]: r["rank_fp"]
        for r in pagerank_fixed(edges, "src", "dst").collect()
    }
    assert again == {k: v["rank_fp"] for k, v in got.items()}


def test_pagerank_fixed_empty_graph(spark):
    from e_commerce_data_lakehouse_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank_fixed(edges, "src", "dst").count() == 0


def test_incremental_cc_equals_full_recompute(spark):
    """Incremental merge over stored labels == full recompute over the
    union edge set, across the interesting cases: bridge between two old
    components, new-vertex chain, edge inside an old component, and a
    fully-new isolated pair."""
    from e_commerce_data_lakehouse_spark.operators.graph import (
        connected_components,
        connected_components_incremental,
    )

    old = [(1, 2), (2, 3), (10, 11), (20, 21)]
    new = [
        (3, 10),    # bridge: {1,2,3} merges with {10,11}
        (21, 20),   # inside an old component: no-op
        (11, 50),   # new vertex attaches to a merged component
        (50, 51),   # new-vertex chain continues
        (70, 71),   # fully-new isolated pair
    ]
    old_df = spark.createDataFrame(old, ["src", "dst"])
    new_df = spark.createDataFrame(new, ["src", "dst"])
    stored = connected_components(old_df, "src", "dst")
    inc = {
        r["id"]: r["comp"]
        for r in connected_components_incremental(
            stored, new_df, src="src", dst="dst"
        ).collect()
    }
    full = {
        r["id"]: r["comp"]
        for r in connected_components(
            old_df.union(new_df), "src", "dst"
        ).collect()
    }
    assert inc == full
    assert inc[50] == 1 and inc[11] == 1 and inc[71] == 70 and inc[20] == 20


def test_incremental_cc_empty_batch_and_empty_store(spark):
    from e_commerce_data_lakehouse_spark.operators.graph import (
        connected_components,
        connected_components_incremental,
    )

    old_df = spark.createDataFrame([(1, 2), (5, 6)], ["src", "dst"])
    stored = connected_components(old_df, "src", "dst")
    empty = spark.createDataFrame([], "src long, dst long")
    # empty batch: stored labels come back unchanged
    inc = {
        r["id"]: r["comp"]
        for r in connected_components_incremental(
            stored, empty, src="src", dst="dst"
        ).collect()
    }
    assert inc == {1: 1, 2: 1, 5: 5, 6: 5}
    # empty store: behaves like a from-scratch run on the batch
    empty_store = spark.createDataFrame([], "id long, comp long")
    inc2 = {
        r["id"]: r["comp"]
        for r in connected_components_incremental(
            empty_store, old_df, src="src", dst="dst"
        ).collect()
    }
    assert inc2 == {1: 1, 2: 1, 5: 5, 6: 5}


# ---------------------------------------------------------------------------
# Triangle counting (graph.triangle_counts)
# ---------------------------------------------------------------------------
def _tri(spark, edges):
    from e_commerce_data_lakehouse_spark.operators import graph as gr

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.vertex: r.n_triangles for r in gr.triangle_counts(df).collect()
    }


def test_triangle_single(spark):
    assert _tri(spark, [(1, 2), (2, 3), (1, 3)]) == {1: 1, 2: 1, 3: 1}


def test_triangle_square_no_diagonal(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == {}


def test_triangle_k4(spark):
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    # K4 has 4 triangles; each vertex sits in C(3,2) = 3 of them
    assert _tri(spark, edges) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_dedup_selfloop_and_reversed_edges(spark):
    # duplicates, reversed duplicates, and self-loops must not change counts
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    assert _tri(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_triangle_skewed_hub(spark):
    # star + one closing rim edge: hub has huge degree but only 1 triangle
    edges = [(0, i) for i in range(1, 30)] + [(1, 2)]
    assert _tri(spark, edges) == {0: 1, 1: 1, 2: 1}


# ---------------------------------------------------------------------------
# k-core decomposition (graph.kcore)
# ---------------------------------------------------------------------------
def test_kcore_known_graph(spark):
    # K4 on {1,2,3,4} plus a pendant path 4-5-6: the 3-core is exactly the
    # K4 (degrees 3), found after peeling 6 (deg 1) then 5 (deg 1).
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = _edges(spark, k4 + [(4, 5), (5, 6)])
    got = {r["vertex"]: r["core_degree"] for r in gr.kcore(e, k=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_empty_when_overdemanding(spark):
    # a tree has no 2-core
    e = _edges(spark, [(1, 2), (1, 3), (2, 4), (2, 5)])
    assert gr.kcore(e, k=2).count() == 0


def test_kcore_cascade_peel(spark):
    # chain of triangles sharing single cut vertices: 2-core keeps all
    # triangle vertices; 3-core is empty (every vertex has degree <= 4 but
    # triangles alone can't sustain min-degree 3 after peeling starts).
    tri = []
    for t in range(4):
        a, b, c = 3 * t + 1, 3 * t + 2, 3 * t + 3
        tri += [(a, b), (b, c), (a, c)]
        if t:
            tri.append((3 * t, a))  # bridge from previous triangle
    e = _edges(spark, tri)
    core2 = {r["vertex"] for r in gr.kcore(e, k=2).collect()}
    assert core2 == set(range(1, 13))
    assert gr.kcore(e, k=3).count() == 0


def test_kcore_min_degree_invariant(spark):
    # circulant C20(1,2) (every vertex degree 4) survives k=3 whole; the
    # attached pendant chain peels away.  Every surviving vertex keeps
    # within-core degree >= k, and re-running is deterministic.
    n = 20
    pairs = [(i, (i + d) % n) for i in range(n) for d in (1, 2)]
    pairs += [(0, 100), (100, 101), (101, 102)]
    e = _edges(spark, pairs)
    rows = sorted(
        (r["vertex"], r["core_degree"]) for r in gr.kcore(e, k=3).collect()
    )
    assert [v for v, _ in rows] == list(range(n))
    assert all(d == 4 for _, d in rows)
    again = sorted(
        (r["vertex"], r["core_degree"]) for r in gr.kcore(e, k=3).collect()
    )
    assert rows == again
