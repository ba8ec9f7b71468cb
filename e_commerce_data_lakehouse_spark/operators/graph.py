"""Distributed connected components over an edge list.

The dedup pipeline's missing last step: near-dup detection emits *pairs*
(``token_jaccard_pairs`` / ``minhash_lsh_pairs`` / ``simhash_pairs``), but a
corpus curator needs *clusters* — "these 5 documents are all the same page" —
so one representative can be kept and the rest dropped.  Pairs → clusters is
connected components.

Reference parity: the reference has no graph operator (its dedup is exact
``dropDuplicates`` only, e.g. ``Pyspark Jobs/csv_bronze_to_silver.py``); this
is part of the LLM-training-data extension surface.

Algorithm: iterative min-label propagation with pointer-doubling path
compression (the classic "hash-to-min" family — Rastogi et al., "Finding
Connected Components in Map-Reduce in Logarithmic Rounds").  Each round is

1. neighbour step  — ``comp[v] = min(comp[v], min over neighbours comp[u])``
2. compress step   — ``comp[v] = comp[comp[v]]`` (pointer doubling)

Both are plain shuffles (groupBy-min + equi-joins) that Catalyst runs with
map-side partial aggregation; pointer doubling makes long chains collapse in
O(log n) rounds instead of O(diameter).  Convergence is detected with one
scalar action per round (``sum(comp)`` is strictly decreasing until fixpoint
— labels only ever decrease), so the driver never collects data rows.

At 100 TB: rounds are O(log n); each round shuffles O(|E|) rows of two longs.
Near-dup graphs are sparse (|E| ≪ |V| after LSH banding), and every label
table is ``localCheckpoint``-ed so lineage stays O(1) instead of growing by
three joins per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected graph with the minimum vertex id
    reachable from it.

    ``edges`` holds one row per edge; vertex ids must be a numeric/orderable
    type.  Returns ``(id, comp)`` with one row per distinct vertex that
    appears in any edge.  Isolated vertices (no edges) are the caller's
    concern — they are their own component by definition and never need the
    propagation machinery.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # Distinct once up front: LSH emitters can produce the same pair from
    # several bands, and duplicate edges multiply every later shuffle.
    sym = sym.distinct().localCheckpoint(eager=True)

    comp = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )

    prev_sum = comp.agg(F.sum("comp")).first()[0]
    for _ in range(max_iter):
        # 1. neighbour min: smallest label among each vertex's neighbours.
        nb = (
            sym.join(comp, sym["dst"] == comp["id"])
            .groupBy("src")
            .agg(F.min("comp").alias("nb_comp"))
        )
        stepped = comp.join(nb, comp["id"] == nb["src"], "left").select(
            comp["id"],
            F.least(comp["comp"], F.coalesce(nb["nb_comp"], comp["comp"])).alias(
                "comp"
            ),
        )
        # 2. pointer doubling: comp = comp[comp].  Every label is itself a
        # vertex id present in the table, so the inner self-join is total.
        c2 = stepped.select(
            F.col("id").alias("id2"), F.col("comp").alias("comp2")
        )
        comp = (
            stepped.join(c2, stepped["comp"] == c2["id2"])
            .select(stepped["id"], F.col("comp2").alias("comp"))
            .localCheckpoint(eager=True)
        )
        cur_sum = comp.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return comp


def cluster_members(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """``(id, comp, cluster_size)`` for every vertex in any edge.

    ``comp`` is the cluster's minimum vertex id (a stable, deterministic
    representative — no nondeterministic ``first()``), so "keep one doc per
    cluster" is simply ``id == comp``.
    """
    comp = connected_components(edges, src, dst)
    w_sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    # Cluster count ≤ vertex count of the *pair* graph (small next to the
    # corpus); let AQE pick broadcast vs shuffle at runtime.
    return comp.join(w_sizes, "comp").select("id", "comp", "cluster_size")


def dedup_by_components(
    df: DataFrame, id_col: str, pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Drop every near-duplicate except one representative per cluster.

    Keeps rows of ``df`` whose id is either (a) not in any near-dup pair, or
    (b) the minimum id of its connected component.  The drop-list is the set
    of non-representative members — broadcast-sized in practice (duplicates
    are a small fraction of a curated corpus), applied as a left-anti join so
    the big table streams through one shuffle-free stage when the drop side
    broadcasts.
    """
    comp = connected_components(pairs, src, dst)
    losers = comp.filter(F.col("comp") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
