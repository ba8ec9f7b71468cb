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
from pyspark.storagelevel import StorageLevel

# O(|E|)-sized checkpoints store SERIALIZED (still memory-preferred,
# disk-spillable): the DataFrame default materializes deserialized rows,
# and a few 10^7 edge rows of object overhead can overflow a small
# executor heap during the materializing job (observed: the 72M-row
# gen-sf3 co-purchase edge list OOMs an 8g local heap).  Serialized long
# pairs are several times smaller and evict to disk gracefully; per-round
# re-reads pay one cheap deserialization pass instead of holding the
# object graph live across the whole iteration.
_EDGE_CKPT = StorageLevel.MEMORY_AND_DISK

from e_commerce_data_lakehouse_spark.caching import tracked_persist


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """Label every vertex of the undirected graph with the minimum vertex id
    reachable from it.

    ``edges`` holds one row per edge; vertex ids must be a numeric/orderable
    type.  Returns ``(id, comp)`` with one row per distinct vertex that
    appears in any edge.  Isolated vertices (no edges) are the caller's
    concern — they are their own component by definition and never need the
    propagation machinery.

    Adaptive strategy: the deduped symmetric edge list is counted once (the
    same action that materializes its checkpoint).  At or below
    ``4 × broadcast_threshold`` edge rows — the size class of a broadcast
    join side (~64 MB of (long, long) rows at the default); a near-dup pair
    graph over even a huge corpus usually fits, |E| ≪ |V| — the bounded
    edge list is pulled to the driver and solved with union-find: the
    distributed rounds at that size are pure driver/job latency, and AQE
    cannot shortcut them itself because ``localCheckpoint`` leaves the
    label table as an RDD scan with unknown stats.  Above the ceiling the
    O(log n) shuffle rounds below run, unchanged — the 100 TB path.
    """
    comp, parent = _components_impl(
        edges, src, dst, max_iter, broadcast_threshold
    )
    if parent is not None:
        return _parent_frame(edges.sparkSession, parent, edges.schema[src].dataType)
    return comp


def _components_impl(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    broadcast_threshold: int,
) -> tuple[DataFrame | None, dict | None]:
    """Shared engine: returns ``(comp_df, None)`` from the distributed
    rounds, or ``(None, parent_dict)`` from the driver union-find fast path
    (so callers like :func:`cluster_members` can finish size bookkeeping
    driver-side instead of paying shuffle-stage latency on a tiny frame)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # Distinct once up front: LSH emitters can produce the same pair from
    # several bands, and duplicate edges multiply every later shuffle.
    # Lazy localCheckpoints throughout: lineage is still truncated, but the
    # materialization happens inside the round's convergence aggregate —
    # ONE job per round instead of two (eager checkpoint + agg), which at
    # small scale halves the per-round driver/job overhead (the dominant
    # cost of the whole query at sf0.1: VERDICT r3 #3) and at scale merely
    # fuses two passes into one.
    sym = sym.distinct().localCheckpoint(eager=False, storageLevel=_EDGE_CKPT)

    # ONE action materializes the checkpoint, sizes the graph AND fetches
    # the small-path edge list: a bounded limit-collect replaces the old
    # count-then-collect pair (two driver round trips over the same
    # checkpoint — pure job latency at small scale).  Two-stage probe: the
    # first fetch is capped at a SMALL prefix (64 Ki edges), so an
    # over-ceiling graph ships ~1 MB to the driver instead of the full
    # ceiling+1 rows (~4 M Row objects, hundreds of MB of wasted transfer
    # before the distributed rounds take over).  Only a mid-size graph —
    # bigger than the prefix but under the ceiling — pays a second collect,
    # and that one runs over the already-materialized checkpoint.
    ceiling = 4 * broadcast_threshold
    prefix = min(ceiling, 65_536)
    probe = sym.limit(prefix + 1).collect()
    if len(probe) <= prefix:
        return None, _driver_union_find(probe)
    if prefix < ceiling:
        probe = sym.limit(ceiling + 1).collect()
        if len(probe) <= ceiling:
            return None, _driver_union_find(probe)

    # Seed with round 1's neighbour step fused into the init: comp[v] =
    # min(v, min over neighbours u) — one shuffle that replaces both the
    # distinct-vertex projection AND the first loop iteration's join.
    comp = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("__m"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("__m")).alias("comp"),
        )
        .localCheckpoint(eager=False)
    )

    def label_sum(df: DataFrame):
        # decimal sum: overflow-proof at any vertex-id magnitude × count
        # (labels strictly decrease until fixpoint, so equal sums == done)
        return df.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]

    prev_sum = label_sum(comp)
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
            .localCheckpoint(eager=False)
        )
        cur_sum = label_sum(comp)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return comp, None


def _driver_union_find(rows) -> dict:
    """Small-graph fast path: union-find on the driver over a BOUNDED,
    already-collected edge list (the caller enforces the edge ceiling —
    the size class of a broadcast join side).  Returns the
    fully-compressed ``{id: comp}`` map.

    Union-by-min: both roots are already their sets' minima, so attaching
    the larger root under the smaller keeps every root == component min at
    all times — no second resolve pass.  Path compression keeps finds
    near-O(1).  This path exists because below broadcast size the
    distributed rounds are pure driver/job latency (measured ~0.45 s per
    round wrapping ~50 ms of real work at sf0.1, even with broadcast-hinted
    joins — VERDICT r3 #3); above the ceiling the shuffle rounds run
    instead, unchanged.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for row in rows:
        a, b = row[0], row[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    return {v: find(v) for v in parent}


def _parent_frame(spark, parent: dict, id_type, sizes: bool = False) -> DataFrame:
    from pyspark.sql import types as T

    fields = [
        T.StructField("id", id_type, False),
        T.StructField("comp", id_type, False),
    ]
    if sizes:
        from collections import Counter

        counts = Counter(parent.values())
        fields.append(T.StructField("cluster_size", T.LongType(), False))
        rows = [(v, c, counts[c]) for v, c in parent.items()]
    else:
        rows = list(parent.items())
    return spark.createDataFrame(rows, T.StructType(fields))


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping_pct: int = 85,
    iterations: int = 5,
    unit: int = 10**12,
    broadcast_threshold: int = 4_000_000,
) -> DataFrame:
    """PageRank with EXACT integer fixed-point arithmetic — the
    link-graph centrality web-corpus pipelines use for crawl
    prioritization and host-quality scoring (OPIC / Common Crawl host
    ranks), runnable over any edge list (here: a co-purchase graph).

    Why integers: float PageRank sums in shuffle-arrival order, so no two
    engines (or two runs) agree bit-for-bit.  Ranks here live in units of
    ``1/unit`` and every step is BIGINT arithmetic with integral division
    (``div``), making a fixed iteration count *bit-identical* in Spark
    and DuckDB — the rank update is

        r'(v) = ((100-d) * (unit div N)) div 100
                + (d * Σ_{u→v} (r(u) div deg(u))) div 100

    (mass lost to flooring is the determinism price — bounded by
    ``|V| + |E|`` units of ``1e-12`` per iteration, far below any ranking
    decision).  Dangling nodes cannot occur on a symmetrized graph (every
    vertex that appears is a ``src``); callers passing directed graphs
    should note sink mass simply evaporates, as in the uniform-teleport
    simplification.

    Scale shape: per iteration ONE join of the rank table onto the edge
    list, one map-side-combine sum on ``dst``, one left join back to the
    vertex set — O(|E|) rows of two longs per round, the textbook
    Pregel/GraphX plan expressed as DataFrame ops.  At or below
    ``broadcast_threshold`` vertices the per-round rank table is
    broadcast-hinted (checkpointed frames have unknown stats, so AQE
    cannot discover this itself — the CC operator documents the same
    blind spot), which keeps the checkpointed edge list scan-only: the
    per-round shuffle is then just the O(|E|)→O(|V|) partial-aggregated
    inflow sum.  The 4M default is ~200 MB of (id, deg, rank_fp) rows —
    a large but routine broadcast, and measured worth it well before
    the cap: at a 2M-vertex / 240M-edge co-purchase graph (gen-sf10)
    broadcasting beats the shuffle-join loop 137.8 s vs 160.8 s
    (A/B'd r10, same host/heap).  Above the threshold (a billion-host
    web graph) the same loop runs with shuffle joins, unchanged.  ``localCheckpoint`` (lazy)
    truncates lineage so the plan stays O(1) across iterations instead of
    growing three joins per round.  No convergence action: the iteration
    count is part of the operator's deterministic contract (an oracle
    must replay it exactly).
    """
    # checkpoint the edge list FIRST: it is consumed once per iteration
    # (plus the degree build), and its upstream plan is often expensive
    # (e.g. the co-purchase pair self-join) — without the checkpoint every
    # round would replay that plan (measured 10.2 s -> ~2 s at sf0.1)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False, storageLevel=_EDGE_CKPT)
    # degree table doubles as the vertex set (every vertex is a src on a
    # symmetrized graph); checkpointed — consumed every round
    deg = (
        e.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .select(F.col("src").alias("id"), "deg")
        .localCheckpoint(eager=False)
    )
    # bounded scalar: vertex count (also materializes deg AND the edge
    # checkpoint it reads through)
    n = deg.count()
    if n == 0:
        return deg.select(
            F.col("id"), "deg", F.lit(0).cast("long").alias("rank_fp")
        )
    r0 = unit // n
    base = ((100 - damping_pct) * r0) // 100
    hint = F.broadcast if n <= broadcast_threshold else (lambda df: df)
    ranks = deg.select("id", "deg", F.lit(r0).cast("long").alias("rank_fp"))
    for _ in range(iterations):
        inflow = (
            e.join(hint(ranks), e["src"] == ranks["id"])
            .select(
                F.col("dst"),
                F.expr("rank_fp div deg").alias("__share"),
            )
            .groupBy("dst")
            .agg(F.sum("__share").alias("__in"))
        )
        ranks = (
            deg.join(hint(inflow), deg["id"] == inflow["dst"], "left")
            .select(
                deg["id"],
                deg["deg"],
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(__in, 0L)) div 100"
                    )
                ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def cluster_members(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """``(id, comp, cluster_size)`` for every vertex in any edge.

    ``comp`` is the cluster's minimum vertex id (a stable, deterministic
    representative — no nondeterministic ``first()``), so "keep one doc per
    cluster" is simply ``id == comp``.
    """
    comp, parent = _components_impl(edges, src, dst, 25, 1_000_000)
    if parent is not None:
        # size bookkeeping finishes driver-side — a groupBy+join over the
        # tiny label frame costs ~0.7 s of pure shuffle-stage latency
        return _parent_frame(
            edges.sparkSession, parent, edges.schema[src].dataType, sizes=True
        )
    w_sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    # Cluster count ≤ vertex count of the *pair* graph (small next to the
    # corpus); let AQE pick broadcast vs shuffle at runtime.
    return comp.join(w_sizes, "comp").select("id", "comp", "cluster_size")


def connected_components_incremental(
    stored: DataFrame,
    new_edges: DataFrame,
    id_col: str = "id",
    comp_col: str = "comp",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Merge a batch of NEW edges into stored component labels without
    re-walking the old edge set — the graph-side completion of the
    incremental dedup story (``minhash_lsh_pairs_incremental`` produces
    batch-touching pairs; this op folds them into yesterday's clusters).

    ``stored`` is ``(id, comp)`` from a previous :func:`connected_components`
    run (labels = component-min ids).  Returns the labels of the merged
    graph for every stored vertex plus every new-edge endpoint —
    PROVABLY equal to a full recompute over (old ∪ new) edges: stored
    labels are component minima, so contracting each old component to its
    label and solving components over {labeled new edges} yields each
    merged component's global min, which the final relabel join applies.

    Scale shape: the contraction graph has O(|batch edges|) edges
    regardless of corpus size (corpus-side structure enters only through
    the already-stored labels), so the inner CC solve hits the
    driver/union-find fast path for any realistic daily batch; the
    relabel is one broadcast-able left join on ``comp`` against the
    stored table (only merged components change labels), and the old
    edge multiset — the expensive LSH/verify product — is never touched.
    """
    s = stored.select(F.col(id_col).alias("id"), F.col(comp_col).alias("comp"))
    # Checkpoint the batch edges FIRST: they are consumed by the
    # contraction CC, by the endpoint set, and (through the returned
    # frame) by every downstream consumer — without this the upstream
    # pair-generation plan (an LSH/verify product) replays per consumer
    # (profiled: 3 replays ≈ 2 s of the query's 4.9 s at sf0.1).
    e = new_edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False, storageLevel=_EDGE_CKPT)
    # label each endpoint with its stored component (unseen vertex -> own id)
    sa = s.select(F.col("id").alias("src"), F.col("comp").alias("__ca"))
    sb = s.select(F.col("id").alias("dst"), F.col("comp").alias("__cb"))
    contracted = (
        e.join(sa, "src", "left")
        .join(sb, "dst", "left")
        .select(
            F.coalesce("__ca", "src").alias("ca"),
            F.coalesce("__cb", "dst").alias("cb"),
        )
        .filter(F.col("ca") != F.col("cb"))
    )
    # components over the contraction: (old label -> merged root).  Keep
    # only labels that actually change — the broadcast side of the relabel.
    remap = (
        connected_components(contracted, "ca", "cb")
        .filter(F.col("comp") != F.col("id"))
        .select(F.col("id").alias("__old"), F.col("comp").alias("__new"))
    )
    ends = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    newv = ends.join(s, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    init = s.union(newv)
    return init.join(
        remap, init["comp"] == remap["__old"], "left"
    ).select(
        F.col("id").alias(id_col),
        F.coalesce("__new", "comp").alias(comp_col),
    )


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


def dedup_by_components_policy(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    order_by: list,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep the BEST member per near-dup cluster under a caller-supplied
    ordering (e.g. longest text, highest quality score) instead of the
    min-id representative of :func:`dedup_by_components`.

    Real corpus builds keep the canonical/highest-quality variant, not an
    arbitrary one: ``order_by`` is a list of Columns over ``df`` ranking
    cluster members best-first (make it total — break ties on the id — or
    the survivor is nondeterministic).

    Same scale shape as min-id dedup: components are computed on the pair
    graph only, the ranking window partitions by component over the
    (small) member set after a semi join, and the resulting drop-list is
    applied to the full table as one broadcast-able left-anti join — the
    100 TB side never reshuffles.
    """
    from pyspark.sql import Window

    comp = connected_components(pairs, src, dst)
    members = df.join(
        comp.select(F.col("id").alias(id_col), "comp"), id_col
    )
    w = Window.partitionBy("comp").orderBy(*order_by)
    losers = (
        members.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") > 1)
        .select(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts via degree-ordered edge orientation
    (Schank & Wagner 2005; the shape of every MapReduce/Spark triangle
    counter since "Graph Twiddling in a MapReduce World").

    Orient every undirected edge from its lower-(degree, id) endpoint to
    the higher one, enumerate directed wedges (two out-edges of one
    vertex), and close each wedge with an equi-join back to the oriented
    edge set.  The orientation is the entire scale story: out-degree is
    bounded by O(sqrt(m)) regardless of how skewed the raw degree
    distribution is, so the wedge intermediate is O(m^1.5) worst-case
    instead of sum-of-squared-degrees — the difference between a
    web-graph-sized job finishing and its hub vertex generating 10^12
    wedges on one partition.  Every step is an equi-join or hash
    aggregate; no cross product anywhere.

    ``edges`` are undirected, one row per edge, any orientation, self
    loops and duplicates tolerated (dropped / collapsed).  Returns
    (vertex, n_triangles) for vertices in >= 1 triangle; each triangle
    contributes once to each of its three corners.
    """
    # persist the dedup'd edge set: it feeds the symmetrized degree build
    # (twice, via the union) and both sides of the orientation join — an
    # unpersisted `e` replays its upstream plan (often an expensive pair
    # self-join, e.g. the co-purchase build) up to five times (guide §5:
    # cache what is reused and expensive; the 98-Exchange before-plan of
    # copurchase_triangles was mostly this recomputation)
    e = tracked_persist(
        edges.select(
            F.col(src_col).cast("long").alias("u"),
            F.col(dst_col).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .selectExpr("least(u, v) AS u", "greatest(u, v) AS v")
        .distinct()
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # vertex-sized; consumed by two orientation joins
    deg = tracked_persist(
        sym.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    )
    oriented = tracked_persist(
        e.join(deg.select(F.col("u"), F.col("d").alias("du")), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v"
        )
        .selectExpr(
            "IF(du < dv OR (du = dv AND u < v), u, v) AS s",
            "IF(du < dv OR (du = dv AND u < v), v, u) AS t",
            "IF(du < dv OR (du = dv AND u < v), dv, du) AS dt",
        )
    )
    w1 = oriented.selectExpr("s", "t AS t1", "dt AS dt1")
    w2 = oriented.selectExpr("s", "t AS t2", "dt AS dt2")
    wedges = w1.join(w2, "s").filter(
        (F.col("dt1") < F.col("dt2"))
        | ((F.col("dt1") == F.col("dt2")) & (F.col("t1") < F.col("t2")))
    )
    closed = wedges.join(
        oriented.selectExpr("s AS t1", "t AS t2"), ["t1", "t2"]
    )
    corners = closed.select(
        F.explode(F.array("s", "t1", "t2")).alias("vertex")
    )
    return corners.groupBy("vertex").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete every
    vertex of degree < ``k`` until none remains; return the surviving
    vertices with their within-core degree.  The classic density filter for
    graph-shaped curation (e.g. keep only products with robustly recurring
    co-purchase neighborhoods, drop the long tail of incidental pairs).

    The fixpoint is order-independent (the k-core is the unique maximal
    subgraph of min degree ≥ k), so the result is deterministic however the
    rounds are scheduled — which also makes it replayable by an unrolled
    SQL CTE peel (the driver oracle) as long as the unroll depth covers the
    actual round count.

    Scale shape: each round is one degree aggregation (groupBy-count with
    map-side combine) plus two anti-joins removing edges incident to peeled
    vertices.  The edge list is ``localCheckpoint``-ed per round so lineage
    stays O(1); the peeled-vertex set is materialized by the SAME count
    action that drives convergence, and gets a broadcast hint only when
    that count says it fits (checkpointed frames carry no stats, so AQE
    could not make that call itself — see the connected-components note).
    Rounds are bounded by the degeneracy ordering depth — O(log n) on
    power-law graphs in practice, ``max_iter`` as the hard stop.

    Small-graph fast path (same adaptive strategy and two-stage size probe
    as :func:`connected_components`): a bounded edge list peels on the
    driver in one pass — each distributed round otherwise costs pure
    driver/job latency (measured 2.3 s → sub-second at sf0.1 for a
    3.5k-edge graph).  The fixpoint is unique, so both paths return the
    identical result.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False, storageLevel=_EDGE_CKPT)
    )
    ceiling = 4_000_000
    prefix = min(ceiling, 65_536)
    probe = sym.limit(prefix + 1).collect()
    if len(probe) > prefix and prefix < ceiling:
        probe = sym.limit(ceiling + 1).collect()
    if len(probe) <= ceiling:
        return _driver_kcore(
            edges.sparkSession, probe, k, edges.schema[src].dataType
        )
    for _ in range(max_iter):
        deg = (
            sym.select(F.col("src").alias("v"))
            .groupBy("v")
            .agg(F.count("*").alias("c"))
        )
        bad = deg.filter(F.col("c") < k).select("v").localCheckpoint(eager=False)
        n_bad = bad.count()
        if n_bad == 0:
            break
        hint = F.broadcast if n_bad <= 1_000_000 else (lambda df: df)
        sym = (
            sym.join(
                hint(bad.select(F.col("v").alias("src"))), "src", "left_anti"
            )
            .join(hint(bad.select(F.col("v").alias("dst"))), "dst", "left_anti")
            .localCheckpoint(eager=False, storageLevel=_EDGE_CKPT)
        )
    return (
        sym.groupBy(F.col("src").alias("vertex"))
        .agg(F.count("*").cast("long").alias("core_degree"))
    )


def _driver_kcore(spark, rows, k: int, id_type) -> DataFrame:
    """Small-graph fast path: peel a BOUNDED, already-collected symmetric
    edge list on the driver (caller enforces the ceiling).  Same unique
    fixpoint as the distributed rounds."""
    from collections import defaultdict

    adj: dict = defaultdict(set)
    for r in rows:
        adj[r["src"]].add(r["dst"])
    live = set(adj)
    deg = {v: len(adj[v]) for v in live}
    while True:
        bad = [v for v in live if deg[v] < k]
        if not bad:
            break
        for v in bad:
            live.discard(v)
            del deg[v]
        for v in bad:
            for u in adj[v]:
                if u in live:
                    deg[u] -= 1
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("vertex", id_type, False),
            StructField("core_degree", LongType(), False),
        ]
    )
    return spark.createDataFrame(
        [(v, deg[v]) for v in sorted(live)], schema
    )
