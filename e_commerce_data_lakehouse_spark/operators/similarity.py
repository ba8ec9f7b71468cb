"""Similarity search over embedding columns (training-data pipeline op).

Two tiers, as a real 100 TB pipeline would have:

- :func:`brute_force_topk` — exact cosine top-k.  The query side is small
  and broadcast; the candidate side streams map-side (one pass, no shuffle of
  the big table); per-query top-k via window.  Correctness baseline.
- :func:`lsh_topk` — approximate: random-hyperplane (sign) LSH buckets both
  sides, candidates restricted to bucket collisions across several
  independent hash tables, then exact rerank of the survivors.  At scale the
  candidate join is an equi-join on (table_id, bucket) instead of an
  all-pairs product.

Hyperplanes are generated deterministically (seeded) driver-side — a few KB
— and folded into Catalyst expressions, so the scoring stays JVM-side.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.caching import tracked_persist

from e_commerce_data_lakehouse_spark.functions.vectors import (
    cosine,
    cosine_prenormed,
    dot,
    dot_fixed_sql,
    infer_dim,
    norm_fixed,
)


def _nearest_centroid(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c ||x - c||^2 via the GEMM identity ||x||^2+||c||^2-2x·c.
    The naive ``(x[:,None,:] - cents)**2`` broadcast materializes an
    n×k×dim tensor — 1.3 GB per 10k×250×64 batch and pure memory traffic;
    the GEMM form is one BLAS call for the same argmin."""
    d = (
        (x**2).sum(axis=1)[:, None]
        + (cents**2).sum(axis=1)[None, :]
        - 2.0 * (x @ cents.T)
    )
    return d.argmin(axis=1)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k: rank by (rounded sim desc, candidate id asc)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("int"))
    )


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    include_self: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` is broadcast (it must be the small side); the candidate table
    is scanned once with map-side scoring — the right exact-kNN plan shape
    for a huge candidate set.

    ``dim``: the vector dimension, when the caller already knows it —
    skips the one-row ``infer_dim`` probe job (composed operators like
    :func:`mmr_rerank` otherwise pay that bounded scalar job twice).
    """
    dim = dim or infer_dim(candidates, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_fixed(vec_col, dim).alias("__qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_fixed(vec_col, dim).alias("__cn"),
    )
    pairs = c.join(F.broadcast(q), how="cross")
    if not include_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    # unrolled fixed-dim cosine: the scoring loop IS this operator's cost.
    # Norms are precomputed per ROW above (n_q + n_c evaluations, not
    # n_q x n_c), so the pair stage holds one unrolled sum.
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_prenormed("__qv", "__cv", "__qn", "__cn", dim).alias(
            "cosine_sim"
        ),
    )
    return _topk_per_query(scored, k)


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def _bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """Vectorized sign-LSH bucketing: one numpy matmul per Arrow batch.

    An expression-tree version (n_tables*n_planes*dim literal columns) blows
    up codegen; a scalar pandas_udf with a (dim, tables*planes) constant
    matrix is ~100x less work per row and stays Arrow-batched.  The matrix is
    seeded/deterministic and a few KB — it ships inside the serialized UDF
    (the moral equivalent of a broadcast variable).
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.array(_hyperplanes(dim, n_planes, n_tables, seed))
    mat = planes.reshape(n_tables * n_planes, dim).T  # (dim, T*P)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        arr = np.stack(vecs.to_numpy()).astype(np.float64)  # (N, dim)
        signs = (arr @ mat) >= 0  # (N, T*P)
        bits = signs.reshape(len(arr), n_tables, n_planes)
        ids = (bits * weights).sum(axis=2)  # (N, T)
        return pd.Series(list(ids))

    return buckets


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    include_self: bool = False,
) -> DataFrame:
    """Approximate cosine top-k via multi-table sign-LSH + exact rerank."""
    bucketer = _bucket_udf(dim, n_planes, n_tables, seed)

    def with_buckets(df: DataFrame, idc: str, vc: str, nc: str) -> DataFrame:
        # norm per vector BEFORE the table explode (1 eval per vector,
        # not per (vector, table) row, and never per pair)
        out = df.select(
            F.col(idc), F.col(vc), norm_fixed(vc, dim).alias(nc)
        )
        return out.select(
            F.col(idc),
            F.col(vc),
            F.col(nc),
            F.posexplode(bucketer(F.col(vc))).alias("table_id", "bucket"),
        )

    qb = with_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "query_id",
        "__qv",
        "__qn",
    )
    cb = with_buckets(
        candidates.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        ),
        "neighbor_id",
        "__cv",
        "__cn",
    )
    cand = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .select("query_id", "neighbor_id", "__qv", "__cv", "__qn", "__cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if not include_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_prenormed("__qv", "__cv", "__qn", "__cn", dim).alias(
            "cosine_sim"
        ),
    )
    return _topk_per_query(scored, k)


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b) via LSH blocking +
    exact verify — the embedding analogue of MinHash fuzzy dedup."""
    bucketer = _bucket_udf(dim, n_planes, n_tables, seed)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        # per-ROW norm: n evaluations instead of n², and the verify stage
        # keeps one unrolled sum (inside Janino's 64 KB method limit even
        # after filter pushdown duplicates the cosine expression)
        norm_fixed(vec_col, dim).alias("__n"),
    )
    bl = base.select(
        "__id",
        "__v",
        "__n",
        F.posexplode(bucketer(F.col("__v"))).alias("table_id", "bucket"),
    )
    a, b = bl.alias("a"), bl.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__v").alias("__va"),
            F.col("b.__v").alias("__vb"),
            F.col("a.__n").alias("__na"),
            F.col("b.__n").alias("__nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            cosine_prenormed("__va", "__vb", "__na", "__nb", dim).alias(
                "cosine_sim"
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the classic index for billion-vector corpora
# ---------------------------------------------------------------------------
def _sample_vectors(
    candidates: DataFrame, vec_col: str, seed: int, sample_size: int
) -> np.ndarray:
    """Bounded training sample as a driver ndarray (ONE job).  Callers
    that train several models from the same sample (IVF-PQ: coarse
    centroids AND codebooks) should collect once and share.

    The draw is the ``sample_size`` rows smallest by seeded content hash
    — a uniform pseudo-random subset that is deterministic in
    (data, seed, sample_size) ALONE.  The previous
    ``sample(frac, seed).limit(n)`` draw was NOT: ``limit`` keeps
    whichever partitions answer first, so on multi-partition input the
    training set — and every centroid, cluster, and prune decision
    downstream — varied run to run (caught at gen-sf1: three
    ``semantic_dedup`` runs returned 5748/5731/5762 survivors).
    Hash-order top-K compiles to a per-partition heap (TakeOrdered):
    map-side O(sample_size) state, no shuffle, no count job — the same
    pass a billion-vector trainer runs."""
    sample = (
        candidates.select(vec_col)
        .orderBy(F.xxhash64(F.lit(seed), F.col(vec_col)))
        .limit(sample_size)
        .collect()
    )
    return np.array([r[0] for r in sample], dtype=np.float64)


def _train_centroids(
    candidates: DataFrame,
    vec_col: str,
    n_centroids: int,
    seed: int,
    sample_size: int,
    iters: int = 10,
    x: np.ndarray | None = None,
) -> np.ndarray:
    """k-means centroids from a bounded sample (how real IVF trainers work:
    training data is a sample regardless of corpus size, so driver memory is
    O(sample), never O(corpus)).  Pass ``x`` to reuse an already-collected
    sample (skips the count+collect jobs)."""
    if x is None:
        x = _sample_vectors(candidates, vec_col, seed, sample_size)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):  # Lloyd iterations on the sample
        assign = _nearest_centroid(x, cents)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=len(cents))
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz][:, None]
    return cents


def _assign_udf(cents: np.ndarray, n_probe: int):
    """Vectorized nearest-centroid assignment: one matmul per Arrow batch,
    returning the ``n_probe`` closest centroid ids (probe=1 for indexing the
    candidate side, probe=n for the query side)."""
    from pyspark.sql.functions import pandas_udf

    c2 = (cents**2).sum(axis=1)  # ||c||^2 per centroid

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        # argmin over ||x-c||^2 = ||c||^2 - 2 x·c (||x||^2 constant per row)
        d = c2[None, :] - 2.0 * (x @ cents.T)
        if n_probe == 1:
            # a full argsort of k distances per row is O(k log k) and was
            # the dominant assignment cost at k=2500 — argmin is O(k)
            idx = np.argmin(d, axis=1).astype(np.int32)[:, None]
        elif n_probe < d.shape[1]:
            part = np.argpartition(d, n_probe - 1, axis=1)[:, :n_probe]
            sub = np.take_along_axis(d, part, axis=1)
            idx = np.take_along_axis(
                part, np.argsort(sub, axis=1), axis=1
            ).astype(np.int32)
        else:
            idx = np.argsort(d, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(idx))

    return assign


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    sample_size: int = 10_000,
    include_self: bool = False,
    max_cell_size: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via an IVF index: candidates are inverted
    into centroid cells (probe=1), queries probe their ``n_probe`` nearest
    cells, and only cell collisions get exact cosine + rerank.

    Scale shape: centroid training touches a bounded sample; cell assignment
    is one Arrow matmul per batch (map-only); the candidate join is an
    equi-join on cell id — with C cells and balanced data the scored pair
    count drops by ~C/n_probe versus brute force.

    ``max_cell_size`` re-balances skewed cells: a cell with S > max
    candidates splits into ceil(S/max) salted sub-cells and the probing
    query fans out across the salts, so no scoring task ever receives more
    than ``max`` candidates no matter how lopsided the data distribution is
    (real corpora cluster — one hot cell would otherwise serialize the
    scoring stage).  The candidate set and result are identical; only the
    partitioning of the work changes.
    """
    cents = _train_centroids(candidates, vec_col, n_centroids, seed, sample_size)

    c_assign = _assign_udf(cents, 1)
    q_assign = _assign_udf(cents, n_probe)

    from e_commerce_data_lakehouse_spark.operators.dedup import (
        ensure_parallelism,
    )

    # a single-file candidate table scans as 1-2 splits — spread the
    # O(n x k x dim) assignment GEMM across the cluster
    candidates = ensure_parallelism(candidates)
    # norms per vector BEFORE the probe explode (1 eval per vector)
    cb = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_fixed(vec_col, cents.shape[1]).alias("__cn"),
        F.explode(c_assign(F.col(vec_col))).alias("cell"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_fixed(vec_col, cents.shape[1]).alias("__qn"),
        F.explode(q_assign(F.col(vec_col))).alias("cell"),
    )
    if max_cell_size is not None:
        sizes = cb.groupBy("cell").agg(
            F.ceil(F.count(F.lit(1)) / max_cell_size).cast("int").alias("n_salts")
        )
        cb = cb.join(F.broadcast(sizes), "cell").withColumn(
            "salt", F.pmod(F.xxhash64("neighbor_id"), F.col("n_salts")).cast("int")
        )
        qb = qb.join(F.broadcast(sizes), "cell").withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.col("n_salts") - 1))
        )
        join_keys = ["cell", "salt"]
    else:
        join_keys = ["cell"]
    cand = cb.join(F.broadcast(qb.drop("n_salts") if max_cell_size else qb),
                   join_keys).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    if not include_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_prenormed("__qv", "__cv", "__qn", "__cn", cents.shape[1]).alias(
            "cosine_sim"
        ),
    )
    return _topk_per_query(scored, k)


# ---------------------------------------------------------------------------
# IVF-PQ — product quantization inside IVF cells (Jégou et al., "Product
# Quantization for Nearest Neighbor Search", public TPAMI 2011)
# ---------------------------------------------------------------------------
def _kmeans_1sub(x: np.ndarray, ks: int, rng: np.random.RandomState, iters: int) -> np.ndarray:
    cents = x[rng.choice(len(x), size=min(ks, len(x)), replace=False)]
    for _ in range(iters):
        assign = _nearest_centroid(x, cents)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=len(cents))
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz][:, None]
    return cents


def _train_pq_codebooks(
    candidates: DataFrame,
    vec_col: str,
    coarse: np.ndarray,
    m: int,
    ks: int,
    seed: int,
    sample_size: int,
    iters: int = 10,
    x: np.ndarray | None = None,
) -> np.ndarray:
    """Per-subspace k-means codebooks over *residuals* (vector minus its
    coarse IVF centroid — the classic IVF-PQ encoding).  Training touches a
    bounded sample only: driver memory is O(sample), never O(corpus).
    Pass ``x`` to reuse an already-collected sample (identical draw:
    same data, seed, and size as :func:`_sample_vectors`)."""
    if x is None:
        x = _sample_vectors(candidates, vec_col, seed, sample_size)
    cell = _nearest_centroid(x, coarse)
    res = x - coarse[cell]
    d = x.shape[1]
    dsub = d // m
    rng = np.random.RandomState(seed + 1)
    books = np.stack(
        [
            _kmeans_1sub(res[:, j * dsub : (j + 1) * dsub], ks, rng, iters)
            for j in range(m)
        ]
    )
    return books  # (m, ks, dsub)


def _pq_encode_udf(coarse: np.ndarray, books: np.ndarray):
    """cell assignment + residual PQ codes in one Arrow pass (map-only)."""
    from pyspark.sql.functions import pandas_udf

    m, _, dsub = books.shape

    @pandas_udf("struct<cell:int, code:array<int>>")
    def encode(vecs: pd.Series) -> pd.DataFrame:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        cell = _nearest_centroid(x, coarse)
        res = x - coarse[cell]
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            sub = res[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = _nearest_centroid(sub, books[j])
        return pd.DataFrame(
            {"cell": cell.astype(np.int32), "code": list(codes)}
        )

    return encode


def _pq_approx_cosine_udf(coarse: np.ndarray, books: np.ndarray):
    """Approximate cosine(query, candidate) from the candidate's compressed
    form only: reconstruct = coarse[cell] + codebook[code], one gather + one
    row-wise dot per Arrow batch.  The raw candidate vector is never read —
    that is the point of PQ (memory ~ m bytes/vector instead of 4d)."""
    from pyspark.sql.functions import pandas_udf

    m, _, dsub = books.shape

    @pandas_udf("double")
    def approx(qv: pd.Series, cell: pd.Series, code: pd.Series) -> pd.Series:
        q = np.stack(qv.to_numpy()).astype(np.float64)
        codes = np.stack(code.to_numpy()).astype(np.int64)
        recon = coarse[cell.to_numpy()].copy()
        for j in range(m):
            recon[:, j * dsub : (j + 1) * dsub] += books[j][codes[:, j]]
        num = (q * recon).sum(axis=1)
        den = np.linalg.norm(q, axis=1) * np.linalg.norm(recon, axis=1)
        return pd.Series(np.where(den > 0, num / den, 0.0))

    return approx


def ivf_pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ks: int = 16,
    rerank: int = 4,
    seed: int = 42,
    sample_size: int = 10_000,
    include_self: bool = False,
) -> DataFrame:
    """IVF-PQ approximate cosine top-k: coarse IVF cells bound the search,
    product-quantized residual codes (m sub-codes of ks centroids) give a
    compressed approximate distance, and only the ``rerank * k`` best
    approximate hits per query fetch their raw vectors for exact rerank.

    Scale shape: the candidate table is touched twice — once map-only to
    encode (output: id, cell, m small ints — the 100 TB table compresses to
    ~m bytes/row), once via an equi-join on id for the bounded rerank set.
    The probe join is an equi-join on cell id; approximate scoring reads
    codes, not vectors.  This is the memory story that makes billion-vector
    ANN feasible: the index fits in a fraction of the raw data size.
    """
    # one count+collect feeds BOTH trainers (the two draws were already
    # identical — same df/seed/fraction — so results are bit-unchanged)
    x = _sample_vectors(candidates, vec_col, seed, sample_size)
    coarse = _train_centroids(
        candidates, vec_col, n_centroids, seed, sample_size, x=x
    )
    books = _train_pq_codebooks(
        candidates, vec_col, coarse, m, ks, seed, sample_size, x=x
    )

    enc = _pq_encode_udf(coarse, books)
    from e_commerce_data_lakehouse_spark.operators.dedup import (
        ensure_parallelism,
    )

    # spread the encode GEMM: a single-file table scans as 1-2 splits
    candidates = ensure_parallelism(candidates)
    cb = candidates.select(
        F.col(id_col).alias("neighbor_id"), enc(F.col(vec_col)).alias("e")
    ).select("neighbor_id", F.col("e.cell").alias("cell"), F.col("e.code").alias("code"))

    q_assign = _assign_udf(coarse, n_probe)
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_fixed(vec_col, coarse.shape[1]).alias("__qn"),
        F.explode(q_assign(F.col(vec_col))).alias("cell"),
    )

    approx = _pq_approx_cosine_udf(coarse, books)
    cand = cb.join(F.broadcast(qb), "cell")
    if not include_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        "__qv",
        "__qn",
        approx(F.col("__qv"), F.col("cell"), F.col("code")).alias("approx_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc()
    )
    short = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= rerank * k)
        .drop("r", "approx_sim")
    )
    # exact rerank: fetch raw vectors for the bounded shortlist only
    raw = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_fixed(vec_col, coarse.shape[1]).alias("__cn"),
    )
    exact = short.join(raw, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        cosine_prenormed("__qv", "__cv", "__qn", "__cn", coarse.shape[1]).alias(
            "cosine_sim"
        ),
    )
    return _topk_per_query(exact, k)


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup by cluster-then-prune (Abbas et al., 2023)
# ---------------------------------------------------------------------------
def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_centroids: int = 16,
    seed: int = 42,
    sample_size: int = 10_000,
) -> DataFrame:
    """Semantic deduplication: k-means-cluster the embedding space, then
    inside each cluster drop every item whose cosine to a LOWER-id
    cluster-mate is >= ``threshold``; survivors are the semantic
    representatives.  This is the cluster-then-prune shape of SemDeDup
    (arXiv:2303.09540) — the embedding-space complement of MinHash dedup:
    it removes *paraphrase-level* duplicates that share no n-grams.

    Deterministic: seeded sample k-means + id-ordered pruning, so the
    survivor set is reproducible run-over-run.

    Scale shape: centroids train on a bounded sample (driver memory
    O(sample), never O(corpus)); assignment is one Arrow matmul per batch
    against the broadcast centroid matrix (map-only); the in-cluster prune
    is ONE Arrow ``applyInPandas`` pass grouped by cluster id — each
    cluster's pairwise cosines are a blocked GEMM over that cluster's
    members, exactly how the SemDeDup reference pipeline computes them.
    This ships each vector across the wire ONCE (the r3 form generated the
    in-cluster pair stream and evaluated an unrolled 64-dim cosine
    expression per pair: correct, but the giant codegen method falls out
    of the JIT's huge-method limit and ran interpreted — ~110 µs/pair,
    97 s for the 871k pairs at gen-sf1; the GEMM does the same scoring in
    <1 s and moves 2×64 floats per MEMBER, not per PAIR).  Choose
    ``n_centroids ~ corpus_size / target_cluster_size`` so per-cluster
    pair volume stays bounded — the same knob IVF uses for cell size (at
    1B vectors: ~100k centroids).  The prune is a left_anti join on the
    dropped-id set.
    """

    cents = _train_centroids(
        df.select(vec_col), vec_col, n_centroids, seed, sample_size
    )
    assign = _assign_udf(cents, 1)
    from e_commerce_data_lakehouse_spark.operators.dedup import (
        ensure_parallelism,
    )

    # persist: the prune pass and the final anti-join both consume the
    # assignment — without a cache the Arrow matmul would run twice.
    # ensure_parallelism: a single-file embeddings table scans as 1-2
    # splits, which would serialize the O(n x k x dim) assignment GEMM on
    # two cores no matter the cluster size (at gen-sf10: 200k x 2500
    # centroids — the whole cost of the query).
    base = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .withColumn("cluster", assign(F.col("__v")).getItem(0))
    )
    base = tracked_persist(base)
    id_type = base.schema["__id"].dataType.simpleString()

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["__id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"__id": ids[:0]})
        order = np.argsort(ids, kind="stable")  # id order = drop priority
        ids = ids[order]
        x = np.stack(pdf["__v"].to_numpy())[order].astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        xn = x / np.where(norms == 0.0, 1.0, norms)[:, None]
        # j is dropped iff some i<j has cos(i,j) >= threshold.  Blocked
        # GEMM keeps memory O(block × members) for a lopsided cluster.
        dropped = np.zeros(len(ids), dtype=bool)
        blk = 4096
        for s in range(0, len(ids), blk):
            e = min(s + blk, len(ids))
            sim_rows = xn[s:e] @ xn.T  # rows i in [s,e) vs all j
            # quantized threshold: every other cosine path
            # (cosine_prenormed, the pair-join form this GEMM replaced)
            # compares ROUND(cos, 6) >= t (HALF_UP), which is exactly
            # cos >= t - 5e-7 — comparing against the shifted threshold
            # preserves those semantics without materializing a rounded
            # copy of the (block x members) matrix (np.round doubled the
            # GEMM stage's memory traffic: +76% at gen-sf10)
            hit = sim_rows >= threshold - 5e-7
            # restrict to i < j (strict upper triangle of the full matrix)
            cols = np.arange(len(ids))[None, :]
            rows = np.arange(s, e)[:, None]
            dropped |= (hit & (rows < cols)).any(axis=0)
        return pd.DataFrame({"__id": ids[dropped]})

    dropped = base.groupBy("cluster").applyInPandas(
        prune, f"__id {id_type}"
    )
    return (
        base.join(dropped, "__id", "left_anti")
        .select(F.col("__id").alias(id_col), F.col("cluster").cast("int"))
    )


def hard_negative_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 10,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the ``k``
    most-similar candidates with a DIFFERENT label — negatives near the
    decision boundary, which train retrieval/embedding models far better
    than random negatives.

    Plan shape: identical to :func:`brute_force_topk` (bounded query set
    broadcast against one pass over the candidates, map-side scoring,
    per-query top-k) with the label inequality as a join residual; the
    allowlisted BroadcastNestedLoopJoin is correct here because the
    broadcast side is the k queries, never the corpus.
    """
    dim = infer_dim(candidates, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("__ql"),
        norm_fixed(vec_col, dim).alias("__qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col(label_col).alias("__cl"),
        norm_fixed(vec_col, dim).alias("__cn"),
    )
    pairs = c.join(F.broadcast(q), F.col("__ql") != F.col("__cl"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_prenormed("__qv", "__cv", "__qn", "__cn", dim).alias(
            "cosine_sim"
        ),
    )
    return _topk_per_query(scored, k)


def mmr_rerank(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    pool_k: int = 20,
    k: int = 5,
    lam_num: int = 7,
    lam_den: int = 10,
) -> DataFrame:
    """Maximal Marginal Relevance diversified reranking (Carbonell &
    Goldstein 1998): per query, greedily select ``k`` of the ``pool_k``
    most-relevant candidates, each step maximizing

        ``λ·rel(q, d)  −  (1−λ)·max_{s ∈ selected} sim(d, s)``

    — the standard RAG/search de-redundancy pass (don't return five copies
    of the same near-duplicate page).

    Exactness contract: cosines are rounded to 1e-6 and quantized to BIGINT
    micro-units (``rel6``/``sim6``), and λ = ``lam_num/lam_den`` is applied
    as integer multipliers (default 7/10 → score ``7·rel6 − 3·div6``), so
    the greedy recursion is pure integer arithmetic — bit-identical in any
    engine, and replayable by an unrolled SQL CTE (one step per rank).
    Rank 1 has no diversity term (empty selected set → ``div6 = 0``).
    Ties break to the smallest candidate id at every step.

    Scale shape: the expensive parts are relational — the relevance pool is
    :func:`brute_force_topk`'s broadcast-queries map-side scan, and the
    within-pool pairwise similarities are a self-equi-join on the query id
    producing ``pool_k·(pool_k−1)`` rows PER QUERY (pool_k is small by
    construction; the corpus never pairs with itself).  Only the greedy
    argmax loop — O(k·pool_k) integer ops over ≤ pool_k² rows per query —
    runs in an Arrow ``applyInPandas`` kernel, grouped and sharded by
    query id, state bounded by the pool.

    Reference parity: no counterpart (the reference has no vector ops);
    LLM-pipeline extension surface.
    """
    dim = infer_dim(candidates, vec_col)
    pool = brute_force_topk(
        queries, candidates, id_col, vec_col, k=pool_k, dim=dim
    )
    rel = pool.select(
        "query_id",
        "neighbor_id",
        F.expr("CAST(ROUND(cosine_sim * 1000000) AS BIGINT)").alias("rel6"),
    )
    vecs = candidates.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__v"),
        norm_fixed(vec_col, dim).alias("__n"),
    )
    pooled = rel.join(
        vecs, rel["neighbor_id"] == vecs["__vid"]
    ).select("query_id", "neighbor_id", "rel6", "__v", "__n")
    a = pooled.select(
        "query_id",
        F.col("neighbor_id").alias("a_id"),
        F.col("rel6").alias("a_rel6"),
        F.col("__v").alias("av"),
        F.col("__n").alias("an"),
    )
    b = pooled.select(
        F.col("query_id").alias("b_qid"),
        F.col("neighbor_id").alias("b_id"),
        F.col("__v").alias("bv"),
        F.col("__n").alias("bn"),
    )
    # LEFT join: a pool whose query has exactly one candidate produces no
    # (a_id, b_id) pair, and an inner join would drop the whole group
    # before the kernel ever saw it — the rank-1 row must still be
    # emitted (r6 ADVICE).  The null b-side rows carry sim6 = NULL and
    # are skipped when building the pairwise map.
    pairs = (
        a.join(
            b,
            (F.col("query_id") == F.col("b_qid"))
            & (F.col("a_id") != F.col("b_id")),
            "left",
        )
        .select(
            "query_id",
            "a_id",
            "a_rel6",
            "b_id",
            F.expr(
                f"CAST(ROUND(ROUND({dot_fixed_sql('av', 'bv', dim)}"
                f" / (an * bn), 6) * 1000000) AS BIGINT)"
            ).alias("sim6"),
        )
    )

    lam_rest = lam_den - lam_num
    out_schema = (
        "query_id long, neighbor_id long, rank int, mmr_score long"
    )

    def select_mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rel_map = dict(
            pdf.drop_duplicates("a_id")[["a_id", "a_rel6"]].itertuples(
                index=False, name=None
            )
        )
        # null b_id rows are the left-join survivors of one-candidate
        # pools — no pairwise similarity exists for them by definition
        sims = pdf.dropna(subset=["b_id"]).astype(
            {"b_id": "int64", "sim6": "int64"}
        )
        sim_map: dict[tuple[int, int], int] = {
            (r[0], r[1]): r[2]
            for r in sims[["a_id", "b_id", "sim6"]].itertuples(
                index=False, name=None
            )
        }
        selected: list[int] = []
        rows = []
        remaining = set(rel_map)
        for rank in range(1, k + 1):
            if not remaining:
                break
            best_id, best_score = None, None
            for cand in remaining:
                div6 = max(
                    (sim_map[(cand, s)] for s in selected), default=0
                )
                score = lam_num * rel_map[cand] - lam_rest * div6
                if (
                    best_score is None
                    or score > best_score
                    or (score == best_score and cand < best_id)
                ):
                    best_id, best_score = cand, score
            selected.append(best_id)
            remaining.discard(best_id)
            rows.append((qid, best_id, rank, best_score))
        return pd.DataFrame(
            rows, columns=["query_id", "neighbor_id", "rank", "mmr_score"]
        )

    return pairs.groupBy("query_id").applyInPandas(select_mmr, out_schema)


# ---------------------------------------------------------------------------
# Index-quality evaluation — recall@k / MRR of ANN indexes vs exact kNN
# ---------------------------------------------------------------------------
def index_recall_eval(
    variants: dict[str, DataFrame],
    exact: DataFrame,
    labels: DataFrame,
    k: int,
) -> DataFrame:
    """Index-quality harness: score each ANN index's top-k against the
    exact brute-force top-k (the metric table an embedding-pipeline
    owner reads before swapping an index into production).

    ``exact`` and every ``variants`` value are top-k frames in the
    :func:`_topk_per_query` shape (``query_id, neighbor_id, rank``);
    ``labels`` maps ``vec_id -> label`` for the label-relevance MRR.
    Returns ONE row per index name (plus an ``exact`` row scoring the
    baseline against itself = the trivial 1.0 recall / delta 0):

    - ``recall_at_k_ppm`` — |variant_topk ∩ exact_topk| over the exact
      frame's ACTUAL row count (not k·n_queries: near a small block the
      exact kNN may yield < k neighbors for some query, and dividing by
      k·n_q would score even the exact baseline below 1.0 — r8 ADVICE),
    - ``mrr_ppm`` — mean reciprocal rank of the first same-label
      neighbor (0 when no hit in the top k),
    - ``mrr_delta_ppm`` — variant MRR minus the exact baseline's MRR
      (how much retrieval quality the index's approximation costs).

    Scale shape: every join here is per-query bounded — top-k frames are
    O(n_queries · k).  ``labels`` is O(corpus), so it is first
    SEMI-JOINED down to the bounded top-k id sets (labels stream
    map-side against the broadcast id set — r8 ADVICE: force-broadcasting
    the full labels table was a driver-memory hazard the docstring's
    "bounded regardless of corpus size" claim didn't survive) and only
    the bounded survivor set is broadcast into the metric joins.  The
    exact baseline row's MRR is collected once (1-row driver metadata)
    to feed the delta literals.
    """
    exact = tracked_persist(exact)
    n_q = exact.select("query_id").distinct().count()  # bounded scalar
    n_exact_rows = exact.count()  # bounded: <= n_q * k

    qlab_all = labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("__ql")
    )
    nlab_all = labels.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("__nl")
    )
    ex_pairs = exact.select("query_id", "neighbor_id")

    def metrics(name: str, topk: DataFrame) -> DataFrame:
        topk = tracked_persist(topk)
        overlap = (
            topk.select("query_id", "neighbor_id")
            .join(ex_pairs, ["query_id", "neighbor_id"])
            .count()
        )  # bounded: <= n_q * k
        # bound the O(corpus) label table to this frame's ids BEFORE any
        # broadcast: one map-side pass over labels per side
        qlab = qlab_all.join(
            F.broadcast(topk.select("query_id").distinct()),
            "query_id",
            "left_semi",
        )
        nlab = nlab_all.join(
            F.broadcast(topk.select("neighbor_id").distinct()),
            "neighbor_id",
            "left_semi",
        )
        rr = (
            topk.join(F.broadcast(qlab), "query_id")
            .join(F.broadcast(nlab), "neighbor_id")
            .groupBy("query_id")
            .agg(
                F.coalesce(
                    F.expr(
                        "1000000 div min(CASE WHEN __nl = __ql"
                        " THEN rank END)"
                    ),
                    F.lit(0),
                ).alias("__rr")
            )
            .agg(F.sum("__rr").cast("long").alias("__s"))
            .first()[0]
            or 0
        )
        spark = topk.sparkSession
        return spark.createDataFrame(
            [
                (
                    name,
                    n_q,
                    (overlap * 1_000_000) // max(n_exact_rows, 1),
                    int(rr) // max(n_q, 1),
                )
            ],
            "index_name string, n_queries long, recall_at_k_ppm long,"
            " mrr_ppm long",
        )

    rows = [metrics("exact", exact)]
    for name in sorted(variants):
        rows.append(metrics(name, variants[name]))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    exact_mrr = rows[0].first()["mrr_ppm"]  # 1-row driver metadata
    return out.withColumn(
        "mrr_delta_ppm", F.col("mrr_ppm") - F.lit(int(exact_mrr))
    )
