"""Feature-matrix statistics over embedding columns.

The covariance / Gram matrix of an ``array<float>`` column is the input
to whitening, PCA, and feature-drift monitoring in a training-data
pipeline.  A float implementation sums in shuffle-arrival order and can
never hash-match another engine, so the matrix is computed in EXACT
integer fixed point: each component is quantized SQL-side
(``round(x * scale)`` as BIGINT — identical in Spark and DuckDB), and all
sums/products stay integral end-to-end.

Scale shape: the per-partition Gram partial is a single int64 GEMM
(``Q.T @ Q``) inside an Arrow ``mapInPandas`` kernel — O(rows · dim²)
flops but only ``dim·(dim+1)/2`` output rows per Arrow batch — so the
shuffle that follows carries a few thousand rows per batch regardless of
corpus size, and the final combine is one tiny hash aggregate.  This is
the same partial-aggregate contract as a ``groupBy().sum()``, expressed
where the inner loop needs a vectorized kernel (cf. the unrolled-SQL
pitfall in ``functions/vectors.py:dot_fixed_sql`` — a 64-dim unrolled
expression is fine per pair, but dim² = 4096 unrolled sums per row would
blow Janino's method limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL_SCHEMA = (
    "dim_i int, dim_j int, n_vectors long, sum_prod long, "
    "sum_i long, sum_j long"
)


def covariance_fixed(
    df: DataFrame, vec_col: str, dim: int, scale: int = 10**6
) -> DataFrame:
    """Exact upper-triangle covariance statistics of ``vec_col``.

    Returns one row per (dim_i ≤ dim_j) with the quantized sums
    ``n_vectors, sum_prod (Σ qᵢqⱼ), sum_i (Σ qᵢ), sum_j (Σ qⱼ)`` and the
    exact covariance numerator ``cov_num = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ`` in
    DECIMAL(38,0) (``cov_num / (n·(n−1)·scale²)`` is the sample
    covariance; the division is left to the consumer so every reported
    value stays exact).

    Integer headroom: |q| ≤ scale·max|x|, so ``sum_prod`` fits int64 up
    to ``n ≈ 2^63 / (scale·max|x|)²`` rows (~9e6 at scale 1e6 and
    |x| ≤ 1); the n-multiplied numerator is computed in DECIMAL(38,0)
    where it holds to ~1e38.  For a larger corpus, drop ``scale`` one
    decade per 100× rows — quantization error stays far below sampling
    noise.
    """
    import numpy as np
    import pandas as pd

    q = df.select(
        F.expr(
            f"transform(cast({vec_col} as array<double>), "
            f"x -> cast(round(x * {scale}) as bigint))"
        ).alias("q")
    )
    iu = None  # built lazily inside the workers

    def gemm(batches):
        nonlocal iu
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.stack(
                [np.asarray(v, dtype=np.int64) for v in pdf["q"]]
            )
            if Q.shape[1] != dim:
                raise ValueError(
                    f"expected dim {dim}, got {Q.shape[1]}"
                )
            G = Q.T @ Q  # int64 GEMM — exact
            s = Q.sum(axis=0)
            if iu is None:
                iu = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "dim_i": iu[0].astype(np.int32),
                    "dim_j": iu[1].astype(np.int32),
                    "n_vectors": np.int64(Q.shape[0]),
                    "sum_prod": G[iu],
                    "sum_i": s[iu[0]],
                    "sum_j": s[iu[1]],
                }
            )

    partials = q.mapInPandas(gemm, schema=_PARTIAL_SCHEMA)
    totals = partials.groupBy("dim_i", "dim_j").agg(
        F.sum("n_vectors").alias("n_vectors"),
        F.sum("sum_prod").alias("sum_prod"),
        F.sum("sum_i").alias("sum_i"),
        F.sum("sum_j").alias("sum_j"),
    )
    return totals.select(
        "dim_i",
        "dim_j",
        "n_vectors",
        "sum_prod",
        "sum_i",
        "sum_j",
        F.expr(
            "cast(cast(n_vectors as decimal(38,0)) * sum_prod"
            " - cast(sum_i as decimal(38,0)) * sum_j as decimal(38,0))"
        ).alias("cov_num"),
    )


def whiten(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    scale: int = 10**6,
    eps: float = 1e-6,
) -> DataFrame:
    """ZCA-style whitening of an embedding column: output vectors have
    (sample) covariance ≈ I — the standard preprocessing before linear
    probes, PCA truncation, or Mahalanobis-distance dedup.

    Plan shape — the driver-bounded-matrix pattern: the exact integer
    covariance statistics (:func:`covariance_fixed`) collect as
    dim·(dim+1)/2 rows of BOUNDED driver metadata (2,080 rows at dim 64 —
    never data rows), the driver Cholesky-factors the ridge-regularized
    covariance once (O(dim³) on scalars), and the inverse factor ships
    back inside an Arrow ``mapInPandas`` closure that applies
    ``(x − mean) @ L⁻ᵀ`` as one float64 GEMM per batch.  The corpus is
    touched exactly twice (covariance pass + transform pass) and never
    shuffled.

    Determinism: the covariance inputs are exact integers (partition-
    layout independent by :func:`covariance_fixed`'s contract), and the
    driver factorization is a single fixed-order float computation — so
    the broadcast matrix, and therefore every output vector, is
    bit-identical across runs and partitionings.  Cross-engine exactness
    is NOT claimed (Cholesky is iterative float math) — the registered
    query is rows-only with property tests pinning whitened covariance
    ≈ I and partition independence.
    """
    import numpy as np
    import pandas as pd

    stats = covariance_fixed(df, vec_col, dim, scale).collect()
    if not stats or stats[0]["n_vectors"] < 2:
        raise ValueError("whiten needs at least 2 vectors")
    n = stats[0]["n_vectors"]
    cov = np.zeros((dim, dim), dtype=np.float64)
    mean_q = np.zeros(dim, dtype=np.float64)
    denom = float(n) * float(n - 1) * float(scale) ** 2
    for r in stats:
        i, j = r["dim_i"], r["dim_j"]
        c = float(int(r["cov_num"])) / denom
        cov[i, j] = c
        cov[j, i] = c
        if i == j:
            mean_q[i] = float(r["sum_i"]) / (float(n) * float(scale))
    L = np.linalg.cholesky(cov + eps * np.eye(dim))
    # W = L^-T: (x - mean) @ W has covariance (L^-1 C L^-T) = I (up to eps)
    W = np.linalg.inv(L).T
    mean = mean_q

    def transform(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Xc = X - mean
            # fixed-order accumulation (k ascending), NOT a BLAS GEMM:
            # dgemm's blocked reduction order varies with the batch's row
            # count, so `(X-mean) @ W` differs in the last ulp between
            # partition layouts — this loop is the same O(n·dim²) work
            # with one deterministic association order, making outputs
            # bit-identical across runs and partitionings (test-pinned)
            Y = np.zeros((Xc.shape[0], dim), dtype=np.float64)
            for k in range(dim):
                Y += Xc[:, k : k + 1] * W[k]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "whitened": list(Y)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        transform, schema=f"{id_col} long, whitened array<double>"
    )
