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
