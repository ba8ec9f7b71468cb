"""Multimodal (image/audio/video) column plumbing.

Design (SURVEY §7.2-8 extension): media lives in an opaque ``binary`` column
with typed metadata alongside — the reference's image domain stores S3
pointers + a MapType metadata bag (``image_to_deltalake_table.py:249-263``);
here the engine handles real payload bytes too.

The decode/feature-extract kernels run as Arrow-batched ``mapInPandas``
(pandas gets a zero-copy batch of rows; Python cost is amortized per batch,
not per row).  Actual codec work (PIL/ffmpeg) is NOT available in this
container, so the kernels are deterministic stubs behind the same signature:
the Spark-side plumbing — schema, batching, partitioning — is real and
tested; swap ``_decode_stub`` for a real decoder on a cluster with codec
libs installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decoder.

    Real implementation would be ``PIL.Image.open(io.BytesIO(payload))``;
    that library is not in this container (NotImplementedError would be the
    honest stub, but a deterministic fake lets the full pipeline be
    oracle-tested end-to-end).  Width/height derive from byte length only, so
    the DuckDB oracle can reproduce them with octet_length().
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, "png" if n % 2 == 0 else "jpeg"


def decode_metadata(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Extract (n_bytes, width, height, format) from a binary media column
    via Arrow-batched mapInPandas."""

    idc, binc = id_col, binary_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binc]
            meta = [_decode_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[idc].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "format": [m[2] for m in meta],
                }
            )

    return df.select(F.col(idc), F.col(binc)).mapInPandas(
        kernel, DECODED_META_SCHEMA
    )


def frame_sample_plan(df: DataFrame, id_col: str, binary_col: str, every_n: int):
    """Video frame-sampling plumbing: NOT implemented in this container
    (no ffmpeg).  Raises immediately rather than pretending."""
    raise NotImplementedError(
        "frame sampling requires a video codec library; wire a real decoder "
        "into the mapInPandas kernel (same shape as decode_metadata)"
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame, id_col: str, binary_col: str, dim: int = 16
) -> DataFrame:
    """Media → embedding feature extraction via Arrow-batched mapInPandas.

    The kernel is a deterministic stand-in (byte histogram folded to ``dim``
    unit-norm dimensions — a real pipeline swaps in a vision/audio encoder);
    the engine-relevant part is the plumbing: binary columns batch through
    Arrow, numpy vectorizes per batch, and the output ``array<float>``
    column feeds directly into the similarity operators
    (``operators/similarity.py``), giving the full media → embedding → ANN
    dedup path.
    """
    import numpy as np

    idc, binc = id_col, binary_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[binc]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                if len(b) == 0:
                    out.append([0.0] * dim)
                    continue
                hist = np.bincount(b % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                out.append((hist / norm if norm else hist).astype(np.float32).tolist())
            yield pd.DataFrame({"doc_id": pdf[idc].astype("int64"), "embedding": out})

    return df.select(F.col(idc), F.col(binc)).mapInPandas(kernel, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    target_w: int = 64,
    target_h: int = 64,
) -> DataFrame:
    """Image resize plumbing via Arrow-batched mapInPandas: binary in,
    binary out, with the typed size metadata updated.

    The kernel is a deterministic stand-in (payload re-sampled by byte
    striding to a ``target_w*target_h``-byte buffer — a real pipeline swaps
    in ``PIL.Image.resize``; no imaging library exists in this container).
    The engine-relevant parts are real: batch shape (binary column through
    Arrow both directions), output schema, and partition preservation — a
    resize never shuffles."""
    import numpy as np

    idc, binc = id_col, binary_col
    n_out = target_w * target_h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf[binc]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                if len(b) == 0:
                    payloads.append(bytes(n_out))
                    continue
                idx = (np.arange(n_out) * len(b)) // n_out
                payloads.append(b[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[idc].astype("int64"),
                    "payload": payloads,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select(F.col(idc), F.col(binc)).mapInPandas(
        kernel, RESIZED_SCHEMA
    )


def hash_embed(payload: Column, dim: int = 8) -> Column:
    """Deterministic, engine-portable embedding of a binary payload: feature
    j is a uniform in [-0.5, 0.5) derived from ``md5(md5(payload) || '-j')``,
    rounded to 6 decimals.

    This is the oracle-checkable stand-in for a real encoder (CLIP/ViT would
    run as an Arrow kernel like :func:`extract_features`): it exercises the
    identical downstream plumbing — embedding column, cosine scoring, ANN —
    while every value is reproducible in DuckDB
    (``('0x' || substr(md5(md5(text) || '-j'), 1, 8))::BIGINT / 2^32 - 0.5``).
    Pure Catalyst expressions: no UDF, codegen end to end.
    """
    fp = F.md5(payload)
    feats = [
        F.round(
            F.conv(
                F.substring(F.md5(F.concat(fp, F.lit(f"-{j}"))), 1, 8), 16, 10
            ).cast("bigint")
            / F.lit(4294967296.0)
            - F.lit(0.5),
            6,
        )
        for j in range(dim)
    ]
    return F.array(*feats)
