"""Multimodal plumbing: binary columns through Arrow kernels, chained into
the similarity operators (media → embedding → ANN)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.multimodal import binary_ops as mm
from e_commerce_data_lakehouse_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _payloads(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )


def test_decode_metadata_deterministic(spark):
    docs = _payloads(spark)
    a = sorted(map(tuple, mm.decode_metadata(docs, "doc_id", "payload").collect()))
    b = sorted(map(tuple, mm.decode_metadata(docs, "doc_id", "payload").collect()))
    assert a == b and len(a) == docs.count()
    assert all(1 <= r[2] <= 640 and 1 <= r[3] <= 480 for r in a)


def test_extract_features_feeds_ann(spark):
    docs = _payloads(spark).limit(200)
    emb = mm.extract_features(docs, "doc_id", "payload", dim=16)
    row = emb.first()
    assert len(row["embedding"]) == 16
    queries = emb.filter(F.col("doc_id") < 3)
    topk = sim.brute_force_topk(queries, emb, "doc_id", "embedding", k=3)
    got = topk.collect()
    assert len(got) == 9  # 3 queries x k=3
    assert all(r["cosine_sim"] <= 1.000001 for r in got)


def test_frame_sample_is_honest_stub(spark):
    docs = _payloads(spark)
    with pytest.raises(NotImplementedError):
        mm.frame_sample_plan(docs, "doc_id", "payload", every_n=10)


def test_resize_images_plumbing(spark):
    docs = _payloads(spark)
    out = mm.resize_images(docs, "doc_id", "payload", target_w=8, target_h=4)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(len(bytes(r["payload"])) == 32 for r in rows)
    assert all((r["width"], r["height"]) == (8, 4) for r in rows)
    # deterministic
    again = mm.resize_images(docs, "doc_id", "payload", 8, 4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # no shuffle: plan has no Exchange
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_hash_embed_deterministic_and_bounded(spark):
    from e_commerce_data_lakehouse_spark.multimodal import binary_ops as mm

    df = spark.createDataFrame(
        [(1, b"payload-a"), (2, b"payload-b"), (3, b"payload-a")],
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r["emb"]
        for r in df.select(
            "doc_id", mm.hash_embed(F.col("payload"), dim=8).alias("emb")
        ).collect()
    }
    assert len(out[1]) == 8
    assert all(-0.5 <= v < 0.5 for v in out[1])
    assert out[1] == out[3]  # same bytes -> same embedding
    assert out[1] != out[2]
