"""Persist tracking (ADVICE r3: library persist() calls were never
unpersisted — long-lived sessions accumulated cached blocks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark import caching
from e_commerce_data_lakehouse_spark.operators import dedup


def test_tracked_persist_registers_and_releases(spark):
    caching.release_persisted()  # clean slate
    df = caching.tracked_persist(spark.range(100).withColumn("x", F.lit(1)))
    df.count()  # materialize the cache
    assert df.storageLevel.useMemory
    released = caching.release_persisted()
    assert released == 1
    assert not df.storageLevel.useMemory
    # registry drained — second call is a no-op
    assert caching.release_persisted() == 0


def test_minhash_persists_are_tracked(spark):
    caching.release_persisted()
    docs = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog number {i % 3} ok") for i in range(40)],
        ["doc_id", "text"],
    )
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text")
    pairs.count()
    # the signature cache the operator left behind is releasable in one call
    assert caching.release_persisted() >= 1
    cached = [
        rdd_id
        for rdd_id, _ in spark.sparkContext._jsc.getPersistentRDDs().items()
    ]
    assert cached == []


def test_release_survives_dropped_references(spark):
    """The registry must hold the frame even after the caller's local
    reference is gone — the JVM cache outlives the Python wrapper."""
    caching.release_persisted()
    caching.tracked_persist(spark.range(10)).count()
    import gc

    gc.collect()
    assert caching.release_persisted() == 1


def test_tracked_persist_defaults_to_serialized_spillable(spark):
    """Regression pin for the gen-sf10 OOM: library persists must store
    serialized (deserialized row caches of ~5e7 rows overflow an 8g heap
    while the consuming job runs) and must keep the disk fallback."""
    df = caching.tracked_persist(spark.range(10))
    try:
        lvl = df.storageLevel
        assert not lvl.deserialized
        assert lvl.useMemory and lvl.useDisk
    finally:
        caching.release_persisted()


def test_tracked_persist_level_override(spark):
    from pyspark.storagelevel import StorageLevel

    df = caching.tracked_persist(
        spark.range(10), StorageLevel.MEMORY_AND_DISK_DESER
    )
    try:
        assert df.storageLevel.deserialized
    finally:
        caching.release_persisted()
