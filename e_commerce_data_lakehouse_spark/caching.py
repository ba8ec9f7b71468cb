"""Library-wide persist tracking.

Several operators ``persist()`` an intermediate frame because two or more
downstream consumers (band join + estimate funnel, verify stage, ...) would
otherwise recompute it.  The returned result still *reads* those cached
frames, so the operator itself can never unpersist them — the caller must,
after consuming the result.

This module gives long-lived sessions a one-call way to do that without
nuking unrelated caches via ``spark.catalog.clearCache()``: every internal
persist goes through :func:`tracked_persist`, and
:func:`release_persisted` unpersists everything the library has cached so
far.  ``bench.py`` still uses ``clearCache()`` between queries (it owns the
whole session); a library embedded in a user's session should prefer::

    from e_commerce_data_lakehouse_spark.caching import release_persisted
    result = minhash_lsh_pairs(...).collect()
    release_persisted()          # drop the signature caches

The registry holds STRONG references deliberately: the JVM-side cache
outlives the operator's local Python wrapper, so a weakref would be dead by
the time the caller wants to release (the cached blocks would leak — the
exact problem this module exists to fix).  The wrappers are tiny; the
registry is cleared on every release, so nothing accumulates past the
caller's chosen release points.  Unpersisting an already-unpersisted frame
is a no-op in Spark, so double-release is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []

# Serialized-in-memory, disk-spillable — NOT the DataFrame default
# (MEMORY_AND_DISK_DESER): deserialized row caches of a few 10^7 rows
# carry object overhead that can overflow a small executor heap while the
# consuming job runs (observed: a 60M-row persisted interaction set OOM'd
# an 8g local heap at gen-sf10).  Serialized blocks are several times
# smaller, evict to disk gracefully, and re-reads pay one cheap decode
# pass — the right default for a library whose persists are mostly
# narrow long/string projections consumed 2-3 times.
_PERSIST_LEVEL = StorageLevel.MEMORY_AND_DISK


def tracked_persist(
    df: DataFrame, level: StorageLevel = _PERSIST_LEVEL
) -> DataFrame:
    """``df.persist(level)`` + register for later :func:`release_persisted`.

    ``level`` defaults to SERIALIZED memory-and-disk (see
    ``_PERSIST_LEVEL``); pass ``StorageLevel.MEMORY_AND_DISK_DESER`` for a
    small hot frame where decode cost dominates.
    """
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every frame the library has cached since the last release;
    returns how many were released.  Safe to call repeatedly."""
    released = 0
    for df in _TRACKED:
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _TRACKED.clear()
    return released
