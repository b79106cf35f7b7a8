"""Tracked persist: cache intermediates without leaking them.

Operators in this package persist intermediates that feed multiple
join branches (LSH signature tables, Dis-Dedup fan-outs). The
DataFrames they return are lazy, so the operator itself cannot
unpersist — the cache must outlive the call until the caller
materializes the result. ``tracked_persist`` registers every such
cache; ``release_caches()`` drops them all once results are consumed
(bench calls it between queries; long-lived drivers should call it
at query boundaries). Without release, MEMORY_AND_DISK eviction keeps
things correct but pressures executor memory unpredictably.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# Weak references: a cache whose DataFrame is garbage-collected is
# unpersistable anyway (the JVM side is freed with the plan).
_TRACKED: list[weakref.ref[DataFrame]] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() + register for a later ``release_caches()``."""
    df.persist(level)
    _TRACKED.append(weakref.ref(df))
    return df


def release_caches() -> int:
    """Unpersist every tracked cache still alive; returns the count."""
    released = 0
    while _TRACKED:
        ref = _TRACKED.pop()
        df = ref()
        if df is not None:
            try:
                df.unpersist()
                released += 1
            except Exception:
                pass  # session already stopped — nothing to free
    return released
