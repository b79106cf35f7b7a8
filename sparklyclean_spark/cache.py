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

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# Strong references, deliberately. An earlier weakref design assumed a
# garbage-collected DataFrame frees its JVM cache with the plan; it
# does not — persist() registers the analyzed plan in the session's
# CacheManager, which keeps the blocks (and the plan, which every
# later query is compared against during cache lookup) alive until an
# explicit unpersist. Operators' persisted intermediates are locals
# that die when the operator returns, so under weakrefs
# release_caches() released nothing and every cache leaked for the
# life of the session (measured: monotonically growing query walls
# across a bench session; CacheManager non-empty after release).
_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() + register for a later ``release_caches()``."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked cache; returns the count."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            released += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return released
