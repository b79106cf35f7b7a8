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

# localCheckpoint blocks live in the BlockManager, NOT the CacheManager:
# DataFrame.unpersist() cannot reach them, and the ContextCleaner frees
# them only after a driver GC notices the JVM RDD is unreachable — which
# a long session never guarantees (measured: ~7 cached RDD sets leaked
# per pagerank run, monotonically accumulating across a bench session).
# Iterative operators register their checkpoints here so the blocks are
# freed deterministically: per-iteration via ``replaces`` as soon as the
# next eager checkpoint supersedes them, and the final one at
# ``release_caches()``.
_TRACKED_CKPT: dict[int, object] = {}  # rdd id -> JVM RDD handle


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() + register for a later ``release_caches()``."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def tracked_checkpoint(df: DataFrame, replaces: DataFrame | None = None) -> DataFrame:
    """``localCheckpoint()`` (eager) + register the checkpoint's JVM RDD
    so its BlockManager blocks can be freed deterministically.

    ``replaces``: the previous iteration's tracked checkpoint in an
    iterative loop. Its blocks are freed IMMEDIATELY — the new eager
    checkpoint is fully materialized before this returns, so nothing
    can still need the superseded one. This keeps an N-iteration loop
    at ONE live checkpoint instead of N.

    Contract: after ``release_caches()`` a tracked checkpoint cannot be
    re-materialized (lineage is truncated at the freed blocks) — the
    same consume-then-release discipline callers already follow for
    tracked persists.
    """
    ck = df.localCheckpoint()
    try:
        jrdd = ck._jdf.queryExecution().analyzed().rdd()
        _TRACKED_CKPT[jrdd.id()] = jrdd
        ck._sc_ckpt_rdd_id = jrdd.id()
    except Exception:
        pass  # plan-shape surprise: degrade to untracked (old behavior)
    if replaces is not None:
        release_checkpoint(replaces)
    return ck


def release_checkpoint(ck: DataFrame) -> None:
    """Free one tracked checkpoint's blocks now (idempotent)."""
    rid = getattr(ck, "_sc_ckpt_rdd_id", None)
    jrdd = _TRACKED_CKPT.pop(rid, None) if rid is not None else None
    if jrdd is not None:
        try:
            jrdd.unpersist(False)
        except Exception:
            pass  # session already stopped — nothing to free


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
    while _TRACKED_CKPT:
        _, jrdd = _TRACKED_CKPT.popitem()
        try:
            jrdd.unpersist(False)
            released += 1
        except Exception:
            pass
    return released
