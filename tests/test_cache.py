"""release_caches must actually free the JVM-side cache.

Regression test for the r12 leak: the tracker used weakrefs on the
assumption that a garbage-collected DataFrame frees its cache; it does
not (persist() registers the analyzed plan in the session
CacheManager, which outlives the Python object), so release_caches()
released nothing and every tracked cache leaked for the session's
lifetime. The tracker now holds strong references.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparklyclean_spark.cache import (
    release_caches,
    release_checkpoint,
    tracked_checkpoint,
    tracked_persist,
)


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _n_cached_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_release_caches_frees_jvm_cache(spark):
    release_caches()  # drop anything earlier tests left behind

    def op():
        # Mimic an operator: the persisted intermediate is a local that
        # dies when the function returns; only the tracker may release it.
        mid = tracked_persist(
            spark.range(1000).groupBy((F.col("id") % 10).alias("k")).count()
        )
        return mid.agg(F.sum("count").alias("n"))

    out = op()
    assert out.collect()[0]["n"] == 1000
    assert not _cache_manager_empty(spark)
    assert release_caches() == 1
    assert _cache_manager_empty(spark)


def test_release_caches_idempotent(spark):
    release_caches()
    tracked_persist(spark.range(10)).count()
    assert release_caches() == 1
    assert release_caches() == 0


def test_tracked_checkpoint_blocks_are_freed(spark):
    """localCheckpoint blocks live in the BlockManager (NOT the
    CacheManager), so DataFrame.unpersist can't free them and the
    ContextCleaner only reaps them after a driver GC — the r12
    pagerank leak (~7 cached RDD sets per run, never freed).
    tracked_checkpoint must make them releasable deterministically."""
    release_caches()
    base = _n_cached_rdds(spark)

    # iterative-loop shape: each round's checkpoint supersedes the last
    cur = tracked_checkpoint(spark.range(1000).select("id"))
    for _ in range(3):
        nxt = tracked_checkpoint(
            cur.select((F.col("id") + 1).alias("id")), replaces=cur
        )
        cur = nxt
    # only the live round's blocks remain, not one set per round
    assert _n_cached_rdds(spark) == base + 1
    assert cur.agg(F.sum("id")).collect()[0][0] == sum(range(3, 1003))
    assert release_caches() >= 1
    assert _n_cached_rdds(spark) == base


def test_release_checkpoint_is_idempotent(spark):
    release_caches()
    base = _n_cached_rdds(spark)
    ck = tracked_checkpoint(spark.range(100))
    assert _n_cached_rdds(spark) == base + 1
    release_checkpoint(ck)
    release_checkpoint(ck)
    assert _n_cached_rdds(spark) == base
    assert release_caches() == 0
