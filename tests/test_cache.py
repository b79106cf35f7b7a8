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

from sparklyclean_spark.cache import release_caches, tracked_persist


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


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
