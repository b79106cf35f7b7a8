"""Bloom pre-join pruning: no false negatives, bounded false
positives, exact-result equality, and the filter sits below the join."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparklyclean_spark.operators.bloom import bloom_semi_join, build_bloom
from sparklyclean_spark.plans.audit import explain_str


def test_no_false_negatives_and_bounded_fp(spark):
    dim = spark.range(500).select((F.col("id") * 3).alias("k"))
    bf = build_bloom(dim, "k", expected_keys=500, fpp=0.01)
    members = dim.where(bf.contains(F.col("k"))).count()
    assert members == 500  # every inserted key passes
    # disjoint probe set: multiples of 3 shifted by 1
    probe = spark.range(20_000).select((F.col("id") * 3 + 1).alias("k"))
    fp = probe.where(bf.contains(F.col("k"))).count()
    assert fp / 20_000 < 0.05  # ~1% nominal, generous margin


def test_bloom_semi_join_exact(spark):
    fact = spark.range(10_000).select((F.col("id") % 700).alias("k"), F.col("id").alias("v"))
    dim = spark.range(100).select((F.col("id") * 5).alias("dk"))
    got = bloom_semi_join(fact, dim, "k", "dk", expected_keys=100)
    exact = fact.join(dim.select(F.col("dk").alias("k")).distinct(), "k", "left_semi")
    assert got.count() == exact.count()
    assert got.exceptAll(exact).count() == 0


def test_prefilter_runs_below_the_join(spark):
    fact = spark.range(1000).select(F.col("id").alias("k"))
    dim = spark.range(10).select(F.col("id").alias("dk"))
    plan = explain_str(bloom_semi_join(fact, dim, "k", "dk", expected_keys=10), "simple")
    join_at = plan.index("Join")
    filt_at = plan.index("xxhash64")
    assert filt_at > join_at  # physical plans print top-down: filter BELOW join
