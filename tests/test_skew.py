"""Salting operators: differential equivalence vs the direct plans
on a skewed fixture (one key holding ~60% of all rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sparklyclean_spark.operators.skew import salted_join, salted_topk


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 owns 600 of 1000 rows; keys 1..40 share the rest
    return spark.range(1000).selectExpr(
        "CASE WHEN id < 600 THEN 0 ELSE id % 40 + 1 END AS k",
        "id AS uid",
        "CAST(pmod(id * 2654435761, 997) AS DOUBLE) AS score",
    ).cache()


def test_salted_topk_equals_window_topk(skewed):
    order = [F.desc("score"), F.asc("uid")]  # total order via unique uid
    got = {
        (r.k, r.uid, r.rn)
        for r in salted_topk(skewed, ["k"], order, k=5, n_salts=8).collect()
    }
    w = Window.partitionBy("k").orderBy(*order)
    want = {
        (r.k, r.uid, r.rn)
        for r in skewed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .collect()
    }
    assert got == want


def test_salted_topk_round1_bounds_partition_size(skewed):
    # the salted window's partitions are (k, salt): the hot key's 600
    # rows never meet in one sort
    out = salted_topk(skewed, ["k"], [F.desc("score"), F.asc("uid")], 3, n_salts=8)
    assert out.where(F.col("k") == 0).count() == 3


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, skewed, how):
    dim = spark.range(30).selectExpr("id AS k", "id * 10 AS label")
    got = {
        (r.k, r.uid, r.label)
        for r in salted_join(skewed, dim, ["k"], n_salts=4, how=how).collect()
    }
    want = {
        (r.k, r.uid, r.label) for r in skewed.join(dim, ["k"], how).collect()
    }
    assert got == want


def test_weighted_sample_rate_tracks_weight(spark):
    from pyspark.sql import functions as F

    from sparklyclean_spark.operators.sampling import weighted_sample

    df = spark.range(4000).selectExpr("id", "CAST(CASE WHEN id % 2 = 0 THEN 0.9 ELSE 0.1 END AS DOUBLE) AS w")
    kept = weighted_sample(df, F.col("w"), "id").groupBy("w").count().collect()
    rates = {round(r.w, 1): r["count"] / 2000 for r in kept}
    assert abs(rates[0.9] - 0.9) < 0.05
    assert abs(rates[0.1] - 0.1) < 0.05
    # deterministic: identical result on rerun
    a = {r.id for r in weighted_sample(df, F.col("w"), "id").collect()}
    b = {r.id for r in weighted_sample(df, F.col("w"), "id").collect()}
    assert a == b
