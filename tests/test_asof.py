"""As-of join: differential vs the quadratic naive oracle on random
event sets, direction/tolerance/how variants, and a plan audit that
the sort-based shape never degenerates into a nested-loop join."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest

from sparklyclean_spark.operators.asof import asof_join, asof_join_naive


def _frames(spark, seed, n_left=80, n_right=120, n_keys=7):
    rng = random.Random(seed)
    t0 = datetime(2024, 3, 1)
    left = [
        (rng.randrange(n_keys), t0 + timedelta(seconds=rng.randrange(100_000)), i)
        for i in range(n_left)
    ]
    # distinct (key, ts) on the right so the match is deterministic
    seen, right = set(), []
    while len(right) < n_right:
        k, s = rng.randrange(n_keys), rng.randrange(100_000)
        if (k, s) in seen:
            continue
        seen.add((k, s))
        right.append((k, t0 + timedelta(seconds=s), float(len(right)), len(right)))
    ldf = spark.createDataFrame(left, "k long, ts timestamp_ntz, lid long")
    rdf = spark.createDataFrame(
        right, "k long, ts timestamp_ntz, price double, rid long"
    )
    return ldf, rdf


@pytest.mark.parametrize("seed", [11, 47])
def test_backward_matches_naive_oracle(spark, seed):
    ldf, rdf = _frames(spark, seed)
    fast = asof_join(ldf, rdf, on=["k"], left_ts="ts")
    slow = asof_join_naive(ldf, rdf, on=["k"], left_ts="ts")
    key = lambda r: (r.lid,)
    got = {key(r): (r.r_ts, r.r_price, r.r_rid) for r in fast.collect()}
    want = {key(r): (r.r_ts, r.r_price, r.r_rid) for r in slow.collect()}
    assert got == want
    assert len(got) == ldf.count()  # left join keeps every left row


def test_inclusive_tie_and_forward(spark):
    ldf = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0, 0), 100)],
        "k long, ts timestamp_ntz, lid long",
    )
    rdf = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 12, 0, 0), 1),
            (1, datetime(2024, 1, 1, 11, 0, 0), 2),
            (1, datetime(2024, 1, 1, 13, 0, 0), 3),
        ],
        "k long, ts timestamp_ntz, rid long",
    )
    back = asof_join(ldf, rdf, on=["k"], left_ts="ts").collect()[0]
    assert back.r_rid == 1  # equal timestamp matches (inclusive), not 11:00
    fwd = asof_join(ldf, rdf, on=["k"], left_ts="ts", direction="forward").collect()[0]
    assert fwd.r_rid == 1  # inclusive on the forward side too
    fwd2 = asof_join(
        ldf.withColumn("ts", ldf.ts + pytest.importorskip("pyspark.sql.functions").expr("INTERVAL 1 SECOND")),
        rdf, on=["k"], left_ts="ts", direction="forward",
    ).collect()[0]
    assert fwd2.r_rid == 3  # next-at-or-after is 13:00


def test_tolerance_and_inner(spark):
    ldf = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0, 0), 1), (2, datetime(2024, 1, 1, 12, 0, 0), 2)],
        "k long, ts timestamp_ntz, lid long",
    )
    rdf = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 11, 59, 0), 10)],
        "k long, ts timestamp_ntz, rid long",
    )
    within = asof_join(ldf, rdf, on=["k"], left_ts="ts", tolerance_seconds=120)
    rows = {r.lid: r.r_rid for r in within.collect()}
    assert rows == {1: 10, 2: None}
    beyond = asof_join(ldf, rdf, on=["k"], left_ts="ts", tolerance_seconds=30)
    assert {r.lid: r.r_rid for r in beyond.collect()} == {1: None, 2: None}
    inner = asof_join(ldf, rdf, on=["k"], left_ts="ts", tolerance_seconds=120, how="inner")
    assert [r.lid for r in inner.collect()] == [1]


def test_tolerance_microsecond_exactness(spark):
    """The tolerance bound compares integer MICROSECONDS: a gap of
    tolerance + 1 µs is voided, a gap of exactly tolerance matches.
    (Spark's SECOND diff truncates and DuckDB's counts boundary
    crossings — µs is the only granularity both engines agree on.)"""
    from datetime import datetime

    from sparklyclean_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0, 0, 0), 1),
         (2, datetime(2024, 1, 1, 12, 0, 0, 0), 2)],
        "k long, ts timestamp_ntz, lid long",
    )
    rdf = spark.createDataFrame(
        # k=1: exactly 60 s after; k=2: 60 s + 1 µs after
        [(1, datetime(2024, 1, 1, 12, 1, 0, 0), 10),
         (2, datetime(2024, 1, 1, 12, 1, 0, 1), 20)],
        "k long, ts timestamp_ntz, rid long",
    )
    out = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", direction="forward",
        tolerance_seconds=60,
    )
    assert {r.lid: r.r_rid for r in out.collect()} == {1: 10, 2: None}
    # fractional tolerance rounds to microseconds (not truncated to 0)
    frac = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", direction="forward",
        tolerance_seconds=60.000001,
    )
    assert {r.lid: r.r_rid for r in frac.collect()} == {1: 10, 2: 20}


def test_plan_is_sort_based_not_nested_loop(spark):
    from sparklyclean_spark.plans.audit import explain_formatted

    ldf, rdf = _frames(spark, 3)
    plan = explain_formatted(asof_join(ldf, rdf, on=["k"], left_ts="ts"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the whole operator is union -> one windowed sort; no join at all
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("hashpartitioning(") == 1
