"""Dis-Dedup invariants (SURVEY.md §5): exactly-once pairs, triangle ≡
naive differential equality, bounded per-reducer workload.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparklyclean_spark.operators.dedup.blocking import BlockingRule
from sparklyclean_spark.operators.dedup.pairs import candidate_pairs_naive
from sparklyclean_spark.operators.dedup.disdedup import (
    candidate_pairs_disdedup,
    plan_assignment,
    triangle_side,
)
from sparklyclean_spark.datagen import people_df

RULES = [
    BlockingRule(1, "blocking_number"),
    BlockingRule(2, "state"),
]


@pytest.fixture(scope="module")
def people(spark):
    df = people_df(spark, n_originals=150)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def naive_pairs(people):
    return candidate_pairs_naive(people, RULES, "rec_id").cache()


@pytest.fixture(scope="module")
def tri_pairs(people):
    return candidate_pairs_disdedup(
        people, RULES, "rec_id", k=49, with_cell_stats=True
    ).cache()


def test_triangle_side():
    assert [triangle_side(i) for i in [1, 2, 3, 5, 6, 7, 10, 49]] == [
        1, 1, 2, 2, 3, 3, 4, 9,
    ]


def test_exactly_once_naive(naive_pairs):
    dups = naive_pairs.groupBy("id1", "id2").count().where("count > 1").count()
    assert dups == 0


def test_exactly_once_triangle(tri_pairs):
    dups = tri_pairs.groupBy("id1", "id2").count().where("count > 1").count()
    assert dups == 0


def test_triangle_equals_naive(naive_pairs, tri_pairs):
    """The load-balanced path must produce the identical pair set
    (including the bk each pair is attributed to)."""
    a = naive_pairs.select("bk", "id1", "id2")
    b = tri_pairs.select("bk", "id1", "id2")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_pairs_share_a_block(people, naive_pairs):
    """Every emitted pair really co-blocks under its bk."""
    from sparklyclean_spark.operators.dedup.blocking import with_block_keys

    keyed = with_block_keys(people, RULES).select(
        F.col("rec_id"), F.col("bkvs")
    )
    j = (
        naive_pairs.join(keyed.withColumnRenamed("rec_id", "id1").withColumnRenamed("bkvs", "b1"), "id1")
        .join(keyed.withColumnRenamed("rec_id", "id2").withColumnRenamed("bkvs", "b2"), "id2")
    )
    bad = j.where(
        F.size(F.filter(F.array_intersect("b1", "b2"), lambda x: x["k"] == F.col("bk"))) == 0
    ).count()
    assert bad == 0


def test_lowest_common_block_guard(naive_pairs, people):
    """A pair co-blocked under both functions appears under bk=1 only."""
    from sparklyclean_spark.operators.dedup.blocking import with_block_keys

    keyed = with_block_keys(people, RULES).select("rec_id", "bkvs")
    j = (
        naive_pairs.join(keyed.withColumnRenamed("rec_id", "id1").withColumnRenamed("bkvs", "b1"), "id1")
        .join(keyed.withColumnRenamed("rec_id", "id2").withColumnRenamed("bkvs", "b2"), "id2")
        .withColumn("n_common", F.size(F.array_intersect("b1", "b2")))
    )
    assert j.where((F.col("n_common") == 2) & (F.col("bk") != 1)).count() == 0


def test_workload_bound(tri_pairs, naive_pairs):
    """No reducer id gets more than W/k + max-cell work (paper's
    guarantee, small-k quantization tolerated — SURVEY.md §7 risk e)."""
    k = 49
    total = naive_pairs.count()
    per_rid = tri_pairs.groupBy("rid").count().collect()
    max_work = max(r["count"] for r in per_rid)
    # Triangle cells bound single-cell work by ~W/k; a reducer may own
    # several cells of different blocks, so allow a small multiple.
    bound = 4.0 * (total / k) + 50
    assert max_work <= bound, f"max per-reducer work {max_work} > bound {bound}"


def test_plan_assignment_deterministic():
    heavy = [(2, "nsw", 600), (2, "vic", 400), (1, "3", 120)]
    total = sum(n * (n - 1) // 2 for _, _, n in heavy) + 5000
    p1 = plan_assignment(heavy, total, 49)
    p2 = plan_assignment(heavy, total, 49)
    assert p1.multi == p2.multi and p1.single_det == p2.single_det
    # every multi allocation is a triangle number with distinct rids
    for l, rids in p1.multi.values():
        assert len(rids) == l * (l + 1) // 2
        assert len(set(rids)) == len(rids)
    assert p1.reducers_used_by_multi() <= 49
