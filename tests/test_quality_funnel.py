"""Unit tests for the round-4 capability operators: the one-scan
data-quality constraint suite, the single-shuffle ordered funnel, and
the mergeable HLL distinct sketches."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sparklyclean_spark.operators import quality as DQ
from sparklyclean_spark.operators.funnel import funnel_steps, funnel_summary
from sparklyclean_spark.operators.sketches import distinct_rollup, shard_sketches
from sparklyclean_spark.plans.audit import count_exchanges, explain_formatted


def _dq_dirty(spark):
    rows = [
        (1, "a", 10.0, "ok-1"),
        (2, "b", -5.0, "ok-2"),      # out of range
        (2, "c", 20.0, "bad"),       # dup key + regex violation
        (None, "zz", 30.0, "ok-3"),  # null key + FK miss (zz)
        (4, None, None, None),       # null value -> range+regex violations
    ]
    return spark.createDataFrame(rows, "id int, ref string, v double, tag string")


def test_constraint_suite_counts(spark):
    df = _dq_dirty(spark)
    dim = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    out = DQ.check_constraints(
        df,
        [
            DQ.not_null("id"),
            DQ.in_range("v", 0.0, 25.0),
            DQ.matches("tag", "^ok-"),
            DQ.accepted_values("ref", ["a", "b", "c", "zz"]),
            DQ.UniqueRule(("id",)),
            DQ.ForeignKeyRule("ref", dim, "k"),
        ],
    )
    got = {r["rule"]: (r["violations"], r["n_rows"], r["passed"]) for r in out.collect()}
    assert got == {
        "not_null_id": (1, 5, False),
        # -5 and 30 out of range, NULL v counts as violation
        "in_range_v": (3, 5, False),
        "matches_tag": (2, 5, False),
        # NULL ref is not an accepted value
        "accepted_values_ref": (1, 5, False),
        # 5 rows, distinct non-null ids {1,2,4} -> 5-3=2 (NULL and dup)
        "unique_id": (2, 5, False),
        # 'zz' not in dim; NULL ref is exempt
        "foreign_key_ref": (1, 5, False),
    }


def test_constraint_suite_clean_passes(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id int, v double")
    out = DQ.check_constraints(
        df, [DQ.not_null("id"), DQ.in_range("v", 0.0, 10.0), DQ.UniqueRule(("id",))]
    )
    assert all(r["passed"] for r in out.collect())


def test_constraint_row_rules_single_scan(spark):
    """All row-level rules + uniqueness fuse into one aggregation over
    one scan: no more than the two agg exchanges (partial->final and
    the distinct expand), and exactly one scan of the input."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    out = DQ.check_constraints(
        df, [DQ.not_null("v"), DQ.in_range("v", 0, 6), DQ.UniqueRule(("id",))]
    )
    plan = explain_formatted(out)
    assert plan.count("Scan") <= 2  # range scan appears once (+reuse)
    assert count_exchanges(out) <= 3


def _funnel_events(spark):
    t = datetime
    rows = [
        # u1: full ordered funnel
        (1, t(2024, 1, 1, 0), "view"),
        (1, t(2024, 1, 1, 1), "click"),
        (1, t(2024, 1, 1, 2), "purchase"),
        # u2: view only
        (2, t(2024, 1, 1, 0), "view"),
        # u3: click BEFORE view, purchase after view but no click after
        # view -> stops at step 1 (purchase can't count without click)
        (3, t(2024, 1, 1, 0), "click"),
        (3, t(2024, 1, 1, 1), "view"),
        (3, t(2024, 1, 1, 2), "purchase"),
        # u4: never enters (no view)
        (4, t(2024, 1, 1, 0), "click"),
        (4, t(2024, 1, 1, 1), "purchase"),
        # u5: view and click at the SAME ts (ties count) then purchase
        (5, t(2024, 1, 1, 0), "view"),
        (5, t(2024, 1, 1, 0), "click"),
        (5, t(2024, 1, 1, 3), "purchase"),
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")


def test_funnel_ordering_semantics(spark):
    per_user = funnel_steps(_funnel_events(spark), ["view", "click", "purchase"])
    got = {r["user_id"]: r["steps_completed"] for r in per_user.collect()}
    assert got == {1: 3, 2: 1, 3: 1, 5: 3}  # u4 excluded (never entered)


def test_funnel_summary_counts(spark):
    out = funnel_summary(_funnel_events(spark), ["view", "click", "purchase"])
    rows = {r["step"]: (r["users"], r["pct_of_entry"]) for r in out.collect()}
    assert rows["view"] == (4, 1.0)
    assert rows["click"] == (2, 0.5)
    assert rows["purchase"] == (2, 0.5)


def test_funnel_single_user_shuffle(spark):
    """The per-user phase must be ONE hash partitioning on user_id —
    windows and the groupBy reuse the same exchange."""
    out = funnel_steps(_funnel_events(spark), ["view", "click", "purchase"])
    assert count_exchanges(out) == 1


def test_hll_merge_equals_direct(spark):
    """Union of per-shard sketches must give the SAME estimate as one
    direct sketch over all rows (sketch union is lossless for HLL),
    and land within 5% of the exact distinct count."""
    df = spark.range(20_000).select(
        (F.col("id") % 4).alias("shard"),
        # overlapping keys across shards: 5k distinct per shard, 8k global
        ((F.col("id") * 2654435761) % 8000).alias("k"),
    )
    rollup = {
        r["shard"]: r["est_distinct"]
        for r in distinct_rollup(df, F.col("k"), F.col("shard")).collect()
    }
    direct = (
        df.agg(F.hll_sketch_agg(F.col("k"), F.lit(12)).alias("s"))
        .select(F.hll_sketch_estimate("s").alias("e"))
        .collect()[0]["e"]
    )
    assert rollup["ALL"] == direct
    exact = df.select("k").distinct().count()
    assert abs(rollup["ALL"] - exact) / exact < 0.05
    for shard in ("0", "1", "2", "3"):
        assert rollup[shard] <= rollup["ALL"] * 1.05


def test_new_operators_handle_empty_input(spark):
    ev = spark.createDataFrame(
        [], "user_id int, ts timestamp, event_type string"
    )
    assert funnel_steps(ev, ["view", "click"]).count() == 0
    # summary still emits one row per step, with zero users
    rows = funnel_summary(ev, ["view", "click"]).collect()
    assert [r["users"] for r in rows] == [0, 0]
    df = spark.createDataFrame([], "id int, v double")
    out = DQ.check_constraints(df, [DQ.not_null("id"), DQ.UniqueRule(("id",))])
    assert {r["rule"]: r["violations"] for r in out.collect()} == {
        "not_null_id": 0,
        "unique_id": 0,
    }
    assert distinct_rollup(df, F.col("id"), F.col("v")).count() == 1  # ALL row


def test_shard_sketches_are_small(spark):
    """The persisted artifact is KBs per shard — that is the point."""
    df = spark.range(10_000).select((F.col("id") % 2).alias("s"), F.col("id").alias("k"))
    sk = shard_sketches(df, F.col("k"), F.col("s"))
    sizes = [len(r["sketch"]) for r in sk.collect()]
    assert len(sizes) == 2 and all(sz < 64 * 1024 for sz in sizes)


def test_funnel_property_matches_python_model(spark):
    """Randomized differential check: the windowed funnel must agree
    with a sequential per-user Python model (first step-k occurrence
    at-or-after the step-(k-1) time) on arbitrary event interleavings,
    including ties and repeated steps."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    steps = ["view", "click", "purchase"]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        events=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=5),   # user
                st.integers(min_value=0, max_value=20),  # minute (ties likely)
                st.sampled_from(steps),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def check(events):
        rows = [
            (u, datetime(2024, 1, 1, 0, m), s) for (u, m, s) in events
        ]
        df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
        got = {
            r["user_id"]: r["steps_completed"]
            for r in funnel_steps(df, steps).collect()
        }
        # python model
        expected = {}
        by_user: dict[int, list] = {}
        for u, m, s in events:
            by_user.setdefault(u, []).append((m, s))
        for u, evs in by_user.items():
            prev = None
            done = 0
            for step in steps:
                cands = [m for (m, s) in evs if s == step and (prev is None or m >= prev)]
                if not cands:
                    break
                prev = min(cands)
                done += 1
            if done >= 1:
                expected[u] = done
        assert got == expected, (events,)

    check()
