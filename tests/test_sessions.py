"""Batch sessionization: semantics against a sequential Python model,
edge cases (exact-gap boundary, single event, duplicate timestamps),
and the one-shuffle plan claim.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from sparklyclean_spark.operators.sessions import session_summary, sessionize


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_id bigint")


T0 = datetime(2024, 1, 1, 12, 0, 0)


def test_gap_boundary_is_closed(spark):
    """A gap of EXACTLY gap_seconds continues the session (matches
    session_window's [start, last+gap) semantics); gap+1 breaks it."""
    rows = [
        (1, T0, 1),
        (1, T0 + timedelta(seconds=600), 2),  # exactly the gap: same session
        (1, T0 + timedelta(seconds=1201), 3),  # 601 s after prev: new session
    ]
    out = sessionize(_events(spark, rows), gap_seconds=600).orderBy("event_id")
    assert [r.session_idx for r in out.collect()] == [1, 1, 2]


def test_sessionize_tiebreaker_is_deterministic(spark):
    """Duplicate timestamps: with the tiebreaker param, per-event
    labels are a pure function of (ts, event_id) — five runs agree."""
    rows = [
        (1, T0, 2),
        (1, T0, 1),  # same ts, lower id — must order first
        (1, T0 + timedelta(seconds=700), 3),
    ]
    seen = set()
    for _ in range(5):
        out = sessionize(
            _events(spark, rows), gap_seconds=600, tiebreaker="event_id"
        ).orderBy("event_id")
        seen.add(tuple((r.event_id, r.session_idx) for r in out.collect()))
    assert seen == {((1, 1), (2, 1), (3, 2))}


def test_sessions_match_sequential_model(spark):
    """Differential test vs a single-threaded Python sessionizer over a
    deterministic multi-user event log."""
    rows = []
    eid = 0
    for u in range(7):
        t = T0
        for i in range(40):
            # deterministic pseudo-gaps: mix of short (in-session) and
            # long (session-breaking) intervals, user-dependent phase
            gap = [120, 300, 4000, 60, 7200, 30][(i + u) % 6]
            t = t + timedelta(seconds=gap)
            rows.append((u, t, eid))
            eid += 1

    gap_s = 1800
    # sequential truth
    expect = {}
    state: dict[int, tuple[datetime, int]] = {}
    for u, t, e in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        prev, idx = state.get(u, (None, 0))
        if prev is None or (t - prev).total_seconds() > gap_s:
            idx += 1
        state[u] = (t, idx)
        expect[e] = idx

    out = sessionize(_events(spark, rows), gap_seconds=gap_s)
    got = {r.event_id: r.session_idx for r in out.collect()}
    assert got == expect

    # summary: one row per (user, session), counts add back to events
    summ = session_summary(
        _events(spark, rows), gap_seconds=gap_s, tiebreaker="event_id"
    ).collect()
    truth_sessions = {(u, i) for (u, (_t, last)) in state.items() for i in range(1, last + 1)}
    assert {(r.user_id, r.session_idx) for r in summ} == truth_sessions
    assert sum(r.n_events for r in summ) == len(rows)
    for r in summ:
        assert r.duration_sec == int((r.session_end - r.session_start).total_seconds())
        assert r.session_id == f"{r.user_id}-{r.session_idx}"


def test_duplicate_timestamps_deterministic(spark):
    """With a tiebreaker, duplicate timestamps get a stable order and
    never split a session (gap 0 between equal timestamps)."""
    rows = [
        (5, T0, 10),
        (5, T0, 11),  # same instant
        (5, T0 + timedelta(seconds=3600), 12),
    ]
    summ = session_summary(
        _events(spark, rows), gap_seconds=600, tiebreaker="event_id"
    ).orderBy("session_idx")
    got = [(r.session_idx, r.n_events) for r in summ.collect()]
    assert got == [(1, 2), (2, 1)]


def test_single_event_user_and_empty(spark):
    one = sessionize(_events(spark, [(9, T0, 1)]), gap_seconds=60)
    row = one.collect()[0]
    assert (row.session_idx, row.session_id) == (1, "9-1")
    empty = session_summary(_events(spark, []), gap_seconds=60)
    assert empty.count() == 0


def test_sessionize_single_exchange(spark):
    """lag, the running sum, and the summary agg must all share ONE
    hashpartitioning(user_id) exchange."""
    plan = session_summary(
        _events(spark, [(1, T0, 1)]), gap_seconds=60, tiebreaker="event_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_session_sequences_order_and_partitioning(spark):
    """Sequences are chronological within a session (tiebroken by
    event_id), bounded by the session, and assembly shares the single
    exchange with the labeling."""
    from sparklyclean_spark.operators.sessions import session_sequences

    rows = [
        (1, T0, 1, "view"),
        (1, T0, 0, "land"),  # same instant: event_id orders it first
        (1, T0 + timedelta(seconds=300), 2, "click"),
        (1, T0 + timedelta(seconds=7200), 3, "view"),  # new session
        (2, T0, 4, "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )
    out = session_sequences(df, gap_seconds=1800, tiebreaker="event_id")
    got = {r.session_id: (r.sequence, r.seq_len) for r in out.collect()}
    assert got == {
        "1-1": ("land>view>click", 3),
        "1-2": ("view", 1),
        "2-1": ("view", 1),
    }
    plan = (
        session_sequences(df, gap_seconds=1800, tiebreaker="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_cohort_retention_model(spark):
    """Retention matrix vs a hand-built cohort: offset-0 retention is
    1.0, comeback cells count distinct users, quiet days emit no cell."""
    from sparklyclean_spark.operators.retention import cohort_retention

    rows = [
        # users 1,2 start day 0; user 1 returns day 2 (twice -> 1 distinct)
        (1, T0, 1), (2, T0, 2),
        (1, T0 + timedelta(days=2), 3), (1, T0 + timedelta(days=2, hours=4), 4),
        # user 3 starts day 1, returns day 2
        (3, T0 + timedelta(days=1), 5), (3, T0 + timedelta(days=2), 6),
    ]
    out = {
        (str(r["cohort_day"]), r["day_offset"]): (
            r["n_active"], r["cohort_size"], r["retention"]
        )
        for r in cohort_retention(_events(spark, rows)).collect()
    }
    d0 = str(T0.date())
    d1 = str((T0 + timedelta(days=1)).date())
    assert out[(d0, 0)] == (2, 2, 1.0)
    assert out[(d0, 2)] == (1, 2, 0.5)
    assert out[(d1, 0)] == (1, 1, 1.0)
    assert out[(d1, 1)] == (1, 1, 1.0)
    assert (d0, 1) not in out  # nobody from cohort d0 active on day 1
