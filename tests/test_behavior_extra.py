"""Hand-computed contracts for the r8 behavior additions."""
from datetime import datetime

from tests.conftest import *  # noqa: F401,F403 (spark fixture)


def test_time_decay_attribution_hand_case(spark):
    """Half-life bucket weights: a touch 1h before the purchase lands
    in bucket 0 (weight 2^30), one 25h before in bucket 1 (2^29), one
    8 days before is outside the 7-day window; an untouched purchase
    credits 'direct' in full."""
    from sparklyclean_spark.operators.behavior import time_decay_attribution

    T = datetime(2024, 6, 1, 12, 0, 0)

    def ts(hours_before):
        from datetime import timedelta

        return T - timedelta(hours=hours_before)

    rows = [
        (1, "purchase", T, 30.0, 100),
        (1, "click", ts(1), 0.0, 101),
        (1, "view", ts(25), 0.0, 102),
        (1, "click", ts(24 * 8), 0.0, 103),  # outside the window
        (2, "purchase", T, 5.0, 200),  # no touches -> direct
    ]
    events = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp_ntz,"
        " value double, event_id bigint"
    )
    out = {r.touch_type: r for r in time_decay_attribution(events).collect()}
    assert set(out) == {"click", "view", "direct"}
    # click weight 2^30, view 2^29 -> shares 2/3 and 1/3
    assert out["click"].attributed_purchases == 0.6667
    assert out["view"].attributed_purchases == 0.3333
    assert out["direct"].attributed_purchases == 1.0
    assert out["click"].attributed_value == 20.0
    assert out["view"].attributed_value == 10.0
    assert out["direct"].attributed_value == 5.0


def test_time_decay_rejects_underflowing_window(spark):
    import pytest

    from sparklyclean_spark.operators.behavior import time_decay_attribution

    events = spark.createDataFrame(
        [], "user_id bigint, event_type string, ts timestamp_ntz,"
        " value double, event_id bigint"
    )
    with pytest.raises(ValueError):
        time_decay_attribution(events, window_days=60, halflife_hours=1)
    # non-positive half-life: negative passes the max_k guard (floor
    # division on negatives goes negative) and would wrap shiftleft
    # mod 64; 0 would ZeroDivisionError — both must raise up front
    with pytest.raises(ValueError):
        time_decay_attribution(events, halflife_hours=0)
    with pytest.raises(ValueError):
        time_decay_attribution(events, halflife_hours=-6)


def test_session_peak_concurrency_hand_case(spark):
    """Three users; two sessions overlap in the middle, a third user's
    session touches the boundary microsecond (closed-interval: still
    counts), peak = 3 at the exact instant user 3 starts."""
    from datetime import datetime, timedelta

    from sparklyclean_spark.operators.sessions import session_peak_concurrency

    T = datetime(2024, 6, 1, 12, 0, 0)

    def ev(uid, mins, eid):
        return (uid, "view", T + timedelta(minutes=mins), 0.0, eid)

    rows = [
        ev(1, 0, 1), ev(1, 30, 2),          # session A: [0, 30]
        ev(2, 10, 3), ev(2, 40, 4),         # session B: [10, 40]
        ev(3, 30, 5),                        # session C: [30, 30] — touches A's end
        ev(1, 60 * 10, 6),                   # A2: far later, gap > 4h
    ]
    events = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp_ntz,"
        " value double, event_id bigint"
    )
    row = session_peak_concurrency(events).collect()[0]
    assert row.n_sessions == 4
    # at minute 30: A still open (closed interval), B open, C starts -> 3
    assert row.peak_concurrent == 3
    assert row.first_peak_ts == T + timedelta(minutes=30)
    # bucketed prefix-sum path (scale variant): value-identical even
    # with 1h buckets that split these sessions across buckets
    rb = session_peak_concurrency(events, bucket_hours=1).collect()[0]
    assert rb == row


def test_peak_concurrency_bucketed_parity_random(spark):
    """Bucketed prefix-sum sweep == global-order sweep on a randomized
    interval soup, including simultaneous starts/ends at bucket
    boundaries (peers must land in ONE bucket and offsets must carry
    exactly)."""
    import random
    from datetime import datetime, timedelta

    from sparklyclean_spark.operators.sessions import session_peak_concurrency

    rng = random.Random(647)
    T = datetime(2024, 6, 1, 0, 0, 0)
    rows = []
    eid = 0
    for uid in range(60):
        t = T + timedelta(minutes=rng.randrange(0, 72 * 60))
        for _ in range(rng.randrange(1, 6)):
            eid += 1
            rows.append((uid, "view", t, 0.0, eid))
            # some gaps exceed 4h -> multiple sessions per user; some
            # land exactly on hour marks -> bucket-boundary peers
            t += timedelta(minutes=rng.choice([0, 15, 60, 300]))
    events = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp_ntz,"
        " value double, event_id bigint"
    )
    base = session_peak_concurrency(events).collect()[0]
    for bh in (1, 7, 24):
        assert session_peak_concurrency(events, bucket_hours=bh).collect()[0] == base
