"""Hand-computed contracts for the r8 behavior additions."""
from datetime import datetime

from tests.conftest import *  # noqa: F401,F403 (spark fixture)


def test_time_decay_attribution_hand_case(spark):
    """Half-life bucket weights: a touch 1h before the purchase lands
    in bucket 0 (weight 2^40), one 25h before in bucket 1 (2^39), one
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
    # click weight 2^40, view 2^39 -> shares 2/3 and 1/3
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
