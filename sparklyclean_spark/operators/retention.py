"""Cohort retention analysis over an event log.

The standard product-analytics matrix: users are grouped into
cohorts by their FIRST activity day; for each (cohort_day,
day_offset) cell, how many of that cohort's users were active again
``offset`` days later. Distinct from funnels (ordered step
conversion) and sessionization (gap labeling) — this is the
longitudinal comeback curve.

Scale shape: one aggregation to (user, first_day) — map-side
combinable min; one distinct-collapse to (user, active_day); one
equi-join on the user id (AQE-splittable, no broadcast needed at any
cardinality); one final hash agg on the (cohort, offset) cell. Every
shuffle key is either the user id or the bounded cell id — no
windows over raw events, no driver state.

No reference counterpart; §2.10 capability-gap operator (event
analytics family, next to funnel and sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.functions.rounding import ratio4


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """(cohort_day, day_offset, n_active, cohort_size, retention):
    ``n_active`` distinct users of the ``cohort_day`` cohort active
    exactly ``day_offset`` days after their first day (offset 0 =
    the cohort itself, so retention(0) = 1.0). ``retention`` is
    rounded with explicit floor arithmetic (engine-proof, same
    contract as repetition_signals)."""
    day = F.to_date(F.col(ts_col))
    # NULL users are excluded up front: groupBy would count them into
    # cohort_size while the null-unsafe activity join dropped their
    # cells, deflating every retention value and breaking
    # retention(0) = 1.0 (r9 review finding)
    activity = (
        events.where(F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("u"), day.alias("active_day"))
        .distinct()
    )
    firsts = activity.groupBy("u").agg(F.min("active_day").alias("cohort_day"))
    cohort_sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = activity.join(firsts, "u").withColumn(
        "day_offset", F.datediff(F.col("active_day"), F.col("cohort_day"))
    )
    if max_offset_days is not None:
        joined = joined.where(F.col("day_offset") <= max_offset_days)
    cells = joined.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active")  # (u, day) pairs are distinct
    )
    out = cells.join(F.broadcast(cohort_sizes), "cohort_day")
    retention = ratio4("n_active", "cohort_size")
    return out.select(
        "cohort_day",
        F.col("day_offset").cast("int").alias("day_offset"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("cohort_size").cast("bigint").alias("cohort_size"),
        retention.alias("retention"),
    )


def rolling_active_users(
    events: DataFrame,
    days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Trailing ``days``-day distinct active users per calendar day
    (the rolling-DAU/WAU engagement metric). A distinct-count over a
    sliding window cannot use a plain window frame (COUNT(DISTINCT)
    is not frame-able); the scalable shape is contribution explode:
    each distinct (user, day) pair contributes to the ``days``
    observation days it covers, then one distinct-agg per observation
    day. Only days with at least one event are reported (semi-join
    against the actual day set).

    Scale shape: distinct to (user, day) — |users| x |active days|,
    the natural grain; a ``days``-way sequence explode (constant
    fan-out, zero shuffle); one count-distinct hash agg keyed by day
    (bounded by the calendar); a broadcast semi-join trims phantom
    trailing days. No raw-event windows, no driver state. Callers
    that already hold the distinct (u, d) projection pass it via
    ``pairs`` (dau_wau_stickiness does — one distinct shuffle shared
    instead of three independent derivations; r9 review finding).
    """
    if pairs is None:
        pairs = events.select(
            F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
        ).distinct()
    real_days = pairs.select("d").distinct()
    contrib = pairs.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), days - 1))
        ).alias("obs_day"),
    )
    return (
        contrib.join(
            F.broadcast(real_days.select(F.col("d").alias("obs_day"))),
            "obs_day",
            "left_semi",
        )
        .groupBy("obs_day")
        .agg(F.count_distinct("u").alias(f"active_{days}d"))
    )


def dau_wau_stickiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-day DAU/WAU stickiness — the engagement ratio product teams
    track (what share of the week's users showed up today). DAU is
    the day's distinct actives; WAU is the trailing-7-day distinct
    actives from ``rolling_active_users``; the ratio uses the floor
    contract over the two exact integers.

    Scale: the DAU agg and the WAU contribution explode share the one
    distinct (user, day) projection; both aggregations are keyed by
    calendar day (bounded).
    """
    from sparklyclean_spark.cache import tracked_persist

    # ONE persisted distinct (u, d) projection feeds the DAU agg AND
    # both of rolling_active_users' branches (the docstring's sharing
    # claim, now actually implemented)
    pairs = tracked_persist(
        events.select(
            F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
        ).distinct()
    )
    dau = pairs.groupBy(F.col("d").alias("obs_day")).agg(
        F.count_distinct("u").alias("dau")
    )
    wau = rolling_active_users(events, 7, user_col, ts_col, pairs=pairs)

    return dau.join(wau, "obs_day").select(
        "obs_day",
        F.col("dau").cast("bigint").alias("dau"),
        F.col("active_7d").cast("bigint").alias("wau"),
        ratio4("dau", "active_7d").alias("stickiness"),
    )
