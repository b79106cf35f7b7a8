"""Ordered funnel analysis over an event stream.

"Of the users who did step 1, how many went on to do step 2 AFTER
step 1, then step 3 after that?" — the standard product-analytics
query, and a shape Spark has no built-in for.

Scale shape: ONE shuffle. All per-user work runs as window functions
over the SAME ``partitionBy(user)`` spec, so Catalyst plans a single
``Exchange hashpartitioning(user)`` + one sort and evaluates the
step-k expressions in consecutive Window operators over that one
physical partitioning (no join per step, which is the naive
formulation and costs one shuffle per funnel stage). Step times are
defined recursively — ``t_k = min(ts where type = step_k and
ts >= t_{k-1})`` — i.e. strictly ordered sequences; ties (same
timestamp) count as progression, matching the DuckDB oracle.

The final rollup is a tiny global aggregation (one row per funnel
step after the per-user reduction, which shrinks the data to one row
per user BEFORE the global agg — map-side combinable).

No reference counterpart; §2.10 training/analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel progression: one row per user who completed
    step 1, with ``step_<k>_ts`` timestamps (NULL once the funnel is
    abandoned) and ``steps_completed``."""
    if len(set(steps)) != len(steps):
        # a repeated step name lets ONE event satisfy two consecutive
        # steps (ts >= prev includes the event itself), reporting 100%
        # conversion for view->view funnels (r9 review finding);
        # repeated-step funnels need event-level ordering this shape
        # does not model — refuse loudly
        raise ValueError("steps must be distinct event types")
    w = Window.partitionBy(user_col)
    df = events.where(F.col(type_col).isin(steps))
    prev = None
    for i, s in enumerate(steps, start=1):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        name = f"step{i}_ts"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
    step_cols = [f"step{i}_ts" for i in range(1, len(steps) + 1)]
    per_user = (
        df.groupBy(user_col)
        .agg(*[F.min(c).alias(c) for c in step_cols])
        .where(F.col("step1_ts").isNotNull())
    )
    completed = sum(
        [F.col(c).isNotNull().cast("int") for c in step_cols],
        F.lit(0),
    )
    return per_user.withColumn("steps_completed", completed)


def funnel_summary(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel rollup: ``(step_idx, step, users, pct_of_entry)`` —
    users reaching each step in order, as a fraction of step-1 users."""
    per_user = funnel_steps(events, steps, user_col, ts_col, type_col)
    aggs = [
        # coalesce: sum over zero entrants is NULL, report 0 users
        F.coalesce(
            F.sum((F.col("steps_completed") >= i).cast("bigint")), F.lit(0)
        ).alias(f"_u{i}")
        for i in range(1, len(steps) + 1)
    ]
    wide = per_user.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"_u{i}").alias("users"),
                # try_divide: zero entrants -> NULL pct, not an ANSI
                # error; floor-6 contract (not engine round) so a tie
                # at the 7th decimal cannot split Spark from DuckDB
                (
                    F.floor(
                        F.try_divide(F.col(f"_u{i}") * 1000000.0, F.col("_u1"))
                        + 0.5
                    )
                    / 1000000.0
                ).alias("pct_of_entry"),
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return wide.select(F.inline(rows))
