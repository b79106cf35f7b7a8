"""As-of (nearest-timestamp) join — match each left row to the most
recent right row at-or-before its timestamp (backward; forward is the
mirror). The workhorse of event-stream enrichment ("attach the last
click before each purchase", "price as of trade time").

Spark has no built-in ASOF JOIN (DuckDB/Pandas do). The naive
translation — a non-equi join ``l.ts >= r.ts`` plus a per-left-row
max — plans a broadcast-nested-loop or sort-merge over the FULL
cross product per key and collapses at scale.

This implementation is the sort-based shape a native engine uses,
expressed in DataFrame algebra:

1. union left and right into one stream tagged ``__side``
   (payloads boxed in one struct per side, so the window tracks a
   single column regardless of payload width);
2. one window over (keys) ordered by (ts, side):
   ``last(right_payload, ignorenulls=True)`` carries the latest
   right row seen so far — rights sort before lefts on ties, so
   the match is inclusive (>=), matching DuckDB ASOF semantics;
3. keep left rows, unbox the matched struct.

Cost: ONE shuffle on the key columns + one sort — identical to a
sort-merge join, linear in |L|+|R| per key, no pair explosion,
whole-stage-codegen window. Survives arbitrary key skew better than
a per-key collect (running state is O(1) per row).

Determinism: if several right rows share (keys, ts), ``last`` picks
the final one in sort order, which is not total — pre-dedupe the
right side to one row per (keys, ts) when that matters (the
registered query's events table is unique per (type, user, ts)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_RPAY = "__asof_rpay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_prefix: str = "r_",
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row whose ``right_ts`` is
    nearest at-or-before ``left_ts`` (``backward``) or at-or-after
    (``forward``), per ``on`` key. Right columns (except keys) come
    back prefixed with ``right_prefix``; unmatched lefts keep NULLs
    (``how="left"``) or drop (``how="inner"``). ``tolerance_seconds``
    voids matches farther than the bound (NULL / drop per ``how``)."""
    if right_ts is None:
        right_ts = left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")

    right_payload = [c for c in right.columns if c not in on]
    # left rows sort AFTER right rows on timestamp ties (side 1 > 0),
    # so an equal-timestamp right is visible: inclusive match.
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns if c not in on],
        F.lit(None)
        .cast(
            "struct<" + ", ".join(
                f"`{c}`: {dict(right.dtypes)[c]}" for c in right_payload
            ) + ">"
        )
        .alias(_RPAY),
    )
    # a NULL right timestamp cannot be "at or before" anything — under
    # backward's ascending order NULLs sort FIRST and their payload
    # would ride last(ignorenulls) into every left row preceding a
    # real match (r9 review finding; DuckDB ASOF drops them too)
    r_tagged = right.where(F.col(right_ts).isNotNull()).select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in on],
        F.struct(*right_payload).alias(_RPAY),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        order = [F.asc(_TS), F.asc(_SIDE)]
    else:
        # descending scan: the running "last" right is the SMALLEST
        # ts >= left ts; equal-ts rights still sort before lefts
        order = [F.desc(_TS), F.asc(_SIDE)]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _RPAY, F.last(_RPAY, ignorenulls=True).over(w)
    ).where(F.col(_SIDE) == 1)

    if tolerance_seconds is not None:
        ts_type = dict(left.dtypes)[left_ts]
        if ts_type.startswith("timestamp"):
            # MICROSECOND diff, not SECOND: Spark's SECOND truncates
            # and DuckDB's date_diff counts boundary crossings — they
            # agree only at the finest granularity, so the tolerance
            # bound is compared exactly in integer microseconds
            # (timestampdiff handles TIMESTAMP and TIMESTAMP_NTZ
            # alike; NTZ refuses a bigint cast)
            gap = F.abs(
                F.expr(f"timestampdiff(MICROSECOND, {_RPAY}.`{right_ts}`, {_TS})")
            )
            # round, don't truncate: a fractional tolerance (0.5 s)
            # must mean 500_000 µs, not 0
            bound = F.lit(int(round(tolerance_seconds * 1_000_000))).cast("bigint")
        else:
            gap = F.abs(F.col(_TS) - F.col(f"{_RPAY}.`{right_ts}`"))
            bound = F.lit(tolerance_seconds)
        matched = matched.withColumn(
            _RPAY, F.when(gap <= bound, F.col(_RPAY))
        )
    if how == "inner":
        matched = matched.where(F.col(_RPAY).isNotNull())

    out_cols = (
        [F.col(c) for c in on]
        + [F.col(_TS).alias(left_ts)]
        + [F.col(c) for c in left.columns if c not in on and c != left_ts]
        + [
            F.col(f"{_RPAY}.{c}").alias(f"{right_prefix}{c}")
            for c in right_payload
        ]
    )
    return matched.select(*out_cols)


def asof_join_naive(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
) -> DataFrame:
    """Quadratic differential oracle for tests: non-equi join + row_number.
    Backward-inclusive only. Do not run at scale."""
    if right_ts is None:
        right_ts = left_ts
    right_payload = [c for c in right.columns if c not in on]
    l = left.select(*left.columns, F.monotonically_increasing_id().alias("__lid"))
    cond = [l[k] == right[k] for k in on] + [l[left_ts] >= right[right_ts]]
    j = l.join(right, cond, "left")
    w = Window.partitionBy("__lid").orderBy(F.desc_nulls_last(right[right_ts]))
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            *[l[c] for c in left.columns],
            *[right[c].alias(f"r_{c}") for c in right_payload],
        )
    )
