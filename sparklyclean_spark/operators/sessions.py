"""Batch sessionization: gap-based session ids over an event log.

The classic clickstream primitive — consecutive events of one user
belong to the same session while the gap between them stays under a
threshold; a gap >= threshold starts a new session. The streaming
side of the engine already has ``session_window`` aggregation
(``streaming/windows.py``); this is the BATCH form that also hands
back the per-event session labels (the streaming built-in only
emits per-session aggregates).

Scale shape: ONE shuffle. ``lag`` (gap detection) and the running
``sum`` (session index) are both windows over the SAME
``partitionBy(user) orderBy(ts)`` spec, so Catalyst plans a single
``Exchange hashpartitioning(user)`` + one sort and stacks the two
Window operators on that one physical partitioning. Per-user state
is a running counter — nothing is buffered beyond the sort. The
session rollup is a map-side-combinable hash agg on
``(user, session_idx)``, which is a prefix of the existing
clustering, so AQE sees a co-partitioned agg.

At 100 TB: sessions never straddle users, so the only skew risk is
a bot-grade hot user; the per-event labeling remains a single
sequential scan of that user's sorted partition (no pair blowup),
which is the best any engine can do for an order-dependent
recurrence.

No reference counterpart (the reference is batch record-linkage
only); §2.10 analytics surface. Mirrors the semantics of
Spark's ``session_window(gap)`` / BigQuery ``SESSIONIZE`` /
Snowplow sessionization: a new session starts when
``ts - prev_ts > gap`` (a gap of EXACTLY ``gap`` continues the
session, matching ``session_window``'s closed-open [start,
last+gap) semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Label every event with ``session_idx`` (1-based per user) and
    ``session_id`` (``<user>-<idx>``, globally unique). Pass
    ``tiebreaker`` (a unique column, e.g. an event id) whenever
    duplicate timestamps are possible — without it, which of two
    equal-``ts`` events is "previous" is plan-dependent and per-event
    labels can flicker across runs. Session BOUNDARIES are unaffected
    by tie order (equal timestamps have gap 0), so summaries stay
    stable either way; the registered query passes ``event_id``.
    """
    order_cols = [ts_col] + ([tiebreaker] if tiebreaker else [])
    return _sessionize_ordered(events, gap_seconds, user_col, order_cols)


def _sessionize_ordered(
    events: DataFrame,
    gap_seconds: int,
    user_col: str,
    order_cols: list[str],
) -> DataFrame:
    ts_col = order_cols[0]
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    prev = F.lag(ts_col).over(w)
    # Compare at MICROSECOND resolution: timestamp_diff handles
    # TIMESTAMP and TIMESTAMP_NTZ alike (a plain cast-to-long rejects
    # NTZ), and at µs granularity "true difference" and "boundary
    # crossings" coincide, so the recurrence is engine-portable
    # (Spark's SECOND unit truncates the difference while DuckDB's
    # date_diff counts second boundaries — they disagree on
    # sub-second data).
    new_session = F.when(
        prev.isNull()
        | (
            F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
            > gap_seconds * 1_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        events.withColumn("_new", new_session)
        .withColumn("session_idx", F.sum("_new").over(run).cast("int"))
        .drop("_new")
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_idx")),
        )
    )


def session_sequences(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreaker: str | None = None,
    sep: str = ">",
) -> DataFrame:
    """Per-session ordered event-type sequences — the construction
    step for behavioral sequence modeling (next-event prediction
    training rows): one row per session with the chronological
    ``sequence`` string and its length.

    Ordering inside a session is done engine-side with
    ``sort_array(collect_list(struct(order..., type)))`` rather than a
    window + collect_list (whose order is only a partition-sort side
    effect); the struct sort makes the sequence order an explicit,
    engine-portable property. The agg keys ``(user, session_idx)``
    prefix sessionize's hash partitioning, so sequence assembly adds
    no exchange beyond the one the labeling already paid (same
    single-exchange claim as ``session_summary``, plan-asserted in
    pytest).

    At 100 TB the per-session state is the session's own events —
    bounded by the gap parameter, never the user's full history.
    """
    order_cols = [ts_col] + ([tiebreaker] if tiebreaker else [])
    labeled = _sessionize_ordered(events, gap_seconds, user_col, order_cols)
    # NULL event types render as the U+001F sentinel token: array_join
    # silently SKIPS null elements, which would leave sequence token
    # count < seq_len (r9 review finding) — the sentinel keeps the two
    # consistent and makes the null event visible instead of vanishing
    packed = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order_cols],
                F.coalesce(F.col(type_col), F.lit("\x1f")).alias("_t"),
            )
        )
    )
    return labeled.groupBy(user_col, "session_idx", "session_id").agg(
        F.array_join(packed.getField("_t"), sep).alias("sequence"),
        F.count(F.lit(1)).alias("seq_len"),
    )


def session_summary(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreaker: str | None = None,
) -> DataFrame:
    """One row per session: bounds, event count, duration seconds.

    The agg keys ``(user, session_idx)`` are a prefix of the
    labeling's hash partitioning, so the rollup adds no exchange
    beyond the one sessionize already paid.
    """
    order_cols = [ts_col] + ([tiebreaker] if tiebreaker else [])
    labeled = _sessionize_ordered(events, gap_seconds, user_col, order_cols)
    return labeled.groupBy(user_col, "session_idx", "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        # floor-of-true-difference seconds, stated via the exact µs
        # diff so the oracle can reproduce it bit-for-bit
        F.floor(
            F.timestamp_diff("MICROSECOND", F.min(ts_col), F.max(ts_col))
            / F.lit(1_000_000)
        ).alias("duration_sec"),
    )


def session_path_ngrams(
    events: DataFrame,
    n: int = 3,
    gap_seconds: int = 1800,
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreaker: str | None = None,
    sep: str = ">",
) -> DataFrame:
    """Most common within-session event-type paths of length ``n`` —
    the funnel-discovery complement to ``funnel_steps`` (which checks
    a KNOWN path; this mines the paths worth checking). One row per
    surviving n-gram: ``(path, count)``, top_k by (count desc, path
    asc).

    Paths never cross a session boundary: the lead window is keyed by
    (user, session_idx), so the (n-1) trailing events of every session
    produce NULL leads and drop out.

    Scale: sessionize's single user-keyed exchange, then a lead window
    on the same partitioning (no extra exchange), one hash agg onto
    the bounded path vocabulary, top-k sorted limit.
    """
    order_cols = [ts_col] + ([tiebreaker] if tiebreaker else [])
    labeled = _sessionize_ordered(events, gap_seconds, user_col, order_cols)
    w = Window.partitionBy(user_col, "session_idx").orderBy(
        *[F.col(c) for c in order_cols]
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, j).over(w) for j in range(1, n)
    ]
    # EVERY step must be non-null, not just the last: concat_ws skips
    # null elements, so a window with a null middle type would emit an
    # (n-1)-token string counted as a full n-gram and collide with
    # genuine shorter paths (r9 review finding)
    full = steps[0].isNotNull()
    for s_ in steps[1:]:
        full = full & s_.isNotNull()
    paths = labeled.select(
        F.concat_ws(sep, *steps).alias("path"),
        full.alias("_full"),
    ).where(F.col("_full"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("count"))
        .orderBy(F.desc("count"), F.asc("path"))
        .limit(top_k)
    )


def session_peak_concurrency(
    events: DataFrame,
    gap_seconds: int = 14400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreaker: str | None = "event_id",
    bucket_hours: int | None = None,
) -> DataFrame:
    """Sweep-line peak concurrency over session intervals: the maximum
    number of sessions open at once (closed intervals [start, end]),
    plus when it is first reached — the capacity-planning number
    (peak simultaneous users) that per-day actives cannot give you.
    One row: ``(n_sessions, peak_concurrent, first_peak_ts)``.

    Sweep semantics: +1 at each session start, -1 at its end, swept in
    ``(t ASC, delta DESC)`` order so starts at a microsecond count
    before ends at the same microsecond — a session ending exactly
    when another starts overlaps it (closed-interval reading). The
    default window frame (RANGE to CURRENT ROW) aggregates peer rows
    together in BOTH engines, which is exactly right: simultaneous
    starts surface their combined concurrency at once. Everything is
    exact integers + a min-timestamp tiebreak, so the row is
    hash-checkable.

    Scale: the sweep's global running sum is inherently sequential,
    but it runs over 2·#sessions points (already aggregated from
    events), not raw events — the same bounded-global-order trade as
    ks_test's ECDF. At extreme session counts, pass ``bucket_hours``:
    points are bucketed by time, per-bucket running sums compute in
    parallel (one bucket-keyed window — no global-order exchange over
    points), and each bucket adds a broadcast exclusive-prefix offset
    computed over the BUCKET TOTALS table (#buckets rows, bounded).
    Peers at one microsecond share a bucket and buckets partition the
    time axis, so bucketed (t, d DESC) order IS the global sweep
    order — the two paths are value-identical (pytest parity gate).
    """
    from sparklyclean_spark.cache import tracked_persist

    order_cols = [ts_col] + ([tiebreaker] if tiebreaker else [])
    labeled = _sessionize_ordered(events, gap_seconds, user_col, order_cols)
    # spans (2 narrow rows per session) feed three consumers — the
    # count, the peak scan, and the first-peak join; persist so the
    # sessionize shuffle + global sweep sort run once, not three times
    spans = tracked_persist(
        labeled.groupBy(user_col, "session_idx").agg(
            F.min(ts_col).alias("_s"), F.max(ts_col).alias("_e")
        )
    )
    spans.count()
    pts = spans.select(F.col("_s").alias("t"), F.lit(1).alias("d")).unionAll(
        spans.select(F.col("_e").alias("t"), F.lit(-1).alias("d"))
    )
    if bucket_hours:
        bucket_us = bucket_hours * 3_600_000_000
        # NTZ epoch literal: to_timestamp yields a session-timezone
        # TIMESTAMP, and mixing it with NTZ event times makes bucket
        # boundaries depend on spark.sql.session.timeZone (value-safe
        # — the coercion is monotone — but bucket placement drifted
        # with config; the repo's NTZ-everywhere rule applies)
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        pts = pts.withColumn(
            "_bkt",
            F.floor(
                F.timestamp_diff("MICROSECOND", epoch, F.col("t"))
                / F.lit(bucket_us)
            ),
        )
        wloc = Window.partitionBy("_bkt").orderBy(
            F.col("t").asc(), F.col("d").desc()
        )
        tot = pts.groupBy("_bkt").agg(F.sum("d").alias("_tot"))
        woff = Window.orderBy("_bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = tot.select(
            "_bkt", F.coalesce(F.sum("_tot").over(woff), F.lit(0)).alias("_off")
        )
        run = pts.withColumn("_loc", F.sum("d").over(wloc)).join(
            F.broadcast(offs), "_bkt"
        ).select("t", "d", (F.col("_loc") + F.col("_off")).alias("_run"))
    else:
        w = Window.orderBy(F.col("t").asc(), F.col("d").desc())
        run = pts.select("t", "d", F.sum("d").over(w).alias("_run"))
    run = tracked_persist(run)
    run.count()
    n_sessions = spans.agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    peak = run.agg(F.max("_run").cast("bigint").alias("peak_concurrent"))
    first = (
        run.join(F.broadcast(peak), run["_run"] == peak["peak_concurrent"])
        .agg(F.min("t").alias("first_peak_ts"))
    )
    return n_sessions.join(F.broadcast(peak)).join(F.broadcast(first))
