"""Behavioral sequence analytics over an event log: next-event
transition matrix (Markov profile), last-touch conversion
attribution, and inter-arrival gap percentiles.

These are the sequence-model cousins of the existing event family
(funnel = ordered step conversion, sessionize = gap labeling,
retention = comeback curve): the transition matrix is the
first-order behavioral LM a training-data pipeline profiles before
sampling event sequences; attribution and inter-arrival stats are
the standard product-analytics readouts over the same log.

Scale shape shared by all three: ONE window (or lag) over ONE
``hashpartitioning(user)`` exchange derives the per-row sequence
feature map-side; every downstream aggregation is keyed on a
BOUNDED domain (event-type, type-pair, or touch-type), so the final
shuffles carry O(#types²) rows regardless of corpus size. No
driver state, no raw-event re-sorts.

No reference counterpart; SURVEY §2.10 capability-gap operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparklyclean_spark.functions.rounding import ratio4, round4


def _transition_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
    from_name: str,
    to_name: str,
    count_name: str,
) -> DataFrame:
    """Shared (prev, next) transition extraction + count agg of
    transition_matrix AND transition_entropy (one copy of the lead
    window, null-next drop, and tiebreak policy, so the entropy
    metrics can never silently diverge from the matrix they are
    documented to be computed over)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = events.select(
        F.col(type_col).alias(from_name),
        F.lead(type_col).over(w).alias(to_name),
    ).where(F.col(to_name).isNotNull())
    return pairs.groupBy(from_name, to_name).agg(
        F.count(F.lit(1)).alias(count_name)
    )


def transition_matrix(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order event-type transition counts and probabilities.

    For each user's chronological event sequence (``ts`` order,
    ``tiebreak_col`` makes the order total — timestamps can tie at
    microsecond resolution), every consecutive pair contributes one
    ``(from_type, to_type)`` transition. Output probabilities are
    row-normalized per ``from_type`` with the repo's engine-portable
    floor rounding.

    Scale: the lead() window rides one hashpartitioning(user)
    exchange; the pair aggregation is map-side combinable and its
    key domain is #types² — the totals join is a broadcast of a
    #types-row table.
    """
    counts = _transition_counts(
        events, user_col, ts_col, type_col, tiebreak_col,
        "from_type", "to_type", "n_transitions",
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        F.col("n_from").cast("bigint").alias("n_from"),
        ratio4("n_transitions", "n_from").alias("prob"),
    )


def last_touch_attribution(
    events: DataFrame,
    purchase_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    window_days: int = 7,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Attribute each purchase to the user's most recent PRIOR touch
    event (click/view) within ``window_days``; purchases with no
    in-window touch are 'direct'. Output: per touch-type purchase
    count and attributed revenue.

    The carry-forward is ``last(..., ignorenulls)`` over a
    ``(unboundedPreceding, -1)`` frame in (ts, tiebreak) order — the
    strict -1 upper bound excludes the purchase row itself, and the
    recency window compares integer MICROSECONDS (`timestamp_diff`),
    the engine-portable granularity (Spark SECOND truncates, DuckDB
    date_diff counts boundaries; they agree only at µs).

    Scale: one hashpartitioning(user) window exchange; the final
    aggregation's key domain is len(touch_types)+1.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(list(touch_types))
    touch_ts = F.last(F.when(is_touch, F.col(ts_col)), ignorenulls=True).over(w)
    touch_ty = F.last(F.when(is_touch, F.col(type_col)), ignorenulls=True).over(w)
    limit_us = F.lit(window_days * 86_400_000_000).cast("bigint")
    touch = F.when(
        F.col("_tts").isNotNull()
        & (F.timestamp_diff("MICROSECOND", F.col("_tts"), F.col(ts_col)) <= limit_us),
        F.col("_tty"),
    ).otherwise(F.lit("direct"))
    flagged = events.select(
        F.col(ts_col),
        F.col(type_col),
        F.col(value_col),
        touch_ts.alias("_tts"),
        touch_ty.alias("_tty"),
    ).where(F.col(type_col) == purchase_type)
    return (
        flagged.select(touch.alias("touch_type"), F.col(value_col).alias("_v"))
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            # q1-precedent rounding: ROUND(SUM(double), 4) — the sum's
            # associativity error is orders of magnitude below the
            # 4-decimal grid at any realistic row count
            F.round(F.sum("_v"), 4).alias("total_value"),
        )
        .select(
            "touch_type",
            F.col("n_purchases").cast("bigint").alias("n_purchases"),
            "total_value",
        )
    )


def interarrival_stats(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per event-type inter-arrival gap percentiles (p50/p90/p99)
    between consecutive events of the same (user, type) stream —
    the cadence profile behind watermark and session-gap tuning.

    Gaps are measured in WHOLE SECONDS via integer µs division
    (``µs div 1_000_000`` — exact in both engines, and it keeps the
    percentile interpolation inputs small enough that the 4-decimal
    floor rounding stays inside exact double range; raw µs × 10⁴
    would overflow the 2^53 integer-exact window).

    Scale: the lag() rides one hashpartitioning(user, type)
    exchange. The exact grouped percentile then gathers each type's
    gaps onto one reducer — the documented exact-percentile shape
    (same trade as price_percentiles_by_priority); at corpus scale
    flip to approx_percentile, which is mergeable and map-side.
    """
    w = Window.partitionBy(user_col, type_col).orderBy(ts_col, tiebreak_col)
    gap_us = F.timestamp_diff(
        "MICROSECOND", F.lag(ts_col).over(w), F.col(ts_col)
    )
    gaps = (
        events.select(
            F.col(type_col).alias("event_type"), gap_us.alias("_gap_us")
        )
        .where(F.col("_gap_us").isNotNull())
        # integer division (gaps are >= 0 within an ordered stream):
        # exact in both engines, unlike a double divide + truncate
        .select("event_type", F.expr("_gap_us div 1000000").alias("_gap_s"))
    )
    pct = F.percentile("_gap_s", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    out = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"), pct.alias("_p")
    )
    return out.select(
        "event_type",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        round4(F.col("_p")[0]).alias("p50_gap_s"),
        round4(F.col("_p")[1]).alias("p90_gap_s"),
        round4(F.col("_p")[2]).alias("p99_gap_s"),
    )


def daily_volume_anomaly(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    baseline_days: int = 28,
    min_baseline: int = 7,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Per-type daily event-volume anomaly flags: each day's count is
    z-scored against its own trailing ``baseline_days`` window
    (EXCLUDING the current day — the day under test must not dilute
    its own baseline), flagged when ``|z| >= z_thresh`` with at least
    ``min_baseline`` prior days observed. The volume-monitoring alarm
    every ingest pipeline runs.

    Hash-stable arithmetic: the window aggregates are exact integer
    sums (count, sum, sum of squares), and every derived double
    (mean, variance via the sum-of-squares identity, sqrt, z) is the
    SAME single-IEEE-op expression tree on both engines, so the
    result is bit-identical; z is then snapped to the 4-decimal floor
    grid. Variance is clamped at 0 (the identity can go ~-1e-12 on
    constant streams). The ``bs²`` square is EXACT integer arithmetic
    on both sides (the oracle multiplies the raw integers too — a
    double-side multiply would round one op earlier and can differ by
    1 ulp once bs exceeds 2^26); under ANSI mode the bigint square
    overflows loudly (not wrongly) past bs ≈ 3·10⁹ events per
    baseline window — switch the accumulators to DECIMAL(38,0) if a
    single (type, 28-day) cell can ever hold that much.

    Scale: one hash agg to (type, day) — map-side combinable — then a
    RANGE window over the per-type DAILY series (bounded: #types ×
    #days rows), never over raw events.
    """
    daily = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.to_date(ts_col).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    day_num = F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy(day_num)
        .rangeBetween(-baseline_days, -1)
    )
    stats = daily.select(
        "event_type",
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("_bn"),
        F.sum("n_events").over(w).cast("bigint").alias("_bs"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w)
        .cast("bigint")
        .alias("_bss"),
    )
    # every division sits under a WHEN guard: ANSI mode (the driver
    # runs with spark.sql.ansi.enabled=true) turns an unguarded /0 on
    # the first/second day of a type into a query-killing error, and
    # the DuckDB oracle mirrors the same CASE tree
    bn = F.col("_bn")
    mean = F.when(bn > 0, F.col("_bs") / bn)
    var = F.when(
        bn > 1,
        F.greatest(
            (F.col("_bss") - F.col("_bs") * F.col("_bs") / bn) / (bn - 1),
            F.lit(0.0),
        ),
    )
    sd = F.sqrt(var)
    z = F.when(
        (bn >= min_baseline) & (sd > 0.0),
        (F.col("n_events") - mean) / sd,
    )
    z4 = round4(z)
    return stats.select(
        "event_type",
        "day",
        "n_events",
        F.col("_bn").alias("baseline_days"),
        z4.alias("z"),
        F.coalesce(F.abs(z4) >= z_thresh, F.lit(False)).alias("is_anomaly"),
    )


def activity_streaks(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user daily-activity streaks via the gaps-and-islands
    identity: within a user's sorted DISTINCT active days, the value
    ``day_number - row_number`` is constant across each run of
    consecutive days, so grouping on it recovers every streak with
    plain aggregation — no iterative logic, no self-join.

    Output: ``(user_id, n_active_days, n_streaks, longest_streak,
    last_streak)`` where ``last_streak`` is the length of the streak
    containing the user's most recent active day.

    All-integer arithmetic end-to-end (hash-exact on any engine).

    Scale: one distinct (user, day) projection — map-side combinable
    — then ONE hashpartitioning(user) window for row_number; both
    downstream aggregations ride the same partitioning (Catalyst
    reuses the exchange), and per-user state is bounded by #days.
    """
    days = events.select(
        F.col(user_col).alias("user_id"), F.to_date(ts_col).alias("_day")
    ).distinct()
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("_day")
    )
    day_num = F.datediff(F.col("_day"), F.lit("1970-01-01")).cast("long")
    grouped = days.select(
        "user_id", "_day", (day_num - rn).alias("_island")
    )
    streaks = grouped.groupBy("user_id", "_island").agg(
        F.count(F.lit(1)).alias("_len"), F.max("_day").alias("_end")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("_len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("_len").cast("bigint").alias("longest_streak"),
        F.max_by("_len", "_end").cast("bigint").alias("last_streak"),
    )


def conversion_wilson(
    events: DataFrame,
    success_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    z: float = 1.96,
) -> DataFrame:
    """Per-day user conversion rate with a Wilson score interval —
    the rate you can actually rank small days by (a raw proportion
    over 3 users says nothing; the Wilson lower bound penalizes the
    sample size). trials = the day's distinct active users;
    successes = those who fired ``success_type`` that day.

    Determinism: n and s are exact integers; the Wilson expression
    is the SAME arithmetic tree on both engines (each step one IEEE
    op — divide, multiply, sqrt — on deterministic inputs), then the
    floor snap. No engine round() anywhere.

    Scale: two distinct-aggs over the (user, day [, type]) grain,
    both keyed by calendar day.
    """
    base = events.select(
        F.col(user_col).alias("u"),
        F.to_date(ts_col).alias("day"),
        F.col(type_col).alias("ty"),
    )
    trials = base.select("u", "day").distinct().groupBy("day").agg(
        F.count(F.lit(1)).alias("n")
    )
    succ = (
        base.where(F.col("ty") == success_type)
        .select("u", "day")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    joined = trials.join(succ, "day", "left").select(
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.coalesce("s", F.lit(0)).cast("bigint").alias("s"),
    )
    zz = z * z  # folded to the identical double literal on both sides
    p = F.col("s") / F.col("n")
    nn = F.col("n").cast("double")
    center = p + F.lit(zz) / (2.0 * nn)
    margin = F.lit(z) * F.sqrt(
        p * (1.0 - p) / nn + F.lit(zz) / (4.0 * nn * nn)
    )
    denom = 1.0 + F.lit(zz) / nn
    return joined.select(
        "day",
        "n",
        "s",
        round4(p).alias("rate"),
        round4((center - margin) / denom).alias("wilson_lo"),
        round4((center + margin) / denom).alias("wilson_hi"),
    )


def time_to_convert(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Latency from a user's FIRST ``from_type`` to their FIRST
    subsequent ``to_type`` — the funnel-speed metric behind "how long
    does a buyer take". One result row: converting-user count,
    total exposed users, conversion share, and gap percentiles in
    whole seconds (p50/p90).

    Whole-second gaps via integer µs division (the engine-portable
    granularity); only non-negative gaps count (a purchase BEFORE
    first view is not a conversion of that exposure).

    Scale: one (user)-keyed min-aggregate per type — shared scan,
    map-side combinable — then a user-keyed join and a 1-row
    percentile aggregate.
    """
    first = (
        events.where(F.col(type_col).isin([from_type, to_type]))
        .groupBy(F.col(user_col).alias("u"))
        .agg(
            F.min(F.when(F.col(type_col) == from_type, F.col(ts_col))).alias("_f"),
            F.min(F.when(F.col(type_col) == to_type, F.col(ts_col))).alias("_t"),
        )
        .where(F.col("_f").isNotNull())
    )
    gap_us = F.timestamp_diff("MICROSECOND", F.col("_f"), F.col("_t"))
    gaps = first.select(
        F.when(
            F.col("_t").isNotNull() & (gap_us >= 0),
            F.expr(
                f"timestampdiff(MICROSECOND, _f, _t) div {1_000_000}"
            ),
        ).alias("_gap_s")
    )
    pct = F.percentile("_gap_s", F.array(F.lit(0.5), F.lit(0.9)))
    agg = gaps.agg(
        F.count(F.lit(1)).alias("n_exposed"),
        F.count("_gap_s").alias("n_converted"),
        pct.alias("_p"),
    )
    return agg.select(
        F.col("n_exposed").cast("bigint").alias("n_exposed"),
        F.col("n_converted").cast("bigint").alias("n_converted"),
        ratio4("n_converted", "n_exposed").alias("conversion_rate"),
        round4(F.col("_p")[0]).alias("p50_gap_s"),
        round4(F.col("_p")[1]).alias("p90_gap_s"),
    )


def hourly_seasonality(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Traffic seasonality profile: event counts and share by
    (day-of-week, hour-of-day) — the 7x24 heatmap behind capacity
    planning and anomaly baselines.

    Day-of-week is computed from the epoch day number
    (``(days_since_epoch + 4) mod 7``, 0 = Sunday — 1970-01-01 was a
    Thursday) instead of engine ``dayofweek()``, whose numbering
    conventions differ between engines; hour comes from the NTZ
    timestamp directly (no timezone dependence).

    Scale: one map-side-combinable hash agg onto a 168-cell domain.
    """
    day_num = F.datediff(F.to_date(ts_col), F.lit("1970-01-01"))
    dow = F.pmod(day_num + 4, F.lit(7)).cast("int")
    per = events.groupBy(
        dow.alias("dow"), F.hour(ts_col).cast("int").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    tot = per.agg(F.sum("n_events").alias("_tot"))
    return per.join(F.broadcast(tot)).select(
        "dow",
        "hour",
        F.col("n_events").cast("bigint").alias("n_events"),
        ratio4("n_events", "_tot").alias("share"),
    )


def linear_attribution(
    events: DataFrame,
    purchase_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    window_days: int = 7,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Linear multi-touch attribution — the equal-credit counterpart
    of ``last_touch_attribution``: every prior touch within
    ``window_days`` shares the purchase equally (1/n of the count and
    of the revenue); purchases with no in-window touch credit
    'direct' in full. Output per touch type: ``(touch_type,
    attributed_purchases, attributed_value)``.

    Determinism is EASIER than last-touch: all qualifying touches are
    credited, so no ordering/tiebreak enters the result — only the
    strict ``touch.ts < purchase.ts`` bound (same-µs touches are
    excluded on both engines) and integer-MICROSECOND window
    comparison. Fractions follow the decimal-snap contract: each 1/n
    and value/n term rounds to DECIMAL(18,6) BEFORE the global sum
    (exact associative addition), final floor-snap to 4.

    Scale: one user-keyed join (per-user touches bounded by the
    window), a purchase-keyed window count on the same partitioning,
    one hash agg onto len(touch_types)+1 rows.
    """
    j = _attribution_touch_join(
        events, purchase_type, touch_types, window_days,
        value_col, user_col, ts_col, tiebreak_col, type_col,
    )
    n = F.count("_tty").over(Window.partitionBy("_u", "_pid"))
    credited = j.select(
        F.when(F.col("_tty").isNull(), F.lit("direct"))
        .otherwise(F.col("_tty"))
        .alias("touch_type"),
        F.when(n > 0, F.round(F.lit(1.0) / n, 6))
        .otherwise(F.lit(1.0))
        .cast("decimal(18,6)")
        .alias("_share"),
        F.when(n > 0, F.round(F.col("_v") / n, 6))
        .otherwise(F.round(F.col("_v"), 6))
        .cast("decimal(18,6)")
        .alias("_vshare"),
    )
    return _attribution_rollup(credited)


def _attribution_touch_join(
    events: DataFrame,
    purchase_type: str,
    touch_types: tuple[str, ...],
    window_days: int,
    value_col: str,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    type_col: str,
) -> DataFrame:
    """One row per (purchase, prior in-window touch), left-extended so
    untouched purchases survive with NULL touch columns — the shared
    front half of every attribution model, so the "prior touch" bound
    and the integer-MICROSECOND window comparison live in exactly one
    place. "Prior" is LEXICOGRAPHIC on (ts, tiebreak) — the same
    total order last_touch_attribution's (unboundedPreceding, -1)
    row frame walks — so all three models agree on which touches are
    in scope even for same-microsecond touch/purchase pairs (a strict
    ts-only bound classified those purchases as 'direct' here while
    last-touch credited them; r9 review finding)."""
    p = events.where(F.col(type_col) == purchase_type).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_pts"),
        F.col(tiebreak_col).alias("_pid"),
        F.col(value_col).alias("_v"),
    )
    t = events.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_tts"),
        F.col(tiebreak_col).alias("_tid"),
        F.col(type_col).alias("_tty"),
    )
    limit_us = F.lit(window_days * 86_400_000_000).cast("bigint")
    return p.join(
        t,
        (p["_u"] == t["_u"])
        & (
            (t["_tts"] < p["_pts"])
            | ((t["_tts"] == p["_pts"]) & (t["_tid"] < p["_pid"]))
        )
        & (F.timestamp_diff("MICROSECOND", t["_tts"], p["_pts"]) <= limit_us),
        "left",
    ).select(p["_u"], "_pid", "_pts", "_tts", "_v", "_tty")


def _attribution_rollup(credited: DataFrame) -> DataFrame:
    """(touch_type, attributed_purchases, attributed_value) from the
    decimal-snapped per-credit rows — the shared floor-4 tail."""
    return credited.groupBy("touch_type").agg(
        (F.floor(F.sum("_share").cast("double") * 10000.0 + 0.5) / 10000.0).alias(
            "attributed_purchases"
        ),
        (F.floor(F.sum("_vshare").cast("double") * 10000.0 + 0.5) / 10000.0).alias(
            "attributed_value"
        ),
    )


def time_decay_attribution(
    events: DataFrame,
    purchase_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    window_days: int = 7,
    halflife_hours: int = 24,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-decay multi-touch attribution — the third standard model
    next to ``last_touch_attribution`` and ``linear_attribution``:
    recent touches earn more credit, halving every
    ``halflife_hours``. Output per touch type: ``(touch_type,
    attributed_purchases, attributed_value)``; purchases with no
    in-window touch credit 'direct' in full.

    Hash-stable recipe: a continuous ``exp(-Δt/τ)`` can never be
    hash-checked (libm exp/pow differ across engines — the
    temperature-weights lesson), so the decay is BUCKETED to exact
    powers of two: ``weight = 2^(B - Δt//halflife)`` as an exact
    BIGINT (the integer floor-division bucketing is the documented
    model semantics, not an approximation of something else). Shares
    depend only on weight RATIOS, so B is a free scaling constant:
    B = 30 keeps per-purchase sums exact for up to 2^33 (~8.6e9)
    max-weight touches on one purchase — past any bot — where B = 40
    would wrap a Spark long at ~8.4M while DuckDB's HUGEINT raised
    instead (divergence, not just error). Each touch's share is ONE
    double division of exact ints rounded to DECIMAL(18,6) before the
    global sum — the linear_attribution contract with weights ≠ 1.

    Scale: identical shape to linear_attribution — one user-keyed
    join bounded by the window, a purchase-keyed window sum on the
    same partitioning, one hash agg onto len(touch_types)+1 rows.
    """
    if halflife_hours <= 0:
        # a negative value would pass the max_k guard (floor division on
        # negatives goes negative) and wrap shiftleft's count mod 64 —
        # silently wrong weights; 0 would ZeroDivisionError below
        raise ValueError("halflife_hours must be positive")
    B = 30
    max_k = window_days * 24 // halflife_hours  # bounded by the join window
    if max_k > B:
        raise ValueError(
            f"window spans {max_k} half-lives; weights below 2^-{B} are"
            " zero — shrink window_days or raise halflife_hours"
        )
    half_us = halflife_hours * 3_600_000_000
    j = _attribution_touch_join(
        events, purchase_type, touch_types, window_days,
        value_col, user_col, ts_col, tiebreak_col, type_col,
    ).select(
        "_u",
        "_pid",
        "_v",
        "_tty",
        F.when(
            F.col("_tts").isNotNull(),
            F.expr(
                f"shiftleft(cast(1 as bigint), cast({B} - "
                f"timestampdiff(MICROSECOND, _tts, _pts) div {half_us} as int))"
            ),
        ).alias("_iw"),
    )
    siw = F.sum("_iw").over(Window.partitionBy("_u", "_pid"))
    credited = j.select(
        F.when(F.col("_tty").isNull(), F.lit("direct"))
        .otherwise(F.col("_tty"))
        .alias("touch_type"),
        F.when(F.col("_iw").isNotNull(), F.round(F.col("_iw") / siw, 6))
        .otherwise(F.lit(1.0))
        .cast("decimal(18,6)")
        .alias("_share"),
        F.when(F.col("_iw").isNotNull(), F.round(F.col("_v") * F.col("_iw") / siw, 6))
        .otherwise(F.round(F.col("_v"), 6))
        .cast("decimal(18,6)")
        .alias("_vshare"),
    )
    return _attribution_rollup(credited)


def transition_entropy(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Behavioral predictability in one number: the conditional entropy
    H(next | prev) of the event-type Markov chain, next to the marginal
    next-event entropy H(next) — their gap is exactly how much the
    previous event type tells you about the next one (0 gap = the
    history is useless; H(next) itself near 0 = everything is the same
    event). One row: ``(n_transitions, h_next, h_next_given_prev,
    information_gain)``.

    Hash-stable recipe: transition counts are exact ints (lead over the
    user-keyed order, same shape as ``transition_matrix``); every
    p*ln(p) term rounds to DECIMAL(18,6) before its sum.

    Scale: one user-keyed window exchange + aggs bounded by the event-
    type domain squared.
    """
    cell = _transition_counts(
        events, user_col, ts_col, type_col, tiebreak_col, "prev", "nxt", "c"
    )
    margin_prev = cell.groupBy("prev").agg(F.sum("c").cast("bigint").alias("cp"))
    margin_next = cell.groupBy("nxt").agg(F.sum("c").cast("bigint").alias("cn"))
    total = cell.agg(F.sum("c").cast("bigint").alias("_n"))

    # H(next): marginal entropy of the next-event distribution
    pn = F.col("cn") / F.col("_n")
    h_next = (
        margin_next.join(F.broadcast(total))
        .agg(
            (-F.sum(F.round(pn * F.log(pn), 6).cast("decimal(18,6)")))
            .cast("double")
            .alias("_hn")
        )
    )
    # H(next|prev) = -sum_xy p(x,y) ln(p(y|x)); p(y|x) = c_xy / c_x
    pxy = F.col("c") / F.col("_n")
    pyx = F.col("c") / F.col("cp")
    h_cond = (
        cell.join(F.broadcast(margin_prev), "prev")
        .join(F.broadcast(total))
        .agg(
            (-F.sum(F.round(pxy * F.log(pyx), 6).cast("decimal(18,6)")))
            .cast("double")
            .alias("_hc")
        )
    )
    return (
        total.join(F.broadcast(h_next))
        .join(F.broadcast(h_cond))
        .select(
            F.col("_n").alias("n_transitions"),
            (F.floor(F.col("_hn") * 10000.0 + 0.5) / 10000.0).alias("h_next"),
            (F.floor(F.col("_hc") * 10000.0 + 0.5) / 10000.0).alias(
                "h_next_given_prev"
            ),
            (
                F.floor((F.col("_hn") - F.col("_hc")) * 10000.0 + 0.5) / 10000.0
            ).alias("information_gain"),
        )
    )
