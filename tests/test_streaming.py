"""Structured Streaming wrapper smoke: the watermarked streaming plan
must produce the same result as the batch window over the same data,
and session-window boundary semantics must match the SQL oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparklyclean_spark.streaming.windows import (
    session_windows,
    streaming_tumbling_counts,
    tumbling_counts,
)

EVENTS_SCHEMA = "event_id bigint, ts timestamp, event_type string, value double"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Small deterministic event set written as a streamable directory."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    rows = [
        (i, f"2024-01-01 {i % 24:02d}:{(i * 7) % 60:02d}:00", ["click", "view"][i % 2], float(i))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts string, event_type string, value double")
    df.withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_streaming_matches_batch(spark, event_dir):
    batch = tumbling_counts(spark.read.parquet(event_dir))
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }

    stream_df = streaming_tumbling_counts(spark, event_dir, EVENTS_SCHEMA)
    assert stream_df.isStreaming
    query = (
        stream_df.writeStream.format("memory")
        .queryName("tumbling_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_smoke").collect()
    }
    assert got == expected


def test_session_window_gap_boundary(spark):
    """Boundary semantics pinned empirically: an event EXACTLY `gap`
    after the previous one still MERGES into the session; one
    microsecond beyond starts a new session. The DuckDB oracle uses
    strict `>` to match."""
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),        # merges (10 min < gap)
        (1, "2024-01-01 10:25:00"),        # exactly gap after -> merges
        (1, "2024-01-01 10:40:00.000001"), # gap + 1us -> NEW session
        (2, "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts string").select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), F.lit(1.0).alias("value")
    )
    sessions = session_windows(df, "15 minutes").collect()
    per_user = {}
    for r in sessions:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[2]) == 1
    assert len(per_user[1]) == 2, per_user[1]
    first = min(per_user[1], key=lambda r: r["window_start"])
    assert first["n_events"] == 3


def test_streaming_dedup_drops_within_watermark(spark, tmp_path_factory):
    """Duplicate keys arriving across micro-batches within the
    watermark are emitted exactly once; the surviving set equals batch
    dropDuplicates on the same keys."""
    from sparklyclean_spark.streaming.dedup import streaming_dedup

    path = str(tmp_path_factory.mktemp("dedup_stream"))
    schema = "event_id bigint, ts timestamp, user_id bigint, value double"

    def write(rows):
        spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    write([
        (1, "2024-01-01 09:00:00", 1, 1.0),
        (1, "2024-01-01 09:00:00", 1, 1.0),   # same-batch dup
        (2, "2024-01-01 09:05:00", 2, 2.0),
    ])
    write([
        (1, "2024-01-01 09:10:00", 1, 9.0),   # cross-batch dup of event 1
        (3, "2024-01-01 09:20:00", 1, 3.0),
    ])

    out = streaming_dedup(spark, path, schema, keys=["event_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id for r in spark.sql("SELECT * FROM dedup_smoke").collect()
    }
    assert got == {1, 2, 3}
    assert spark.sql("SELECT COUNT(*) c FROM dedup_smoke").collect()[0]["c"] == 3


def test_streaming_interval_join_matches_batch(spark, tmp_path_factory):
    """Stream-stream interval join (clicks-after-impression shape)
    equals the batch join over the same time-sorted data."""
    from sparklyclean_spark.streaming.dedup import streaming_interval_join

    ldir = str(tmp_path_factory.mktemp("ij_left"))
    rdir = str(tmp_path_factory.mktemp("ij_right"))
    schema = "event_id bigint, ts timestamp, user_id bigint, value double"
    raw = "event_id bigint, ts string, user_id bigint, value double"

    lrows = [
        (10, "2024-01-01 09:00:00", 1, 0.0),
        (11, "2024-01-01 09:30:00", 1, 0.0),
        (12, "2024-01-01 09:00:00", 2, 0.0),
    ]
    rrows = [
        (20, "2024-01-01 09:04:00", 1, 0.0),  # joins 10
        (21, "2024-01-01 09:10:00", 1, 0.0),  # exactly band edge of 10 -> joins
        (22, "2024-01-01 09:31:00", 1, 0.0),  # joins 11
        (23, "2024-01-01 09:20:00", 2, 0.0),  # outside band of 12
    ]
    for d, rows in ((ldir, lrows), (rdir, rrows)):
        spark.createDataFrame(rows, raw).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(d)

    out = streaming_interval_join(spark, ldir, rdir, schema)
    q = (
        out.writeStream.format("memory")
        .queryName("ij_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.l_id, r.r_id) for r in spark.sql("SELECT * FROM ij_smoke").collect()}
    # batch equivalent
    l = spark.read.parquet(ldir)
    r = spark.read.parquet(rdir)
    expected = {
        (row["l_id"], row["r_id"])
        for row in l.alias("l")
        .join(
            r.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") > F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(F.col("l.event_id").alias("l_id"), F.col("r.event_id").alias("r_id"))
        .collect()
    }
    assert got == expected == {(10, 20), (10, 21), (11, 22)}


@pytest.mark.parametrize("seed", [7, 1234])
def test_sessionize_property_matches_batch(spark, tmp_path_factory, seed):
    """Property check on RANDOMIZED event sets: the streaming
    sessionizer's closed sessions must equal the batch
    ``session_window`` result restricted to closed sessions — closed
    meaning the final event-time watermark passed the session end
    (r11: closure is a watermark fact only; the r10 in-processing
    closure emitted sessions a later in-watermark event could still
    bridge).

    Events are chunked time-sorted into 4 files (one micro-batch each,
    arrival order = event order, nothing beyond the watermark), which
    is the regime the operator documents equivalence for."""
    import random
    from datetime import datetime, timedelta

    from sparklyclean_spark.streaming.sessionize import streaming_sessionize

    rng = random.Random(seed)
    base = datetime(2024, 1, 1, 6, 0, 0)
    events = sorted(
        (
            (
                i,
                base + timedelta(seconds=rng.randrange(6 * 3600)),
                rng.randrange(1, 7),  # 6 users
                (i % 7) * 0.5,  # binary-exact values: float sums exact
            )
            for i in range(240)
        ),
        key=lambda e: e[1],
    )

    path = str(tmp_path_factory.mktemp(f"sess_prop_{seed}"))
    schema = "event_id bigint, ts timestamp, user_id bigint, value double"
    chunk = (len(events) + 3) // 4
    for c in range(4):
        part = events[c * chunk : (c + 1) * chunk]
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    gap, wm = timedelta(minutes=15), timedelta(minutes=30)
    out = streaming_sessionize(
        spark, path, schema, gap_seconds=int(gap.total_seconds())
    )
    name = f"sessionize_prop_{seed}"
    query = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    got = {
        (r.user_id, r.window_start, r.window_end): (r.n_events, r.sum_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    bdf = spark.createDataFrame(events, schema)
    batch = session_windows(bdf, "15 minutes").collect()
    final_wm = max(e[1] for e in events) - wm
    expected = {
        (r["user_id"], r["window_start"], r["window_end"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in batch
        if r["window_end"] < final_wm
    }
    assert got == expected, (
        f"streaming-only: {sorted(set(got) - set(expected))}; "
        f"batch-only: {sorted(set(expected) - set(got))}"
    )


def test_stateful_sessionize_closes_on_watermark(spark, tmp_path_factory):
    """applyInPandasWithState sessionizer: sessions are emitted exactly
    once, when the watermark passes last_event + gap. Two files ->
    two micro-batches (maxFilesPerTrigger=1); the second batch's
    late-hour events push the watermark past batch 1's sessions."""
    from sparklyclean_spark.streaming.sessionize import streaming_sessionize

    path = str(tmp_path_factory.mktemp("sess_stream"))
    schema = "event_id bigint, ts timestamp, user_id bigint, value double"

    def write_file(name, rows):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("append").parquet(path)

    # batch 1: user 1 has two sessions (09:00-09:20, 10:00), user 2 one
    write_file("f1", [
        (1, "2024-01-01 09:00:00", 1, 1.0),
        (2, "2024-01-01 09:10:00", 1, 2.0),
        (3, "2024-01-01 09:20:00", 1, 3.0),
        (4, "2024-01-01 10:00:00", 1, 4.0),
        (5, "2024-01-01 09:05:00", 2, 5.0),
    ])
    # batch 2: far-future event advances watermark (12:00 - 30min wm
    # >> all batch-1 sessions' last+gap), closing everything prior
    write_file("f2", [(6, "2024-01-01 12:00:00", 2, 6.0)])

    out = streaming_sessionize(spark, path, schema, gap_seconds=900)
    query = (
        out.writeStream.format("memory")
        .queryName("sessionize_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    rows = {
        (r.user_id, str(r.window_start), str(r.window_end)): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sessionize_smoke").collect()
    }
    # user 1 session A: 09:00-09:20 merged (gaps of 10 min < 15 min),
    # end = 09:20 + 15 min
    assert rows[(1, "2024-01-01 09:00:00", "2024-01-01 09:35:00")] == (3, 6.0)
    # user 1 session B: the 10:00 singleton
    assert rows[(1, "2024-01-01 10:00:00", "2024-01-01 10:15:00")] == (1, 4.0)
    # user 2 batch-1 singleton
    assert rows[(2, "2024-01-01 09:05:00", "2024-01-01 09:20:00")] == (1, 5.0)
    # the 12:00 event's own session stays OPEN (watermark never passes
    # 12:15) -> exactly 3 closed sessions
    assert len(rows) == 3


def test_streaming_latest_by_key_matches_batch(spark, event_dir):
    """CDC snapshot compaction as a stream: max(struct) keeps O(#keys)
    state and must equal the batch collapse over the same data."""
    from sparklyclean_spark.operators.cdc import latest_by_key, streaming_latest_by_key

    batch = latest_by_key(
        spark.read.parquet(event_dir),
        keys=["event_type"], order_cols=["ts", "event_id"], payload_cols=["value"],
    )
    expected = {r["event_type"]: (r["ts"], r["event_id"], r["value"]) for r in batch.collect()}

    stream_df = streaming_latest_by_key(
        spark, event_dir, EVENTS_SCHEMA,
        keys=["event_type"], order_cols=["ts", "event_id"], payload_cols=["value"],
    )
    assert stream_df.isStreaming
    q = (
        stream_df.writeStream.format("memory")
        .queryName("cdc_latest_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_type"]: (r["ts"], r["event_id"], r["value"])
        for r in spark.sql("SELECT * FROM cdc_latest_smoke").collect()
    }
    assert got == expected


def test_streaming_enrich_matches_batch(spark, event_dir):
    """Stream-static broadcast enrichment: stateless append-mode join
    must equal the batch join over the same data."""
    from sparklyclean_spark.streaming.enrich import streaming_enrich

    dim = spark.createDataFrame(
        [("click", 1.5), ("view", 0.5)], "event_type string, weight double"
    )
    batch = (
        spark.read.parquet(event_dir)
        .join(F.broadcast(dim), ["event_type"], "left")
        .select("event_id", "event_type", "weight")
    )
    expected = {(r["event_id"]): (r["event_type"], r["weight"]) for r in batch.collect()}

    stream_df = streaming_enrich(
        spark, event_dir, EVENTS_SCHEMA, dim, on=["event_type"]
    ).select("event_id", "event_type", "weight")
    assert stream_df.isStreaming
    q = (
        stream_df.writeStream.format("memory")
        .queryName("enrich_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: (r["event_type"], r["weight"])
        for r in spark.sql("SELECT * FROM enrich_smoke").collect()
    }
    assert got == expected


def test_stateful_sessionize_late_event_extends_start(spark, tmp_path_factory):
    """r10 advisor regression: a late-but-in-watermark event EARLIER
    than the open session's recorded start must pull window_start back
    so the closed window contains every counted event (the r9 fix only
    clamped the end)."""
    from sparklyclean_spark.streaming.sessionize import streaming_sessionize

    path = str(tmp_path_factory.mktemp("sess_stream_late"))

    def write_file(rows):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("append").parquet(path)

    # batch 1: user 1's session opens at 09:10
    write_file([(1, "2024-01-01 09:10:00", 1, 1.0)])
    # batch 2: late event at 09:05 (> watermark 08:40, < open start)
    write_file([(2, "2024-01-01 09:05:00", 1, 2.0)])
    # batch 3: far-future closer for another user
    write_file([(3, "2024-01-01 12:00:00", 2, 3.0)])

    out = streaming_sessionize(
        spark, path,
        "event_id bigint, ts timestamp, user_id bigint, value double",
        gap_seconds=900,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessionize_late_start")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.user_id, str(r.window_start), str(r.window_end)): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sessionize_late_start").collect()
    }
    # the closed user-1 session must start at the EARLIEST contained
    # event (09:05), end = 09:10 + 15 min, and count both events
    assert rows[(1, "2024-01-01 09:05:00", "2024-01-01 09:25:00")] == (2, 3.0)


def test_stateful_sessionize_distant_late_event_own_session(spark, tmp_path_factory):
    """r10 review regression: a late in-watermark event more than
    `gap` EARLIER than the open session's start must form its OWN
    earlier session (the incremental min-clamp merged it, producing a
    window spanning a silence longer than gap and diverging from the
    batch session_windows twin)."""
    from sparklyclean_spark.streaming.sessionize import streaming_sessionize

    path = str(tmp_path_factory.mktemp("sess_stream_distant"))

    def write_file(rows):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("append").parquet(path)

    # batch 1: open session at 09:30
    write_file([(1, "2024-01-01 09:30:00", 1, 1.0)])
    # batch 2: late event at 09:05 — 25 min late (inside the 30-min
    # watermark), 25 min BEFORE the open start (> the 15-min gap)
    write_file([(2, "2024-01-01 09:05:00", 1, 2.0)])
    # batch 3: far-future closer
    write_file([(3, "2024-01-01 12:00:00", 2, 3.0)])

    out = streaming_sessionize(
        spark, path,
        "event_id bigint, ts timestamp, user_id bigint, value double",
        gap_seconds=900,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessionize_distant_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.user_id, str(r.window_start), str(r.window_end)): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sessionize_distant_late").collect()
    }
    # TWO user-1 sessions, exactly the batch twin's answer
    assert rows[(1, "2024-01-01 09:05:00", "2024-01-01 09:20:00")] == (1, 2.0)
    assert rows[(1, "2024-01-01 09:30:00", "2024-01-01 09:45:00")] == (1, 1.0)


def test_stateful_sessionize_late_bridge_single_session(spark, tmp_path_factory):
    """r11 advisor regression: an earlier merged session must NOT be
    emitted until the watermark passes its end+gap — a later
    in-watermark event can still BRIDGE it into the next session.
    Here 10:00 arrives, then late 09:40 (own session, > gap earlier),
    then late 09:50 bridges the two: the batch twin yields ONE session
    [09:40, 10:15]; the r10 code had already emitted [09:40, 09:55]
    and would emit a second overlapping window."""
    from sparklyclean_spark.streaming.sessionize import streaming_sessionize

    path = str(tmp_path_factory.mktemp("sess_stream_bridge"))

    def write_file(rows):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("append").parquet(path)

    write_file([(1, "2024-01-01 10:00:00", 1, 1.0)])
    # 20 min before the open start (> 15-min gap), inside the 30-min
    # watermark (wm after batch 1 = 09:30)
    write_file([(2, "2024-01-01 09:40:00", 1, 2.0)])
    # bridges: 09:40 -> 09:50 -> 10:00 are all within gap
    write_file([(3, "2024-01-01 09:50:00", 1, 4.0)])
    # far-future closer for another user advances the watermark
    write_file([(4, "2024-01-01 13:00:00", 2, 8.0)])

    out = streaming_sessionize(
        spark, path,
        "event_id bigint, ts timestamp, user_id bigint, value double",
        gap_seconds=900,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessionize_bridge")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.user_id, str(r.window_start), str(r.window_end)): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sessionize_bridge").collect()
    }
    # ONE user-1 session spanning all three events — no premature
    # [09:40, 09:55] fragment, no overlapping windows
    assert rows == {
        (1, "2024-01-01 09:40:00", "2024-01-01 10:15:00"): (3, 7.0)
    }


def test_stateful_sessionize_non_utc_session_timezone(spark, tmp_path_factory):
    """r11 review regression: Arrow hands the worker session-LOCAL
    naive timestamps while GroupState's watermark/timeout API is true
    epoch — mixing the two shifted closure by the UTC offset (west of
    UTC: premature emission of bridgeable sessions; east: withheld
    sessions). Under a non-UTC session timezone the output must be
    wall-clock identical to the UTC run (the bridge scenario would
    regress to two overlapping windows at UTC-8)."""
    from sparklyclean_spark.streaming.sessionize import streaming_sessionize

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    path = str(tmp_path_factory.mktemp("sess_stream_tz"))
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")

        def write_file(rows):
            df = spark.createDataFrame(
                rows, "event_id bigint, ts string, user_id bigint, value double"
            ).withColumn("ts", F.col("ts").cast("timestamp"))
            df.coalesce(1).write.mode("append").parquet(path)

        write_file([(1, "2024-01-01 10:00:00", 1, 1.0)])
        write_file([(2, "2024-01-01 09:40:00", 1, 2.0)])
        write_file([(3, "2024-01-01 09:50:00", 1, 4.0)])
        write_file([(4, "2024-01-01 13:00:00", 2, 8.0)])

        out = streaming_sessionize(
            spark, path,
            "event_id bigint, ts timestamp, user_id bigint, value double",
            gap_seconds=900,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("sessionize_tz")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = {
            (r.user_id, r.window_start, r.window_end): (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM sessionize_tz").collect()
        }
        # the contract is INSTANT equality with the batch twin under
        # the same session tz (collect() renders in the system zone,
        # input strings parse in the session zone — literals shift)
        batch = {
            (r.user_id, r.window_start, r.window_end): (r.n_events, r.sum_value)
            for r in session_windows(
                spark.read.parquet(path), "15 minutes"
            ).collect()
            if r.user_id == 1
        }
        user1 = {k: v for k, v in rows.items() if k[0] == 1}
        # exactly ONE user-1 window (no premature fragment, no overlap),
        # identical to the batch twin, covering all three events
        assert user1 == batch and len(user1) == 1
        assert next(iter(user1.values())) == (3, 7.0)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)

def test_stateful_sessionize_dst_fallback_hour(spark, tmp_path_factory):
    """r12 advisor finding: the old worker re-localized Arrow's naive
    session-local wall times with pandas ``tz_localize(ambiguous=True)``
    (always the DST/first occurrence), while Spark resolves the same
    repeated fall-back wall time with Java's rules — so a session
    straddling the transition could shift by the DST offset vs the
    batch twin. Events at instants 08:30Z/08:50Z/09:10Z under
    America/Los_Angeles are wall 01:30 PDT / 01:50 PDT / 01:10 PST —
    the third WALL time sorts before the first even though its instant
    is 40 min later. With the JVM-derived ts_us basis the three events
    merge into one session identical (as instants) to the batch twin;
    the old basis produced a session "starting" at the 01:10 wall time.
    """
    from sparklyclean_spark.streaming.sessionize import streaming_sessionize

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    path = str(tmp_path_factory.mktemp("sess_stream_dst"))
    try:
        # write instants unambiguously (UTC wall == instant), then
        # run the stream under the DST-observing session timezone
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        for batch_rows in (
            [
                (1, "2024-11-03 08:30:00", 1, 1.0),  # 01:30 PDT
                (2, "2024-11-03 08:50:00", 1, 2.0),  # 01:50 PDT
                (3, "2024-11-03 09:10:00", 1, 4.0),  # 01:10 PST (repeated hour)
            ],
            # far-future event: watermark passes 09:10Z + gap
            [(4, "2024-11-03 20:00:00", 2, 8.0)],
        ):
            df = spark.createDataFrame(
                batch_rows, "event_id bigint, ts string, user_id bigint, value double"
            ).withColumn("ts", F.col("ts").cast("timestamp"))
            df.coalesce(1).write.mode("append").parquet(path)

        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        out = streaming_sessionize(
            spark, path,
            "event_id bigint, ts timestamp, user_id bigint, value double",
            gap_seconds=1500,  # 25 min: instants merge (20-min real gaps)
        )
        q = (
            out.writeStream.format("memory")
            .queryName("sessionize_dst")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # assert on INSTANTS (unix_micros), immune to render zones
        rows = {
            (r.user_id, r.s_us, r.e_us): (r.n_events, r.sum_value)
            for r in spark.sql(
                "SELECT user_id, unix_micros(window_start) AS s_us, "
                "unix_micros(window_end) AS e_us, n_events, sum_value "
                "FROM sessionize_dst"
            ).collect()
        }
        batch = {
            (r.user_id, r.s_us, r.e_us): (r.n_events, r.sum_value)
            for r in session_windows(spark.read.parquet(path), "25 minutes")
            .selectExpr(
                "user_id", "unix_micros(window_start) AS s_us",
                "unix_micros(window_end) AS e_us", "n_events", "sum_value",
            )
            .collect()
            if r.user_id == 1
        }
        user1 = {k: v for k, v in rows.items() if k[0] == 1}
        assert user1 == batch and len(user1) == 1
        ((_, s_us, e_us),) = user1
        # start = 08:30Z, end = 09:10Z + 25 min — true instants, not
        # the first-occurrence re-localization (which would give
        # start 08:10Z / the 01:10 wall time)
        assert s_us == 1730622600000000 and e_us == 1730626500000000
        assert next(iter(user1.values())) == (3, 7.0)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
