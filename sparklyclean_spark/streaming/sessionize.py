"""Custom stateful streaming operator: per-key sessionization via
``applyInPandasWithState``.

``session_window()`` (windows.py) covers the built-in case; this
operator is the template for session semantics Spark can't express —
here: sessions carry running aggregates and close on an event-time
TIMEOUT rather than at query end, emitting each session exactly once
when the watermark passes ``last_event + gap``. (The reference has no
streaming at all; SURVEY.md §2.10 requires custom stateful operators
as an engine capability.)

State per key is O(1) (open-session accumulator), so executor memory
is bounded by #active keys regardless of stream length — the property
that matters at production scale. Out-of-order events WITHIN the
watermark that arrive after an intervening event have gap semantics
applied in arrival order per micro-batch (events are sorted inside a
batch; cross-batch reordering is bounded by the watermark).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

def output_schema(key_col: str = "user_id", key_type: str = "bigint") -> str:
    """Output schema for the given key column — hardcoding
    'user_id bigint' broke any non-default key name/type while the
    API advertised key_col as configurable (r9 review finding)."""
    return (
        f"{key_col} {key_type}, window_start timestamp, "
        "window_end timestamp, n_events bigint, sum_value double"
    )


OUTPUT_SCHEMA = output_schema()
STATE_SCHEMA = "start timestamp, last timestamp, n bigint, sv double"


def _session_fn(gap_seconds: int, key_col: str = "user_id"):
    gap = pd.Timedelta(seconds=gap_seconds)

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            # watermark passed last+gap with no new events: close the
            # open session and drop the state
            start, last, n, sv = state.get
            closed.append((user_id, start, last + gap, n, sv))
            state.remove()
        else:
            cur = list(state.get) if state.exists else None
            # ONE global sort over the concatenated Arrow chunks: a
            # hot key spanning multiple chunks (maxRecordsPerBatch)
            # sorted each chunk independently, so chunk 2 could start
            # before chunk 1 ended and the walk saw disorder even for
            # in-order data (r9 review finding)
            frames = [pdf for pdf in pdfs]
            pdf = (
                pd.concat(frames, ignore_index=True).sort_values("ts")
                if len(frames) > 1
                else frames[0].sort_values("ts")
                if frames
                else pd.DataFrame(columns=["ts", "value"])
            )
            # General interval sweep over (batch events + the open
            # session), in TIME order — the r9/r10 incremental clamps
            # (max the end, min the start) still over-merged: a late
            # in-watermark event more than `gap` EARLIER than the open
            # session's start belongs to its own earlier session, not
            # this one (the batch session_windows twin yields two
            # sessions there — r10 review finding). Sorting the open
            # state in with the events and gap-merging sequentially
            # reproduces the batch semantics exactly; every merged
            # session except the LAST is definitively closed (a later
            # session exists), the last becomes the new state.
            items = [
                (ts, ts, 1, float(val))
                for ts, val in zip(pdf["ts"], pdf["value"])
            ]
            if cur is not None:
                items.append((cur[0], cur[1], cur[2], cur[3]))
            items.sort(key=lambda t: (t[0], t[1]))
            sessions: list[list] = []
            for s_, e_, n_, v_ in items:
                if sessions and s_ - sessions[-1][1] <= gap:
                    last = sessions[-1]
                    last[1] = max(last[1], e_)
                    last[2] += n_
                    last[3] += v_
                else:
                    sessions.append([s_, e_, n_, v_])
            for s in sessions[:-1]:
                closed.append((user_id, s[0], s[1] + gap, s[2], s[3]))
            cur = sessions[-1] if sessions else None
            if cur is not None:
                state.update(tuple(cur))
                # close the session once event time passes last+gap
                # (pd.Timestamp() normalizes: state.get returns
                # datetime, batch rows return pd.Timestamp)
                state.setTimeoutTimestamp(
                    int((pd.Timestamp(cur[1]) + gap).value // 1_000_000)
                )

        if closed:
            yield pd.DataFrame(
                closed,
                columns=[key_col, "window_start", "window_end",
                         "n_events", "sum_value"],
            )

    return fn


def streaming_sessionize(
    spark,
    source_dir: str,
    schema: str,
    gap_seconds: int = 900,
    watermark: str = "30 minutes",
    key_col: str = "user_id",
    key_type: str = "bigint",
):
    """File source → watermark → stateful sessionizer. Returns the
    unstarted streaming DataFrame (attach a sink + trigger). Output
    rows are CLOSED sessions only, emitted exactly once; semantics
    match ``session_windows`` (gap-merge inclusive, end = last+gap)
    for in-watermark data."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        _session_fn(gap_seconds, key_col),
        outputStructType=output_schema(key_col, key_type),
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
