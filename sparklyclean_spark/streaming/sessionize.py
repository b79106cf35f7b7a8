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

OUTPUT_SCHEMA = (
    "user_id bigint, window_start timestamp, window_end timestamp, "
    "n_events bigint, sum_value double"
)
STATE_SCHEMA = "start timestamp, last timestamp, n bigint, sv double"


def _session_fn(gap_seconds: int):
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
            ts_all: list[pd.Series] = []
            for pdf in pdfs:
                pdf = pdf.sort_values("ts")
                for ts, val in zip(pdf["ts"], pdf["value"]):
                    if cur is None:
                        cur = [ts, ts, 0, 0.0]
                    elif ts - cur[1] > gap:
                        closed.append(
                            (user_id, cur[0], cur[1] + gap, cur[2], cur[3])
                        )
                        cur = [ts, ts, 0, 0.0]
                    cur[1] = ts
                    cur[2] += 1
                    cur[3] += float(val)
                ts_all.append(pdf["ts"])
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
                columns=["user_id", "window_start", "window_end", "n_events", "sum_value"],
            )

    return fn


def streaming_sessionize(
    spark,
    source_dir: str,
    schema: str,
    gap_seconds: int = 900,
    watermark: str = "30 minutes",
    key_col: str = "user_id",
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
        _session_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
