"""Event-time disorder audit: how late does data arrive per key?

Before setting a Structured Streaming watermark
(``withWatermark("ts", <delay>)``) you need the empirical answer to
"how far does event time run BEHIND arrival order in this stream?" —
too small a delay silently drops late rows, too large holds state and
output back. This operator measures it from a historical log:

* ``n_late``   — events whose event time is EARLIER than some event
  that already arrived (the rows a zero-delay watermark would drop),
* ``late_frac`` — their share per key,
* ``max_regression_us`` — the worst backwards jump in microseconds:
  the smallest watermark delay that would have lost nothing.

Arrival order is taken from ``arrival_col`` (an ingestion sequence /
monotone event id); event time from ``ts_col``.

Scale shape: ONE exchange (hash on the key) feeding a running-max
window in arrival order, then a per-key hash aggregate that reuses
the same partitioning — no self-join, no second shuffle. Works at
any key cardinality; a single hot key degrades to one sorted
partition, the same bound as any per-key ordered walk.

Microsecond integers end-to-end (no float time math): Spark's
``timestamp_diff`` at MICROSECOND resolution is bit-identical to
DuckDB's ``date_diff('microsecond', ...)`` because at the finest
granularity "boundary count" and "true difference" coincide.

No reference counterpart; §2.10 capability-gap operator (streaming
design input for the `streaming/` surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparklyclean_spark.functions.rounding import ratio4


def out_of_order_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
) -> DataFrame:
    """Per-key event-time disorder summary; see module docstring."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    high = F.max(F.col(ts_col)).over(w)
    regression = F.when(
        high.isNotNull() & (F.col(ts_col) < high),
        F.timestamp_diff("MICROSECOND", F.col(ts_col), high),
    ).otherwise(F.lit(0).cast("bigint"))
    flagged = events.select(
        F.col(key_col),
        regression.alias("_reg"),
    )
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("_reg") > 0).cast("bigint")).alias("n_late"),
        # floor arithmetic, not engine round(): tie semantics at the
        # 4th decimal must match the DuckDB oracle bit-for-bit
        ratio4(
            F.sum((F.col("_reg") > 0).cast("bigint")), F.count(F.lit(1))
        ).alias("late_frac"),
        F.max("_reg").alias("max_regression_us"),
    )
