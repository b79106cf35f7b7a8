"""Time-series resampling with gap fill (forward fill).

Sensor/event streams arrive irregularly; downstream feature pipelines
want a REGULAR grid per key ("value of each user at every hour, last
observation carried forward"). This is the Timescale/Pandas
``resample().ffill()`` shape, absent from both the reference and
Spark's built-ins.

Plan shape, all distributed:

1. bucket observations onto the grid (``F.window(ts).start``) and keep
   the last observation per (key, bucket) via the same map-side
   combinable ``max(struct)`` aggregation as ``operators/cdc.py`` —
   no per-event window sort;
2. per-key grid = ``sequence(min_bucket, max_bucket, interval)``
   exploded — one tiny agg row per key fans out to its grid, so grid
   size is span/interval per key, never global;
3. left join observations onto the grid (equi-join on key+bucket,
   AQE-splittable) and forward-fill with ``last(ignorenulls)`` over a
   per-key window ORDERED BY BUCKET — the window sees span/interval
   rows per key (the resampled grid), not the raw event count, which
   is what makes the fill tractable for hot keys.

The first grid bucket of each key is its first observed bucket, so
the fill never produces leading NULLs.

No reference counterpart; §2.10 capability-gap operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparklyclean_spark.operators.cdc import latest_by_key


def resample_ffill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    interval: str = "1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Regularize ``df`` to an ``interval`` grid per ``key_cols``,
    carrying the last ``value_col`` forward across empty buckets.

    Returns (key_cols..., bucket_ts, value_col, is_observed) — one row
    per key per grid bucket between that key's first and last
    observation. ``tiebreak_col`` (e.g. an event id) makes the
    last-in-bucket winner total-ordered.

    ``is_observed`` marks buckets CONTAINING AN EVENT, even one whose
    ``value_col`` is NULL (presence-based, not value-based — the old
    value-based flag mislabeled NULL-valued observation buckets as
    gaps; r9 review finding). A NULL observed value does NOT reset
    the forward fill: the fill is last-NON-NULL by contract, so the
    prior value carries across it, and a key whose first observations
    are all NULL has leading NULL values until the first non-null one.
    """
    bucket = F.window(F.col(ts_col), interval).start
    order_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    obs = latest_by_key(
        df.withColumn("bucket_ts", bucket),
        keys=[*key_cols, "bucket_ts"],
        order_cols=order_cols,
        payload_cols=[value_col],
    ).select(
        *key_cols,
        "bucket_ts",
        F.col(value_col).alias("_obs"),
        F.lit(True).alias("_seen"),
    )
    span = df.groupBy(*key_cols).agg(
        F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi")
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {interval}"))
        ).alias("bucket_ts"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(obs, [*key_cols, "bucket_ts"], "left").select(
        *key_cols,
        "bucket_ts",
        F.last("_obs", ignorenulls=True).over(w).alias(value_col),
        F.coalesce(F.col("_seen"), F.lit(False)).alias("is_observed"),
    )
