"""Streaming deduplication & stream-stream joins.

Completes the streaming × dedup matrix: the batch engine dedups a
corpus; a production ingest pipeline has to dedup the FIREHOSE, where
"have I seen this key" state must be evictable or it grows without
bound. ``dropDuplicatesWithinWatermark`` keeps per-key state only
until the watermark passes, so executor state is bounded by the
duplicate-arrival window, not stream length — the only shape that
survives an unbounded stream.

The interval join is the canonical two-stream correlation (clicks ⋈
impressions): an equi-key plus an event-time band. Both sides carry
watermarks, and the time-band condition lets Spark evict join state
once the band slides past the watermark — again bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    spark,
    source_dir: str,
    schema: str,
    keys: list[str],
    watermark: str = "30 minutes",
):
    """File stream → watermarked exactly-once-per-key rows. Duplicates
    arriving within ``watermark`` of the first sighting are dropped;
    state for older keys is evicted. Returns the unstarted streaming
    DataFrame."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    return stream.dropDuplicatesWithinWatermark(keys)


def streaming_interval_join(
    spark,
    left_dir: str,
    right_dir: str,
    schema: str,
    key: str = "user_id",
    band: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """Two file streams joined on ``key`` with the right event inside
    ``(left.ts, left.ts + band]`` — the clicks-after-impression shape.
    Watermarks on BOTH sides + the band bound let Spark clean join
    state; output columns: key, l_id, r_id, l_ts, r_ts."""

    def src(d: str, tag: str):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
            .select(
                F.col(key).alias(f"{tag}_key"),
                F.col("event_id").alias(f"{tag}_id"),
                F.col("ts").cast("timestamp").alias(f"{tag}_ts"),
            )
            .withWatermark(f"{tag}_ts", watermark)
        )

    l, r = src(left_dir, "l"), src(right_dir, "r")
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {band}")),
    ).select(
        F.col("l_key").alias(key), "l_id", "r_id", "l_ts", "r_ts"
    )
