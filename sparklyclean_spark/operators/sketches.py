"""Mergeable distinct-count sketches (Apache DataSketches HLL).

The 100 TB pattern: you cannot afford to re-scan the corpus every
time someone asks "distinct users this week / this month / ever".
Instead each ingest shard (day, source, partition) materializes a
tiny HLL *sketch* of its keys once; any rollup over any combination
of shards is then a union of sketches — bytes, not rows. Spark 3.5+
ships the DataSketches HLL binary-compatible agg functions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``),
so the sketches written by one job are consumable by any other
DataSketches-speaking system (Druid, Hive, Pinot).

Scale shape: one scan + one shuffle keyed on the shard to build the
per-shard sketches (map-side partial sketching — each task sketches
locally, merge happens in the reduce); every rollup after that
touches only #shards rows. The merged "ALL" estimate here is
computed FROM the per-shard sketches, never from the raw rows —
that is the point.

Estimates are deterministic for a given input set (the sketch hash
is seeded, union is order-insensitive), but NOT reproducible by a
different HLL implementation — so the registered query is a
rows-only driver check and the accuracy gate lives in pytest
(merged == direct single-pass estimate, both within tolerance of
the exact distinct).

No reference counterpart; §2.10 capability surface (the reference's
only distinct-ish operation is the exact block-size count,
Setup.scala:31-41).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_sketches(
    df: DataFrame,
    key: Column,
    shard: Column,
    lg_k: int = 12,
) -> DataFrame:
    """Per-shard HLL sketch of ``key``: ``(shard, sketch binary)``.
    This is the frame a pipeline would persist alongside each ingest
    batch (a few KB per shard at lg_k=12)."""
    return df.groupBy(shard.alias("shard")).agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("sketch")
    )


def distinct_rollup(
    df: DataFrame,
    key: Column,
    shard: Column,
    lg_k: int = 12,
) -> DataFrame:
    """Per-shard distinct estimates plus an ``ALL`` row merged from
    the per-shard sketches (no second scan of the raw data):
    ``(shard string, est_distinct bigint)``."""
    sk = shard_sketches(df, key, shard, lg_k)
    per_shard = sk.select(
        F.col("shard").cast("string").alias("shard"),
        F.hll_sketch_estimate("sketch").alias("est_distinct"),
    )
    merged = sk.agg(
        F.hll_union_agg(F.col("sketch"), F.lit(False)).alias("sketch")
    ).select(
        F.lit("ALL").alias("shard"),
        F.hll_sketch_estimate("sketch").alias("est_distinct"),
    )
    return per_shard.unionByName(merged)
