"""Naive blocked candidate-pair generation (the semantic reference path).

Equivalent result set to the Dis-Dedup triangle path
(``operators/dedup/disdedup.py``) but expressed as a plain blocked
self-join: explode block keys, equi-join on (bk, bv) with ``id1 <
id2``, keep a pair only under its lowest common blocking function
(exactly-once guard, SURVEY.md §2.9 G3; reference
``Compare.scala:94,106``).

This is the right plan when blocks are small/uniform — Catalyst gives
a shuffled hash/sort-merge join and AQE splits moderately skewed
partitions. The triangle path exists for the adversarial case (a
block holding a large fraction of all rows) where per-key work grows
quadratically and key-splitting must be done BEFORE the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.operators.dedup.blocking import (
    BlockingRule,
    bv_col,
    explode_blocks,
    lowest_common_block_scalar,
)


def candidate_pairs_naive(
    df: DataFrame,
    rules: list[BlockingRule],
    id_col: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """All intra-block pairs, each exactly once.

    Returns ``(bk, id1, id2, t1_<payload>..., t2_<payload>...)`` with
    ``id1 < id2``. ``payload_cols`` are carried for downstream feature
    generation; only those columns shuffle (column pruning — the
    reference shuffles entire CSV lines, SURVEY.md §4).
    """
    payload_cols = payload_cols or []
    bv_cols = [bv_col(r.priority) for r in rules]
    # Block keys are computed from the full row, THEN columns are pruned
    # to id + payload + keys so only needed data shuffles.
    base = explode_blocks(df, rules).select(
        id_col, *payload_cols, *bv_cols, "bk", "bv"
    )
    # Downstream per-pair work (feature generation) inherits the join's
    # stream-side parallelism. A small table arrives as ONE input split,
    # which under a broadcast join serializes ALL pair comparisons into
    # one task (measured 9 s -> 0.4 s for 4.5 M levenshteins at sf0.1).
    # Fan the exploded rows out when the source is under-split; on a
    # cluster the scan already has >= shuffle.partitions splits and this
    # branch never triggers.
    try:
        target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        target = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < target:
        base = base.repartition(target)

    def side(tag: str) -> DataFrame:
        cols = [
            F.col(id_col).alias(f"{tag}_id"),
            F.col("bk").alias(f"{tag}_bk"),
            F.col("bv").alias(f"{tag}_bv"),
        ] + [F.col(c).alias(f"{tag}_{c}") for c in payload_cols + bv_cols]
        return base.select(*cols)

    a, b = side("t1"), side("t2")
    joined = a.join(
        b,
        (F.col("t1_bk") == F.col("t2_bk"))
        & (F.col("t1_bv") == F.col("t2_bv"))
        & (F.col("t1_id") < F.col("t2_id")),
    )
    # exactly-once guard, codegen form (no array ops per pair)
    guarded = joined.where(F.col("t1_bk") == lowest_common_block_scalar(rules))
    out_cols = [
        F.col("t1_bk").alias("bk"),
        F.col("t1_id").alias("id1"),
        F.col("t2_id").alias("id2"),
    ] + [F.col(f"t1_{c}") for c in payload_cols] + [F.col(f"t2_{c}") for c in payload_cols]
    return guarded.select(*out_cols)
