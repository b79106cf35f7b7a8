"""Global dense row numbering at scale.

``row_number() OVER (ORDER BY ...)`` with no partition key collapses
the whole dataset into ONE task — the classic global-sort trap. The
scale-correct pattern (same as RDD ``zipWithIndex``, restated in
DataFrame algebra) is:

1. ``repartitionByRange`` on the order key — the range partitioner
   gives a total order ACROSS partitions,
2. per-partition local ``row_number`` (sort within partition only),
3. add each partition's start offset = exclusive prefix sum of
   partition counts — a tiny aggregation joined back broadcast.

Every step is distributed; the only single-point work is the prefix
sum over #partitions rows. Output ids are 1-based, dense, and
deterministic for a unique order key. ``operators/packing.py`` reuses
the same scaffolding (exposed here as ``ranged_with_offsets``) for
global token prefix sums.

The reference's only global ordering is a full ``sortBy`` of
predictions (ApplyDupClassifier.scala:74-83) — fine for k results,
not for assigning ids to 100 TB of rows; §2.10 capability-gap
operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranged_with_offsets(
    df: DataFrame,
    order_by: list[str],
    weight: Column,
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-phase global prefix-sum scaffolding shared by ``dense_ids``
    and ``pack_sequences``: range-partition ``df`` on ``order_by``
    (total order across ascending partition ids), then append

    * ``_pid`` — the partition id,
    * ``_off`` — that partition's exclusive global prefix sum of
      ``weight`` (the offsets table is #partitions rows, prefix-summed
      in a single bounded task and broadcast back).

    Callers combine ``_off`` with a partition-local window and must
    drop the underscore columns from their output.

    Determinism note: ``spark_partition_id()`` is a property of the
    PHYSICAL partitioning, so the frame carrying ``_pid`` must be
    evaluated exactly once. Without materialization the offsets
    aggregate and the probe side of the join are two independent
    ``Exchange rangepartitioning`` subtrees, and AQE may coalesce the
    two shuffle reads differently — the ``_pid`` labels then disagree
    between branches and ``_off`` is joined to the wrong partitions
    (silently wrong values; row count and schema survive). The eager
    ``localCheckpoint`` below pins ONE materialized partitioning that
    both consumers read — the DataFrame restatement of the extra job
    RDD ``zipWithIndex`` runs before mapping offsets.
    """
    cols = [F.col(c) for c in order_by]
    ranged = df.repartitionByRange(*([num_partitions] if num_partitions else []), *cols)
    local = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .withColumn("_w", weight)
        .localCheckpoint(eager=True)
    )
    totals = local.groupBy("_pid").agg(F.sum("_w").alias("_tot"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn("_off", F.coalesce(F.sum("_tot").over(off_w), F.lit(0))).select(
        "_pid", "_off"
    )
    return local.join(F.broadcast(offsets), "_pid")


def dense_ids(
    df: DataFrame,
    order_by: list[str],
    id_name: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense 1-based global id ordered by ``order_by``
    (must be a unique key for deterministic output)."""
    based = ranged_with_offsets(df, order_by, F.lit(1).cast("bigint"), num_partitions)
    local_w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_by])
    return (
        based.withColumn("_local", F.row_number().over(local_w))
        .withColumn(id_name, (F.col("_off") + F.col("_local")).cast("bigint"))
        .drop("_pid", "_w", "_local", "_off")
    )
