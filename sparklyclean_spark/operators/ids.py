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
deterministic for a unique order key.

The reference's only global ordering is a full ``sortBy`` of
predictions (ApplyDupClassifier.scala:74-83) — fine for k results,
not for assigning ids to 100 TB of rows; §2.10 capability-gap
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    df: DataFrame,
    order_by: list[str],
    id_name: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense 1-based global id ordered by ``order_by``
    (must be a unique key for deterministic output)."""
    cols = [F.col(c) for c in order_by]
    ranged = df.repartitionByRange(*([num_partitions] if num_partitions else []), *cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    local_w = Window.partitionBy("_pid").orderBy(*cols)
    local = with_pid.withColumn("_local", F.row_number().over(local_w))
    # exclusive prefix sum of partition sizes — #partitions rows only
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0))).select(
        "_pid", "_off"
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(id_name, (F.col("_off") + F.col("_local")).cast("bigint"))
        .drop("_pid", "_local", "_off")
    )
