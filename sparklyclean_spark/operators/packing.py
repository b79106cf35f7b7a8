"""Training-sequence packing: assign documents to fixed token-budget
bins (the dataloader-sharding step of an LLM training pipeline).

Semantics: documents are packed in a deterministic order (``order_by``,
must be unique); each document starts in the bin where its exclusive
running-token-total lands (``bin_id = floor(cum_before / budget)``).
Bins are contiguous and may overflow by at most one document — the
standard streaming-packing contract (a bin is closed when the next
document would start past its budget).

Scale shape: the naive formulation is ``sum() OVER (ORDER BY ...)``
— a single-task global window. This implementation computes the
global prefix sum distributedly, the same two-phase pattern as
``operators/ids.py``:

1. ``repartitionByRange`` on the pack order (total order across
   partitions),
2. local cumulative sum within each partition,
3. add per-partition start offsets (exclusive prefix sum over
   #partitions rows, broadcast back).

No reference counterpart; §2.10 capability-gap operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    size_col: Column | str,
    order_by: list[str],
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``cum_before`` (exclusive global running total of
    ``size_col``), ``bin_id`` and ``bin_offset`` (start position
    within the bin), packing in ``order_by`` order."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    cols = [F.col(c) for c in order_by]
    ranged = df.repartitionByRange(*([num_partitions] if num_partitions else []), *cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_sz", size.cast("bigint")
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = with_pid.withColumn("_local_before", F.coalesce(F.sum("_sz").over(local_w), F.lit(0)))
    totals = local.groupBy("_pid").agg(F.sum("_sz").alias("_tot"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn("_off", F.coalesce(F.sum("_tot").over(off_w), F.lit(0))).select(
        "_pid", "_off"
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("cum_before", F.col("_off") + F.col("_local_before"))
        .withColumn("bin_id", F.floor(F.col("cum_before") / budget).cast("bigint"))
        .withColumn(
            "bin_offset", (F.col("cum_before") - F.col("bin_id") * budget).cast("bigint")
        )
        .drop("_pid", "_sz", "_local_before", "_off")
    )
