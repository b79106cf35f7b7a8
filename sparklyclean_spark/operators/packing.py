"""Training-sequence packing: assign documents to fixed token-budget
bins (the dataloader-sharding step of an LLM training pipeline).

Semantics — fixed-grid cumulative binning: documents are laid out
end-to-end in a deterministic order (``order_by``, must be unique) on
a global token axis; ``bin_id = floor(cum_before / budget)`` is the
grid cell where each document STARTS, and ``bin_offset`` its start
position inside that cell. Consequences callers should know:

* a document larger than the budget spans several grid cells (it
  keeps the bin where it starts; the cells it covers receive no other
  documents and may therefore be empty of starts);
* documents never move forward to "close" a bin early — membership
  is a pure function of the prefix sum, so it is stable under
  re-partitioning and appends at the end.

Scale shape: the naive formulation is ``sum() OVER (ORDER BY ...)``
— a single-task global window. This implementation reuses the
two-phase distributed prefix sum from ``operators/ids.py``
(``ranged_with_offsets``): data-derived order buckets, local
cumulative sum per bucket, broadcast per-bucket start offsets —
deterministic by construction (see ids.py docstring).

No reference counterpart; §2.10 capability-gap operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparklyclean_spark.operators.ids import ranged_with_offsets


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
    based = ranged_with_offsets(df, order_by, size.cast("bigint"), num_partitions)
    local_w = (
        Window.partitionBy("_bucket")
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        based.withColumn("_local_before", F.coalesce(F.sum("_w").over(local_w), F.lit(0)))
        .withColumn("cum_before", F.col("_off") + F.col("_local_before"))
        .withColumn("bin_id", F.floor(F.col("cum_before") / budget).cast("bigint"))
        .withColumn(
            "bin_offset", (F.col("cum_before") - F.col("bin_id") * budget).cast("bigint")
        )
        .drop("_bucket", "_w", "_local_before", "_off")
    )
