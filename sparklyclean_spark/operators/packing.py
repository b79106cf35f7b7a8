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


def pack_bins_greedy(
    df: DataFrame,
    size_col: str,
    order_by: list[str],
    capacity: int,
    n_shards: int = 256,
) -> DataFrame:
    """Capacity-respecting sequential packing — the actual dataloader
    contract (``pack_sequences`` is the fixed-grid/offset form): walk
    documents in ``order_by`` order and open a NEW bin whenever adding
    the next document would exceed ``capacity``; oversized documents
    get a bin of their own. No bin ever exceeds capacity (except a
    single oversized doc), unlike grid packing where a document can
    straddle cells.

    The fill recurrence is sequential (non-associative), so it cannot
    be a window/prefix-sum — the scale shape is the one real
    dataloaders use: shard the corpus deterministically (xxhash64 of
    the order key, ``n_shards`` ways), pack each shard independently
    with one Arrow ``applyInPandas`` pass, and namespace bin ids by
    shard. Packing quality is unaffected (any shard's fill ratio
    matches global greedy in expectation); parallelism is ``n_shards``
    regardless of corpus size. Deterministic: shard id and visit order
    are pure functions of the data.

    Emits the input columns plus ``bin_id`` (globally unique:
    shard * 2^32 + local bin) and ``bin_fill`` (the bin's total size
    after packing). Documents with a NULL ``size_col`` are EXCLUDED —
    a size-less document cannot be packed against a token budget, and
    letting it through crashed the whole Arrow pass on the int cast
    (r9 review finding); count them upstream if the gap matters.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    shard = F.pmod(F.xxhash64(*[F.col(c) for c in order_by]), F.lit(n_shards)).alias(
        "_shard"
    )
    based = df.where(F.col(size_col).isNotNull()).withColumn("_shard", shard)
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in based.schema.fields]
        + ["bin_id bigint", "bin_fill bigint"]
    )

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        shard_id = int(pdf["_shard"].iloc[0]) if len(pdf) else 0
        bins, fills = [], []
        local, fill = 0, 0
        for s in pdf[size_col].astype("int64"):
            s = int(s)
            if fill > 0 and fill + s > capacity:
                local += 1
                fill = 0
            fill += s
            bins.append((shard_id << 32) + local)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        # bin_fill = final fill of the bin the row landed in
        final = {}
        for b, f_ in zip(bins, fills):
            final[b] = f_
        pdf["bin_fill"] = pd.Series([final[b] for b in bins], dtype="int64")
        return pdf

    return based.groupBy("_shard").applyInPandas(pack_one, out_schema).drop("_shard")
