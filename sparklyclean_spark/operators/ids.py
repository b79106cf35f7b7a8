"""Global dense row numbering at scale.

``row_number() OVER (ORDER BY ...)`` with no partition key collapses
the whole dataset into ONE task — the classic global-sort trap. The
scale-correct pattern is a two-phase distributed prefix sum:

1. split rows into order-respecting buckets,
2. per-bucket local ``row_number`` / running sum,
3. add each bucket's start offset = exclusive prefix sum of bucket
   totals — a tiny aggregation joined back broadcast.

Determinism by construction (the hard-won part): the bucket id is a
PURE FUNCTION OF THE ROW'S OWN DATA — a numeric sort surrogate
compared against boundary literals collected once to the driver.
Earlier revisions derived the bucket from ``spark_partition_id()``
after ``repartitionByRange``; that is a property of the PHYSICAL
partitioning, and when AQE coalesces the offsets-aggregate branch and
the join-probe branch differently the two branches label the same row
with different ids — silently wrong offsets (rows and schema survive;
values flip). Pinning one materialization with an eager
``localCheckpoint`` narrowed but did not close the race (driver-red
in two consecutive rounds) and is itself a scale liability: it
materializes the ENTIRE dataset to executor storage and severs
lineage. With data-derived buckets there is nothing physical to
disagree about, so no checkpoint is needed: both plan branches
recompute the same bucket for the same row, always.

Boundary placement only affects load balance, never values: for any
monotone bucketing, ``cum_before(r) = sum(totals of buckets < b(r)) +
(exclusive prefix of r within b(r) in full order)`` equals the global
exclusive prefix sum. So approximate quantile boundaries are fine.

Every step is distributed; driver state is O(#buckets) literals. The
reference's only global ordering is a full ``sortBy`` of predictions
(ApplyDupClassifier.scala:74-83) — fine for k results, not for
assigning ids to 100 TB of rows; §2.10 capability-gap operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# When the first order column has at most this many distinct values
# (lang codes, categories, ...) its percentile boundaries collapse and
# range-bucketing on it alone would put everything in a handful of
# buckets. Below the cap we collect the distinct values exactly
# (bounded driver state) and sub-bucket on the next order column.
_EXACT_CAP = 4096


def _surrogate(col: Column, dtype: T.DataType) -> Column | None:
    """Numeric sort surrogate: NON-STRICTLY monotone under Spark's
    ascending ordering of ``dtype`` (ties may share a value — ties
    only share a bucket, which is always safe)."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                          T.FloatType, T.DoubleType, T.DecimalType)):
        # double cast is non-strictly monotone even where it loses
        # precision (|v| > 2^53): rounding never reorders
        return col.cast("double")
    if isinstance(dtype, T.BooleanType):
        return col.cast("int").cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("double")
    if isinstance(dtype, T.TimestampType):
        return col.cast("double")  # epoch seconds incl. fraction
    if isinstance(dtype, T.TimestampNTZType):
        # NTZ has no numeric cast; micros since a fixed NTZ epoch
        # (never via session-TZ instants — DST fall-back repeats
        # local times and would break monotonicity)
        return F.timestamp_diff(
            "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col
        ).cast("double")
    if isinstance(dtype, T.StringType):
        # first 7 bytes as a big-endian integer: monotone in UTF-8
        # byte order, which is Spark's default (binary) string order;
        # zero-padding on the right keeps prefixes ordered first
        hexs = F.rpad(F.hex(F.substring(col.cast("binary"), 1, 7)), 14, "0")
        return F.conv(hexs, 16, 10).cast("double")
    return None


def _balanced_sum(terms: list[Column]) -> Column:
    """Sum a term list as a BALANCED tree: a left-deep ``a+b+c+...``
    chain of hundreds of terms overflows the JVM stack during column
    conversion/analysis (recursive tree walks); pairing halves the
    depth to log2(n)."""
    if not terms:
        return F.lit(0)
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _bucket_from_bounds(surr: Column, bounds: list[float]) -> Column:
    """#{b in bounds : surr >= b} as codegen-friendly indicator sums.
    NULL surrogates (null keys sort first ascending) score 0 on every
    indicator and land in bucket 0, matching nulls-first; NaN sorts
    LAST in Spark, so it is routed to the top bucket explicitly (its
    ``>=`` comparisons are all false and would misplace it in bucket
    0, breaking bucket monotonicity)."""
    counted = _balanced_sum(
        [F.when(surr >= F.lit(b), 1).otherwise(0) for b in bounds]
    )
    return F.when(F.isnan(surr), F.lit(len(bounds))).otherwise(counted)


def _index_of_literal(col: Column, values: list) -> Column:
    """Exact position of ``col`` in the sorted literal list (nulls
    first at index 0 when present). Values are distinct, so the
    one-hot indicator sum equals the matching index — and balances."""
    return _balanced_sum(
        [
            F.when(col.eqNullSafe(F.lit(v)), F.lit(i)).otherwise(0)
            for i, v in enumerate(values)
            if v is not None  # null rows keep index 0
        ]
    )


def ranged_with_offsets(
    df: DataFrame,
    order_by: list[str],
    weight: Column,
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-phase global prefix-sum scaffolding shared by ``dense_ids``
    and ``pack_sequences``. Appends

    * ``_bucket`` — an order-respecting bucket id derived purely from
      the row's ``order_by`` values (collected boundary literals; no
      physical-partition identity anywhere),
    * ``_w`` — the weight, and
    * ``_off`` — the bucket's exclusive global prefix sum of ``_w``
      (the totals table is #buckets rows, prefix-summed with a tiny
      window and broadcast back on the data-derived key).

    Callers combine ``_off`` with a ``Window.partitionBy("_bucket")``
    local window and must drop the underscore columns.

    Boundary collection is two bounded driver actions (a percentile
    aggregate, plus a distinct-value collect capped at ``_EXACT_CAP``
    when the leading key is low-cardinality); everything else is one
    hash shuffle on ``_bucket`` plus the O(#buckets) offsets join.
    """
    spark = df.sparkSession
    n_buckets = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_buckets = max(2, min(n_buckets, 1024))

    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    c0 = order_by[0]
    s0 = _surrogate(F.col(c0), dtypes[c0])

    bucket: Column = F.lit(0)
    if s0 is not None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        probe_aggs = [F.percentile_approx(s0, qs, 10000).alias("_q0")]
        # distinct-count probe decides whether the leading key alone
        # can spread the data
        probe_aggs.append(F.approx_count_distinct(F.col(c0)).alias("_nd0"))
        c1 = order_by[1] if len(order_by) > 1 else None
        s1 = _surrogate(F.col(c1), dtypes[c1]) if c1 is not None else None
        if s1 is not None:
            probe_aggs.append(F.percentile_approx(s1, qs, 10000).alias("_q1"))
        probe = df.agg(*probe_aggs).collect()[0]

        bounds0 = sorted({b for b in (probe["_q0"] or []) if b is not None and b == b})
        nd0 = probe["_nd0"] or 0
        if len(bounds0) >= max(4, n_buckets // 4) or (s1 is None and nd0 > _EXACT_CAP):
            # leading key is spread enough: pure range buckets on it
            bucket = _bucket_from_bounds(s0, bounds0)
        elif nd0 <= _EXACT_CAP:
            # low-cardinality leading key: exact value index (bounded
            # collect), sub-bucketed on the second key's global
            # percentiles — monotone because the leading grouping is
            # exact, not ranged
            vals = [r[0] for r in df.select(c0).distinct().collect()]

            def _spark_asc_key(v):
                # Spark ascending order: NULL first, NaN LAST (greater
                # than every number). Python's sort chokes on raw NaN
                # keys (all comparisons False -> arbitrary order), so
                # flag it out of the comparison.
                is_nan = isinstance(v, float) and v != v
                return (v is not None, is_nan, 0 if (v is None or is_nan) else v)

            vals.sort(key=_spark_asc_key)
            idx = _index_of_literal(F.col(c0), vals)
            if s1 is not None:
                bounds1 = sorted({b for b in (probe["_q1"] or []) if b is not None and b == b})
                sub = _bucket_from_bounds(s1, bounds1)
                bucket = idx * F.lit(len(bounds1) + 1) + sub
            else:
                bucket = idx
        else:
            # mid-cardinality with collapsed percentiles (heavy skew):
            # the coarse range buckets are still correct, just uneven
            bucket = _bucket_from_bounds(s0, bounds0)

    based = df.withColumn("_bucket", bucket.cast("bigint")).withColumn("_w", weight)
    totals = based.groupBy("_bucket").agg(F.sum("_w").alias("_tot"))
    off_w = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn("_off", F.coalesce(F.sum("_tot").over(off_w), F.lit(0))).select(
        "_bucket", "_off"
    )
    return based.join(F.broadcast(offsets), "_bucket")


def dense_ids(
    df: DataFrame,
    order_by: list[str],
    id_name: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense 1-based global id ordered by ``order_by``
    (must be a unique key for deterministic output)."""
    based = ranged_with_offsets(df, order_by, F.lit(1).cast("bigint"), num_partitions)
    local_w = Window.partitionBy("_bucket").orderBy(*[F.col(c) for c in order_by])
    return (
        based.withColumn("_local", F.row_number().over(local_w))
        .withColumn(id_name, (F.col("_off") + F.col("_local")).cast("bigint"))
        .drop("_bucket", "_w", "_local", "_off")
    )
