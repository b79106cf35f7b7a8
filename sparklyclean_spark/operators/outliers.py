"""Percentile-based numeric cleaning (winsorization / outlier gates).

Training-data pipelines clip or drop numeric outliers before
aggregation (fees, durations, token counts). ``winsorize`` computes
per-group clip bounds at given percentiles and clips in the same
plan: one grouped aggregation over the data + one broadcast join —
no window over the raw rows, so a hot group never serializes into
one task.

``exact=True`` uses Spark's exact ``percentile`` (sort-based — fine
at audit scale, and what the DuckDB ``quantile_cont`` oracle can
reproduce bit-for-bit). The 100 TB path is ``exact=False`` →
``approx_percentile`` (t-digest-style sketch, single streaming pass,
mergeable across partitions). Both bounds come from ONE aggregate
buffer (array-of-percentages form), not two.

The bounds join is null-safe on the group keys, so rows in a NULL
group are clipped against that group's bounds instead of being
silently dropped (the operator is row-preserving).

No reference counterpart; §2.10 capability-gap operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.functions.rounding import round4


def _join_group_stats(df: DataFrame, keys: list[str], stats: DataFrame) -> DataFrame:
    """Null-safe broadcast join of a per-group stats frame (key
    columns pre-aliased ``_k_<k>``) back onto the rows — the shared
    block of winsorize / quantile_bins / standardize / MAD /
    trimmed_mean (was five inline copies; r9 review). Global stats
    (no keys) cross-join the 1-row frame."""
    if keys:
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"_k_{k}"))
            cond = c if cond is None else (cond & c)
        return df.join(F.broadcast(stats), cond).drop(*[f"_k_{k}" for k in keys])
    return df.crossJoin(F.broadcast(stats))


def winsorize(
    df: DataFrame,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    by: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Clip ``value_col`` to its [p_lo, p_hi] percentile band
    (per ``by`` group when given). Appends ``<col>_clipped`` plus the
    bounds used and an ``is_outlier`` flag; row-preserving."""
    v = F.col(value_col)
    keys = by or []
    pcts = F.array(F.lit(p_lo), F.lit(p_hi))
    both = (
        F.percentile(v, pcts) if exact else F.approx_percentile(v, pcts, F.lit(10_000))
    )
    bounds = df.groupBy(*keys).agg(both.alias("_b"))
    bounds = bounds.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        F.element_at("_b", 1).alias("_lo"),
        F.element_at("_b", 2).alias("_hi"),
    )
    joined = _join_group_stats(df, keys, bounds)
    return (
        joined.withColumn(
            # greatest/least skip NULLs in Spark, so an unguarded form
            # would silently impute a NULL value to clip_hi; NULL in,
            # NULL out keeps the operator row-preserving AND
            # value-preserving for missing data.
            f"{value_col}_clipped",
            F.when(v.isNotNull(), F.greatest(F.col("_lo"), F.least(F.col("_hi"), v))),
        )
        .withColumn("is_outlier", (v < F.col("_lo")) | (v > F.col("_hi")))
        .withColumnRenamed("_lo", "clip_lo")
        .withColumnRenamed("_hi", "clip_hi")
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    by: list[str] | None = None,
    exact: bool = True,
    bin_name: str | None = None,
) -> DataFrame:
    """Quantile discretization (the ML feature-prep binner): assign
    each row the 1-based quantile bucket of ``value_col`` within its
    ``by`` group. ``bin = 1 + #{internal boundaries <= value}`` over
    the ``n_bins - 1`` internal percentile boundaries, so output bins
    are 1..n_bins with ~equal mass. A value exactly EQUAL to a
    boundary is assigned to the UPPER bin (``<=`` counts the
    boundary), and duplicated boundary values produce skipped (empty)
    bin ids — deterministic, value-driven, no rank nondeterminism
    under duplicate values, unlike ``ntile`` which splits equal
    values across bins by arbitrary row order. Matches the DuckDB
    oracle's identical counting rule.

    Scale shape: same as ``winsorize`` — ONE grouped percentile
    aggregate (array form, one buffer), broadcast join back,
    bucket assignment as a tiny per-row filter over the ≤ n_bins-1
    boundary array. No window over raw rows, so a hot group never
    serializes into one task. ``exact=False`` flips to the mergeable
    sketch for the 100 TB path.

    No reference counterpart; §2.10 capability-gap operator.
    """
    v = F.col(value_col)
    keys = by or []
    name = bin_name or f"{value_col}_bin"
    pcts = F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
    agg = F.percentile(v, pcts) if exact else F.approx_percentile(v, pcts, F.lit(10_000))
    bounds = df.groupBy(*keys).agg(agg.alias("_bounds"))
    bounds = bounds.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys], "_bounds"
    )
    joined = _join_group_stats(df, keys, bounds)
    bucket = F.lit(1) + F.size(
        F.filter("_bounds", lambda b: b <= v.cast("double"))
    )
    return joined.withColumn(
        name, F.when(v.isNull(), F.lit(None)).otherwise(bucket.cast("int"))
    ).drop("_bounds")


def standardize(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    z_name: str | None = None,
) -> DataFrame:
    """Per-group z-score standardization of a numeric feature
    (``z = (x - mean) / stddev_samp``), the third leg of the
    distribution-based prep family next to ``winsorize`` and
    ``quantile_bins``. Appends ``<col>_z`` (NULL when the group's
    stddev is 0 or undefined) plus the group stats used.

    Same scale shape as its siblings: ONE grouped aggregate over the
    data + one broadcast join — never a window over raw rows, so a
    hot group cannot serialize into a single task. The join is
    null-safe on the group keys (NULL-group rows are standardized
    against their own group, not dropped).
    """
    v = F.col(value_col)
    keys = by or []
    name = z_name or f"{value_col}_z"
    stats = df.groupBy(*keys).agg(
        F.avg(v).alias("_mu"), F.stddev_samp(v).alias("_sd")
    )
    stats = stats.select(*[F.col(k).alias(f"_k_{k}") for k in keys], "_mu", "_sd")
    joined = _join_group_stats(df, keys, stats)
    z = F.when(
        F.col("_sd").isNotNull() & (F.col("_sd") != 0.0),
        (v - F.col("_mu")) / F.col("_sd"),
    )
    # floor contract (round4), not engine F.round: z-scores are the
    # rounding.py docstring's canonical floor-contract case, and the
    # DuckDB oracle mirrors the identical floor formula
    return (
        joined.withColumn(name, round4(z))
        .withColumn("grp_mean", round4(F.col("_mu")))
        .withColumn("grp_std", round4(F.col("_sd")))
        .drop("_mu", "_sd")
    )


def median_abs_deviation(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Per-group median and MAD (median absolute deviation) — the
    robust twin of mean/stddev (``standardize``): immune to the heavy
    tails that drag a standard deviation. Returns one row per group
    with ``median`` and ``mad`` (both 4-dp rounded).

    Scale shape: one grouped exact-percentile aggregate for the
    median, broadcast join back, a second grouped percentile over the
    absolute deviations — two bounded aggregation passes, no window
    over raw rows. Both engines use the same linear-interpolation
    percentile definition, so the doubles match."""
    v = F.col(value_col)
    keys = by or []
    med = df.groupBy(*keys).agg(F.percentile(v, F.lit(0.5)).alias("_med"))
    med_k = med.select(*[F.col(k).alias(f"_k_{k}") for k in keys], "_med")
    joined = _join_group_stats(df, keys, med_k)
    dev = joined.select(*keys, "_med", F.abs(v - F.col("_med")).alias("_dev"))
    return (
        dev.groupBy(*keys)
        .agg(
            round4(F.first("_med")).alias("median"),
            round4(F.percentile(F.col("_dev"), F.lit(0.5))).alias("mad"),
        )
    )


def quantile_transform(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    q_name: str | None = None,
) -> DataFrame:
    """Rank-based quantile transform of a numeric feature to [0, 1]
    (the uniform-output normalizer, robust to any marginal
    distribution): ``q = (rank - 1) / (n - 1)`` per group — exactly
    SQL ``PERCENT_RANK``, whose tie semantics (equal values share a
    rank, hence an equal quantile) are identical across engines.
    Single-row groups map to 0.0.

    Scale shape: one window per group partition — a hot group
    serializes into one task like any exact-rank transform; at
    corpus scale swap to the `quantile_bins` + within-bin
    interpolation composite. NULL values pass through with NULL q.
    """
    from pyspark.sql import Window

    keys = by or []
    name = q_name or f"{value_col}_q"
    w = Window.partitionBy(*keys).orderBy(value_col) if keys else (
        Window.orderBy(value_col)
    )
    # round4: the exact floor contract, previously inlined; the
    # isNotNull guard was dead (this branch filters NULLs already)
    out = df.where(F.col(value_col).isNotNull()).withColumn(
        name, round4(F.percent_rank().over(w))
    )
    nulls = df.where(F.col(value_col).isNull()).withColumn(
        name, F.lit(None).cast("double")
    )
    return out.unionByName(nulls)


def trimmed_mean(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group trimmed mean: the mean over values inside the
    [lo, hi] percentile band (inclusive) — the robust-location
    estimator next to winsorize (which CLIPS rather than drops) and
    MAD. One row per group: ``(keys..., n_rows, n_used, lo_bound,
    hi_bound, trimmed_mean)``.

    Scale shape: the winsorize shape — ONE grouped percentile agg,
    broadcast bounds join, one more grouped agg; no raw-row window.
    """
    keys = by or []
    pcts = F.array(F.lit(lo), F.lit(hi))
    bounds = df.groupBy(*keys).agg(
        F.percentile(F.col(value_col), pcts).alias("_b")
    )
    bounds = bounds.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys], "_b"
    )
    joined = _join_group_stats(df, keys, bounds)
    v = F.col(value_col)
    inside = v.isNotNull() & (v >= F.col("_b")[0]) & (v <= F.col("_b")[1])
    return joined.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(inside.cast("bigint")).cast("bigint").alias("n_used"),
        round4(F.min(F.col("_b")[0])).alias("lo_bound"),
        round4(F.min(F.col("_b")[1])).alias("hi_bound"),
        round4(F.avg(F.when(inside, v))).alias("trimmed_mean"),
    )
