"""Categorical feature encodings for model training pipelines.

Target (mean) encoding with additive smoothing is the workhorse
high-cardinality categorical encoding: the category's target mean
shrunk toward the global prior by a pseudo-count ``m``
(``(sum_y + m·prior) / (n + m)`` — the empirical-Bayes form), so
rare categories don't memorize noise. Frequency encoding is its
cheap cousin (category → share of rows).

Scale shape: ONE map-side-combinable hash aggregation per encoder
(output cardinality = #categories) plus a 1-row global aggregate
broadcast back — no shuffle of the fact table beyond the category
key, no per-row Python. The encoder table is then a broadcast join
back onto training rows (not materialized here; the table IS the
artifact a feature store persists).

No reference counterpart; SURVEY §2.10 capability-gap operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.functions.rounding import ratio4


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 10.0,
) -> DataFrame:
    """Smoothed target encoding table: one row per category with the
    row count, raw mean, and the shrunk encoding. ``m`` is the
    pseudo-count: a category with n≪m stays near the prior; n≫m
    approaches its own mean. Doubles use the q1-precedent
    ``ROUND(x, 4)`` (sums of ~10⁴+ magnitudes; association error is
    orders below the grid)."""
    # mean denominators COUNT THE TARGET, not all rows: sum() skips
    # NULL targets, so a count(*) denominator biased raw_mean/prior
    # low on NULL-target data (r9 review finding). n stays the row
    # count (the category's true size for the shrinkage weight).
    per = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(target_col).alias("_nt"),
        F.sum(target_col).alias("_sum"),
    )
    prior = df.agg(
        (F.sum(target_col) / F.count(target_col)).alias("_prior")
    )
    return per.join(F.broadcast(prior)).select(
        cat_col,
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("_sum") / F.col("_nt"), 4).alias("raw_mean"),
        F.round(
            (F.col("_sum") + F.lit(m) * F.col("_prior"))
            / (F.col("_nt") + F.lit(m)),
            4,
        ).alias("encoded"),
        F.round("_prior", 4).alias("prior"),
    )


def frequency_encode(df: DataFrame, cat_col: str) -> DataFrame:
    """Frequency encoding table: category → count and share of rows
    (floor contract over exact integer counts)."""
    per = df.groupBy(cat_col).agg(F.count(F.lit(1)).alias("n"))
    total = per.agg(F.sum("n").alias("_tot"))
    return per.join(F.broadcast(total)).select(
        cat_col,
        F.col("n").cast("bigint").alias("n"),
        # _tot >= 1 whenever a group exists, but keep the ANSI-safe guard
        # convention uniform across every ratio column in the repo
        F.when(F.col("_tot") > 0, ratio4("n", "_tot")).alias("freq"),
    )
