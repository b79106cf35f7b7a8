"""Single-pass table profiling (per-column stats).

Data-quality triage over a 100 TB table must not run one job per
column: ``profile_columns`` computes every column's metrics in ONE
aggregation over ONE scan, then unpivots the single result row into
``(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)`` rows
driver-side via ``inline`` (no extra shuffle — the agg output is one
row).

Distinct counts: ``exact=True`` uses ``count(distinct col)`` —
Catalyst plans multiple distinct aggregates with an Expand (input
replicated once per distinct column), which is fine at audit scale
but multiplies the shuffle by the column count. The 100 TB path is
``exact=False`` -> ``approx_count_distinct`` (HLL++, single Expand-
free pass, ~2% rsd). The DuckDB oracle uses the exact form at sf0.01
where both are affordable.

Min/max are rendered as strings (numerics via DECIMAL(38,4) so both
engines print identical fixed-scale text; Spark's double->string
would use scientific notation where DuckDB doesn't).

No reference counterpart (the reference never inspects its data,
SURVEY.md §5 — validation was manual); §2.10 capability-gap operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_text(col: Column, kind: str) -> Column:
    if kind == "num":
        # NaN/Inf/|x|>=1e34 render as strings instead of erroring: a
        # plain decimal cast ABORTS the whole profile under ANSI mode
        # on exactly the dirty numerics this triage operator exists to
        # surface (r9 review finding). try_cast -> NULL for the
        # overflow case, then the raw double's string form is kept.
        d = col.cast("double")
        dec = F.round(d, 4).try_cast("decimal(38,4)")
        return F.when(
            F.isnan(d) | d.isin(float("inf"), float("-inf")) | dec.isNull(),
            d.cast("string"),
        ).otherwise(dec.cast("string"))
    return col.cast("string")


def profile_columns(
    df: DataFrame,
    cols: list[tuple[str, str]],
    exact: bool = True,
) -> DataFrame:
    """Profile ``cols`` = [(name, kind)] with kind in {"num", "str",
    "ts"}. Returns one row per column, computed in one aggregation."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for name, kind in cols:
        c = F.col(name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"_nn_{name}"))
        nd = F.count_distinct(c) if exact else F.approx_count_distinct(c)
        aggs.append(nd.alias(f"_nd_{name}"))
        aggs.append(_as_text(F.min(c), kind).alias(f"_mn_{name}"))
        aggs.append(_as_text(F.max(c), kind).alias(f"_mx_{name}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn_{name}").alias("n_nulls"),
                F.col(f"_nd_{name}").alias("n_distinct"),
                F.col(f"_mn_{name}").alias("min_val"),
                F.col(f"_mx_{name}").alias("max_val"),
            )
            for name, _ in cols
        ]
    )
    return one.select(F.inline(rows))


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Fixed-width value histogram, optionally per group: one hash
    aggregation on ``(by..., bucket)`` — map-side combinable, output
    size #groups x (n_buckets+2), never the raw rows. Bucket 0 is the
    ``< lo`` underflow, bucket ``n_buckets+1`` the ``>= hi`` overflow
    (width_bucket conventions), and empty buckets are absent (sparse).

    The bucket index is computed with explicit floor arithmetic
    (identical IEEE-754 ops on both engines) rather than
    ``width_bucket`` so the DuckDB oracle can reproduce it bit-for-bit.
    """
    v = F.col(value_col).cast("double")
    width = (hi - lo) / n_buckets
    bucket = (
        F.when(v.isNull(), F.lit(None))
        .when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(n_buckets + 1))
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)) + 1)
    ).cast("int")
    keys = [F.col(c) for c in (by or [])]
    out = (
        df.select(*keys, bucket.alias("bucket"))
        .where(F.col("bucket").isNotNull())
        .groupBy(*(by or []), "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return out.select(
        *(by or []),
        "bucket",
        F.round(F.lit(lo) + (F.col("bucket") - 1) * F.lit(width), 4).alias("bucket_lo"),
        F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 4).alias("bucket_hi"),
        "n",
    )
