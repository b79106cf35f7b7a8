"""Embedding-corpus hygiene statistics — the pre-index audit every
vector pipeline runs before building an ANN structure: zero vectors
(cosine-undefined), non-finite components (NaN poisoning), ragged
dimensions (silent concat bugs upstream), and the norm distribution
(un-normalized corpora break dot-product == cosine assumptions).

No reference counterpart; SURVEY §2.10 embedding-stack operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.functions.rounding import round4 as _r4
from sparklyclean_spark.functions.vectors import norm


def embedding_norm_stats(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """One-row hygiene summary of an embedding column:
    ``(n_vectors, n_null, n_zero, n_nonfinite, dim_min, dim_max,
    norm_p01, norm_p50, norm_p99, norm_min, norm_max)``.

    Norms use the sequential float64 fold (``functions.vectors.norm``
    — bit-identical to DuckDB's ``list_sum`` of the transformed
    list, the proven cosine-oracle recipe); percentiles interpolate
    over the identical double set on both engines; outputs snap to
    the floor grid.

    Scale: one scan, one 1-row aggregate; the per-row fold is the
    interpreted-HOF tier, fine for an audit query — wire the numpy
    batch tier if this ever lands in a per-batch hot path.
    """
    v = F.col(vec_col)
    inf = F.lit(float("inf"))
    nonfinite = F.exists(
        v,
        lambda x: F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == inf),
    )
    rows = embeddings.select(
        v.isNull().cast("bigint").alias("_is_null"),
        F.when(v.isNotNull(), F.size(v)).alias("_dim"),
        # non-finite vectors are COUNTED but excluded from the norm
        # distribution: one Inf/NaN component would otherwise poison
        # norm_max / the percentiles (and floor() on an infinite norm
        # diverges between engines under ANSI mode)
        F.when(v.isNotNull() & ~nonfinite, norm(v)).alias("_norm"),
        F.when(v.isNotNull(), nonfinite.cast("bigint")).alias("_has_nan"),
    )
    pct = F.percentile(
        "_norm", F.array(F.lit(0.01), F.lit(0.5), F.lit(0.99))
    )
    agg = rows.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("_is_null").alias("n_null"),
        F.sum((F.col("_norm") == 0.0).cast("bigint")).alias("n_zero"),
        F.sum("_has_nan").alias("n_nonfinite"),
        F.min("_dim").alias("dim_min"),
        F.max("_dim").alias("dim_max"),
        pct.alias("_p"),
        F.min("_norm").alias("_nmin"),
        F.max("_norm").alias("_nmax"),
    )
    return agg.select(
        F.col("n_vectors").cast("bigint").alias("n_vectors"),
        F.coalesce("n_null", F.lit(0)).cast("bigint").alias("n_null"),
        F.coalesce("n_zero", F.lit(0)).cast("bigint").alias("n_zero"),
        F.coalesce("n_nonfinite", F.lit(0)).cast("bigint").alias("n_nonfinite"),
        F.col("dim_min").cast("bigint").alias("dim_min"),
        F.col("dim_max").cast("bigint").alias("dim_max"),
        _r4(F.col("_p")[0]).alias("norm_p01"),
        _r4(F.col("_p")[1]).alias("norm_p50"),
        _r4(F.col("_p")[2]).alias("norm_p99"),
        _r4(F.col("_nmin")).alias("norm_min"),
        _r4(F.col("_nmax")).alias("norm_max"),
    )
