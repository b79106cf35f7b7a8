"""Approximate & exact nearest-neighbor search over embeddings.

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus; one scan, no quadratic blow-up in the
  corpus. The 100 TB pattern: queries are broadcast, corpus partitions
  stream, per-partition top-k then global top-k (Spark's window/limit
  handles the combine).
* ``lsh_bucketed_topk`` — random-hyperplane LSH (sign sketch):
  deterministic pseudo-random hyperplanes derived from xxhash64 of
  (dimension, plane) — no stored model, reproducible across runs.
  Candidates = same-bucket in any band, then exact cosine re-rank.
  Linear candidate generation; recall tunable via planes/bands.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparklyclean_spark.functions.vectors import cosine_pandas


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Returns (query_id, neighbor_id, cos, rank). Tie-break by
    neighbor_id for a total order. Queries are broadcast — corpus is
    scanned once regardless of |queries|.
    """
    qid = query_id_col or id_col
    qvec = query_vec_col or vec_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(qvec).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_raw", cosine_pandas(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 4).alias("cos"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _hyperplane_sign(vec, plane: int, dim: int) -> F.Column:
    """Sign of <v, h_plane> where h_plane[d] is a deterministic
    pseudo-random ±1/scaled value from xxhash64(plane, d). A ±1
    Rademacher hyperplane is a valid random-projection family."""
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, d: x.cast("double")
            * F.when(
                F.pmod(F.xxhash64(F.lit(plane), d), F.lit(2)) == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (proj >= 0).cast("int")


def signature_bits(vec, n_planes: int, dim: int) -> F.Column:
    """array<int> of hyperplane signs — the sign sketch."""
    return F.array(*[_hyperplane_sign(vec, p, dim) for p in range(n_planes)])


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: sign-sketch band buckets → candidate join → exact
    cosine re-rank. Recall < 1 by construction; pair with
    ``brute_force_topk`` on a sample to measure it."""
    rows = n_planes // bands
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c_sig = c.withColumn("bits", signature_bits(F.col("cv"), n_planes, dim))
    q_sig = q.withColumn("bits", signature_bits(F.col("qv"), n_planes, dim))

    def banded(df, idc, vecc):
        return df.select(
            idc,
            vecc,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.concat_ws(
                                "",
                                *[
                                    F.element_at("bits", b * rows + r + 1).cast("string")
                                    for r in range(rows)
                                ],
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(idc, vecc, "bb.band", "bb.bucket")

    cb = banded(c_sig, "neighbor_id", "cv")
    qb = banded(q_sig, "query_id", "qv")
    cands = (
        qb.join(cb, ["band", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos_raw", cosine_pandas(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 4).alias("cos"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
