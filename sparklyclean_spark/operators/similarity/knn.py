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

from sparklyclean_spark.functions.vectors import _c, cosine_pandas


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


def _rademacher_planes(n_planes: int, dim: int):
    """Deterministic ±1 hyperplane matrix (dim × n_planes) derived
    from a splitmix64 stream — a valid random-projection family,
    reproducible across runs/workers with no stored model."""
    import numpy as np

    x = np.arange(1, n_planes * dim + 1, dtype=np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (2.0 * (x & np.uint64(1)).astype(np.float64) - 1.0).reshape(dim, n_planes)


def signature_bits(vec, n_planes: int, dim: int) -> F.Column:
    """array<int> of hyperplane signs — the sign sketch. One Arrow
    batch = one (rows × dim) @ (dim × n_planes) matmul; the per-plane
    higher-order-function formulation is interpreted per element and
    ~100× slower."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    planes = _rademacher_planes(n_planes, dim)

    def impl(vs):
        m = np.asarray(vs.tolist(), dtype=np.float64)
        bits = (m @ planes >= 0).astype(np.int32)
        return pd.Series(list(bits))

    return pandas_udf(impl, "array<int>")(_c(vec))


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
