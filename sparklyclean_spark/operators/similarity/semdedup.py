"""SemDeDup: semantic (embedding-space) deduplication over IVF cells.

Public algorithm: Abbas, Tirumala, Simig, Ganguli, Morcos —
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" (arXiv:2303.09540, 2023). Cluster the corpus
embeddings with k-means, compute pairwise cosine similarity WITHIN
each cluster only, and drop all but one member of every
above-threshold group — removing semantic duplicates (paraphrases,
re-crawls, templated spam) that exact/MinHash text dedup cannot see.
This extends the repo's dedup pillar (exact → MinHash/SimHash →
containment/winnowing) into embedding space, the one LLM-pipeline
dedup modality text methods miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparklyclean_spark.cache import tracked_persist
from sparklyclean_spark.functions.vectors import cosine_pandas
from sparklyclean_spark.operators.similarity.knn import (
    _hash_ordered_sample,
    _spherical_kmeans,
)


def semdedup_dispositions(
    corpus: DataFrame,
    threshold: float = 0.92,
    n_cells: int = 32,
    sample_cap: int = 4096,
    iters: int = 10,
    seed: int = 647,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector SemDeDup disposition table: ``(vec_id, cell,
    n_dup_neighbors, is_dup)`` — the full decision frame a downstream
    filter consumes (keep ``NOT is_dup``), not just the survivors.

    Keep rule (the operator's contract): within a cell, a vector is a
    DUPLICATE iff some cell-mate with a SMALLER id has cosine ≥
    ``threshold`` — each above-threshold group keeps its lowest id,
    the repo's exact_dedup convention. (The paper keeps the member
    least similar to the centroid and notes random choice performs
    identically — §4.3; a data-independent rule is preferred here
    because it is deterministic under re-partitioning and exactly
    mirrorable in SQL.) ``n_dup_neighbors`` counts ALL above-threshold
    cell-mates (either side), so group structure stays visible.

    Determinism: the quantizer is the SAME seeded spherical k-means
    over the SAME hash-ordered bounded sample that ivf_topk trains
    (membership a pure function of row data, never layout); argmax
    ties break to the lowest cell on both engines. The only
    cross-engine float caveat is the knn_ivf_recall class: numpy sums
    dot products SIMD/pairwise, DuckDB sequentially, so a cell argmax
    or τ-boundary decided by a ~1-ulp gap could differ — measure-zero
    on continuous embeddings (brute-force cosine rows have been
    hash-stable since r1).

    Scale: one bounded driver-side training sample, one Arrow matmul
    assignment pass, then an equi-join ON CELL — the quadratic
    verification is confined to within-cell candidate sets, ~N²/C
    pairs total instead of N² (the paper's entire point; raise
    ``n_cells`` ∝ corpus so cells stay bounded and the join stays
    AQE-splittable). No broadcast of anything O(N); the disposition
    join back is an equi-join on id reusing the cell shuffle's data.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    rows = _hash_ordered_sample(c, "id", sample_cap)
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    cents = _spherical_kmeans(x, n_cells, iters, seed)

    def impl(vs):
        m = np.asarray(vs.tolist(), dtype=np.float64)
        m = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype(np.int32))

    # assignment feeds both join sides AND the disposition join back —
    # persist so the matmul pass runs once (the _sig_table precedent)
    assigned = tracked_persist(
        c.withColumn("cell", pandas_udf(impl, "int")(F.col("v")))
    )
    assigned.count()
    a = assigned.select("cell", F.col("id").alias("id1"), F.col("v").alias("v1"))
    b = assigned.select("cell", F.col("id").alias("id2"), F.col("v").alias("v2"))
    pairs = (
        a.join(b, "cell")
        .where(F.col("id1") < F.col("id2"))
        .where(cosine_pandas(F.col("v1"), F.col("v2")) >= F.lit(threshold))
        .select("id1", "id2")
    )
    edges = pairs.select(
        F.col("id1").alias("id"), F.col("id2").alias("nb")
    ).unionAll(pairs.select(F.col("id2").alias("id"), F.col("id1").alias("nb")))
    stats = edges.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_neighbors"),
        F.max(F.col("nb") < F.col("id")).alias("_has_smaller"),
    )
    return assigned.join(stats, "id", "left").select(
        F.col("id").alias(id_col),
        F.col("cell").cast("int").alias("cell"),
        F.coalesce(F.col("n_dup_neighbors"), F.lit(0).cast("bigint")).alias(
            "n_dup_neighbors"
        ),
        F.coalesce(F.col("_has_smaller"), F.lit(False)).alias("is_dup"),
    )
