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

    from sparklyclean_spark.operators.similarity.knn import cell_assign_udf

    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    rows = _hash_ordered_sample(c, "id", sample_cap)
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    cents = _spherical_kmeans(x, n_cells, iters, seed)

    # assignment feeds both join sides AND the disposition join back —
    # persist so the matmul pass runs once (the _sig_table precedent).
    # knn.cell_assign_udf(cents, 1) IS the quantizer assignment — one
    # implementation shared with ivf_topk and the PQ funnel, so a
    # future assignment-semantics change cannot desynchronize the
    # three (r10 review finding)
    assigned = tracked_persist(
        # single_eval stays False: this output is PERSISTED, and a
        # nondeterministic mark would defeat the cache lookup (see
        # cell_assign_udf)
        c.withColumn("cell", cell_assign_udf(cents, 1)(F.col("v")))
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
    return _dispositions_from_pairs(assigned, pairs, id_col)


def _dispositions_from_pairs(
    assigned: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Shared disposition tail (semdedup_dispositions AND the PQ
    funnel — identical contract from identical pair sets): undirected
    neighbor counts, keep-lowest-id dup flag, left join back onto the
    full assignment so singletons keep (0, false) rows."""
    # r12 (guide §5 caching): both union branches consume ``pairs``,
    # and without a persist each branch re-runs the ENTIRE upstream
    # pair pipeline — the within-cell join plus the Arrow cosine (or
    # ADC prefilter + cosine) pass appeared twice in the physical plan
    # (two ArrowEvalPython subtrees in the r12 before-plan). The
    # verified pair set is the bounded near-dup output, far smaller
    # than the work that produces it — persist it so the quadratic
    # verify runs once.
    pairs = tracked_persist(pairs)
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


def semdedup_dispositions_pq(
    corpus: DataFrame,
    threshold: float = 0.92,
    n_cells: int = 32,
    m: int = 4,
    ks: int = 16,
    sample_cap: int = 4096,
    iters: int = 10,
    seed: int = 647,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stage: str = "dispositions",
) -> DataFrame:
    """PQ-prefiltered SemDeDup funnel (VERDICT r9 item 4, the
    LSH-funnel pattern applied to the within-cell verification):
    IDENTICAL output contract to ``semdedup_dispositions`` — same
    ``(vec_id, cell, n_dup_neighbors, is_dup)``, same keep-lowest-id
    rule — but the within-cell quadratic join runs over PQ CODES
    (4-int rows) instead of raw vectors, and only surviving candidate
    pairs fetch their raw vectors for the exact cosine verify.

    The prefilter is EXACT-SAFE, not heuristic: a pair survives when
    its symmetric code distance satisfies the triangle-inequality
    bound  sqrt(SDC(x,y)) <= sqrt(2 - 2·threshold) + e_x + e_y + s
    with ``e`` each vector's own quantization error ||x̂ - q(x̂)||
    (the encoder's snapped per-subspace minima) and ``s`` a slack
    strictly larger than the worst-case deficit the 1e-9 snap can put
    into the two e's. Each per-subspace mdist is round(d, 9), so a
    vector's summed squared error can run m·5e-10 under truth and
    sqrt's concavity bounds the per-vector qerr deficit by
    sqrt(m·5e-10); the pair deficit is 2·sqrt(m·5e-10), and
    ``s = 2·sqrt(m·5e-10) + 1e-5`` covers it for EVERY m (the r10
    literal 1e-4 held only for m ≤ 5 — r11 advisor fix). Any true
    duplicate (cos >= threshold, i.e. ||x̂ - ŷ|| <= sqrt(2-2t))
    necessarily passes, because ||q(x̂)-q(ŷ)|| <= ||x̂-ŷ|| + e_x +
    e_y — so the funnel provably returns semdedup_dispositions' exact
    pair set and the pytest parity gate pins it. (Zero-norm vectors normalize to 0
    and can only be PRUNED, which is correct for any threshold > 0 —
    their cosine is defined as 0.)

    Pruning power is proportional to codebook tightness: on this
    repo's near-uniform synthetic embeddings the per-vector error is
    large (MSE ≈ 0.7) so the bound is loose, while on the clustered
    corpora SemDeDup targets (paraphrases, re-crawls — arXiv:2303.09540
    §3 reports most mass near centroids) e shrinks and the bound
    removes the bulk of cell-mate pairs before any raw vector moves.

    Scale: the shuffled within-cell relation carries (cell, id, m
    codes, e) — ~4 ints + 1 double per row vs 64 floats; the SDC
    lookup is one broadcast (m × ks × ks) numpy table inside an Arrow
    UDF; raw vectors travel only in the two final equi-joins on the
    candidate stream.

    ``stage`` taps the funnel for instrumentation (the lsh_cosine_pairs
    precedent): "cellmates" returns the raw within-cell (id1, id2)
    pair stream, "prefiltered" the SDC-bound survivors, "dispositions"
    (default) the full output — the candidates/survivors ratio is the
    funnel's measured pruning power on a given corpus.
    """
    if stage not in ("cellmates", "prefiltered", "dispositions"):
        raise ValueError(f"unknown stage {stage!r}")
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from sparklyclean_spark.operators.similarity.knn import cell_assign_udf
    from sparklyclean_spark.operators.similarity.pq import (
        _encode_udf,
        codebooks_from_vectors,
    )

    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    rows = _hash_ordered_sample(c, "id", sample_cap)
    svecs = [r["v"] for r in rows]
    cents = _spherical_kmeans(
        np.array(svecs, dtype=np.float64), n_cells, iters, seed
    )
    pq_cents = codebooks_from_vectors(svecs, m, ks, iters, seed)

    # the shared quantizer assignment (knn.cell_assign_udf) — NOT an
    # inline copy, so the funnel's cells can never diverge from the
    # baseline whose oracle it shares (r10 review finding)
    enc = tracked_persist(
        # single_eval stays False: this output is PERSISTED, and a
        # nondeterministic mark would defeat the cache lookup (see
        # cell_assign_udf)
        c.withColumn("cell", cell_assign_udf(cents, 1)(F.col("v")))
        .withColumn("_e", _encode_udf(pq_cents, single_eval=False)(F.col("v")))
        .select(
            "id",
            "v",
            "cell",
            F.col("_e.codes").alias("codes"),
            F.sqrt(F.aggregate("_e.mdist", F.lit(0.0), lambda a, x: a + x)).alias(
                "qerr"
            ),
        )
    )
    enc.count()

    # broadcast (m x ks x ks) inter-codeword squared-distance table
    sdc_tab = np.stack(
        [
            ((pq_cents[j][:, None, :] - pq_cents[j][None, :, :]) ** 2).sum(-1)
            for j in range(pq_cents.shape[0])
        ]
    )

    def sdc_impl(ca, cb):
        a = np.asarray(ca.tolist(), dtype=np.int64)
        b = np.asarray(cb.tolist(), dtype=np.int64)
        s = np.zeros(len(a), dtype=np.float64)
        for j in range(sdc_tab.shape[0]):
            s += sdc_tab[j][a[:, j], b[:, j]]
        return pd.Series(s)

    sdc = pandas_udf(sdc_impl, "double")
    lim = float(np.sqrt(max(2.0 - 2.0 * threshold, 0.0)))
    # slack derived from m (see docstring): the worst-case pair snap
    # deficit 2*sqrt(m*5e-10) plus margin — a literal was only safe
    # for the default m (r11 advisor fix)
    slack = 2.0 * float(np.sqrt(m * 5e-10)) + 1e-5
    slim_a = enc.select(
        "cell",
        F.col("id").alias("id1"),
        F.col("codes").alias("c1"),
        F.col("qerr").alias("e1"),
    )
    slim_b = enc.select(
        "cell",
        F.col("id").alias("id2"),
        F.col("codes").alias("c2"),
        F.col("qerr").alias("e2"),
    )
    raw_pairs = (
        slim_a.join(slim_b, "cell").where(F.col("id1") < F.col("id2"))
    )
    if stage == "cellmates":
        return raw_pairs.select("id1", "id2")
    cand = (
        raw_pairs
        .where(
            # slack COVERS the encoder's snap deficit for any m (see
            # docstring derivation). Extra admitted candidates only
            # pay the exact verify — never a wrong answer.
            F.sqrt(sdc(F.col("c1"), F.col("c2")))
            <= F.lit(lim) + F.col("e1") + F.col("e2") + F.lit(slack)
        )
        .select("id1", "id2")
    )
    if stage == "prefiltered":
        return cand
    va = enc.select(F.col("id").alias("id1"), F.col("v").alias("v1"))
    vb = enc.select(F.col("id").alias("id2"), F.col("v").alias("v2"))
    pairs = (
        cand.join(va, "id1")
        .join(vb, "id2")
        .where(cosine_pandas(F.col("v1"), F.col("v2")) >= F.lit(threshold))
        .select("id1", "id2")
    )
    assigned = enc.select("id", "cell", "v")
    return _dispositions_from_pairs(assigned, pairs, id_col)
