"""Connected components over near-dup pairs → cluster assignment.

Completes the dedup story: pair generation (exact / minhash / simhash
/ embedding LSH) emits edges; this operator resolves them into
clusters so a pipeline can keep one canonical document per cluster.
(The reference stops at pair classification — ``ApplyDupClassifier``
emits scored pairs, README.md:239-261 — so cluster resolution is part
of the §2.10 capability surface, not a port.)

Algorithm: iterative min-label propagation. ``comp(v)`` starts at
``v`` and each round takes the min over the neighborhood; labels are
monotonically non-increasing, so convergence is detected by the sum
of labels going stationary — one cheap aggregate per round instead of
a change-count join. Rounds needed = graph diameter; near-dup
clusters are shallow (pairs of a cluster all share shingles, diameter
is typically ≤ 3). Each round is one shuffle join + groupBy-min, with
``localCheckpoint`` cutting the lineage so plans don't grow across
iterations — the standard Spark iterative-graph pattern. For
adversarially deep graphs (long chains) the large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce") halves
diameter per round; near-dup graphs don't need it, and ``max_iter``
guards the pathological case loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.cache import tracked_persist


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "id",
    src_col: str = "id1",
    dst_col: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp): every vertex labeled with the min id reachable from
    it via ``edges``. Vertices absent from every edge keep their own
    id (singleton clusters)."""
    sym = tracked_persist(
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b")).unionAll(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
    )
    labels = vertices.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("comp")
    ).localCheckpoint()
    # labels only decrease -> the label sum is a convergence witness
    prev_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.a == labels.v)
            .groupBy("b")
            .agg(F.min("comp").alias("nc"))
        )
        labels = (
            labels.join(nbr_min, labels.v == nbr_min.b, "left")
            .select(
                "v",
                F.least(F.col("comp"), F.coalesce("nc", F.col("comp"))).alias("comp"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds the bound; use large-star/small-star)"
        )
    return labels.select(F.col("v").alias(id_col), "comp")


def neardup_clusters(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, comp, is_canonical): cluster assignment from exact
    shingle-Jaccard pairs (or caller-supplied ``pairs``), every doc
    covered, the min-id member canonical. Swap ``pairs`` for
    ``minhash_lsh_pairs`` output at scale — the component resolution
    is identical."""
    from sparklyclean_spark.operators.dedup.textdedup import shingle_jaccard_pairs

    if pairs is None:
        pairs = shingle_jaccard_pairs(docs, threshold, id_col=id_col, text_col=text_col)
    comp = connected_components(pairs, docs.select(id_col), id_col=id_col)
    return comp.select(
        id_col,
        "comp",
        (F.col(id_col) == F.col("comp")).alias("is_canonical"),
    )
