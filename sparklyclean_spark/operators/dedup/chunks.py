"""Span-level exact dedup (C4 / RefinedWeb style), Spark-first.

C4 removes every repeated three-sentence span from the corpus,
keeping one occurrence globally; RefinedWeb does the same at
line/paragraph granularity. The driver's synthetic documents are
whitespace-token text with no sentence or line structure, so the span
unit here is a fixed-width token chunk (default 10 tokens) — the
algorithmic shape (explode spans -> global first-occurrence winner ->
reassemble survivors in order) is identical and is what matters at
scale.

The reference engine has no intra-document dedup at all (its unit of
dedup is the whole record, GenerateLabeledPoints.scala:47-111); this
is a §2.10 capability-gap operator.

Scale shape: two hash aggregations and one equi-join, all on the
chunk fingerprint / doc id — linear in corpus token count, no
quadratic pair work anywhere. The winner rule (keep the occurrence
with the smallest ``(doc_id, chunk_idx)``) is a ``min(struct)``
aggregate, so it gets map-side partial combine; a window
``row_number() = 1`` over chunk text would shuffle-sort every
occurrence of a hot chunk into one task instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.functions import text as T


def chunk_dedup(
    docs: DataFrame,
    chunk_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove globally-duplicated token chunks, keeping the first
    occurrence (smallest ``(doc_id, chunk_idx)``).

    Returns one row per input document:
    ``(doc_id, n_chunks, n_dropped, clean_text)`` where ``clean_text``
    re-joins the surviving chunks in their original order.
    """
    n = chunk_tokens
    w = T.words(text_col)
    # chunk i (0-based) = tokens [i*n+1 .. i*n+n], last chunk ragged
    chunks = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(w) / n).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * n + 1, n)),
    )
    exploded = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.when(F.size(w) == 0, F.array().cast("array<string>")).otherwise(chunks)).alias(
            "chunk_idx", "chunk"
        ),
    )
    # global first occurrence per chunk content: min(struct) aggregate
    # (map-side combinable; a hot chunk never concentrates in one task)
    winners = exploded.groupBy("chunk").agg(
        F.min(F.struct("id", "chunk_idx")).alias("keep")
    )
    kept = (
        exploded.join(winners, "chunk")
        .where((F.col("id") == F.col("keep.id")) & (F.col("chunk_idx") == F.col("keep.chunk_idx")))
        .select("id", "chunk_idx", "chunk")
    )
    survived = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("clean_text"),
    )
    totals = docs.select(
        F.col(id_col).alias("id"),
        F.when(F.size(w) == 0, F.lit(0))
        .otherwise(F.ceil(F.size(w) / n).cast("int"))
        .cast("int")
        .alias("n_chunks"),
    )
    return (
        totals.join(survived, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_chunks",
            (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_dropped"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
