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

Scale shape — document text NEVER rides a shuffle:

1. explode to ``(doc_id, chunk_idx, xxhash64(chunk))`` — the winner
   aggregation and everything downstream carry the 8-byte
   fingerprint, not the chunk string (same 64-bit-collision argument
   as the MinHash verification path: ~(#chunks²)/2⁶⁵ merge odds,
   negligible against corpus sizes; a collision can only drop one
   extra span, never corrupt survivors);
2. winner per fingerprint = ``min(struct(doc_id, chunk_idx))`` — a
   map-side-combinable aggregate (a hot chunk repeated a billion
   times contributes one candidate per input partition, not a
   single-task sort);
3. winners regroup to ``(doc_id, kept_idxs array)`` — output is one
   small row per surviving doc;
4. one equi-join back to the docs table; survivors are re-rendered
   IN PLACE by filtering the chunk expression on ``kept_idxs`` — the
   only time text moves is this join's shuffle of the docs table
   itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.functions import text as T


def _chunk_array(text_col: str, n: int) -> Column:
    """array<string> of fixed-width token chunks (last chunk ragged);
    [] for token-less docs."""
    w = T.words(text_col)
    gen = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(w) / n).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * n + 1, n)),
    )
    return F.when(F.size(w) == 0, F.array().cast("array<string>")).otherwise(gen)


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
    chunks = _chunk_array(text_col, chunk_tokens)
    # fingerprints only — no text on this path
    exploded = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.transform(chunks, lambda c: F.xxhash64(c))).alias(
            "chunk_idx", "h"
        ),
    )
    winners = exploded.groupBy("h").agg(
        F.min(F.struct("id", "chunk_idx")).alias("keep")
    )
    kept_sets = (
        winners.select(F.col("keep.id").alias("id"), F.col("keep.chunk_idx").alias("idx"))
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("idx")).alias("keep_idxs"))
    )
    with_chunks = docs.select(
        F.col(id_col).alias("id"), chunks.alias("_chunks")
    ).join(kept_sets, "id", "left")
    kept_chunks = F.filter(
        F.transform(
            F.col("keep_idxs"),
            lambda i: F.element_at("_chunks", i + 1),
        ),
        lambda c: c.isNotNull(),
    )
    return with_chunks.select(
        F.col("id").alias(id_col),
        F.size("_chunks").cast("int").alias("n_chunks"),
        (F.size("_chunks") - F.coalesce(F.size("keep_idxs"), F.lit(0)))
        .cast("int")
        .alias("n_dropped"),
        F.when(F.col("keep_idxs").isNull(), F.lit("")).otherwise(
            F.concat_ws(" ", kept_chunks)
        ).alias("clean_text"),
    )


def chunk_dedup_within_doc(
    docs: DataFrame,
    chunk_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Intra-document repeated-span removal (the RefinedWeb
    "remove repetition within a page" cleanup, on the same fixed
    token-chunk grid as the corpus-global ``chunk_dedup``): every
    chunk that already occurred EARLIER IN THE SAME DOCUMENT is
    dropped, first occurrence kept, order preserved.

    Scale shape — ZERO shuffles, the contrast to the global form:
    the dedup predicate ("is this chunk's first occurrence its own
    position?") only reads the document's own chunk array, so the
    whole operator is a projection: ``filter(chunks, (c, i) ->
    array_position(chunks, c) == i + 1)`` evaluated map-side.
    Per-doc cost is O(chunks²) array scans on in-memory arrays,
    bounded by document length — no exchange, no join, no agg;
    100 TB runs as a pure scan→write. (Plan-asserted: 0 exchanges.)

    Output: id, ``n_chunks``, ``n_kept``, ``text_deduped``.
    """
    chunks = _chunk_array(text_col, chunk_tokens)
    kept = F.filter(
        chunks, lambda c, i: F.array_position(chunks, c) == i + F.lit(1)
    )
    return docs.select(
        F.col(id_col),
        F.size(chunks).cast("int").alias("n_chunks"),
        F.size(kept).cast("int").alias("n_kept"),
        F.array_join(kept, " ").alias("text_deduped"),
    )
