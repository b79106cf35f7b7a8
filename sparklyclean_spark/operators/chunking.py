"""Sliding-window document chunking (RAG / embedding-prep shape).

Every retrieval or embedding pipeline over a large corpus needs the
same explode: split each document into fixed-size windows with a
fixed overlap, keeping (doc_id, chunk_idx) addressing so chunks can
be traced back and reassembled. The layout is a fixed grid over the
character axis — chunk ``i`` covers ``[i*step, i*step + chunk_chars)``
with ``step = chunk_chars - overlap_chars`` — so membership is a pure
function of the text length: stable under repartitioning, appends,
and reruns (no RNG, no physical-partition dependence).

Scale shape: one ``posexplode(sequence(...))`` — narrow, map-side,
no shuffle at all; the output is immediately partition-parallel for
the downstream embed/index stage. Chunk count per row is
``ceil((len - overlap) / step)`` (min 1), so output size is linear in
corpus size with factor ``~1/(1 - overlap/chunk)``.

No reference counterpart; §2.10 capability-gap operator (the
reference has no text-windowing surface at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_chunks(
    df: DataFrame,
    chunk_chars: int = 400,
    overlap_chars: int = 80,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into overlapping windows.

    Returns (id_col, chunk_idx, chunk_text, n_chunk_chars); every
    input row yields at least one chunk (empty text -> one empty
    chunk), chunk_idx is dense from 0.
    """
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be < chunk_chars")
    step = chunk_chars - overlap_chars
    text = F.col(text_col)
    n_chunks = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil((F.length(text) - F.lit(overlap_chars)) / F.lit(step)),
    )
    exploded = df.select(
        F.col(id_col),
        text,
        # plain explode: for a 0-based sequence posexplode's position
        # equals the value — the extra column was dead weight
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("_i"),
    )
    chunk = text.substr(
        (F.col("_i") * step + 1).cast("int"), F.lit(chunk_chars)
    )
    return exploded.select(
        id_col,
        F.col("_i").cast("int").alias("chunk_idx"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("bigint").alias("n_chunk_chars"),
    )
