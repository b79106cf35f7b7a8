"""ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better" §4.1), Spark-first.

The paper removes every substring of >= 50 BPE tokens that appears
more than once in the corpus (across documents OR repeated inside
one), built there on a monolithic suffix array. The suffix array
does not distribute; this module re-expresses the IDENTICAL span
semantics with an L-gram identity that needs only hash aggregation:

    a token position lies inside some duplicated substring of
    length >= L  <=>  it is covered by a duplicated L-gram.

(Any shared span of length M >= L is a union of its M - L + 1
consecutive L-grams, each duplicated; conversely a duplicated L-gram
IS a duplicated span of length L.) So ExactSubstr = explode every
L-gram -> global occurrence count -> keep grams with count >= 2 ->
merge the surviving [pos, pos+L-1] intervals per document into
maximal spans. Unlike the fixed-grid ``chunk_dedup`` next door, a
shared span is found at ANY alignment — the case the chunk grid by
construction misses (pinned in tests/test_r12_ops.py).

The reference engine has no intra-document dedup at all (its unit is
the whole record, GenerateLabeledPoints.scala:47-111); this is the
§2.10 capability-gap dedup modality VERDICT r11 item 5 names.

Scale shape — document text NEVER rides a shuffle:

1. one projection renders each doc's token array ONCE (the KN-bigram
   lesson: never tokenize inside a higher-order-function lambda),
   then explodes to ``(doc_id, pos, xxhash64(L-gram))`` — 8-byte
   fingerprints on the wire, not L-token strings (``hash_grams=False``
   keeps the strings for collision-free runs; a 64-bit collision can
   only over-mark one gram as duplicated, odds ~(#grams²)/2⁶⁵ — the
   ``chunk_dedup`` argument);
2. duplicate detection is ONE map-side-combinable hash agg (a gram
   repeated a billion times contributes one partial count per input
   partition), and the survivors join back on the fingerprint — an
   AQE-splittable shuffle join, never a broadcast of the gram table;
3. span merge is a per-document window (gaps-and-islands over sorted
   positions) — bounded by single-document length, never corpus size;
4. only ``exactsubstr_scrub`` ever moves text: one equi-join of the
   spans (small) back to the docs table.

vs the suffix array: this finds every duplicated span of length >= L
exactly, but reports maximal COVERED runs rather than the maximal
repeated substring itself — exactly what the removal step consumes.
Work is O(total_tokens · L) compute for the gram render (L-token
concat per position; a rolling hash would make it O(1)/position at
the cost of leaving whole-stage codegen) and O(total_tokens) shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparklyclean_spark.functions import text as T


def _gram_structs(ws: Column, min_len: int) -> Column:
    """array<struct<pos int, gram string>> of every ``min_len``-token
    gram (1-based start positions); [] for docs shorter than L."""
    gen = F.transform(
        F.sequence(F.lit(1), F.size(ws) - min_len + 1),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.concat_ws(" ", F.slice(ws, i, F.lit(min_len))).alias("gram"),
        ),
    )
    return F.when(
        F.size(ws) < min_len,
        F.array().cast("array<struct<pos:int,gram:string>>"),
    ).otherwise(gen)


def _ws_df(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """ONE tokenized projection (_id, _ws) every downstream subtree
    derives from — the KN-bigram lesson (tokenize once, never inside
    a lambda), applied at the DataFrame level too (r12 review
    finding: scrub/stats previously re-tokenized the corpus per
    subtree)."""
    return docs.select(
        F.col(id_col).alias("_id"), T.words(text_col).alias("_ws")
    )


def _gram_keys(ws: DataFrame, min_len: int, hash_grams: bool) -> DataFrame:
    """(_id, pos, k): every L-gram occurrence keyed by xxhash64 (the
    8-byte shuffle key of the scale path) or the gram string (the
    collision-free / oracle-identity form).

    Scale-path render (r12 optimization, guide §2.3 "shuffle fewer
    bytes" applied to the compute too): hash every TOKEN once, then
    key each gram as ``xxhash64`` of the L-long token-hash slice —
    fixed-width long arithmetic instead of building an L-token string
    per position (the string render concatenates ~L·token_len chars
    per position before hashing; measured 1.6-2x slower at L=20 and
    growing with token length). Same 64-bit collision class as the
    string-hash key (a collision can only over-mark one gram as
    duplicated), and the string-identity oracle recomputes spans from
    the grams themselves, so outputs are unchanged. The
    ``hash_grams=False`` branch keeps the literal gram strings — the
    collision-free form shared with the DuckDB oracle's identity."""
    if not hash_grams:
        return ws.select(
            "_id", F.explode(_gram_structs(F.col("_ws"), min_len)).alias("s")
        ).select(
            "_id",
            F.col("s.pos").alias("pos"),
            F.col("s.gram").alias("k"),
        )
    th = ws.select(
        "_id", F.expr("transform(_ws, w -> xxhash64(w))").alias("_th")
    )
    gen = F.expr(
        f"transform(sequence(1, size(_th) - {min_len} + 1),"
        f" i -> struct(cast(i as int) as pos,"
        f" xxhash64(slice(_th, i, {min_len})) as k))"
    )
    guarded = F.when(
        F.size("_th") < min_len,
        F.expr("array()").cast("array<struct<pos:int,k:bigint>>"),
    ).otherwise(gen)
    return th.select("_id", F.explode(guarded).alias("s")).select(
        "_id", F.col("s.pos").alias("pos"), F.col("s.k").alias("k")
    )


def _spans_from_hits(
    hits: DataFrame, min_len: int, id_col: str
) -> DataFrame:
    """Gaps-and-islands merge of duplicated-gram positions into
    maximal covered runs — the ONE span-merge tail shared by the
    in-corpus and cross-table operators (r12 review finding: a copy
    had started to drift)."""
    w = Window.partitionBy("_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    # coverage gap: intervals are [pos, pos+L-1]; a new maximal run
    # starts when this gram's start exceeds the previous covered end
    # + 1, i.e. pos - prev > L
    flag = F.when(
        prev.isNull() | (F.col("pos") - prev > min_len), F.lit(1)
    ).otherwise(F.lit(0))
    isl = hits.withColumn(
        "_isl",
        F.sum(flag).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        isl.groupBy("_id", "_isl")
        .agg(F.min("pos").alias("_s"), F.max("pos").alias("_e"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_s").cast("int").alias("span_start"),
            (F.col("_e") + min_len - 1).cast("int").alias("span_end"),
            (F.col("_e") - F.col("_s") + min_len).cast("int").alias("n_tokens"),
        )
    )


def _dup_positions(ws: DataFrame, min_len: int, hash_grams: bool) -> DataFrame:
    """(_id, pos) of every L-gram whose token sequence occurs >= 2
    times corpus-wide (across docs or within one). The gram subtree
    feeds both the count agg and the join-back probe — the same
    deliberate 2x-linear scan trade as unigram_cross_entropy (build
    the dup set, probe it), with the render kept cheap by the 8-byte
    key."""
    from sparklyclean_spark.cache import tracked_persist

    # The gram relation feeds BOTH the count agg and the probe side of
    # the join-back; un-persisted, Spark re-renders every gram for the
    # second branch (the r12 before-plan shows the explode subtree
    # twice). The persisted relation is (long, int, long) rows — far
    # narrower than re-doing the O(tokens·L) render — and the bench
    # releases it between runs, so nothing outlives the query.
    g = tracked_persist(_gram_keys(ws, min_len, hash_grams))
    dup = (
        g.groupBy("k")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= 2)
        .select("k")
    )
    return g.join(dup, "k").select("_id", "pos")


def exactsubstr_spans(
    docs: DataFrame,
    min_len: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """Maximal per-document runs of tokens covered by some duplicated
    substring of >= ``min_len`` tokens (the paper's default 50):
    ``(doc_id, span_start, span_end, n_tokens)``, positions 1-based
    inclusive. Docs with no duplicated span emit no row."""
    ws = _ws_df(docs, id_col, text_col)
    return _spans_from_hits(
        _dup_positions(ws, min_len, hash_grams), min_len, id_col
    )


def _scrub_from_ws(
    ws: DataFrame, spans: DataFrame, id_col: str
) -> DataFrame:
    """Shared removal tail: drop covered token positions, re-join the
    kept tokens in order, emit a row for EVERY doc.

    r12 optimization (guide §2.3/§2.4): the r12-build form exploded
    EVERY token to a row (posexplode), anti-joined the exploded
    covered positions, then re-assembled docs with
    collect_list + array_sort — i.e. the full corpus token stream rode
    a shuffle twice so that a per-document projection could be
    re-derived. Spans are the SMALL side (maximal merged runs, few per
    doc): aggregate them to one array per doc, join that onto the
    tokenized docs (one equi-join of a small relation), and drop
    covered tokens with an index-aware ``filter`` HOF — a pure
    projection, no token ever shuffles. Kept-token order is the array
    order, identical to the sorted re-assembly; outputs are
    hash-identical (oracle re-verified)."""
    spans_arr = spans.groupBy(F.col(id_col).alias("_id")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    kept = F.filter(
        F.col("_ws"),
        lambda tok, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
        ),
    )
    return (
        ws.join(spans_arr, "_id", "left")
        .withColumn(
            "_kept",
            F.when(F.col("_spans").isNull(), F.col("_ws")).otherwise(kept),
        )
        .select(
            F.col("_id").alias(id_col),
            F.size("_ws").cast("bigint").alias("n_tokens"),
            (F.size("_ws") - F.size("_kept")).cast("bigint").alias("n_removed"),
            F.concat_ws(" ", F.col("_kept")).alias("clean_text"),
        )
    )


def exactsubstr_scrub(
    docs: DataFrame,
    min_len: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """The paper's removal step: drop every token covered by a
    duplicated >= ``min_len``-token substring, keeping ZERO copies
    (Lee et al. §4.1 remove-all; the chunk/C4 operators next door are
    the keep-one-winner family). Output ``(doc_id, n_tokens,
    n_removed, clean_text)`` for EVERY doc — clean_text is the kept
    tokens of the engine's token domain re-joined with single spaces
    (the corpus-normal form every text operator here scores), ''
    when everything was duplicated or the doc had no tokens."""
    ws = _ws_df(docs, id_col, text_col)
    spans = _spans_from_hits(
        _dup_positions(ws, min_len, hash_grams), min_len, id_col
    )
    return _scrub_from_ws(ws, spans, id_col)


def exactsubstr_stats(
    docs: DataFrame,
    min_len: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """One-row corpus report of the duplicated-substring burden (the
    number the paper leads with — what fraction of the corpus is
    >= min_len-token duplicated text): ``(n_docs, docs_with_spans,
    total_tokens, dup_tokens, dup_token_share)``; share floor-snapped
    to 4 decimals (the engine-portable ratio contract)."""
    ws = _ws_df(docs, id_col, text_col)
    spans = _spans_from_hits(
        _dup_positions(ws, min_len, hash_grams), min_len, id_col
    )
    per_doc = spans.groupBy(id_col).agg(F.sum("n_tokens").alias("_dup"))
    base = ws.select(
        F.col("_id").alias(id_col),
        F.size("_ws").cast("bigint").alias("_n"),
    )
    j = base.join(per_doc, id_col, "left")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("_dup").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("docs_with_spans"),
        F.sum("_n").cast("bigint").alias("total_tokens"),
        F.sum(F.coalesce(F.col("_dup"), F.lit(0))).cast("bigint").alias("dup_tokens"),
    ).select(
        "n_docs",
        "docs_with_spans",
        "total_tokens",
        "dup_tokens",
        (
            F.floor(
                F.col("dup_tokens") * 10000.0 / F.col("total_tokens") + 0.5
            )
            / 10000.0
        ).alias("dup_token_share"),
    )


def exactsubstr_decontam(
    train: DataFrame,
    benchmark: DataFrame,
    min_len: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """Span-level train/eval decontamination (Lee et al. 2022 apply
    exact-substring matching to benchmark leakage; the fuzzier
    ``decontam.ngram_overlap`` next door scores distinct-3-gram
    FRACTIONS — this pins the exact leaked spans): maximal runs of
    train-document tokens covered by some >= ``min_len``-token
    substring that ALSO occurs in the benchmark, at any alignment.
    Output is `exactsubstr_spans`' contract over the TRAIN side.

    Scale shape: the benchmark is small relative to a 100 TB corpus
    (eval sets are thousands of docs), so its distinct gram-key set
    builds in one pass and BROADCASTS into the train-side scan — the
    only corpus-wide shuffle left is the per-doc span-merge window.
    Same 8-byte xxhash64 keys / string-identity-oracle split as the
    in-corpus operator; the gram projection and span-merge tail are
    the SAME helpers the in-corpus family uses, so the two cannot
    drift.
    """
    tg = _gram_keys(_ws_df(train, id_col, text_col), min_len, hash_grams)
    bg = (
        _gram_keys(_ws_df(benchmark, id_col, text_col), min_len, hash_grams)
        .select("k")
        .distinct()
    )
    hits = tg.join(F.broadcast(bg), "k").select("_id", "pos")
    return _spans_from_hits(hits, min_len, id_col)
