"""End-to-end corpus curation: the composed pipeline a training-data
user actually runs, as ONE declarative DataFrame plan.

normalize → quality gate (token count) → exact dedup (fingerprint
group, min-id keeper) → near-dup clusters (connected components over
shingle-Jaccard pairs) → per-document disposition. Every stage is an
operator this engine exposes individually; the composition shows they
fuse into a single Catalyst plan (plus the iterative component jobs)
rather than a chain of materialized intermediates.

Scale notes: the normalize/gate/fingerprint stages are one scan with
map-side work only; exact dedup is one hash shuffle on the 128-bit
fingerprint; the near-dup stage runs on the EXACT pair path here (it
is the oracle-checkable form) — at 100 TB swap ``pairs`` for
``minhash_lsh_pairs`` output, which is the documented scale route and
produces the identical downstream plan.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.operators.dedup.clusters import connected_components
from sparklyclean_spark.operators.dedup.textdedup import (
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
)
from sparklyclean_spark.operators.text_analysis import normalize_text


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 30,
    threshold: float = 0.3,
    pairs_fn: "Callable[[DataFrame], DataFrame] | None" = None,
    cc_stats: dict | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, status, comp) for EVERY input document.

    status ladder (first match wins):
      too_short  — fewer than ``min_tokens`` clean tokens
      exact_dup  — same normalized fingerprint as a lower-id survivor
      near_dup   — in a shingle-Jaccard component with a lower-id doc
      kept       — the canonical survivor
    ``comp`` is the near-dup component id (NULL for docs dropped
    before that stage). ``pairs_fn`` swaps the pair generator run on
    the exact-dedup survivors; the default is the EXACT quadratic
    shingle-Jaccard path (oracle-checkable; verification scale only —
    use ``curate_corpus_lsh`` for real corpora).
    """
    from sparklyclean_spark.cache import tracked_persist

    # persisted: the normalize chain (regexp cascade + md5) feeds the
    # keep aggregate, the fp_keep probe side, the survivor semi-join,
    # AND the final select — unpersisted, Spark re-executed the full
    # corpus scan once per branch plus again for the eager CC phase
    # (r9 review finding; the _sig_table multi-branch precedent)
    norm = tracked_persist(normalize_text(docs))
    gated = norm.where(F.col("n_tokens") >= min_tokens)
    fp = gated.select("doc_id", F.md5("clean_text").alias("fp"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    fp_keep = fp.join(keep, "fp").select("doc_id", "keep_id")
    exact_survivors = fp_keep.where(F.col("doc_id") == F.col("keep_id")).select(
        "doc_id"
    )
    surv_docs = docs.join(exact_survivors, "doc_id", "left_semi")
    if pairs_fn is None:
        pairs = shingle_jaccard_pairs(surv_docs, threshold)
    else:
        pairs = pairs_fn(surv_docs)
    comp = connected_components(
        pairs, surv_docs.select("doc_id"), id_col="doc_id", stats=cc_stats
    )
    return (
        norm.select("doc_id", "n_tokens")
        .join(fp_keep, "doc_id", "left")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.when(F.col("keep_id").isNull(), "too_short")
            .when(F.col("doc_id") != F.col("keep_id"), "exact_dup")
            .when(F.col("doc_id") != F.col("comp"), "near_dup")
            .otherwise("kept")
            .alias("status"),
            "comp",
        )
    )


def curate_corpus_lsh(
    docs: DataFrame,
    min_tokens: int = 30,
    threshold: float = 0.3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """The SCALE form of ``curate_corpus``: near-dup pairs come from
    the banded MinHash-LSH path instead of the quadratic exact join.
    Every LSH pair is exact-Jaccard verified (precision 1.0), so the
    emitted edge set is a SUBSET of the exact pipeline's — any doc
    this marks ``near_dup`` the exact pipeline marks non-kept too
    (pytest-gated); recall ≥0.8 at the band/threshold defaults. This
    is the variant to run on a real corpus — and the one bench.py
    times. Driver check is rows-only by design: the LSH edge set is
    recall-dependent, so no SQL oracle reproduces it; the exact-form
    ``corpus_curation`` row carries the hash check for the shared
    pipeline logic.

    The output carries a constant ``n_rounds`` column: the
    label-propagation round count, so a bench-time move can be split
    into "the graph got deeper" (rounds grew) vs "a stage got slower"
    without re-profiling (VERDICT r5 item 4). The oracled exact form
    deliberately does NOT carry it (not SQL-derivable)."""
    stats: dict = {}
    out = curate_corpus(
        docs,
        min_tokens=min_tokens,
        threshold=threshold,
        pairs_fn=lambda d: minhash_lsh_pairs(
            d, threshold, num_hashes=num_hashes, bands=bands
        ).select("id1", "id2"),
        cc_stats=stats,
    )
    # connected_components runs its propagation loop eagerly (each
    # round collects a convergence witness), so stats is final here
    return out.withColumn("n_rounds", F.lit(stats.get("n_rounds", -1)))


def training_manifest(
    docs: DataFrame,
    budget: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """THE end-to-end curation artifact: one row per input document
    with its full disposition — the manifest a training run actually
    consumes, composing four independently-oracled stages in one plan:

    1. quality gate (``gopher_quality_gate.keep``)
    2. exact dedup survivor selection (min-id, ``dedup_survivors``)
    3. md5 hash split (train/val/test, ``hash_split`` convention)
    4. token-budget packing of the TRAIN partition
       (``pack_sequences`` fixed-grid bins in doc_id order)

    Output: ``(doc_id, disposition, split, n_tokens, bin_id)`` where
    disposition ∈ {fail_quality, duplicate, kept}; split is NULL for
    dropped docs; bin_id is -1 except kept-train docs (a NULL in a
    bigint column would promote the whole column to float64 under a
    pandas fetch — the r7 HUGEINT lesson generalized — so the absent
    case gets an integer sentinel, keeping every fetch path's
    rendering identical). Every stage
    is a pure function of the data (md5 randomness, total-order
    champions, exact prefix sums), so the WHOLE manifest is
    rerun/partitioning-invariant and DuckDB-recomputable.

    Scale: the gate and dedup are doc-keyed hash aggs; the split is
    map-side; packing exchanges only the kept-train subset (range
    repartition + local windows + broadcast offsets).
    """
    from sparklyclean_spark.functions import text as T
    from sparklyclean_spark.operators.dedup.textdedup import dedup_survivors
    from sparklyclean_spark.operators.packing import pack_sequences
    from sparklyclean_spark.operators.sampling import hash_split
    from sparklyclean_spark.operators.text_analysis import gopher_quality_gate

    gate = gopher_quality_gate(docs).select(id_col, F.col("keep").alias("_gate"))
    surv = dedup_survivors(docs, policy="min_id", id_col=id_col, text_col=text_col).select(
        id_col, F.col("is_survivor").alias("_surv")
    )
    base = (
        docs.select(id_col, T.token_count(text_col).cast("bigint").alias("n_tokens"))
        .join(gate, id_col)
        .join(surv, id_col)
    )
    disposition = (
        F.when(~F.col("_gate"), F.lit("fail_quality"))
        .when(~F.col("_surv"), F.lit("duplicate"))
        .otherwise(F.lit("kept"))
    )
    labeled = hash_split(
        base.withColumn("disposition", disposition), id_col
    ).withColumn(
        "split", F.when(F.col("disposition") == "kept", F.col("split"))
    )
    train = labeled.where(
        (F.col("disposition") == "kept") & (F.col("split") == "train")
    ).select(id_col, "n_tokens")
    packed = pack_sequences(train, "n_tokens", order_by=[id_col], budget=budget).select(
        id_col, F.col("bin_id").alias("_bin")
    )
    return (
        labeled.join(packed, id_col, "left")
        .select(
            id_col,
            "disposition",
            "split",
            "n_tokens",
            F.coalesce(F.col("_bin"), F.lit(-1)).cast("bigint").alias("bin_id"),
        )
    )


def dsir_scores(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 8192,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """DSIR-style importance scores: per-document log likelihood ratio
    of a TARGET corpus vs the RAW corpus under hashed-n-gram bag
    models (Xie et al., "Data Selection for Language Models via
    Importance Resampling", NeurIPS 2023). Documents whose feature
    profile looks like the target (here: the ``target_lang`` slice —
    the stand-in for "high-quality reference corpus") score high;
    resampling with these scores as logits is the DSIR recipe for
    pretraining data selection.

    Domain: documents with ZERO tokens (empty/whitespace text) carry
    no features and are excluded from the output — the same domain
    rule as the unigram cross-entropy / perplexity-bucket family
    (their score is undefined, not zero). Resampling joins should
    left-join this output and decide the empty-doc policy explicitly.

    Model: features are unigrams + bigrams of the whitespace
    tokenizer, hashed into ``n_buckets`` buckets; each bag model is
    add-1 smoothed over the bucket space. A document's score is
    ``Σ_g ln(p(b(g)) / q(b(g)))`` over its gram OCCURRENCES — exactly
    the paper's hashed-generative-model log ratio.

    Hash-portability: the bucket is the LOW BITS of the md5-prefix
    hash (``n_buckets`` must be a power of two): two's-complement
    low bits of Spark's signed bigint equal the unsigned low bits,
    so no 63-bit mask and no pmod/% sign divergence is possible.
    Each bucket weight is ONE ln over a quotient of exact-integer
    products, casting the first factor to double (the bigram-PMI
    overflow recipe), rounded to DECIMAL(18,6) BEFORE the per-doc
    sum — decimal addition is associative, so aggregation order
    cannot move the hash.

    Scale: two explode→hash-agg passes build the bucket tables (both
    exactly ``n_buckets`` rows — FIXED-SIZE, unlike a vocab join, so
    the weight table broadcasts at ANY corpus size); one broadcast
    join + per-doc hash agg scores the corpus. The target slice is a
    filter of the same scan, not a second input.
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two (low-bits bucketing)")
    from sparklyclean_spark.functions import text as T

    w = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("_lang"),
        T.words(text_col).alias("w"),
    )
    # Spark sequence(1, 0) DESCENDS — guard the bigram build for
    # single-token docs instead of relying on an empty sequence
    bigrams = F.when(
        F.size("w") >= 2,
        F.expr(
            "transform(sequence(1, size(w) - 1),"
            " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    # bucket = low bits of the 64-bit md5-prefix hash. n_buckets ≤ 2^32
    # means every masked bit lives in the LOW conv() half (hex chars
    # 9..16 of the md5), so the hi-half conv + shiftleft + OR of the
    # full _md5_token_hash recipe is dead work per gram occurrence —
    # one conv instead of two, bit-identical buckets (r12, guide §1.2
    # per-task work; the DuckDB twin masks the full UBIGINT, same low
    # bits).
    if n_buckets > (1 << 32):
        raise ValueError("n_buckets exceeds the low-conv-half bucket recipe")
    occ = w.select(
        "doc_id", "_lang", F.explode(F.concat(F.col("w"), bigrams)).alias("_g")
    ).select(
        "doc_id",
        "_lang",
        F.conv(F.substring(F.md5("_g"), 9, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(n_buckets - 1))
        .alias("b"),
    )
    # r12 optimization (guide §2.3 "aggregate before you shuffle"): the
    # r9-r11 shape ran the explode + md5 bucket hash TWICE — once into
    # the stats agg and once into the scoring join (the "deliberate
    # 2x-linear trade"). Collapse the occurrence stream to per-
    # (doc, bucket) counts ONCE and persist that narrow relation: both
    # the bucket-stats agg and the per-doc scoring derive from it, so
    # the corpus text is tokenized/hashed exactly once. The weight sum
    # becomes Σ _lw·count — decimal multiply/add are exact, so the
    # score equals the per-occurrence sum bit-for-bit (oracle
    # re-verified).
    from sparklyclean_spark.cache import tracked_persist

    docb = tracked_persist(
        occ.groupBy("doc_id", "_lang", "b").agg(F.count(F.lit(1)).alias("_n"))
    )
    # qp is consumed twice — once under tot's broadcast build and once
    # as wt's stream side — and each reference re-ran the full bucket
    # agg over docb. It is EXACTLY n_buckets rows, so persisting it is
    # free and saves one pass over the per-doc count relation (r12,
    # guide §5).
    qp = tracked_persist(
        docb.groupBy("b").agg(
            F.sum("_n").alias("qc"),
            F.sum(
                F.when(F.col("_lang") == target_lang, F.col("_n")).otherwise(F.lit(0))
            ).alias("pc"),
        )
    )
    tot = qp.agg(
        F.sum("qc").cast("bigint").alias("_tq"),
        F.coalesce(F.sum("pc"), F.lit(0)).cast("bigint").alias("_tp"),
    )
    wt = qp.join(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("pc") + 1).cast("double")
                 * (F.col("_tq") + F.lit(n_buckets)))
                / ((F.col("qc") + 1).cast("double")
                   * (F.col("_tp") + F.lit(n_buckets)))
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("_lw"),
    )
    return (
        docb.join(F.broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("_n").cast("bigint").alias("n_grams"),
            F.sum(F.col("_lw") * F.col("_n")).alias("_s"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.round(F.col("_s").cast("double"), 4).alias("dsir_score"),
            F.round(F.col("_s").cast("double") / F.col("n_grams"), 4).alias(
                "dsir_per_gram"
            ),
        )
    )
