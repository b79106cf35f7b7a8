"""Benchmark decontamination — score each training document by the
fraction of its distinct word n-grams that appear in a benchmark /
eval set, and flag documents above a threshold. The standard hygiene
pass before LLM pretraining (eval-set leakage detection); no
reference counterpart (part of the §2.10 training-data surface).

Scale shape: the benchmark is small relative to the corpus (eval
sets are thousands of docs; the corpus is 100 TB), so its distinct
n-gram set is built once and BROADCAST — the corpus-side pass is
then scan → explode → broadcast hash join → one per-doc aggregation.
The only corpus-wide shuffles are the per-doc distinct + count aggs,
both with map-side partial aggregation on (doc_id, gram).

N-grams are built with posexplode + window lead (whole-stage
codegen) rather than an array higher-order function: HOFs evaluate
interpreted per element and their shared JVM call sites deoptimize
under profile pollution from large queries (measured 8× elsewhere in
this repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparklyclean_spark.functions import text as T
from sparklyclean_spark.functions.rounding import ratio4


def _distinct_ngrams(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(id, gram) — each document's DISTINCT word n-grams."""
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(T.words(text_col)).alias("__pos", "__tok"),
    )
    w = Window.partitionBy("__id").orderBy("__pos")
    leads = [F.lead("__tok", j).over(w).alias(f"__t{j}") for j in range(1, n)]
    rows = toks.select("__id", "__tok", *leads)
    if n > 1:
        rows = rows.where(F.col(f"__t{n-1}").isNotNull())
    gram = F.concat_ws(" ", "__tok", *[f"__t{j}" for j in range(1, n)])
    return rows.select("__id", gram.alias("gram")).distinct()


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc contamination score vs ``benchmark``:
    (id_col, n_grams, n_matched, overlap_frac, contaminated).
    ``overlap_frac`` = |doc grams ∩ benchmark grams| / |doc grams|
    over distinct grams; docs with fewer than ``n`` tokens score 0.
    """
    doc_grams = _distinct_ngrams(docs, n, id_col, text_col)
    bench_grams = _distinct_ngrams(benchmark, n, id_col, text_col).select(
        "gram"
    ).distinct()

    # one corpus-side agg: total grams + matched grams together. The
    # broadcast LEFT join tags membership so count and sum share the
    # same shuffle instead of two joins + two aggs.
    tagged = doc_grams.join(
        F.broadcast(bench_grams.withColumn("__hit", F.lit(1))), "gram", "left"
    )
    per_doc = tagged.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_matched"),
    )

    # keep short docs (no grams) in the output with a zero score
    frac = F.when(
        F.col("n_grams") > 0, ratio4("n_matched", "n_grams")
    ).otherwise(F.lit(0.0))
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            F.coalesce(frac, F.lit(0.0)).alias("overlap_frac"),
            (F.coalesce(frac, F.lit(0.0)) >= threshold).alias("contaminated"),
        )
    )


def source_overlap_matrix(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    sources, how much content do they share? Counts DISTINCT word
    ``n``-gram shingles present in both, with each side's distinct
    total and the Jaccard of the shingle sets. Span-level rather than
    whole-document fingerprints: near-identical crawls share almost no
    byte-exact documents but plenty of repeated passages, and those
    are what double-weight a blended corpus. The mix-design sanity
    check before corpus blending.

    Scale shape: one distinct-agg to (source, gram) — linear,
    map-side combinable; the self-join key is the gram, whose group
    size is the number of SOURCES containing it (bounded by #sources,
    never corpus-sized), so the pair explosion is at most
    C(#sources, 2) per gram; per-source totals are a tiny broadcast.
    No quadratic doc-pair work anywhere.
    """
    from sparklyclean_spark.cache import tracked_persist

    # persisted: the distinct (source, gram) set feeds THREE subtrees
    # (per-source totals + both self-join sides) and its distinct is
    # the operator's dominant shuffle — compute it once
    fps = tracked_persist(
        docs.select(
            F.col(source_col).alias("src"),
            F.explode(T.word_shingles(text_col, n)).alias("fp"),
        ).distinct()
    )
    totals = fps.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    shared = (
        fps.alias("a")
        .join(fps.alias("b"), F.col("a.fp") == F.col("b.fp"))
        .where(F.col("a.src") < F.col("b.src"))
        .groupBy(F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = totals.select(F.col("src").alias("src_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("src").alias("src_b"), F.col("n").alias("n_b"))
    # full ordered pair grid (bounded: #sources²/2), LEFT-joined to
    # the shared counts: a source pair with NO common gram must still
    # appear as n_shared=0 / jaccard=0 — an inner join silently
    # omitted it, and "every pair of corpus sources" consumers could
    # not tell disjoint from missing (r9 review finding)
    grid = ta.crossJoin(tb).where(F.col("src_a") < F.col("src_b"))
    return (
        grid.join(shared, ["src_a", "src_b"], "left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)))
        .select(
            "src_a",
            "src_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            # floor arithmetic (repo rounding contract)
            ratio4(
                F.col("n_shared"),
                F.col("n_a") + F.col("n_b") - F.col("n_shared"),
            ).alias("jaccard"),
        )
    )
