"""Deterministic corpus mixture sampling (the "data mixing" step).

Pretraining corpora are assembled to TARGET PROPORTIONS per source
(e.g. 40% web, 15% each of four curated sets), not to whatever ratio
the raw crawl happens to contain. ``mixture_sample`` computes, fully
in-plan, the largest output corpus that satisfies the targets without
repeating any document, and takes a deterministic per-source Bernoulli
sample at exactly the required rates:

* feasibility cap ``T = min_s(n_s / p_s)`` — the most-constrained
  source is kept whole (rate 1.0), everything else is downsampled to
  proportion;
* acceptance is md5(id)-uniform (same convention as
  ``operators/sampling.py``): a pure function of the data, stable
  across runs/partitionings and bit-reproducible in DuckDB, so the
  whole operator is oracle-checkable.

Scale shape: one tiny per-source count aggregation (map-side partial,
#sources rows), a 1-row min cross-joined broadcast, then a broadcast
rates join + map-side filter over the corpus — no shuffle of the data
itself, no driver-side math, no RNG state.

No reference counterpart; §2.10 capability-gap operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.functions.rounding import ratio4, round4


def mixture_sample(
    df: DataFrame,
    source_col: str,
    targets: dict[str, float],
    id_col: str,
    rate_name: str = "keep_rate",
) -> DataFrame:
    """Sample ``df`` so sources appear in ``targets`` proportions.

    Sources absent from ``targets`` are dropped (inner rates join).
    A TARGETED source absent from the DATA caps the whole mixture at
    zero — the largest corpus satisfying p_s > 0 with n_s = 0 rows of
    s is empty, so the output is empty rather than a silently wrong
    mix computed over the present sources only (r9 review finding).
    Appends ``rate_name`` (the per-source acceptance rate actually
    applied). Expected output size = ``min_s(n_s / p_s)``.
    """
    from sparklyclean_spark.operators.sampling import md5_uniform

    spark = df.sparkSession
    tot = float(sum(targets.values()))
    t_df = spark.createDataFrame(
        [(k, v / tot) for k, v in targets.items()],
        f"{source_col} string, _p double",
    )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    # LEFT join from the targets side: a targeted-but-missing source
    # surfaces as n=0 and drives the feasibility cap to zero
    j = F.broadcast(t_df).join(counts, source_col, "left").select(
        source_col, "_p", F.coalesce("_n", F.lit(0)).alias("_n")
    )
    cap = j.agg(F.min(F.col("_n") / F.col("_p")).alias("_T"))
    # ANSI-safe: the n=0 (missing) source has no data rows to rate
    # anyway — guard its division instead of erroring the whole plan
    rates = j.crossJoin(F.broadcast(cap)).select(
        source_col,
        F.when(
            F.col("_n") > 0, F.col("_p") * F.col("_T") / F.col("_n")
        ).alias(rate_name),
    )
    return df.join(F.broadcast(rates), source_col).where(
        md5_uniform(id_col) < F.col(rate_name)
    )


def corpus_mix_report(
    docs: DataFrame,
    by: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """The "data card" aggregation behind every training-mix decision:
    per stratum (default source x lang) — document count, token count,
    mean tokens/doc, and the stratum's share of ALL corpus tokens.
    Run it before and after curation; the deltas are the mix drift.

    Scale shape: ONE corpus scan with a map-side token count, one
    map-side-combinable hash agg to #strata rows, and a 1-row total
    broadcast-joined back — no second scan, no window. Ratios follow
    the repo floor-rounding contract (exact-integer inputs).

    No reference counterpart; §2.10 training-data-pipeline surface.
    """
    from sparklyclean_spark.functions import text as T

    keys = by or ["source", "lang"]
    per_doc = docs.select(
        *keys, T.token_count(text_col).cast("bigint").alias("_tok")
    )
    agg = per_doc.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("n_tokens"),
    )
    total = agg.agg(F.sum("n_tokens").alias("_total"))
    return (
        agg.join(F.broadcast(total))
        .select(
            *keys,
            "n_docs",
            "n_tokens",
            ratio4("n_tokens", "n_docs").alias("mean_tokens"),
            # ANSI-safe: an all-zero-token corpus must yield NULL share,
            # not a divide-by-zero error (driver runs ansi.enabled=true)
            F.when(F.col("_total") > 0, ratio4("n_tokens", "_total")).alias(
                "token_share"
            ),
        )
    )


def lang_mix_entropy(docs: DataFrame) -> DataFrame:
    """Per-source language-mix Shannon entropy — the data-card
    diversity number next to ``corpus_mix_report``'s raw counts: 0
    means a monolingual source; ln(#langs) means a perfectly
    balanced one. Also emits the normalized form
    (entropy / ln(n_langs), NULL-safe for single-language sources).

    Hash-stable float recipe (the cross-entropy precedent): each
    term ``p·ln(p)`` is rounded to DECIMAL(18,6) BEFORE the per-
    source sum — decimal addition is exact and associative, so
    engine aggregation order cannot move the hash; ``p`` itself is
    one IEEE divide of exact integer counts.

    Scale: two map-side-combinable hash aggs ((source, lang) then
    source) — output bounded by the label domains, never by corpus
    size.
    """
    per = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("_c"))
    tot = per.groupBy("source").agg(F.sum("_c").alias("_n"))
    p = F.col("_c") / F.col("_n")
    term = F.round(p * F.log(p), 6).cast("decimal(18,6)")
    ent = (
        per.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.max("_n").alias("_n1"),
            (-F.sum(term)).cast("double").alias("_h"),
        )
    )
    norm = F.when(
        F.col("n_langs") > 1,
        round4(F.col("_h") / F.log(F.col("n_langs").cast("double"))),
    )
    return ent.select(
        "source",
        F.col("_n1").cast("bigint").alias("n_docs"),
        F.col("n_langs").cast("bigint").alias("n_langs"),
        round4(F.col("_h")).alias("entropy"),
        norm.alias("entropy_norm"),
    )


def temperature_mix_weights(
    docs: DataFrame,
    by: list[str] | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled sampling weights per stratum — the standard
    multilingual/multi-source rebalancing knob (sample stratum i with
    probability ∝ p_i^α): α=1 keeps the natural mix, α→0 approaches
    uniform, α≈0.3–0.7 is the usual "upsample the tail without
    drowning the head" regime for low-resource languages.

    Determinism contract: α must be a dyadic power chain of sqrt
    (0.5 or 0.25) — sqrt is a correctly-rounded IEEE op, so
    ``sqrt(n_i / N)`` is bit-identical on every engine, unlike
    ``pow(x, α)`` whose libm differs across JVMs and DuckDB. Each
    scaled share is snapped to an exact 1e6 integer grid BEFORE the
    global normalizing sum (integer addition is associative →
    aggregation order cannot move the hash), and the final weight is
    the floor-ratio of those exact ints.

    Scale: one map-side-combinable hash agg to #strata rows + a 1-row
    broadcast total — corpus size never shuffles.
    """
    if alpha not in (0.5, 0.25):
        raise ValueError(
            "alpha must be 0.5 or 0.25 (sqrt chains are the only "
            "cross-engine bit-exact powers; see docstring)"
        )
    keys = by or ["lang"]
    per = docs.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_docs"))
    total = per.agg(F.sum("n_docs").cast("double").alias("_n"))
    scaled = F.sqrt(F.col("n_docs") / F.col("_n"))
    if alpha == 0.25:
        scaled = F.sqrt(scaled)
    snapped = per.join(F.broadcast(total)).withColumn(
        "_t", F.floor(scaled * 1000000.0 + 0.5).cast("bigint")
    )
    # The normalizing sum is a GLOBAL WINDOW over the already-aggregated
    # strata frame (#strata rows, bounded by the label domain — single
    # task over a dozen rows at any corpus size). An agg+rejoin would be
    # a self-join on shared lineage, which Spark 4's relation dedup
    # rejects as an ambiguous reference.
    from pyspark.sql import Window

    # "_tsum", not "_T": column resolution is case-insensitive in BOTH
    # engines, so a name differing from "_t" only by case would silently
    # REPLACE it (withColumn) or bind ambiguously (DuckDB)
    with_total = snapped.withColumn(
        "_tsum", F.sum("_t").over(Window.partitionBy(F.lit(1)))
    )
    return with_total.select(
        *keys,
        F.col("n_docs").cast("bigint").alias("n_docs"),
        ratio4("n_docs", "_n").alias("natural_share"),
        F.when(F.col("_tsum") > 0, ratio4("_t", "_tsum")).alias("temp_weight"),
    )
