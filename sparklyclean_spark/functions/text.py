"""Text-analysis column functions for document pipelines.

All pure Column expressions (JVM-side, codegen-friendly): tokenizing,
n-gram shingles, quality heuristics, language-ID scoring, and content
fingerprints. Each has an exact ANSI-SQL twin used by the DuckDB
oracle, so the whole text-analysis surface is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def words(text: Column | str) -> Column:
    """Lower-cased whitespace tokens (empty strings removed).

    trim+split instead of a filter() higher-order function: HOFs are
    interpreted per row (and their shared eval call-sites are
    vulnerable to JVM profile pollution from other large queries);
    trim/split/when stay inside whole-stage codegen. Semantics are
    identical: \\s+ splitting only yields empty tokens at the ends,
    which trim removes; all-whitespace text is guarded to [].
    """
    t = F.trim(F.lower(_c(text)))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams as space-joined strings.

    Uses 1-based ``element_at`` so the construction is position-exact
    with the DuckDB oracle's 1-based list indexing.
    """
    w = words(text)
    gen = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(n)]
            ),
        )
    )
    # sequence(1, x<1) counts DOWN in Spark — guard short docs to an
    # empty shingle set instead.
    return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(gen)


def token_count(text: Column | str) -> Column:
    return F.size(words(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(words(text)))


# GPT-2-style pre-tokenizer classes, simplified to be RE2-safe (no
# lookahead, ASCII classes) so Spark (Java regex) and the DuckDB
# oracle (RE2) count identically: a run of letters / digits / other
# non-space symbols, each optionally absorbing one leading space,
# else a whitespace run. Approximates LLM token counts ~1.3× closer
# than whitespace splitting on prose (punctuation and number runs
# count separately, as BPE does).
BPE_ISH_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def bpe_token_count(text: Column | str) -> Column:
    """Estimated LLM token count: number of BPE-ish pre-token matches.
    Pure ``regexp_count`` — codegen, no explode, no Python."""
    return F.regexp_count(_c(text), F.lit(BPE_ISH_RE))


# A tiny embedded stopword list (public knowledge) for quality scoring
# and the language-ID heuristic.
STOPWORDS_EN = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "es": ["el", "la", "los", "que", "y", "es"],
    "fr": ["le", "la", "les", "et", "est", "une"],
}


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    w = words(text)
    hits = F.size(F.filter(w, lambda t: t.isin(sw)))
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(w).cast("double")
    )


def alpha_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    t = _c(text)
    kept = F.length(F.regexp_replace(t, r"[^A-Za-z ]", ""))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        kept.cast("double") / F.length(t).cast("double")
    )


def mean_word_length(text: Column | str) -> Column:
    w = words(text)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(w).cast("double")
    )


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] heuristic: stopword presence + alphabetic purity
    + sane mean word length (penalize <3 or >10)."""
    swr = stopword_ratio(text)
    ar = alpha_ratio(text)
    mwl = mean_word_length(text)
    len_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.least(F.lit(1.0), swr * 2.0) * 0.3 + ar * 0.5 + len_ok * 0.2


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-token hit count per language."""
    w = words(text)
    return {
        lang: F.size(F.filter(w, lambda t: t.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column | str) -> Column:
    """Argmax language by marker hits, alphabetical tie-break;
    'und' (undetermined) when no marker hits at all."""
    scores = lang_scores(text)
    # struct comparison is field-order lexicographic: (score, -rank)
    # makes array_max pick the alphabetically-first language on ties.
    ranked = F.array(
        *[
            F.struct(
                scores[lang].alias("s"),
                F.lit(-i).alias("nr"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(sorted(scores))
        ]
    )
    top = F.array_max(ranked)
    return F.when(top["s"] <= 0, F.lit("und")).otherwise(top["lang"])


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lower, non-alnum → space,
    collapse runs, trim."""
    t = F.lower(_c(text))
    t = F.regexp_replace(t, r"[^a-z0-9]+", " ")
    return F.trim(t)


def fingerprint_md5(text: Column | str) -> Column:
    """Content fingerprint: md5 hex of the normalized text (md5 exists
    verbatim in DuckDB, making the fingerprint oracle-checkable)."""
    return F.md5(normalize_text(text))
