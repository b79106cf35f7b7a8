"""Per-column similarity comparators for pairwise record comparison.

Re-expresses the reference's scalar comparison functions
(``Compare.scala:14-81`` in david-siqi-liu/sparklyclean) as Spark
Column expressions so feature generation runs inside whole-stage
codegen — no Python in the per-pair hot path.

Semantics preserved from the reference (SURVEY.md §2.6, §2.9):

* G1 — ``levenshtein_sim`` is a NORMALIZED SIMILARITY in [0,1]
  (``1 - dist / max(len_a, len_b, 1)``), matching the stringdistance
  library's ``.score`` (``Compare.scala:44-46``), not Spark's raw
  edit distance.
* G2 — the missing-value ladder of ``SqrtDiff``/``AbsDiff``
  (``Compare.scala:47-71``): both missing → 1.0, exactly one
  missing → ``DOUBLE_MAX_SENTINEL``, else the numeric difference.
  ``mode="sane"`` replaces the hostile sentinel with NULL for
  ML-friendly feature vectors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# java.lang.Double.MAX_VALUE — the reference's one-side-missing sentinel.
DOUBLE_MAX_SENTINEL = 1.7976931348623157e308


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _is_missing(c: Column) -> Column:
    """Missing = NULL or empty string after trim (the reference's CSV
    carries missing values as ``""``; parse failures count as missing,
    ``Compare.scala:48-60``)."""
    return c.isNull() | (F.trim(c.cast("string")) == "")


def levenshtein_sim(a: Column | str, b: Column | str) -> Column:
    """Normalized Levenshtein similarity in [0,1] (G1)."""
    a, b = _as_col(a).cast("string"), _as_col(b).cast("string")
    a, b = F.coalesce(a, F.lit("")), F.coalesce(b, F.lit(""))
    return (
        F.lit(1.0)
        - F.levenshtein(a, b).cast("double")
        / F.greatest(F.length(a), F.length(b), F.lit(1)).cast("double")
    )


def _missing_ladder(a: Column, b: Column, value: Column, mode: str) -> Column:
    both = _is_missing(a) & _is_missing(b)
    either = _is_missing(a) | _is_missing(b)
    one_missing = (
        F.lit(None).cast("double") if mode == "sane" else F.lit(DOUBLE_MAX_SENTINEL)
    )
    return F.when(both, F.lit(1.0)).when(either, one_missing).otherwise(value)


def abs_diff(a: Column | str, b: Column | str, mode: str = "parity") -> Column:
    """``abs(a-b)`` with the reference's missing-value ladder (G2)."""
    a, b = _as_col(a), _as_col(b)
    val = F.abs(a.cast("double") - b.cast("double"))
    return _missing_ladder(a, b, val, mode)


def sqrt_diff(a: Column | str, b: Column | str, mode: str = "parity") -> Column:
    """``sqrt(abs(a-b))`` with the missing-value ladder (G2)."""
    a, b = _as_col(a), _as_col(b)
    val = F.sqrt(F.abs(a.cast("double") - b.cast("double")))
    return _missing_ladder(a, b, val, mode)


def exact_match(a: Column | str, b: Column | str) -> Column:
    """1.0 if equal (null-safe), else 0.0."""
    return _as_col(a).eqNullSafe(_as_col(b)).cast("double")


def jaccard_tokens(a: Column | str, b: Column | str) -> Column:
    """Jaccard similarity of whitespace token sets."""
    ta = F.array_distinct(F.split(F.coalesce(_as_col(a).cast("string"), F.lit("")), r"\s+"))
    tb = F.array_distinct(F.split(F.coalesce(_as_col(b).cast("string"), F.lit("")), r"\s+"))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def ignore(a: Column | str, b: Column | str) -> Column:
    """Arity-stable 0.0 placeholder (``Compare.scala:73-77``)."""
    return F.lit(0.0)



def _jw_one(a: str, b: str) -> float:
    """Classic Jaro-Winkler (prefix scale 0.1, prefix cap 4), matching
    DuckDB's jaro_winkler_similarity including its edge conventions:
    any empty side scores 0.0 (even '' vs ''), identical non-empty
    strings score 1.0."""
    if not a or not b:
        return 0.0
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    am = [False] * la
    bm = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not bm[j] and b[j] == ca:
                am[i] = bm[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if am[i]:
            while not bm[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    # Winkler boost only above the 0.7 threshold — the convention
    # DuckDB (and Lucene/rapidfuzz) implement; below it the plain
    # Jaro score is returned
    if jaro <= 0.7:
        return jaro
    l = 0
    for x, y in zip(a, b):
        if x == y and l < 4:
            l += 1
        else:
            break
    return jaro + l * 0.1 * (1.0 - jaro)


def jaro_winkler(a: Column | str, b: Column | str) -> Column:
    """Jaro-Winkler similarity in [0, 1] — the record-linkage
    comparator of choice for short name fields (prefix-weighted, more
    tolerant of transpositions than Levenshtein). NULL-safe (NULL
    reads as '' -> 0.0, same missing-data convention as the ladder
    comparators).

    Spark has no built-in JW, so this is an Arrow-batched pandas UDF;
    it runs only in the COMPARATOR stage (already bounded to blocked
    candidate pairs), never over the raw corpus. The DuckDB built-in
    jaro_winkler_similarity is the oracle (edge conventions matched;
    see _jw_one)."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def impl(sa, sb):
        return pd.Series(
            [
                _jw_one(x if x is not None else "", y if y is not None else "")
                for x, y in zip(sa, sb)
            ],
            dtype="float64",
        )

    return pandas_udf(impl, "double")(
        _as_col(a).cast("string"), _as_col(b).cast("string")
    )

# Registry consumed by ComparatorSpec (operators/dedup/compare.py).
COMPARATORS = {
    "levenshtein": levenshtein_sim,
    "abs_diff": abs_diff,
    "sqrt_diff": sqrt_diff,
    "exact": exact_match,
    "jaccard_tokens": jaccard_tokens,
    "jaro_winkler": jaro_winkler,
    "ignore": ignore,
}
