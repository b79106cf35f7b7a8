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


# Registry consumed by ComparatorSpec (operators/dedup/compare.py).
COMPARATORS = {
    "levenshtein": levenshtein_sim,
    "abs_diff": abs_diff,
    "sqrt_diff": sqrt_diff,
    "exact": exact_match,
    "jaccard_tokens": jaccard_tokens,
    "ignore": ignore,
}
