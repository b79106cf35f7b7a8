"""End-to-end Dis-Dedup pipeline: people table → labeled points → model.

Mirrors the reference's three-program flow (GenerateLabeledPoints →
TrainDupClassifier → ApplyDupClassifier) as composable DataFrame
functions. The Febrl column/comparator layout follows
``Compare.scala:35-37``: Levenshtein on the string fields, SqrtDiff
on date_of_birth, AbsDiff on age, Ignore on id/blocking_number
(arity-stable zeros).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.operators.dedup.blocking import BlockingRule
from sparklyclean_spark.operators.dedup.compare import FieldComparator, with_features
from sparklyclean_spark.operators.dedup.disdedup import DEFAULT_SEED, candidate_pairs_disdedup

# Reference blocking: function 1 = blocking_number, 2 = state
# (README.md:182-185 of the reference repo).
FEBRL_RULES = [BlockingRule(1, "blocking_number"), BlockingRule(2, "state")]

# Per-column comparators, reference order (Compare.scala:35-37). The
# two Ignore columns (rec_id, blocking_number) are dropped rather than
# emitted as constant zeros; parity mode can re-add them.
FEBRL_SPEC = [
    FieldComparator("given_name", "levenshtein"),
    FieldComparator("surname", "levenshtein"),
    FieldComparator("street_number", "levenshtein"),
    FieldComparator("address_1", "levenshtein"),
    FieldComparator("address_2", "levenshtein"),
    FieldComparator("suburb", "levenshtein"),
    FieldComparator("postcode", "levenshtein"),
    FieldComparator("state", "levenshtein"),
    FieldComparator("date_of_birth", "sqrt_diff"),
    FieldComparator("age", "abs_diff"),
    FieldComparator("phone_number", "levenshtein"),
    FieldComparator("soc_sec_id", "levenshtein"),
]

FEBRL_FEATURE_NAMES = [f"f_{fc.col}" for fc in FEBRL_SPEC]


def febrl_label(id1: Column, id2: Column) -> Column:
    """Ground truth from Febrl ids: duplicate iff the <N> of
    ``rec-<N>-...`` matches (``Util.scala:26-43``)."""
    return (F.split(id1, "-")[1] == F.split(id2, "-")[1]).cast("double")


def generate_labeled_points(
    people: DataFrame,
    rules: list[BlockingRule] | None = None,
    spec: list[FieldComparator] | None = None,
    id_col: str = "rec_id",
    k: int | None = None,
    seed: int = DEFAULT_SEED,
    mode: str = "parity",
    labeled: bool = True,
) -> DataFrame:
    """(id1, id2, label?, features array<double>) for every blocked pair.

    The reference's program 1 (``GenerateLabeledPoints.scala``) minus
    the text sink: pair generation is the load-balanced Dis-Dedup
    operator; features are Column expressions (JVM-side).
    ``mode="sane"`` switches the numeric comparators' one-side-missing
    sentinel from Double.MaxValue to NULL→0.0 imputation.
    """
    rules = rules or FEBRL_RULES
    spec = spec or FEBRL_SPEC
    if mode == "sane":
        spec = [
            FieldComparator(fc.col, fc.comparator, {**fc.kwargs, "mode": "sane"})
            if fc.comparator in ("abs_diff", "sqrt_diff")
            else fc
            for fc in spec
        ]
    payload = sorted({fc.col for fc in spec})
    pairs = candidate_pairs_disdedup(
        people, rules, id_col, payload_cols=payload, k=k, seed=seed
    )
    feat = with_features(pairs, spec, as_array=True)
    if mode == "sane":
        # NULL features (one-side-missing) → 0.0 for ML friendliness.
        feat = feat.withColumn(
            "features", F.transform("features", lambda x: F.coalesce(x, F.lit(0.0)))
        )
    cols = [F.col("id1"), F.col("id2")]
    if labeled:
        cols.append(febrl_label(F.col("id1"), F.col("id2")).alias("label"))
    return feat.select(*cols, "features")
