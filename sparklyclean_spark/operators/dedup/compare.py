"""Pairwise feature generation from a comparator spec.

The reference hardcodes a per-column comparator list
(``Compare.scala:35-37``); here it is a pluggable spec. Features are
built as Column expressions over a pairs DataFrame carrying
``t1_<col>`` / ``t2_<col>`` payloads, so the whole feature stage is
JVM-side codegen — at 100 TB there is no Python in the per-pair loop.
A custom Python comparator can still be injected as a pandas UDF by
passing a callable producing a Column.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.functions.similarity import COMPARATORS


@dataclass(frozen=True)
class FieldComparator:
    """Compare column ``col`` of both records with ``comparator``
    (a name from ``COMPARATORS`` or a callable ``(a, b) -> Column``)."""

    col: str
    comparator: str | object = "levenshtein"
    kwargs: dict = field(default_factory=dict)

    def build(self, a: Column, b: Column) -> Column:
        fn = (
            COMPARATORS[self.comparator]
            if isinstance(self.comparator, str)
            else self.comparator
        )
        return fn(a, b, **self.kwargs)


def feature_columns(spec: list[FieldComparator], t1: str = "t1_", t2: str = "t2_") -> list[Column]:
    """One aliased feature Column per comparator: ``f_<col>``."""
    return [
        fc.build(F.col(f"{t1}{fc.col}"), F.col(f"{t2}{fc.col}")).alias(f"f_{fc.col}")
        for fc in spec
    ]


def with_features(
    pairs: DataFrame,
    spec: list[FieldComparator],
    as_array: bool = True,
) -> DataFrame:
    """Append features to a pairs DataFrame (``t1_*``/``t2_*`` payload
    columns). ``as_array=True`` adds ``features array<double>`` (the
    reference's labeled-point layout, ``DisDedupReducer.scala:5``);
    otherwise one ``f_<col>`` column per comparator."""
    cols = feature_columns(spec)
    if as_array:
        return pairs.withColumn(
            "features", F.array(*[c.cast("double") for c in cols])
        )
    return pairs.select("*", *cols)


def select_pair_features(
    pairs: DataFrame,
    spec: list[FieldComparator],
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """Project (id1, id2, f_<col>...) — the flat feature table."""
    return pairs.select(F.col(id1), F.col(id2), *feature_columns(spec))
