"""Change-data-capture compaction shapes.

A training-data pipeline ingesting an append-only change stream needs
two standard collapses:

* ``latest_by_key`` — latest-record-wins snapshot compaction (the
  "upsert view" of a keyed change log).
* ``scd2_intervals`` — slowly-changing-dimension type 2: each change
  becomes a validity interval ``[valid_from, valid_to)`` with the
  open interval flagged current.

The reference engine has no streaming/CDC surface at all (its only
dataflow is the three-program dedup pipeline, GenerateLabeledPoints.
scala:47-111), so both operators are capability-gap additions in the
SURVEY.md §2.10 sense.

Scale notes
-----------
``latest_by_key`` deliberately uses a ``max(order struct)`` +
``max_by(payload struct, order struct)`` hash aggregation — the
payload NEVER enters the comparator (see the function docstring) —
instead of the textbook ``row_number() = 1`` window: the aggregate
gets map-side partial combine (each input partition contributes at
most one candidate row per key to the shuffle), whereas the window
shape must shuffle and sort EVERY change record per key. On a 100 TB
change log with a hot key the window plan is a single-task sort; the
agg plan stays balanced.

``scd2_intervals`` is inherently a per-key ordered walk (each row
needs its successor), so it IS the window shape — one shuffle on the
key, ``lead()`` over the per-key sort, no self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Latest-record-wins compaction: one row per ``keys`` group, the
    row with the lexicographically greatest ``order_cols`` tuple.

    ``order_cols`` MUST totally order within a key (include a unique
    tiebreaker, e.g. an event id). The payload is carried by
    ``max_by`` and NEVER enters the comparator: payload values cannot
    influence the winner under any circumstances, and payload columns
    may be non-orderable types (maps, structs of maps) that a
    ``max(struct(order, payload))`` comparator would reject outright.
    If ``order_cols`` do NOT totally order, which tied row wins is not
    defined — that is the contract, enforced socially here and by the
    ``test_latest_by_key_*`` fixtures; pass a tiebreaker.
    Output columns: keys + order_cols + payload_cols.
    """
    # backtick-quoted references throughout: bare F.col("a.b") parses
    # a dotted column name (legal in Spark, survives parquet) as a
    # nested field path and fails to resolve
    def q(c: str) -> Column:
        return F.col(f"`{c}`")

    ord_struct = F.struct(*[q(c).alias(c) for c in order_cols])
    agg = df.groupBy(*[q(k).alias(k) for k in keys]).agg(
        F.max(ord_struct).alias("_o"),
        F.max_by(
            F.struct(*[q(c).alias(c) for c in payload_cols]), ord_struct
        ).alias("_p"),
    )
    return agg.select(
        *[q(k) for k in keys],
        *[F.col(f"_o.`{c}`").alias(c) for c in order_cols],
        *[F.col(f"_p.`{c}`").alias(c) for c in payload_cols],
    )


def streaming_latest_by_key(
    spark,
    path: str,
    schema: str,
    keys: list[str],
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Streaming form of ``latest_by_key``: the same ``max(struct)``
    aggregation over ``readStream`` — Structured Streaming keeps one
    struct of state per key (no per-event retention), so the snapshot
    stays O(#keys) however long the change stream runs. Complete/
    update output modes both work; equality with the batch collapse
    over the same data is pytest-gated."""
    src = spark.readStream.schema(schema).parquet(path)
    return latest_by_key(src, keys, order_cols, payload_cols)


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """SCD type-2 history: every change row becomes an interval
    ``valid_from = ts`` .. ``valid_to = next change's ts`` (NULL while
    current). ``is_current`` marks the open interval.

    One shuffle (partition by keys), one per-key sort, ``lead()`` —
    no self-join, no pair explosion.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    nxt: Column = F.lead(F.col(ts_col)).over(w)
    return df.select(*keys, ts_col, tiebreak_col, *payload_cols).select(
        *keys,
        *payload_cols,
        F.col(tiebreak_col),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
