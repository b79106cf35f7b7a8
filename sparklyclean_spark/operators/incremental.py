"""Incremental aggregate maintenance (materialized-view delta update).

The 100 TB pattern this exists for: a grouped aggregate over a huge
fact table is materialized once; each refresh applies only the
CHANGE FEED (``diff.change_data_feed(..., include_old=True)``) —
cost proportional to |changes| + |affected groups|, never a rescan
of the base table. This is the classic self-maintainable-view rule
for distributive aggregates: SUM and COUNT are updatable from deltas
alone (retract old contribution, add new), which is why those are
the supported spec here — MIN/MAX are NOT self-maintainable under
deletes (a retracted minimum requires the base data) and are
deliberately rejected.

Sums are maintained in DECIMAL(28,6): decimal addition is exact and
associative, so ``snapshot - old + new`` lands on EXACTLY the value a
from-scratch recomputation produces — float retraction would drift
by an ulp per applied change and eventually diverge from the
recompute invariant.

A changed row may MOVE BETWEEN GROUPS (the group column is payload):
every U is treated as a retraction keyed by the OLD group values
plus an insertion keyed by the NEW ones, so group migration is
handled uniformly with I/D. Groups whose maintained count reaches 0
are dropped from the snapshot.

Equality with a from-scratch recomputation over the new base
snapshot is the driver-checked invariant (the oracle recomputes; the
engine maintains).

No reference counterpart; §2.10 capability-gap operator completing
the CDC family (generate -> compact -> apply -> MAINTAIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_grouped_sums(
    agg_snapshot: DataFrame,
    feed: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_name: str = "n_rows",
    op_col: str = "op",
) -> DataFrame:
    """Update ``agg_snapshot`` — schema ``group_cols + [count_name] +
    sum_<c> for c in sum_cols`` — with a change feed carrying
    ``_old_<col>`` columns (``change_data_feed(..., include_old=True)``).

    Returns the maintained snapshot with the same schema. Sums are
    maintained for rows present (count > 0); a group's sums retract
    to exactly 0 contribution when all its rows leave.
    """
    # Each feed row yields 1-2 delta rows: I and U contribute their NEW
    # payload under the NEW group values, D and U withdraw their OLD
    # payload under the OLD group values. Emitting both from ONE pass
    # (conditional structs + explode) instead of a two-branch union
    # matters because ``feed`` is itself an expensive relation (a
    # full-outer snapshot join from change_data_feed): the union form
    # rendered that whole subtree twice per maintenance query. The
    # delta-row multiset is identical, and BIGINT/decimal sums are
    # exact and associative, so the maintained values are bit-equal.
    ins_struct = F.when(
        F.col(op_col).isin("I", "U"),
        F.struct(
            *[F.col(g).alias(g) for g in group_cols],
            F.lit(1).cast("bigint").alias("_dc"),
            *[F.col(c).cast("decimal(28,6)").alias(f"_ds_{c}") for c in sum_cols],
        ),
    )
    ret_struct = F.when(
        F.col(op_col).isin("D", "U"),
        F.struct(
            *[F.col(f"_old_{g}").alias(g) for g in group_cols],
            F.lit(-1).cast("bigint").alias("_dc"),
            *[
                (-F.col(f"_old_{c}").cast("decimal(28,6)")).alias(f"_ds_{c}")
                for c in sum_cols
            ],
        ),
    )
    deltas = (
        feed.select(
            F.explode(F.array_compact(F.array(ins_struct, ret_struct))).alias("_d")
        )
        .select("_d.*")
        .groupBy(*group_cols)
        .agg(
            F.sum("_dc").alias("_dc"),
            *[F.sum(f"_ds_{c}").alias(f"_ds_{c}") for c in sum_cols],
        )
    )

    snap = agg_snapshot.select(
        *[F.col(g).alias(f"_k_{g}") for g in group_cols],
        F.col(count_name).alias("_n0"),
        *[F.col(f"sum_{c}").alias(f"_s0_{c}") for c in sum_cols],
    )
    cond = None
    for g in group_cols:
        c = F.col(g).eqNullSafe(F.col(f"_k_{g}"))
        cond = c if cond is None else (cond & c)
    joined = deltas.join(snap, cond, "full_outer")
    merged = joined.select(
        *[F.coalesce(F.col(g), F.col(f"_k_{g}")).alias(g) for g in group_cols],
        (
            F.coalesce(F.col("_n0"), F.lit(0)) + F.coalesce(F.col("_dc"), F.lit(0))
        ).alias(count_name),
        *[
            (
                F.coalesce(F.col(f"_s0_{c}"), F.lit(0).cast("decimal(28,6)"))
                + F.coalesce(F.col(f"_ds_{c}"), F.lit(0).cast("decimal(28,6)"))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return merged.where(F.col(count_name) > 0)
