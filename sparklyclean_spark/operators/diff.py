"""Table reconciliation: keyed diff of two snapshots.

The migration/backfill validation shape — "we rewrote the pipeline,
does the new output match the old one, and where not, how?" — run
over two 100 TB snapshots. The scale trick: rows are compared by a
single 64-bit ``xxhash64`` of the compare columns computed MAP-SIDE
on each scan, so the join that aligns the two sides carries only
``(key, hash)`` — the payload never rides the shuffle. One full
outer sort-merge join on the key, then a tiny status aggregation.

Hash equality stands in for value equality (64-bit collision odds at
1e12 rows ~ 3e-8 per pair under the birthday bound on matched keys —
and a collision can only mask a CHANGED row as unchanged, never
corrupt data). ``diff_rows`` returns per-key statuses for drill-down;
``diff_summary`` the counts.

No reference counterpart; §2.10 training-data-pipeline surface (the
snapshot-vs-snapshot audit every ingest refresh needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_rows(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff status: ``(keys..., status)`` with status in
    {added, removed, changed, unchanged}. ``added`` = in right only;
    ``removed`` = in left only. NULL-safe on compare values (NULL ==
    NULL for change detection) — hash() treats NULL deterministically."""
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *keys, F.xxhash64(*[F.col(c) for c in compare_cols]).alias(f"_h_{tag}")
        )

    l, r = side(left, "l"), side(right, "r")
    joined = l.join(r, on=keys, how="full_outer")
    status = (
        F.when(F.col("_h_l").isNull(), F.lit("added"))
        .when(F.col("_h_r").isNull(), F.lit("removed"))
        .when(F.col("_h_l") == F.col("_h_r"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("status"))


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Reconciliation rollup: ``(status, n)`` over the keyed diff."""
    return (
        diff_rows(left, right, keys, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
