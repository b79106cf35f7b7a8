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
corrupt data). One SYSTEMATIC collision class needs explicit defense:
Spark's ``xxhash64`` folds NULL inputs by leaving the running seed
unchanged, so payloads that are permutations of the same non-null
values across NULL slots — ``('x', NULL)`` vs ``(NULL, 'x')`` — would
collide with probability 1. All hash sites here therefore append a
per-column null indicator to the hashed tuple, which restores
positional sensitivity. ``diff_rows`` returns per-key statuses for
drill-down; ``diff_summary`` the counts.

No reference counterpart; §2.10 training-data-pipeline surface (the
snapshot-vs-snapshot audit every ingest refresh needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _payload_hash(cols: list[str]) -> Column:
    """NULL-position-sensitive payload fingerprint. ``xxhash64`` skips
    NULL inputs (the running seed passes through unchanged), so hashing
    the values alone would make ``('x', NULL)`` and ``(NULL, 'x')``
    collide deterministically; appending each column's null indicator
    (hashed as a boolean) breaks that class while staying map-side.

    An EMPTY column list (key-only tables — set-membership diffs) is
    a constant fingerprint: xxhash64() with zero args is an
    AnalysisException (r9 review finding), and "no payload" means
    every matched pair is unchanged."""
    if not cols:
        return F.lit(0).cast("bigint")
    return F.xxhash64(
        *[F.col(c) for c in cols], *[F.col(c).isNull() for c in cols]
    )


def diff_rows(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff status: ``(keys..., status)`` with status in
    {added, removed, changed, unchanged}. ``added`` = in right only;
    ``removed`` = in left only. NULL-safe on compare values (NULL ==
    NULL for change detection), NULL-position-sensitive (see
    ``_payload_hash``), and NULL-SAFE ON KEYS: a NULL-keyed row
    present identically on both sides is 'unchanged', not a phantom
    added+removed pair (the plain equi-join reported exactly that —
    r9 review finding; ``change_data_feed`` below always aligned
    null-safely and the two diff operators now agree)."""
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *[F.col(k).alias(f"_{tag}k_{k}") for k in keys],
            _payload_hash(compare_cols).alias(f"_h_{tag}"),
        )

    l, r = side(left, "l"), side(right, "r")
    cond = None
    for k in keys:
        c = F.col(f"_lk_{k}").eqNullSafe(F.col(f"_rk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = l.join(r, cond, "full_outer")
    status = (
        F.when(F.col("_h_l").isNull(), F.lit("added"))
        .when(F.col("_h_r").isNull(), F.lit("removed"))
        .when(F.col("_h_l") == F.col("_h_r"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"_lk_{k}"), F.col(f"_rk_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
    )


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


def change_data_feed(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    op_name: str = "op",
    include_old: bool = False,
) -> DataFrame:
    """Generate the MERGE-ready change batch that turns snapshot
    ``old`` into snapshot ``new`` — the inverse of
    ``merge.merge_changes`` and the producer side of the CDC family
    (latest_by_key consumes a log, merge applies a batch, THIS emits
    one). Output: ``new``'s columns + ``op`` ∈ {'I','U','D'} — one
    row per differing key; unchanged keys emit nothing; with
    ``include_old`` each row also carries ``_old_<col>`` (NULL for
    inserts) for downstream delta/retraction consumers. Deletes carry
    the OLD payload (all a consumer needs is the key, but the payload
    makes the feed auditable).

    Round-trip law (property-tested):
    ``merge_changes(old, change_data_feed(old, new, keys), keys)``
    equals ``new`` exactly, treating 'I' and 'U' alike as upserts —
    PROVIDED keys are non-NULL. The feed itself aligns NULL keys
    null-safely and reports their delta faithfully, but standard
    MERGE join semantics (here and in Delta/Iceberg) can never match
    a NULL key, so a NULL-keyed update applies as insert-without-
    delete; use a surrogate key if NULL keys are possible.

    Scale shape: ONE full-outer join on the key. Change detection
    compares map-side ``xxhash64`` of the payload columns (NULL-safe,
    same convention as ``diff_rows``), so unchanged rows — the vast
    majority of a daily snapshot pair — are filtered WITHOUT the
    payloads ever being compared column-by-column; the join ships
    both payloads once, which the op selection then projects down.
    """
    payload = [c for c in new.columns if c not in keys]
    if op_name in new.columns or op_name in old.columns:
        # withColumn(op_name, ...) would silently REPLACE the real
        # payload column with the op code and duplicate the name in
        # the output (r9 review finding, reproduced) — refuse loudly
        raise ValueError(
            f"op_name {op_name!r} collides with a snapshot column;"
            " pass a different op_name"
        )
    l = old.select(
        *[F.col(k).alias(f"_lk_{k}") for k in keys],
        *[F.col(c).alias(f"_l_{c}") for c in payload],
        _payload_hash(payload).alias("_h_l"),
    )
    r = new.select(
        *keys,
        *payload,
        _payload_hash(payload).alias("_h_r"),
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_lk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = r.join(l, cond, "full_outer")
    op = (
        F.when(F.col("_h_l").isNull(), F.lit("I"))
        .when(F.col("_h_r").isNull(), F.lit("D"))
        .when(F.col("_h_l") != F.col("_h_r"), F.lit("U"))
    )
    out_cols = [
        F.coalesce(F.col(k), F.col(f"_lk_{k}")).alias(k) for k in keys
    ] + [
        F.when(F.col("_h_r").isNull(), F.col(f"_l_{c}")).otherwise(F.col(c)).alias(c)
        for c in payload
    ]
    if include_old:
        # the previous payload (NULL for inserts) — what downstream
        # incremental aggregate maintenance needs to retract
        out_cols += [F.col(f"_l_{c}").alias(f"_old_{c}") for c in payload]
    return (
        joined.withColumn(op_name, op)
        .where(F.col(op_name).isNotNull())
        .select(*out_cols, op_name)
    )
