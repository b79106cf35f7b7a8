"""MERGE INTO / apply-changes: upsert a keyed change set into a
snapshot (the lakehouse writer primitive, Delta/Iceberg MERGE shape).

``latest_by_key`` (``operators/cdc.py``) answers "what is the current
value per key *within* a change log"; this operator applies such a
change set TO an existing target snapshot:

* a change row whose op is ``delete_op`` removes the target row,
* any other change row replaces it (update) or creates it (insert),
* target rows with no matching change pass through untouched.

Scale shape: ONE equi-shuffle. The pass-through set is a left
anti-join of target against the change keys; the surviving upserts
are unioned in. Both legs hash-partition on the key, so AQE plans a
single exchange per side and the union is exchange-free. The typical
CDC geometry — a small daily change batch against a huge snapshot —
is served by ``broadcast_changes=True``, which turns the anti-join
into a broadcast hash join and leaves the 100 TB target entirely
un-shuffled (map-side filter + concat; the only wide operation is
gone). When the change set is itself large, leave it off and pay the
one co-partitioned shuffle.

Multi-version change batches are compacted first with the same
map-side-combinable ``max(struct)`` collapse as ``latest_by_key``
(pass ``order_cols``), so "update then delete within one batch"
resolves to the final delete, matching MERGE-with-latest-change
semantics rather than failing on duplicate matches (Delta's MERGE
raises on multiple source matches; compaction is the standard fix).

No reference counterpart (the reference never rewrites data in
place); SURVEY §2.10 lakehouse/CDC surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.operators.cdc import latest_by_key


def merge_changes(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    order_cols: list[str] | None = None,
    broadcast_changes: bool = False,
) -> DataFrame:
    """Return the post-merge snapshot, schema == ``target.columns``.

    ``changes`` must carry every target column plus ``op_col`` (and
    ``order_cols`` if compaction is requested). With ``order_cols``
    the change set is first collapsed to the latest change per key;
    WITHOUT them the caller must supply at most one change row per key
    — extra rows would each survive the upsert leg and the merged
    snapshot would carry duplicate keys (Delta's MERGE raises on
    multiple source matches; here the contract is on the caller).

    A NULL in ``op_col`` counts as an upsert (null-safe comparison):
    only an explicit ``delete_op`` deletes. Without the null-safe
    predicate a NULL op would anti-join the target row away AND drop
    out of the upsert filter — the key would silently vanish.
    """
    payload = [c for c in target.columns if c not in keys]
    if order_cols is not None:
        # payload passed to latest_by_key must EXCLUDE order_cols:
        # compaction emits order columns once already, and a column in
        # both lists came out twice, so dropping the non-target order
        # columns below removed BOTH copies and the final select
        # crashed — exactly the common case of ordering by a ts column
        # that is also part of the snapshot (r9 review finding,
        # reproduced).
        extra = [
            c
            for c in payload + [op_col]
            if c not in order_cols and c not in keys
        ]
        compact = latest_by_key(changes, keys, order_cols, extra)
        changes = compact.drop(
            *[c for c in order_cols if c not in target.columns]
        )

    change_keys = changes.select(*keys)
    if broadcast_changes:
        change_keys = F.broadcast(change_keys)
    untouched = target.join(change_keys, keys, "left_anti")
    upserts = changes.where(~F.col(op_col).eqNullSafe(F.lit(delete_op))).select(
        *target.columns
    )
    return untouched.unionByName(upserts)
