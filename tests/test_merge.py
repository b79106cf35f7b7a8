"""MERGE/apply-changes: differential test against a dict-based model,
compaction ordering, and the broadcast plan claim."""

from __future__ import annotations

from sparklyclean_spark.operators.merge import merge_changes


def _df(spark, rows, schema="k bigint, v string"):
    return spark.createDataFrame(rows, schema)


def test_merge_matches_dict_model(spark):
    target = [(i, f"old{i}") for i in range(20)]
    # updates on multiples of 3, deletes on multiples of 7, inserts at 100+
    changes = (
        [(i, f"new{i}", "U") for i in range(0, 20, 3)]
        + [(i, "x", "D") for i in range(0, 20, 7)]
        + [(100 + i, f"ins{i}", "U") for i in range(3)]
    )
    # dict model: deletes win where both ops touch a key (0, 7, 14 —
    # build changes map with delete applied last, mirroring that the
    # test feeds non-conflicting ops except multiples of 21... here
    # keys 0,7,14 appear twice; resolve per the LAST entry in the list
    model = {k: v for k, v in target}
    for k, v, op in changes:
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    # make the change set single-op-per-key the same way: keep last
    seen = {}
    for k, v, op in changes:
        seen[k] = (k, v, op)
    sdf = merge_changes(
        _df(spark, target),
        _df(spark, list(seen.values()), "k bigint, v string, op string"),
        ["k"],
    )
    assert {(r.k, r.v) for r in sdf.collect()} == set(model.items())
    assert sdf.columns == ["k", "v"]


def test_merge_null_op_is_upsert_not_silent_delete(spark):
    """A change row with NULL op must behave as an upsert. Before the
    null-safe predicate, `op != 'D'` evaluated to NULL for it: the
    anti-join removed the target row AND the filter dropped the
    upsert — the key silently vanished."""
    target = _df(spark, [(1, "old1"), (2, "old2")])
    changes = _df(spark, [(1, "new1", None)], "k bigint, v string, op string")
    merged = merge_changes(target, changes, ["k"])
    out = {(r.k, r.v) for r in merged.collect()}
    assert out == {(1, "new1"), (2, "old2")}
    assert merged.columns == ["k", "v"]


def test_compaction_latest_change_wins(spark):
    target = [(1, "old"), (2, "old")]
    # key 1: update @t1 then delete @t2 -> deleted
    # key 2: delete @t1 then update @t2 -> updated
    # key 3: insert @t1 then update @t2 -> latest insert payload
    changes = [
        (1, "a", "U", 1),
        (1, "a", "D", 2),
        (2, "b", "D", 1),
        (2, "b2", "U", 2),
        (3, "c", "U", 1),
        (3, "c2", "U", 2),
    ]
    out = merge_changes(
        _df(spark, target),
        _df(spark, changes, "k bigint, v string, op string, ver int"),
        ["k"],
        order_cols=["ver"],
    )
    assert {(r.k, r.v) for r in out.collect()} == {(2, "b2"), (3, "c2")}


def test_broadcast_changes_leaves_target_unshuffled(spark):
    target = _df(spark, [(1, "a")])
    changes = _df(spark, [(1, "b", "U")], "k bigint, v string, op string")
    plan = (
        merge_changes(target, changes, ["k"], broadcast_changes=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the target side must not hash-exchange for the anti join
    assert "Exchange hashpartitioning(k" not in plan


def test_change_data_feed_roundtrip_law(spark):
    """merge_changes(old, change_data_feed(old, new)) == new, on a
    snapshot pair exercising insert, update, delete, unchanged, and
    NULL payloads/keys."""
    from sparklyclean_spark.operators.diff import change_data_feed

    old = _df(spark, [(1, "a"), (2, "b"), (3, None), (4, "d")],
              "k bigint, v string")
    new = _df(spark, [(1, "a"), (2, "B"), (4, "d"), (5, "e")],
              "k bigint, v string")
    cdf = change_data_feed(old, new, ["k"])
    got_ops = {(r["k"], r["v"], r["op"]) for r in cdf.collect()}
    assert got_ops == {
        (2, "B", "U"),      # changed
        (3, None, "D"),     # removed (old payload carried)
        (5, "e", "I"),      # inserted
    }
    merged = merge_changes(old, cdf, ["k"])
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in new.collect()}
    # NULL keys: the feed REPORTS their delta (null-safe align), but
    # MERGE join semantics cannot apply them — documented contract
    oldn = _df(spark, [(None, "nk")], "k bigint, v string")
    newn = _df(spark, [(None, "NK")], "k bigint, v string")
    assert {(r["k"], r["v"], r["op"]) for r in
            change_data_feed(oldn, newn, ["k"]).collect()} == {(None, "NK", "U")}


def test_change_data_feed_null_permutation_detected(spark):
    """Payloads that permute the same non-null value across NULL slots
    must NOT hash-collide: xxhash64 skips NULL inputs, so without the
    per-column null indicators old=(k,'x',NULL) vs new=(k,NULL,'x')
    would emit an EMPTY feed and silently drop the update, breaking
    merge(old, cdf(old, new)) == new."""
    from sparklyclean_spark.operators.diff import change_data_feed, diff_rows

    old = _df(spark, [(1, "x", None), (2, "y", "z")], "k bigint, a string, b string")
    new = _df(spark, [(1, None, "x"), (2, "y", "z")], "k bigint, a string, b string")
    cdf = change_data_feed(old, new, ["k"])
    assert {(r["k"], r["a"], r["b"], r["op"]) for r in cdf.collect()} == {
        (1, None, "x", "U")
    }
    merged = merge_changes(old, cdf, ["k"])
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in new.collect()}
    statuses = {(r["k"], r["status"]) for r in diff_rows(old, new, ["k"]).collect()}
    assert statuses == {(1, "changed"), (2, "unchanged")}


def test_change_data_feed_empty_delta(spark):
    from sparklyclean_spark.operators.diff import change_data_feed

    snap = _df(spark, [(1, "a"), (2, "b")])
    assert change_data_feed(snap, snap, ["k"]).count() == 0


def test_incremental_agg_maintenance_with_group_migration(spark):
    """Maintained snapshot == from-scratch recompute when updates MOVE
    rows between groups, plus inserts, deletes, and a group emptying
    out entirely."""
    from pyspark.sql import functions as F

    from sparklyclean_spark.operators.diff import change_data_feed
    from sparklyclean_spark.operators.incremental import maintain_grouped_sums

    old = _df(spark, [(1, "a", 10.5), (2, "a", 20.25), (3, "b", 5.0), (4, "c", 7.75)],
              "k bigint, g string, v double")
    new = _df(spark, [(1, "b", 10.5),   # migrates a -> b
                      (2, "a", 99.0),   # value change, same group
                      (4, "c", 7.75),   # unchanged
                      (5, "d", 1.25)],  # insert into new group
              "k bigint, g string, v double")  # key 3 deleted -> b gains 1, loses 1
    agg_old = old.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").cast("decimal(28,6)")).alias("sum_v"),
    )
    feed = change_data_feed(old, new, ["k"], include_old=True)
    got = {
        r["g"]: (r["n_rows"], float(r["sum_v"]))
        for r in maintain_grouped_sums(agg_old, feed, ["g"], ["v"]).collect()
    }
    exp = {
        r["g"]: (r["n_rows"], float(r["sum_v"]))
        for r in new.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(28,6)")).alias("sum_v"),
        ).collect()
    }
    assert got == exp
    assert "d" in got and got["b"] == (1, 10.5)
