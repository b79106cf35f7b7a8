"""Property tests for MERGE/apply-changes.

The law under test is the one the streaming sink relies on:
sequentially merging version-ordered batches equals one merge of the
concatenated change log compacted to the latest change per key
(associativity of apply-changes under a total version order). Plus a
randomized differential check against a dict model.
"""

from __future__ import annotations

from sparklyclean_spark.operators.merge import merge_changes

SCHEMA = "k int, v int, ver int, op string"


def _apply_model(model: dict[int, int], changes) -> None:
    for k, v, _ver, op in sorted(changes, key=lambda r: r[2]):
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v


def test_merge_property_sequential_equals_compacted(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        target=st.dictionaries(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=99),
            max_size=8,
        ),
        ops=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),    # key
                st.integers(min_value=0, max_value=99),   # value
                st.sampled_from(["U", "U", "D"]),         # op (updates 2:1)
            ),
            max_size=24,
        ),
        cut=st.integers(min_value=0, max_value=24),
    )
    def check(target, ops, cut):
        tgt_rows = [(k, v) for k, v in target.items()]
        tgt = spark.createDataFrame(tgt_rows, "k int, v int")
        # version-stamp ops in sequence order, split into two batches
        changes = [(k, v, i, op) for i, (k, v, op) in enumerate(ops)]
        b1, b2 = changes[:cut], changes[cut:]

        # dict model
        model = dict(target)
        _apply_model(model, changes)

        # sequential: merge batch 1 then batch 2
        seq = tgt
        for b in (b1, b2):
            if b:
                seq = merge_changes(
                    seq,
                    spark.createDataFrame(b, SCHEMA),
                    ["k"],
                    order_cols=["ver"],
                )
        # one-shot: merge the concatenated log
        one = tgt
        if changes:
            one = merge_changes(
                tgt, spark.createDataFrame(changes, SCHEMA), ["k"], order_cols=["ver"]
            )

        seq_set = {(r.k, r.v) for r in seq.collect()}
        one_set = {(r.k, r.v) for r in one.collect()}
        assert seq_set == one_set == set(model.items()), (target, ops, cut)

    check()
