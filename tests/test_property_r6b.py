"""Property-based invariants for the r6b operator families, in the
style of test_merge_property: hypothesis generates adversarial small
inputs; each property is a law the operator must satisfy for ANY
input, not a hand-picked example.

Strategies are kept tiny (≤40 rows) — each example pays a Spark
job, so the value is input SHAPE diversity, not volume.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    counts=st.lists(st.integers(min_value=1, max_value=30), min_size=2, max_size=8)
)
@settings(**_SETTINGS)
def test_transition_probs_row_normalize(spark, counts):
    """For any single-user event sequence, per-from_type transition
    probabilities sum to ~1 and counts sum to len(seq) - 1."""
    from datetime import datetime, timedelta

    from sparklyclean_spark.operators.behavior import transition_matrix

    seq = []
    t0 = datetime(2024, 1, 1)
    i = 0
    for ti, c in enumerate(counts):
        for _ in range(c):
            seq.append((i, t0 + timedelta(seconds=i), 1, f"t{ti}", 0.0))
            i += 1
    df = spark.createDataFrame(
        seq, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    rows = transition_matrix(df).collect()
    assert sum(r["n_transitions"] for r in rows) == len(seq) - 1
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["prob"]
    # floor-rounded per-cell probs: row sums land within n_cells * 1e-4
    for s in by_from.values():
        assert abs(s - 1.0) < 1e-2


@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_gini_bounds(spark, vals):
    """Gini of any positive revenue vector lies in [0, (n-1)/n]."""
    from datetime import datetime

    from sparklyclean_spark.operators.relational import revenue_gini

    rows = [
        (i, i, datetime(2024, 1, 1), float(v)) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, "
        "o_orderdate timestamp_ntz, o_totalprice double"
    )
    [r] = revenue_gini({"orders": df}).collect()
    n = len(vals)
    assert -1e-4 <= r["gini"] <= (n - 1) / n + 1e-4


@given(
    keys=st.lists(st.integers(min_value=0, max_value=15), min_size=5, max_size=40),
    capacity=st.integers(min_value=2, max_value=8),
)
@settings(**_SETTINGS)
def test_mg_never_overestimates_and_contains_heavies(spark, keys, capacity):
    """Misra-Gries weights never exceed true counts, and every key
    with frequency > n/(capacity+1) survives — for ANY stream and
    ANY capacity."""
    from collections import Counter

    from sparklyclean_spark.operators.sketches import mg_candidates

    df = spark.createDataFrame(
        [(f"k{k}",) for k in keys], "k string"
    ).repartition(2)
    got = {r["key"]: r["weight"] for r in mg_candidates(df, "k", capacity).collect()}
    true = Counter(f"k{k}" for k in keys)
    for k, w in got.items():
        # union of per-partition summaries: summed weight never
        # exceeds the true global count
        assert w <= true[k]
    threshold = len(keys) / (capacity + 1)
    for k, c in true.items():
        if c > 2 * threshold:  # heavy even if split evenly across 2 parts
            assert k in got, (k, c, threshold)


@given(
    vals_a=st.lists(
        st.integers(min_value=0, max_value=50), min_size=3, max_size=30
    ),
    shift=st.integers(min_value=0, max_value=100),
)
@settings(**_SETTINGS)
def test_ks_bounds_and_shift_monotone_zero(spark, vals_a, shift):
    """KS D is in [0,1]; identical samples give exactly 0; a disjoint
    shift gives exactly 1."""
    from sparklyclean_spark.operators.drift import ks_test

    rows = [(float(v), "a") for v in vals_a] + [
        (float(v + shift), "b") for v in vals_a
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    [r] = ks_test(df, "v", "g", "a", "b").collect()
    assert 0.0 <= r["ks_d"] <= 1.0
    if shift == 0:
        assert r["ks_d"] == 0.0
    if shift > max(vals_a):  # fully disjoint supports
        assert r["ks_d"] == 1.0


@given(
    n=st.integers(min_value=2, max_value=40),
    k=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_negative_pairs_shape_laws(spark, n, k):
    """Every row draws exactly k partners, never itself, all within
    the id universe."""
    from sparklyclean_spark.operators.sampling import negative_pairs

    df = spark.range(n).withColumnRenamed("id", "doc_id")
    rows = negative_pairs(df, "doc_id", k).collect()
    assert len(rows) == n * k
    for r in rows:
        assert r["partner_id"] != r["doc_id"]
        assert 0 <= r["partner_id"] < n


@given(
    freqs=st.lists(st.integers(min_value=1, max_value=40), min_size=2, max_size=10)
)
@settings(**_SETTINGS)
def test_lang_entropy_bounds(spark, freqs):
    """0 <= H <= ln(n_langs) for any language mixture."""
    from sparklyclean_spark.operators.mixing import lang_mix_entropy

    rows = []
    i = 0
    for li, c in enumerate(freqs):
        for _ in range(c):
            rows.append((i, "t", f"l{li}", "s", 1))
            i += 1
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    [r] = lang_mix_entropy(docs).collect()
    assert -1e-4 <= r["entropy"] <= math.log(len(freqs)) + 1e-3
    if len(freqs) > 1:
        assert -1e-4 <= r["entropy_norm"] <= 1.0 + 1e-4
