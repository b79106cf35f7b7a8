"""Semantics tests for the r6b batch: behavioral-sequence operators
(transition matrix, last-touch attribution, inter-arrival stats),
the Misra-Gries heavy-hitter sketch (containment guarantee under
adversarial partitionings), deterministic k-fold assignment, and the
df-thresholded OOV rate. The DuckDB hash parity for each registered
row is covered by test_oracle_parity; these tests pin the hand-
computable semantics and the partitioning invariances the oracle
cannot see.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sparklyclean_spark.operators import behavior as BH
from sparklyclean_spark.operators.sampling import kfold_assignment
from sparklyclean_spark.operators.sketches import heavy_hitter_audit, mg_candidates
from sparklyclean_spark.operators.text_analysis import oov_stats


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        # user 1: view -> click -> purchase(10.0) ; attribution: click
        (1, _ts("2024-01-01T00:00:00"), 1, "view", 0.0),
        (2, _ts("2024-01-01T00:01:00"), 1, "click", 0.0),
        (3, _ts("2024-01-01T00:02:00"), 1, "purchase", 10.0),
        # user 2: view then purchase 8 days later -> out of 7d window
        (4, _ts("2024-01-01T00:00:00"), 2, "view", 0.0),
        (5, _ts("2024-01-09T00:00:01"), 2, "purchase", 5.0),
        # user 3: purchase with no prior touch -> direct
        (6, _ts("2024-01-01T00:00:00"), 3, "purchase", 2.5),
        # user 4: same-timestamp tie broken by event_id (view id=7
        # sorts before click id=8 -> last prior touch is click)
        (7, _ts("2024-01-02T00:00:00"), 4, "view", 0.0),
        (8, _ts("2024-01-02T00:00:00"), 4, "click", 0.0),
        (9, _ts("2024-01-02T00:00:01"), 4, "purchase", 4.0),
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )


def test_transition_matrix_counts_and_probs(spark, tiny_events):
    out = {
        (r["from_type"], r["to_type"]): r
        for r in BH.transition_matrix(tiny_events).collect()
    }
    # user1: view->click, click->purchase; user2: view->purchase;
    # user4: view->click, click->purchase
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "purchase")]["n_transitions"] == 1
    assert out[("click", "purchase")]["n_transitions"] == 2
    assert len(out) == 3
    r = out[("view", "click")]
    assert r["n_from"] == 3 and r["prob"] == pytest.approx(0.6667)
    assert out[("click", "purchase")]["prob"] == 1.0


def test_transition_matrix_single_event_user_contributes_nothing(spark):
    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 9, "view", 0.0)],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double",
    )
    assert BH.transition_matrix(df).count() == 0


def test_last_touch_attribution(spark, tiny_events):
    out = {r["touch_type"]: r for r in BH.last_touch_attribution(tiny_events).collect()}
    # user1 -> click(10.0), user4 -> click(4.0); user2 out-of-window
    # and user3 no-touch both land in 'direct'
    assert out["click"]["n_purchases"] == 2
    assert out["click"]["total_value"] == pytest.approx(14.0)
    assert out["direct"]["n_purchases"] == 2
    assert out["direct"]["total_value"] == pytest.approx(7.5)
    assert set(out) == {"click", "direct"}


def test_last_touch_window_boundary_inclusive(spark):
    # exactly 7 days is attributed (<= bound), 7d + 1µs is direct
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, "click", 0.0),
        (2, _ts("2024-01-08T00:00:00"), 1, "purchase", 1.0),
        (3, _ts("2024-02-01T00:00:00"), 2, "click", 0.0),
        (4, _ts("2024-02-08T00:00:00.000001"), 2, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = {r["touch_type"]: r["n_purchases"]
           for r in BH.last_touch_attribution(df).collect()}
    assert out == {"click": 1, "direct": 1}


def test_interarrival_stats_known_gaps(spark):
    # user 1, type 'a': gaps 10s, 20s, 30s -> p50=20, p90/p99 interpolate
    base = datetime(2024, 1, 1)
    times = [0, 10, 30, 60]
    rows = [
        (i, datetime.fromtimestamp(base.timestamp() + t), 1, "a", 0.0)
        for i, t in enumerate(times)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    [r] = BH.interarrival_stats(df).collect()
    assert r["event_type"] == "a" and r["n_gaps"] == 3
    assert r["p50_gap_s"] == 20.0
    # linear interpolation over sorted [10,20,30]: p90 = 28, p99 = 29.8
    assert r["p90_gap_s"] == pytest.approx(28.0)
    assert r["p99_gap_s"] == pytest.approx(29.8)


def test_interarrival_streams_are_per_user_and_type(spark):
    # two users interleaved: gaps never cross users or types
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, "a", 0.0),
        (2, _ts("2024-01-01T00:00:05"), 2, "a", 0.0),
        (3, _ts("2024-01-01T00:00:10"), 1, "a", 0.0),
        (4, _ts("2024-01-01T00:00:12"), 1, "b", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = {r["event_type"]: r for r in BH.interarrival_stats(df).collect()}
    assert out["a"]["n_gaps"] == 1 and out["a"]["p50_gap_s"] == 10.0
    assert "b" not in out  # single-event stream -> no gap


# ---------------------------------------------------------------------------
# Misra-Gries sketch
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nparts", [1, 3, 16])
def test_mg_containment_under_partitionings(spark, nparts):
    """The MG guarantee is partitioning-invariant: any key with global
    frequency > n/(capacity+1) must appear in the candidate union, no
    matter how rows land in partitions. 50% hot key + uniform tail."""
    n = 4000
    df = (
        spark.range(n)
        .repartition(nparts)
        .select(
            F.when((F.col("id") % 2) == 0, F.lit("HOT"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
            .alias("k")
        )
    )
    cands = {r["key"] for r in mg_candidates(df, "k", capacity=8).collect()}
    assert "HOT" in cands

    audit = heavy_hitter_audit(
        df, F.col("k"), capacity=8, top_n=10
    ).collect()
    assert all(r["covered"] for r in audit)
    by_key = {r["key"]: r for r in audit}
    assert by_key["HOT"]["is_heavy"]
    assert by_key["HOT"]["exact_count"] == n // 2


def test_mg_candidate_set_is_bounded(spark):
    df = spark.range(10_000).repartition(4).select(
        F.col("id").cast("string").alias("k")
    )
    # all-distinct stream: each partition emits <= capacity rows
    assert mg_candidates(df, "k", capacity=16).count() <= 4 * 16


def test_mg_exact_when_under_capacity(spark):
    # fewer distinct keys than capacity -> MG degrades to exact counts
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3, "k string"
    ).coalesce(1)
    got = {r["key"]: r["weight"] for r in mg_candidates(df, "k", 64).collect()}
    assert got == {"a": 5, "b": 3}


# ---------------------------------------------------------------------------
# k-fold assignment
# ---------------------------------------------------------------------------


def test_kfold_deterministic_and_total(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = kfold_assignment(df, "doc_id", 5)
    counts = {r["fold"]: r["count"] for r in a.groupBy("fold").count().collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    assert sum(counts.values()) == 1000
    # roughly uniform (md5-uniform: each fold within 3 sigma of 200)
    assert all(140 <= c <= 260 for c in counts.values())
    # partitioning-invariant: identical assignment after a repartition
    b = kfold_assignment(df.repartition(13), "doc_id", 5)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ---------------------------------------------------------------------------
# OOV rate
# ---------------------------------------------------------------------------


def test_oov_stats_df_threshold(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),   # apple df=2, banana df=1
            (2, "apple cherry"),          # cherry df=1
            (3, "   "),                   # tokenizes to nothing -> dropped
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in oov_stats(docs, min_df=2).collect()}
    assert set(out) == {1, 2}
    # doc1: 3 tokens, banana (df=1) is the 1 OOV occurrence
    assert out[1]["n_tokens"] == 3 and out[1]["n_oov"] == 1
    assert out[1]["oov_rate"] == pytest.approx(0.3333)
    # doc2: 2 tokens, cherry OOV
    assert out[2]["n_tokens"] == 2 and out[2]["n_oov"] == 1
    assert out[2]["oov_rate"] == 0.5


# ---------------------------------------------------------------------------
# Count-Min sketch (in-plan)
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_bounds_overcount(spark):
    """Adversarial config: width 32 forces collisions over a 500-key
    domain. CMS must never undercount any probe; the overcount is
    bounded by the total stream weight (trivial bound) and in
    practice far below it — assert the one-sided guarantee plus a
    loose eps*n bound with the standard CMS eps = e/width."""
    import math

    from sparklyclean_spark.operators.sketches import cms_freq_audit

    n = 5000
    df = spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % 500).cast("string")).alias("k")
    )
    probes = [f"k{i}" for i in range(20)]
    rows = cms_freq_audit(
        df, F.col("k"), probes, width=32, depth=4
    ).collect()
    assert len(rows) == 20
    eps_n = math.e / 32 * n
    for r in rows:
        assert r["cms_estimate"] >= r["exact_count"], r
        assert r["cms_estimate"] <= r["exact_count"] + eps_n, r


def test_cms_exact_when_wide(spark):
    from sparklyclean_spark.operators.sketches import cms_freq_audit

    df = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k")
    )
    rows = cms_freq_audit(
        df, F.col("k"), [f"k{i}" for i in range(5)], width=65536, depth=4
    ).collect()
    for r in rows:
        assert r["cms_estimate"] == r["exact_count"] == 20


def test_cms_absent_probe_reports_zero_exact(spark):
    from sparklyclean_spark.operators.sketches import cms_freq_audit

    df = spark.range(100).select(F.lit("present").alias("k"))
    rows = {
        r["key"]: r
        for r in cms_freq_audit(
            df, F.col("k"), ["present", "ghost"], width=1024, depth=4
        ).collect()
    }
    assert set(rows) == {"present", "ghost"}
    assert rows["present"]["exact_count"] == 100
    assert rows["present"]["cms_estimate"] == 100
    # a probe absent from the data must still appear, with exact 0
    # and an estimate that never undercounts (here: its slots hold
    # at most the single present key's collisions, usually 0)
    assert rows["ghost"]["exact_count"] == 0
    assert rows["ghost"]["cms_estimate"] >= 0


# ---------------------------------------------------------------------------
# FK integrity audit
# ---------------------------------------------------------------------------


def test_fk_integrity_audit_counts(spark):
    from sparklyclean_spark.operators.quality import fk_integrity_audit

    child = spark.createDataFrame(
        [(1,), (2,), (3,), (None,), (99,)], "fk bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    [r] = fk_integrity_audit([("edge", child, "fk", parent, "pk")]).collect()
    assert r["fk"] == "edge"
    assert r["n_child"] == 5
    assert r["n_null_fk"] == 1
    assert r["n_orphans"] == 1  # 99 only; NULL is not an orphan
    assert r["orphan_frac"] == 0.2


def test_fk_integrity_audit_duplicate_parent_keys_do_not_multiply(spark):
    from sparklyclean_spark.operators.quality import fk_integrity_audit

    child = spark.createDataFrame([(1,), (1,)], "fk bigint")
    parent = spark.createDataFrame([(1,), (1,), (1,)], "pk bigint")
    [r] = fk_integrity_audit([("e", child, "fk", parent, "pk")]).collect()
    assert r["n_child"] == 2 and r["n_orphans"] == 0


# ---------------------------------------------------------------------------
# rolling daily revenue
# ---------------------------------------------------------------------------


def test_daily_revenue_rolling7_honors_calendar_gaps(spark):
    from sparklyclean_spark.operators.relational import daily_revenue_rolling7

    rows = [
        (1, _ts("2024-01-01T00:00:00"), 100.0),
        (2, _ts("2024-01-02T00:00:00"), 200.0),
        # gap: Jan 3..9 missing; Jan 10 is > 6 days after Jan 2, so
        # its trailing window contains ONLY itself
        (3, _ts("2024-01-10T00:00:00"), 400.0),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderdate timestamp_ntz, o_totalprice double"
    )
    out = {str(r["day"]): r for r in daily_revenue_rolling7({"orders": df}).collect()}
    assert out["2024-01-01"]["roll7_mean"] == 100.0
    assert out["2024-01-01"]["roll7_days"] == 1
    assert out["2024-01-02"]["roll7_mean"] == 150.0
    assert out["2024-01-02"]["roll7_days"] == 2
    assert out["2024-01-10"]["roll7_mean"] == 400.0
    assert out["2024-01-10"]["roll7_days"] == 1


# ---------------------------------------------------------------------------
# l-diversity
# ---------------------------------------------------------------------------


def test_l_diversity_flags_homogeneous_groups(spark):
    from sparklyclean_spark.operators.pii import l_diversity_audit

    df = spark.createDataFrame(
        [
            ("g1", "a"), ("g1", "a"), ("g1", "a"),        # homogeneous
            ("g2", "a"), ("g2", "b"),                      # diverse
            ("g3", None), ("g3", None),                    # all-NULL: 1 value
        ],
        "qi string, sens string",
    )
    out = {r["qi"]: r for r in l_diversity_audit(df, ["qi"], "sens", l=2).collect()}
    assert out["g1"]["group_n"] == 3 and out["g1"]["n_sensitive"] == 1
    assert not out["g1"]["l_diverse"]
    assert out["g2"]["n_sensitive"] == 2 and out["g2"]["l_diverse"]
    # NULL counts as ONE sensitive value, not zero and not exempt
    assert out["g3"]["n_sensitive"] == 1 and not out["g3"]["l_diverse"]


# ---------------------------------------------------------------------------
# temporal split
# ---------------------------------------------------------------------------


def test_temporal_split_boundary_and_overlap(spark):
    from sparklyclean_spark.operators.sampling import temporal_split_audit

    # 10 events, one per day; 0.8 quantile of day index 0..9 = 7.2 ->
    # floor(µs) boundary lands inside day 7, so days 0..7 are train
    rows = [
        (i, _ts(f"2024-01-{i+1:02d}T00:00:00"), 1 if i < 8 else 2, "e", 0.0)
        for i in range(10)
    ]
    # user 1 appears only in train, user 2 only in test -> overlap 0;
    # add user 3 straddling the boundary -> overlap 1
    rows += [
        (100, _ts("2024-01-02T12:00:00"), 3, "e", 0.0),
        (101, _ts("2024-01-10T12:00:00"), 3, "e", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = {r["split"]: r for r in
           temporal_split_audit(df, "ts", "user_id", 0.8).collect()}
    assert set(out) == {"train", "test"}
    assert out["train"]["n_events"] + out["test"]["n_events"] == 12
    # every train event strictly precedes every test event
    assert out["train"]["max_ts"] < out["test"]["min_ts"]
    assert out["train"]["n_overlap_entities"] == 1
    assert out["test"]["n_overlap_entities"] == 1


# ---------------------------------------------------------------------------
# target encoding
# ---------------------------------------------------------------------------


def test_target_encode_shrinks_rare_categories(spark):
    from sparklyclean_spark.operators.encoding import target_encode

    # global prior = 55.0; 'big' (n=100, mean 10) barely shrinks;
    # 'rare' (n=1, mean 100) shrinks most of the way to the prior
    rows = [("big", 10.0)] * 100 + [("rare", 100.0)] + [("mid", 100.0)] * 10
    df = spark.createDataFrame(rows, "cat string, y double")
    out = {r["cat"]: r for r in target_encode(df, "cat", "y", m=10.0).collect()}
    prior = (100 * 10.0 + 100.0 + 10 * 100.0) / 111
    assert out["big"]["raw_mean"] == 10.0
    assert abs(out["big"]["encoded"] - (1000 + 10 * prior) / 110) < 1e-3
    # rare category: encoded sits between its own mean and the prior,
    # much closer to the prior (weight 1 vs pseudo-count 10)
    assert prior < out["rare"]["encoded"] < 100.0
    assert out["rare"]["encoded"] - prior < (100.0 - prior) * 0.15


def test_frequency_encode_shares_sum_to_one(spark):
    from sparklyclean_spark.operators.encoding import frequency_encode

    df = spark.createDataFrame([("a",)] * 3 + [("b",)], "cat string")
    out = {r["cat"]: r for r in frequency_encode(df, "cat").collect()}
    assert out["a"]["freq"] == 0.75 and out["b"]["freq"] == 0.25


# ---------------------------------------------------------------------------
# daily volume anomaly
# ---------------------------------------------------------------------------


def test_daily_volume_anomaly_flags_spike(spark):
    from sparklyclean_spark.operators.behavior import daily_volume_anomaly

    # 14 quiet days (10±1 events) then a 100-event spike on day 15
    rows = []
    eid = 0
    for d in range(14):
        n = 10 + (d % 2)  # alternate 10/11 -> nonzero variance
        for j in range(n):
            rows.append((eid, _ts(f"2024-01-{d+1:02d}T06:00:00"), 1, "e", 0.0))
            eid += 1
    for j in range(100):
        rows.append((eid, _ts("2024-01-15T06:00:00"), 1, "e", 0.0))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = {str(r["day"]): r for r in daily_volume_anomaly(df).collect()}
    assert out["2024-01-15"]["is_anomaly"]
    assert out["2024-01-15"]["z"] > 3.0
    # warm-up days (baseline < 7) carry NULL z and no flag
    assert out["2024-01-02"]["z"] is None
    assert not out["2024-01-02"]["is_anomaly"]
    # quiet days inside the baseline are not flagged
    assert not out["2024-01-14"]["is_anomaly"]


def test_daily_volume_anomaly_constant_stream_no_flags(spark):
    from sparklyclean_spark.operators.behavior import daily_volume_anomaly

    rows = []
    for d in range(12):
        for j in range(5):
            rows.append((d * 5 + j, _ts(f"2024-02-{d+1:02d}T00:00:00"), 1, "e", 0.0))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = daily_volume_anomaly(df).collect()
    # zero variance -> sd == 0 -> z NULL everywhere, nothing flagged
    assert all(r["z"] is None and not r["is_anomaly"] for r in out)


# ---------------------------------------------------------------------------
# activity streaks (gaps-and-islands)
# ---------------------------------------------------------------------------


def test_activity_streaks_islands(spark):
    from sparklyclean_spark.operators.behavior import activity_streaks

    # user 1: days 1,2,3 then 5,6 then 10 -> streaks 3,2,1; last = 1
    # user 2: one day -> one streak of 1
    days_u1 = [1, 2, 3, 5, 6, 10]
    rows = [
        (i, _ts(f"2024-03-{d:02d}T0{i % 2}:00:00"), 1, "e", 0.0)
        for i, d in enumerate(days_u1)
    ]
    # duplicate events on the same day must not split or lengthen streaks
    rows.append((99, _ts("2024-03-02T23:00:00"), 1, "e", 0.0))
    rows.append((100, _ts("2024-03-07T00:00:00"), 2, "e", 0.0))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = {r["user_id"]: r for r in activity_streaks(df).collect()}
    u1 = out[1]
    assert u1["n_active_days"] == 6
    assert u1["n_streaks"] == 3
    assert u1["longest_streak"] == 3
    assert u1["last_streak"] == 1  # the day-10 singleton is most recent
    u2 = out[2]
    assert (u2["n_active_days"], u2["n_streaks"], u2["longest_streak"],
            u2["last_streak"]) == (1, 1, 1, 1)


# ---------------------------------------------------------------------------
# freshness audit
# ---------------------------------------------------------------------------


def test_freshness_audit_lag_and_staleness(spark):
    from sparklyclean_spark.operators.quality import freshness_audit

    rows = [
        (1, _ts("2024-01-10T00:00:00"), 1, "fresh", 0.0),
        (2, _ts("2024-01-09T23:00:00"), 1, "fresh", 0.0),
        (3, _ts("2024-01-08T00:00:00"), 1, "stale", 0.0),  # 48h behind
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = {r["event_type"]: r
           for r in freshness_audit(df, "event_type", "ts").collect()}
    assert out["fresh"]["lag_us"] == 0 and not out["fresh"]["stale"]
    assert out["fresh"]["n_last_24h"] == 2
    assert out["stale"]["lag_us"] == 48 * 3_600_000_000
    assert out["stale"]["stale"] and out["stale"]["n_last_24h"] == 0


# ---------------------------------------------------------------------------
# language-mix entropy
# ---------------------------------------------------------------------------


def test_lang_mix_entropy_bounds(spark):
    import math

    from sparklyclean_spark.operators.mixing import lang_mix_entropy

    docs = spark.createDataFrame(
        # s1: perfectly balanced 2 langs -> H = ln 2, norm = 1
        [(1, "t", "en", "s1", 1), (2, "t", "de", "s1", 1),
         # s2: monolingual -> H = 0, norm NULL
         (3, "t", "en", "s2", 1), (4, "t", "en", "s2", 1),
         # s3: 3:1 skew over 2 langs -> 0 < H < ln 2
         (5, "t", "en", "s3", 1), (6, "t", "en", "s3", 1),
         (7, "t", "en", "s3", 1), (8, "t", "fr", "s3", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {r["source"]: r for r in lang_mix_entropy(docs).collect()}
    assert out["s1"]["entropy"] == pytest.approx(math.log(2), abs=1e-3)
    assert out["s1"]["entropy_norm"] == pytest.approx(1.0, abs=1e-3)
    assert out["s2"]["entropy"] == 0.0 and out["s2"]["entropy_norm"] is None
    expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert out["s3"]["entropy"] == pytest.approx(expected, abs=1e-3)
    assert 0 < out["s3"]["entropy_norm"] < 1


# ---------------------------------------------------------------------------
# DAU/WAU stickiness
# ---------------------------------------------------------------------------


def test_dau_wau_stickiness_ratio(spark):
    from sparklyclean_spark.operators.retention import dau_wau_stickiness

    # 3 users on day 1; 1 of them returns on day 2
    rows = [
        (1, _ts("2024-01-01T01:00:00"), 1, "e", 0.0),
        (2, _ts("2024-01-01T02:00:00"), 2, "e", 0.0),
        (3, _ts("2024-01-01T03:00:00"), 3, "e", 0.0),
        (4, _ts("2024-01-02T01:00:00"), 1, "e", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = {str(r["obs_day"]): r for r in dau_wau_stickiness(df).collect()}
    assert out["2024-01-01"]["dau"] == 3 and out["2024-01-01"]["wau"] == 3
    assert out["2024-01-01"]["stickiness"] == 1.0
    # day 2: DAU 1, trailing-7d WAU still 3 -> 1/3
    assert out["2024-01-02"]["dau"] == 1 and out["2024-01-02"]["wau"] == 3
    assert out["2024-01-02"]["stickiness"] == pytest.approx(0.3333)


# ---------------------------------------------------------------------------
# Wilson conversion bounds
# ---------------------------------------------------------------------------


def test_conversion_wilson_interval(spark):
    from sparklyclean_spark.operators.behavior import conversion_wilson

    # day with 4 actives, 1 purchaser -> p=0.25; Wilson 95% for
    # (1, 4): lo ~0.0456, hi ~0.6994
    rows = [
        (1, _ts("2024-01-01T01:00:00"), 1, "view", 0.0),
        (2, _ts("2024-01-01T02:00:00"), 2, "view", 0.0),
        (3, _ts("2024-01-01T03:00:00"), 3, "view", 0.0),
        (4, _ts("2024-01-01T04:00:00"), 4, "view", 0.0),
        (5, _ts("2024-01-01T05:00:00"), 4, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    [r] = conversion_wilson(df).collect()
    assert r["n"] == 4 and r["s"] == 1 and r["rate"] == 0.25
    assert r["wilson_lo"] == pytest.approx(0.0456, abs=2e-4)
    assert r["wilson_hi"] == pytest.approx(0.6994, abs=2e-4)
    assert r["wilson_lo"] < r["rate"] < r["wilson_hi"]


def test_conversion_wilson_zero_success_day(spark):
    from sparklyclean_spark.operators.behavior import conversion_wilson

    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T01:00:00"), 1, "view", 0.0)],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double",
    )
    [r] = conversion_wilson(df).collect()
    assert r["s"] == 0 and r["rate"] == 0.0
    assert r["wilson_lo"] == 0.0 and r["wilson_hi"] > 0.0


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------


def test_rfm_segments_partition_customers_once(spark):
    from sparklyclean_spark.operators.relational import rfm_segments

    rows = []
    # 10 customers, customer i places i+1 orders of 100*(i+1) on day i+1
    for i in range(10):
        for j in range(i + 1):
            rows.append(
                (i * 100 + j, i, _ts(f"2024-01-{i+1:02d}T00:00:00"),
                 100.0 * (i + 1))
            )
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, "
        "o_orderdate timestamp_ntz, o_totalprice double"
    )
    out = rfm_segments({"orders": df}).collect()
    # every customer lands in exactly one cell
    assert sum(r["n_customers"] for r in out) == 10
    # NTILE(5) over 10 rows -> every tile value in 1..5
    for r in out:
        assert 1 <= r["r_tile"] <= 5
        assert 1 <= r["f_tile"] <= 5
        assert 1 <= r["m_tile"] <= 5
    # customer 9 (most recent, most frequent, biggest spender) is a
    # (1,1,1) champion; customer 0 is the (5,5,5) lost cell
    cells = {(r["r_tile"], r["f_tile"], r["m_tile"]) for r in out}
    assert (1, 1, 1) in cells and (5, 5, 5) in cells
    total = sum(r["total_monetary"] for r in out)
    assert total == pytest.approx(sum(100.0 * (i + 1) * (i + 1) for i in range(10)))


# ---------------------------------------------------------------------------
# drift / statistical tests
# ---------------------------------------------------------------------------


def test_chi_square_independent_labels_near_zero(spark):
    from sparklyclean_spark.operators.drift import chi_square_independence

    # perfectly independent 2x2 table: chi2 == 0 exactly
    rows = (
        [("x", "p")] * 20 + [("x", "q")] * 20
        + [("y", "p")] * 30 + [("y", "q")] * 30
    )
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = chi_square_independence(df, "a", "b").collect()
    assert r["n_rows"] == 100 and r["n_cells"] == 4 and r["dof"] == 1
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_chi_square_perfect_association(spark):
    from sparklyclean_spark.operators.drift import chi_square_independence

    # deterministic mapping a->b: chi2 == n, Cramer's V == 1
    rows = [("x", "p")] * 25 + [("y", "q")] * 25
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = chi_square_independence(df, "a", "b").collect()
    assert r["chi2"] == pytest.approx(50.0, abs=1e-3)
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-3)


def test_psi_identical_distributions_small(spark):
    from sparklyclean_spark.operators.drift import psi_drift

    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    out = psi_drift(base, base, "v").collect()
    # identical snapshots: every term 0 (same smoothed p and q)
    assert all(r["psi_term"] == 0.0 for r in out)
    assert out[0]["psi_total"] == 0.0


def test_psi_detects_shift(spark):
    from sparklyclean_spark.operators.drift import psi_drift

    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    shifted = base.select((F.col("v") + 60.0).alias("v"))
    out = psi_drift(base, shifted, "v").collect()
    # a 60-point shift on a 0-99 support is massive drift
    assert out[0]["psi_total"] > 0.25
    total = sum(r["n_actual"] for r in out)
    assert total == 1000  # every actual row lands in some bin


def test_ks_identical_and_shifted(spark):
    from sparklyclean_spark.operators.drift import ks_test

    a = [(float(i % 50), "g1") for i in range(500)]
    b_same = [(float(i % 50), "g2") for i in range(500)]
    df = spark.createDataFrame(a + b_same, "v double, g string")
    [r] = ks_test(df, "v", "g", "g1", "g2").collect()
    assert r["ks_d"] == 0.0 and not r["significant"]

    b_shift = [(float(i % 50) + 25.0, "g2") for i in range(500)]
    df2 = spark.createDataFrame(a + b_shift, "v double, g string")
    [r2] = ks_test(df2, "v", "g", "g1", "g2").collect()
    assert r2["ks_d"] == 0.5  # exactly half the mass is disjoint
    assert r2["significant"]
    # critical value for n=m=500: 1.358*sqrt(1000/250000) ~ 0.0859
    assert r2["ks_crit"] == pytest.approx(0.0859, abs=2e-4)


# ---------------------------------------------------------------------------
# triangle census / Zipf / Gini
# ---------------------------------------------------------------------------


def test_triangle_stats_known_graph(spark):
    from sparklyclean_spark.operators.graph import triangle_stats

    # K4 on {1,2,3,4} (4 triangles) plus pendant edge 4-5 (0 new)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((4, 5))
    df = spark.createDataFrame(edges, "id1 bigint, id2 bigint")
    [r] = triangle_stats(df).collect()
    assert r["n_nodes"] == 5 and r["n_edges"] == 7
    assert r["n_triangles"] == 4
    # wedges: deg (3,3,3,4,1) -> sum d(d-1)/2 = 3+3+3+6+0 = 15
    assert r["clustering_coeff"] == pytest.approx(12 / 15, abs=1e-4)


def test_triangle_stats_triangle_free(spark):
    from sparklyclean_spark.operators.graph import triangle_stats

    # path graph 1-2-3-4: wedges exist, no triangles
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id1 bigint, id2 bigint"
    )
    [r] = triangle_stats(df).collect()
    assert r["n_triangles"] == 0 and r["clustering_coeff"] == 0.0


def test_zipf_slope_power_law(spark):
    from sparklyclean_spark.operators.text_analysis import zipf_slope

    # construct a corpus whose term frequencies are ~1000/rank: the
    # fitted slope must sit near -1
    words = []
    for rank in range(1, 51):
        words += [f"w{rank:02d}"] * max(1, round(1000 / rank))
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id bigint, text string"
    )
    [r] = zipf_slope(docs).collect()
    assert r["n_terms"] == 50
    assert -1.05 < r["zipf_slope"] < -0.95
    # intercept ~ ln(1000) ~ 6.9
    assert 6.0 < r["zipf_intercept"] < 7.6


def test_revenue_gini_extremes(spark):
    from sparklyclean_spark.operators.relational import revenue_gini

    # perfectly equal: G = 0
    eq = spark.createDataFrame(
        [(i, i, _ts("2024-01-01T00:00:00"), 100.0) for i in range(10)],
        "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp_ntz, "
        "o_totalprice double",
    )
    [r] = revenue_gini({"orders": eq}).collect()
    assert r["gini"] == 0.0 and r["n_customers"] == 10
    assert r["total_revenue"] == pytest.approx(1000.0)

    # one whale holds everything except epsilon: G -> (n-1)/n = 0.9
    wh_rows = [(i, i, _ts("2024-01-01T00:00:00"), 0.0001) for i in range(9)]
    wh_rows.append((9, 9, _ts("2024-01-01T00:00:00"), 1_000_000.0))
    wh = spark.createDataFrame(
        wh_rows, "o_orderkey bigint, o_custkey bigint, "
        "o_orderdate timestamp_ntz, o_totalprice double"
    )
    [r2] = revenue_gini({"orders": wh}).collect()
    assert r2["gini"] == pytest.approx(0.9, abs=1e-3)


# ---------------------------------------------------------------------------
# embedding hygiene / negative sampling
# ---------------------------------------------------------------------------


def test_embedding_norm_stats_flags(spark):
    from sparklyclean_spark.operators.similarity.stats import (
        embedding_norm_stats,
    )

    rows = [
        (1, [3.0, 4.0]),        # norm 5
        (2, [0.0, 0.0]),        # zero vector
        (3, None),              # null row
        (4, [1.0, 0.0, 0.0]),   # ragged dim 3, norm 1
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    [r] = embedding_norm_stats(df).collect()
    assert r["n_vectors"] == 4 and r["n_null"] == 1
    assert r["n_zero"] == 1 and r["n_nonfinite"] == 0
    assert r["dim_min"] == 2 and r["dim_max"] == 3
    assert r["norm_min"] == 0.0 and r["norm_max"] == 5.0
    assert r["norm_p50"] == 1.0


def test_negative_pairs_never_self_and_deterministic(spark):
    from sparklyclean_spark.operators.sampling import negative_pairs

    df = spark.range(50).withColumnRenamed("id", "doc_id")
    a = negative_pairs(df, "doc_id", 3)
    rows = a.collect()
    assert len(rows) == 150
    assert all(r["partner_id"] != r["doc_id"] for r in rows)
    assert all(0 <= r["partner_id"] < 50 for r in rows)
    # partition-invariant rerun stability
    b = negative_pairs(df.repartition(7), "doc_id", 3)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_negative_pairs_roughly_uniform(spark):
    from sparklyclean_spark.operators.sampling import negative_pairs

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    counts = (
        negative_pairs(df, "doc_id", 10)
        .groupBy("partner_id")
        .count()
        .collect()
    )
    # 1000 draws over 100 partners: expect ~10 each, allow wide slack
    assert all(1 <= r["count"] <= 30 for r in counts)


# ---------------------------------------------------------------------------
# time-to-convert / seasonality
# ---------------------------------------------------------------------------


def test_time_to_convert_gaps_and_rate(spark):
    from sparklyclean_spark.operators.behavior import time_to_convert

    rows = [
        # user 1: view then purchase 60s later
        (1, _ts("2024-01-01T00:00:00"), 1, "view", 0.0),
        (2, _ts("2024-01-01T00:01:00"), 1, "purchase", 1.0),
        # user 2: view, never purchases
        (3, _ts("2024-01-01T00:00:00"), 2, "view", 0.0),
        # user 3: purchase BEFORE first view -> exposed, not converted
        (4, _ts("2024-01-01T00:00:00"), 3, "purchase", 1.0),
        (5, _ts("2024-01-01T00:05:00"), 3, "view", 0.0),
        # user 4: purchase only, no view -> not exposed at all
        (6, _ts("2024-01-01T00:00:00"), 4, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    [r] = time_to_convert(df).collect()
    assert r["n_exposed"] == 3 and r["n_converted"] == 1
    assert r["conversion_rate"] == pytest.approx(0.3333)
    assert r["p50_gap_s"] == 60.0 and r["p90_gap_s"] == 60.0


def test_hourly_seasonality_cells(spark):
    from sparklyclean_spark.operators.behavior import hourly_seasonality

    rows = [
        # 2024-01-07 was a Sunday (dow 0); 2024-01-08 Monday (dow 1)
        (1, _ts("2024-01-07T09:00:00"), 1, "e", 0.0),
        (2, _ts("2024-01-07T09:30:00"), 2, "e", 0.0),
        (3, _ts("2024-01-08T23:10:00"), 1, "e", 0.0),
        (4, _ts("2024-01-08T00:00:00"), 1, "e", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = {(r["dow"], r["hour"]): r for r in hourly_seasonality(df).collect()}
    assert out[(0, 9)]["n_events"] == 2 and out[(0, 9)]["share"] == 0.5
    assert out[(1, 23)]["n_events"] == 1
    assert out[(1, 0)]["n_events"] == 1
    assert len(out) == 3


# ---------------------------------------------------------------------------
# review-fix edge cases (NULL labels / NULL ts / Inf vectors / n=1)
# ---------------------------------------------------------------------------


def test_chi_square_null_labels_excluded(spark):
    from sparklyclean_spark.operators.drift import chi_square_independence

    rows = [("x", "p")] * 10 + [("y", "q")] * 10 + [(None, "p"), ("x", None)]
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = chi_square_independence(df, "a", "b").collect()
    # the two NULL-labeled rows are excluded everywhere: n, margins,
    # and grid stay mutually consistent
    assert r["n_rows"] == 20 and r["n_cells"] == 4 and r["dof"] == 1


def test_temporal_split_null_ts_excluded(spark):
    from sparklyclean_spark.operators.sampling import temporal_split_audit

    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, "e", 0.0),
        (2, _ts("2024-01-02T00:00:00"), 2, "e", 0.0),
        (3, None, 3, "e", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = temporal_split_audit(df, "ts", "user_id", 0.5).collect()
    assert sum(r["n_events"] for r in out) == 2  # NULL-ts row dropped


def test_embedding_norm_stats_infinity(spark):
    from sparklyclean_spark.operators.similarity.stats import (
        embedding_norm_stats,
    )

    rows = [
        (1, [3.0, 4.0]),
        (2, [1.0, float("inf")]),
        (3, [float("nan"), 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    [r] = embedding_norm_stats(df).collect()
    assert r["n_nonfinite"] == 2  # Inf AND NaN both flagged
    # non-finite vectors are excluded from the norm distribution
    assert r["norm_max"] == 5.0 and r["norm_min"] == 5.0


def test_negative_pairs_single_row_empty(spark):
    from sparklyclean_spark.operators.sampling import negative_pairs

    df = spark.range(1).withColumnRenamed("id", "doc_id")
    assert negative_pairs(df, "doc_id", 3).count() == 0


def test_freshness_audit_null_group_key(spark):
    from sparklyclean_spark.operators.quality import freshness_audit

    rows = [
        (1, _ts("2024-01-10T00:00:00"), 1, "typed", 0.0),
        (2, _ts("2024-01-10T00:00:00"), 1, None, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double"
    )
    out = {r["event_type"]: r
           for r in freshness_audit(df, "event_type", "ts").collect()}
    # the NULL group keeps its own last-24h count (null-safe join)
    assert out[None]["n_last_24h"] == 1 and out[None]["lag_us"] == 0


# ---------------------------------------------------------------------------
# quantile transform / trimmed mean / char entropy
# ---------------------------------------------------------------------------


def test_quantile_transform_uniform_and_ties(spark):
    from sparklyclean_spark.operators.outliers import quantile_transform

    rows = [
        (i, "g", float(v) if v is not None else None)
        for i, v in enumerate([10, 20, 20, 30, None])
    ]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    out = {r["id"]: r["v_q"] for r in
           quantile_transform(df, "v", by=["grp"]).collect()}
    assert out[0] == 0.0
    # equal values share the quantile (rank-based, tie-stable)
    assert out[1] == out[2] == pytest.approx(1 / 3, abs=1e-4)
    assert out[3] == 1.0
    assert out[4] is None  # NULL passes through


def test_trimmed_mean_drops_tails(spark):
    from sparklyclean_spark.operators.outliers import trimmed_mean

    # 1..100 plus a wild outlier; 5-95% band excludes it
    rows = [(i, "g", float(i)) for i in range(1, 101)]
    rows.append((999, "g", 1e9))
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    [r] = trimmed_mean(df, "v", by=["grp"]).collect()
    assert r["n_rows"] == 101
    assert r["n_used"] < 101  # tails trimmed
    assert 40.0 < r["trimmed_mean"] < 60.0  # outlier neutralized


def test_char_entropy_extremes(spark):
    import math

    from sparklyclean_spark.operators.text_analysis import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaa"),          # zero entropy
            (2, "abcdabcd"),          # uniform over 4 chars -> ln 4
            (3, ""),                  # zero-length: excluded entirely
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1]["char_entropy"] == 0.0 and out[1]["n_uniq_chars"] == 1
    assert out[2]["char_entropy"] == pytest.approx(math.log(4), abs=1e-3)
    assert out[2]["n_chars"] == 8 and out[2]["n_uniq_chars"] == 4
