"""Invariant tests for the r7 operators: temperature mix weights,
bigram PMI, asymmetric containment, survivor policy, and the
portable-hash (md5) SimHash twin. Value-level oracle parity is the
driver gate (driver_sim / CORRECTNESS); these tests pin the algebraic
invariants that an oracle hash can't articulate on its own."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from sparklyclean_spark.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_temperature_weights_flatten_the_mix(docs):
    """Weights sum to ~1, every stratum keeps positive mass, and
    α=0.5 moves mass from the head to the tail: the largest stratum's
    weight drops below its natural share, the smallest one's rises."""
    from sparklyclean_spark.operators.mixing import temperature_mix_weights

    rows = temperature_mix_weights(docs, by=["lang"], alpha=0.5).collect()
    assert rows
    total = sum(r["temp_weight"] for r in rows)
    assert abs(total - 1.0) < 1e-3  # floor-grid rounding slack
    assert all(r["temp_weight"] > 0 for r in rows)
    head = max(rows, key=lambda r: r["n_docs"])
    tail = min(rows, key=lambda r: r["n_docs"])
    if head["n_docs"] > tail["n_docs"]:
        assert head["temp_weight"] < head["natural_share"]
        assert tail["temp_weight"] > tail["natural_share"]


def test_temperature_weights_rejects_unportable_alpha(docs):
    from sparklyclean_spark.operators.mixing import temperature_mix_weights

    with pytest.raises(ValueError):
        temperature_mix_weights(docs, alpha=0.3)


def test_bigram_pmi_matches_python_reference(spark):
    """PMI values and ranking agree with a from-scratch Python
    recomputation on a tiny corpus with known collocations."""
    import math
    from collections import Counter

    from sparklyclean_spark.operators.text_analysis import bigram_pmi

    texts = [
        (0, "new york is big and new york is old"),
        (1, "san francisco and new york"),
        (2, "san francisco fog and san francisco hills"),
        (3, "the cat and the dog and the cat"),
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = {r["bigram"]: (r["count"], r["pmi"]) for r in bigram_pmi(df, min_count=2, top_k=50).collect()}

    uni: Counter = Counter()
    big: Counter = Counter()
    for _, t in texts:
        ws = t.split()
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    T = sum(uni.values())
    B = sum(big.values())
    for (w1, w2), c12 in big.items():
        if c12 < 2:
            continue
        pmi = math.log((c12 * T * T) / (B * uni[w1] * uni[w2]))
        pmi = math.floor(pmi * 10000.0 + 0.5) / 10000.0
        key = f"{w1} {w2}"
        assert key in got, key
        assert got[key] == (c12, pmi), (key, got[key], (c12, pmi))
    # a true collocation outranks a stop-word pair in PMI
    assert got["new york"][1] > got["and the"][1]


def test_containment_detects_subset_docs(spark):
    """A doc fully embedded in a larger one scores containment 1.0 in
    the subset direction even when jaccard would be low."""
    from sparklyclean_spark.operators.dedup.textdedup import containment_pairs

    small = "quantum flux capacitor resonance"
    big = small + " " + " ".join(f"filler{i}" for i in range(28))
    df = spark.createDataFrame(
        [(1, small, "en", "s"), (2, big, "en", "s"), (3, "totally unrelated words here", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    rows = {(r["id1"], r["id2"]): r for r in containment_pairs(df, min_containment=0.9).collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r["containment_1in2"] == 1.0       # small fully inside big
    assert r["containment_2in1"] < 0.2        # big barely inside small
    assert (1, 3) not in rows and (2, 3) not in rows


def test_survivors_longest_policy(spark):
    """Exactly one survivor per fingerprint group; the survivor has the
    maximal trimmed length (min doc_id on ties); singleton docs survive."""
    from sparklyclean_spark.operators.dedup.textdedup import dedup_survivors

    # doc 1/2/3 normalize to the same fingerprint ("a b"); doc 2 is longest
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a  b!!"), (3, "A b"), (4, "unique doc")],
        "doc_id bigint, text string",
    )
    rows = dedup_survivors(df, policy="longest").collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == 4
    grp = [r for r in rows if r["group_size"] == 3]
    assert {r["doc_id"] for r in grp} == {1, 2, 3}
    assert all(r["survivor_id"] == 2 for r in grp)  # "a  b!!" is longest raw
    assert by_id[2]["is_survivor"] and not by_id[1]["is_survivor"]
    assert by_id[4]["is_survivor"] and by_id[4]["group_size"] == 1
    # exactly one survivor per group
    surv = [r for r in rows if r["is_survivor"]]
    assert len({r["fp"] for r in surv}) == len(surv) == 2


def test_survivors_min_id_matches_exact_dedup(docs):
    from sparklyclean_spark.operators.dedup.textdedup import (
        dedup_survivors,
        exact_dedup,
    )

    surv = {
        r["fp"]: r["survivor_id"]
        for r in dedup_survivors(docs, policy="min_id").collect()
        if r["is_survivor"]
    }
    keep = {r["fp"]: r["keep_id"] for r in exact_dedup(docs).collect()}
    assert surv == keep


def test_simhash_md5_brute_force_parity(spark):
    """The md5-token-hash simhash pipeline (banded) equals a pure-Python
    brute-force recomputation — signature packing, banding recall at
    hamming<=3, and the verify filter all at once."""
    from sparklyclean_spark.operators.dedup.textdedup import simhash_pairs

    texts = [
        (i, " ".join(f"w{j}" for j in range(20) if (j + i) % 7 != i % 3))
        for i in range(12)
    ] + [(100, "alpha beta gamma delta"), (101, "alpha beta gamma delta epsilon")]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in simhash_pairs(df, max_hamming=3, token_hash="md5").collect()
    }

    def sig(text: str) -> int:
        toks = sorted(set(text.lower().split()))
        votes = [0] * 64
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(64) if votes[b] > 0)

    sigs = {i: sig(t) for i, t in texts}
    want = {}
    ids = sorted(sigs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= 3:
                want[(a, b)] = ham
    assert got == want
    # the corpus is built so identical-token-set docs exist: the banded
    # path must emit at least those hamming-0 pairs
    assert want and 0 in set(want.values())


def test_quantile_sketch_audit_bounds_hold(spark):
    """Every probed quantile satisfies the GK rank-error contract on a
    skewed synthetic column, under hostile partitioning."""
    from sparklyclean_spark.operators.sketches import quantile_sketch_audit

    df = spark.range(0, 5000, 1, 13).select(
        (F.col("id") * F.col("id") % 9973).cast("double").alias("v")
    )
    rows = quantile_sketch_audit(df, "v", accuracy=50).collect()
    assert len(rows) == 4
    assert all(r["within_bound"] for r in rows)
    assert all(r["n_rows"] == 5000 for r in rows)


def test_source_term_lift_ranks_exclusive_terms_first(spark):
    """A term appearing only in one source outranks shared vocabulary
    in that source's lift table."""
    from sparklyclean_spark.operators.text_analysis import source_term_lift

    rows = []
    for i in range(40):
        rows.append((i, "common words everywhere " + "zebra " * 3, "en", "a"))
    for i in range(40, 80):
        rows.append((i, "common words everywhere " + "yak " * 3, "en", "b"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")
    got = source_term_lift(df, min_count=10, top_k=3).collect()
    top = {r["source"]: r["term"] for r in got if r["rank"] == 1}
    assert top == {"a": "zebra", "b": "yak"}
    # exclusive terms have positive lift; shared terms do not rank above them
    assert all(r["log_lift"] > 0 for r in got if r["term"] in ("zebra", "yak"))


def test_session_path_trigrams_never_cross_sessions(spark):
    """A path ending one session and starting the next must NOT appear:
    trigram windows are keyed by (user, session)."""
    from datetime import datetime

    from sparklyclean_spark.operators.sessions import session_path_ngrams

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ts(mins):
        return datetime(2024, 1, 1, mins // 60, mins % 60, 0)

    rows = [
        # session 1: a>b>c ; 3h gap ; session 2: d>e>f
        (1, ts(0), 1, "a"), (1, ts(1), 2, "b"), (1, ts(2), 3, "c"),
        (1, ts(300), 4, "d"), (1, ts(301), 5, "e"), (1, ts(302), 6, "f"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz, event_id bigint, event_type string")
    got = {r["path"]: r["count"] for r in session_path_ngrams(
        df, n=3, gap_seconds=1800, tiebreaker="event_id"
    ).collect()}
    assert got == {"a>b>c": 1, "d>e>f": 1}
    assert "b>c>d" not in got and "c>d>e" not in got


def test_linear_attribution_conserves_purchases_and_value(spark):
    """Credit shares sum to the number of purchases and total purchase
    value (decimal-snap slack) across touch types + direct."""
    from datetime import datetime, timedelta

    from sparklyclean_spark.operators.behavior import linear_attribution

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: click, view, purchase(10.0) -> click 1/2 + view 1/2
        (1, t0, 1, "click", 0.0),
        (1, t0 + timedelta(hours=1), 2, "view", 0.0),
        (1, t0 + timedelta(hours=2), 3, "purchase", 10.0),
        # user 2: purchase with no touch -> direct 1
        (2, t0, 4, "purchase", 4.0),
        # user 3: stale click (30 days before) -> direct
        (3, t0 - timedelta(days=30), 5, "click", 0.0),
        (3, t0, 6, "purchase", 6.0),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id bigint, ts timestamp_ntz, event_id bigint, event_type string, value double",
    )
    got = {r["touch_type"]: r for r in linear_attribution(df).collect()}
    assert got["click"]["attributed_purchases"] == 0.5
    assert got["view"]["attributed_purchases"] == 0.5
    assert got["direct"]["attributed_purchases"] == 2.0
    assert abs(got["click"]["attributed_value"] - 5.0) < 1e-6
    assert abs(got["direct"]["attributed_value"] - 10.0) < 1e-6
    total_p = sum(r["attributed_purchases"] for r in got.values())
    total_v = sum(r["attributed_value"] for r in got.values())
    assert abs(total_p - 3.0) < 1e-3
    assert abs(total_v - 20.0) < 1e-3


def test_gopher_gate_rules(spark):
    """Known-bad docs fail the right rules; a clean doc passes all."""
    from sparklyclean_spark.operators.text_analysis import gopher_quality_gate

    clean = " ".join(f"word{i} nice text here" for i in range(20))  # 80 words
    short = "too short"
    symbols = " ".join(["###"] * 30 + ["ok"] * 30)
    repeated = " ".join(["spam"] * 60 + ["x"])
    df = spark.createDataFrame(
        [(1, clean), (2, short), (3, symbols), (4, repeated)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in gopher_quality_gate(df).collect()}
    assert got[1]["keep"] and all(
        got[1][k] for k in ("r_wordcount", "r_meanlen", "r_symbol", "r_alpha", "r_repeat")
    )
    assert not got[2]["r_wordcount"] and not got[2]["keep"]
    assert not got[3]["r_symbol"] and not got[3]["keep"]
    assert not got[4]["r_repeat"] and not got[4]["keep"]


def test_mutual_information_independence_and_identity(spark):
    """MI ~ 0 for independent columns; MI == H for identical columns
    (normalized form == 1)."""
    from sparklyclean_spark.operators.drift import mutual_information

    rows = [(i, f"a{i % 3}", f"b{(i // 3) % 4}") for i in range(120)]
    df = spark.createDataFrame(rows, "id bigint, x string, y string")
    indep = mutual_information(df, "x", "y").collect()[0]
    assert abs(indep["mi_nats"]) < 1e-3

    same = spark.createDataFrame(
        [(i, f"a{i % 3}") for i in range(120)], "id bigint, x string"
    ).withColumn("y", F.col("x"))
    ident = mutual_information(same, "x", "y").collect()[0]
    assert abs(ident["mi_normalized"] - 1.0) < 1e-3
    assert abs(ident["mi_nats"] - ident["entropy_a"]) < 1e-2


def test_grouped_correlation_matches_numpy(spark):
    """r agrees with numpy corrcoef to the 4-decimal grid; a
    zero-variance group yields NULL."""
    import numpy as np

    from sparklyclean_spark.operators.drift import grouped_correlation

    rng_rows = []
    xs, ys = [], []
    for i in range(200):
        x = (i * 37 % 101) / 7.0
        y = 2.5 * x + ((i * 53) % 13) - 6.0
        xs.append(x); ys.append(y)
        rng_rows.append(("g", x, y))
    rng_rows += [("flat", 1.0, float(i)) for i in range(10)]  # zero x-variance
    df = spark.createDataFrame(rng_rows, "grp string, x double, y double")
    got = {r["grp"]: r for r in grouped_correlation(df, "x", "y", by=["grp"]).collect()}
    want = float(np.corrcoef(xs, ys)[0, 1])
    assert abs(got["g"]["r"] - round(want, 4)) <= 2e-4
    assert got["flat"]["r"] is None
    assert got["g"]["n_pairs"] == 200


def test_blocking_quality_reduction_ratio(docs, spark):
    """Reduction ratio consistency law on a small synthetic frame:
    n_total_pairs == C(n,2), candidates <= total, rr = 1 - cand/total
    on the floor grid."""
    from sparklyclean_spark.operators.dedup.blocking import BlockingRule
    from sparklyclean_spark.operators.dedup.pairs import candidate_pairs_naive

    import __spark_entry__ as E
    from tests.conftest import SF_DIR

    row = E.queries()["blocking_quality_customer"](spark, SF_DIR).collect()[0]
    n = row["n_rows"]
    assert row["n_total_pairs"] == n * (n - 1) // 2
    assert 0 < row["n_candidate_pairs"] <= row["n_total_pairs"]
    import math
    want = math.floor(
        (row["n_total_pairs"] - row["n_candidate_pairs"]) * 10000.0
        / row["n_total_pairs"] + 0.5
    ) / 10000.0
    assert row["reduction_ratio"] == want
    assert row["reduction_ratio"] > 0.5  # blocking must actually prune


def test_lang_label_audit_shares_sum_per_label(spark):
    """Per labeled language, prediction shares sum to ~1 and counts
    partition the label's documents."""
    import __spark_entry__ as E
    from tests.conftest import SF_DIR

    rows = E.queries()["lang_label_audit"](spark, SF_DIR).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, cells in by_lang.items():
        share = sum(c["share_of_label"] for c in cells)
        assert abs(share - 1.0) < len(cells) * 1e-4 + 1e-9, (lang, share)


def test_training_manifest_composition_laws(docs, spark):
    """Manifest partitions the corpus: every doc exactly once; only
    kept docs carry a split; only kept-train docs carry a bin;
    bins respect the token budget grid (bin_id = cum_before // 4096
    monotone in doc_id order); dispositions agree with the component
    operators."""
    from sparklyclean_spark.operators.curation import training_manifest
    from sparklyclean_spark.operators.dedup.textdedup import dedup_survivors
    from sparklyclean_spark.operators.text_analysis import gopher_quality_gate

    rows = training_manifest(docs).collect()
    n_docs = docs.count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    gate = {r["doc_id"]: r["keep"] for r in gopher_quality_gate(docs).collect()}
    surv = {
        r["doc_id"]: r["is_survivor"]
        for r in dedup_survivors(docs, policy="min_id").collect()
    }
    for r in rows:
        if not gate[r["doc_id"]]:
            assert r["disposition"] == "fail_quality" and r["split"] is None
        elif not surv[r["doc_id"]]:
            assert r["disposition"] == "duplicate" and r["split"] is None
        else:
            assert r["disposition"] == "kept" and r["split"] in ("train", "val", "test")
        if r["disposition"] == "kept" and r["split"] == "train":
            assert r["bin_id"] >= 0
        else:
            assert r["bin_id"] == -1
    # packing law: in doc_id order over kept-train docs the exclusive
    # cumulative token count floor-divided by 4096 equals bin_id
    train = sorted(
        (r for r in rows if r["bin_id"] >= 0), key=lambda r: r["doc_id"]
    )
    cum = 0
    for r in train:
        assert r["bin_id"] == cum // 4096, (r, cum)
        cum += r["n_tokens"]


def test_ngram_diversity_monotone_in_n(docs):
    """Diversity (distinct/total) is non-decreasing in n for a natural
    corpus (longer grams repeat less), and all ratios are in (0, 1]."""
    from sparklyclean_spark.operators.text_analysis import ngram_diversity

    rows = ngram_diversity(docs).collect()
    by_src: dict[str, dict[int, float]] = {}
    for r in rows:
        assert 0 < r["diversity"] <= 1.0
        assert 0 < r["n_distinct"] <= r["n_grams"]
        by_src.setdefault(r["source"], {})[r["n"]] = r["diversity"]
    for src, d in by_src.items():
        assert set(d) == {1, 2, 3}
        assert d[1] <= d[2] <= d[3] + 1e-9, (src, d)


def test_transition_entropy_bounds(spark):
    """H(next|prev) <= H(next) always (conditioning cannot add
    entropy); a deterministic chain has zero conditional entropy."""
    from datetime import datetime, timedelta

    from sparklyclean_spark.operators.behavior import transition_entropy

    t0 = datetime(2024, 1, 1)
    # deterministic cycle a->b->c->a...
    det = spark.createDataFrame(
        [
            (1, t0 + timedelta(seconds=i), i, "abc"[i % 3])
            for i in range(30)
        ],
        "user_id bigint, ts timestamp_ntz, event_id bigint, event_type string",
    )
    r = transition_entropy(det).collect()[0]
    assert r["h_next_given_prev"] == 0.0
    assert r["h_next"] > 1.0  # ~ln(3)
    assert abs(r["information_gain"] - r["h_next"]) < 1e-9

    from tests.conftest import SF_DIR
    from sparklyclean_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    r2 = transition_entropy(ev).collect()[0]
    assert r2["h_next_given_prev"] <= r2["h_next"] + 1e-9
    assert r2["information_gain"] >= -1e-9


def test_ivf_cell_balance_partitions_the_corpus(emb):
    """Cell counts sum to the corpus size, shares sum to ~1, every
    cell id is within [0, n_cells), and assignment is rerun-stable."""
    from sparklyclean_spark.operators.similarity.knn import ivf_cell_balance

    rows = ivf_cell_balance(emb).collect()
    n = emb.count()
    assert sum(r["n_vectors"] for r in rows) == n
    assert abs(sum(r["share"] for r in rows) - 1.0) < len(rows) * 1e-4
    assert all(0 <= r["cell"] < 32 for r in rows)
    again = {r["cell"]: r["n_vectors"] for r in ivf_cell_balance(emb).collect()}
    assert again == {r["cell"]: r["n_vectors"] for r in rows}
