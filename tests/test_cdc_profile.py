"""CDC compaction, SCD2 intervals, chunk dedup, profiling, and int8
quantization — invariants beyond the driver's oracle hash."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparklyclean_spark.catalog import load_tables
from sparklyclean_spark.operators.cdc import latest_by_key, scd2_intervals
from sparklyclean_spark.operators.dedup.chunks import chunk_dedup
from sparklyclean_spark.operators.profile import profile_columns
from sparklyclean_spark.operators.similarity.quantize import (
    dequantize_cosine_error,
    quantize_int8,
)

from .conftest import SF_DIR


def test_latest_by_key_equals_window(spark):
    """The map-side-combinable max(struct) plan must give the same
    snapshot as the textbook row_number()=1 window plan."""
    ev = load_tables(spark, SF_DIR)["events"]
    agg = latest_by_key(
        ev, keys=["user_id", "event_type"], order_cols=["ts", "event_id"],
        payload_cols=["value"],
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    win = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "event_id", "value")
    )
    assert agg.exceptAll(win).count() == 0
    assert win.exceptAll(agg).count() == 0


def test_latest_by_key_winner_is_order_determined_only(spark):
    """Payload values must never influence the winner: a row with a
    lexicographically HUGE payload but a lower order key loses to a
    later row with a tiny payload. (The earlier comparator ranked on
    struct(order..., payload) — payload could silently tiebreak.)"""
    rows = [
        ("k1", 1, 2, "zzzzzz"),   # older, payload sorts last
        ("k1", 1, 5, "aaaaaa"),   # newest — must win despite payload
        ("k1", 1, 3, "mmmmmm"),
    ]
    df = spark.createDataFrame(rows, "k string, ts int, seq int, payload string")
    out = latest_by_key(df, ["k"], ["ts", "seq"], ["payload"]).collect()
    assert len(out) == 1
    assert out[0]["seq"] == 5 and out[0]["payload"] == "aaaaaa"


def test_latest_by_key_supports_nonorderable_payload(spark):
    """max_by carries the payload without comparing it, so MAP-typed
    payload columns (unorderable in Spark — max(struct(...)) over them
    throws) now work."""
    df = spark.createDataFrame(
        [("k1", 1, {"a": 1}), ("k1", 2, {"b": 2})],
        "k string, ts int, attrs map<string,int>",
    )
    out = latest_by_key(df, ["k"], ["ts"], ["attrs"]).collect()
    assert len(out) == 1 and out[0]["ts"] == 2 and out[0]["attrs"] == {"b": 2}


def test_scd2_intervals_partition_history(spark):
    """Per key: exactly one open (current) interval, no overlaps, and
    intervals chain (valid_to of one row = valid_from of the next)."""
    ev = load_tables(spark, SF_DIR)["events"].where(F.col("event_type") == "purchase")
    out = scd2_intervals(
        ev, keys=["user_id"], ts_col="ts", tiebreak_col="event_id",
        payload_cols=["value"],
    )
    per_key = out.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    bad_open = per_key.where(F.col("n_open") != 1).count()
    assert bad_open == 0
    # chaining: next interval starts exactly where the previous ends
    w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    chained = out.withColumn("nxt_from", F.lead("valid_from").over(w))
    broken = chained.where(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("nxt_from"))
    ).count()
    assert broken == 0
    assert out.count() == ev.count()


def test_chunk_dedup_keeps_each_span_once(spark):
    """Survivor chunk count == number of DISTINCT chunk contents in
    the original corpus (every repeated span kept exactly once)."""
    docs = load_tables(spark, SF_DIR)["documents"]
    out = chunk_dedup(docs, chunk_tokens=10)
    kept_total = out.agg(
        F.sum(F.col("n_chunks") - F.col("n_dropped"))
    ).collect()[0][0]

    from sparklyclean_spark.functions import text as T

    w = T.words("text")
    chunks = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(w) / 10).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * 10 + 1, 10)),
    )
    distinct_chunks = (
        docs.where(F.size(w) > 0)
        .select(F.explode(chunks).alias("chunk"))
        .select(F.countDistinct("chunk"))
        .collect()[0][0]
    )
    assert kept_total == distinct_chunks
    # corpus has repeated spans, so the operator must actually drop
    dropped = out.agg(F.sum("n_dropped")).collect()[0][0]
    assert dropped > 0


def test_chunk_dedup_first_occurrence_wins(spark):
    rows = [
        (1, "a b c d e f"),
        (2, "a b c x y z"),  # shares chunk "a b c" at 3-token width
        (3, "x y z q r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in chunk_dedup(df, chunk_tokens=3).collect()}
    assert out[1]["clean_text"] == "a b c d e f"
    assert out[2]["clean_text"] == "x y z"       # "a b c" seen in doc 1
    assert out[3]["clean_text"] == "q r s"       # "x y z" seen in doc 2
    assert out[2]["n_dropped"] == 1 and out[3]["n_dropped"] == 1


def test_profile_exact_vs_approx_plans(spark):
    """exact=True multi-distinct needs Expand; the scale path
    (exact=False, HLL++) must plan WITHOUT Expand — single pass."""
    orders = load_tables(spark, SF_DIR)["orders"]
    cols = [("o_orderkey", "num"), ("o_orderstatus", "str")]
    # default maxToStringFields truncates the agg list and can hide
    # the Expand node from the string form
    spark.conf.set("spark.sql.debug.maxToStringFields", "500")
    try:
        exact_plan = profile_columns(orders, cols, exact=True)._jdf.queryExecution().executedPlan().toString()
        approx_plan = profile_columns(orders, cols, exact=False)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.debug.maxToStringFields")
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    # approx counts land within HLL++ tolerance of exact
    exact_rows = {r["col_name"]: r for r in profile_columns(orders, cols, exact=True).collect()}
    approx_rows = {r["col_name"]: r for r in profile_columns(orders, cols, exact=False).collect()}
    for name, _ in cols:
        e, a = exact_rows[name]["n_distinct"], approx_rows[name]["n_distinct"]
        assert abs(a - e) <= max(1, 0.15 * e)  # HLL++ rsd=0.05, 3-sigma
        assert exact_rows[name]["min_val"] == approx_rows[name]["min_val"]


def test_quantize_reconstruction_quality(spark):
    """int8 reconstruction must keep cosine >= 0.999 to the original
    for every vector (the bound that makes SQ8 usable for ANN)."""
    emb = load_tables(spark, SF_DIR)["embeddings"]
    worst = dequantize_cosine_error(emb).agg(F.min("cos_rec")).collect()[0][0]
    assert worst >= 0.999


def test_quantize_range_and_zero_vector(spark):
    emb = load_tables(spark, SF_DIR)["embeddings"]
    q = quantize_int8(emb)
    bad = q.where((F.col("q_max") > 127) | (F.col("q_min") < -127)).count()
    assert bad == 0
    # someone's max component hits exactly ±127 (scale definition)
    at_limit = q.where((F.col("q_max") == 127) | (F.col("q_min") == -127)).count()
    assert at_limit > 0
    zero = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    row = quantize_int8(zero).collect()[0]
    assert row["scale"] == 0.0 and row["q_sum"] == 0


def test_dense_ids_match_global_row_number(spark):
    """Distributed range-partition + offset plan must equal the
    single-task global row_number, and ids must be dense 1..n."""
    from sparklyclean_spark.operators.ids import dense_ids

    docs = load_tables(spark, SF_DIR)["documents"]
    out = dense_ids(docs, order_by=["lang", "doc_id"], num_partitions=7)
    n = docs.count()
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("row_id").alias("nd"),
        F.min("row_id").alias("mn"),
        F.max("row_id").alias("mx"),
    ).collect()[0]
    assert (stats["n"], stats["nd"], stats["mn"], stats["mx"]) == (n, n, 1, n)
    w = Window.orderBy("lang", "doc_id")
    expected = docs.select("doc_id", F.row_number().over(w).cast("bigint").alias("row_id"))
    mismatch = (
        out.select("doc_id", "row_id")
        .join(expected.withColumnRenamed("row_id", "exp"), "doc_id")
        .where(F.col("row_id") != F.col("exp"))
        .count()
    )
    assert mismatch == 0


def test_winsorize_bounds_and_flags(spark):
    from sparklyclean_spark.operators.outliers import winsorize

    orders = load_tables(spark, SF_DIR)["orders"]
    out = winsorize(orders, "o_totalprice", 0.05, 0.95, by=["o_orderpriority"])
    bad_clip = out.where(
        (F.col("o_totalprice_clipped") < F.col("clip_lo"))
        | (F.col("o_totalprice_clipped") > F.col("clip_hi"))
    ).count()
    assert bad_clip == 0
    # flags agree with raw value vs bounds
    bad_flag = out.where(
        F.col("is_outlier")
        != ((F.col("o_totalprice") < F.col("clip_lo")) | (F.col("o_totalprice") > F.col("clip_hi")))
    ).count()
    assert bad_flag == 0
    # ~10% flagged at a 5/95 band (loose: 2-25%)
    n = out.count()
    flagged = out.where("is_outlier").count()
    assert 0.02 * n <= flagged <= 0.25 * n
    # approx path: rank accuracy, not value distance (the sketch
    # returns an actual element; tail value gaps can be wide)
    approx = winsorize(orders, "o_totalprice", 0.05, 0.95, by=["o_orderpriority"], exact=False)
    ranks = (
        approx.groupBy("o_orderpriority")
        .agg(
            (F.sum((F.col("o_totalprice") < F.col("clip_lo")).cast("int")) / F.count(F.lit(1))).alias("below"),
            (F.sum((F.col("o_totalprice") > F.col("clip_hi")).cast("int")) / F.count(F.lit(1))).alias("above"),
        )
        .collect()
    )
    for r in ranks:
        assert r["below"] <= 0.10 and r["above"] <= 0.10


def test_pack_sequences_contract(spark):
    """Distributed prefix sum == single-task window; bins contiguous,
    each bin's content starts under budget."""
    from sparklyclean_spark.functions import text as T
    from sparklyclean_spark.operators.packing import pack_sequences

    docs = load_tables(spark, SF_DIR)["documents"].withColumn(
        "n_tokens", T.token_count("text").cast("bigint")
    )
    out = pack_sequences(docs, "n_tokens", order_by=["doc_id"], budget=512, num_partitions=7)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    expected = docs.select(
        "doc_id", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("exp")
    )
    mismatch = (
        out.join(expected, "doc_id").where(F.col("cum_before") != F.col("exp")).count()
    )
    assert mismatch == 0
    # every doc STARTS within its bin's budget; bin ids are contiguous
    # here because no document exceeds the 512-token budget (an
    # oversized doc legitimately leaves start-empty grid cells — see
    # packing.py docstring)
    assert docs.where(F.col("n_tokens") > 512).count() == 0
    assert out.where((F.col("bin_offset") < 0) | (F.col("bin_offset") >= 512)).count() == 0
    bins = sorted(r["bin_id"] for r in out.select("bin_id").distinct().collect())
    assert bins == list(range(len(bins)))


def test_prefix_sum_deterministic_under_aqe(spark):
    """Repeat-run stability of the shared two-phase prefix sum
    (``ranged_with_offsets``): bucket ids must be a pure function of
    row data. The earlier ``spark_partition_id()`` formulation let AQE
    coalesce the offsets-aggregate branch and the join-probe branch
    differently, flipping values across executions (the r3/r4 driver
    flake on pack_training_sequences). Five executions each, AQE on,
    must hash identically — and exercise BOTH bucket paths: dense_ids
    on (lang, doc_id) hits the exact low-cardinality index + numeric
    sub-bucket path; pack on doc_id hits the pure range-bounds path."""
    from sparklyclean_spark.functions import text as T
    from sparklyclean_spark.operators.ids import dense_ids
    from sparklyclean_spark.operators.packing import pack_sequences

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    docs = load_tables(spark, SF_DIR)["documents"]
    sized = docs.withColumn("n_tokens", T.token_count("text").cast("bigint"))

    def result_hash(df):
        return df.agg(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in sorted(df.columns)])).alias("h")
        ).collect()[0]["h"]

    dense_hashes = {
        result_hash(dense_ids(docs, order_by=["lang", "doc_id"], num_partitions=7))
        for _ in range(5)
    }
    assert len(dense_hashes) == 1
    pack_hashes = {
        result_hash(
            pack_sequences(sized, "n_tokens", order_by=["doc_id"], budget=512, num_partitions=7)
        )
        for _ in range(5)
    }
    assert len(pack_hashes) == 1


def test_new_operators_handle_empty_input(spark):
    """Empty-relation safety: no operator may throw or invent rows."""
    from sparklyclean_spark.operators.cdc import latest_by_key as lbk
    from sparklyclean_spark.operators.ids import dense_ids
    from sparklyclean_spark.operators.outliers import winsorize
    from sparklyclean_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert chunk_dedup(docs).count() == 0
    assert dense_ids(docs, ["doc_id"]).count() == 0
    sized = docs.withColumn("n", F.lit(1).cast("bigint"))
    assert pack_sequences(sized, "n", ["doc_id"], 100).count() == 0
    ev = spark.createDataFrame([], "k string, ts timestamp, event_id long, value double")
    assert lbk(ev, ["k"], ["ts", "event_id"], ["value"]).count() == 0
    assert winsorize(ev, "value", by=["k"]).count() == 0

    # round-5 operators
    from sparklyclean_spark.operators.decontam import source_overlap_matrix
    from sparklyclean_spark.operators.lateness import out_of_order_stats
    from sparklyclean_spark.operators.outliers import quantile_bins
    from sparklyclean_spark.operators.packing import pack_bins_greedy
    from sparklyclean_spark.operators.pii import k_anonymity_audit
    from sparklyclean_spark.operators.skew import key_profile
    from sparklyclean_spark.operators.text_analysis import (
        bm25_scores,
        unigram_cross_entropy,
    )

    assert bm25_scores(docs, ["x"]).count() == 0
    assert unigram_cross_entropy(docs).count() == 0
    sdocs = spark.createDataFrame([], "doc_id long, source string, text string")
    assert source_overlap_matrix(sdocs).count() == 0
    ev2 = spark.createDataFrame(
        [], "user_id long, event_id long, ts timestamp_ntz"
    )
    assert out_of_order_stats(ev2).count() == 0
    assert k_anonymity_audit(ev, ["k"], k=3).count() == 0
    assert key_profile(ev, ["k"]).count() == 0
    assert quantile_bins(ev, "value", 4, by=["k"]).count() == 0
    assert pack_bins_greedy(sized, "n", ["doc_id"], 100).count() == 0


def test_winsorize_preserves_null_group_rows(spark):
    """Rows whose group key is NULL must be clipped against the NULL
    group's bounds, not silently dropped (null-safe bounds join)."""
    from sparklyclean_spark.operators.outliers import winsorize

    rows = [(None, float(v)) for v in range(1, 11)] + [("a", float(v)) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = winsorize(df, "v", 0.1, 0.9, by=["k"])
    assert out.count() == 20
    null_rows = out.where(F.col("k").isNull())
    assert null_rows.count() == 10
    assert null_rows.where(F.col("clip_lo").isNull()).count() == 0


def test_resample_ffill_contract(spark):
    """Grid is contiguous per key at the interval stride; observed
    buckets carry the bucket's last value (by ts, event_id); gap rows
    repeat the previous observed value."""
    from datetime import datetime

    from sparklyclean_spark.operators.resample import resample_ffill

    ev = spark.createDataFrame(
        [
            ("u1", datetime(2024, 1, 1, 0, 10), 1, 10.0),
            ("u1", datetime(2024, 1, 1, 0, 50), 2, 11.0),  # same bucket, later
            ("u1", datetime(2024, 1, 1, 3, 5), 3, 12.0),   # 2-bucket gap
            ("u2", datetime(2024, 1, 1, 5, 0), 4, 99.0),   # single observation
        ],
        "user_id string, ts timestamp, event_id long, value double",
    )
    out = resample_ffill(ev, ["user_id"], "ts", "value", "1 hour", "event_id")
    rows = {
        (r["user_id"], r["bucket_ts"].hour): (r["value"], r["is_observed"])
        for r in out.collect()
    }
    assert rows[("u1", 0)] == (11.0, True)   # last-in-bucket wins
    assert rows[("u1", 1)] == (11.0, False)  # gap: carried forward
    assert rows[("u1", 2)] == (11.0, False)
    assert rows[("u1", 3)] == (12.0, True)
    assert rows[("u2", 5)] == (99.0, True)
    assert len(rows) == 5  # contiguous grids only, no global padding


def test_pack_prefix_sum_property(spark):
    """Randomized differential check of the distributed prefix sum:
    pack_sequences must equal the driver-computed exclusive prefix sum
    / grid-cell math for arbitrary sizes (incl. zeros and docs larger
    than the budget), budgets, and partition counts."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sparklyclean_spark.operators.packing import pack_sequences

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        sizes=st.lists(st.integers(min_value=0, max_value=999), min_size=1, max_size=120),
        budget=st.integers(min_value=1, max_value=700),
        nparts=st.integers(min_value=1, max_value=9),
    )
    def check(sizes, budget, nparts):
        df = spark.createDataFrame(list(enumerate(sizes)), "i long, n long")
        got = {
            r["i"]: (r["cum_before"], r["bin_id"], r["bin_offset"])
            for r in pack_sequences(df, "n", ["i"], budget, nparts).collect()
        }
        cum = 0
        for i, size in enumerate(sizes):
            assert got[i] == (cum, cum // budget, cum % budget), (i, size, budget, nparts)
            cum += size

    check()


def test_quantile_bins_mass_and_order(spark):
    """Decile bins: ~equal mass per bin within each group, bins are
    monotone in the value, and NULL values get NULL bins."""
    from sparklyclean_spark.operators.outliers import quantile_bins

    orders = load_tables(spark, SF_DIR)["orders"]
    out = quantile_bins(orders, "o_totalprice", 10, by=["o_orderpriority"])
    # mass: every (group, bin) holds 5-15% of its group (exact deciles
    # jitter with interpolation + ties)
    per = out.groupBy("o_orderpriority", "o_totalprice_bin").count()
    tot = out.groupBy("o_orderpriority").count().withColumnRenamed("count", "n")
    frac = per.join(tot, "o_orderpriority").selectExpr(
        "o_totalprice_bin", "count / n AS f"
    )
    bad = frac.where("f < 0.05 OR f > 0.15").count()
    assert bad == 0
    assert out.selectExpr("max(o_totalprice_bin)").collect()[0][0] == 10
    assert out.selectExpr("min(o_totalprice_bin)").collect()[0][0] == 1
    # monotone: within a group, a higher bin never holds a lower value
    agg = out.groupBy("o_orderpriority", "o_totalprice_bin").agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice_bin")
    crossed = (
        agg.withColumn("prev_hi", F.lag("hi").over(w))
        .where(F.col("prev_hi").isNotNull() & (F.col("lo") < F.col("prev_hi")))
        .count()
    )
    assert crossed == 0
    # null handling
    nulls = spark.createDataFrame([(1, None)], "g int, v double")
    got = quantile_bins(nulls, "v", 4).collect()[0]["v_bin"]
    assert got is None


def test_pack_bins_greedy_matches_sequential_model(spark):
    """Per shard, the packing must equal a single-threaded greedy fill
    in the same order; no bin exceeds capacity unless it holds exactly
    one oversized doc; determinism across 3 runs."""
    from sparklyclean_spark.functions import text as T
    from sparklyclean_spark.operators.packing import pack_bins_greedy

    docs = load_tables(spark, SF_DIR)["documents"].withColumn(
        "n_tokens", T.token_count("text").cast("bigint")
    )
    cap = 512
    out = pack_bins_greedy(docs, "n_tokens", ["doc_id"], capacity=cap, n_shards=4)
    rows = out.select("doc_id", "n_tokens", "bin_id", "bin_fill").collect()
    assert len(rows) == docs.count()

    # capacity invariant
    fills = out.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    over = fills.where((F.col("tot") > cap) & (F.col("n") > 1)).count()
    assert over == 0
    # bin_fill column equals the true bin total
    joined = out.join(fills, "bin_id").where(F.col("bin_fill") != F.col("tot"))
    assert joined.count() == 0

    # differential: regroup by shard (bin_id >> 32) and replay greedy
    import collections

    by_shard = collections.defaultdict(list)
    for r in rows:
        by_shard[r["bin_id"] >> 32].append((r["doc_id"], r["n_tokens"], r["bin_id"]))
    for shard, items in by_shard.items():
        items.sort()
        local, fill = 0, 0
        for doc_id, n, got_bin in items:
            if fill > 0 and fill + n > cap:
                local += 1
                fill = 0
            fill += n
            assert got_bin == (shard << 32) + local, (shard, doc_id)

    # determinism
    h = {
        tuple(sorted((r["doc_id"], r["bin_id"]) for r in
              pack_bins_greedy(docs, "n_tokens", ["doc_id"], capacity=cap,
                               n_shards=4).select("doc_id", "bin_id").collect()))
        for _ in range(3)
    }
    assert len(h) == 1


def test_standardize_model_and_null_group(spark):
    """z-scores vs a hand model; zero-variance group yields NULL z;
    NULL-group rows standardized against their own group."""
    import statistics

    from sparklyclean_spark.operators.outliers import standardize

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 5.0),
            (None, 10.0), (None, 20.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = standardize(df, "v", by=["k"]).collect()
    assert len(out) == 7
    got = {(r["k"], r["v"]): r["v_z"] for r in out}
    sd_a = statistics.stdev([1.0, 2.0, 3.0])
    assert got[("a", 1.0)] == round((1.0 - 2.0) / sd_a, 4)
    assert got[("b", 5.0)] is None  # zero variance
    sd_n = statistics.stdev([10.0, 20.0])
    assert got[(None, 10.0)] == round((10.0 - 15.0) / sd_n, 4)


def test_quantize_ragged_and_empty_vectors(spark):
    """The Arrow digest path must degrade gracefully on empty or
    ragged embedding arrays (np.stack would crash the task)."""
    df = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, []), (3, [3.0, 1.0, -4.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # empty vector: NULL scale/q_min/q_max (Column-tier contract —
    # array_max/array_min of an empty array are NULL), q_sum 0
    assert rows[2]["scale"] is None and rows[2]["q_sum"] == 0
    assert rows[2]["q_min"] is None and rows[2]["q_max"] is None
    assert rows[1]["q_min"] == -127  # -2 is max|x| for row 1
    assert rows[3]["q_min"] == -127


def test_l2_normalize_pandas_parity_and_plan(spark):
    """The Arrow batch tier must (a) match the Column tier within
    1e-9 (including zero-vector passthrough and ragged lengths) and
    (b) contain NO interpreted `transform` HOF in its physical plan —
    the hot-path guarantee for kNN/index-build preprocessing."""
    from sparklyclean_spark.functions.vectors import l2_normalize, l2_normalize_pandas

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 2.0, 2.0]), (4, []),
         (5, None)],
        "vec_id long, embedding array<double>",
    )
    batch = df.select("vec_id", l2_normalize_pandas(F.col("embedding")).alias("nv"))
    col = df.select("vec_id", l2_normalize(F.col("embedding")).alias("nv"))
    b = {r["vec_id"]: r["nv"] for r in batch.collect()}
    c = {r["vec_id"]: r["nv"] for r in col.collect()}
    assert set(b) == set(c)
    for k in b:
        if b[k] is None or c[k] is None:
            assert b[k] == c[k]
            continue
        assert len(b[k]) == len(c[k])
        assert all(abs(x - y) < 1e-9 for x, y in zip(b[k], c[k]))
    assert b[2] == [0.0, 0.0]  # zero vector passes through
    assert b[4] == []
    assert b[5] is None  # NULL array stays NULL (Column-tier parity)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "transform(" not in plan, "interpreted HOF leaked into the hot path"
    col_plan = col._jdf.queryExecution().executedPlan().toString()
    assert "transform(" in col_plan  # the oracle tier is the HOF one


def test_l2_normalize_unit_and_zero(spark):
    from sparklyclean_spark.functions.vectors import l2_normalize, norm

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = {r["vec_id"]: r for r in df.select(
        "vec_id",
        l2_normalize(F.col("embedding")).alias("nv"),
        F.round(norm(l2_normalize(F.col("embedding"))), 9).alias("n"),
    ).collect()}
    assert out[1]["nv"] == [0.6, 0.8] and out[1]["n"] == 1.0
    assert out[2]["nv"] == [0.0, 0.0] and out[2]["n"] == 0.0
