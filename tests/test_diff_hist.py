"""Unit tests for snapshot reconciliation (diff) and fixed-width
histograms."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparklyclean_spark.operators.diff import diff_rows, diff_summary
from sparklyclean_spark.operators.profile import histogram
from sparklyclean_spark.plans.audit import explain_str


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k int, s string, v double",
    )
    right = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 99.0), (3, "c", None), (5, "e", 5.0)],
        "k int, s string, v double",
    )
    return left, right


def test_diff_statuses(spark):
    left, right = _sides(spark)
    got = {r["k"]: r["status"] for r in diff_rows(left, right, ["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL == NULL for change detection
        4: "removed",
        5: "added",
    }
    summary = {r["status"]: r["n"] for r in diff_summary(left, right, ["k"]).collect()}
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_diff_compare_cols_subset(spark):
    left, right = _sides(spark)
    # comparing only the string column, the v-change at k=2 vanishes
    got = {
        r["k"]: r["status"]
        for r in diff_rows(left, right, ["k"], compare_cols=["s"]).collect()
    }
    assert got[2] == "unchanged"


def test_diff_join_carries_hash_not_payload(spark):
    """The exchanges feeding the full-outer join must move (key, hash)
    only — the payload columns are reduced to xxhash64 map-side."""
    left, right = _sides(spark)
    plan = explain_str(diff_rows(left, right, ["k"]), "simple")
    assert "xxhash64" in plan
    # payload columns must not appear in the join operator's output
    join_line = next(l for l in plan.splitlines() if "Join" in l and "full" in l.lower())
    assert "s#" not in join_line and "v#" not in join_line


def test_histogram_buckets(spark):
    df = spark.createDataFrame(
        [("g", -1.0), ("g", 0.0), ("g", 5.0), ("g", 9.99), ("g", 10.0), ("g", None)],
        "grp string, v double",
    )
    rows = {
        r["bucket"]: (r["bucket_lo"], r["bucket_hi"], r["n"])
        for r in histogram(df, "v", 0.0, 10.0, 5, by=["grp"]).collect()
    }
    assert rows[0][2] == 1           # underflow (-1.0)
    assert rows[1] == (0.0, 2.0, 1)  # 0.0
    assert rows[3] == (4.0, 6.0, 1)  # 5.0
    assert rows[5] == (8.0, 10.0, 1)  # 9.99
    assert rows[6][2] == 1           # overflow (10.0 -> hi is exclusive)
    assert sum(v[2] for v in rows.values()) == 5  # NULL dropped


def test_histogram_global_no_group(spark):
    df = spark.range(100).select((F.col("id") % 10).cast("double").alias("v"))
    rows = histogram(df, "v", 0.0, 10.0, 10).collect()
    assert len(rows) == 10 and all(r["n"] == 10 for r in rows)
