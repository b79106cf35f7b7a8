"""transformWithStateInPandas lifetime-feature maintainer: final
emitted state per key must equal the batch aggregate over the same
data, across multiple micro-batches (state survives batch boundaries
in the RocksDB store)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

def test_plan_builds_without_execution(spark, tmp_path_factory):
    """Plan construction + analysis (schema resolution, state schema
    serialization) is protobuf-free — only execution needs the wire
    protocol. Always runs."""
    path = str(tmp_path_factory.mktemp("feat_plan"))
    spark.createDataFrame([], SCHEMA).write.mode("overwrite").parquet(path)
    out = streaming_lifetime_features(spark, path, SCHEMA)
    assert out.isStreaming
    assert out.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,sum_value:double,last_ts:timestamp>"
    )

from sparklyclean_spark.streaming.feature_state import streaming_lifetime_features

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, value double"

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _write_batches(spark, base):
    """Three files -> three micro-batches (maxFilesPerTrigger=1), with
    users recurring across batches so state must carry over."""
    rows_by_file = [
        [(0, "2024-01-01 00:00:00", 1, 2.0), (1, "2024-01-01 00:01:00", 2, 3.0)],
        [(2, "2024-01-01 00:02:00", 1, 5.0), (3, "2024-01-01 00:03:00", 3, 7.0)],
        [(4, "2024-01-01 00:04:00", 1, 11.0), (5, "2024-01-01 00:05:00", 2, 13.0)],
    ]
    for i, rows in enumerate(rows_by_file):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("overwrite").parquet(f"{base}/f{i}")
    # streamable dir = flat files
    import glob
    import shutil

    for i in range(len(rows_by_file)):
        (src,) = glob.glob(f"{base}/f{i}/part-*.parquet")
        shutil.copy(src, f"{base}/batch_{i}.parquet")
        shutil.rmtree(f"{base}/f{i}")
    return base


@pytest.mark.needs_protobuf
def test_lifetime_features_match_batch(spark, tmp_path_factory):
    path = _write_batches(spark, str(tmp_path_factory.mktemp("feat_stream")))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    try:
        out = streaming_lifetime_features(spark, path, SCHEMA)
        assert out.isStreaming
        query = (
            out.writeStream.format("memory")
            .queryName("lifetime_features")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    emitted = spark.sql("SELECT * FROM lifetime_features").collect()
    # update mode: one refresh per touched key per batch; final state =
    # the emission with the highest n_events per key (monotone counter)
    final = {}
    for r in emitted:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    # user 1 appears in all three batches -> refreshed three times
    assert sum(1 for r in emitted if r["user_id"] == 1) == 3

    batch = (
        spark.read.parquet(path)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    )
    expected = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_ts"]) for r in batch
    }
    got = {
        uid: (r["n_events"], r["sum_value"], r["last_ts"]) for uid, r in final.items()
    }
    assert got == expected
