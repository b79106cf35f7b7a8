"""Streaming CDC apply (foreachBatch MERGE): the maintained snapshot
must equal the sequential application of every change batch, and a
replayed batch id must be idempotent."""

from __future__ import annotations

from sparklyclean_spark.streaming.upsert import ParquetUpsertSink, streaming_upsert

SCHEMA = "k bigint, v string, ver int, op string"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_upsert_matches_sequential_model(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("upsert")
    src, tgt, ckpt = str(root / "src"), str(root / "tgt"), str(root / "ckpt")

    batches = [
        [(1, "a", 1, "U"), (2, "b", 1, "U"), (3, "c", 1, "U")],
        # in-batch multi-version: key 2 updated then deleted (ver order)
        [(2, "b2", 2, "U"), (2, "x", 3, "D"), (4, "d", 2, "U")],
        [(1, "a3", 4, "U"), (5, "e", 4, "U"), (3, "y", 4, "D")],
    ]
    model: dict[int, str] = {}
    for b in batches:
        for k, v, _ver, op in sorted(b, key=lambda r: r[2]):
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = v

    sink = ParquetUpsertSink(spark, tgt, keys=["k"], order_cols=["ver"])
    for b in batches:
        _write_batch(spark, src, b)
        q = streaming_upsert(spark, src, SCHEMA, sink, ckpt)
        q.awaitTermination(120)

    snap = sink.snapshot()
    assert snap is not None
    assert {(r.k, r.v) for r in snap.collect()} == set(model.items())
    assert sorted(snap.columns) == ["k", "v"]


def test_replayed_batch_is_idempotent(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("upsert2")
    tgt = str(root / "tgt")
    sink = ParquetUpsertSink(spark, tgt, keys=["k"], order_cols=["ver"])
    df = spark.createDataFrame([(1, "a", 1, "U"), (2, "b", 1, "U")], SCHEMA)
    sink.apply(df, 0)
    first = {(r.k, r.v) for r in sink.snapshot().collect()}
    # at-least-once retry of the SAME batch id must not duplicate rows
    # (the bootstrap branch would union otherwise) — versioned dir wins
    sink.apply(df, 0)
    assert {(r.k, r.v) for r in sink.snapshot().collect()} == first == {
        (1, "a"),
        (2, "b"),
    }
