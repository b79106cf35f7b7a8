"""Sources & sinks: Febrl CSV scan, labeled-points text round-trip,
overwrite writers (reference S1-S5, SURVEY.md §2.1)."""

from __future__ import annotations

import os

import pytest

from sparklyclean_spark.sources import (
    FEBRL_SCHEMA,
    jsonl_corrupt_lines,
    read_csv,
    read_febrl,
    read_jsonl,
    read_labeled_points,
    read_unlabeled_points,
    write_jsonl,
    write_labeled_points,
    write_csv,
    write_parquet,
)

FEBRL_CSV = """rec_id, given_name, surname, street_number, address_1, address_2, suburb, postcode, state, date_of_birth, age, phone_number, soc_sec_id, blocking_number
rec-1-org,   ruby, stigant, 142, allan street, eventide homes, tweed heads south, 3350, , 19520707, , 04 44507895, 2629656, 2
rec-1-dup-0,   ruby, stigand, 142, allan street, , tweed heads south, 3350, , 19520707, , 04 44507895, 2629656, 2
rec-2-org,   april, kokkotos, 95, feint street, homestead caravan park, kirribilli, 2630, , , 28, 04 49934213, 5751775, 0
"""


@pytest.fixture(scope="module")
def febrl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("febrl") / "people.csv"
    p.write_text(FEBRL_CSV)
    return str(p)


def test_febrl_scan_schema_and_trim(spark, febrl_path):
    df = read_febrl(spark, febrl_path)
    assert [f.name for f in df.schema.fields] == [f.name for f in FEBRL_SCHEMA.fields]
    rows = {r.rec_id: r for r in df.collect()}
    assert len(rows) == 3
    # header skipped, fields trimmed, empty strings preserved (not NULL)
    assert rows["rec-1-org"].given_name == "ruby"
    assert rows["rec-2-org"].date_of_birth == ""
    assert rows["rec-2-org"].age == "28"


def test_febrl_scan_parity_mode_keeps_padding(spark, febrl_path):
    df = read_febrl(spark, febrl_path, trim_fields=False)
    r = {x.rec_id: x for x in df.collect()}["rec-1-org"]
    # reference keeps the Febrl field padding (Util.scala:14-18) but
    # always trims the id (Util.scala:20-24)
    assert r.given_name.lstrip() != r.given_name
    assert r.rec_id == "rec-1-org"


def test_generic_csv_infer(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(p))
    assert dict(df.dtypes)["a"] == "int"
    assert df.count() == 2


def test_labeled_points_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [
            ("rec-1-org", "rec-1-dup-0", 1.0, [0.5, 1.0, 0.25]),
            ("rec-1-org", "rec-2-org", 0.0, [0.0, 0.125, 1.0]),
            ("rec-2-org", "rec-3-org", None, [1.0, 0.0, 0.75]),
        ],
        schema="id1 string, id2 string, label double, features array<double>",
    )
    path = os.path.join(str(tmp_path), "pts")
    write_labeled_points(src, path)

    # on-disk format is the reference's CSV line shape (Compare.scala:96)
    line = spark.read.text(path).orderBy("value").collect()[0].value
    assert line.startswith("rec-1-org, rec-1-dup-0, 1, 0.5, 1.0, 0.25")

    back = read_labeled_points(spark, path, n_features=3)
    got = {(r.id1, r.id2): (r.label, r.features) for r in back.collect()}
    assert got[("rec-1-org", "rec-1-dup-0")] == (1.0, [0.5, 1.0, 0.25])
    assert got[("rec-2-org", "rec-3-org")][0] is None  # "" sentinel -> NULL

    unlabeled = read_unlabeled_points(spark, path, n_features=0)
    assert unlabeled.columns == ["id1", "id2", "features"]


def test_overwrite_writers(spark, tmp_path):
    df = spark.range(5).withColumnRenamed("id", "x")
    pq = os.path.join(str(tmp_path), "pq")
    write_parquet(df, pq)
    write_parquet(df, pq)  # second write must not fail or double data
    assert spark.read.parquet(pq).count() == 5
    cs = os.path.join(str(tmp_path), "cs")
    write_csv(df, cs)
    assert read_csv(spark, cs).count() == 5


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour", "fr"), (3, None, "en")],
        schema="doc_id long, text string, lang string",
    )
    path = os.path.join(str(tmp_path), "docs_jsonl")
    write_jsonl(src, path)
    # explicit schema: no inference pass, stable column types
    back = read_jsonl(spark, path, schema="doc_id long, text string, lang string")
    got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    assert got == {1: ("hello world", "en"), 2: ("bonjour", "fr"), 3: (None, "en")}


def test_jsonl_malformed_handling(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nnot json at all\n{"doc_id": 2}\n')
    schema = "doc_id long, text string, _corrupt_record string"
    df = read_jsonl(spark, str(p), schema=schema)
    # SPARK-21610: must reference a data column alongside the corrupt
    # record, so materialize rows rather than count()
    assert len(jsonl_corrupt_lines(df).collect()) == 1
    dropped = read_jsonl(spark, str(p), schema="doc_id long, text string",
                         drop_malformed=True)
    assert {r.doc_id for r in dropped.collect()} == {1, 2}


def test_partitioned_parquet_prunes(spark, tmp_path):
    from sparklyclean_spark.plans import explain_formatted

    df = spark.range(100).selectExpr("id", "id % 4 AS part_key")
    pq = os.path.join(str(tmp_path), "part_pq")
    write_parquet(df, pq, partition_by=["part_key"])
    scan = spark.read.parquet(pq).where("part_key = 2")
    assert scan.count() == 25
    # directory-partitioned write + filter on the partition column ->
    # partition pruning at the source
    assert "PartitionFilters: [isnotnull(part_key" in explain_formatted(scan)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """The 100-TB lever: two tables bucketed+sorted on the join key
    with equal bucket counts must equi-join with ZERO Exchange —
    each task merges bucket i of both sides. (A local per-bucket Sort
    remains: since SPARK-28632 bucketed scans don't report output
    ordering unless the legacy flag is on; the shuffle is the 100-TB
    cost, the in-memory bucket sort is not.)"""
    from sparklyclean_spark.plans import explain_formatted
    from sparklyclean_spark.sources.bucketing import read_bucketed, write_bucketed

    facts = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    dims = spark.range(200).selectExpr("id AS k", "id + 7 AS w")
    write_bucketed(facts, "bkt_facts", 4, ["k"], path=os.path.join(str(tmp_path), "f"))
    write_bucketed(dims, "bkt_dims", 4, ["k"], path=os.path.join(str(tmp_path), "d"))
    try:
        j = read_bucketed(spark, "bkt_facts").join(
            read_bucketed(spark, "bkt_dims").hint("merge"), "k"
        )
        plan = explain_formatted(j)
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount: 4 out of 4" in plan
        assert j.count() == 200
        # same files via plain parquet read DO shuffle: the bucket
        # spec lives in the catalog, not the footers
        plain = spark.read.parquet(os.path.join(str(tmp_path), "f")).join(
            spark.read.parquet(os.path.join(str(tmp_path), "d")).hint("merge"), "k"
        )
        assert "Exchange" in explain_formatted(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_facts")
        spark.sql("DROP TABLE IF EXISTS bkt_dims")


def test_orc_roundtrip(spark, tmp_path):
    from sparklyclean_spark.sources.writers import read_orc, write_orc

    df = spark.range(100).selectExpr("id", "id % 3 AS k", "CAST(id AS STRING) AS s")
    path = os.path.join(str(tmp_path), "orc")
    write_orc(df, path, partition_by=["k"])
    back = read_orc(spark, path)
    assert back.count() == 100
    assert {r["k"] for r in back.select("k").distinct().collect()} == {0, 1, 2}
    # partition dirs exist -> read-side pruning is available
    assert any(d.startswith("k=") for d in os.listdir(path))


def test_compacted_parquet_targets_file_size(spark, tmp_path):
    from sparklyclean_spark.sources.writers import write_compacted_parquet

    df = spark.range(50_000).selectExpr(
        "id", "repeat(CAST(id AS STRING), 20) AS pad"
    ).repartition(32)  # simulate a post-shuffle many-partition plan
    path = os.path.join(str(tmp_path), "compact")
    n_files = write_compacted_parquet(df, path, target_file_bytes=256 * 1024)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == n_files
    assert n_files < 32  # compaction actually reduced the file count
    total = sum(os.path.getsize(os.path.join(path, f)) for f in files)
    # each file lands within ~3x of target on either side
    per_file = total / n_files
    assert 256 * 1024 / 3 <= per_file <= 256 * 1024 * 3
    from pyspark.sql import functions as F

    assert spark.read.parquet(path).agg(F.count("*")).collect()[0][0] == 50_000


def test_compacted_parquet_sizing_survives_clustered_head(spark, tmp_path):
    """Adversarial layout for a limit()-based sizer: the FIRST
    partitions hold ultra-compressible constant rows, the tail holds
    incompressible ones. A head slice would estimate near-zero bytes
    per row and emit one oversized file; the seeded uniform sample
    must still land the per-file size near target."""
    from pyspark.sql import functions as F

    from sparklyclean_spark.sources.writers import write_compacted_parquet

    n = 40_000
    df = (
        spark.range(n)
        .withColumn(
            "pad",
            F.when(F.col("id") < n // 2, F.lit("x" * 200)).otherwise(
                # incompressible tail: per-row distinct digest chain
                F.sha2(F.concat(F.col("id").cast("string"), F.lit("salt")), 512)
            ),
        )
        # sortWithinPartitions after a range partition puts ALL the
        # constant rows in the head partitions — the limit() trap
        .repartitionByRange(16, "id")
    )
    path = os.path.join(str(tmp_path), "clustered")
    n_files = write_compacted_parquet(df, path, target_file_bytes=128 * 1024)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == n_files
    total = sum(os.path.getsize(os.path.join(path, f)) for f in files)
    per_file = total / n_files
    # head-slice sizing measured ~0 bytes/row -> 1 giant file; the
    # uniform sample must keep files within 3x of target
    assert n_files > 1
    assert 128 * 1024 / 3 <= per_file <= 128 * 1024 * 3
    assert spark.read.parquet(path).agg(F.count("*")).collect()[0][0] == n
