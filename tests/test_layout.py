"""Z-order layout: Morton key correctness + the data-skipping payoff
(selective predicates touch few files of a z-ordered write)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparklyclean_spark.sources.layout import (
    with_zorder_key,
    write_zordered,
    zorder_key_from_ranks,
)


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_interleave_matches_reference(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    out = df.withColumn(
        "zkey", zorder_key_from_ranks([F.col("x"), F.col("y")], bits=4)
    ).collect()
    for r in out:
        assert r["zkey"] == _morton(r["x"], r["y"], 4)


def test_scaling_hits_rank_extremes(spark):
    df = spark.createDataFrame([(0.0, 100.0), (50.0, 150.0), (100.0, 200.0)], "a double, b double")
    keyed = with_zorder_key(df, ["a", "b"], bits=8)
    got = {r["a"]: r["zkey"] for r in keyed.collect()}
    # min row -> rank (0,0) -> key 0; max row -> rank (255,255) -> all bits set
    assert got[0.0] == 0
    assert got[100.0] == (1 << 16) - 1


def test_zorder_write_skips_files_on_either_dimension(spark, tmp_path_factory):
    """200x200 grid into 16 z-ordered files: a selective predicate on
    EITHER dimension must land in a small subset of files (the min/max
    footer-pruning payoff). A linear sort would spread any y-predicate
    across every file."""
    base = str(tmp_path_factory.mktemp("zorder"))
    grid = (
        spark.range(200 * 200)
        .select(
            (F.col("id") % 200).alias("x"),
            (F.col("id") / 200).cast("bigint").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    write_zordered(grid, base + "/z", ["x", "y"], num_files=16, bits=8)

    def files_touched(df):
        return (
            df.select(F.input_file_name().alias("f")).distinct().count()
        )

    z = spark.read.parquet(base + "/z")
    total = files_touched(z)
    assert total == 16
    # 10-wide band on each dimension: 5% of rows
    fx = files_touched(z.where((F.col("x") >= 100) & (F.col("x") < 110)))
    fy = files_touched(z.where((F.col("y") >= 100) & (F.col("y") < 110)))
    assert fx <= 8 and fy <= 8, (fx, fy)
    # a 2-D box is tighter still
    fbox = files_touched(
        z.where(
            (F.col("x") >= 100) & (F.col("x") < 110)
            & (F.col("y") >= 100) & (F.col("y") < 110)
        )
    )
    assert fbox <= 4, fbox

    # contrast: x-sorted layout scatters y-predicates over ALL files
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(base + "/linear")
    lin = spark.read.parquet(base + "/linear")
    fy_lin = files_touched(lin.where((F.col("y") >= 100) & (F.col("y") < 110)))
    assert fy_lin == 16
