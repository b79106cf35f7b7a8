"""Overwrite-mode sinks (reference S4: manual ``FileSystem.delete``
then ``saveAsTextFile`` at ``GenerateLabeledPoints.scala:103-107`` —
Spark's ``mode("overwrite")`` is the built-in equivalent).

Parquet is the default interchange format for anything that will be
re-read: columnar + statistics means the NEXT scan gets pushdown and
pruning; CSV/text exist for reference-format compatibility only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        # partition columns become directory keys -> partition pruning
        # on the read side for free
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_text(df: DataFrame, path: str) -> None:
    """Single ``value`` string column to text files."""
    df.write.mode("overwrite").text(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink (built-in vectorized reader/writer, same
    pushdown/pruning story as parquet — some lakes standardize on it)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_compacted_parquet(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sample_rows: int = 10_000,
) -> int:
    """Small-file-problem-aware sink: estimate the dataset's encoded
    size from a bounded sample, choose an output file count aiming at
    ``target_file_bytes`` per file, and write with exactly that many
    files. Returns the file count.

    Why it matters at 100 TB: a shuffle with 10k reduce partitions
    writing directly produces 10k files per job; downstream scans then
    pay per-file open/footer costs and the driver pays listing. The
    standard fix is exactly this estimate-then-coalesce pattern
    (Delta/Iceberg "optimize write"). Uses ``coalesce`` (no extra
    shuffle) when shrinking; ``repartition`` only when the plan has
    fewer partitions than wanted.

    The input plan is persisted for the duration of the call (sizing
    needs a count + a sample before the real write; without the
    persist an expensive upstream pipeline would recompute for each),
    then unpersisted.
    """
    import uuid

    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.sc().hadoopConfiguration()
    scratch = f"{path}__sizing_{uuid.uuid4().hex[:8]}"
    p = jvm.org.apache.hadoop.fs.Path(scratch)
    fs = p.getFileSystem(hconf)
    df = df.persist()
    try:
        n_rows = df.count()
        if n_rows == 0:
            df.coalesce(1).write.mode("overwrite").parquet(path)
            return 1
        # size from a seeded UNIFORM sample, not limit(): limit draws
        # from the first partition(s), and on clustered/sorted data that
        # slice's compression ratio can be wildly unrepresentative of
        # the whole dataset (e.g. a time-sorted log whose head is all
        # one tenant). sample() draws from every partition.
        if n_rows <= sample_rows:
            sample = df
            sampled_rows = n_rows
        else:
            frac = min(1.0, (sample_rows * 1.2) / n_rows)
            sample = df.sample(fraction=frac, seed=42).limit(sample_rows)
            sampled_rows = sample.count()
            if sampled_rows == 0:  # pathological tiny sample_rows arg
                sample = df.limit(min(sample_rows, n_rows))
                sampled_rows = min(sample_rows, n_rows)
        sample.coalesce(1).write.mode("overwrite").parquet(scratch)
        sampled_bytes = fs.getContentSummary(p).getLength()
        est_total = sampled_bytes * (n_rows / sampled_rows)
        n_files = max(1, int(est_total // target_file_bytes) + (1 if est_total % target_file_bytes else 0))
        cur = df.rdd.getNumPartitions()
        out = df.coalesce(n_files) if n_files <= cur else df.repartition(n_files)
        out.write.mode("overwrite").parquet(path)
        return n_files
    finally:
        df.unpersist()
        fs.delete(p, True)
