"""Bucketed parquet tables — pre-shuffled storage for co-located
joins. At 100 TB the single biggest join cost is the shuffle; if the
fact and dimension tables are written bucketed (and sorted) on the
join key with the same bucket count, every future equi-join on that
key plans with ZERO Exchange and ZERO Sort on both sides: each task
reads bucket i of both tables and merges. Pay the shuffle once at
write time, amortize it over every downstream query.

Spark specifics (all public behavior):
- bucketing metadata lives in the session catalog, so bucketed data
  must be written with ``saveAsTable`` (a plain ``.parquet(path)``
  write loses the bucket spec); pass ``path`` to keep the files
  external at a location you control.
- the reader must go through ``spark.table(name)`` — reading the
  same files with ``spark.read.parquet`` sees plain parquet.
- one file per (bucket, writing task) — repartition by the bucket
  key first so each bucket is one file.
- the join still plans a LOCAL per-bucket Sort: since SPARK-28632,
  bucketed scans don't advertise output ordering (multi-file buckets
  can't guarantee it) unless
  ``spark.sql.legacy.bucketedTableScan.outputOrdering`` is set. The
  Exchange is the network/disk cost that matters at 100 TB; the
  in-memory sorted-run merge is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and by default bucket-sorted)
    parquet table. One shuffle now; none on any later join/agg keyed
    on ``bucket_cols`` against a same-bucketed table."""
    # one file per bucket => the per-file sort survives and the join
    # needs no Sort node
    out = df.repartition(n_buckets, *bucket_cols)
    w = out.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for the bucket spec to reach the
    planner (``spark.read.parquet`` on the same files would not)."""
    return spark.table(table)
