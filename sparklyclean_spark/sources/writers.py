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
