"""JSON-Lines source/sink — the de-facto interchange format for
LLM training corpora (one JSON object per line, splittable, appends
cheaply). No reference counterpart (the reference reads CSV/text
only); this is part of the §2.10 training-data-pipeline surface.

Scale notes:
- READ: pass an explicit schema. Schema inference is a full extra
  pass over the data (at 100 TB that is a 100 TB pre-scan); with a
  schema the scan is one pass and column pruning still applies
  (JSON is row-major, so pruning saves parse time, not IO —
  convert to parquet early via ``write_parquet`` for anything
  re-read).
- Line-delimited mode (the default, ``multiLine=False``) keeps the
  input splittable: each 128 MB split parses independently. Never
  enable multiLine for corpus files — it forces one task per file.
- Malformed lines land in ``_corrupt_record`` (PERMISSIVE) instead
  of failing the job; ``dropMalformed`` is opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    drop_malformed: bool = False,
) -> DataFrame:
    """Read line-delimited JSON. ``schema`` may be a StructType or a
    DDL string ("doc_id long, text string"); None falls back to
    inference (fine for tests, wrong at scale — see module note)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if drop_malformed:
        reader = reader.option("mode", "DROPMALFORMED")
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write one JSON object per line (overwrite). Spark's json sink
    is line-delimited by default and writes one file per partition —
    parallel on both ends."""
    df.write.mode("overwrite").json(path)


def jsonl_corrupt_lines(df: DataFrame) -> DataFrame:
    """Filter helper: rows that failed to parse in PERMISSIVE mode
    (requires the read schema to include ``_corrupt_record string``).
    Spark disallows plans whose only referenced column is the corrupt
    record (SPARK-21610): select at least one data column downstream,
    or cache the parsed frame before counting."""
    return df.where(F.col("_corrupt_record").isNotNull())
