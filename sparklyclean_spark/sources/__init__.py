"""Sources & sinks: schema'd CSV scans (incl. the reference's Febrl
dataset layout), the labeled-points text interchange format, and
overwrite-mode writers. Reference operators S1-S5 (SURVEY.md §2.1)."""

from sparklyclean_spark.sources.csv import FEBRL_SCHEMA, read_csv, read_febrl
from sparklyclean_spark.sources.bucketing import read_bucketed, write_bucketed
from sparklyclean_spark.sources.jsonl import (
    jsonl_corrupt_lines,
    read_jsonl,
    write_jsonl,
)
from sparklyclean_spark.sources.points import (
    read_labeled_points,
    read_unlabeled_points,
    write_labeled_points,
)
from sparklyclean_spark.sources.writers import (
    read_orc,
    write_compacted_parquet,
    write_csv,
    write_orc,
    write_parquet,
    write_text,
)

__all__ = [
    "FEBRL_SCHEMA",
    "read_csv",
    "read_febrl",
    "read_jsonl",
    "read_bucketed",
    "write_bucketed",
    "write_jsonl",
    "jsonl_corrupt_lines",
    "read_labeled_points",
    "read_unlabeled_points",
    "write_labeled_points",
    "write_csv",
    "write_parquet",
    "write_text",
    "read_orc",
    "write_orc",
    "write_compacted_parquet",
]
