"""Blocking: map each record to one key per blocking function.

Re-expresses the reference's ``Util.getBKVs`` (``Util.scala:45-58``)
as a declarative column: a record's blocks are an
``array<struct<k:int, v:string>>`` where ``k`` is the blocking
function's priority (lower = higher priority, it doubles as the
exactly-once tiebreak, SURVEY.md §2.9 G3) and ``v`` the key value.
NULL keys become ``""`` for parity with the reference's null-safe
``""`` fallback.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BKV_TYPE = "array<struct<k:int,v:string>>"


@dataclass(frozen=True)
class BlockingRule:
    """One blocking function: ``priority`` (the BKV ``k``) and a key
    expression (column name or Column)."""

    priority: int
    expr: Column | str

    def value(self) -> Column:
        col = F.col(self.expr) if isinstance(self.expr, str) else self.expr
        return F.coalesce(col.cast("string"), F.lit(""))


def bkvs_column(rules: list[BlockingRule]) -> Column:
    """``array<struct<k,v>>`` of every blocking key for a row."""
    if not rules:
        raise ValueError("at least one BlockingRule required")
    priorities = [r.priority for r in rules]
    if len(set(priorities)) != len(priorities):
        raise ValueError(f"duplicate blocking priorities: {priorities}")
    return F.array(
        *[
            F.struct(F.lit(r.priority).cast("int").alias("k"), r.value().alias("v"))
            for r in sorted(rules, key=lambda r: r.priority)
        ]
    )


def with_block_keys(df: DataFrame, rules: list[BlockingRule]) -> DataFrame:
    """Attach the per-row block-key array as column ``bkvs``."""
    return df.withColumn("bkvs", bkvs_column(rules))


def explode_blocks(df: DataFrame, rules: list[BlockingRule]) -> DataFrame:
    """One output row per (record, blocking function): adds the scalar
    ``_bv<k>`` columns (for the exactly-once guard) plus exploded
    ``bk``/``bv``."""
    return (
        with_block_value_columns(df, rules)
        .withColumn(
            "_bkv",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.priority).cast("int").alias("k"),
                            F.col(bv_col(r.priority)).alias("v"),
                        )
                        for r in sorted(rules, key=lambda r: r.priority)
                    ]
                )
            ),
        )
        .withColumn("bk", F.col("_bkv.k"))
        .withColumn("bv", F.col("_bkv.v"))
        .drop("_bkv")
    )


def lowest_common_block(bkvs1: Column, bkvs2: Column) -> Column:
    """Smallest blocking-function number under which two records
    co-block — the pair is compared only there (``Util.scala:70-83``,
    ``Compare.scala:94,106``). Array form (higher-order functions are
    interpreted per pair — use the unrolled scalar guard below in hot
    paths)."""
    return F.array_min(F.transform(F.array_intersect(bkvs1, bkvs2), lambda x: x["k"]))


def bv_col(priority: int) -> str:
    """Name of the per-rule scalar block-value column."""
    return f"_bv{priority}"


def with_block_value_columns(df: DataFrame, rules: list[BlockingRule]) -> DataFrame:
    """One scalar string column per blocking rule (``_bv<k>``) — the
    codegen-friendly representation the pair guards use."""
    for r in rules:
        df = df.withColumn(bv_col(r.priority), r.value())
    return df


_NO_COMMON = 1 << 30


def lowest_common_block_scalar(
    rules: list[BlockingRule], t1: str = "t1_", t2: str = "t2_"
) -> Column:
    """Unrolled lowest-common-block over the ``_bv<k>`` columns of both
    sides: LEAST over rules of (k if values equal else sentinel).
    Plain when/least — stays inside whole-stage codegen (the array
    form costs ~0.1 ms/pair interpreted, which dominates pair
    generation)."""
    terms = [
        F.when(
            F.col(f"{t1}{bv_col(r.priority)}") == F.col(f"{t2}{bv_col(r.priority)}"),
            F.lit(r.priority),
        ).otherwise(F.lit(_NO_COMMON))
        for r in rules
    ]
    return terms[0] if len(terms) == 1 else F.least(*terms)
