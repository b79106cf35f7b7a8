"""Declarative data-quality constraint checking (Deequ-style).

A 100 TB ingest pipeline gates every batch on a constraint suite:
null-fraction, uniqueness, accepted values, ranges, regex shape,
referential integrity. The naive implementation runs one scan per
rule; at corpus scale that multiplies the dominant cost (the scan)
by the number of rules. This operator evaluates ALL row-level rules
in ONE aggregation over ONE scan — each rule is a
``sum(case when violated then 1 else 0 end)`` branch of the same
``agg`` so Catalyst fuses them into a single whole-stage-codegen
pass — and the only rules that touch a second table (foreign keys)
run as broadcast anti-join counts against the (small) dimension.

Uniqueness is the one rule that genuinely needs a shuffle (count
distinct over the key); it shares the same scan via the same agg
(Expand + two-level hash aggregate, map-side partial). For very wide
suites an ``approx=True`` mode swaps exact distinct for HLL++ so the
Expand multiplier disappears.

No reference counterpart (the reference validates nothing — SURVEY
§5); §2.10 training-data-pipeline surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint: ``name`` labels the output row, ``violated``
    is a boolean Column that is true for rows BREAKING the rule.
    NULL predicate results count as violations (a rule you cannot
    evaluate did not pass)."""

    name: str
    violated: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNull())


def accepted_values(col: str, values: list) -> Rule:
    # isin is NULL for NULL inputs -> coalesce makes NULL a violation
    return Rule(f"accepted_values_{col}", ~F.col(col).isin(values))


def in_range(col: str, lo=None, hi=None) -> Rule:
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(col) >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(col) <= F.lit(hi))
    return Rule(f"in_range_{col}", ~cond)


def matches(col: str, pattern: str) -> Rule:
    return Rule(f"matches_{col}", ~F.col(col).rlike(pattern))


@dataclass(frozen=True)
class UniqueRule:
    """Key uniqueness: violations = n_rows - n_distinct(key)."""

    cols: tuple[str, ...]

    @property
    def name(self) -> str:
        return "unique_" + "_".join(self.cols)


@dataclass(frozen=True)
class ForeignKeyRule:
    """Referential integrity: every non-null ``col`` value exists in
    ``dim[dim_col]``. Checked as a broadcast LEFT ANTI join count —
    the dimension is the small side by construction (that is what
    makes it a dimension), so the fact table never shuffles."""

    col: str
    dim: DataFrame = field(compare=False)
    dim_col: str = ""

    @property
    def name(self) -> str:
        return f"foreign_key_{self.col}"


def check_constraints(
    df: DataFrame,
    rules: list,
    approx_unique: bool = False,
) -> DataFrame:
    """Evaluate a constraint suite; returns one row per rule:
    ``(rule string, violations bigint, n_rows bigint, passed boolean)``.

    Row-level rules and uniqueness rules share ONE aggregation job
    (one scan); each FK rule adds one broadcast anti-join count over
    its own scan of the fact's key column only (column-pruned).
    """
    row_rules = [r for r in rules if isinstance(r, Rule)]
    uniq_rules = [r for r in rules if isinstance(r, UniqueRule)]
    fk_rules = [r for r in rules if isinstance(r, ForeignKeyRule)]

    aggs = [F.count(F.lit(1)).alias("_n")]
    for r in row_rules:
        # outer coalesce: sum over an EMPTY relation is NULL, and an
        # empty batch has zero violations, not unknown
        aggs.append(
            F.coalesce(
                F.sum(F.coalesce(r.violated, F.lit(True)).cast("bigint")), F.lit(0)
            ).alias(r.name)
        )
    for u in uniq_rules:
        key = [F.col(c) for c in u.cols]
        # NULL-key contract (both modes): a row with any NULL key
        # column counts as a violation. count_distinct(*cols) drops
        # any-NULL rows by SQL semantics; the approx twin must match,
        # so the struct is NULLed out for any-NULL keys (approx_
        # count_distinct ignores NULL inputs) — a bare struct would
        # count the NULL key as a distinct level and silently flip
        # passed on NULL-keyed data.
        nonnull = key[0].isNotNull()
        for c in key[1:]:
            nonnull = nonnull & c.isNotNull()
        nd = (
            F.approx_count_distinct(F.when(nonnull, F.struct(*key)))
            if approx_unique
            else F.count_distinct(*key)
        )
        aggs.append((F.count(F.lit(1)) - nd).alias(u.name))

    out = None
    if row_rules or uniq_rules:
        wide = df.agg(*aggs)
        # one row -> long form via inline(array(struct...)): stays in-plan
        pairs = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.col(r.name).cast("bigint").alias("violations"),
                )
                for r in row_rules + uniq_rules
            ]
        )
        out = wide.select(F.col("_n").alias("n_rows"), F.inline(pairs)).select(
            "rule", "violations", "n_rows"
        )

    if fk_rules:
        n_rows_df = df.agg(F.count(F.lit(1)).alias("n_rows"))
        for fk in fk_rules:
            misses = (
                df.select(fk.col)
                .where(F.col(fk.col).isNotNull())
                .join(
                    F.broadcast(fk.dim.select(F.col(fk.dim_col).alias(fk.col)).distinct()),
                    fk.col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("violations"))
                .select(F.lit(fk.name).alias("rule"), "violations")
            )
            fk_row = misses.crossJoin(F.broadcast(n_rows_df))
            # FK-only suites start here — inline(array()) over zero
            # structs is an AnalysisException, so `out` may be None
            out = fk_row if out is None else out.unionByName(fk_row)

    if out is None:
        raise ValueError("check_constraints needs at least one rule")
    return out.withColumn("passed", F.col("violations") == 0)


def fk_integrity_audit(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table referential-integrity audit: one row per foreign-key
    edge ``(name, child_df, fk_col, parent_df, pk_col)`` with the child
    row count, NULL-key count, orphan count (non-null keys absent from
    the parent), and the orphan fraction (floor contract).

    This is the schema-wide sibling of ``ForeignKeyRule``: a lakehouse
    ingest gate runs it over the whole star schema in one job and
    alerts on any non-zero orphan row.

    Scale shape: each edge column-prunes the child to the key, counts
    NULLs map-side, and counts orphans via a LEFT ANTI join against
    the DISTINCT-projected parent key — AQE picks broadcast when the
    parent key set is small (dimensions) and a shuffled anti-join when
    it is not (fact-to-fact edges); nothing ever widens beyond the key
    columns. The per-edge single-row aggregates union into a bounded
    O(#edges) result.
    """
    from sparklyclean_spark.functions.rounding import ratio4

    outs = []
    for name, child, fk, parent, pk in edges:
        keys = child.select(F.col(fk).alias("_fk"))
        base = keys.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.col("_fk").isNull().cast("bigint")).alias("n_null_fk"),
        )
        orphans = (
            keys.where(F.col("_fk").isNotNull())
            .join(
                parent.select(F.col(pk).alias("_fk")).distinct(),
                "_fk",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        outs.append(
            base.join(orphans).select(
                F.lit(name).alias("fk"),
                F.col("n_child").cast("bigint").alias("n_child"),
                F.col("n_null_fk").cast("bigint").alias("n_null_fk"),
                F.col("n_orphans").cast("bigint").alias("n_orphans"),
                ratio4("n_orphans", "n_child").alias("orphan_frac"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def freshness_audit(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    stale_after_hours: int = 24,
) -> DataFrame:
    """Per-group data-freshness audit: latest event time, staleness
    relative to the NEWEST event anywhere in the batch (integer
    MICROSECONDS — the engine-portable granularity), event count in
    the group's last 24 h, and a ``stale`` flag. The standing ingest
    monitor: a source whose lag against the corpus watermark keeps
    growing has silently stopped delivering.

    All comparisons are exact µs integers; no floats anywhere.

    Scale: one map-side-combinable hash agg per group + a 1-row
    global max broadcast back (the accepted 1-row cross-join shape).
    """
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(ts_col).alias("latest_ts"),
    )
    glob = df.agg(F.max(ts_col).alias("_gmax"))
    last24 = (
        df.join(F.broadcast(glob))
        .where(
            F.timestamp_diff("MICROSECOND", F.col(ts_col), F.col("_gmax"))
            <= F.lit(86_400_000_000).cast("bigint")
        )
        .groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_last_24h"))
    )
    lag_us = F.timestamp_diff("MICROSECOND", F.col("latest_ts"), F.col("_gmax"))
    # null-safe join key: a NULL group (untagged rows) must still get
    # its last-24h count — a plain equality join drops it to 0
    l24 = F.broadcast(last24.withColumnRenamed("grp", "_g24"))
    return (
        per.join(F.broadcast(glob))
        .join(l24, F.col("grp").eqNullSafe(F.col("_g24")), "left")
        .drop("_g24")
        .select(
            F.col("grp").alias(group_col),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("latest_ts"),
            lag_us.cast("bigint").alias("lag_us"),
            F.coalesce("n_last_24h", F.lit(0)).cast("bigint").alias("n_last_24h"),
            (lag_us > F.lit(stale_after_hours * 3_600_000_000)).alias("stale"),
        )
    )
