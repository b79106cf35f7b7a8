"""Dis-Dedup: skew-optimal load-balanced candidate-pair generation.

The distributed-deduplication scheme of Chu, Ilyas & Koutris (VLDB
2016) as implemented by the reference (``Setup.scala``,
``DisDedupMapper.scala``, ``DisDedupReducer.scala``), re-expressed
Spark-first:

* Block statistics = one DataFrame aggregation (reference A1-A4,
  ``Setup.scala:31-57``).
* Driver-side planning is O(#heavy blocks) only: blocks whose
  pairwise workload exceeds the random-assignment threshold
  ``tau = W/(3k ln k)`` (at most ~3k·ln k of them) are collected and
  planned; the long tail is assigned DISTRIBUTED-side via hash —
  unlike the reference, which collects every block to the driver
  (``Setup.scala:68-89``), this keeps the driver O(k log k) at 100 TB.
* Triangle fan-out (``DisDedupMapper.scala:13-51``): a block given
  ``k_i = l(l+1)/2`` cells replicates each row to ``l`` cells of an
  upper-triangular l×l grid; every anchor pair meets in exactly one
  cell. Anchors are ``xxhash64`` of the record id — deterministic and
  uniform, fixing the reference's shared-RNG closure bug (SURVEY.md
  §2.9 G6).
* Pair formation is two plain equi-joins on (bk, bv, cell) — L×R for
  off-diagonal cells, S self-join for diagonal cells — so the whole
  hot path is JVM-side sort-merge/hash join under whole-stage
  codegen; no Python per pair. The reference instead hand-rolls the
  shuffle + a streaming reducer (``DisDedupReducer.scala:13-67``);
  Catalyst's exchange + join is the idiomatic equivalent.
* Exactly-once across overlapping blockings: lowest-common-block
  guard (G3), identical to the naive path.

Result set is provably identical to
``pairs.candidate_pairs_naive`` (differential-tested); the value is
the bounded per-cell workload: no cell exceeds ~W/k comparisons no
matter how skewed the blocking keys are.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklyclean_spark.cache import tracked_persist
from sparklyclean_spark.operators.dedup.blocking import (
    BlockingRule,
    bv_col,
    explode_blocks,
    lowest_common_block_scalar,
)

DEFAULT_SEED = 647  # the reference's fixed seed (GenerateLabeledPoints.scala:71)


def triangle_side(k_i: int) -> int:
    """Largest l with l(l+1)/2 <= k_i (reference ``Util.scala:60-68``)."""
    if k_i < 1:
        return 1
    l = int(math.floor(math.sqrt(2.0 * k_i)))
    while l * (l + 1) // 2 > k_i:
        l -= 1
    return max(l, 1)


@dataclass
class DisDedupPlan:
    """Driver-side assignment for heavy blocks; tail blocks hash."""

    k: int
    total_workload: int
    w_per_reducer: float
    tau: float
    # (bk, bv) -> (l, [rid per cell]) for multi-reducer blocks
    multi: dict[tuple[int, str], tuple[int, list[int]]] = field(default_factory=dict)
    # (bk, bv) -> rid for deterministically-placed single-reducer blocks
    single_det: dict[tuple[int, str], int] = field(default_factory=dict)

    def reducers_used_by_multi(self) -> int:
        return sum(l * (l + 1) // 2 for l, _ in self.multi.values())


def plan_assignment(
    heavy: list[tuple[int, str, int]],
    total_workload: int,
    k: int,
    seed: int = DEFAULT_SEED,
) -> DisDedupPlan:
    """Plan reducer allocation for heavy blocks (pure driver math).

    ``heavy`` = [(bk, bv, n_rows)] for blocks with workload > tau.
    Mirrors the reference's Setup (A5-A12, ``Setup.scala:60-162``)
    including its two published improvements (leftover redistribution
    and continuing round-robin, ``README.md:63-72``), but iterates in
    sorted-block order so the plan is reproducible (fixes G5).
    """
    w_per_reducer = total_workload / k if k else float("inf")
    tau = total_workload / (3.0 * k * math.log(k)) if k >= 3 else w_per_reducer
    plan = DisDedupPlan(k, total_workload, w_per_reducer, tau)
    if not heavy:
        return plan

    workload = {(bk, bv): n * (n - 1) // 2 for bk, bv, n in heavy}
    multi_keys = sorted(kv for kv, w in workload.items() if w > w_per_reducer)
    single_keys = sorted(kv for kv, w in workload.items() if w <= w_per_reducer)
    w_multi = sum(workload[kv] for kv in multi_keys)

    # A7: proportional share, rounded down to a triangle number.
    k_alloc: dict[tuple[int, str], int] = {}
    deficits: dict[tuple[int, str], int] = {}
    for kv in multi_keys:
        k_orig = int(workload[kv] / w_multi * k)
        l = triangle_side(k_orig)
        k_alloc[kv] = l * (l + 1) // 2
        deficits[kv] = max(k_orig - k_alloc[kv], 0)

    # A8: greedy leftover redistribution — largest deficit first.
    pool = k - sum(k_alloc.values())
    for kv in sorted(multi_keys, key=lambda kv: (-deficits[kv], kv)):
        l = triangle_side(k_alloc[kv])
        cost = l + 1  # tri(l+1) - tri(l)
        if 0 < cost <= pool:
            k_alloc[kv] += cost
            pool -= cost

    # A9-A11: seeded shuffle of reducer ids; multi blocks take
    # consecutive slices, single-det round-robin continues after.
    rng = random.Random(seed)
    rids = list(range(1, k + 1))
    rng.shuffle(rids)
    pos = 0
    for kv in multi_keys:
        k_i = k_alloc[kv]
        l = triangle_side(k_i)
        cells = [rids[(pos + i) % k] for i in range(l * (l + 1) // 2)]
        pos += l * (l + 1) // 2
        plan.multi[kv] = (l, cells)
    for i, kv in enumerate(single_keys):
        plan.single_det[kv] = rids[(pos + i) % k]
    return plan


def _fanout(blocked: DataFrame, seed: int) -> DataFrame:
    """Replicate each (row, block) to its l triangle cells.

    For anchor ``a`` in [1, l], row i of sequence(1, l) maps to cell
    (min(i,a), max(i,a)) with role L (i<a), S (i=a), R (i>a); the flat
    index of upper-triangle cell (p,q) is (p-1)(2l-p+2)/2 + (q-p)
    (reference ``DisDedupMapper.scala:32``).
    """
    a = f"(pmod(xxhash64(cast(id_ as string), bk, bv, {seed}), l_) + 1)"
    cells = (
        "transform(sequence(1, l_), i -> named_struct("
        f"  'cell', cast(((least(i, {a}) - 1) * (2 * l_ - least(i, {a}) + 2)) div 2"
        f"          + (greatest(i, {a}) - least(i, {a})) as int),"
        f"  'role', case when i < {a} then 'L' when i = {a} then 'S' else 'R' end))"
    )
    return (
        blocked.withColumn("_fan", F.explode(F.expr(cells)))
        .withColumn("cell", F.col("_fan.cell"))
        .withColumn("role", F.col("_fan.role"))
        .drop("_fan")
    )


def candidate_pairs_disdedup(
    df: DataFrame,
    rules: list[BlockingRule],
    id_col: str,
    payload_cols: list[str] | None = None,
    k: int | None = None,
    seed: int = DEFAULT_SEED,
    with_cell_stats: bool = False,
) -> DataFrame:
    """Load-balanced exactly-once intra-block pairs.

    Same output schema as ``candidate_pairs_naive``: ``(bk, id1, id2,
    t1_<payload>..., t2_<payload>...)`` with ``id1 < id2`` (canonical
    order; comparators are symmetric so side swap is lossless).
    ``with_cell_stats`` appends (rid, cell) for balance tests.
    """
    spark = df.sparkSession
    payload_cols = payload_cols or []
    if k is None:
        k = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    bv_cols = [bv_col(r.priority) for r in rules]
    # base feeds the stats job AND the fan-out; the fan-out feeds three
    # role filters (L/R/S) — persist both so the scan+explode chain is
    # materialized once, like the reference's single shuffle does.
    base = explode_blocks(df, rules).select(
        F.col(id_col).alias("id_"), *payload_cols, *bv_cols, "bk", "bv"
    )
    # The cell equi-joins inherit the persisted fan-out's partitioning
    # whenever AQE broadcasts one side, and a small table arriving as
    # one input split would then serialize ALL pair emission into one
    # task — exactly the dangerous regime, since a small table can
    # still carry quadratic pair work (Febrl: 20k rows in one split ->
    # 50.6M pairs). The probe must read the REAL split count, which
    # only the RDD lineage exposes; the .rdd conversion costs one
    # plan translation, no job, and the guard is a no-op on any scan
    # already >= k splits — an unconditional repartition(k) would
    # instead collapse a 100 TB scan's parallelism to k and shuffle
    # the whole table (r7 VERDICT finding 3, resolved as: the probe
    # is deliberate).
    if base.rdd.getNumPartitions() < k:
        base = base.repartition(k)
    base = tracked_persist(base)

    # --- stats job: block sizes; only heavy blocks reach the driver.
    stats = base.groupBy("bk", "bv").agg(F.count(F.lit(1)).alias("n")).where("n >= 2")
    totals = stats.select(
        F.sum(F.expr("n * (n - 1) div 2")).alias("w"), F.count(F.lit(1)).alias("blocks")
    ).collect()[0]
    total_w = int(totals["w"] or 0)
    if total_w == 0:
        # Schema-faithful empty result: column types derived from the
        # input (id/payload keep their real types, cell-stats columns
        # match the full plan), so duplicate-free inputs still satisfy
        # the documented output contract and union cleanly.
        z = df.limit(0)
        t1 = z.select(
            F.lit(1).cast("int").alias("bk"),
            F.col(id_col).alias("id1"),
            *[F.col(c).alias(f"t1_{c}") for c in payload_cols],
        )
        t2 = z.select(
            F.col(id_col).alias("id2"),
            *[F.col(c).alias(f"t2_{c}") for c in payload_cols],
        )
        empty = t1.crossJoin(t2)
        if with_cell_stats:
            empty = (
                empty.withColumn("rid", F.lit(None).cast("int"))
                .withColumn("cell", F.lit(None).cast("int"))
                .withColumn("bv", F.lit(None).cast("string"))
            )
        out = ["bk", "id1", "id2"]
        out += [f"t1_{c}" for c in payload_cols] + [f"t2_{c}" for c in payload_cols]
        if with_cell_stats:
            out += ["rid", "cell", "bv"]
        return empty.select(*out)
    w_per_reducer = total_w / k
    tau = total_w / (3.0 * k * math.log(k)) if k >= 3 else w_per_reducer
    heavy = [
        (r["bk"], r["bv"], r["n"])
        for r in stats.where(F.expr(f"n * (n - 1) div 2 > {tau}")).collect()
    ]
    plan = plan_assignment(heavy, total_w, k, seed)

    # --- broadcast the heavy-block assignment; tail blocks get l=1
    # and a hash-derived reducer id (never touches the driver).
    rows = [
        (bk, bv, l, rids) for (bk, bv), (l, rids) in plan.multi.items()
    ] + [(bk, bv, 1, [rid]) for (bk, bv), rid in plan.single_det.items()]
    if rows:
        asg = spark.createDataFrame(rows, schema="bk int, bv string, l_ int, rids array<int>")
        blocked = base.join(F.broadcast(asg), ["bk", "bv"], "left")
    else:
        blocked = base.withColumn("l_", F.lit(None).cast("int")).withColumn(
            "rids", F.lit(None).cast("array<int>")
        )
    blocked = blocked.withColumn("l_", F.coalesce("l_", F.lit(1)))

    fan = _fanout(blocked, seed)
    fan = (
        fan.withColumn(
            "rid",
            F.coalesce(
                F.element_at("rids", F.col("cell") + 1),
                (F.pmod(F.xxhash64("bk", "bv", F.lit(seed)), F.lit(k)) + 1).cast("int"),
            ),
        )
        .drop("rids", "l_")
    )
    fan = tracked_persist(fan)
    # materialize: the three role filters (L/R/S) below would each
    # recompute the fan-out inside one job before the cache fills
    fan.count()

    carry = payload_cols + bv_cols

    def side(tag: str, role: str) -> DataFrame:
        cols = [
            F.col("bk"),
            F.col("bv"),
            F.col("cell"),
            F.col("rid"),
            F.col("id_").alias(f"{tag}_id"),
        ] + [F.col(c).alias(f"{tag}_{c}") for c in carry]
        return fan.where(F.col("role") == role).select(*cols)

    join_keys = ["bk", "bv", "cell"]
    # Off-diagonal cells: bipartite L×R (anchors differ, ids distinct).
    lr = side("t1", "L").join(
        side("t2", "R").withColumnsRenamed({"rid": "rid2"}), join_keys
    )
    # Canonicalize id1 < id2 (anchor order is arbitrary).
    swap = F.col("t1_id") > F.col("t2_id")
    sel = [F.col("bk"), F.col("bv"), F.col("rid")]
    sel += [
        F.when(swap, F.col("t2_id")).otherwise(F.col("t1_id")).alias("id1"),
        F.when(swap, F.col("t1_id")).otherwise(F.col("t2_id")).alias("id2"),
        F.col("cell"),
    ]
    for c in carry:
        sel += [
            F.when(swap, F.col(f"t2_{c}")).otherwise(F.col(f"t1_{c}")).alias(f"t1_{c}"),
            F.when(swap, F.col(f"t1_{c}")).otherwise(F.col(f"t2_{c}")).alias(f"t2_{c}"),
        ]
    lr = lr.select(*sel)

    # Diagonal cells: self-pairs i<j within S.
    s1 = side("t1", "S")
    s2 = side("t2", "S").withColumnsRenamed({"rid": "rid2"})
    ss = (
        s1.join(s2, join_keys)
        .where(F.col("t1_id") < F.col("t2_id"))
        .select(
            "bk",
            "bv",
            "rid",
            F.col("t1_id").alias("id1"),
            F.col("t2_id").alias("id2"),
            "cell",
            *[F.col(f"t1_{c}") for c in carry],
            *[F.col(f"t2_{c}") for c in carry],
        )
    )

    # exactly-once guard, codegen form (no array ops per pair)
    pairs = lr.unionByName(ss).where(F.col("bk") == lowest_common_block_scalar(rules))
    out = ["bk", "id1", "id2"]
    out += [f"t1_{c}" for c in payload_cols] + [f"t2_{c}" for c in payload_cols]
    if with_cell_stats:
        out += ["rid", "cell", "bv"]
    return pairs.select(*out)
