"""Skew mitigation by salting — the generic technique for hot keys.

The engine already has two skew answers: AQE's runtime skew-join
split (on for sort-merge joins, see session.py) and the Dis-Dedup
triangle distribution (provably balanced self-join work). Salting
covers the remaining cases where neither applies:

- ``salted_topk``: a per-key window (row_number/rank) sends EVERY
  row of a key to ONE task — AQE cannot split a window partition,
  so one billion-row hot key means one straggler task sorting a
  billion rows. Salting makes it two bounded rounds.
- ``salted_join``: a shuffled equi-join where the probe side has
  hot keys, the build side is too big to broadcast, and AQE skew
  handling is unavailable (streaming joins; plans where the skewed
  stage isn't a sort-merge join).

All salts are DETERMINISTIC (xxhash64 of payload columns, not
rand()): task retries and speculative execution reproduce the same
placement, keeping exactly-once semantics without RNG state — same
policy as the Dis-Dedup anchors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparklyclean_spark.functions.rounding import ratio4

_SALT = "__salt"


def salted_topk(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Per-key top-k that no single hot key can stall.

    Round 1: top-k within (keys, salt) — the hot key's rows spread
    over ``n_salts`` tasks, each sorting ~1/n_salts of them.
    Round 2: top-k over the survivors — at most ``n_salts * k`` rows
    per key, trivially small. Output = rows + ``rn`` (1..k), exactly
    what a direct window top-k produces, PROVIDED ``order_by`` is a
    total order (include a unique tiebreaker column, as any
    deterministic top-k requires).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    w1 = Window.partitionBy(*keys, _SALT).orderBy(*order_by)
    survivors = (
        df.withColumn(_SALT, salt)
        .withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= k)
        .drop(_SALT, "__rn1")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return survivors.withColumn("rn", F.row_number().over(w2)).where(
        F.col("rn") <= k
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (skewed, large) side salted and the
    right side replicated ``n_salts``×. The hot key's rows land on
    ``n_salts`` different reducers instead of one. Right-side cost:
    |R| × n_salts shuffle volume — use only when |R| is modest but
    above the broadcast threshold, and keep ``n_salts`` at the skew
    factor you actually observe, not higher."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left for salted_join, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn(_SALT, salt)
    r_rep = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_rep, on + [_SALT], how).drop(_SALT)


def key_profile(
    df: DataFrame,
    keys: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter diagnostic for a prospective shuffle key: the
    top-N key values by row count with their share of the table —
    the numbers that decide between a plain shuffle, `salted_join`/
    `salted_topk`, AQE skew handling, or the Dis-Dedup triangle.
    A top-1 share near 1/parallelism means one reducer does all the
    work; run this BEFORE burning cluster-hours on the join.

    Scale shape: one map-side-combinable hash agg on the key (output
    = #distinct keys), a 1-row total broadcast, and a sorted `limit`
    top-N (per-partition heaps, no global sort). Share is computed
    from exact integer counts, rounded only at the edge.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    # total from the grouped aggregate, NOT a second scan of df — on
    # the 100 TB table this diagnostic targets, a count(*) over the
    # raw input would double the I/O for an identical number
    total = counts.agg(F.sum("cnt").alias("_total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            *keys,
            F.col("cnt").cast("bigint").alias("cnt"),
            # floor arithmetic (repo rounding contract): engine round()
            # tie semantics may differ from the DuckDB oracle's
            ratio4(F.col("cnt"), F.col("_total")).alias("share"),
        )
        .orderBy(F.desc("cnt"), *[F.asc(k) for k in keys])
        .limit(top_n)
    )
