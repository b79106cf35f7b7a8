"""Deterministic sampling & splitting for training-data pipelines.

Both operators derive randomness from ``md5`` of the row id rather
than an RNG: the result is a pure function of the data — stable
across runs, executors, partitionings, and engines (DuckDB computes
the identical md5, so both are exactly oracle-checkable, unlike
``rand(seed)`` whose stream depends on partition layout).

* ``stratified_sample`` — exactly ``n`` rows per stratum, chosen by
  md5 order. One window shuffle on the strata columns; at 100 TB with
  a hot stratum, pre-filter with an approximate md5-prefix threshold
  first (keeps ~n·slack rows/stratum) so the window sees a bounded
  set — the exact top-n then runs on the survivors.
* ``hash_split`` — train/val/test assignment from the first 4 hex
  chars of md5(id): pure map-side, no shuffle, stable under
  re-partitioning and incremental reruns (a row never changes split
  when the corpus grows — the property random splits lack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
    prefilter_slack: float | None = None,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministic
    (md5-of-id order, id tie-break).

    ``prefilter_slack=None`` (default) is the plain per-stratum window
    — exact, oracle-checkable, but a hot stratum serializes into one
    sort task. The 100 TB path sets ``prefilter_slack`` (e.g. 8.0):
    rows are pre-filtered to ``u < slack*n/|stratum|`` where ``u`` is
    the SAME md5-uniform the window sorts by — the filter keeps a
    prefix of the sort order, so whenever >= n rows survive, the
    window over survivors provably equals the exact result. The window
    then sees ~slack*n rows per stratum instead of |stratum|. Failure
    mode (astronomically rare for slack >= 4: P[Binomial(N, s*n/N) < n]
    by Chernoff ~ e^(-n(s-1)^2/(2s))): an unlucky stratum keeps < n
    rows; those strata fall back to their full row set in the same
    plan (union of the two filters), preserving exactness
    unconditionally at the cost of one extra tiny aggregate."""
    u = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(u, F.col(id_col))
    if prefilter_slack is None:
        pool = df
        extra = []
    else:
        # synthetic stratum key: null-safe and single-column, so the
        # internal count/semi/anti joins never drop NULL-keyed strata
        # (separator collisions need adversarial \x01/\x02 in values)
        sk = F.concat_ws(
            "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("\x02")) for c in strata_cols]
        )
        base = df.withColumn("_sk", sk)
        counts = base.groupBy("_sk").agg(F.count(F.lit(1)).alias("_cnt"))
        # threshold as an md5-hex prefix comparison: u is uniform over
        # hex strings; keep u < t with t = slack*n/cnt scaled to the
        # first 8 hex chars. t_frac >= 1 means keep-all: sentinel "g"
        # compares greater than every hex char.
        t_frac = F.lit(float(prefilter_slack * n_per_stratum)) / F.col("_cnt")
        t_hex = F.when(t_frac >= 1.0, F.lit("g")).otherwise(
            F.lower(
                F.lpad(
                    F.conv(
                        F.ceil(t_frac * F.lit(float(16**8))).cast("bigint").cast("string"),
                        10,
                        16,
                    ),
                    8,
                    "0",
                )
            )
        )
        with_t = base.join(
            F.broadcast(counts.withColumn("_t_hex", t_hex).drop("_cnt")), "_sk"
        )
        survivors = with_t.where(F.substring(u, 1, 8) < F.col("_t_hex"))
        # the filter keeps a PREFIX of the window's sort order, so any
        # stratum with >= n survivors is provably exact; shortfall
        # strata (unlucky uniform draw, P ~ Chernoff-small) re-enter
        # whole — exactness is unconditional
        ok = (
            survivors.groupBy("_sk")
            .agg(F.count(F.lit(1)).alias("_surv"))
            .where(F.col("_surv") >= n_per_stratum)
            .select("_sk")
        )
        pool = survivors.join(F.broadcast(ok), "_sk", "semi").unionByName(
            with_t.join(F.broadcast(ok), "_sk", "anti")
        )
        extra = ["_sk", "_t_hex"]
    return (
        pool.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn", *extra)
    )


def md5_uniform(id_col: str) -> "F.Column":
    """The module's shared deterministic uniform draw in [0, 1): the
    first 8 hex chars of md5(id) scaled down — a pure function of the
    row id, stable across reruns/partitionings and reproducible
    bit-for-bit by the DuckDB oracle. NULL ids take the U+001F
    sentinel (the hash_split/kfold rule): md5(NULL) is NULL and a
    NULL comparison would silently drop the row from every consumer
    (weighted_sample, mixture_sample)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit("\x1f"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    boundaries: tuple[str, str] = ("cccc", "e666"),
    names: tuple[str, str, str] = ("train", "val", "test"),
) -> DataFrame:
    """Append a ``split`` column: 3-way assignment by comparing the
    first 4 hex chars of md5(id) against the boundary strings
    (defaults ≈ 0.80 / 0.10 / 0.10 — 0xCCCC/0x10000 and 0xE666/0x10000).

    NULL ids hash a U+001F sentinel instead of NULL: md5(NULL) is
    NULL, both when-comparisons would be NULL, and every NULL-id row
    would silently fall through otherwise() into the TEST split —
    polluting the held-out set. With the sentinel all NULL-id rows
    land together in whichever split the sentinel's hash selects,
    deterministically."""
    h4 = F.substring(
        F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit("\x1f"))), 1, 4
    )
    return df.withColumn(
        "split",
        F.when(h4 < boundaries[0], names[0])
        .when(h4 < boundaries[1], names[1])
        .otherwise(names[2]),
    )


def kfold_assignment(df: DataFrame, id_col: str, k: int = 5) -> DataFrame:
    """Append a ``fold`` column (0..k-1): deterministic k-fold
    cross-validation assignment from the first 8 hex chars of
    md5(id) mod k — pure map-side, no shuffle, rerun-stable, and
    engine-portable (the DuckDB oracle recomputes the identical
    md5-uniform). The ≤ 1-in-2³² modulo bias is far below any
    statistical concern and, unlike a seeded RNG, identical across
    engines, partitionings, and reruns.

    Same md5-derivation family as ``hash_split`` — a fold here is a
    deterministic function of the ROW ID alone, so folds survive
    repartitioning, incremental appends, and engine migration (the
    property seeded ``randomSplit`` lacks)."""
    # NULL ids take the U+001F sentinel (hash_split's rule): md5(NULL)
    # is NULL and would emit a NULL fold instead of an assignment
    u = F.conv(
        F.substring(
            F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit("\x1f"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return df.withColumn("fold", F.pmod(u, F.lit(k)).cast("int"))


def weighted_sample(
    df: DataFrame,
    weight: "F.Column",
    id_col: str,
    weight_name: str = "keep_p",
) -> DataFrame:
    """Per-row Bernoulli keep with probability ``weight`` (a Column
    in [0,1], e.g. a quality score) — the quality-weighted
    downsampling pass of a pretraining mix. Deterministic: the
    uniform draw is the first 8 hex chars of md5(id) scaled to [0,1),
    so the decision is a pure function of (id, weight) — stable
    across reruns and engine-portable (DuckDB reproduces it exactly).
    Pure map-side; no shuffle, no RNG state."""
    return df.withColumn(weight_name, weight).where(
        md5_uniform(id_col) < F.col(weight_name)
    )


def weighted_sample_exact_k(
    df: DataFrame,
    weight: "F.Column",
    k: int,
    id_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """EXACT-k weighted sampling WITHOUT replacement (per ``by``
    stratum when given) via Efraimidis–Spirakis A-ES keys:
    ``key = -ln(u) / w`` with the k SMALLEST keys selected —
    equivalent to picking items one by one with probability
    proportional to remaining weight. The quota-true complement to
    ``weighted_sample`` (whose Bernoulli keep only hits the target
    size in expectation).

    Deterministic and engine-portable: the uniform ``u`` is the first
    13 hex chars of md5(id) scaled to (0,1] — the same md5-uniform
    family as the rest of this module, reproducible bit-for-bit in
    the DuckDB oracle (no RNG state, stable under retries).

    Scale shape: key computation is pure map-side; selection is one
    per-stratum top-k window (rows carry only id+key+weight). With a
    hot stratum, the same two-round salted top-k as
    ``operators/skew.py`` applies — here the plain window is used
    because strata quotas are small by construction.
    """
    keys = by or []
    # (h+1)/16^13 in (0, 1]: never 0, so ln(u) is finite; 13 hex
    # chars = 52 bits fits a double exactly
    u = (
        (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
            .cast("double")
            + F.lit(1.0)
        )
        / F.lit(float(16**13))
    )
    score = -F.log(u) / weight
    w = Window.partitionBy(*keys).orderBy(F.asc("es_key"), F.asc(id_col))
    return (
        # weight <= 0 or NULL means "never sample" (probability 0) —
        # without the filter a NULL key would sort FIRST in Spark
        # (asc = nulls first) and a negative weight would beat every
        # valid row; both would also diverge from the oracle's
        # NULLS-LAST default
        df.where(weight > 0)
        .withColumn("es_key", F.round(score, 10))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def proportional_sample(
    df: DataFrame,
    strata_cols: list[str],
    total_n: int,
    id_col: str,
) -> DataFrame:
    """Exact-N stratified sample with proportional allocation by the
    largest-remainder (Hamilton) method: every stratum gets
    ``floor(total_n * |stratum| / |df|)`` rows, and the leftover seats
    go one each to the strata with the largest remainders (ties broken
    by stratum key ascending) — the output size is EXACTLY ``total_n``
    and every step is integer arithmetic, so the allocation is
    bit-deterministic and engine-portable. Within a stratum the rows
    taken are the md5-of-id order prefix (same deterministic uniform
    as ``stratified_sample``).

    The mix-preserving downsample: unlike per-stratum ``n`` (which
    flattens the mix) or Bernoulli ``fraction`` (which only hits N in
    expectation), this keeps the corpus composition at an exact budget.

    Scale shape: one strata count agg (map-combinable), a
    strata-cardinality-sized allocation computed with ONE window over
    the counts table (dimension-sized — thousands of strata, not
    rows), quotas broadcast back, one per-stratum window for the
    prefix take. ``total_n`` must not exceed ``|df|`` (quotas are
    provably <= stratum sizes in that regime). NULL stratum keys are
    dropped by the quota equi-join — coalesce them to a sentinel first
    if NULL-keyed strata must participate (same convention as
    ``stratified_sample``'s plain path).
    """
    sk_order = [F.asc(c) for c in strata_cols]
    counts = df.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("_cnt"))
    tot = counts.agg(F.sum("_cnt").alias("_tot"))
    q = counts.join(F.broadcast(tot)).select(
        *strata_cols,
        "_cnt",
        F.expr(f"({total_n} * _cnt) DIV _tot").alias("_base"),
        F.expr(f"({total_n} * _cnt) % _tot").alias("_rem"),
    )
    w_rank = Window.orderBy(F.desc("_rem"), *sk_order)
    w_all = Window.partitionBy()
    quotas = (
        q.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn("_left", total_n - F.sum("_base").over(w_all))
        .select(
            *strata_cols,
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_left"), F.lit(1)).otherwise(F.lit(0))
            ).alias("quota"),
        )
    )
    u = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(u, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(quotas), strata_cols)
        .where(F.col("_rn") <= F.col("quota"))
        .drop("_rn")
    )


def temporal_split_audit(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    cutoff_frac: float = 0.8,
) -> DataFrame:
    """Time-based holdout split + its leakage audit in one result:
    rows at or before the ``cutoff_frac`` quantile of event time go
    to 'train', later rows to 'test' — the standard leakage-safe
    evaluation protocol for event data (a random split would let the
    model see the future). One row per split with event count,
    distinct entities, and the time range, plus ``n_overlap_entities``
    (entities present in BOTH splits — the population for whom
    per-entity history leaks across the boundary; temporal splits
    must REPORT it even though they permit it).

    Engine-portable cutoff: the quantile interpolates over exact
    integer MICROSECONDS (Spark ``percentile`` == DuckDB
    ``quantile_cont``) and is floored to a µs integer before the
    boundary compare, so both engines split identically.

    Scale shape: one pass computes µs + the 1-row quantile aggregate
    (broadcast back — the accepted 1-row cross-join shape); the split
    aggregation is map-side combinable with a 2-row output; the
    overlap count aggregates the (entity, split) dedup table — one
    shuffle keyed on the entity.
    """
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    us = F.timestamp_diff("MICROSECOND", epoch, F.col(ts_col))
    # rows with a NULL event time are EXCLUDED: an un-timestamped row
    # cannot be placed on either side of a temporal boundary, and the
    # otherwise() branch would silently dump it into 'test'
    e = df.where(F.col(ts_col).isNotNull()).select(
        F.col(entity_col).alias("_ent"), F.col(ts_col).alias("_ts"),
        us.alias("_us"))
    cutoff = e.agg(
        F.floor(F.percentile("_us", F.lit(cutoff_frac)))
        .cast("bigint")
        .alias("_cut")
    )
    labeled = e.join(F.broadcast(cutoff)).select(
        "_ent", "_ts",
        F.when(F.col("_us") <= F.col("_cut"), F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    per_split = labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("_ent").alias("n_entities"),
        F.min("_ts").alias("min_ts"),
        F.max("_ts").alias("max_ts"),
    )
    overlap = (
        labeled.select("_ent", "split")
        .distinct()
        .groupBy("_ent")
        .agg(F.count(F.lit(1)).alias("_k"))
        .where(F.col("_k") == 2)
        .agg(F.count(F.lit(1)).alias("n_overlap_entities"))
    )
    return per_split.join(F.broadcast(overlap)).select(
        "split",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("n_entities").cast("bigint").alias("n_entities"),
        "min_ts",
        "max_ts",
        F.col("n_overlap_entities").cast("bigint").alias("n_overlap_entities"),
    )


def negative_pairs(
    df: DataFrame,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive
    training: each row gets ``k`` pseudo-random partners drawn from
    the OTHER rows — md5-derived (rerun-stable, partition-invariant,
    engine-portable), never self, as ``(id, neg_rank, partner_id)``.

    Mechanics: rows get a dense index by id order (ROW_NUMBER over
    the id — a global sort of the id column only); draw j's partner
    index as ``md5_uniform(id, j) mod (n-1)`` and shift past the
    row's own index (the classic skip-self bijection onto the other
    n-1 rows); join the index back to ids. Collisions between a
    row's k partners are allowed (sampling WITH replacement across
    j), exactly like a hash-based negative sampler at corpus scale.

    Scale: one global id sort (the documented exact-rank trade — at
    corpus scale derive the dense index with operators.ids instead),
    a k-way literal explode, and one equi-join on the dense index.
    """
    from sparklyclean_spark.cache import tracked_persist

    # persisted: the index table feeds BOTH the draw side and the
    # partner lookup — without it Catalyst duplicates the global sort
    idx = tracked_persist(
        df.select(F.col(id_col).alias("_id")).select(
            "_id",
            (F.row_number().over(Window.orderBy("_id")) - 1)
            .cast("bigint")
            .alias("_idx"),
        )
    )
    n = idx.agg(F.count(F.lit(1)).alias("_n"))
    j = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("neg_rank")
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("_id").cast("string"), F.lit(":"),
                    F.col("neg_rank").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    drawn = (
        idx.join(F.broadcast(n))
        # a 1-row input has no other rows to draw from; the filter
        # both defines the (empty) result and keeps pmod(_, n-1) from
        # dividing by zero under ANSI mode
        .where(F.col("_n") > 1)
        .select("_id", "_idx", "_n", j)
        .select(
            "_id",
            "neg_rank",
            # skip-self bijection onto the other n-1 indices
            F.when(
                F.pmod(u, F.col("_n") - 1) >= F.col("_idx"),
                F.pmod(u, F.col("_n") - 1) + 1,
            )
            .otherwise(F.pmod(u, F.col("_n") - 1))
            .alias("_pidx"),
        )
    )
    partner = idx.select(
        F.col("_idx").alias("_pidx"), F.col("_id").alias("partner_id")
    )
    return drawn.join(partner, "_pidx").select(
        F.col("_id").alias(id_col),
        F.col("neg_rank").cast("int").alias("neg_rank"),
        "partner_id",
    )
