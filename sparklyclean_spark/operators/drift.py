"""Distribution-drift and independence testing — the statistical
monitoring layer a production training pipeline runs between data
snapshots: PSI (population stability index) for "did this feature's
distribution move", the chi-square independence test for "are these
two labels associated", and the two-sample Kolmogorov-Smirnov
statistic for "did this numeric column's distribution change".

Hash-stable float recipe shared by all three: every input count is
an exact integer; every derived double is the SAME single-IEEE-op
expression tree on both engines; per-cell/per-bin log terms are
rounded to DECIMAL(18,6) BEFORE their sum (decimal addition is exact
and associative — the cross-entropy precedent), and the headline
statistics are snapped to the 4-decimal floor grid.

No reference counterpart; SURVEY §2.10 capability-gap operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparklyclean_spark.functions.rounding import round4 as _r4


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test of independence over the (col_a,
    col_b) contingency table, plus Cramer's V effect size. One
    result row: ``(n_rows, n_cells, dof, chi2, cramers_v)``.

    Expected counts use exact integer products (``r_i·c_j`` stays
    below 2^63 up to ~3·10^9 rows per margin; cast the margins to
    double beyond that — noted, not silently wrong: bigint overflow
    throws under ANSI mode rather than wrapping).

    Scale: three map-side-combinable hash aggs over the label
    domains (cells, row margins, column margins — all bounded) and
    broadcast joins; nothing scales with corpus size after the first
    agg.
    """
    # rows with a NULL label are excluded up front: the grid join is
    # an equality join (NULL never matches), so keeping them would
    # inflate margins while their observed count silently coalesced
    # to zero — a wrong chi2 the mirrored oracle could never catch
    cells = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
        .agg(F.count(F.lit(1)).alias("_o"))
    )
    rows = cells.groupBy("_a").agg(F.sum("_o").alias("_r"))
    cols = cells.groupBy("_b").agg(F.sum("_o").alias("_c"))
    tot = cells.agg(
        F.sum("_o").alias("_n"),
        F.count_distinct("_a").alias("_nr"),
        F.count_distinct("_b").alias("_nc"),
    )
    e = F.col("_r") * F.col("_c") / F.col("_n")
    o = F.coalesce(F.col("_o"), F.lit(0))
    term = F.round((o - e) * (o - e) / e, 6).cast("decimal(18,6)")
    # the FULL R×C grid, not just observed cells: an unobserved cell
    # still contributes (0 - e)²/e — dropping zeros understates the
    # statistic exactly when the association is strongest
    grid = rows.crossJoin(F.broadcast(cols))
    per = (
        grid.join(F.broadcast(cells), ["_a", "_b"], "left")
        .join(F.broadcast(tot))
        .select("_n", "_nr", "_nc", term.alias("_t"))
    )
    agg = per.groupBy("_n", "_nr", "_nc").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("_t").cast("double").alias("_chi2"),
    )
    mindim = F.least(F.col("_nr") - 1, F.col("_nc") - 1)
    v = F.when(
        (mindim > 0) & (F.col("_chi2") >= 0.0),
        F.sqrt(F.col("_chi2") / (F.col("_n") * mindim)),
    )
    return agg.select(
        F.col("_n").cast("bigint").alias("n_rows"),
        F.col("n_cells").cast("bigint").alias("n_cells"),
        ((F.col("_nr") - 1) * (F.col("_nc") - 1)).cast("bigint").alias("dof"),
        _r4(F.col("_chi2")).alias("chi2"),
        _r4(v).alias("cramers_v"),
    )


def psi_drift(
    expected: DataFrame,
    actual: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population stability index of ``value_col`` between an
    expected (baseline) and actual (current) snapshot, binned on the
    EXPECTED side's quantile boundaries (the standard ML-monitoring
    convention: the baseline defines the grid; drift shows up as
    mass moving across it). One row per observed bin with both
    counts and the (additively-smoothed, +0.5 per bin) PSI term,
    plus the total in every row. PSI < 0.1 is the usual
    "no action" gate, > 0.25 "investigate".

    Bin assignment is the ``quantile_bins`` counting rule
    (``1 + #{boundaries <= v}``, boundary ties to the upper bin) so
    both engines bin identically from the identical interpolated
    boundaries.

    Scale: one percentile agg over the baseline (broadcast), one
    hash agg per side keyed by bin (bounded), a bin-keyed outer
    join of two ≤ n_bins-row tables.
    """
    pcts = F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
    bounds = expected.agg(
        F.percentile(F.col(value_col), pcts).alias("_bounds")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        b = F.lit(1) + F.size(F.filter("_bounds", lambda x: x <= v))
        return (
            df.join(F.broadcast(bounds))
            .where(F.col(value_col).isNotNull())
            .groupBy(b.cast("int").alias("bin"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    e = binned(expected, "n_expected")
    a = binned(actual, "n_actual")
    # full 1..n_bins spine, NOT a full-outer join of the two observed
    # sides: when quantile boundaries tie (heavy-tailed/degenerate
    # expected columns) intermediate bins are unreachable and appear
    # on NEITHER side, yet their smoothed terms are nonzero whenever
    # ne != na — dropping them biases the headline PSI low exactly on
    # the distributions the gate exists to catch (r9 review finding).
    spine = bounds.select(
        F.explode(F.sequence(F.lit(1), F.lit(n_bins))).alias("bin")
    )
    joined = (
        spine.join(e, "bin", "left")
        .join(a, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_expected", F.lit(0)).cast("bigint").alias("n_expected"),
            F.coalesce("n_actual", F.lit(0)).cast("bigint").alias("n_actual"),
        )
    )
    # side totals stay IN-PLAN (1-row broadcast over the bounded bin
    # table) — no eager driver action during query construction
    totals = joined.agg(
        F.sum("n_expected").alias("_ne"), F.sum("n_actual").alias("_na")
    )
    joined = joined.join(F.broadcast(totals))
    k = F.lit(n_bins)
    p = (F.col("n_expected") + 0.5) / (F.col("_ne") + 0.5 * k)
    q = (F.col("n_actual") + 0.5) / (F.col("_na") + 0.5 * k)
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)")
    per = joined.select("bin", "n_expected", "n_actual", term.alias("_t"))
    tot = per.agg(F.sum("_t").cast("double").alias("_psi"))
    return per.join(F.broadcast(tot)).select(
        "bin",
        "n_expected",
        "n_actual",
        F.col("_t").cast("double").alias("psi_term"),
        _r4(F.col("_psi")).alias("psi_total"),
    )


def ks_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    alpha_coeff: float = 1.358,  # c(alpha) for alpha = 0.05
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the
    ``value_col`` distributions of two groups: the max absolute ECDF
    gap, its large-sample critical value
    ``c(α)·sqrt((n_a+n_b)/(n_a·n_b))``, and the reject flag
    (compared on the UNROUNDED doubles — both engines derive them
    from the same exact-integer inputs). One result row.

    Scale: one hash agg to DISTINCT values with per-group counts,
    then running sums over ONE global sort of the distinct-value
    table (bounded by #distinct values, not rows — the same exact-
    order trade as the percentile family; at corpus scale pre-bin
    values to a fixed grid first).
    """
    base = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(value_col).alias("_v"),
        (F.col(group_col) == group_a).alias("_is_a"),
    ).where(F.col("_v").isNotNull())
    per_v = base.groupBy("_v").agg(
        F.sum(F.col("_is_a").cast("bigint")).alias("_ca"),
        F.sum((~F.col("_is_a")).cast("bigint")).alias("_cb"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_v.agg(
        F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb")
    )
    # guarded divisions (ANSI mode): an empty side yields NULL stats
    # instead of a divide-by-zero error
    both = (F.col("_na") > 0) & (F.col("_nb") > 0)
    stepped = per_v.join(F.broadcast(tot)).select(
        F.when(both, F.sum("_ca").over(w) / F.col("_na")).alias("_fa"),
        F.when(both, F.sum("_cb").over(w) / F.col("_nb")).alias("_fb"),
        "_na",
        "_nb",
    )
    gaps = stepped.select(
        F.abs(F.col("_fa") - F.col("_fb")).alias("_d"), "_na", "_nb"
    )
    agg = gaps.groupBy("_na", "_nb").agg(F.max("_d").alias("_ks"))
    crit = F.when(
        both,
        F.lit(alpha_coeff)
        * F.sqrt((F.col("_na") + F.col("_nb")) / (F.col("_na") * F.col("_nb"))),
    )
    return agg.select(
        F.col("_na").cast("bigint").alias("n_a"),
        F.col("_nb").cast("bigint").alias("n_b"),
        _r4(F.col("_ks")).alias("ks_d"),
        _r4(crit).alias("ks_crit"),
        (F.col("_ks") > crit).alias("significant"),
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information between two categorical columns (nats), plus
    the normalized form MI / min(H(a), H(b)) — the feature-selection
    companion of ``chi_square_independence`` (chi2 answers "is there
    association"; MI answers "how much of one label the other
    carries", which is what you rank candidate features by).

    Hash-stable recipe (the chi2/entropy precedent): joint and
    marginal counts are exact integers; each cell term
    ``p_xy * ln(p_xy*n / (c_x*c_y))`` is one IEEE expression over
    exact ints rounded to DECIMAL(18,6) BEFORE the sum; entropies use
    the same treatment. NULL categories are kept as their own level
    via a sentinel (groupBy keeps NULL groups; the joins back are on
    non-null sentinels, so no rows drop).

    Scale: one scan + three hash aggs bounded by the label domains;
    marginals broadcast back onto the (bounded) contingency table.
    """
    # sentinel: joins drop NULL keys, so NULL levels are folded to a
    # non-null stand-in. U+001F (unit separator) cannot appear in a
    # real categorical value, unlike a plausible string like " NULL "
    # which would collide a genuine category with the NULL level.
    s = "\x1f"
    pairs = df.select(
        F.coalesce(F.col(col_a).cast("string"), F.lit(s)).alias("_a"),
        F.coalesce(F.col(col_b).cast("string"), F.lit(s)).alias("_b"),
    )
    joint = pairs.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("c_ab"))
    ma = joint.groupBy("_a").agg(F.sum("c_ab").cast("bigint").alias("c_a"))
    mb = joint.groupBy("_b").agg(F.sum("c_ab").cast("bigint").alias("c_b"))
    n = joint.agg(F.sum("c_ab").cast("bigint").alias("_n"))

    full = joint.join(F.broadcast(ma), "_a").join(F.broadcast(mb), "_b").join(
        F.broadcast(n)
    )
    p_ab = F.col("c_ab") / F.col("_n")
    # first factor of each product cast to double (the chi² overflow
    # recipe): bigint·bigint errors under ANSI near 2^63 (~3e9 rows
    # with a dominant cell); double products are exact below 2^53 and
    # a ≥2^53 product's ~1e-16 relative error is invisible under the
    # 6-decimal snap. The DuckDB twin mirrors the casts.
    mi_term = F.round(
        p_ab
        * F.log(
            (F.col("c_ab").cast("double") * F.col("_n"))
            / (F.col("c_a").cast("double") * F.col("c_b"))
        ),
        6,
    ).cast("decimal(18,6)")
    mi = full.agg(F.sum(mi_term).cast("double").alias("_mi"))

    def _entropy(marg, c_col, alias):
        p = F.col(c_col) / F.col("_n")
        term = F.round(p * F.log(p), 6).cast("decimal(18,6)")
        return (
            marg.join(F.broadcast(n))
            .agg((-F.sum(term)).cast("double").alias(alias))
        )

    out = (
        mi.join(F.broadcast(_entropy(ma, "c_a", "_ha")))
        .join(F.broadcast(_entropy(mb, "c_b", "_hb")))
    )
    hmin = F.least("_ha", "_hb")
    return out.select(
        _r4("_mi").alias("mi_nats"),
        _r4("_ha").alias("entropy_a"),
        _r4("_hb").alias("entropy_b"),
        F.when(hmin > 0, _r4(F.col("_mi") / hmin)).alias("mi_normalized"),
    )


def grouped_correlation(
    df: DataFrame, x_col: str, y_col: str, by: list[str] | None = None
) -> DataFrame:
    """Per-group Pearson correlation with a DETERMINISTIC summation:
    Spark's built-in ``corr`` aggregates doubles in partition order, so
    its last decimals wobble across partitionings and can never be
    hash-checked. Here every raw moment term (x, y, x*x, y*y, x*y) is
    rounded to DECIMAL(28,6) BEFORE the group sum (exact associative
    addition), and the closed-form
    ``r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))``
    is the same single-IEEE-op tree on both engines.

    Pairs with a NULL on either side are excluded (the standard corr
    contract). Output: ``(group..., n_pairs, r)`` — r is NULL for
    degenerate (zero-variance) groups instead of NaN/inf.

    Scale: one map-side-combinable hash agg; output bounded by the
    group domain.
    """
    keys = by or []
    base = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")

    def dec(c):
        return F.round(c, 6).cast("decimal(28,6)")

    agg = base.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(dec(x)).alias("_sx"),
        F.sum(dec(y)).alias("_sy"),
        F.sum(dec(x * x)).alias("_sxx"),
        F.sum(dec(y * y)).alias("_syy"),
        F.sum(dec(x * y)).alias("_sxy"),
    )
    n = F.col("n_pairs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov = n * F.col("_sxy").cast("double") - sx * sy
    vx = n * F.col("_sxx").cast("double") - sx * sx
    vy = n * F.col("_syy").cast("double") - sy * sy
    r = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return agg.select(
        *keys,
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        _r4(r).alias("r"),  # round4 propagates NULL; no guard needed
    )
