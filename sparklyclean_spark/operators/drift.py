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
    joined = (
        e.join(a, "bin", "full_outer")
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
