"""Relational core: joins, aggregations, windows, sorts, set ops.

Every function is ``tables -> DataFrame`` over the catalog tables and
is paired with an ANSI-SQL oracle in ``__spark_entry__.oracle_sql``.
All plans are declarative DataFrame API so Catalyst applies pushdown,
pruning, join reordering, and whole-stage codegen; dimension joins
(region/nation) broadcast explicitly.

Float aggregates are rounded to 4 decimals on BOTH engine and oracle
sides so the order-insensitive value hash is robust to summation
order (Spark partial aggs vs DuckDB single-node).

Capability parity note: the reference (sparklyclean) has no join/agg
API — its whole pipeline is one hand-rolled blocked self-join
(SURVEY.md §2.8). This module is the engine surface required by
BASELINE.json §2.10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _r(col, n=4):
    """Round a float aggregate for hash-stable comparison."""
    return F.round(col, n)


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

def q1_pricing_summary(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Scan-heavy group-by: partial (map-side) aggregation then a tiny
    shuffle on the 4-ish distinct (returnflag, linestatus) keys —
    scales linearly with input at 100 TB.
    """
    l = t["lineitem"]
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            _r(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            _r(F.avg("l_quantity")).alias("avg_qty"),
            _r(F.avg("l_extendedprice")).alias("avg_price"),
            _r(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def agg_order_stats_by_priority(t: dict[str, DataFrame]) -> DataFrame:
    """Distinct-agg + min/max/avg per order priority."""
    o = t["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        _r(F.min("o_totalprice")).alias("min_price"),
        _r(F.max("o_totalprice")).alias("max_price"),
        _r(F.avg("o_totalprice")).alias("avg_price"),
    )


def rollup_orders(t: dict[str, DataFrame]) -> DataFrame:
    """ROLLUP (status, priority) with grand total."""
    o = t["orders"]
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), _r(F.sum("o_totalprice")).alias("total_price"))
    )


def cube_lineitem_flags(t: dict[str, DataFrame]) -> DataFrame:
    """CUBE (returnflag, linestatus)."""
    l = t["lineitem"]
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"), _r(F.sum("l_quantity")).alias("sum_qty"))
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

def q5_revenue_by_nation(t: dict[str, DataFrame]) -> DataFrame:
    """Flagship: revenue per nation — 5-way join + agg (TPC-H Q5 shape).

    Fact-fact joins (lineitem⋈orders) shuffle on the orderkey;
    dimension joins broadcast (nation/region are tiny at every SF, a
    few-hundred-MB customer/supplier dim would also fit under the
    64 MB threshold at small SF and AQE re-plans at runtime).
    """
    l, o, c = t["lineitem"], t["orders"], t["customer"]
    s, n, r = t["supplier"], t["nation"], t["region"]
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        # same-nation constraint (customer and supplier co-located)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


def q3_shipping_priority(t: dict[str, DataFrame]) -> DataFrame:
    """Top-10 unshipped orders by revenue (TPC-H Q3 shape).

    Total order (revenue DESC, orderkey ASC) so LIMIT is
    deterministic across engines.
    """
    c, o, l = t["customer"], t["orders"], t["lineitem"]
    cutoff = F.lit("1995-03-15").cast("timestamp")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .where((F.col("o_orderdate") < cutoff) & (F.col("l_shipdate") > cutoff))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def semi_join_customers_with_open_orders(t: dict[str, DataFrame]) -> DataFrame:
    """LEFT SEMI join: customers having at least one open order."""
    c, o = t["customer"], t["orders"]
    return c.join(
        o.where(F.col("o_orderstatus") == "O"),
        c.c_custkey == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_name", "c_mktsegment")


def anti_join_customers_without_orders(t: dict[str, DataFrame]) -> DataFrame:
    """LEFT ANTI join: customers with no orders at all."""
    c, o = t["customer"], t["orders"]
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


def anti_join_customers_no_open_orders(t: dict[str, DataFrame]) -> DataFrame:
    """LEFT ANTI against a filtered build side: customers with no OPEN
    order. Non-empty at every SF (unlike the no-orders-at-all shape,
    where TPC-H-style generators give every customer an order), so the
    correctness hash actually discriminates."""
    c, o = t["customer"], t["orders"]
    return c.join(
        o.where(F.col("o_orderstatus") == "O"),
        c.c_custkey == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name", "c_mktsegment")


def outer_join_nation_order_counts(t: dict[str, DataFrame]) -> DataFrame:
    """LEFT OUTER join preserving nations with zero customers/orders."""
    n, c, o = t["nation"], t["customer"], t["orders"]
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    cust = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_nationkey", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return (
        F.broadcast(n)
        .join(cust, n.n_nationkey == cust.c_nationkey, "left")
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.sum(F.when(F.col("c_nationkey").isNotNull(), 1).otherwise(0)).alias("n_customers"),
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_orders"),
        )
    )


def range_join_events_near_orders(t: dict[str, DataFrame]) -> DataFrame:
    """Non-equi (theta) join: per-user event pairs within 10 minutes.

    Self range-join on the events table: pairs of events by the same
    user whose timestamps are within a 10-minute band, earlier first.
    Equi key (user_id) carries the shuffle; the range predicate is a
    post-join filter, so this stays a hash/sort-merge join, not a
    cartesian product.
    """
    e = t["events"]
    a = e.select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
    )
    b = e.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    return (
        a.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("a_id") < F.col("b_id"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            F.col("a_user").alias("user_id"),
            F.col("a_id").alias("event_id_1"),
            F.col("b_id").alias("event_id_2"),
        )
    )


# ---------------------------------------------------------------------------
# Windows / top-k
# ---------------------------------------------------------------------------

def topk_orders_per_customer(t: dict[str, DataFrame]) -> DataFrame:
    """Per-group top-k: each customer's 3 most expensive orders.

    row_number over (custkey) — ties broken by orderkey for a total
    order; the window shuffles once on custkey, no global sort.
    """
    o = t["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", _r(F.col("o_totalprice")).alias("o_totalprice"), "rn")
    )


def window_running_order_total(t: dict[str, DataFrame]) -> DataFrame:
    """Running cumulative total per customer ordered by date."""
    o = t["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        _r(F.sum("o_totalprice").over(w)).alias("running_total"),
    )


def window_price_rank_in_type(t: dict[str, DataFrame]) -> DataFrame:
    """Ranking + analytic functions: dense_rank and lag within p_type."""
    p = t["part"]
    w = Window.partitionBy("p_type").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select(
        "p_partkey",
        "p_type",
        _r(F.col("p_retailprice")).alias("p_retailprice"),
        F.dense_rank().over(w).alias("price_rank"),
        _r(F.lag("p_retailprice", 1).over(w)).alias("prev_price"),
    )


def global_top_orders(t: dict[str, DataFrame]) -> DataFrame:
    """Global ORDER BY + LIMIT (total order via orderkey tiebreak)."""
    o = t["orders"]
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", _r(F.col("o_totalprice")).alias("o_totalprice"))
    )


# ---------------------------------------------------------------------------
# Set ops / distinct
# ---------------------------------------------------------------------------

def set_ops_nation_keys(t: dict[str, DataFrame]) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer vs supplier nations."""
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey")).distinct()
    union = c.union(s).distinct().withColumn("op", F.lit("union"))
    inter = c.intersect(s).withColumn("op", F.lit("intersect"))
    exc = c.exceptAll(s).withColumn("op", F.lit("except"))
    return union.unionByName(inter).unionByName(exc).select("op", "nationkey")


def distinct_mktsegments(t: dict[str, DataFrame]) -> DataFrame:
    """DISTINCT projection."""
    return t["customer"].select("c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------

def scalar_string_date_math(t: dict[str, DataFrame]) -> DataFrame:
    """String / date / math scalar function coverage over orders."""
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.upper(F.col("o_orderpriority")).alias("prio_upper"),
        F.substring(F.col("o_orderstatus"), 1, 1).alias("status_c"),
        F.length(F.col("o_orderpriority")).alias("prio_len"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_prio"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        _r(F.sqrt(F.col("o_totalprice"))).alias("price_sqrt"),
        _r(F.log(F.col("o_totalprice") + 1)).alias("price_ln"),
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        _r(F.abs(F.col("o_totalprice") - 1000.0)).alias("price_abs_dev"),
        F.when(F.col("o_totalprice") > 1000, "big").otherwise("small").alias("size_class"),
    )


def scalar_json_extract(t: dict[str, DataFrame]) -> DataFrame:
    """JSON scalar extraction from the events props column."""
    e = t["events"]
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


def case_bucketing_acctbal(t: dict[str, DataFrame]) -> DataFrame:
    """CASE ladder + groupBy over computed key."""
    c = t["customer"]
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return c.groupBy(bucket.alias("bal_bucket")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        _r(F.avg("c_acctbal")).alias("avg_bal"),
    )


def grouping_sets_order_stats(t: dict[str, DataFrame]) -> DataFrame:
    """GROUPING SETS ((status), (priority)) — two independent
    breakdowns in one pass over orders (one shuffle, not two)."""
    o = t["orders"]
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"]],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _r(F.sum("o_totalprice")).alias("total_price"),
    )


def approx_distinct_parts_per_brand(t: dict[str, DataFrame]) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). At 100 TB this replaces
    an exact distinct's full shuffle with a fixed-size mergeable
    sketch. Cardinalities here (≤ ~50 types/sizes per brand) stay in
    HLL++'s exact sparse regime, so the oracle can use exact
    COUNT(DISTINCT) — the driver hash-check proves the sketch path
    end-to-end without tolerating error bands."""
    p = t["part"]
    return p.groupBy("p_brand").agg(
        F.approx_count_distinct("p_type", 0.01).alias("approx_types"),
        F.approx_count_distinct("p_size", 0.01).alias("approx_sizes"),
        F.count(F.lit(1)).alias("n_parts"),
    )


def full_outer_nation_presence(t: dict[str, DataFrame]) -> DataFrame:
    """FULL OUTER join: customer-count per nation vs supplier-count
    per nation, keeping nations present on either side only."""
    c, s = t["customer"], t["supplier"]
    cn = c.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return cn.join(sn, cn.nk_c == sn.nk_s, "full").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


_ORDER_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def pivot_order_counts(t: dict[str, DataFrame]) -> DataFrame:
    """status × priority count matrix. The pivot values are given
    explicitly — Spark then skips the extra distinct-scan job, and at
    100 TB that's one full pass saved. Missing combos become 0 (Spark
    pivots yield NULL; filled for parity with COUNT FILTER oracles)."""
    o = t["orders"]
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _ORDER_PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _ORDER_PRIORITIES)
    )


def bag_ops_nation_keys(t: dict[str, DataFrame]) -> DataFrame:
    """Multiset set-ops (INTERSECT ALL / EXCEPT ALL) over customer vs
    supplier nation keys — duplicates preserved, unlike §set_ops'
    distinct forms."""
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    # deterministic small customer subset so EXCEPT ALL is non-empty
    # (suppliers per nation usually outnumber a 500-key customer slice)
    c_small = (
        t["customer"]
        .where(F.col("c_custkey") <= 500)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.intersectAll(s).withColumn("op", F.lit("intersect_all"))
        .unionByName(s.exceptAll(c_small).withColumn("op", F.lit("except_all")))
        .select("op", "nationkey")
    )


def scalar_array_map_funcs(t: dict[str, DataFrame]) -> DataFrame:
    """Array/map scalar functions: construct, sort, slice, membership,
    keyed lookup — emitted as primitives so the oracle hash is
    engine-neutral (array/map binary layouts differ across engines)."""
    o = t["orders"]
    arr = F.array(
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        (F.col("o_orderkey") % 10).cast("string"),
    )
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("prio"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.size(arr).alias("arr_len"),
        F.array_contains(arr, "O").alias("has_open"),
        F.element_at(F.sort_array(arr), 1).alias("arr_min"),
        F.array_join(F.slice(F.sort_array(arr, asc=False), 1, 2), "|").alias("top2"),
        F.element_at(m, F.lit("prio")).alias("prio_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# Subquery shapes (correlated EXISTS / correlated & global scalar subqueries)
# ---------------------------------------------------------------------------

def exists_late_shipment_orders(
    t: dict[str, DataFrame],
    lateness_days: int = 30,
    date_band: tuple[str, str] | None = None,
    count_alias: str = "n_orders",
) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape, adapted to this schema):
    count orders per priority having at least one line shipped more
    than ``lateness_days`` after the order date, optionally
    restricted to orders in a ``[lo, hi)`` date band (published Q4
    scans one quarter). The correlation (l_shipdate > o_orderdate +
    N days) rides the orderkey equi-join as a left-semi post-filter,
    so the plan stays hash-join shaped. ONE implementation backs both
    registry rows (`exists_late_shipment_orders` — bandless, 30 days
    — and `q4_priority_late_ship` — banded, 60 days; r12 review
    finding: the two had drifted into near-duplicate siblings)."""
    o, l = t["orders"], t["lineitem"]
    if date_band is not None:
        lo, hi = date_band
        o = o.where(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        )
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (
            l.l_shipdate
            > F.col("o_orderdate") + F.expr(f"INTERVAL {lateness_days} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias(count_alias)
    )


def lineitem_below_partavg(t: dict[str, DataFrame]) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): revenue of lines
    whose quantity is below half their part's average quantity.
    Expressed as groupBy + equi-join back (the decorrelated plan every
    optimizer lowers Q17 to — one shuffle on partkey, no per-row
    subquery execution)."""
    l = t["lineitem"]
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(part_avg, l.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            _r(F.sum("l_extendedprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def orders_above_global_avg(t: dict[str, DataFrame]) -> DataFrame:
    """Global scalar subquery: per-priority count and revenue of orders
    priced over 1.5x the global average. The average is a 1-row
    aggregate cross-joined into the plan (broadcast nested loop of a
    single row — no driver-side action, same pattern as TF-IDF's N)."""
    o = t["orders"]
    avg_ = o.agg(F.avg("o_totalprice").alias("global_avg"))
    return (
        o.crossJoin(F.broadcast(avg_))
        .where(F.col("o_totalprice") > 1.5 * F.col("global_avg"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _r(F.sum("o_totalprice")).alias("total_price"),
        )
    )


def price_percentiles_by_priority(t: dict[str, DataFrame]) -> DataFrame:
    """Exact interpolated percentiles (median / p90) per priority —
    ``percentile_cont`` semantics on both engines."""
    o = t["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _r(F.percentile("o_totalprice", F.lit(0.5))).alias("p50_price"),
        _r(F.percentile("o_totalprice", F.lit(0.9))).alias("p90_price"),
    )


# ---------------------------------------------------------------------------
# Wider TPC-H-shape coverage (r2): Q10/Q14/Q18/Q19 adaptations + temporal agg
# ---------------------------------------------------------------------------

def q10_returned_revenue(t: dict[str, DataFrame], top_k: int = 20) -> DataFrame:
    """Top-k customers by revenue on returned items (TPC-H Q10 shape).

    Fact-fact joins shuffle on orderkey/custkey; the returnflag filter
    is pushed to the lineitem scan so only the 'R' fraction rides the
    first shuffle; nation broadcasts. Total order (revenue DESC,
    custkey ASC) keeps LIMIT deterministic across engines."""
    l, o, c, n = t["lineitem"], t["orders"], t["customer"], t["nation"]
    return (
        l.where(F.col("l_returnflag") == "R")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(top_k)
    )


def q6_forecast_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """Forecast-revenue change (TPC-H Q6 shape): one scan, three
    ANDed predicates, one global sum — the pushdown showcase. All
    three filters (shipdate band, discount band, quantity cap) are
    plain column comparisons, so they reach the parquet scan as
    PushedFilters and row groups outside the year are skipped on
    statistics; zero shuffles before the 1-row combine. (Q8 joins all
    eight tables and needs no partsupp — see q8_market_share; Q2/Q9
    run as documented adaptations since partsupp is absent.)"""
    l = t["lineitem"]
    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1996-01-01").cast("timestamp")
    return (
        l.where(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            _r(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q14_promo_revenue_share(t: dict[str, DataFrame]) -> DataFrame:
    """Promo revenue share (TPC-H Q14 shape): one-row conditional-sum
    ratio over lineitem x part in a one-year shipdate band. Part is
    the smaller side -> broadcastable dim at bench SF, shuffle join at
    100 TB; the date filter prunes the fact scan."""
    l, p = t["lineitem"], t["part"]
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(p, l.l_partkey == p.p_partkey)
        .agg(
            _r(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q18_large_orders(t: dict[str, DataFrame], min_qty: float = 300.0) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): aggregate-HAVING on the
    fact table, then join the survivors back to orders + customer.
    The groupBy-HAVING shrinks the fact side to the heavy tail BEFORE
    any dimension join, so the expensive joins see only qualifying
    orderkeys."""
    l, o, c = t["lineitem"], t["orders"], t["customer"]
    big = (
        l.groupBy("l_orderkey")
        .agg(_r(F.sum("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    return (
        big.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            _r(F.col("o_totalprice")).alias("o_totalprice"),
            "total_qty",
        )
    )


def q19_disjunctive_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """Disjunctive-predicate revenue (TPC-H Q19 shape): OR of brand x
    quantity-band x size-band conjunctions across the lineitem x part
    join. Exercises CNF conversion / partial predicate pushdown: each
    disjunct's part-only conjuncts can prune the build side while the
    mixed conjuncts evaluate post-join."""
    l, p = t["lineitem"], t["part"]
    j = l.join(p, l.l_partkey == p.p_partkey)
    q, sz = F.col("l_quantity"), F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#11") & q.between(1, 15) & sz.between(1, 10))
        | ((F.col("p_brand") == "Brand#22") & q.between(10, 25) & sz.between(1, 20))
        | ((F.col("p_brand") == "Brand#3") & q.between(20, 40) & sz.between(1, 30))
    )
    return j.where(cond).agg(
        _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def monthly_order_volume(t: dict[str, DataFrame]) -> DataFrame:
    """Temporal rollup: per-month order count / revenue / open share.
    date_trunc derives the grouping key in the scan projection (no
    pre-shuffle explode); the shuffle carries one row per month after
    map-side partial aggregation."""
    o = t["orders"]
    return (
        o.groupBy(F.trunc("o_orderdate", "month").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _r(F.sum("o_totalprice")).alias("revenue"),
            _r(F.avg(F.when(F.col("o_orderstatus") == "O", 1.0).otherwise(0.0))).alias(
                "open_share"
            ),
        )
    )


def q7_nation_volume(t: dict[str, DataFrame]) -> DataFrame:
    """Bilateral trade volume between two nation pairs by ship year
    (TPC-H Q7 shape): fact joins shuffle on order/supp keys; both
    nation lookups broadcast; the OR-pair predicate lands after the
    joins (non-pushable by definition — it spans both sides)."""
    l, o, c, s, n = t["lineitem"], t["orders"], t["customer"], t["supplier"], t["nation"]
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("sk"))
        .join(n2, F.col("c_nationkey") == F.col("ck"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q11_important_nations(t: dict[str, DataFrame], fraction: float = 0.04) -> DataFrame:
    """Supplier nations carrying more than ``fraction`` of global
    line value (TPC-H Q11 shape: grouped HAVING vs a global scalar).
    The global total is a 1-row aggregate cross-joined in — computed
    in the same job, not a driver-side action."""
    l, s, n = t["lineitem"], t["supplier"], t["nation"]
    value = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice")).alias("val"))
    )
    total = value.agg(F.sum("val").alias("tot"))
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.col("val") > fraction * F.col("tot"))
        .select("n_name", _r(F.col("val")).alias("value"), _r(F.col("val") / F.col("tot")).alias("share"))
    )


def q4_priority_late_ship(t: dict[str, DataFrame]) -> DataFrame:
    """Order-priority checking, the FULL TPC-H Q4 rung (the last of
    the 22 shapes): the correlated-EXISTS lateness count over a
    one-year order band — i.e. `exists_late_shipment_orders` plus the
    date-band element the published query has and the bandless row
    lacks. Lateness is re-expressed on l_shipdate vs o_orderdate + 60
    days (the synthetic lineitem has no commit/receipt dates); the
    SHAPE (date-banded fact, correlated existential on the child fact,
    group on the enum) is what the rung exercises. Scale notes in the
    shared implementation."""
    return exists_late_shipment_orders(
        t,
        lateness_days=60,
        date_band=("1995-01-01", "1996-01-01"),
        count_alias="order_count",
    )

def q12_priority_by_status(t: dict[str, DataFrame]) -> DataFrame:
    """Conditional-count split per line status (TPC-H Q12 shape:
    CASE-aggregation after a fact-fact join, date-banded)."""
    l, o = t["lineitem"], t["orders"]
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q13_order_count_distribution(t: dict[str, DataFrame]) -> DataFrame:
    """Customer distribution by order count INCLUDING zero-order
    customers (TPC-H Q13 shape: left join -> per-customer count ->
    histogram of counts — two chained aggregations)."""
    c, o = t["customer"], t["orders"]
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q16_supplier_counts(t: dict[str, DataFrame]) -> DataFrame:
    """Distinct supplier count per (brand, size) excluding suppliers
    in a NOT-IN subquery (TPC-H Q16 shape; lineitem stands in for
    partsupp). The exclusion runs as a left_anti join — equivalent to
    SQL's null-aware NOT IN here because supplier keys are non-null
    (with nullable keys, SQL NOT IN returns empty on any NULL; the
    DuckDB oracle uses NOT IN and the hashes agree)."""
    l, p, s = t["lineitem"], t["part"], t["supplier"]
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        l.select("l_partkey", "l_suppkey")
        .join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .dropDuplicates(["l_partkey", "l_suppkey"])
    )
    return (
        pairs.join(p, pairs.l_partkey == p.p_partkey)
        .where(F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q22_idle_rich_customers(t: dict[str, DataFrame]) -> DataFrame:
    """Above-average-balance customers with no OPEN orders, grouped
    by nation (TPC-H Q22 shape: global filtered-avg scalar subquery +
    NOT EXISTS anti join). The open-order variant keeps the anti join
    non-vacuous on this testdata (every customer has some order)."""
    c, o = t["customer"], t["orders"]
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    open_orders = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(open_orders, c.c_custkey == open_orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


def q15_top_revenue_suppliers(t: dict[str, DataFrame]) -> DataFrame:
    """Supplier(s) with the maximum 3-month revenue (TPC-H Q15 shape:
    aggregate view joined against its own 1-row max — ties included,
    so the result is deterministic without ordering)."""
    l, s = t["lineitem"], t["supplier"]
    rev = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", _r(F.col("total_rev")).alias("total_revenue"))
    )


def q17_small_quantity_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """Avg-yearly revenue loss from small-quantity promo-part orders
    (TPC-H Q17 shape: correlated per-part average threshold,
    decorrelated into a grouped agg + join)."""
    l, p = t["lineitem"], t["part"]
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p.where(F.col("p_type") == "PROMO")), l.l_partkey == p.p_partkey)
        .join(part_avg, l.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            _r(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q20_promo_heavy_suppliers(t: dict[str, DataFrame], factor: float = 1.05) -> DataFrame:
    """Suppliers whose total shipped PROMO quantity exceeds ``factor``
    x the all-supplier average (TPC-H Q20 shape: nested IN over a
    grouped-HAVING-vs-scalar subquery -> semi join against an
    aggregate). The relative threshold keeps the filter selective at
    every scale factor."""
    l, p, s, n = t["lineitem"], t["part"], t["supplier"], t["nation"]
    qty = (
        l.join(F.broadcast(p.where(F.col("p_type") == "PROMO")), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    avg_qty = qty.agg(F.avg("qty").alias("aq"))
    heavy = (
        qty.crossJoin(F.broadcast(avg_qty))
        .where(F.col("qty") > factor * F.col("aq"))
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


def q21_waiting_orders_suppliers(t: dict[str, DataFrame], late_days: int = 60) -> DataFrame:
    """Suppliers who were the ONLY late shipper on a finished
    multi-supplier order (TPC-H Q21 shape: EXISTS + NOT EXISTS
    against the same fact at different correlations). Late =
    shipped > ``late_days`` after order date (this testdata has no
    commit/receipt dates)."""
    l, o, s = t["lineitem"], t["orders"], t["supplier"]
    lines = l.join(
        o.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
        l.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        # interval add (not date_add) — o_orderdate is a TIMESTAMP and
        # the oracle's `+ INTERVAL n DAY` keeps its time-of-day
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")).alias("late"),
    )
    l1 = lines.where(F.col("late")).select("l_orderkey", "l_suppkey").dropDuplicates()
    others = lines.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).dropDuplicates()
    late_others = lines.where(F.col("late")).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    ).dropDuplicates()
    waiting = (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q8_market_share(
    t: dict[str, DataFrame],
    share_nation: str = "NATION_1",
    region: str = "AMERICA",
    p_type: str = "ECONOMY",
) -> DataFrame:
    """National market share by order year (TPC-H Q8 — the full
    eight-table join; needs no partsupp, contrary to the r4 note on
    q6). Volume flows lineitem->orders->customer->nation->region
    (demand side) and lineitem->supplier->nation (supply side); the
    share is the supply nation's conditional-sum fraction per year.
    All four dimension lookups broadcast; the two fact joins shuffle
    on their keys; the type/region/date filters push into the scans."""
    l, o, c, s, p = t["lineitem"], t["orders"], t["customer"], t["supplier"], t["part"]
    n, r = t["nation"], t["region"]
    n_cust = F.broadcast(
        n.select(F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("crk"))
    )
    n_supp = F.broadcast(
        n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    )
    reg = F.broadcast(r.where(F.col("r_name") == region).select("r_regionkey"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p.where(F.col("p_type") == p_type).select("p_partkey")),
               l.l_partkey == F.col("p_partkey"))
        .join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(n_cust, F.col("c_nationkey") == F.col("ck"))
        .join(reg, F.col("crk") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n_supp, F.col("s_nationkey") == F.col("sk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            _r(
                F.sum(F.when(F.col("supp_nation") == share_nation, vol).otherwise(0.0))
                / F.sum(vol)
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q9_product_profit(t: dict[str, DataFrame], name_token: str = "gear") -> DataFrame:
    """Product-line profit by supplier nation and year (TPC-H Q9
    shape, ADAPTED: this schema has no partsupp, so unit cost is
    proxied as 10% of p_retailprice — the plan shape, a five-table
    join with a LIKE-filtered part dim and a two-key rollup, is the
    point; the oracle applies the identical formula). Part filter
    broadcasts; profit = sum(rev - cost*qty) per (nation, year)."""
    l, o, s, p, n = t["lineitem"], t["orders"], t["supplier"], t["part"], t["nation"]
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(
            F.broadcast(
                p.where(F.col("p_name").contains(name_token)).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            l.l_partkey == F.col("p_partkey"),
        )
        .join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_r(F.sum(profit)).alias("sum_profit"), F.count(F.lit(1)).alias("n_lines"))
    )


def q2_best_region_supplier(
    t: dict[str, DataFrame],
    region: str = "EUROPE",
    sizes: tuple = (1, 9, 23, 45),
) -> DataFrame:
    """Best supplier per part within a region (TPC-H Q2 shape,
    ADAPTED: no partsupp table, so lineitem's distinct
    (partkey, suppkey) pairs are the supplies-relation and max
    s_acctbal stands in for min ps_supplycost). Keeps Q2's defining
    structure — a correlated per-part aggregate subquery whose result
    joins back against the same relation, restricted to one region —
    as a groupBy + self-join (the decorrelated plan every engine
    lowers Q2 to). Ties on the max emit all tied suppliers, same as
    SQL Q2."""
    l, s, p, n, r = t["lineitem"], t["supplier"], t["part"], t["nation"], t["region"]
    eu_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.where(F.col("r_name") == region).select("r_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    supplies = l.select("l_partkey", "l_suppkey").dropDuplicates()
    cand = supplies.join(eu_sup, supplies.l_suppkey == eu_sup.s_suppkey)
    best = cand.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.max("s_acctbal").alias("best_bal")
    )
    return (
        cand.join(
            best,
            (cand.l_partkey == F.col("bp")) & (cand.s_acctbal == F.col("best_bal")),
        )
        .join(
            F.broadcast(p.where(F.col("p_size").isin(*sizes))),
            cand.l_partkey == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "p_brand",
            F.col("p_size").cast("int").alias("p_size"),
            "s_name",
            "n_name",
            _r(F.col("s_acctbal")).alias("s_acctbal"),
        )
    )


def supplier_pareto_share(t: dict[str, DataFrame]) -> DataFrame:
    """Pareto / cumulative-concentration analysis: suppliers ranked by
    revenue with each one's running share of the total and the 80%%-
    head flag — "how few suppliers carry 80%% of the value". The
    cumulative-distribution window shape (running sum over a total
    order) the relational sweep did not yet cover.

    Determinism: per-supplier revenue is rounded to 4 decimals FIRST,
    then the running sum adds the identical doubles in the identical
    total order (revenue DESC, s_suppkey ASC) on both engines, so the
    cumulative values match bit-for-bit. The global window runs over
    the supplier-cardinality aggregate (dimension-sized), not raw
    rows."""
    l, s = t["lineitem"], t["supplier"]
    rev = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("s_suppkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = rev.agg(F.sum("revenue").alias("_tot"))
    return (
        rev.join(F.broadcast(total))
        .select(
            "s_suppkey",
            "s_name",
            "revenue",
            F.row_number().over(
                Window.orderBy(F.desc("revenue"), F.asc("s_suppkey"))
            ).cast("int").alias("rank"),
            _r(F.sum("revenue").over(w) / F.col("_tot")).alias("cum_share"),
            (F.sum("revenue").over(w) / F.col("_tot") <= 0.8).alias("in_head_80"),
        )
    )


def orders_yoy_growth(t: dict[str, DataFrame]) -> DataFrame:
    """Year-over-year revenue growth: yearly rollup + lag window —
    the time-series comparison shape (LAG over an aggregated series).
    First year reports NULL growth."""
    o = t["orders"]
    yearly = o.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        _r(F.sum("o_totalprice")).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("o_year")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "o_year",
        "revenue",
        "n_orders",
        _r((F.col("revenue") - prev) / prev).alias("yoy_growth"),
    )


def brand_cooccurrence_lift(t: dict[str, DataFrame], min_pairs: int = 10) -> DataFrame:
    """Market-basket association over order contents: for every brand
    pair ordered together at least ``min_pairs`` times, the lift
    ``P(a,b) / (P(a) P(b))`` — the frequent-itemset-lite co-occurrence
    statistic (basket = order, item = part brand).

    Scale shape: baskets collapse to DISTINCT (order, brand) first —
    the self-join key is the ORDER, whose group size is the (small,
    bounded) number of distinct brands in one order, so the pair
    explosion is C(brands_per_order, 2) per order, never corpus-
    quadratic; brand marginals are a tiny broadcast. Lift is computed
    with the floor-rounding contract on exact integer products
    (n_ab * N and n_a * n_b stay far below 2^53 at any realistic
    brand cardinality)."""
    l, p = t["lineitem"], t["part"]
    ob = (
        l.join(p.select("p_partkey", "p_brand"), l.l_partkey == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .dropDuplicates()
    )
    n_orders = ob.select(F.count_distinct("ok").alias("_n"))
    marg = ob.groupBy(F.col("brand")).agg(F.count(F.lit(1)).alias("n"))
    a = ob.select("ok", F.col("brand").alias("brand_a"))
    b = ob.select("ok", F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pairs)
    )
    ma = F.broadcast(marg.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a")))
    mb = F.broadcast(marg.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b")))
    from sparklyclean_spark.functions.rounding import ratio4

    return (
        pairs.join(ma, "brand_a")
        .join(mb, "brand_b")
        .join(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            "n_a",
            "n_b",
            ratio4(F.col("n_ab") * F.col("_n"), F.col("n_a") * F.col("n_b")).alias("lift"),
        )
    )


def daily_revenue_rolling7(t: dict[str, DataFrame]) -> DataFrame:
    """Daily order revenue with a trailing 7-day rolling mean — the
    time-series smoothing shape (RANGE frame over a day axis, so
    calendar gaps are honored: a missing day shrinks the window
    rather than silently stretching it the way a ROWS frame would).

    Hash-stable arithmetic: the daily SUM(double) is snapped to an
    exact 1e-4 grid as a BIGINT (``floor(sum*10000+0.5)``) BEFORE the
    rolling sum, so the window aggregation is exact integer addition
    in any engine and any frame-evaluation order (segment trees vs
    sequential scans cannot move the result); the mean then divides
    two exact integers with the repo's floor contract.

    Scale: one hash agg to days (map-side combinable), then a window
    over the (tiny, bounded: #days) daily series — the window input
    is the AGGREGATE, never the raw fact table.
    """
    o = t["orders"]
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.floor(F.sum("o_totalprice") * 10000.0 + 0.5)
        .cast("bigint")
        .alias("_rev_e4"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    day_num = F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long")
    w = (
        Window.orderBy(day_num)
        .rangeBetween(-6, Window.currentRow)
    )
    roll_sum = F.sum("_rev_e4").over(w)
    roll_days = F.count(F.lit(1)).over(w)
    return daily.select(
        "day",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        (F.col("_rev_e4") / 10000.0).alias("revenue"),
        F.col("_rev_e4").alias("revenue_e4"),
        (F.floor(roll_sum / roll_days + 0.5) / 10000.0).alias("roll7_mean"),
        roll_days.cast("bigint").alias("roll7_days"),
    )


def rfm_segments(t: dict[str, DataFrame]) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary):
    per-customer metrics quintiled with NTILE(5) and aggregated to
    the 125-cell segment grid — the classic CRM cube.

    Determinism: every NTILE order is made TOTAL with the customer
    key as tiebreak (NTILE on a non-total order is engine-dependent
    at ties); recency is exact integer days against the corpus's own
    max order date; monetary is snapped to the 1e-4 integer grid
    before ranking and summing, so the output is hash-exact.

    Scale: one hash agg to customers, then three NTILE windows over
    the CUSTOMER aggregate (|customers| rows, not |orders|) sharing
    one global sort each — the documented exact-rank shape; at
    corpus scale swap NTILE for approx-percentile bucket joins. The
    final cube agg is bounded at 5^3 cells.
    """
    o = t["orders"]
    gmax = o.agg(F.max(F.to_date("o_orderdate")).alias("_gmax"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.floor(F.sum("o_totalprice") * 10000.0 + 0.5)
            .cast("bigint")
            .alias("_money_e4"),
        )
        .join(F.broadcast(gmax))
        .select(
            "o_custkey",
            F.datediff(F.col("_gmax"), F.col("_last"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "_money_e4",
        )
    )
    r_tile = F.ntile(5).over(
        Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    )
    f_tile = F.ntile(5).over(
        Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    )
    m_tile = F.ntile(5).over(
        Window.orderBy(F.desc("_money_e4"), F.asc("o_custkey"))
    )
    tiled = per.select(
        r_tile.alias("r_tile"),
        f_tile.alias("f_tile"),
        m_tile.alias("m_tile"),
        "_money_e4",
    )
    return tiled.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        (F.sum("_money_e4") / 10000.0).alias("total_monetary"),
    )


def revenue_gini(t: dict[str, DataFrame]) -> DataFrame:
    """Gini coefficient of revenue concentration across customers —
    the single-number inequality readout behind the Pareto share
    table (0 = perfectly even, →1 = one whale). One result row:
    ``(n_customers, total_revenue, gini)`` from the rank formula
    ``G = 2·Σ(i·x_i) / (n·Σx) - (n+1)/n`` over ascending revenue.

    Hash-stable: per-customer revenue snaps to the 1e-4 integer grid
    before ranking; ranks are total (revenue, custkey); every sum is
    exact integer arithmetic (the rank-weighted sum stays below 2^63
    up to ~10^8 customers at 10^6 revenue — beyond that switch the
    accumulators to DECIMAL(38,0)); the final two divides are single
    IEEE ops.

    Scale: one hash agg to customers, ONE global sort of the customer
    aggregate for ranks (the documented exact-rank trade), one 1-row
    aggregate.
    """
    o = t["orders"]
    per = o.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 10000.0 + 0.5)
        .cast("bigint")
        .alias("_m")
    )
    i = F.row_number().over(
        Window.orderBy(F.asc("_m"), F.asc("o_custkey"))
    ).cast("bigint")
    ranked = per.select("_m", (i * F.col("_m")).alias("_im"))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_m").alias("_s"),
        F.sum("_im").alias("_si"),
    )
    gini = F.when(
        F.col("_s") > 0,
        2.0 * F.col("_si") / (F.col("_n") * F.col("_s"))
        - (F.col("_n") + 1) / F.col("_n"),
    )
    return agg.select(
        F.col("_n").cast("bigint").alias("n_customers"),
        (F.col("_s") / 10000.0).alias("total_revenue"),
        (F.floor(gini * 10000.0 + 0.5) / 10000.0).alias("gini"),
    )
