"""Generic relational operators at bench scale — the engine's join/agg/
sort/top-k surface exercised over the TPC-H-ish star schema.

The reference's operator inventory (SURVEY.md §2.3-2.6) is J1/J2 joins,
hash aggregation, multi-key sort, distinct and union; these queries run
the same operators through deeper plans (multi-way joins, semi/anti
joins, deterministic top-k) so the physical strategies that matter at
100 TB — broadcast vs shuffle join selection, partial aggregation,
AQE re-planning — are all on the bench path.

Float-determinism note: big SUMs aggregate ``decimal(18,4)``-cast terms
(exact, order-independent) and cast the total back to double, so results
are bit-identical regardless of partitioning; AVGs stay double and are
rounded by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.rounding import dmean, round4
from uk_housing_dashboard_etl_spark.functions.topk import deterministic_topk


def _dsum(expr) -> F.Column:
    """Order-independent sum, deterministic across engines: scale each term
    to an integer number of 1e-4 units (both engines round the identical
    IEEE double), sum exactly as bigint, and descale to double. Immune to
    partitioning/AQE re-plans and to engine-specific double→decimal
    rounding paths."""
    units = F.round(expr * F.lit(10000.0)).cast("bigint")
    return (F.sum(units).cast("double") / F.lit(10000.0))


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1 shape: scan-filter + hash agg with partial aggregation.

    Catalyst pushes the shipdate filter to the parquet scan; the groupBy
    key has 6 distinct values, so map-side combine collapses virtually
    all rows before the shuffle.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            dmean(F.col("l_quantity")).alias("avg_qty"),
            dmean(F.col("l_extendedprice")).alias("avg_price"),
            dmean(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, dims broadcast, facts shuffle-joined.

    region→nation→customer prune the build side before it ever touches
    the fact tables; supplier must share the customer's nation (the
    classic Q5 co-location predicate).
    """
    dims = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    supp = supplier.select("s_suppkey", "s_nationkey")
    joined = (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("s_nationkey") == F.col("c_nationkey"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("n_name").agg(_dsum(revenue).alias("revenue"))


def top_customers_by_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape + deterministic top-k.

    Revenue is rounded BEFORE ranking and ties break on the key, so the
    cut is stable across engines/partitionings. Top-k runs as
    TakeOrderedAndProject over the customer-grain frame (per-partition
    k-row heaps — no global sort, no single-partition window; see
    functions/topk.py), and the rank column is attached over the k
    survivors only.
    """
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_cust = (
        lineitem.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(round4(_dsum(revenue)).alias("revenue"))
    )
    ranked = deterministic_topk(
        per_cust, [F.col("revenue").desc(), F.col("o_custkey")], k
    )
    return (
        ranked.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .select(
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment"),
            F.col("revenue"),
            F.col("rank"),
        )
    )


def revenue_forecast_filter(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.05,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, the pushdown
    microbenchmark — every predicate must reach the parquet scan and the
    result is a single global sum (fully map-side combinable)."""
    revenue = F.col("l_extendedprice") * F.col("l_discount")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(_dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1996-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered 3-way join + per-order revenue +
    deterministic top-k (rounded revenue desc, orderkey asc)."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_order = (
        lineitem.where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(round4(_dsum(revenue)).alias("revenue"))
    )
    ranked = deterministic_topk(
        per_order, [F.col("revenue").desc(), F.col("o_orderkey")], k
    )
    return ranked.select("o_orderkey", "o_orderdate", "revenue", "rank")


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Upsert-style dedup: keep each key's latest row by ``order_col``
    (deterministic tie-break). The standard CDC-compaction / SCD-1
    operator — one window shuffle on the key, no join."""
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tie_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then count by priority."""
    flagged = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(flagged, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def customers_without_orders(
    customer: DataFrame,
    orders: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """NOT EXISTS → left-anti join, counted per market segment."""
    active = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_custkey")
    return (
        customer.join(active, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("inactive_customers"))
    )


def brand_revenue(part: DataFrame, lineitem: DataFrame, min_size: int = 10) -> DataFrame:
    """Broadcast dim join (part) + hash agg per brand."""
    dims = part.where(F.col("p_size") >= min_size).select("p_partkey", "p_brand")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.select("l_partkey", "l_extendedprice", "l_discount", "l_quantity")
        .join(F.broadcast(dims), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            _dsum(revenue).alias("revenue"),
            _dsum(F.col("l_quantity")).alias("total_qty"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q14 shape: conditional-numerator ratio over one joined scan.

    Numerator and denominator are both exact integer-unit sums from the
    SAME aggregate (no second pass, no join of two aggregates), so the
    percentage is one deterministic double division.
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    promo = _dsum(F.when(F.col("p_type") == "PROMO", rev))
    total = _dsum(rev)
    return joined.agg(
        round4(F.lit(100.0) * promo / total).alias("promo_revenue_pct"),
        round4(promo).alias("promo_revenue"),
        round4(total).alias("total_revenue"),
    )


def large_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a fact-grain aggregate, then join the
    survivors back to their order/customer rows.

    The quantity aggregate runs at order grain BEFORE any join — the
    HAVING filter kills ~99% of orders, so only the survivors (a
    dim-sized frame, broadcastable) meet the orders/customer tables.
    """
    per_order = (
        lineitem.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(
            F.broadcast(per_order), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            round4(F.col("o_totalprice")).alias("o_totalprice"),
            "total_qty",
        )
    )


def idle_capital(
    customer: DataFrame, orders: DataFrame, min_order: float = 300_000.0
) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS, grouped.

    Customers with above-average positive balance who never placed a
    large (> ``min_order``) order, summarized per nation. The scalar
    average broadcasts (1-row cross join); the anti join expresses
    NOT EXISTS without materializing order rows — the big-order filter
    pushes to the orders scan before the anti join's build side.
    """
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        dmean(F.col("c_acctbal")).alias("__avg_bal")
    )
    rich = (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    idle = rich.join(
        orders.where(F.col("o_totalprice") > min_order).select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        round4(_dsum(F.col("c_acctbal"))).alias("total_acctbal"),
    )


def top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: aggregate-of-aggregate — supplier(s) whose
    quarterly revenue equals the global maximum.

    Revenue is rounded before the max/equality so the comparison is on
    engine-identical doubles; the 1-row max broadcasts back onto the
    supplier-grain frame (no global sort, no window).
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(round4(_dsum(rev)).alias("total_revenue"))
    )
    max_rev = per_supp.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "s_nationkey", "total_revenue")
    )
