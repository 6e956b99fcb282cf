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

from uk_housing_dashboard_etl_spark.functions.guards import finite_or_null
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

    Non-finite measure terms leave each sum/mean like NULLs (the
    integer-unit quantization saturates/overflows otherwise — r13
    sweep) while ``count_order`` still counts the row; the oracle
    guards the identical expressions.
    """
    fin = finite_or_null
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(fin(F.col("l_quantity"))).alias("sum_qty"),
            _dsum(fin(F.col("l_extendedprice"))).alias("sum_base_price"),
            _dsum(fin(disc_price)).alias("sum_disc_price"),
            _dsum(fin(charge)).alias("sum_charge"),
            dmean(fin(F.col("l_quantity"))).alias("avg_qty"),
            dmean(fin(F.col("l_extendedprice"))).alias("avg_price"),
            dmean(fin(F.col("l_discount"))).alias("avg_disc"),
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
    return joined.groupBy("n_name").agg(
        _dsum(finite_or_null(revenue)).alias("revenue")
    )


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
        # non-finite revenue terms leave the sum like NULLs (r13
        # correlated in-filter probe)
        .agg(round4(_dsum(finite_or_null(revenue))).alias("revenue"))
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
        .agg(
            # non-finite revenue terms leave the sum like NULLs (r13
            # in-filter probe)
            _dsum(finite_or_null(revenue)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
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
        .agg(round4(_dsum(finite_or_null(revenue))).alias("revenue"))
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
    """Broadcast dim join (part) + hash agg per brand. Non-finite
    measure terms leave the sums like NULLs (r13 sweep); line_count
    still counts the row."""
    dims = part.where(F.col("p_size") >= min_size).select("p_partkey", "p_brand")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.select("l_partkey", "l_extendedprice", "l_discount", "l_quantity")
        .join(F.broadcast(dims), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            _dsum(finite_or_null(revenue)).alias("revenue"),
            _dsum(finite_or_null(F.col("l_quantity"))).alias("total_qty"),
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
    # non-finite revenue terms leave both sums like NULLs (r13
    # in-filter probe)
    promo = _dsum(F.when(F.col("p_type") == "PROMO", finite_or_null(rev)))
    total = _dsum(finite_or_null(rev))
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
    # non-finite quantities leave the per-order total like NULLs (r13
    # sweep) — the HAVING threshold then sees the finite remainder,
    # identically on both engines
    per_order = (
        lineitem.groupBy("l_orderkey")
        .agg(
            _dsum(finite_or_null(F.col("l_quantity"))).alias("total_qty")
        )
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
    # non-finite balances leave the mean like NULLs (r13 in-filter
    # probe: +Inf passes the > 0 predicate on both engines)
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        dmean(finite_or_null(F.col("c_acctbal"))).alias("__avg_bal")
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
        round4(_dsum(finite_or_null(F.col("c_acctbal")))).alias(
            "total_acctbal"
        ),
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
        # non-finite revenue terms leave the sum like NULLs (r13)
        .agg(round4(_dsum(finite_or_null(rev))).alias("total_revenue"))
    )
    max_rev = per_supp.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "s_nationkey", "total_revenue")
    )


def nation_pair_trade(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: cross-border revenue per (supplier nation,
    customer nation, ship year).

    The nation dim is joined TWICE under different roles — the classic
    self-aliased dimension. Both role joins broadcast (supplier and
    nation are tiny); only lineitem⋈orders and the order→customer hop
    shuffle, and AQE picks broadcast for the customer side when the
    filtered build fits. Group-by cardinality is |nations|² × years, so
    the aggregate is map-side-combine friendly at any scale.
    """
    supp_nation = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_nation = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust_nation, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            # non-finite revenue terms leave the sum like NULLs (r13)
            _dsum(finite_or_null(revenue)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_5",
    region_name: str = "ASIA",
    part_type: str = "STANDARD",
) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market per year.

    Numerator (target-nation supplier revenue) and denominator are the
    SAME aggregate pass — a conditional sum, never two joined aggregates
    (the cross-engine float-difference trap). All dims reduce before
    touching lineitem; the share division happens on two already-exact
    integer-unit sums.
    """
    asia_cust = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    typed_parts = part.where(F.col("p_type") == part_type).select("p_partkey")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lineitem.select("l_orderkey", "l_suppkey", "l_partkey",
                        "l_extendedprice", "l_discount")
        .join(F.broadcast(typed_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    target_rev = _dsum(
        F.when(F.col("supp_nation") == target_nation, finite_or_null(revenue))
    )
    total_rev = _dsum(finite_or_null(revenue))
    return (
        joined.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            round4(F.coalesce(target_rev, F.lit(0.0)) / total_rev).alias("mkt_share"),
            round4(total_rev).alias("total_revenue"),
        )
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part_type: str = "ECONOMY",
    cost_rate: float = 0.1,
) -> DataFrame:
    """TPC-H Q9 shape: profit by (supplier nation, order year).

    The testdata has no partsupp table, so supply cost is proxied as
    ``cost_rate · p_retailprice · l_quantity`` — same plan shape as
    canonical Q9 (fact ⋈ two dims ⋈ orders, then a wide-key agg),
    different constant. Profit terms quantize per-row to 1e-4 units
    before the sum, so partitioning never shifts the totals.
    """
    typed = part.where(F.col("p_type") == part_type).select(
        "p_partkey", "p_retailprice"
    )
    supp_nation = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(cost_rate) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
                        "l_extendedprice", "l_discount")
        .join(F.broadcast(typed), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            # non-finite profit terms leave the sum like NULLs (r13)
            _dsum(finite_or_null(profit)).alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def late_shipments(
    lineitem: DataFrame, orders: DataFrame, grace_days: int = 90
) -> DataFrame:
    """TPC-H Q12 shape: lateness-conditional priority counts per year.

    The testdata lineitem has no commit/receipt dates or shipmode
    (reference schema stops at shipdate), so "late" is adapted to
    ``l_shipdate > o_orderdate + grace_days`` and the Q12 CASE-count
    split (critical vs non-critical priority) is kept verbatim. One
    fact-fact equi-join, one low-cardinality agg.
    """
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {grace_days} DAYS"
    )
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .where(late)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("critical_lines"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("other_lines"),
        )
    )


def order_count_distribution(
    customer: DataFrame, orders: DataFrame, exclude_status: str = "P"
) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts.

    The left OUTER join keeps zero-order customers (the bucket Q13
    exists to expose); the canonical comment-pattern exclusion becomes
    an order-status exclusion. Two shuffles by design: fact-sized
    groupBy(custkey), then a tiny groupBy(n_orders).
    """
    kept = orders.where(F.col("o_orderstatus") != exclude_status).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(kept, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


def supplier_variety(
    part: DataFrame,
    lineitem: DataFrame,
    exclude_brand: str = "Brand#1",
    min_size: int = 1,
    max_size: int = 15,
) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part attribute class.

    No partsupp table exists, so the part↔supplier relation is derived
    from shipped lineitems. countDistinct expands to the standard
    two-phase expand/agg plan; the part filter prunes the broadcast
    build side before the fact scan is touched.
    """
    dims = part.where(
        (F.col("p_brand") != exclude_brand)
        & F.col("p_size").between(min_size, max_size)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(dims), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def small_qty_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#3",
    qty_frac: float = 0.2,
    years: float = 7.0,
) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in below-average-quantity orders.

    The correlated scalar subquery (per-part avg quantity) becomes an
    aggregate + broadcast join-back — one pass over the brand-filtered
    lines to build thresholds, one to apply them. The threshold is
    rounded to 4dp BEFORE the comparison so the quantity cut is
    bit-identical across engines.
    """
    brand_parts = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        round4(dmean(finite_or_null(F.col("l_quantity")))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.lit(qty_frac) * F.col("avg_qty"))
        .agg(
            round4(
                _dsum(finite_or_null(F.col("l_extendedprice"))) / F.lit(years)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions join predicate.

    Catalyst extracts the common join key and pushes the residual
    disjunction to the joined rows; each branch pairs a part predicate
    (brand + size band) with a lineitem predicate (quantity band), so
    neither side's filter alone is selective — the point of Q19.
    """
    dims = part.select("p_partkey", "p_brand", "p_size")
    joined = lineitem.select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    ).join(F.broadcast(dims), F.col("l_partkey") == F.col("p_partkey"))
    branch = lambda b, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.where(
        branch("Brand#12", 1, 5, 1, 11)
        | branch("Brand#23", 1, 10, 10, 20)
        | branch("Brand#15", 1, 15, 20, 30)
    ).agg(
        round4(_dsum(finite_or_null(revenue))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def slow_suppliers(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q21 shape: the sole laggard supplier per multi-supplier order.

    Adapted to the reference schema (no commit/receipt dates): a
    supplier "kept the order waiting" when its latest shipment is the
    order's latest AND no other supplier ships that late — the EXISTS /
    NOT EXISTS pair re-expressed as window counts over the order, which
    costs ONE shuffle by l_orderkey instead of two self-joins.

    The explicit repartition by l_orderkey makes the (orderkey, suppkey)
    groupBy and both window passes share a single exchange: partitioning
    by a prefix of the grouping keys satisfies the aggregate's
    distribution, and Catalyst won't pick that narrower key on its own.
    """
    per_supp = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_supp.withColumn("order_last", F.max("last_ship").over(w))
        .withColumn("n_suppliers", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_at_last",
            F.sum(
                F.when(F.col("last_ship") == F.col("order_last"), 1).otherwise(0)
            ).over(w),
        )
        .where(
            (F.col("n_suppliers") >= 2)
            & (F.col("last_ship") == F.col("order_last"))
            & (F.col("n_at_last") == 1)
        )
    )
    return (
        flagged.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    frac: float = 0.001,
) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of shipped value.

    partsupp-free adaptation: per-part shipped value from one region's
    suppliers, kept when above ``frac`` of the regional total. The
    HAVING-vs-scalar-subquery becomes a 1-row broadcast cross join; both
    sides of the comparison derive from the same rounded per-part
    values, so the cut is engine-stable.
    """
    region_supp = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(region_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        # non-finite revenue terms leave the sum like NULLs (r13)
        .agg(round4(_dsum(finite_or_null(revenue))).alias("value"))
    )
    total = per_part.agg(
        (F.sum(F.round(F.col("value") * 10000.0).cast("bigint")).cast("double")
         / 10000.0).alias("__total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.lit(frac) * F.col("__total"))
        .select("l_partkey", "value")
    )


def min_cost_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
) -> DataFrame:
    """TPC-H Q2 shape: cheapest regional source per part.

    partsupp-free adaptation: a supplier's offer price for a part is its
    mean shipped unit price (extendedprice/quantity); the correlated
    min-cost subquery becomes min-over-window + equality, keeping ties
    exactly like canonical Q2. Unit prices are rounded before the min
    so tie sets match across engines.
    """
    region_supp = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )
    offers = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(F.broadcast(region_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "supp_nation")
        .agg(
            # non-finite unit prices (incl. x/0 from a zero quantity)
            # leave the mean like NULLs (r13 sweep)
            round4(
                dmean(
                    finite_or_null(
                        F.col("l_extendedprice") / F.col("l_quantity")
                    )
                )
            ).alias("unit_price")
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        offers.withColumn("__min_price", F.min("unit_price").over(w))
        .where(F.col("unit_price") == F.col("__min_price"))
        .select("l_partkey", "l_suppkey", "s_name", "supp_nation", "unit_price")
    )


def top_parts_per_nation(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Grouped top-k: each nation's k highest-revenue parts.

    The rank window runs on the AGGREGATED (nation, part) frame — a few
    hundred rows per nation at any fact-table size — never on lineitem
    itself, so the partitioned row_number is a cheap post-agg step, not a
    wide exchange. Revenue sums in exact 1e-4 integer units (``_dsum``)
    so the rank order is engine- and partitioning-independent; ties break
    on the part key.
    """
    per_part = (
        lineitem.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "l_partkey")
        .agg(
            # non-finite revenue terms leave the sum like NULLs (r13)
            _dsum(
                finite_or_null(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("revenue").desc(), F.col("l_partkey")
    )
    return (
        per_part.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("n_name", "l_partkey", "revenue", "rank")
    )


def modal_type_per_la(enriched: DataFrame) -> DataFrame:
    """Deterministic per-group mode: each LA's most common property type
    (count desc, then lexicographically smallest type — never the
    engine's arbitrary ``mode()`` tie pick). Runs on the (LA, type)
    aggregate, so the argmax window touches #LAs × #types rows."""
    counts = (
        enriched.where(
            F.col("local_authority").isNotNull() & F.col("prop_type").isNotNull()
        )
        .groupBy("local_authority", "prop_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("local_authority").orderBy(
        F.col("n").desc(), F.col("prop_type")
    )
    return (
        counts.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select(
            "local_authority",
            F.col("prop_type").alias("modal_type"),
            F.col("n").alias("n_sales"),
        )
    )


def price_deciles(enriched: DataFrame) -> DataFrame:
    """Equal-count decile banding of sale prices within each LA
    (ntile(10) over a total order — (price, transaction_id) — so bucket
    assignment is deterministic), rolled up to per-(LA, decile) counts
    and integer-unit mean price.

    Scale note: ntile needs the full per-LA sort; the grain is LA
    partitions (bounded, 100s), so the exchange is the same one the
    weekly mart already pays. For a truly skewed giant group, switch to
    percentile-boundary assignment (two tiny aggregates + broadcast
    compare) — same output, no per-group sort.

    Non-finite prices are excluded like NULLs at this operator boundary
    (r13 sweep: a single ±Inf row crashed the decile mean's bigint
    quantization; a decile band for NaN/Inf is meaningless anyway) —
    the oracle filters ``isfinite(price)`` in the same place.
    """
    p = F.col("price").cast("double")
    base = enriched.where(
        F.col("price").isNotNull()
        & F.col("local_authority").isNotNull()
        & ~F.isnan(p)
        & (F.abs(p) < F.expr("CAST('Infinity' AS DOUBLE)"))
    )
    w = Window.partitionBy("local_authority").orderBy(
        F.col("price"), F.col("transaction_id")
    )
    return (
        base.withColumn("decile", F.ntile(10).over(w))
        .groupBy("local_authority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round4(dmean(F.col("price"))).alias("avg_price"),
        )
    )


def lapsed_parts_by_brand(
    lineitem: DataFrame,
    part: DataFrame,
    active_from: str = "1996-01-01",
    active_to: str = "1996-07-01",
    lapsed_from: str = "1996-07-01",
    lapsed_to: str = "1997-01-01",
) -> DataFrame:
    """Set-difference shape: parts shipped in the first window but NOT in
    the second, counted per brand (churned-SKU report).

    ``subtract`` is EXCEPT DISTINCT — Catalyst plans it as an aggregate +
    left-anti hash join on the already-distinct (small) key sets, never
    a lineitem-vs-lineitem join.
    """

    def _shipped(frm: str, to: str) -> DataFrame:
        return (
            lineitem.where(
                (F.col("l_shipdate") >= F.lit(frm).cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(to).cast("timestamp"))
            )
            .select("l_partkey")
            .distinct()
        )

    lapsed = _shipped(active_from, active_to).subtract(
        _shipped(lapsed_from, lapsed_to)
    )
    return (
        lapsed.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("lapsed_parts"))
    )


def repeat_customers(orders: DataFrame, y1: int = 1995, y2: int = 1996) -> DataFrame:
    """INTERSECT set op: customers who ordered in BOTH years.

    Verified plan: Catalyst compiles ``intersect`` to a LeftSemi join
    (broadcast here — one year of custkeys is dim-sized) followed by a
    partial+final distinct, so the exchange carries unique custkeys, not
    orders. The year filter is written as a timestamp RANGE, not
    ``year(col) = y`` — a function over the column would evaluate
    row-by-row post-scan, while the range lands in the parquet scan's
    PushedFilters and prunes row groups by min/max stats.
    """
    def _year(y: int) -> DataFrame:
        return orders.where(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    return _year(y1).intersect(_year(y2))


def supplier_percentile(lineitem: DataFrame) -> DataFrame:
    """percent_rank + cume_dist over per-supplier revenue.

    The total-order window is the one construct that genuinely needs a
    single-partition sort — so it runs on the AGGREGATED frame (one row
    per supplier: dimension cardinality, not fact cardinality). Revenue
    is the deterministic integer-unit sum rounded to 4dp BEFORE ranking,
    with suppkey as tie-break, so ranks are engine-independent; the
    rank ratios are exact rationals evaluated identically in IEEE
    double. Never apply a global rank window to the raw fact table.
    """
    rev = lineitem.groupBy("l_suppkey").agg(
        # non-finite revenue terms leave the sum like NULLs (r13)
        round4(
            _dsum(
                finite_or_null(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            )
        ).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_suppkey"))
    return rev.select(
        "l_suppkey",
        "revenue",
        round4(F.percent_rank().over(w)).alias("revenue_pct_rank"),
        round4(F.cume_dist().over(w)).alias("revenue_cume_dist"),
    )


def active_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    since: str = "1998-01-01",
) -> DataFrame:
    """Suppliers with at least one shipment since the cutoff — LEFT SEMI
    join shape (EXISTS), enriched with nation via broadcast.

    Semi join is the right physical shape: Spark probes the (suppkey)
    build side without materializing any lineitem columns, and the fact
    side carries only l_suppkey post-pushdown. A naive inner-join +
    distinct would shuffle every matching lineitem row first; the semi
    join short-circuits on first match. The shipdate filter pushes to
    the parquet scan.
    """
    recent = lineitem.filter(
        F.col("l_shipdate") >= F.lit(since).cast("timestamp")
    ).select("l_suppkey")
    return (
        supplier.join(recent, supplier.s_suppkey == recent.l_suppkey, "left_semi")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


def trimmed_stats(
    orders: DataFrame,
    group_col: str = "o_orderpriority",
    value_col: str = "o_totalprice",
    key_col: str = "o_orderkey",
    trim_pct: int = 5,
) -> DataFrame:
    """Per-group trimmed mean: drop the lowest and highest ``trim_pct``
    percent of rows by exact rank, then average what is left — the
    robust central-tendency aggregate for heavy-tailed value columns
    (an outlier-proof alternative to the pooled means in
    ``anomaly.py``).

    cut = (n·trim_pct) div 100 rows trimmed from EACH end, computed in
    exact integer math. The rank is a total order (value, key) so which
    tied boundary rows get trimmed is engine-independent; the kept-row
    mean goes through the fixed-point ``dsum`` so summation order can't
    move the result.

    Plan: one shuffle partitions by the group key; the per-group sort
    ranks within each partition. Group cardinality here is bounded (5
    priorities) but each group is fact-sized — at 100 TB replace the
    exact rank cut with approx-percentile boundaries at (trim, 100−trim)
    and a filter, which needs no per-group sort.

    NULL and NaN/±Inf rows are excluded from the ranked population: a
    non-finite value cannot quantize to dsum's integer units — a single
    ±Inf row inside the kept band overflows the ANSI bigint cast (r12
    fuzz finding) — and a NULL row RANKS at opposite ends of the two
    engines' total orders (Spark NULLS FIRST, DuckDB NULLS LAST — r13
    sweep: one NULL shifted the whole trim band), besides being exactly
    the sentinel rows trimming should not let consume trim slots.
    """
    vc = F.col(value_col)
    finite = vc.isNotNull() & (
        ~F.isnan(vc) & (F.abs(vc) < F.lit(float("inf")))
    )
    ranked = orders.where(finite).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("val"),
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(value_col, key_col)
        ).alias("__rn"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy(group_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__n"),
    )
    cut = F.expr(f"(__n * {trim_pct}) div 100")
    kept = ranked.where(
        (F.col("__rn") > cut) & (F.col("__rn") <= F.col("__n") - cut)
    )
    return (
        kept.groupBy("grp")
        .agg(
            F.max("__n").cast("bigint").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            round4(dmean(F.col("val"))).alias("trimmed_mean"),
            F.min("val").alias("kept_min"),
            F.max("val").alias("kept_max"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_total",
            "n_kept",
            "trimmed_mean",
            "kept_min",
            "kept_max",
        )
    )


def pareto_skyline(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not dominated by any other —
    q dominates p iff q.minimize ≤ p.minimize AND q.maximize ≥
    p.maximize with at least one strict. The classic multi-criteria
    shortlist ("no part is both cheaper and bigger").

    Plan: NOT the quadratic NOT-EXISTS self-join the semantics suggest.
    For 2-D the frontier is exactly the strictly-decreasing envelope of
    the per-minimize-value maxima: aggregate to minimize-value grain
    (map-side combinable), take the running max of ``maximize`` over
    strictly smaller values via a lag on the cumulative max, and keep
    rows that (a) achieve their value-group's max and (b) strictly beat
    every cheaper group's best. The windows run at value-group grain
    (|distinct minimize values| rows — the same bounded-frame
    discipline as ``ks_two_sample``; pre-quantize a continuous column
    at 100 TB); the fact table itself only sees one groupBy and one
    semi-join-shaped inner join back onto the tiny frontier frame.
    """
    grp = df.groupBy(F.col(minimize_col).alias("__mv")).agg(
        F.max(F.col(maximize_col)).alias("__best")
    )
    w = Window.orderBy("__mv")
    cum = grp.select(
        "__mv",
        "__best",
        F.lag(
            F.max("__best").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
        ).over(w).alias("__prev_best"),
    )
    frontier = cum.where(
        F.col("__prev_best").isNull()
        | (F.col("__best") > F.col("__prev_best"))
    ).select("__mv", "__best")
    # no forced broadcast: a fully anti-correlated column pair makes the
    # frontier |distinct minimize values| rows (unbounded); AQE promotes
    # to broadcast when it fits, same convention as triangle_stats
    return df.join(
        frontier,
        (F.col(minimize_col) == F.col("__mv"))
        & (F.col(maximize_col) == F.col("__best")),
    ).drop("__mv", "__best")


def bloom_dense_bitmap(
    items: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """ONE-row dense Bloom bitmap: ``__bloom_bits`` is an
    ``array<long>`` of exactly ``m_bits/64`` words (missing words
    zero-filled), built from ``curation.build_bloom``'s sparse (word,
    bits) frame by joining it onto the full word range and packing with
    one ordered ``collect_list``. The row is ~``m_bits/8`` bytes
    (128 KB at the default) REGARDLESS of item count — that bound, not
    the data volume, is what makes it broadcastable at 100 TB."""
    from uk_housing_dashboard_etl_spark.operators.curation import build_bloom

    sparse = build_bloom(items, col, m_bits, k)
    n_words = m_bits // 64
    words = items.sparkSession.range(n_words).select(
        F.col("id").alias("word")
    )
    return (
        words.join(sparse, "word", "left")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "word", F.coalesce("bits", F.lit(0)).alias("bits")
                    )
                )
            ).alias("__w")
        )
        .select(F.col("__w").getField("bits").alias("__bloom_bits"))
    )


def bloom_probe(col: F.Column, m_bits: int = 1 << 20, k: int = 5) -> F.Column:
    """Row-local Bloom membership test against a ``bloom_dense_bitmap``
    row in scope (column ``__bloom_bits``): true iff all ``k`` probe
    bits are set. ``element_at`` on an ARRAY is O(1), so the whole test
    is k hash-and-mask ops inside codegen — no join, no shuffle."""
    test = F.lit(True)
    for j in range(k):
        pos = F.pmod(F.xxhash64(col, F.lit(j)), F.lit(m_bits))
        word = (pos / 64).cast("int") + F.lit(1)  # element_at is 1-based
        # F.shiftleft only takes a literal shift; call the SQL builtin
        # so the bit index can be a column (same rule as build_bloom)
        bit = F.call_function(
            "shiftleft",
            F.lit(1).cast("bigint"),
            F.pmod(pos, F.lit(64)).cast("int"),
        )
        test = test & (
            F.element_at("__bloom_bits", word).bitwiseAND(bit) != 0
        )
    return test


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Runtime-filter join: probe a Bloom filter built over the
    (already filtered) dim keys ON THE FACT SCAN SIDE, then run the
    exact join on the survivors. The result is IDENTICAL to
    ``fact ⋈ dim`` — Bloom admits every true match (no false
    negatives) and the exact join removes the false positives — but
    the join shuffle only carries fact rows whose key MIGHT match.

    This is the semi-join reduction Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` injects when statistics
    allow; expressed as a first-class operator so the pruning applies
    regardless of stats. The filter is a ONE-row dense bitmap
    (:func:`bloom_dense_bitmap`, ~128 KB bounded by ``m_bits``) that
    cross-joins broadcast into a row-local k-probe test
    (:func:`bloom_probe`) — the fact side is filtered INSIDE its scan
    stage, never shuffled to discover non-matches. At 100 TB the dim
    key SET can be too large for a broadcast hash join while its Bloom
    bitmap still fits in every executor: that asymmetry is the whole
    pattern.
    """
    keyed = fact.withColumn("__k", F.col(fact_key).cast("string"))
    bitmap = bloom_dense_bitmap(
        dim.select(F.col(dim_key).cast("string").alias("__k")),
        "__k",
        m_bits,
        k,
    )
    pruned = (
        keyed.join(F.broadcast(bitmap))  # 1-row bitmap: row-local probe
        .where(bloom_probe(F.col("__k"), m_bits, k))
        .drop("__k", "__bloom_bits")
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    eps: float,
) -> DataFrame:
    """Band (theta) join: every (left, right) pair with
    ``|left_val − right_val| ≤ eps``, computed WITHOUT a cross join.

    Bucketize both sides to ``floor(val / eps)``; a qualifying pair's
    buckets can differ by at most 1, so the left side probes its own
    bucket and both neighbours (a row-local 3-way explode), the join is
    a plain equi-join on the bucket id, and the exact |Δ| ≤ eps filter
    removes the false candidates the coarse buckets admit. Shuffle
    volume is 3·|left| + |right| rows keyed by bucket — linear, where
    the naive theta join is |left|·|right|. Same decomposition as
    ``embedding_near_dup``'s grid bucketing, in one dimension.

    Skew: a value distribution that piles into one bucket degrades to
    that bucket's local cross product — the operator is exact, so that
    cost is irreducible (the matching pairs themselves are quadratic in
    the pile-up); AQE's skew-join split keeps the stragglers parallel.

    NULL and non-finite values are excluded at this operator boundary:
    they can never satisfy ``|Δ| ≤ eps`` (NaN comparisons are false,
    Inf−anything is Inf or NaN), and Spark's ``floor`` saturates ±Inf
    to ±maxlong where the neighbour probe's ``bucket ± 1`` then raises
    ANSI ArithmeticOverflow (r13 fuzz find).
    """

    def _finite(c: str):
        v = F.col(c).cast("double")
        return ~F.isnan(v) & (
            F.abs(v) < F.expr("CAST('Infinity' AS DOUBLE)")
        )

    left = left.where(_finite(left_val))
    right = right.where(_finite(right_val))
    lb = F.floor(F.col(left_val) / F.lit(eps)).cast("long")
    probes = left.withColumn(
        "__b", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    anchored = right.withColumn(
        "__b", F.floor(F.col(right_val) / F.lit(eps)).cast("long")
    )
    return (
        probes.join(anchored, "__b")
        .where(
            F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(eps)
        )
        .drop("__b")
    )
