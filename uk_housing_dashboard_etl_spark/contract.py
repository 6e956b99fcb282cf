"""Driver-contract queries: each SURVEY.md §2 operator as a named query over
the synthetic testdata tables, paired with an ANSI-SQL DuckDB oracle.

The ``events`` table plays the reference's Price Paid transactions
(ts≈date_of_transfer, value≈price, user_id≈postcode, event_type≈
property_type, event_id≈transaction id); ``customer→nation`` plays the
postcode→LA lookup. The lookup deliberately drops ``c_custkey % 7 == 3``
so the left join produces genuine unmatched rows (null LA), exercising the
reference's coverage path (ref ``etl/etl_main.py:185-196``).

Float policy: every column whose value is COMPUTED floating-point math
(avg/stddev/percentile/ratio) is rounded to 4 decimals on BOTH sides so
the driver's order-insensitive value-hash is robust to summation-order
differences between Spark and DuckDB. Passthrough doubles are not rounded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators import (
    coverage_report,
    densify_weekly_grid,
    detect_anomalies,
    enrich_with_lookup,
    latest_snapshot,
    qa_metrics,
    rolling_windows,
    standardize_transactions,
    type_breakdown,
    weekly_mart,
)
from uk_housing_dashboard_etl_spark.operators.relational import (
    brand_revenue,
    customers_without_orders,
    order_priority_counts,
    pricing_summary,
    revenue_by_nation,
    top_customers_by_revenue,
)
from uk_housing_dashboard_etl_spark.sources.readers import read_table

ROUND_DP = 4
WINDOWS = [4, 12]

# extra bench-suite members appended as they land (bench.py reads this)
BENCH_EXTRA: list[str] = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "order_priority",
    "brand_revenue",
]


def _round(df: DataFrame, cols: list[str]) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, F.round(F.col(c), ROUND_DP))
    return out


# ---------------------------------------------------------------- loaders


def load_transactions_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → PPD-shaped raw frame (column names drive P1 discovery)."""
    return read_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("transaction_unique_id"),
        F.col("ts").alias("date_of_transfer"),
        F.col("value").alias("price"),
        F.col("user_id").alias("postcode"),
        F.col("event_type").alias("property_type"),
    )


def load_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer→nation as the postcode→LA dimension (J1 broadcast side).

    Drops custkey % 7 == 3 to create deterministic unmatched keys.
    """
    cust = read_table(spark, sf_dir, "customer").where(
        (F.col("c_custkey") % 7) != 3
    )
    nat = read_table(spark, sf_dir, "nation")
    return cust.join(nat, cust.c_nationkey == nat.n_nationkey).select(
        F.col("c_custkey").cast("string").alias("key"),
        F.col("n_name").alias("local_authority"),
    )


def _enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = standardize_transactions(load_transactions_raw(spark, sf_dir))
    return enrich_with_lookup(tx, load_lookup(spark, sf_dir))


def _weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weekly_mart(_enriched(spark, sf_dir))


def _windows_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_windows(densify_weekly_grid(_weekly(spark, sf_dir)), WINDOWS)


# ------------------------------------------------------- spark queries

WEEKLY_ROUND = ["price_mean", "price_median", "price_p10", "price_p90"]
WINDOW_ROUND = ["price_mean", "rolling_price_mean"]


def q_clean_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P9: discovery + coercion + normalization projection."""
    return standardize_transactions(load_transactions_raw(spark, sf_dir))


def q_weekly_by_la(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + W1 + A1-A4: the reference's flagship weekly mart."""
    return _round(_weekly(spark, sf_dir), WEEKLY_ROUND)


def q_type_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + P9: count(*) per (week, LA, normalized type)."""
    return type_breakdown(_enriched(spark, sf_dir))


def q_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/A10: lookup-coverage QA row."""
    return _round(coverage_report(_enriched(spark, sf_dir)), ["coverage_pct"])


def q_grid_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: densified weeks × LAs grid with zero-filled transactions."""
    return _round(densify_weekly_grid(_weekly(spark, sf_dir)), WEEKLY_ROUND)


def q_rolling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2-W4: per-LA rolling sum/mean, fanned out per window length."""
    return _round(_windows_df(spark, sf_dir), WINDOW_ROUND)


def q_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/A6: pooled per-LA z-scores + boolean anomaly flags."""
    return _round(
        detect_anomalies(_windows_df(spark, sf_dir)),
        WINDOW_ROUND + ["z_transactions", "z_rolling_trans"],
    )


def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10/A7: rows of the globally-latest week."""
    return _round(latest_snapshot(_windows_df(spark, sf_dir)), WINDOW_ROUND)


def q_qa_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A10: single-row QA record."""
    raw = load_transactions_raw(spark, sf_dir)
    enriched = _enriched(spark, sf_dir)
    qa = qa_metrics(raw, weekly_mart(enriched), coverage_report(enriched))
    return _round(qa, ["coverage_pct"])


# ------------------------------------------- generic relational queries


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-filter + partial-agg hash aggregation (TPC-H Q1 shape)."""
    return _round(
        pricing_summary(read_table(spark, sf_dir, "lineitem")),
        ["avg_qty", "avg_price", "avg_disc"],
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join with broadcast dims (TPC-H Q5 shape)."""
    t = {n: read_table(spark, sf_dir, n) for n in
         ["customer", "orders", "lineitem", "supplier", "nation", "region"]}
    return revenue_by_nation(
        t["customer"], t["orders"], t["lineitem"], t["supplier"],
        t["nation"], t["region"],
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k over aggregated revenue (TPC-H Q10 shape)."""
    t = {n: read_table(spark, sf_dir, n) for n in
         ["customer", "orders", "lineitem", "nation"]}
    return top_customers_by_revenue(
        t["customer"], t["orders"], t["lineitem"], t["nation"]
    )


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) + count by priority (TPC-H Q4 shape)."""
    return order_priority_counts(
        read_table(spark, sf_dir, "orders"), read_table(spark, sf_dir, "lineitem")
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) + count by segment."""
    return customers_without_orders(
        read_table(spark, sf_dir, "customer"), read_table(spark, sf_dir, "orders")
    )


def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + hash agg per brand."""
    return brand_revenue(
        read_table(spark, sf_dir, "part"), read_table(spark, sf_dir, "lineitem")
    )


# ------------------------------------------------------- oracle SQL

# Shared CTE chain mirroring the pipeline. Kept UNROUNDED internally;
# each query's final SELECT rounds the computed-float columns to ROUND_DP.
_BASE = """
WITH lookup AS (
    SELECT CAST(c_custkey AS VARCHAR) AS key, n_name AS local_authority
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey % 7 <> 3
), enriched AS (
    SELECT e.ts AS date,
           CAST(e.event_id AS VARCHAR) AS transaction_id,
           e.value AS price,
           CAST(e.user_id AS VARCHAR) AS key,
           lower(trim(CAST(e.event_type AS VARCHAR))) AS prop_type,
           l.local_authority
    FROM events e
    LEFT JOIN lookup l ON CAST(e.user_id AS VARCHAR) = l.key
    WHERE e.ts IS NOT NULL
), weekly AS (
    SELECT date_trunc('week', date) AS week,
           local_authority,
           count(DISTINCT transaction_id) AS transactions,
           avg(price) AS price_mean,
           median(price) AS price_median,
           quantile_cont(price, 0.1) AS price_p10,
           quantile_cont(price, 0.9) AS price_p90
    FROM enriched
    WHERE local_authority IS NOT NULL
    GROUP BY 1, 2
), grid AS (
    SELECT w.week, l.local_authority
    FROM (SELECT unnest(generate_series((SELECT min(week) FROM weekly),
                                        (SELECT max(week) FROM weekly),
                                        INTERVAL 7 DAY)) AS week) w
    CROSS JOIN (SELECT DISTINCT local_authority FROM weekly
                WHERE local_authority IS NOT NULL) l
), dense AS (
    SELECT g.week, g.local_authority,
           CAST(coalesce(t.transactions, 0) AS BIGINT) AS transactions,
           t.price_mean, t.price_median, t.price_p10, t.price_p90
    FROM grid g LEFT JOIN weekly t USING (week, local_authority)
), rolled AS (
    SELECT week, local_authority, transactions,
           CAST(sum(transactions) OVER (PARTITION BY local_authority ORDER BY week
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_trans,
           price_mean,
           avg(price_mean) OVER (PARTITION BY local_authority ORDER BY week
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rolling_price_mean,
           4 AS window_weeks
    FROM dense
    UNION ALL
    SELECT week, local_authority, transactions,
           CAST(sum(transactions) OVER (PARTITION BY local_authority ORDER BY week
                ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_trans,
           price_mean,
           avg(price_mean) OVER (PARTITION BY local_authority ORDER BY week
                ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS rolling_price_mean,
           12 AS window_weeks
    FROM dense
), scored AS (
    SELECT week, local_authority, transactions, rolling_trans, price_mean,
           rolling_price_mean, window_weeks,
           CASE WHEN coalesce(stddev_samp(transactions) OVER zw, 0) = 0 THEN 0.0
                ELSE (transactions - avg(transactions) OVER zw)
                     / stddev_samp(transactions) OVER zw END AS z_transactions,
           CASE WHEN coalesce(stddev_samp(rolling_trans) OVER zw, 0) = 0 THEN 0.0
                ELSE (rolling_trans - avg(rolling_trans) OVER zw)
                     / stddev_samp(rolling_trans) OVER zw END AS z_rolling_trans
    FROM rolled
    WINDOW zw AS (PARTITION BY local_authority)
)
"""

ORACLES: dict[str, str] = {
    "clean_transactions": _BASE
    + """
    SELECT date, transaction_id, price, key, prop_type FROM enriched
    """,
    "weekly_by_la": _BASE
    + """
    SELECT week, local_authority, transactions,
           round(price_mean, 4) AS price_mean,
           round(price_median, 4) AS price_median,
           round(price_p10, 4) AS price_p10,
           round(price_p90, 4) AS price_p90
    FROM weekly
    """,
    "type_breakdown": _BASE
    + """
    SELECT date_trunc('week', date) AS week, local_authority, prop_type,
           count(*) AS count
    FROM enriched
    WHERE local_authority IS NOT NULL AND prop_type IS NOT NULL
    GROUP BY 1, 2, 3
    """,
    "coverage_report": _BASE
    + """
    SELECT count(*) AS total_tx,
           count(local_authority) AS mapped_tx,
           round(100.0 * count(local_authority) / count(*), 4) AS coverage_pct
    FROM enriched
    """,
    "grid_weekly": _BASE
    + """
    SELECT week, local_authority, transactions,
           round(price_mean, 4) AS price_mean,
           round(price_median, 4) AS price_median,
           round(price_p10, 4) AS price_p10,
           round(price_p90, 4) AS price_p90
    FROM dense
    """,
    "rolling_windows": _BASE
    + """
    SELECT week, local_authority, transactions, rolling_trans,
           round(price_mean, 4) AS price_mean,
           round(rolling_price_mean, 4) AS rolling_price_mean,
           window_weeks
    FROM rolled
    """,
    "anomalies": _BASE
    + """
    SELECT week, local_authority, transactions, rolling_trans,
           round(price_mean, 4) AS price_mean,
           round(rolling_price_mean, 4) AS rolling_price_mean,
           window_weeks,
           round(z_transactions, 4) AS z_transactions,
           round(z_rolling_trans, 4) AS z_rolling_trans,
           abs(z_transactions) > 3.0 AS anomaly_transactions,
           abs(z_rolling_trans) > 3.0 AS anomaly_rolling_trans
    FROM scored
    """,
    "latest_snapshot": _BASE
    + """
    SELECT week, local_authority, transactions, rolling_trans,
           round(price_mean, 4) AS price_mean,
           round(rolling_price_mean, 4) AS rolling_price_mean,
           window_weeks
    FROM rolled
    WHERE week = (SELECT max(week) FROM rolled)
    """,
    "qa_metrics": _BASE
    + """
    SELECT (SELECT count(*) FROM events) AS rows_raw,
           (SELECT count(DISTINCT local_authority) FROM weekly) AS las,
           (SELECT max(week) FROM weekly) AS latest_week,
           (SELECT round(100.0 * count(local_authority) / count(*), 4)
            FROM enriched) AS coverage_pct
    """,
}

_RELATIONAL_ORACLES: dict[str, str] = {
    "pricing_summary": """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY 1, 2
    """,
    "revenue_by_nation": """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND s_nationkey = c_nationkey
    GROUP BY 1
    """,
    "top_customers": """
    WITH per_cust AS (
        SELECT o_custkey,
               round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
        GROUP BY 1
    ), ranked AS (
        SELECT o_custkey, revenue,
               CAST(row_number() OVER (ORDER BY revenue DESC, o_custkey) AS INTEGER) AS rank
        FROM per_cust
    )
    SELECT c_custkey, c_name, n_name AS nation, c_mktsegment, revenue, rank
    FROM ranked
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE rank <= 20
    """,
    "order_priority": """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY 1
    """,
    "customers_without_orders": """
    SELECT c_mktsegment, count(*) AS inactive_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1996-01-01'
                        AND o_orderdate <  TIMESTAMP '1997-01-01')
    GROUP BY 1
    """,
    "brand_revenue": """
    SELECT p_brand,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           CAST(sum(CAST(round(l_quantity * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_qty,
           count(*) AS line_count
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 10
    GROUP BY 1
    """,
}

ORACLES.update(_RELATIONAL_ORACLES)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "clean_transactions": q_clean_transactions,
    "weekly_by_la": q_weekly_by_la,
    "type_breakdown": q_type_breakdown,
    "coverage_report": q_coverage_report,
    "grid_weekly": q_grid_weekly,
    "rolling_windows": q_rolling_windows,
    "anomalies": q_anomalies,
    "latest_snapshot": q_latest_snapshot,
    "qa_metrics": q_qa_metrics,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "top_customers": q_top_customers,
    "order_priority": q_order_priority,
    "customers_without_orders": q_customers_without_orders,
    "brand_revenue": q_brand_revenue,
}
