"""Statistical summary operators: correlation/covariance, fixed-width
histograms, and GROUPING SETS lattices.

Beyond-reference surface: the reference computes only location statistics
(mean/median/percentiles, ``etl/etl_main.py:212-218``); these add the
dispersion/association layer a pricing-analytics user expects, plus the
explicit multi-granularity aggregation the CUBE/ROLLUP queries imply.

Scale notes: all three are single-pass partial-aggregable plans — corr /
covar / stddev decompose into moment sums that combine map-side, and a
fixed-width histogram bucket is a projection, so the shuffle carries
|groups| (or |buckets|) rows, never the fact table. GROUPING SETS
replicates each input row once per matching set at the partial-agg stage
(Spark's Expand operator) — 3 sets here, bounded fan-out before combine.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def corr_stats(lineitem: DataFrame) -> DataFrame:
    """Per (returnflag, linestatus): association between quantity and
    gross price — Pearson corr, sample covariance, both sample stddevs.
    """
    return lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.corr("l_quantity", "l_extendedprice").alias("qty_price_corr"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("qty_price_covar"),
        F.stddev_samp("l_quantity").alias("qty_stddev"),
        F.stddev_samp("l_extendedprice").alias("price_stddev"),
    )


def price_histogram(orders: DataFrame, bucket_width: float = 25000.0) -> DataFrame:
    """Fixed-width histogram of order totals.

    Bucket = floor(price / width); bounds are exact integer multiples of
    the width, so bucket assignment is engine-independent. Emits count
    plus within-bucket min/max (the data-driven bucket envelope).
    """
    b = F.floor(F.col("o_totalprice") / F.lit(bucket_width))
    return (
        orders.na.drop(subset=["o_totalprice"])
        .groupBy(b.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .withColumn("bucket_lo", F.col("bucket") * F.lit(bucket_width))
    )


def grouping_sets_summary(lineitem: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS lattice: ((rf, ls), (rf), ()) — the subtotal
    shape a report needs without paying for the full CUBE.

    Uses Spark SQL GROUPING SETS (the DataFrame API exposes only
    cube/rollup); GROUPING_ID disambiguates the all-null subtotal rows
    from genuine NULL group keys.
    """
    spark = SparkSession.getActiveSession() or lineitem.sparkSession
    # per-call unique view name: a fixed name would race when two threads
    # call this concurrently on the same session with different inputs
    view = f"__gs_lineitem_{uuid.uuid4().hex}"
    lineitem.createOrReplaceTempView(view)
    try:
        # spark.sql analyzes eagerly — the view resolves to this input's
        # plan here, so dropping it afterwards is safe even pre-action
        return spark.sql(
            f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
                   count(*) AS n,
                   CAST(sum(CAST(round(l_quantity * 10000.0) AS BIGINT)) AS DOUBLE)
                       / 10000.0 AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 10000.0) AS BIGINT)) AS DOUBLE)
                       / 10000.0 AS sum_price
            FROM {view}
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), ())
            """
        )
    finally:
        spark.catalog.dropTempView(view)
