"""W5/A6: partition-wide z-score anomaly detection.

Reference parity: ``etl/etl_main.py:260-282`` — per-LA z-scores on
``transactions`` and ``rolling_trans``; z = 0.0 exactly when the group's
std is 0 or undefined; flag when ``abs(z) > z_thresh`` (default 3.0).

Semantics preserved (SURVEY.md §4 gotchas 2-3):
- SAMPLE stddev (ddof=1) → ``stddev_samp``;
- statistics pooled across ALL ``window_weeks`` copies — partition by
  ``local_authority`` ONLY (the reference groups the fanned-out frame);
- ``transactions`` null-filled to 0 before scoring (ref ``:268``).

Spark realization: pure unbounded window expressions — the reference's
per-group Python loop disappears; no Python on executors. Both z columns
share one window spec, so a single shuffle on ``local_authority``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _zscore(col: Column, w) -> Column:
    std = F.stddev_samp(col).over(w)
    return (
        F.when(F.coalesce(std, F.lit(0.0)) == 0.0, F.lit(0.0))
        .otherwise((col - F.avg(col).over(w)) / std)
    )


def detect_anomalies(windows_df: DataFrame, z_thresh: float = 3.0) -> DataFrame:
    """Append z-score + boolean anomaly columns to the fanned-out frame."""
    w = Window.partitionBy("local_authority")
    t = F.coalesce(F.col("transactions"), F.lit(0)).cast("double")
    rt = F.coalesce(F.col("rolling_trans"), F.lit(0)).cast("double")
    return (
        windows_df.withColumn("z_transactions", _zscore(t, w))
        .withColumn("z_rolling_trans", _zscore(rt, w))
        .withColumn(
            "anomaly_transactions", F.abs(F.col("z_transactions")) > F.lit(z_thresh)
        )
        .withColumn(
            "anomaly_rolling_trans", F.abs(F.col("z_rolling_trans")) > F.lit(z_thresh)
        )
    )


def robust_anomalies(
    weekly: DataFrame,
    value_col: str = "transactions",
    group_col: str = "local_authority",
    thresh: float = 3.5,
) -> DataFrame:
    """Median/MAD robust anomaly flags — the outlier-resistant companion
    to the reference's mean/stddev z-score (ref ``etl/etl_main.py:260-282``):
    one extreme week cannot drag the baseline the way it drags a mean.

    robust_z = 0.6745 * (x - median) / MAD, 0.0 when MAD == 0 (constant
    group), flag at |rz| > thresh (3.5 is the Iglewicz-Hoaglin cut).

    Scale shape: two stacked unbounded-window exact percentiles over ONE
    partitioning — the mart shuffles once on the group key and both
    statistics ride that exchange. (A groupBy+join formulation recomputes
    the upstream mart per join branch unless it is cached: measured 15
    exchanges + 4 sort-merge joins vs this plan's 1 exchange.)
    """
    x = F.col(value_col).cast("double")
    w = Window.partitionBy(group_col)
    out = weekly.withColumn(
        "med", F.percentile(x, F.lit(0.5)).over(w)
    ).withColumn("mad", F.percentile(F.abs(x - F.col("med")), F.lit(0.5)).over(w))
    rz = F.when(F.col("mad") == 0.0, F.lit(0.0)).otherwise(
        F.lit(0.6745) * (x - F.col("med")) / F.col("mad")
    )
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    return out.select(
        "week",
        group_col,
        value_col,
        round4(F.col("med")).alias("med"),
        round4(F.col("mad")).alias("mad"),
        round4(rz).alias("robust_z"),
        (F.abs(round4(rz)) > F.lit(thresh)).alias("anomaly_robust"),
    )
