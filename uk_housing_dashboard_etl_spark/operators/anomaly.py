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
