"""W2-W4: rolling window frames + per-window fan-out union.

Reference parity: ``etl/etl_main.py:247-256`` — for each window length w
(default [4, 12]), per-LA k-row rolling sum of ``transactions`` and
null-skipping rolling mean of ``price_mean`` (``min_periods=1``), each copy
tagged ``window_weeks=w`` and concatenated.

Spark realization: ALL window lengths are computed in ONE Window operator
— the frames share the same partition/order spec (``partitionBy(la).
orderBy(week)``, ``rowsBetween(-(w-1), 0)``), so one shuffle + one sort
produce every rolling column in a single pass; the per-w fan-out is then
an ``explode`` of (window_weeks, rolling_*) structs, a streaming Generate
with zero extra exchanges. Rows-based frames are valid as time-based
because the input grid is densified (J2); ``min_periods=1`` is automatic
(partial frames at the partition head).

A naive per-w ``unionByName`` of separately-built frames would recompute
the entire upstream mart once per window length — at 100 TB that is the
difference between one fact-table pass and |windows| passes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_WINDOWS = [4, 12]

OUTPUT_COLS = [
    "week",
    "local_authority",
    "transactions",
    "rolling_trans",
    "price_mean",
    "rolling_price_mean",
    "window_weeks",
]


def rolling_windows(
    dense_weekly: DataFrame, windows: Sequence[int] = DEFAULT_WINDOWS
) -> DataFrame:
    """Per-LA rolling sum/mean for each window length, tagged ``window_weeks``."""
    base = Window.partitionBy("local_authority").orderBy("week")
    # rolling mean as exact integer-unit sum / count: window avg over
    # doubles is engine-combine-order dependent (DuckDB segment trees vs
    # sequential), integer sums are not
    pm_units = F.round(F.col("price_mean") * F.lit(10000.0)).cast("bigint")
    # step 1: every rolling column in ONE Window operator (flat columns —
    # window expressions are not allowed inside generators)
    flat_cols = []
    for w in windows:
        frame = base.rowsBetween(-(w - 1), Window.currentRow)
        flat_cols.append(F.sum("transactions").over(frame).alias(f"__rt_{w}"))
        rpm = (
            F.sum(pm_units).over(frame).cast("double")
            / F.lit(10000.0)
            / F.count("price_mean").over(frame)
        )
        flat_cols.append(rpm.alias(f"__rpm_{w}"))
    windowed = dense_weekly.select(
        "week", "local_authority", "transactions", "price_mean", *flat_cols
    )
    # step 2: per-w fan-out as a streaming Generate (no extra exchange)
    per_w = [
        F.struct(
            F.lit(w).alias("window_weeks"),
            F.col(f"__rt_{w}").alias("rolling_trans"),
            F.col(f"__rpm_{w}").alias("rolling_price_mean"),
        )
        for w in windows
    ]
    return windowed.select(
        "week",
        "local_authority",
        "transactions",
        "price_mean",
        F.explode(F.array(*per_w)).alias("__w"),
    ).select(
        "week",
        "local_authority",
        "transactions",
        F.col("__w.rolling_trans").alias("rolling_trans"),
        "price_mean",
        F.col("__w.rolling_price_mean").alias("rolling_price_mean"),
        F.col("__w.window_weeks").alias("window_weeks"),
    )
