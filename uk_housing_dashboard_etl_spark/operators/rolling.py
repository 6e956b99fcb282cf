"""W2-W4: rolling window frames + per-window fan-out union.

Reference parity: ``etl/etl_main.py:247-256`` — for each window length w
(default [4, 12]), per-LA k-row rolling sum of ``transactions`` and
null-skipping rolling mean of ``price_mean`` (``min_periods=1``), each copy
tagged ``window_weeks=w`` and concatenated.

Spark realization: one ``Window.partitionBy(la).orderBy(week)`` spec per w
with ``rowsBetween(-(w-1), 0)`` — rows-based frames are valid as time-based
because the input grid is densified (J2). ``min_periods=1`` is automatic
(partial frames at the partition head). The fan-out is ``unionByName`` of
projections over the SAME sorted exchange — Catalyst reuses the single
shuffle+sort across every window spec, so adding window lengths costs no
extra shuffle.
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
    """Per-LA rolling sum/mean for each window length, unioned with a tag."""
    out = None
    for w in windows:
        frame = (
            Window.partitionBy("local_authority")
            .orderBy("week")
            .rowsBetween(-(w - 1), Window.currentRow)
        )
        piece = dense_weekly.select(
            "week",
            "local_authority",
            "transactions",
            F.sum("transactions").over(frame).alias("rolling_trans"),
            "price_mean",
            F.avg("price_mean").over(frame).alias("rolling_price_mean"),
            F.lit(w).alias("window_weeks"),
        )
        out = piece if out is None else out.unionByName(piece)
    return out.select(*OUTPUT_COLS)
