"""Time-series comparison operators: period-over-period change.

The reference's header advertises "YOY change" (ref ``etl/etl_main.py:5``)
but never implements it — this module supplies it properly. Generic
lag-based comparison over the densified weekly grid: WoW is ``periods=1``,
YOY is ``periods=52`` (the grid guarantees one row per week per LA, so
row-lag equals time-lag).

Scale notes: a single ranking-window pass over the same
(partitionBy la, orderBy week) exchange the rolling operators use —
Catalyst schedules lag in the same Window operator when composed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.rounding import round4


def period_over_period(
    dense_weekly: DataFrame,
    value_cols: list[str] = ("transactions", "price_mean"),
    periods: int = 1,
) -> DataFrame:
    """Append ``<col>_prev``, ``<col>_delta`` and ``<col>_pct_change``
    for each value column, lagged ``periods`` grid rows per LA.

    pct_change is null when the prior value is 0 or null (no fabricated
    infinities — matches pandas ``pct_change`` on a zero base yielding
    inf, which downstream consumers reject anyway; we surface null).
    """
    w = Window.partitionBy("local_authority").orderBy("week")
    out = dense_weekly
    for c in value_cols:
        prev = F.lag(c, periods).over(w)
        out = (
            out.withColumn(f"{c}_prev", prev)
            .withColumn(f"{c}_delta", F.col(c) - prev)
            .withColumn(
                f"{c}_pct_change",
                F.when(
                    prev.isNull() | (prev == 0), F.lit(None).cast("double")
                ).otherwise(round4((F.col(c) - prev) / prev * 100.0)),
            )
        )
    return out
