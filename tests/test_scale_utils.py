"""Salted aggregation equivalence + period-over-period semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.skew import salted_agg
from uk_housing_dashboard_etl_spark.operators.timeseries import period_over_period


def test_salted_agg_matches_plain_groupby(spark):
    # heavily skewed key: 'hot' has 50x the rows
    rows = [("hot", float(i % 7)) for i in range(5000)] + [
        (f"cold{i % 20}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = (
        salted_agg(df, ["k"], {"v": "sum"}, salt_buckets=8)
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupBy("k")
        .agg(F.sum("v").alias("sum_v"))
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    import pytest

    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(df, ["k"], {"v": "median"})


def test_period_over_period_lag_and_pct(spark):
    rows = [
        ("A", "2024-01-01", 10, 100.0),
        ("A", "2024-01-08", 15, 110.0),
        ("A", "2024-01-15", 0, None),
        ("A", "2024-01-22", 30, 120.0),
        ("B", "2024-01-01", 5, 50.0),
        ("B", "2024-01-08", 5, 50.0),
    ]
    dense = spark.createDataFrame(
        rows, ["local_authority", "week", "transactions", "price_mean"]
    ).withColumn("week", F.to_timestamp("week"))
    out = (
        period_over_period(dense, ["transactions"], periods=1)
        .toPandas()
        .sort_values(["local_authority", "week"])
        .reset_index(drop=True)
    )
    a = out[out.local_authority == "A"].reset_index(drop=True)
    # first row has no prior period
    assert pd.isna(a.loc[0, "transactions_prev"])
    assert a.loc[1, "transactions_delta"] == 5
    assert a.loc[1, "transactions_pct_change"] == 50.0
    # zero base -> null pct, not inf (row 3 follows transactions=0)
    assert pd.isna(a.loc[3, "transactions_pct_change"])
    assert a.loc[3, "transactions_delta"] == 30
    # partitions don't leak: B's first row sees no prior from A
    b = out[out.local_authority == "B"].reset_index(drop=True)
    assert pd.isna(b.loc[0, "transactions_prev"])
    assert b.loc[1, "transactions_pct_change"] == 0.0


def test_period_over_period_longer_lag(spark):
    rows = [("A", f"2024-0{m}-01", m * 10) for m in range(1, 5)]
    dense = spark.createDataFrame(
        rows, ["local_authority", "week", "transactions"]
    ).withColumn("week", F.to_timestamp("week"))
    out = period_over_period(dense, ["transactions"], periods=2).toPandas()
    out = out.sort_values("week").reset_index(drop=True)
    assert pd.isna(out.loc[0, "transactions_prev"]) and pd.isna(
        out.loc[1, "transactions_prev"]
    )
    assert out.loc[2, "transactions_prev"] == 10
    assert out.loc[3, "transactions_pct_change"] == 100.0


def test_interpolate_gaps_inside_only_with_time_weighting(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from uk_housing_dashboard_etl_spark.operators.timeseries import (
        interpolate_gaps,
    )

    w = lambda k: dt.datetime(2024, 1, 1) + dt.timedelta(weeks=k)
    dense = spark.createDataFrame(
        [
            # LA "A": value at weeks 0 and 3, nulls between -> 1/3, 2/3 blends
            (w(0), "A", 1, 30.0),
            (w(1), "A", 0, None),
            (w(2), "A", 0, None),
            (w(3), "A", 1, 60.0),
            # LA "B": leading + trailing nulls stay null (limit_area=inside)
            (w(0), "B", 0, None),
            (w(1), "B", 1, 10.0),
            (w(2), "B", 0, None),
        ],
        "week timestamp, local_authority string, transactions long, price_mean double",
    )
    got = {
        (r["local_authority"], r["week"]): (r["price_interp"], r["is_interpolated"])
        for r in interpolate_gaps(dense).collect()
    }
    assert got[("A", w(1))] == (40.0, True)
    assert got[("A", w(2))] == (50.0, True)
    assert got[("A", w(0))] == (30.0, False)
    assert got[("B", w(0))] == (None, False)  # boundary gap: no left neighbor
    assert got[("B", w(2))] == (None, False)  # boundary gap: no right neighbor

    # one exchange only: both ignore-nulls windows share the (la, week) sort
    plan = interpolate_gaps(dense)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
