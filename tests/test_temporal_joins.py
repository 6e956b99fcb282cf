"""As-of join and binned range join: boundary and tie semantics."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from uk_housing_dashboard_etl_spark.operators.temporal_joins import (
    asof_join,
    range_join_binned,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, T0 - dt.timedelta(hours=2), "u1"),   # before any right row
            (2, T0, "u1"),                            # exactly simultaneous
            (3, T0 + dt.timedelta(hours=1), "u1"),    # after first right
            (4, T0 + dt.timedelta(hours=5), "u1"),    # after second right
            (5, T0, "u2"),                            # other key: no rights
        ],
        "event_id long, ts timestamp, user_id string",
    )
    right = spark.createDataFrame(
        [
            ("u1", T0, 100.0, 1),
            ("u1", T0 + dt.timedelta(hours=4), 200.0, 2),
        ],
        "user_id string, ts timestamp, px double, tie long",
    )
    out = (
        asof_join(left, right, key="user_id", ts="ts",
                  right_value_cols=["px"], tie_col="tie")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert pd.isna(out.loc[1, "asof_px"])      # nothing at-or-before
    assert out.loc[2, "asof_px"] == 100.0      # ts == right.ts matches
    assert out.loc[3, "asof_px"] == 100.0
    assert out.loc[4, "asof_px"] == 200.0      # latest wins
    assert pd.isna(out.loc[5, "asof_px"])      # keys don't leak
    assert len(out) == 5                       # left rows preserved 1:1


def test_asof_join_tie_break_on_simultaneous_rights(spark):
    left = spark.createDataFrame(
        [(1, T0, "u1")], "event_id long, ts timestamp, user_id string"
    )
    right = spark.createDataFrame(
        [("u1", T0, 1.0, 10), ("u1", T0, 2.0, 20)],
        "user_id string, ts timestamp, px double, tie long",
    )
    out = asof_join(
        left, right, key="user_id", ts="ts", right_value_cols=["px"], tie_col="tie"
    ).collect()
    assert out[0]["asof_px"] == 2.0  # highest tie value wins


def test_range_join_boundaries_and_bins(spark):
    points = spark.createDataFrame(
        [
            (1, T0, "u1"),                               # == start: in
            (2, T0 + dt.timedelta(minutes=59), "u1"),    # inside
            (3, T0 + dt.timedelta(hours=1), "u1"),       # == end: out
            (4, T0 - dt.timedelta(seconds=1), "u1"),     # before: out
            (5, T0 + dt.timedelta(minutes=30), "u2"),    # wrong key: out
        ],
        "event_id long, ts timestamp, user_id string",
    )
    intervals = spark.createDataFrame(
        [("u1", T0, T0 + dt.timedelta(hours=1))],
        "user_id string, start timestamp, end timestamp",
    )
    # small bins force intervals to span multiple bins (explode path)
    out = range_join_binned(
        points, intervals, by=["user_id"], bin_seconds=600
    ).toPandas()
    assert sorted(out["event_id"]) == [1, 2]
    # no duplicate pairs despite the interval spanning 7 bins
    assert len(out) == len(out.drop_duplicates(["event_id"]))


def test_asof_forward_and_tolerance(spark):
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.temporal_joins import (
        asof_join,
    )

    def t(m):
        return dt.datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame(
        [(1, t(0)), (1, t(10)), (1, t(30)), (2, t(5))],
        ["user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, t(10), 100.0), (1, t(25), 200.0)],
        ["user_id", "ts", "px"],
    )
    fwd = {
        (r["user_id"], r["ts"].minute): r["asof_px"]
        for r in asof_join(
            left, right, "user_id", direction="forward"
        ).collect()
    }
    # earliest at-or-after: t0 -> 100 (t10), t10 -> 100 (exact match
    # visible forward), t30 -> null (nothing after), user 2 -> null
    assert fwd == {(1, 0): 100.0, (1, 10): 100.0, (1, 30): None, (2, 5): None}

    tol = {
        (r["user_id"], r["ts"].minute): r["asof_px"]
        for r in asof_join(
            left,
            right,
            "user_id",
            direction="forward",
            tolerance_seconds=300,
        ).collect()
    }
    # 5-minute tolerance: t0 -> t10 is 10 min away -> nulled; t10 exact
    # match survives
    assert tol == {(1, 0): None, (1, 10): 100.0, (1, 30): None, (2, 5): None}

    back_tol = {
        (r["user_id"], r["ts"].minute): r["asof_px"]
        for r in asof_join(
            left, right, "user_id", tolerance_seconds=300
        ).collect()
    }
    # backward with tolerance: t30's latest prior is t25 (5 min) -> kept;
    # t10 exact kept; t0 has no prior
    assert back_tol == {
        (1, 0): None,
        (1, 10): 100.0,
        (1, 30): 200.0,
        (2, 5): None,
    }


def test_asof_direction_validation(spark):
    import pytest as _pytest

    from uk_housing_dashboard_etl_spark.operators.temporal_joins import (
        asof_join,
    )

    df = spark.createDataFrame([(1, None)], "user_id long, ts timestamp")
    with _pytest.raises(ValueError, match="direction"):
        asof_join(df, df, "user_id", direction="nearest")
