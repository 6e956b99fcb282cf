"""Semantic tests for the behavior + stats operator batch: edge cases the
sf-data oracle diff can't isolate (timestamp ties, gap weeks, empty
predecessors, subtotal rows)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.behavior import (
    cumulative_users,
    event_transitions,
    first_last_touch,
)
from uk_housing_dashboard_etl_spark.operators.stats import (
    corr_stats,
    grouping_sets_summary,
    price_histogram,
)
from uk_housing_dashboard_etl_spark.operators.timeseries import rolling_time_range


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=t, user_id=u, event_type=e, value=v, props=None)
         for (i, t, u, e, v) in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)  # a Monday


def test_cumulative_users_counts_each_user_once(spark):
    rows = [
        (1, T0, 1, "a", 1.0),
        (2, T0 + dt.timedelta(days=14), 1, "b", 1.0),  # returning, not new
        (3, T0 + dt.timedelta(days=14), 2, "a", 1.0),
        (4, T0 + dt.timedelta(days=15), 3, "a", 1.0),
        (5, T0 + dt.timedelta(days=28), None, "a", 1.0),  # null user dropped
    ]
    out = {r["week"].date(): (r["new_users"], r["cumulative_users"])
           for r in cumulative_users(_ev(spark, rows)).collect()}
    assert out == {
        dt.date(2024, 1, 1): (1, 1),
        dt.date(2024, 1, 15): (2, 3),
    }


def test_event_transitions_excludes_first_event_and_breaks_ties(spark):
    rows = [
        (2, T0, 1, "b", 1.0),   # same ts — event_id orders a(1) before b(2)
        (1, T0, 1, "a", 1.0),
        (3, T0 + dt.timedelta(hours=1), 1, "c", 1.0),
        (9, T0, 2, "solo", 1.0),  # single-event user: no transitions
    ]
    got = {(r["prev_type"], r["next_type"]): r["transitions"]
           for r in event_transitions(_ev(spark, rows)).collect()}
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def test_first_last_touch_tie_break_and_exact_sum(spark):
    rows = [
        (2, T0, 7, "second", 0.1),
        (1, T0, 7, "first", 0.2),   # ts tie: event_id 1 wins "first"
        (3, T0 + dt.timedelta(days=1), 7, "last", 0.3),
    ]
    r = first_last_touch(_ev(spark, rows), deterministic_sum=True).collect()[0]
    assert (r["first_type"], r["last_type"]) == ("first", "last")
    assert r["n_events"] == 3
    assert abs(r["total_value"] - 0.6) < 1e-12  # exact unit sum, no fp drift


def test_corr_stats_matches_closed_form(spark):
    df = spark.createDataFrame(
        [("A", "x", 1.0, 10.0), ("A", "x", 2.0, 20.0), ("A", "x", 3.0, 31.0)],
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double",
    )
    r = corr_stats(df).collect()[0]
    xs, ys = [1.0, 2.0, 3.0], [10.0, 20.0, 31.0]
    mx, my = sum(xs) / 3, sum(ys) / 3
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / 2
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs) / 2)
    sy = math.sqrt(sum((y - my) ** 2 for y in ys) / 2)
    assert abs(r["qty_price_covar"] - cov) < 1e-9
    assert abs(r["qty_price_corr"] - cov / (sx * sy)) < 1e-9


def test_price_histogram_bucket_edges(spark):
    df = spark.createDataFrame(
        [(24999.99,), (25000.0,), (49999.0,), (50000.0,), (None,)],
        "o_totalprice double",
    )
    got = {r["bucket"]: (r["n_orders"], r["bucket_lo"])
           for r in price_histogram(df).collect()}
    assert got == {0: (1, 0.0), 1: (2, 25000.0), 2: (1, 50000.0)}


def test_grouping_sets_has_exactly_three_granularities(spark):
    df = spark.createDataFrame(
        [("A", "F", 1.0, 10.0), ("A", "O", 2.0, 20.0), ("B", "F", 3.0, 30.0)],
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double",
    )
    rows = grouping_sets_summary(df).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    # gid 0 = (rf, ls) detail, 1 = rf subtotal, 3 = grand total
    assert set(by_gid) == {0, 1, 3}
    assert len(by_gid[0]) == 3 and len(by_gid[1]) == 2 and len(by_gid[3]) == 1
    grand = by_gid[3][0]
    assert grand["n"] == 3 and abs(grand["sum_qty"] - 6.0) < 1e-12


def test_range_rolling_honors_gaps_without_densify(spark):
    # weeks 0, 1, and 6 — the 28-day frame at week 6 must NOT see weeks 0/1
    weekly = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1), "LA1", 10, 100.0),
            (dt.datetime(2024, 1, 8), "LA1", 20, 200.0),
            (dt.datetime(2024, 2, 12), "LA1", 5, 50.0),
        ],
        "week timestamp, local_authority string, transactions bigint, "
        "price_mean double",
    )
    out = {r["week"].date(): (r["range_trans"], r["weeks_present"])
           for r in rolling_time_range(weekly, days=28).collect()}
    assert out[dt.date(2024, 1, 8)] == (30, 2)   # week 0 within 28 days
    assert out[dt.date(2024, 2, 12)] == (5, 1)   # 35/42 days back: excluded


def test_active_suppliers_semi_join_no_duplicates(spark):
    from uk_housing_dashboard_etl_spark.operators.relational import active_suppliers

    supplier = spark.createDataFrame(
        [(1, "s1", 10), (2, "s2", 10)],
        "s_suppkey bigint, s_name string, s_nationkey bigint",
    )
    nation = spark.createDataFrame(
        [(10, "N")], "n_nationkey bigint, n_name string"
    )
    li = spark.createDataFrame(
        [(1, dt.datetime(1998, 5, 1)), (1, dt.datetime(1998, 6, 1)),
         (2, dt.datetime(1997, 1, 1))],
        "l_suppkey bigint, l_shipdate timestamp",
    )
    rows = active_suppliers(supplier, nation, li).collect()
    # supplier 1 has TWO recent shipments but appears once (semi join)
    assert [(r["s_suppkey"], r["nation"]) for r in rows] == [(1, "N")]


def test_heavy_hitters_and_skew_summary_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import (
        heavy_hitters,
        key_skew_summary,
    )

    rows = [("hot",)] * 6 + [("a",)] * 2 + [("b",)] * 2
    df = spark.createDataFrame(rows, ["k"])

    top = heavy_hitters(df, ["k"], top_n=2).toPandas().set_index("rank")
    assert list(top["k"]) == ["hot", "a"]  # tie a/b broken by key asc
    assert top.loc[1, "share"] == 0.6 and top.loc[1, "cum_share"] == 0.6
    assert top.loc[2, "share"] == 0.2 and top.loc[2, "cum_share"] == 0.8

    s = key_skew_summary(df, ["k"]).toPandas().iloc[0]
    assert s.n_keys == 3 and s.n_rows == 10 and s.max_count == 6
    # per-key sizes [2, 2, 6]: p50 = 2.0, skew = 6 / (10/3) = 1.8
    assert s.p50_count == 2.0
    assert s.skew_factor == 1.8


def test_debounce_chained_lag_semantics(spark):
    from uk_housing_dashboard_etl_spark.operators.behavior import (
        debounce_events,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1 type A at minutes 0, 7, 14: chained lag flags BOTH the
        # 7' and 14' events (each within 10' of its predecessor)
        (1, t(0), 1, "A"), (2, t(7), 1, "A"), (3, t(14), 1, "A"),
        # 25' is 11' after 14': kept
        (4, t(25), 1, "A"),
        # different type is an independent chain
        (5, t(1), 1, "B"),
        # same-instant burst: tie broken by event_id, second is dup
        (6, t(30), 2, "A"), (7, t(30), 2, "A"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = debounce_events(df).toPandas().set_index("event_id")
    assert not out.loc[1, "is_dup"] and out.loc[2, "is_dup"]
    assert out.loc[3, "is_dup"] and not out.loc[4, "is_dup"]
    assert not out.loc[5, "is_dup"]
    assert not out.loc[6, "is_dup"] and out.loc[7, "is_dup"]


def test_cap_events_per_key_daily_cut(spark):
    from uk_housing_dashboard_etl_spark.operators.behavior import (
        cap_events_per_key,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1 + i // 10, 0, i % 10), 1, "A")
        for i in range(14)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = cap_events_per_key(df, max_per_day=3).toPandas()
    d1 = out[out.day == dt.date(2024, 1, 1)]
    assert d1.kept.sum() == 3 and len(d1) == 10
    assert set(d1[d1.kept].event_id) == {0, 1, 2}  # earliest first
    d2 = out[out.day == dt.date(2024, 1, 2)]
    assert d2.kept.sum() == 3 and len(d2) == 4  # cap resets per day


def test_user_sequences_order_and_truncation(spark):
    from uk_housing_dashboard_etl_spark.operators.behavior import (
        user_sequences,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i), 1, f"e{i}") for i in range(5)
    ] + [
        # same-instant pair for user 2: event_id orders them
        (10, dt.datetime(2024, 1, 1), 2, "B"),
        (9, dt.datetime(2024, 1, 1), 2, "A"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = user_sequences(df, max_len=3).toPandas().set_index("key")
    # user 1: 5 events, keep the most recent 3
    assert out.loc[1, "sequence"] == "e2 e3 e4"
    assert out.loc[1, "seq_len"] == 3 and bool(out.loc[1, "truncated"])
    # user 2: tie broken by event_id -> A (id 9) before B (id 10)
    assert out.loc[2, "sequence"] == "A B" and not out.loc[2, "truncated"]


def test_table_profile_counts(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import table_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "b")], ["k", "v"]
    )
    out = table_profile(df).toPandas().set_index("column")
    assert out.loc["k", "n_rows"] == 4 and out.loc["k", "n_nulls"] == 0
    assert out.loc["k", "n_distinct"] == 3
    assert out.loc["v", "n_nulls"] == 1 and out.loc["v", "n_distinct"] == 2
    assert out.loc["v", "null_frac"] == 0.25
    assert out.loc["k", "distinct_frac"] == 0.75


def test_time_weighted_mean_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.timeseries import (
        time_weighted_mean,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # value 10 held 1 min, value 20 held 3 min, last obs unweighted
        (1, t(0), 1, "A", 10.0),
        (2, t(1), 1, "A", 20.0),
        (3, t(4), 1, "A", 99.0),
        # single observation -> no elapsed time -> NULL twap
        (4, t(0), 2, "A", 5.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = time_weighted_mean(df).toPandas().set_index("key")
    # (10*1 + 20*3) / 4 = 17.5
    assert out.loc[1, "twap"] == 17.5 and out.loc[1, "n_obs"] == 3
    assert out.loc[2, "n_obs"] == 1 and pd_isna(out.loc[2, "twap"])


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_join_cardinality_exact_product(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import (
        join_cardinality,
    )

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], ["k"]
    )
    right = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (9,)], ["k"]
    )
    out = join_cardinality(left, right, ["k"]).toPandas().iloc[0]
    # key 1: 2*3=6, key 2: 1*1=1, key 3/9 unmatched
    assert out.matched_keys == 2 and out.join_rows == 7
    assert out.left_rows == 4 and out.right_rows == 5
    assert out.amplification == 1.4  # 7 / max(4,5)


def test_grouped_slope_recovers_planted_line(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import grouped_slope

    # y = 2.5x + 7 exactly; one flat group; one single-point group
    rows = (
        [("lin", x, 2.5 * x + 7.0) for x in range(10)]
        + [("flat", x, 42.0) for x in range(5)]
        + [("single", 3, 9.0)]
    )
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = (
        grouped_slope(df, ["g"], F.col("x"), F.col("y"))
        .toPandas()
        .set_index("g")
    )
    assert out.loc["lin", "slope"] == 2.5 and out.loc["lin", "intercept"] == 7.0
    assert out.loc["flat", "slope"] == 0.0 and out.loc["flat", "intercept"] == 42.0
    # zero x-variance -> NULL slope, not a crash or a division blowup
    import pandas as pd

    assert pd.isna(out.loc["single", "slope"])


def test_psi_drift_detects_shift(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import psi_drift

    # "stable": identical uniform values both periods -> psi ~ 0
    # "shifted": current values land entirely in the top reference decile
    rows = []
    for i in range(100):
        rows.append(("stable", float(i % 10), True))
        rows.append(("stable", float(i % 10), False))
        rows.append(("shifted", float(i % 10), True))
        rows.append(("shifted", 100.0 + i, False))
    df = spark.createDataFrame(rows, ["g", "value", "ref"])
    out = psi_drift(df, ["g"], "value", F.col("ref")).toPandas().set_index("g")
    assert out.loc["stable", "psi"] < 0.01
    assert not out.loc["stable", "drifted"]
    assert out.loc["shifted", "psi"] > 1.0 and bool(out.loc["shifted", "drifted"])
    assert out.loc["shifted", "n_ref"] == 100 and out.loc["shifted", "n_cur"] == 100


def test_attribution_credit_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.behavior import (
        attribution_credit,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: view, click -> purchase (0.5 each), then view -> purchase
        (1, t(0), 1, "view"),
        (2, t(1), 1, "click"),
        (3, t(2), 1, "purchase"),
        (4, t(3), 1, "view"),
        (5, t(4), 1, "purchase"),
        # user 2: purchase with NO touches -> unattributed
        (6, t(0), 2, "purchase"),
        # user 3: touches but no conversion -> zero credit
        (7, t(0), 3, "view"),
        (8, t(1), 3, "click"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = attribution_credit(df).toPandas().set_index("event_type")
    # view: 0.5 (first window) + 1.0 (second window) = 1.5
    assert out.loc["view", "credit"] == 1.5 and out.loc["view", "n_touches"] == 2
    assert out.loc["click", "credit"] == 0.5
    assert out.loc["purchase", "credit"] == 1.0  # user 2 unattributed
    # total credit equals the number of conversions
    assert abs(out.credit.sum() - 3.0) < 1e-9
    # user 3's touches earn nothing (click appears once, from user 1)
    assert out.loc["click", "n_touches"] == 1
