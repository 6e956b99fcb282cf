"""Golden + property tests for the SURVEY.md §4 semantics gotcha list.

A small PPD-shaped fixture exercises every corner the reference's pandas
semantics pin down: exact percentiles, ddof=1 pooled z-scores, zero-fill
vs null-fill on the densified grid, null-skipping aggregates, unmatched
lookup keys, duplicate transaction ids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators import (
    coverage_report,
    densify_weekly_grid,
    detect_anomalies,
    enrich_with_lookup,
    rolling_windows,
    standardize_transactions,
    type_breakdown,
    weekly_mart,
)


@pytest.fixture(scope="module")
def fixture_raw(spark):
    rows = [
        # (id, date, price, postcode, type)
        ("t1", "2024-01-01", 100.0, "AA1 1AA", "D"),
        ("t1", "2024-01-02", 200.0, "AA1 1AA", "D"),  # duplicate id (A1)
        ("t2", "2024-01-03", 300.0, "aa1 1aa", "S"),  # case/space normalize (P7)
        ("t3", "2024-01-04", None, "AA1 1AA", "S"),   # null price (A2-A4 skip)
        ("t4", "2024-01-15", 400.0, "AA1 1AA", "T"),  # gap week before this (J2)
        ("t5", "2024-01-01", 50.0, "BB2 2BB", "F"),
        ("t6", "2024-01-08", 60.0, "BB2 2BB", "F"),
        ("t7", "2024-01-15", 70.0, "BB2 2BB", "F"),
        ("t8", "2024-01-01", 10.0, "ZZ9 9ZZ", "O"),   # unmatched postcode (J1)
        ("t9", "2024-01-02", None, "CC3 3CC", "D"),   # all-null-price group
    ]
    return spark.createDataFrame(
        rows,
        ["transaction_unique_id", "date_of_transfer", "price", "postcode", "property_type"],
    )


@pytest.fixture(scope="module")
def fixture_lookup(spark):
    return spark.createDataFrame(
        [("AA11AA", "Alpha"), ("BB22BB", "Beta"), ("CC33CC", "Gamma")],
        ["key", "local_authority"],
    )


@pytest.fixture(scope="module")
def enriched(fixture_raw, fixture_lookup):
    return enrich_with_lookup(standardize_transactions(fixture_raw), fixture_lookup)


@pytest.fixture(scope="module")
def weekly(enriched):
    return weekly_mart(enriched)


def test_left_join_keeps_unmatched_null_la(enriched):
    pdf = enriched.toPandas()
    assert len(pdf) == 10
    assert pdf.loc[pdf.key == "ZZ99ZZ", "local_authority"].isna().all()


def test_coverage_counts_unmatched(enriched):
    row = coverage_report(enriched).collect()[0]
    assert row["total_tx"] == 10
    assert row["mapped_tx"] == 9
    assert row["coverage_pct"] == pytest.approx(90.0)


def test_weekly_count_distinct_and_null_skipping(weekly):
    pdf = weekly.toPandas().set_index(["week", "local_authority"]).sort_index()
    wk1 = pd.Timestamp("2024-01-01")
    # Alpha week1: ids t1(x2),t2,t3 -> 3 distinct; prices 100,200,300 (null skipped)
    a = pdf.loc[(wk1, "Alpha")]
    assert a["transactions"] == 3
    assert a["price_mean"] == pytest.approx(200.0)
    assert a["price_median"] == pytest.approx(200.0)
    # exact linear interpolation: p10 of [100,200,300] = 120, p90 = 280
    assert a["price_p10"] == pytest.approx(120.0)
    assert a["price_p90"] == pytest.approx(280.0)
    # all-null price group -> null stats, count still present
    g = pdf.loc[(wk1, "Gamma")]
    assert g["transactions"] == 1
    assert np.isnan(g["price_mean"]) and np.isnan(g["price_median"])
    # null-LA rows are dropped from the mart (pandas groupby semantics)
    assert "ZZ99ZZ" not in pdf.index.get_level_values(1)


def test_type_breakdown_normalizes_and_counts(enriched):
    pdf = type_breakdown(enriched).toPandas()
    assert set(pdf["prop_type"]) <= {"d", "s", "t", "f", "o"}
    wk1 = pd.Timestamp("2024-01-01")
    d = pdf[(pdf.week == wk1) & (pdf.local_authority == "Alpha") & (pdf.prop_type == "d")]
    assert d["count"].iloc[0] == 2  # count(*), not count-distinct


def test_grid_densifies_global_range_and_zero_fills(weekly):
    dense = densify_weekly_grid(weekly).toPandas()
    # global weeks: 2024-01-01, 01-08, 01-15; LAs: Alpha, Beta, Gamma
    assert len(dense) == 9
    alpha_w2 = dense[
        (dense.week == pd.Timestamp("2024-01-08")) & (dense.local_authority == "Alpha")
    ].iloc[0]
    assert alpha_w2["transactions"] == 0  # zero-filled
    assert np.isnan(alpha_w2["price_mean"])  # price stays null


def test_rolling_min_periods_and_fanout(weekly):
    rolled = rolling_windows(densify_weekly_grid(weekly), [2, 4]).toPandas()
    assert set(rolled["window_weeks"]) == {2, 4}
    beta = (
        rolled[(rolled.local_authority == "Beta") & (rolled.window_weeks == 2)]
        .sort_values("week")
        .reset_index(drop=True)
    )
    # Beta: 1 tx each week -> rolling(2) sums: 1, 2, 2 ; min_periods=1 at head
    assert beta["rolling_trans"].tolist() == [1, 2, 2]
    b4 = (
        rolled[(rolled.local_authority == "Beta") & (rolled.window_weeks == 4)]
        .sort_values("week")
        .reset_index(drop=True)
    )
    assert b4["rolling_trans"].tolist() == [1, 2, 3]


def test_zscores_pooled_ddof1_and_zero_std(weekly):
    rolled = rolling_windows(densify_weekly_grid(weekly), [2, 4])
    scored = detect_anomalies(rolled).toPandas()
    # Beta transactions constant (1,1,1 in both window copies) -> std=0 -> z=0.0
    beta = scored[scored.local_authority == "Beta"]
    assert (beta["z_transactions"] == 0.0).all()
    assert (~beta["anomaly_transactions"]).all()
    # Alpha: pooled stats across BOTH window_weeks copies (ddof=1)
    alpha = scored[scored.local_authority == "Alpha"]
    t = alpha["transactions"].astype(float)
    expected = (t - t.mean()) / t.std(ddof=1)  # pandas default ddof=1
    np.testing.assert_allclose(
        alpha["z_transactions"].to_numpy(), expected.to_numpy(), rtol=1e-12
    )


def test_prefix_fallback_without_lookup(fixture_raw):
    tx = standardize_transactions(fixture_raw)
    out = enrich_with_lookup(tx, None).toPandas()
    assert set(out["local_authority"].dropna()) == {"AA11", "BB22", "ZZ99", "CC33"}


def test_weekly_matches_pandas_golden(spark):
    """Golden cross-check: random data, independent pandas computation."""
    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "transaction_unique_id": [f"id{i}" for i in range(n)],
            "date_of_transfer": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 70, n), unit="D"),
            "price": np.where(rng.random(n) < 0.1, np.nan, rng.uniform(1e4, 1e6, n)),
            "postcode": rng.choice(["AA1 1AA", "BB2 2BB", "CC3 3CC"], n),
            "property_type": rng.choice(["D", "S", "T"], n),
        }
    )
    lookup = spark.createDataFrame(
        [("AA11AA", "Alpha"), ("BB22BB", "Beta"), ("CC33CC", "Gamma")],
        ["key", "local_authority"],
    )
    got = (
        weekly_mart(enrich_with_lookup(standardize_transactions(spark.createDataFrame(pdf)), lookup))
        .toPandas()
        .sort_values(["local_authority", "week"])
        .reset_index(drop=True)
    )
    # independent pandas computation of the same mart
    p = pdf.copy()
    la_map = {"AA1 1AA": "Alpha", "BB2 2BB": "Beta", "CC3 3CC": "Gamma"}
    p["local_authority"] = p["postcode"].map(la_map)
    p["week"] = p["date_of_transfer"].dt.to_period("W").dt.start_time
    exp = (
        p.groupby(["week", "local_authority"])
        .agg(
            transactions=("transaction_unique_id", "nunique"),
            price_mean=("price", "mean"),
            price_median=("price", "median"),
            price_p10=("price", lambda s: np.nanpercentile(s.dropna(), 10)),
            price_p90=("price", lambda s: np.nanpercentile(s.dropna(), 90)),
        )
        .reset_index()
        .sort_values(["local_authority", "week"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["transactions"], exp["transactions"])
    for c in ["price_mean", "price_median", "price_p10", "price_p90"]:
        np.testing.assert_allclose(got[c], exp[c], rtol=1e-9)
    assert (got["week"].to_numpy() == exp["week"].to_numpy()).all()


def test_robust_anomalies_constant_and_outlier(spark):
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.anomaly import robust_anomalies

    def wk(i):
        return dt.datetime(2024, 1, 1) + dt.timedelta(weeks=i)

    rows = (
        # constant group: MAD 0 -> rz exactly 0.0, never a flag
        [(wk(i), "FLAT", 7) for i in range(6)]
        # stable group with one huge outlier week
        + [(wk(i), "SPIKE", 10 + (i % 2)) for i in range(8)]
        + [(wk(8), "SPIKE", 1000)]
    )
    df = spark.createDataFrame(
        rows, "week timestamp, local_authority string, transactions long"
    )
    out = robust_anomalies(df)
    flat = out.where("local_authority = 'FLAT'").collect()
    assert all(r["robust_z"] == 0.0 and not r["anomaly_robust"] for r in flat)
    spike = {r["week"]: r for r in out.where("local_authority = 'SPIKE'").collect()}
    assert spike[wk(8)]["anomaly_robust"]
    # the outlier must NOT drag the baseline: median stays ~10.x
    assert spike[wk(8)]["med"] <= 11.0
    normal_flags = [r["anomaly_robust"] for w, r in spike.items() if w != wk(8)]
    assert not any(normal_flags)


def test_modal_type_tie_breaks_lexicographically(spark):
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.relational import modal_type_per_la

    ts = dt.datetime(2024, 1, 3)
    df = spark.createDataFrame(
        [
            (ts, "LA1", "terraced"), (ts, "LA1", "terraced"),
            (ts, "LA1", "detached"), (ts, "LA1", "detached"),
            (ts, "LA1", "flat"),
            (ts, "LA2", "flat"),
            (ts, None, "flat"),
        ],
        "date timestamp, local_authority string, prop_type string",
    )
    out = {r["local_authority"]: (r["modal_type"], r["n_sales"])
           for r in modal_type_per_la(df).collect()}
    # 2-2 tie between detached and terraced -> lexicographically smaller
    assert out == {"LA1": ("detached", 2), "LA2": ("flat", 1)}
