"""Sketch operators: error bounds vs exact answers, mergeability."""

from __future__ import annotations

from uk_housing_dashboard_etl_spark.operators.sketches import (
    approx_cardinalities,
    mergeable_daily_distinct,
    quantile_sketch_summary,
)
from uk_housing_dashboard_etl_spark.sources.readers import read_table


def test_hll_cardinalities_within_bounds(spark, sf_med):
    out = approx_cardinalities(read_table(spark, sf_med, "events")).toPandas()
    assert len(out) == 5
    # lg_k=12 HLL: rsd ~1.6%; allow generous 5%
    assert (out["rel_error"] < 0.05).all(), out


def test_mergeable_daily_sketches_match_weekly_exact(spark, sf_med):
    out = mergeable_daily_distinct(read_table(spark, sf_med, "events")).toPandas()
    assert len(out) >= 4  # ~5 weeks of data
    rel = (
        (out["approx_weekly_distinct"] - out["exact_weekly_distinct"]).abs()
        / out["exact_weekly_distinct"]
    )
    # merged day-sketches must estimate the week as well as a direct
    # sketch would — union introduces no extra error for HLL
    assert (rel < 0.05).all(), out


def test_kll_quantiles_close_to_exact(spark, sf_med):
    out = quantile_sketch_summary(read_table(spark, sf_med, "events")).toPandas()
    assert (out["median_rel_error"] < 0.05).all(), out
    p90_rel = (out["approx_p90"] - out["exact_p90"]).abs() / out["exact_p90"]
    assert (p90_rel < 0.05).all(), out


def test_cms_never_underestimates_and_bounds_overestimate(spark):
    from uk_housing_dashboard_etl_spark.operators.sketches import (
        cms_frequency_estimates,
    )
    from pyspark.sql import functions as F

    # skewed keys: key 0 dominates; all collisions must only ADD
    rows = [(i % 7,) for i in range(500)] + [(0,) for _ in range(300)]
    df = spark.createDataFrame(rows, ["k"])
    probes = df.select("k").distinct()
    out = cms_frequency_estimates(
        df, "k", probes, width=64, depth=4
    ).collect()
    assert len(out) == 7
    n = 800
    for r in out:
        assert r["never_under"] is True
        assert r["est_n"] >= r["true_n"]
        # CMS bound: overestimate < depth-min of colliding mass; with
        # w=64 cells the expected excess per row is n/w ~ 12.5 — allow
        # a generous deterministic ceiling
        assert r["overestimate"] <= n // 2


def test_sketch_quantiles_retry_ors_a_second_draw(spark, monkeypatch):
    """The r11 one-shot retry's MISS path: when the first draw reports
    an out-of-band flag, the gate re-draws once and a flag passes if
    EITHER draw landed in band; exact percentiles come from the first
    draw. A systematic miss (both draws out) stays red."""
    from uk_housing_dashboard_etl_spark import contract
    from uk_housing_dashboard_etl_spark.operators import sketches

    def fake_summary_factory(flag_sequence):
        calls = {"n": 0}

        def fake(events, group_col="event_type", value_col="value"):
            in_band = flag_sequence[min(calls["n"], len(flag_sequence) - 1)]
            calls["n"] += 1
            lo, hi = (0.0, 10.0) if in_band else (7.0, 8.0)
            return spark.createDataFrame(
                [("a", 5.0, 9.0, 5.0, 9.0, lo, hi, lo, hi)],
                "event_type string, exact_median double, exact_p90 double,"
                " approx_median double, approx_p90 double,"
                " median_band_lo double, median_band_hi double,"
                " p90_band_lo double, p90_band_hi double",
            )

        fake.calls = calls
        return fake

    # approx_median=5 / approx_p90=9: in [0,10] band, out of [7,8] for
    # the median (9 stays inside either band for p90? 9 not in [7,8]);
    # first draw out, second draw in -> flags flip to TRUE via the OR
    fake = fake_summary_factory([False, True])
    monkeypatch.setattr(sketches, "quantile_sketch_summary", fake)
    out = contract.q_sketch_quantiles(spark, "/root/testdata/sf0.001")
    row = out.collect()[0]
    assert fake.calls["n"] == 2, "miss must trigger exactly one re-draw"
    assert row.median_in_rank_band and row.p90_in_rank_band
    assert row.exact_median == 5.0 and row.exact_p90 == 9.0

    # systematic miss: both draws out of band -> stays red
    fake2 = fake_summary_factory([False, False])
    monkeypatch.setattr(sketches, "quantile_sketch_summary", fake2)
    row2 = contract.q_sketch_quantiles(spark, "/root/testdata/sf0.001").collect()[0]
    assert fake2.calls["n"] == 2
    assert not row2.median_in_rank_band

    # happy path: one draw only
    fake3 = fake_summary_factory([True])
    monkeypatch.setattr(sketches, "quantile_sketch_summary", fake3)
    row3 = contract.q_sketch_quantiles(spark, "/root/testdata/sf0.001").collect()[0]
    assert fake3.calls["n"] == 1, "an in-band first draw must not re-draw"
    assert row3.median_in_rank_band


def test_sketch_quantiles_retry_group_mismatch_fails_band(spark, monkeypatch):
    """A retry draw that returns a DIFFERENT group set (a future filter
    change could shrink it) must surface as a failed band for the
    missing group — never a KeyError inside the gate (r11 advice)."""
    from uk_housing_dashboard_etl_spark import contract
    from uk_housing_dashboard_etl_spark.operators import sketches

    calls = {"n": 0}
    schema = (
        "event_type string, exact_median double, exact_p90 double,"
        " approx_median double, approx_p90 double,"
        " median_band_lo double, median_band_hi double,"
        " p90_band_lo double, p90_band_hi double"
    )

    def fake(events, group_col="event_type", value_col="value"):
        calls["n"] += 1
        if calls["n"] == 1:  # group "a", out of band -> triggers retry
            return spark.createDataFrame(
                [("a", 5.0, 9.0, 5.0, 9.0, 7.0, 8.0, 7.0, 8.0)], schema
            )
        # retry returns only group "b": "a" is missing from the re-draw
        return spark.createDataFrame(
            [("b", 5.0, 9.0, 5.0, 9.0, 0.0, 10.0, 0.0, 10.0)], schema
        )

    monkeypatch.setattr(sketches, "quantile_sketch_summary", fake)
    row = contract.q_sketch_quantiles(spark, "/root/testdata/sf0.001").collect()[0]
    assert calls["n"] == 2
    assert row.event_type == "a"
    assert not row.median_in_rank_band and not row.p90_in_rank_band
