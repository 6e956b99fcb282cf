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
