"""Unit tests for the round-5 operators: Mann-Whitney U, chi-square
independence, 2-D Pareto skyline, sweep-line peak concurrency, and CDC
replay. Each pins hand-computed semantics on tiny fixtures; oracle
parity at sf0.01 is covered by the contract registry
(tools/selfcheck.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(minute: int, second: int = 0, hour: int = 0, day: int = 1):
    return dt.datetime(2024, 1, day, hour, minute, second)


def test_mannwhitney_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import (
        mannwhitney_two_sample,
    )

    # a = {1, 2}, b = {3, 4}: ranks 1,2 vs 3,4 -> R_a = 3, U = 3 - 3 = 0
    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mannwhitney_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["u_stat"] == 0.0
    # mu = 2, var = (4/12)*(5 - 0) = 5/3, z = -2/sqrt(5/3)
    assert r["z_stat"] == pytest.approx(-1.5492, abs=1e-4)
    assert r["significant"] is False


def test_mannwhitney_midrank_ties(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import (
        mannwhitney_two_sample,
    )

    # value 2.0 appears in both groups: midrank (2+3)/2 = 2.5 each;
    # R_a = 1 + 2.5 = 3.5, U_a = 3.5 - 3 = 0.5
    rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mannwhitney_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert r["u_stat"] == 0.5
    # tie_sum = 2^3 - 2 = 6; var = (4/12)*(5 - 6/12) = 1.5
    assert r["z_stat"] == pytest.approx((0.5 - 2.0) / (1.5**0.5), abs=1e-4)


def test_mannwhitney_degenerate_all_tied(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import (
        mannwhitney_two_sample,
    )

    rows = [("a", 5.0), ("a", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mannwhitney_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert r["z_stat"] is None and r["significant"] is None


def test_chi2_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import (
        chi2_independence,
    )

    # 2x2 table [[10, 20], [20, 10]]: chi2 = 60*(10*10-20*20)^2/(30^4)
    rows = (
        [("x", 0)] * 10 + [("x", 1)] * 20 + [("y", 0)] * 20 + [("y", 1)] * 10
    )
    df = spark.createDataFrame(rows, ["t", "b"])
    r = chi2_independence(df, "t", F.col("b")).collect()[0]
    assert (r["n"], r["n_rows"], r["n_cols"], r["dof"]) == (60, 2, 2, 1)
    expected = 60.0 * (10 * 10 - 20 * 20) ** 2 / (30.0**4)
    assert r["chi2"] == pytest.approx(expected, abs=1e-4)
    # 2x2 Cramér's V = sqrt(chi2 / n)
    assert r["cramers_v"] == pytest.approx((expected / 60.0) ** 0.5, abs=1e-4)


def test_chi2_independent_is_zero(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import (
        chi2_independence,
    )

    rows = [("x", 0)] * 6 + [("x", 1)] * 6 + [("y", 0)] * 3 + [("y", 1)] * 3
    df = spark.createDataFrame(rows, ["t", "b"])
    r = chi2_independence(df, "t", F.col("b")).collect()[0]
    assert r["chi2"] == 0.0


def test_pareto_skyline_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.relational import (
        pareto_skyline,
    )

    rows = [
        (1, 10.0, 5),  # frontier (cheapest)
        (2, 10.0, 3),  # dominated by 1 (same price, smaller)
        (3, 20.0, 8),  # frontier
        (4, 25.0, 8),  # dominated by 3 (pricier, same size)
        (5, 30.0, 9),  # frontier
        (6, 15.0, 5),  # dominated by 1 (pricier, same size)
    ]
    df = spark.createDataFrame(rows, ["id", "price", "size"])
    got = sorted(r["id"] for r in pareto_skyline(df, "price", "size").collect())
    assert got == [1, 3, 5]


def test_pareto_skyline_keeps_duplicates(spark):
    from uk_housing_dashboard_etl_spark.operators.relational import (
        pareto_skyline,
    )

    # two identical frontier points: neither dominates the other (no
    # strict inequality), both stay — matching the NOT EXISTS oracle
    rows = [(1, 10.0, 5), (2, 10.0, 5), (3, 5.0, 5)]
    df = spark.createDataFrame(rows, ["id", "price", "size"])
    got = sorted(r["id"] for r in pareto_skyline(df, "price", "size").collect())
    assert got == [3]
    rows2 = [(1, 10.0, 7), (2, 10.0, 7), (3, 5.0, 5)]
    df2 = spark.createDataFrame(rows2, ["id", "price", "size"])
    got2 = sorted(
        r["id"] for r in pareto_skyline(df2, "price", "size").collect()
    )
    assert got2 == [1, 2, 3]


def test_peak_concurrency_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.timeseries import (
        peak_concurrency,
    )

    rows = [
        (_ts(0), _ts(10)),
        (_ts(5), _ts(15)),  # overlaps first -> 2 active
        (_ts(10), _ts(20)),  # starts exactly as first ends -> still 2
    ]
    df = spark.createDataFrame(rows, ["start_ts", "end_ts"])
    r = peak_concurrency(df).collect()[0]
    assert r["n_started"] == 3
    assert r["peak_active"] == 2  # end-exclusive: never 3


def test_peak_concurrency_midnight_carry(spark):
    from uk_housing_dashboard_etl_spark.operators.timeseries import (
        peak_concurrency,
    )

    # two intervals open across midnight; day-2 peak must include them
    rows = [
        (_ts(0, day=1, hour=23), _ts(30, day=2, hour=1)),
        (_ts(10, day=1, hour=23), _ts(30, day=2, hour=1)),
        (_ts(0, day=2, hour=1), _ts(0, day=2, hour=2)),
    ]
    df = spark.createDataFrame(rows, ["start_ts", "end_ts"])
    out = {str(r["day"]): r for r in peak_concurrency(df).collect()}
    assert out["2024-01-01"]["peak_active"] == 2
    assert out["2024-01-02"]["n_started"] == 1
    assert out["2024-01-02"]["peak_active"] == 3


def test_apply_cdc_upsert_and_delete(spark):
    from uk_housing_dashboard_etl_spark.operators.incremental import (
        apply_cdc,
    )

    rows = [
        (1, 1, "U", "a"),
        (1, 2, "U", "b"),  # kept: latest for key 1
        (2, 1, "U", "c"),
        (2, 2, "D", None),  # key 2 tombstoned
        (3, 1, "D", None),
        (3, 2, "U", "d"),  # delete then re-insert: kept
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "op", "val"])
    out = {r["k"]: r for r in apply_cdc(df, ["k"], ["seq"], "op").collect()}
    assert set(out) == {1, 3}
    assert out[1]["val"] == "b"
    assert out[3]["val"] == "d"


def _vecs(spark, rows, col="embedding"):
    return spark.createDataFrame(rows, ["vec_id", col])


def test_pq_lossless_when_codebook_covers_subvectors(spark):
    """Vectors built from ≤k distinct sub-blocks quantize losslessly, so
    ADC distances are EXACT and PQ top-k equals brute force."""
    from uk_housing_dashboard_etl_spark.operators.pq import (
        pq_encode,
        pq_fit,
        pq_topk,
    )
    from uk_housing_dashboard_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    blocks = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    rows = [
        (i, blocks[i % 3] + blocks[(i + 1) % 3] + blocks[(i + 2) % 3])
        for i in range(12)
    ]
    corpus = _vecs(spark, rows)
    qs = spark.createDataFrame(
        [(100, blocks[0] + blocks[1] + blocks[2])],
        ["query_id", "embedding"],
    )
    cb = pq_fit(corpus, m=3, k=4, iterations=3)
    approx = pq_topk(pq_encode(corpus, cb), cb, qs, k=5)
    exact = brute_force_topk(corpus, qs, k=5)
    got = {r["vec_id"] for r in approx.collect()}
    want = {r["vec_id"] for r in exact.collect()}
    assert got == want


def test_pq_survives_empty_cells(spark):
    """k far above the distinct-subvector count leaves Lloyd's with
    empty cells (ragged codebooks); the MAP-keyed ADC table must still
    resolve every code."""
    from uk_housing_dashboard_etl_spark.operators.pq import (
        pq_encode,
        pq_fit,
        pq_topk,
    )

    rows = [(i, [float(i % 2), 1.0, float((i + 1) % 2), 1.0]) for i in range(8)]
    corpus = _vecs(spark, rows)
    cb = pq_fit(corpus, m=2, k=6, iterations=3)
    qs = spark.createDataFrame(
        [(0, [1.0, 1.0, 0.0, 1.0])], ["query_id", "embedding"]
    )
    out = pq_topk(pq_encode(corpus, cb), cb, qs, k=8).collect()
    assert len(out) == 8
    assert all(r["dist"] is not None for r in out)


def test_pq_rerank_scores_are_exact_cosine(spark):
    from uk_housing_dashboard_etl_spark.operators.pq import (
        pq_encode,
        pq_fit,
        pq_topk_rerank,
    )
    from uk_housing_dashboard_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    corpus = _vecs(spark, rows)
    qs = spark.createDataFrame(
        [(0, rows[0][1])], ["query_id", "embedding"]
    )
    approx = pq_topk_rerank(
        pq_encode(corpus, pq_fit(corpus, m=4, k=8, iterations=2)),
        pq_fit(corpus, m=4, k=8, iterations=2),
        corpus,
        qs,
        k=5,
        oversample=6,
    )
    exact = {r["vec_id"]: r["score"] for r in
             brute_force_topk(corpus, qs, k=30).collect()}
    for r in approx.collect():
        # reranked scores are the EXACT cosine, not the ADC estimate
        assert r["score"] == pytest.approx(exact[r["vec_id"]], abs=1e-4)


def test_cluster_split_is_leakage_safe(spark, sf_small):
    """Every member of a near-dup cluster must land in the SAME split —
    the property the doc-grain hash split violates by construction."""
    from uk_housing_dashboard_etl_spark.contract import QUERIES

    out = QUERIES["cluster_split"](spark, sf_small).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(v) == 1 for v in by_cluster.values())
    assert any(r["cluster_size"] > 1 for r in out)  # fixture has dups


def test_weekly_churn_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.contract import QUERIES  # noqa: F401
    from pyspark.sql import functions as F
    from uk_housing_dashboard_etl_spark.functions.rounding import round4  # noqa

    # build via the same lead()-window logic by calling the operator
    # shape directly on a tiny frame
    rows = [
        (1, _ts(0, day=1)),   # week of Jan 1 (Mon)
        (1, _ts(0, day=8)),   # retained into week 2
        (2, _ts(0, day=1)),   # churns after week 1
        (3, _ts(0, day=8)),   # appears week 2, churns after
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    wu = df.select(F.date_trunc("week", "ts").alias("week"), "user_id").distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("week")
    flagged = wu.select(
        (F.col("week") + F.expr("interval 7 days")).alias("week"),
        (F.lead("week").over(w) == F.col("week") + F.expr("interval 7 days")).alias("r"),
    )
    out = {
        str(r["week"])[:10]: r
        for r in flagged.groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("prev_active"),
            F.sum(F.coalesce(F.col("r"), F.lit(False)).cast("long")).alias("retained"),
        )
        .collect()
    }
    # week2 row reports on week1's cohort: users 1,2 active; 1 retained
    assert out["2024-01-08"]["prev_active"] == 2
    assert out["2024-01-08"]["retained"] == 1
    # week3 row: users 1,3 active week2, none retained
    assert out["2024-01-15"]["prev_active"] == 2
    assert out["2024-01-15"]["retained"] == 0
