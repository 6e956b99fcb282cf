"""Unit tests for the round-3b operators: rrf_fusion, quality_calibrate,
vocab_growth, trimmed_stats.

Edge semantics the sf-data selfcheck can't pin: hand-computed RRF
contributions and list-membership counting, per-source percentile
independence from other sources, first-appearance bucketing of the
vocabulary curve, and exact trim-boundary row selection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.relational import trimmed_stats
from uk_housing_dashboard_etl_spark.operators.text_analysis import (
    quality_calibrate,
    rrf_fusion,
    vocab_growth,
)


@pytest.fixture(scope="module")
def probe_docs(spark):
    # 'alpha' appears in docs 0,1; 'beta' in docs 1,2. Doc 1 matches both
    # probe queries, docs 0 and 2 one each, doc 3 neither.
    rows = [
        (0, "alpha alpha x y", "s0"),
        (1, "alpha beta x y", "s0"),
        (2, "beta beta beta y", "s1"),
        (3, "x y z w", "s1"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_rrf_membership_and_order(probe_docs):
    out = rrf_fusion(probe_docs, [["alpha"], ["beta"]], k=10, depth=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 2}          # doc 3 is in neither list
    assert rows[1]["n_lists"] == 2
    assert rows[0]["n_lists"] == 1 and rows[2]["n_lists"] == 1
    # doc 1 fuses two lists; singletons can't beat it unless both of its
    # ranks are worse than the singleton's one rank — not possible at
    # equal depth with <= 2 docs/list: 1/(60+2)+1/(60+2) > 1/(60+1)
    assert rows[1]["rank"] == 1
    # contribution snap: a rank-1 list membership is exactly 164 units
    one_list_best = [r for r in rows.values() if r["n_lists"] == 1]
    assert all(abs(r["rrf"] - 0.0164) < 1e-9 for r in one_list_best if r["rrf"] > 0.016)


def test_rrf_units_exact(spark):
    # one doc, one list: rank 1 -> floor(10000/61 + 0.5) = 164 units
    docs = spark.createDataFrame([(7, "alpha", "s")], ["doc_id", "text", "source"])
    out = rrf_fusion(docs, [["alpha"]], k=5, depth=5).collect()
    assert len(out) == 1
    assert out[0]["rrf"] == 164 / 10000.0


def test_quality_calibrate_per_source(probe_docs):
    out = quality_calibrate(probe_docs, threshold=0.5)
    rows = out.collect()
    assert {r["source"] for r in rows} == {"s0", "s1"}
    # within each 2-doc source, percent_rank is exactly {0.0, 1.0}
    for src in ("s0", "s1"):
        pct = sorted(r["src_pctile"] for r in rows if r["source"] == src)
        assert pct == [0.0, 1.0]
    # keep flag respects the threshold on the rounded percentile
    for r in rows:
        assert r["keep"] == (1 if r["src_pctile"] >= 0.5 else 0)


def test_vocab_growth_first_appearance(spark):
    # ids 0..9 with n_buckets=5 -> two docs per bucket
    rows = [(i, "t%d common" % (i // 2), "s") for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["bucket"]: r for r in vocab_growth(docs, n_buckets=5).collect()}
    assert sorted(out) == [0, 1, 2, 3, 4]
    # every bucket introduces exactly one new t-term; 'common' counts
    # only in bucket 0
    assert out[0]["vocab_cum"] == 2
    assert [out[b]["vocab_cum"] for b in range(5)] == [2, 3, 4, 5, 6]
    # 2 docs x 2 tokens per bucket, cumulative
    assert [out[b]["tokens_cum"] for b in range(5)] == [4, 8, 12, 16, 20]
    assert all(out[b]["n_docs"] == 2 for b in range(5))


def test_trimmed_stats_exact_cut(spark):
    # 20 rows in one group: 5% trim -> cut = 1 row off each end
    rows = [(i, "G", float(v)) for i, v in enumerate([1000.0] + [10.0 * j for j in range(1, 19)] + [-500.0])]
    orders = spark.createDataFrame(rows, ["o_orderkey", "o_orderpriority", "o_totalprice"])
    out = trimmed_stats(orders).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_total"] == 20 and r["n_kept"] == 18
    # outliers -500 and 1000 are gone; kept range is the inner 18
    assert r["kept_min"] == 10.0 and r["kept_max"] == 180.0
    assert r["trimmed_mean"] == pytest.approx(sum(10.0 * j for j in range(1, 19)) / 18, abs=1e-4)


def test_trimmed_stats_no_cut_small_group(spark):
    # n=19 -> (19*5) div 100 = 0: nothing trimmed
    rows = [(i, "G", float(i)) for i in range(19)]
    orders = spark.createDataFrame(rows, ["o_orderkey", "o_orderpriority", "o_totalprice"])
    r = trimmed_stats(orders).collect()[0]
    assert r["n_total"] == 19 and r["n_kept"] == 19


def test_ewma_fold_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.timeseries import ewma_smooth

    rows = [
        ("A", "2024-01-01", 4),
        ("A", "2024-01-08", 8),
        ("A", "2024-01-15", 2),
        ("B", "2024-01-01", 10),
    ]
    df = spark.createDataFrame(
        rows, ["local_authority", "week", "transactions"]
    ).withColumn("week", F.col("week").cast("timestamp"))
    out = {
        (r["local_authority"], str(r["week"])): r["ewma"]
        for r in ewma_smooth(df).collect()
    }
    # seed = first value; then 0.5*x + 0.5*prev, exact dyadic doubles
    assert out[("A", "2024-01-01 00:00:00")] == 4.0
    assert out[("A", "2024-01-08 00:00:00")] == 6.0      # .5*8 + .5*4
    assert out[("A", "2024-01-15 00:00:00")] == 4.0      # .5*2 + .5*6
    assert out[("B", "2024-01-01 00:00:00")] == 10.0
