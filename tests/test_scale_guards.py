"""Guardrails that keep the deliberately-quadratic oracle baselines from
shipping by accident at scale (VERDICT r2 items 3/6/7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators import similarity
from uk_housing_dashboard_etl_spark.operators.dedup import ngram_jaccard_pairs
from uk_housing_dashboard_etl_spark.operators.similarity import (
    arrow_topk,
    embedding_near_dup,
)


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """40 docs sharing one boilerplate 3-gram; each doc also has a unique
    tail, and docs (2i, 2i+1) share a private near-dup body."""
    rows = []
    for i in range(40):
        pair = i // 2
        body = f"alpha{pair} beta{pair} gamma{pair} delta{pair} eps{pair}"
        rows.append((i, f"all rights reserved {body} tail{i} x{i} y{i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_cap_bounds_boilerplate_join(spark, boilerplate_docs):
    # the shared 'all rights reserved' shingle has df=40 -> 780 candidate
    # pairs in exact mode; with a df cap it contributes nothing and only
    # the private pair-bodies (df=2) survive the join
    exact = ngram_jaccard_pairs(boilerplate_docs, threshold=0.0)
    capped = ngram_jaccard_pairs(
        boilerplate_docs, threshold=0.0, max_shingle_df=2
    )
    n_exact = exact.count()
    n_capped = capped.count()
    assert n_exact >= 780  # boilerplate glued every pair together
    assert n_capped == 20  # only the 20 private near-dup pairs remain

    # capped jaccard is a lower bound on exact jaccard, never an invention
    e = {(r.doc_a, r.doc_b): r.jaccard for r in exact.collect()}
    for r in capped.collect():
        assert (r.doc_a, r.doc_b) in e
        assert r.jaccard <= e[(r.doc_a, r.doc_b)] + 1e-9


def test_ngram_cap_rejects_degenerate_cap(boilerplate_docs):
    with pytest.raises(ValueError, match="max_shingle_df"):
        ngram_jaccard_pairs(boilerplate_docs, max_shingle_df=1)


def test_near_dup_quadratic_guard(spark, monkeypatch):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    monkeypatch.setattr(similarity, "NEAR_DUP_QUADRATIC_MAX_ROWS", 5)
    with pytest.raises(ValueError, match="embedding_near_dup_lsh"):
        embedding_near_dup(emb, threshold=0.5)
    # explicit opt-in still runs the baseline
    out = embedding_near_dup(emb, threshold=0.99, allow_quadratic=True)
    assert out.count() > 0


def test_arrow_topk_query_size_guard(spark, monkeypatch):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(j, [1.0, float(j)]) for j in range(50)],
        "query_id long, embedding array<double>",
    )
    monkeypatch.setattr(similarity, "ARROW_TOPK_MAX_QUERY_MB", 1e-6)
    with pytest.raises(ValueError, match="lsh_bucketed_topk"):
        arrow_topk(emb, queries, k=3)
    monkeypatch.setattr(similarity, "ARROW_TOPK_MAX_QUERY_MB", 100.0)
    assert arrow_topk(emb, queries, k=3).count() == 150


def test_compressed_match_broadcast_guard(spark, monkeypatch):
    """VERDICT r3 item 3: above the distinct-name threshold the
    compressed matcher must DROP the broadcast hint (not raise — the
    shuffle join is still correct), with identical output."""
    from uk_housing_dashboard_etl_spark.operators import linkage
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        best_fuzzy_match_compressed,
    )

    rows = [(i, f"red widget{i % 3}") for i in range(12)]
    df = spark.createDataFrame(rows, ["p_partkey", "p_name"])

    hinted = best_fuzzy_match_compressed(df, df, max_dist=2)
    assert "strategy=broadcast" in hinted._jdf.queryExecution().analyzed().toString()
    monkeypatch.setattr(linkage, "COMPRESSED_BROADCAST_MAX_NAMES", 0)
    unhinted = best_fuzzy_match_compressed(df, df, max_dist=2)
    assert (
        "strategy=broadcast"
        not in unhinted._jdf.queryExecution().analyzed().toString()
    )
    key = lambda r: (r["left_key"], r["match_key"], r["distance"])
    assert sorted(map(key, hinted.collect())) == sorted(
        map(key, unhinted.collect())
    )


def test_ewma_series_length_guard(spark):
    """VERDICT r3 item 5: fact-grain input (series longer than the
    bound) must raise inside the plan instead of folding quadratically."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from uk_housing_dashboard_etl_spark.operators.timeseries import ewma_smooth

    rows = [("LA1", f"2024-{1 + i // 28:02d}-{1 + i % 28:02d}", i) for i in range(40)]
    df = spark.createDataFrame(
        rows, ["local_authority", "week", "transactions"]
    )
    with pytest.raises(SparkRuntimeException, match="max_series_len"):
        ewma_smooth(df, max_series_len=10).collect()
    # at or under the bound the fold runs normally
    assert ewma_smooth(df, max_series_len=40).count() == 40


def test_vocab_growth_empty_corpus(spark):
    """ADVICE r3: an empty documents frame must yield an empty result
    with the output schema, not TypeError on int(None)."""
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        vocab_growth,
    )

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    out = vocab_growth(empty, n_buckets=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "bucket",
        "n_docs",
        "tokens_cum",
        "vocab_cum",
    ]
