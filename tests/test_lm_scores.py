"""Unit tests for the unigram-LM scorers (lm_scores / dsir_scores).

Edge semantics the sf-data selfcheck can't pin: zero entropy for
single-token repetition, exact hand-computed values on a tiny corpus,
add-one smoothing keeping target-absent terms finite, and score
monotonicity toward the target domain.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.text_analysis import (
    dsir_scores,
    lm_scores,
)


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "a a a a", "tgt"),          # degenerate: one distinct token
        (1, "a b a b", "tgt"),          # uniform over two tokens
        (2, "c d e f", "other"),        # all-distinct, off-domain terms
        (3, "a b c d", "other"),        # mixed
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_entropy_edges(tiny_docs):
    out = {r["doc_id"]: r for r in lm_scores(tiny_docs).collect()}
    # single distinct token -> zero entropy
    assert out[0]["entropy"] == 0.0
    assert out[0]["n_terms"] == 1 and out[0]["n_tokens"] == 4
    # uniform over 2 tokens -> ln 2
    assert out[1]["entropy"] == pytest.approx(math.log(2), abs=2e-4)
    # uniform over 4 tokens -> ln 4
    assert out[2]["entropy"] == pytest.approx(math.log(4), abs=2e-4)


def test_cross_entropy_hand_computed(tiny_docs):
    # corpus counts: a=7 b=3 c=2 d=2 e=1 f=1, total=16
    out = {r["doc_id"]: r for r in lm_scores(tiny_docs).collect()}
    exp0 = math.log(16 / 7)  # all four tokens are 'a'
    assert out[0]["cross_entropy"] == pytest.approx(exp0, abs=2e-4)
    exp2 = (
        math.log(16 / 2) + math.log(16 / 2) + math.log(16 / 1) + math.log(16 / 1)
    ) / 4
    assert out[2]["cross_entropy"] == pytest.approx(exp2, abs=2e-4)


def test_dsir_prefers_target_domain(tiny_docs):
    out = {
        r["doc_id"]: r
        for r in dsir_scores(tiny_docs, F.col("source") == "tgt").collect()
    }
    assert out[0]["is_target"] and not out[2]["is_target"]
    # docs made of target-domain tokens outscore the off-domain doc
    assert out[0]["dsir_score"] > out[2]["dsir_score"]
    assert out[1]["dsir_score"] > out[2]["dsir_score"]
    # smoothing keeps target-absent terms finite (doc 2 has none in target)
    assert math.isfinite(out[2]["dsir_score"])


def test_dsir_hand_computed(tiny_docs):
    # target totals: a=6 b=2 (tgt_total=8); vocab=6; corpus total=16
    out = {
        r["doc_id"]: r
        for r in dsir_scores(tiny_docs, F.col("source") == "tgt").collect()
    }
    exp0 = math.log((6 + 1) / (8 + 6)) - math.log(7 / 16)
    assert out[0]["dsir_score"] == pytest.approx(exp0, abs=2e-4)


def test_empty_and_whitespace_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "x y", "s"), (1, "   ", "s"), (2, "", "s")],
        ["doc_id", "text", "source"],
    )
    got = lm_scores(docs)
    assert [r["doc_id"] for r in got.collect()] == [0]
    got2 = dsir_scores(docs, F.lit(True))
    assert [r["doc_id"] for r in got2.collect()] == [0]


def test_source_overlap_edges(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        source_overlap,
    )

    docs = spark.createDataFrame(
        [
            (0, "w x y z q", "mirror1"),
            (1, "w x y z q", "mirror2"),   # identical vocab -> jaccard 1
            (2, "a b c d e f", "uniq"),    # disjoint from the mirrors
            (3, "a b c w x y", "mixed"),   # shares with both camps
        ],
        ["doc_id", "text", "source"],
    )
    out = {(r.source_a, r.source_b): r for r in source_overlap(docs, n=3).collect()}
    assert out[("mirror1", "mirror2")].jaccard == 1.0
    assert out[("mirror1", "mirror2")].containment == 1.0
    # disjoint pairs emit no row at all
    assert ("mirror1", "uniq") not in out and ("mirror2", "uniq") not in out
    # mixed shares exactly one trigram with each camp
    m = out[("mirror1", "mixed")]
    assert m.shared_ngrams == 1 and m.n_a == 3 and m.n_b == 4
    assert m.jaccard == pytest.approx(1 / 6, abs=1e-4)
    u = out[("mixed", "uniq")]
    assert u.shared_ngrams == 1  # 'a b c'


def test_bm25_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        bm25_scores,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark spark filter", "s"),   # tf: spark=2, filter=1
            (1, "spark other words here", "s"),
            (2, "nothing relevant at all", "s"),
            (3, "filter filter filter filter", "s"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {r.doc_id: r for r in bm25_scores(docs, ["spark", "filter"]).collect()}
    # non-matching doc never appears
    assert 2 not in out
    assert out[0].n_matched_terms == 2
    # hand-compute doc 0: N=4, avglen=(3+4+4+4)/4=3.75
    import math

    def idf(df):
        return math.log((4 - df + 0.5) / (df + 0.5) + 1.0)

    def part(tf, df, dl):
        return idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.75))

    exp0 = part(2, 2, 3) + part(1, 2, 3)
    assert out[0].bm25 == pytest.approx(exp0, abs=2e-4)
    # ranks are 1..n_matching with score-desc, doc_id tie-break order
    ranks = sorted((r.rank, d) for d, r in out.items())
    assert [r for r, _ in ranks] == [1, 2, 3]


def test_perplexity_buckets_equal_frequency_and_order(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        perplexity_buckets,
    )

    # 7 docs in lang "en" spanning a fluency gradient (common terms ->
    # rare terms), 2 in "fr": ntile(3) must cut 3/2/2 and 1/1/... per lang
    rows = [
        (0, "the the the the", "en"),
        (1, "the of the of", "en"),
        (2, "the of and to", "en"),
        (3, "of and to in", "en"),
        (4, "rare1 the of and", "en"),
        (5, "rare2 rare3 the of", "en"),
        (6, "rare4 rare5 rare6 rare7", "en"),
        (7, "le la", "fr"),
        (8, "zut alors", "fr"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = perplexity_buckets(df).toPandas()
    en = out[out.lang == "en"]
    sizes = en.bucket.value_counts()
    assert sizes.max() - sizes.min() <= 1 and sizes.sum() == 7
    # buckets are ordered: every head ce <= every middle ce <= every tail ce
    assert en[en.bucket == 1].cross_entropy.max() <= \
        en[en.bucket == 2].cross_entropy.min()
    assert en[en.bucket == 2].cross_entropy.max() <= \
        en[en.bucket == 3].cross_entropy.min()
    assert set(en.bucket_label) == {"head", "middle", "tail"}
    # languages rank independently
    assert set(out[out.lang == "fr"].bucket) <= {1, 2, 3}


def test_chunk_documents_windows_and_overlap(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        chunk_documents,
    )

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(0, words), (1, "a b c")], ["doc_id", "text"]
    )
    out = chunk_documents(df, chunk_tokens=4, overlap=2).toPandas()
    d0 = out[out.doc_id == 0].sort_values("chunk_idx")
    # stride 2 over 10 tokens: starts 0,2,4,6 -> 4 chunks
    assert list(d0.start_token) == [0, 2, 4, 6]
    assert list(d0.chunk_len) == [4, 4, 4, 4]
    assert d0.iloc[0].chunk_text == "w0 w1 w2 w3"
    assert d0.iloc[1].chunk_text == "w2 w3 w4 w5"  # 2-token overlap
    d1 = out[out.doc_id == 1]
    assert len(d1) == 1 and d1.iloc[0].chunk_text == "a b c"
    assert d1.iloc[0].chunk_len == 3

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_bpe_merge_candidates_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        bpe_merge_candidates,
    )

    # "abab" contributes pairs ab, ba, ab; two docs with it + one "ab"
    df = spark.createDataFrame(
        [(0, "abab abab"), (1, "ab"), (2, "x")], ["doc_id", "text"]
    )
    out = bpe_merge_candidates(df, top_n=5).toPandas().set_index("pair")
    # ab: 2 per "abab" x 2 occurrences + 1 from "ab" = 5; ba: 1 x 2 = 2
    assert out.loc["ab", "n_occurrences"] == 5
    assert out.loc["ba", "n_occurrences"] == 2
    assert out.loc["ab", "rank"] == 1
    # single-char word "x" contributes nothing
    assert len(out) == 2


def test_pmi_pairs_hand_computed(spark):
    import math

    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        pmi_pairs,
    )

    # "a b" co-occur in all 6 docs; "a c" in 3 of 6; c alone in 0 others
    rows = [(i, "a b" + (" c" if i < 3 else "")) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pmi_pairs(df, min_support=2).toPandas().set_index(
        ["word_a", "word_b"]
    )
    # PMI(a,b) = ln(6*6/(6*6)) = 0
    assert out.loc[("a", "b"), "pmi"] == 0.0
    # PMI(a,c) = ln(6*3/(6*3)) = 0; PMI(b,c) identical
    assert out.loc[("a", "c"), "pmi"] == 0.0
    # tighten: make c docs exclusive pairs with d
    rows2 = [(i, "x y") for i in range(4)] + [(9, "x z"), (10, "y z")]
    df2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    out2 = pmi_pairs(df2, min_support=2).toPandas().set_index(
        ["word_a", "word_b"]
    )
    # x,y: both in 5 docs, together in 4 of 6: ln(6*4/25)
    expected = math.floor(math.log(24 / 25) * 10000 + 0.5) / 10000
    assert out2.loc[("x", "y"), "pmi"] == expected
