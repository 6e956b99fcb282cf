"""Validation for the non-SQL-expressible extension operators: the hash-
family ops (MinHash LSH, SimHash, projection LSH) are checked against
their exact counterparts; multimodal plumbing is checked for schema,
batch shape, and determinism.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from uk_housing_dashboard_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_images,
    media_metadata,
    sample_frames,
)
from uk_housing_dashboard_etl_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
)
from uk_housing_dashboard_etl_spark.operators.text_analysis import doc_fingerprint
from uk_housing_dashboard_etl_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (0, base),
        (1, base),                                  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),        # near dup of 0
        (3, "completely different words about spark catalyst tungsten shuffles"),
        (4, "another unrelated document mentioning parquet and arrow batches"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(near_dup_docs):
    out = exact_dedup(near_dup_docs).toPandas().set_index("doc_id")
    assert out.loc[1, "canonical_id"] == 0 and bool(out.loc[1, "is_duplicate"])
    assert out.loc[0, "dup_count"] == 2 and not bool(out.loc[0, "is_duplicate"])
    assert not bool(out.loc[3, "is_duplicate"])


def test_minhash_finds_what_exact_jaccard_finds(near_dup_docs):
    exact = ngram_jaccard_pairs(near_dup_docs, threshold=0.5).toPandas()
    approx = minhash_lsh_pairs(near_dup_docs, threshold=0.5).toPandas()
    exact_pairs = set(zip(exact.doc_a, exact.doc_b))
    approx_pairs = set(zip(approx.doc_a, approx.doc_b))
    # high-similarity pairs must be recalled by LSH
    assert exact_pairs <= approx_pairs
    # and LSH must not hallucinate pairs with no real overlap
    assert (3, 4) not in approx_pairs and (0, 3) not in approx_pairs


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_med):
    docs = read_table(spark, sf_med, "documents")
    exact = ngram_jaccard_pairs(docs, threshold=0.2).toPandas()
    est = minhash_lsh_pairs(docs, threshold=0.0).toPandas()
    merged = exact.merge(est, on=["doc_a", "doc_b"], how="inner")
    # LSH with k=16,b=4 recalls the large majority of true >=0.2 pairs
    assert len(merged) >= 0.6 * len(exact)
    # and the signature estimate correlates with the exact jaccard
    if len(merged) >= 5:
        err = np.abs(merged.est_jaccard - merged.jaccard)
        assert err.mean() < 0.25


def test_simhash_near_dups_have_small_hamming(near_dup_docs):
    pairs = simhash_pairs(near_dup_docs, max_hamming=10).toPandas()
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 1) in got  # identical docs: hamming 0
    assert (0, 2) in got  # near dup: few bits differ
    ham = pairs.set_index(["doc_a", "doc_b"]).hamming
    assert ham.loc[(0, 1)] == 0
    assert (3, 4) not in got or ham.loc[(3, 4)] > 10  # unrelated stays out


def test_duplicate_clusters_transitive(spark):
    from uk_housing_dashboard_etl_spark.operators.dedup import duplicate_clusters

    ids = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    # chain 0-1-2-3 (transitive), pair 5-6, singletons 4 and 7
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], ["doc_a", "doc_b"]
    )
    out = duplicate_clusters(ids, pairs).toPandas().set_index("doc_id").sort_index()
    assert out.loc[[0, 1, 2, 3], "cluster_id"].tolist() == [0, 0, 0, 0]
    assert out.loc[[0, 1, 2, 3], "cluster_size"].tolist() == [4, 4, 4, 4]
    assert out.loc[5, "cluster_id"] == 5 and out.loc[6, "cluster_id"] == 5
    assert out.loc[4, "cluster_id"] == 4 and out.loc[4, "cluster_size"] == 1
    assert out.loc[7, "cluster_id"] == 7


def test_connected_components_deep_chain_and_random(spark):
    """Large-star/small-star must label a 64-node chain in far fewer
    rounds than its diameter, and agree with union-find on a random
    graph (shuffled ids so min-labels aren't trivially ordered)."""
    import random

    from uk_housing_dashboard_etl_spark.operators.dedup import connected_components

    n = 64
    perm = list(range(n))
    random.Random(7).shuffle(perm)
    ids = spark.createDataFrame([(p,) for p in perm], ["doc_id"])
    chain = [(perm[i], perm[i + 1]) for i in range(n - 1)]
    pairs = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    out = (
        connected_components(ids, pairs, max_iterations=8)
        .toPandas()
        .set_index("node")
    )
    assert set(out["cluster_id"]) == {0}

    # random sparse graph vs python union-find ground truth
    rng = random.Random(11)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(120)]
    parent = list(range(200))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    truth = {}
    for v in range(200):
        truth.setdefault(find(v), []).append(v)
    expect = {v: min(mem) for mem in truth.values() for v in mem}
    ids2 = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    pairs2 = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = (
        connected_components(ids2, pairs2)
        .toPandas()
        .set_index("node")["cluster_id"]
        .to_dict()
    )
    assert got == expect


def test_lsh_topk_recall_vs_brute_force(spark, sf_med):
    emb = read_table(spark, sf_med, "embeddings")
    corpus = emb.where(F.col("vec_id") >= 5)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(corpus, queries, k=10).toPandas()
    approx = lsh_bucketed_topk(corpus, queries, k=10, bits=4).toPandas()
    exact_set = set(zip(exact.query_id, exact.vec_id))
    approx_set = set(zip(approx.query_id, approx.vec_id))
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3  # 4-bit buckets ≈ 1/16 of corpus scanned
    # scores for overlapping pairs must agree exactly (same rerank math)
    merged = exact.merge(approx, on=["query_id", "vec_id"], suffixes=("_e", "_a"))
    assert (merged.score_e == merged.score_a).all()


def test_arrow_topk_bit_identical_to_jvm_fold(spark, sf_med):
    # The vectorized path must reproduce the interpreted fold EXACTLY —
    # per-dimension sequential accumulation, same rounding, same
    # tie-break — or the DuckDB oracle hash breaks. Full-row equality,
    # not approx.
    from uk_housing_dashboard_etl_spark.operators.similarity import arrow_topk

    emb = read_table(spark, sf_med, "embeddings")
    queries = emb.where(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sorted(map(tuple, brute_force_topk(emb, queries, k=7).collect()))
    arrow = sorted(map(tuple, arrow_topk(emb, queries, k=7).collect()))
    assert exact == arrow
    # carry_cols rides corpus columns through both paths identically
    lab = emb.withColumn("label", (F.col("vec_id") % 3).cast("int"))
    e2 = sorted(
        map(
            tuple,
            brute_force_topk(lab, queries, k=5, carry_cols=("label",)).collect(),
        )
    )
    a2 = sorted(
        map(
            tuple,
            arrow_topk(lab, queries, k=5, carry_cols=("label",)).collect(),
        )
    )
    assert e2 == a2


def test_decode_images_schema_and_determinism(near_dup_docs):
    media = attach_binary_payload(near_dup_docs)
    out = decode_images(media, fake=True, thumb=4)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,format:string,width:int,height:int,"
        "pixels:array<float>>"
    )
    pdf = out.toPandas().set_index("doc_id").sort_index()
    assert (pdf.width == 4).all() and (pdf.height == 4).all()
    assert all(len(p) == 16 for p in pdf.pixels)
    # deterministic: identical payloads -> identical pixels
    assert list(pdf.loc[0, "pixels"]) == list(pdf.loc[1, "pixels"])
    # real-codec path raises where PIL would be called
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        decode_images(media, fake=False).collect()


def test_sample_frames_stride_and_counts(near_dup_docs):
    media = attach_binary_payload(near_dup_docs)
    frames = sample_frames(media, every_n_bytes=64, max_frames=8).toPandas()
    meta = media.select("doc_id", "n_bytes").toPandas().set_index("doc_id")
    for doc_id, grp in frames.groupby("doc_id"):
        expected = min(8, -(-int(meta.loc[doc_id, "n_bytes"]) // 64))
        assert len(grp) == expected
        assert sorted(grp.frame_idx) == list(range(expected))


def test_media_metadata_partitions_by_format(near_dup_docs):
    out = media_metadata(attach_binary_payload(near_dup_docs)).toPandas()
    assert set(out.format) <= {"png", "jpeg", "webp"}
    assert out.n_items.sum() == 5


def test_fingerprint_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    fp = doc_fingerprint(docs).toPandas().set_index("doc_id").fingerprint
    assert fp[0] == fp[2]
    assert fp[0] != fp[1]


def test_repetition_stats_ratios(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam"),   # 4 bigrams, 1 distinct
            (1, "all tokens here are unique"), # 4 bigrams, 4 distinct
            (2, "word"),                        # no bigram at all
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[0]["total_ngrams"] == 4 and out[0]["distinct_ngrams"] == 1
    assert out[0]["dup_ngram_ratio"] == 0.75 and out[0]["repetitive"]
    assert out[0]["dup_token_ratio"] == 0.8
    assert out[1]["dup_ngram_ratio"] == 0.0 and not out[1]["repetitive"]
    assert out[2]["total_ngrams"] == 0 and out[2]["dup_ngram_ratio"] == 0.0
    assert not out[2]["repetitive"]


def test_filter_funnel_reasons(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        filter_funnel,
    )

    good = (
        "the quick brown fox jumps over a lazy dog and it is a truly fine "
        "day for all of us to wander in the old park that sits by the "
        "river while we talk of many things and watch the world go by"
    )
    docs = spark.createDataFrame(
        [
            (0, good),                                   # passes every rule
            (1, "tiny doc"),                             # too_short
            (2, "zzz qqq www eee rrr ttt yyy uuu iii"),  # low_quality (no stopwords)
            (3, "the cat " * 40),                        # repetitive bigrams
            # wrong_lang: long varied Spanish — unique fillers between
            # stopwords keep every bigram distinct and quality above bar
            (4, " ".join(
                f"{s} w{i}" for i, s in enumerate(
                    ["el", "la", "de", "que", "y", "en", "un", "es", "los", "por"] * 4
                )
            )),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in filter_funnel(docs).collect()}
    assert out[0]["keep"] and out[0]["drop_reason"] is None
    assert out[1]["drop_reason"] == "too_short"
    assert out[2]["drop_reason"] == "low_quality"
    assert out[3]["drop_reason"] == "repetitive"
    assert out[4]["drop_reason"] == "wrong_lang"
    assert not any(out[i]["keep"] for i in (1, 2, 3, 4))


def test_quantize_embeddings_roundtrip_bound(spark):
    from uk_housing_dashboard_etl_spark.operators.similarity import (
        quantize_embeddings,
    )

    vecs = spark.createDataFrame(
        [
            (0, [0.5, -0.25, 0.125, 0.0]),
            (1, [1.0, 1.0, -1.0, 0.5]),
            (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector: all-zero codes
            (3, [-0.003, 0.001, 0.002, -0.0005]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(vecs).collect()}
    for vid, r in out.items():
        assert all(-127 <= c <= 127 for c in r["codes"]), vid
        # symmetric quantization: |error| <= scale / (2*levels) + rounding slack
        assert r["max_err"] <= r["scale"] / (2 * 127) + 1e-4, vid
    assert out[2]["codes"] == [0, 0, 0, 0] and out[2]["max_err"] == 0.0
    # the largest-magnitude component always maps to ±levels
    assert 127 in [abs(c) for c in out[0]["codes"]]


def test_extract_features_normalized_and_deterministic(near_dup_docs):
    from uk_housing_dashboard_etl_spark.operators.multimodal import extract_features

    media = attach_binary_payload(near_dup_docs)
    out = extract_features(media, fake=True, dim=16)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,format:string,feature:array<float>,"
        "feat_norm:float>"
    )
    pdf = out.toPandas().set_index("doc_id").sort_index()
    assert all(len(f) == 16 for f in pdf.feature)
    # L1-normalized histogram: components sum to 1 for non-empty payloads
    assert all(abs(sum(f) - 1.0) < 1e-5 for f in pdf.feature)
    # deterministic: identical payloads -> identical features
    assert list(pdf.loc[0, "feature"]) == list(pdf.loc[1, "feature"])
    # the stubbed model path raises where the forward pass would run
    with pytest.raises(Exception, match="NotImplementedError|vision model"):
        extract_features(media, fake=False).collect()


def test_simhash_pigeonhole_guarantee(spark):
    """Round-1 verdict §wrong.3: a distance-5 pair differing in all four
    16-bit chunks was silently missed under chunks=4 + max_hamming=8.
    chunks now derives from max_hamming so the guarantee always holds."""
    from uk_housing_dashboard_etl_spark.operators.dedup import (
        simhash_pairs_from_signatures,
    )

    # b differs from a in bits {0, 1, 16, 32, 48}: Hamming distance 5,
    # with a differing bit inside EVERY one of the old 4 x 16-bit chunks.
    a_sig = 0
    b_sig = (1 << 0) | (1 << 1) | (1 << 16) | (1 << 32) | (1 << 48)
    sig = spark.createDataFrame([(0, a_sig), (1, b_sig)], ["doc_id", "simhash"])

    # the old buggy parameterization (guarantee broken) must now refuse
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs_from_signatures(sig, max_hamming=5, chunks=4)

    # the derived default (6 chunks for max_hamming=5) finds the pair
    found = simhash_pairs_from_signatures(sig, max_hamming=5).toPandas()
    assert set(zip(found.doc_a, found.doc_b)) == {(0, 1)}
    assert found.hamming.iloc[0] == 5

    # tighter radius still correctly excludes it (filter, not recall loss)
    none = simhash_pairs_from_signatures(sig, max_hamming=3).toPandas()
    assert len(none) == 0


def test_tfidf_top_terms_ranks_salient_words(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [
            (0, "common common unique0 common"),
            (1, "common unique1 unique1"),
            (2, "common filler"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, k=2).toPandas()
    top = out[out["rank"] == 1].set_index("doc_id")["term"]
    # 'common' appears in every doc -> idf = ln(1) = 0; unique terms win
    assert top.loc[0] == "unique0"
    assert top.loc[1] == "unique1"
    import math

    row = out[(out.doc_id == 1) & (out.term == "unique1")].iloc[0]
    assert row.tf == 2
    assert abs(row.tfidf - round(2 * math.log(3 / 1), 4)) < 1e-9


def test_ngram_novelty_fraction(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        ngram_novelty,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c d"),        # trigrams: 'a b c', 'b c d'
            (1, "a b c x"),        # trigrams: 'a b c', 'b c x'
            (2, "zz"),             # < 3 tokens: excluded
        ],
        ["doc_id", "text"],
    )
    out = ngram_novelty(docs, n=3).toPandas().set_index("doc_id").sort_index()
    assert list(out.index) == [0, 1]
    # 'a b c' is shared (df=2); the other trigram of each doc is unique
    assert out.loc[0, "n_ngrams"] == 2 and out.loc[0, "novel_ngrams"] == 1
    assert out.loc[1, "novelty"] == 0.5


def test_keep_best_dedup_prefers_quality(spark):
    from uk_housing_dashboard_etl_spark.operators.dedup import keep_best_dedup

    # docs 0 and 1 are exact dups after normalization; 1 has better
    # stopword/length quality context is identical so tie -> min id.
    # docs 2 and 3 dup with DIFFERENT ids but same text; 4 is unique.
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "  THE  cat sat on the mat "),   # same normalized content
            (2, "xxxx yyyy zzzz"),
            (3, "xxxx yyyy zzzz"),
            (4, "a completely different document for it is unique"),
        ],
        ["doc_id", "text"],
    )
    out = keep_best_dedup(docs).toPandas().set_index("doc_id").sort_index()
    # identical quality within each group -> smallest id wins
    assert out.loc[0, "keep"] and not out.loc[1, "keep"]
    assert out.loc[1, "canonical_id"] == 0
    assert out.loc[2, "keep"] and not out.loc[3, "keep"]
    assert out.loc[4, "keep"] and out.loc[4, "canonical_id"] == 4


def test_dup_span_stats_interval_union(spark):
    from uk_housing_dashboard_etl_spark.operators.dedup import dup_span_stats

    rows = [
        (0, "a b c d e f"),            # shares 5-grams [0] and [1] with doc 1
        (1, "a b c d e f"),            # exact dup of 0
        (2, "p q r s t u v w"),        # unique: zero coverage
        (3, "m n"),                    # shorter than k: no grams, zero row
        (4, "h i j k l h i j k l"),    # within-doc repeat: fully covered
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dup_span_stats(df, k=5).toPandas().set_index("doc_id")
    # docs 0/1: dup starts at pos 0 and 1 -> union [0,6) = 6 tokens of 6
    for d in (0, 1):
        assert out.loc[d, "dup_starts"] == 2
        assert out.loc[d, "covered_tokens"] == 6
        assert out.loc[d, "dup_ratio"] == 1.0
    assert out.loc[2, "covered_tokens"] == 0 and out.loc[2, "dup_ratio"] == 0.0
    assert out.loc[3, "n_tokens"] == 2 and out.loc[3, "dup_starts"] == 0
    # doc 4: "h i j k l" at pos 0 and 5 -> covered 10/10
    assert out.loc[4, "dup_starts"] == 2
    assert out.loc[4, "covered_tokens"] == 10
    assert out.loc[4, "dup_ratio"] == 1.0


def test_dedup_against_index_flags(spark):
    from uk_housing_dashboard_etl_spark.operators.dedup import (
        build_dedup_index,
        dedup_against_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    index = spark.createDataFrame(
        [(0, base), (2, "indexed but unrelated content about parquet files")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (1, base),                               # exact dup of index 0
            (3, base.replace("lazy", "sleepy")),     # near dup of index 0
            (5, "fresh never seen words entirely"),  # genuinely new
            (7, "twice in this batch identical"),    # batch-first keeps
            (9, "twice in this batch identical"),    # batch dup drops
        ],
        ["doc_id", "text"],
    )
    hashes, bands = build_dedup_index(index)
    out = (
        dedup_against_index(new, hashes, bands)
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "exact_dup_in_index"]) and not out.loc[1, "keep"]
    assert bool(out.loc[3, "near_dup_in_index"]) and not out.loc[3, "keep"]
    assert not out.loc[3, "exact_dup_in_index"]
    assert bool(out.loc[5, "keep"])
    assert bool(out.loc[7, "keep"]) and not out.loc[7, "exact_dup_in_batch"]
    assert bool(out.loc[9, "exact_dup_in_batch"]) and not out.loc[9, "keep"]


def test_semantic_decontaminate_flags_eval_twins(spark):
    from uk_housing_dashboard_etl_spark.operators.similarity import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),   # identical to eval 100
            (2, [0.0, 1.0, 0.0]),   # orthogonal to all eval vectors
            (3, [0.9, 0.1, 0.0]),   # near eval 100
        ],
        ["vec_id", "embedding"],
    )
    eval_set = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    out = (
        semantic_decontaminate(corpus, eval_set, threshold=0.9)
        .toPandas()
        .set_index("vec_id")
    )
    assert out.loc[1, "contaminated"] and out.loc[1, "closest_eval_id"] == 100
    assert out.loc[1, "max_eval_cosine"] == 1.0
    assert not out.loc[2, "contaminated"] and out.loc[2, "max_eval_cosine"] == 0.0
    assert bool(out.loc[3, "contaminated"])  # cos ~= 0.9939


def test_embedding_health_flags_bad_vectors(spark):
    from uk_housing_dashboard_etl_spark.operators.similarity import (
        embedding_health,
    )

    rows = [
        (1, [3.0, 4.0]),            # norm 5
        (2, [0.0, 0.0]),            # zero norm
        (3, [float("nan"), 1.0]),   # NaN element
        (4, None),                  # null vector
        (5, [1.0, 0.0, 0.0]),       # dim mismatch
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_health(df).toPandas().iloc[0]
    assert out.n_vectors == 5 and out.n_null == 1
    assert out.n_nan == 1 and out.n_zero_norm == 1
    assert out.dims_min == 2 and out.dims_max == 3
    assert out.norm_p50 > 0


def test_embedding_covariance_gram_kernel_matches_reference(spark):
    """r14 optimization: the per-row pair explode became a per-batch
    integer Gram matmul. Pin the kernel's exact integer semantics
    against a brute-force Python reference on a RAGGED corpus (the
    zero-padding must reproduce the old explode's per-position n and
    per-pair sums) and prove batch-split invariance (partials must sum
    identically across any partitioning)."""
    from uk_housing_dashboard_etl_spark.operators.similarity import (
        embedding_covariance,
    )

    vecs = [
        [1.0, -2.5, 0.25],
        [0.5, 1.5],            # ragged: shorter row
        [-1.0, 0.0, 2.0],
        [3.25, -0.75, 1.125],
        [2.0],                 # ragged: single-dim row
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )

    # brute-force reference: the old operator's exact integer moments
    import math

    units = [[math.floor(x * 1e6 + 0.5) for x in v] for v in vecs]
    expect = {}
    for i in range(1, 4):
        for j in range(i, 4):
            rows_ij = [u for u in units if len(u) >= j]
            if not rows_ij:
                continue
            sxy = sum(u[i - 1] * u[j - 1] for u in rows_ij)
            rows_i = [u for u in units if len(u) >= i]
            n = len(rows_i)
            sx = sum(u[i - 1] for u in rows_i)
            rows_j = [u for u in units if len(u) >= j]
            sy = sum(u[j - 1] for u in rows_j)
            cov = sxy / 1e12 / n - (sx / 1e6 / n) * (sy / 1e6 / n)
            expect[(i, j)] = (n, math.floor(cov * 1e4 + 0.5) / 1e4)

    for n_parts in (1, 3, 5):
        got = {
            (r["dim_i"], r["dim_j"]): (r["n"], r["cov"])
            for r in embedding_covariance(df.repartition(n_parts)).collect()
        }
        assert got == expect, f"mismatch at {n_parts} partitions"


def test_embedding_covariance_null_components_zero_fill(spark):
    """r15 ADVICE (medium): Arrow surfaces list<bigint>-with-NULLs as
    float64/NaN, and numpy's NaN->int64 cast silently wraps to
    INT64_MIN — the old 'x is None' fix-up never ran, so a direct
    operator call on [1.0, None, 2.0] returned covariances around
    -9.2e14. Pin the fixed semantics: a NULL component contributes
    NOTHING to any product or single sum (exactly the old SQL
    explode's dropped-NULL-term behavior), the row still counts into
    per-dimension n, and magnitudes stay sane."""
    import math

    from uk_housing_dashboard_etl_spark.operators.similarity import (
        embedding_covariance,
    )

    vecs = [[1.0, None, 2.0], [2.0, 3.0, 1.0], [0.5, -1.0, None]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    units = [
        [0 if x is None else math.floor(x * 1e6 + 0.5) for x in v]
        for v in vecs
    ]
    expect = {}
    for i in range(1, 4):
        for j in range(i, 4):
            sxy = sum(u[i - 1] * u[j - 1] for u in units)
            n = len(units)
            sx = sum(u[i - 1] for u in units)
            sy = sum(u[j - 1] for u in units)
            cov = sxy / 1e12 / n - (sx / 1e6 / n) * (sy / 1e6 / n)
            expect[(i, j)] = (n, math.floor(cov * 1e4 + 0.5) / 1e4)
    got = {
        (r["dim_i"], r["dim_j"]): (r["n"], r["cov"])
        for r in embedding_covariance(df).collect()
    }
    assert got == expect
    assert all(abs(c) < 1e6 for _, c in got.values())


def test_embedding_covariance_unit_bound_raises_not_wraps(spark):
    """r15 ADVICE (low): components whose 1e-6 units reach 2^31 would
    overflow a single int64 product — the kernel must refuse loudly
    (the old path wrapped silently). Components just under the bound
    stay exact via the rows-per-block clamp."""
    import pytest as _pytest

    from uk_housing_dashboard_etl_spark.operators.similarity import (
        embedding_covariance,
    )

    big = spark.createDataFrame(
        [(0, [3000.0, 1.0]), (1, [2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="2\\^31|overflow"):
        embedding_covariance(big).collect()

    near = spark.createDataFrame(
        [(0, [2000.0, -2000.0]), (1, [1999.5, 2000.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in embedding_covariance(near).collect()
    }
    # exact reference at the extreme magnitude (blocked int64 partials)
    import math

    units = [[2000000000, -2000000000], [1999500000, 2000000000]]
    for (i, j), cov_got in got.items():
        sxy = sum(u[i - 1] * u[j - 1] for u in units)
        sx = sum(u[i - 1] for u in units)
        sy = sum(u[j - 1] for u in units)
        cov = sxy / 1e12 / 2 - (sx / 1e6 / 2) * (sy / 1e6 / 2)
        assert cov_got == math.floor(cov * 1e4 + 0.5) / 1e4, (i, j)


def test_block_split_kernels_match_all_pairs_exactly(spark):
    """r15 block-parallel sharding (sf1 scale tier finding): when the
    session has more slots than buckets/cells, the per-group kernels
    shard each group's A-side and replicate members — results must be
    INVARIANT to the sharding. Force nsplit > 1 (bits=1 → 4 blocks,
    k=1 → 8 blocks on the 8-core test session) with parameters that
    make the candidate set exhaustive, so the outputs must EQUAL the
    all-pairs baseline bit for bit."""
    import numpy as np

    from uk_housing_dashboard_etl_spark.operators import similarity as sim
    from uk_housing_dashboard_etl_spark.operators.ivf import (
        semantic_near_dup,
    )
    from uk_housing_dashboard_etl_spark.operators.similarity import (
        embedding_near_dup,
        embedding_near_dup_lsh,
    )

    rng = np.random.default_rng(17)
    vecs = rng.normal(size=(60, 8))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup(df, threshold=0.2).collect()
    }
    assert exact, "fixture must produce pairs"

    # drop the size gate so the tiny fixture exercises the SPLIT path
    old_floor = sim.BLOCK_SPLIT_MIN_BYTES
    sim.BLOCK_SPLIT_MIN_BYTES = 0
    try:
        # bits=1 multi-probe covers BOTH buckets -> candidates exhaustive
        lsh = {
            (r.id_a, r.id_b): r.cosine
            for r in embedding_near_dup_lsh(
                df, threshold=0.2, bits=1
            ).collect()
        }
        assert lsh == exact

        # k=1 puts every vector in one cell -> candidates exhaustive
        sem = {
            (r.id_a, r.id_b): r.cosine
            for r in semantic_near_dup(
                df, threshold=0.2, k=1, iterations=1, n_probes=1
            ).collect()
        }
        assert sem == exact
    finally:
        sim.BLOCK_SPLIT_MIN_BYTES = old_floor

    # and the gated (unsplit) plan must agree too
    lsh1 = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_lsh(df, threshold=0.2, bits=1).collect()
    }
    assert lsh1 == exact
