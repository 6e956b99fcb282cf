"""Hypothesis property tests for the semantics gotcha list (SURVEY §4):
random frames → the weekly mart must match an independent pandas
computation; normalizations must be idempotent; approx percentile mode
must stay within rank-error bounds of exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.cleaning import normalize_code
from uk_housing_dashboard_etl_spark.operators import (
    standardize_transactions,
    weekly_mart,
)
from uk_housing_dashboard_etl_spark.operators.weekly import enrich_with_lookup

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def tx_frames(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    prices = rng.uniform(1e3, 1e6, n)
    null_mask = rng.random(n) < draw(st.floats(0.0, 0.9))
    return pd.DataFrame(
        {
            "transaction_unique_id": [
                f"id{rng.integers(0, max(2, n // 2))}" for _ in range(n)
            ],  # collisions exercise count-distinct
            "date_of_transfer": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 45, n), unit="D"),
            "price": np.where(null_mask, np.nan, prices),
            "postcode": rng.choice(["AA1 1AA", "BB2 2BB"], n),
        }
    )


@SLOW
@given(pdf=tx_frames())
def test_weekly_mart_matches_pandas_on_random_frames(spark, pdf):
    lookup = spark.createDataFrame(
        [("AA11AA", "Alpha"), ("BB22BB", "Beta")], ["key", "local_authority"]
    )
    got = (
        weekly_mart(
            enrich_with_lookup(
                standardize_transactions(spark.createDataFrame(pdf)), lookup
            )
        )
        .toPandas()
        .sort_values(["local_authority", "week"])
        .reset_index(drop=True)
    )
    p = pdf.copy()
    p["local_authority"] = p["postcode"].map({"AA1 1AA": "Alpha", "BB2 2BB": "Beta"})
    p["week"] = p["date_of_transfer"].dt.to_period("W").dt.start_time
    exp = (
        p.groupby(["week", "local_authority"])
        .agg(
            transactions=("transaction_unique_id", "nunique"),
            price_mean=("price", "mean"),
            price_median=("price", "median"),
        )
        .reset_index()
        .sort_values(["local_authority", "week"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["transactions"], exp["transactions"])
    # price_mean uses dmean (1e-4-quantized inputs for cross-engine
    # determinism): within the documented 5e-5 envelope of the true mean
    np.testing.assert_allclose(
        got["price_mean"].astype(float),
        exp["price_mean"].astype(float),
        rtol=1e-9,
        atol=5.1e-5,
        equal_nan=True,
    )
    np.testing.assert_allclose(
        got["price_median"].astype(float),
        exp["price_median"].astype(float),
        rtol=1e-9,
        equal_nan=True,
    )


@SLOW
@given(
    s=st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
        max_size=20,
    )
)
def test_normalize_code_idempotent_and_spaceless(spark, s):
    df = spark.createDataFrame([(s,)], ["x"])
    once = df.select(normalize_code(F.col("x")).alias("y"))
    twice = once.select(normalize_code(F.col("y")).alias("y"))
    a, b = once.collect()[0]["y"], twice.collect()[0]["y"]
    assert a == b  # idempotent
    assert " " not in a and a == a.upper()


def test_approx_percentile_mode_close_to_exact(spark, sf_med):
    from uk_housing_dashboard_etl_spark.contract import (
        _enriched,
    )

    enriched = _enriched(spark, sf_med)
    exact = weekly_mart(enriched).toPandas().set_index(["week", "local_authority"])
    approx = (
        weekly_mart(enriched, approx=True)
        .toPandas()
        .set_index(["week", "local_authority"])
    )
    merged = exact.join(approx, lsuffix="_e", rsuffix="_a")
    assert (merged["transactions_e"] == merged["transactions_a"]).all()
    # percentile_approx returns an actual sample element (no
    # interpolation), so the correct envelope is RANK-based: the approx
    # median must lie within the exact p35..p65 band of its group
    band = (
        enriched.where(F.col("local_authority").isNotNull())
        .withColumn("week", F.date_trunc("week", F.col("date")))
        .groupBy("week", "local_authority")
        .agg(
            F.percentile("price", 0.35).alias("lo"),
            F.percentile("price", 0.65).alias("hi"),
        )
        .toPandas()
        .set_index(["week", "local_authority"])
    )
    j = merged.join(band)
    ok = (j["price_median_a"] >= j["lo"]) & (j["price_median_a"] <= j["hi"])
    assert ok.all(), j[~ok][["price_median_e", "price_median_a", "lo", "hi"]]


@st.composite
def word_corpora(draw):
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    n_docs = draw(st.integers(min_value=2, max_value=25))
    vocab = [f"w{i}" for i in range(draw(st.integers(3, 12)))]
    docs = []
    for i in range(n_docs):
        n_words = int(rng.integers(0, 30))
        docs.append((i, " ".join(rng.choice(vocab, n_words))))
    # plant one exact pair so dup machinery always has signal
    if n_docs >= 2 and docs[0][1]:
        docs[1] = (1, docs[0][1])
    return docs


@SLOW
@given(docs=word_corpora())
def test_dup_span_coverage_bounds_and_consistency(spark, docs):
    from uk_housing_dashboard_etl_spark.operators.dedup import dup_span_stats

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = dup_span_stats(df, k=3).toPandas()
    assert len(out) == len(docs)  # every doc appears
    # ratio in [0,1]; covered <= n_tokens; zero starts <=> zero coverage
    assert ((out.dup_ratio >= 0) & (out.dup_ratio <= 1)).all()
    assert (out.covered_tokens <= out.n_tokens).all()
    assert ((out.dup_starts == 0) == (out.covered_tokens == 0)).all()
    # hashed and exact shingle keys agree on real corpora
    out2 = dup_span_stats(df, k=3, hash_shingles=False).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


@SLOW
@given(docs=word_corpora())
def test_chunker_reconstructs_and_covers(spark, docs):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        chunk_documents,
    )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=8, overlap=2).toPandas()
    for doc_id, text in docs:
        # zero-token semantics (round 9): an empty/whitespace-only doc
        # has NO tokens — it still yields its one documented short-doc
        # chunk, but with chunk_len 0 and empty chunk_text
        toks = text.lower().split()
        chunks = out[out.doc_id == doc_id].sort_values("chunk_idx")
        assert len(chunks) >= 1
        # chunks tile the doc: stride 6, every token covered, last chunk
        # ends exactly at the doc end
        last = chunks.iloc[-1]
        assert last.start_token + last.chunk_len == len(toks)
        for _, c in chunks.iterrows():
            got = c.chunk_text.split()
            assert got == toks[c.start_token : c.start_token + 8]


@SLOW
@given(seed=st.integers(0, 2**31))
def test_scd2_intervals_partition_timeline(spark, seed):
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.incremental import (
        scd2_history,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 40))
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1) + dt.timedelta(minutes=int(rng.integers(0, 500))),
            int(rng.integers(1, 4)),
            str(rng.choice(["A", "B", "C"])),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = scd2_history(df).toPandas()
    for key, g in out.groupby("key"):
        g = g.sort_values("version").reset_index(drop=True)
        # versions are 1..n, exactly one current, intervals chain
        assert list(g.version) == list(range(1, len(g) + 1))
        assert g.is_current.sum() == 1 and bool(g.iloc[-1].is_current)
        for i in range(len(g) - 1):
            assert g.iloc[i].valid_to == g.iloc[i + 1].valid_from
            # consecutive runs always differ in attribute
            assert g.iloc[i].attr != g.iloc[i + 1].attr


@st.composite
def series_frames(draw):
    """Per-key integer time series (weeks grain, 1-30 points/key)."""
    n_keys = draw(st.integers(1, 4))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    rows = []
    for k in range(n_keys):
        n = int(rng.integers(1, 30))
        for i in range(n):
            rows.append(
                (
                    f"LA{k}",
                    pd.Timestamp("2024-01-01") + pd.Timedelta(weeks=i),
                    int(rng.integers(0, 5000)),
                )
            )
    return pd.DataFrame(rows, columns=["local_authority", "week", "transactions"])


@SLOW
@given(pdf=series_frames())
def test_ewma_matches_pandas_ewm(spark, pdf):
    from uk_housing_dashboard_etl_spark.operators.timeseries import ewma_smooth

    got = (
        ewma_smooth(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values(["local_authority", "week"])
        .reset_index(drop=True)
    )
    for key, grp in pdf.groupby("local_authority"):
        ref = (
            grp.sort_values("week")["transactions"]
            .ewm(alpha=0.5, adjust=False)
            .mean()
            .to_numpy()
        )
        ours = got[got["local_authority"] == key]["ewma"].to_numpy()
        assert np.allclose(ours, ref, atol=1e-9)


@SLOW
@given(pdf=series_frames())
def test_cusum_matches_reference_fold(spark, pdf):
    from uk_housing_dashboard_etl_spark.operators.timeseries import (
        cusum_changepoints,
    )

    got = (
        cusum_changepoints(spark.createDataFrame(pdf), slack=1.0, threshold=100.0)
        .toPandas()
        .sort_values(["local_authority", "week"])
    )
    for key, grp in pdf.groupby("local_authority"):
        x = grp.sort_values("week")["transactions"].to_numpy(dtype=float)
        mu = x.sum() / len(x)
        sp = sn = 0.0
        ref_p, ref_n = [], []
        for v in x:
            sp = max(0.0, sp + (v - mu - 1.0))
            sn = min(0.0, sn + (v - mu + 1.0))
            ref_p.append(sp)
            ref_n.append(sn)
        sub = got[got["local_authority"] == key]
        assert np.allclose(sub["cusum_pos"].to_numpy(), ref_p, atol=1e-3)
        assert np.allclose(sub["cusum_neg"].to_numpy(), ref_n, atol=1e-3)


@SLOW
@given(pdf=series_frames())
def test_holt_matches_reference_fold(spark, pdf):
    from uk_housing_dashboard_etl_spark.operators.timeseries import holt_linear

    got = (
        holt_linear(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values(["local_authority", "week"])
    )
    for key, grp in pdf.groupby("local_authority"):
        x = grp.sort_values("week")["transactions"].to_numpy(dtype=float)
        l_ref, b_ref = [x[0]], [0.0]
        for v in x[1:]:
            l_new = 0.5 * v + 0.5 * (l_ref[-1] + b_ref[-1])
            b_ref.append(0.5 * (l_new - l_ref[-1]) + 0.5 * b_ref[-1])
            l_ref.append(l_new)
        sub = got[got["local_authority"] == key]
        assert np.allclose(sub["level"].to_numpy(), l_ref, atol=1e-3)
        assert np.allclose(sub["trend"].to_numpy(), b_ref, atol=1e-3)


@SLOW
@given(
    seed=st.integers(0, 2**31),
    n_docs=st.integers(1, 8),
    doc_len=st.integers(1, 150),
)
def test_cdc_chunks_tile_the_document(spark, seed, n_docs, doc_len):
    """CDC boundaries must PARTITION each token stream: joining a doc's
    chunks back in boundary order reproduces its normalized text."""
    from uk_housing_dashboard_etl_spark.operators.dedup import (
        CDC_TOKEN_MOD,
        cdc_chunk_pairs,  # noqa: F401 — operator under test builds chunks
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    rows = [
        (
            i,
            " ".join(
                f"t{int(rng.integers(0, 50))}" for _ in range(doc_len)
            ),
        )
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # rebuild the chunker's plumbing to expose chunk TEXTS (the operator
    # itself only ships md5s), then check the tiling invariant
    from uk_housing_dashboard_etl_spark.operators.dedup import _norm_text

    toks = F.split(_norm_text(F.col("text")), r"\s+")
    th = F.expr(
        "transform(__toks, tok -> aggregate("
        "  transform(sequence(1, length(tok)),"
        "            i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT)),"
        "  CAST(0 AS BIGINT),"
        f" (a, c) -> (a * 31 + c) % {CDC_TOKEN_MOD}))"
    )
    bpos = F.expr(
        "array_sort(array_distinct(concat("
        "  array(0),"
        "  CASE WHEN size(__th) < 4 THEN CAST(array() AS ARRAY<INT>)"
        "       ELSE filter(transform(sequence(4, size(__th)),"
        "              j -> CASE WHEN (element_at(__th, j-3) * 2248091"
        "                              + element_at(__th, j-2) * 17161"
        "                              + element_at(__th, j-1) * 131"
        "                              + element_at(__th, j)) % 16 = 0"
        "                        THEN j ELSE -1 END),"
        "              p -> p > 0) END,"
        "  array(size(__toks)))))"
    )
    chunks_arr = F.expr(
        "transform(sequence(1, size(__bpos) - 1),"
        " i -> array_join(slice(__toks, element_at(__bpos, i) + 1,"
        "        element_at(__bpos, i + 1) - element_at(__bpos, i)), ' '))"
    )
    out = (
        df.select(
            F.col("doc_id"),
            _norm_text(F.col("text")).alias("norm"),
            toks.alias("__toks"),
        )
        .withColumn("__th", th)
        .withColumn("__bpos", bpos)
        .select("doc_id", "norm", F.array_join(chunks_arr, " ").alias("rejoined"))
        .collect()
    )
    for r in out:
        assert r["rejoined"] == r["norm"]


@SLOW
@given(seed=st.integers(0, 2**31), n_users=st.integers(1, 5))
def test_interarrival_matches_pandas(spark, seed, n_users):
    from uk_housing_dashboard_etl_spark.operators.behavior import (
        interarrival_stats,
    )

    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    for u in range(n_users):
        n = int(rng.integers(2, 25))
        ts = np.cumsum(rng.integers(1, 10_000, n))  # seconds, strictly +
        for t in ts:
            rows.append((eid, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=int(t)), u))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    got = {
        r["user_id"]: r
        for r in interarrival_stats(spark.createDataFrame(pdf)).collect()
    }
    for u, grp in pdf.groupby("user_id"):
        gaps = grp.sort_values(["ts", "event_id"])["ts"].diff().dropna()
        gaps_s = gaps.dt.total_seconds()
        if len(gaps_s) < 2:
            assert u not in got
            continue
        r = got[u]
        assert r["n_gaps"] == len(gaps_s)
        assert abs(r["mean_gap_s"] - gaps_s.mean()) < 1e-3
        cv = gaps_s.std(ddof=1) / gaps_s.mean()
        assert abs(r["cv_gap"] - cv) < 1e-3
        assert abs(r["burstiness"] - (cv - 1) / (cv + 1)) < 1e-3


@SLOW
@given(seed=st.integers(0, 2**31))
def test_benford_on_log_uniform_data(spark, seed):
    """Log-uniform magnitudes follow Benford closely: every digit's
    observed share must sit near its expected log10(1 + 1/d)."""
    from uk_housing_dashboard_etl_spark.operators.stats import benford_profile

    rng = np.random.default_rng(seed)
    vals = 10.0 ** rng.uniform(0, 6, 4000)
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    out = benford_profile(df, "x").collect()
    assert sum(r["n"] for r in out) == 4000
    for r in out:
        assert abs(r["share"] - r["benford"]) < 0.05
    # chi-square terms are consistent with the shares
    for r in out:
        expect = 4000 * (r["share"] - r["benford"]) ** 2 / r["benford"]
        assert r["chi2_term"] == pytest.approx(expect, abs=0.51)


@SLOW
@given(docs=word_corpora())
def test_simjoin_prefix_exact_and_complete_on_random_corpora(spark, docs):
    """Round-8 rewrite guard for set_similarity_join (checkpoints and
    count-guards removed, AQE-sized joins): on arbitrary corpora the
    prefix-filtered join must equal a brute-force token-set Jaccard —
    same pairs (completeness: prefix filtering may prune candidates,
    never results), same counts, same 4dp half-up values."""
    import math

    from uk_housing_dashboard_etl_spark.operators.simjoin import (
        set_similarity_join,
    )

    t = 0.5
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.size_a, r.size_b, r.jaccard)
        for r in set_similarity_join(df, threshold=t, n=1).collect()
    }
    sets = {
        i: set(" ".join(text.split()).lower().split())
        for i, text in docs
    }
    want = {}
    ids = sorted(sets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            jac = math.floor(
                inter / (len(sa) + len(sb) - inter) * 10000.0 + 0.5
            ) / 10000.0
            if jac >= t:
                want[(a, b)] = (inter, len(sa), len(sb), jac)
    assert got == want


@SLOW
@given(docs=word_corpora())
def test_dsir_scores_match_independent_reference(spark, docs):
    """Round-8 rewrite guard for dsir_scores (term windows + corpus
    re-scan replaced by one vocab-grain aggregate): scores on arbitrary
    corpora must match an independent Python computation of the DSIR
    log-likelihood-ratio formula to the 4dp quantization."""
    import math
    from collections import Counter

    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        dsir_scores,
    )

    # even ids are the "target domain"; drop empty docs (no terms)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens, r.is_target, r.dsir_score)
        for r in dsir_scores(df, F.col("doc_id") % 2 == 0).collect()
    }
    tf = {
        i: Counter(" ".join(text.split()).lower().split())
        for i, text in docs
    }
    tf = {i: c for i, c in tf.items() if c}
    assert set(got) == set(tf)
    ctf: Counter = Counter()
    ttf: Counter = Counter()
    for i, c in tf.items():
        ctf.update(c)
        if i % 2 == 0:
            ttf.update(c)
    total = sum(ctf.values())
    tgt_total = sum(ttf.values())
    vocab = len(ctf)
    for i, c in tf.items():
        n_tokens = sum(c.values())
        llr = sum(
            n
            * (
                math.log((ttf.get(term, 0) + 1) / (tgt_total + vocab))
                - math.log(ctf[term] / total)
            )
            for term, n in c.items()
        )
        n_got, is_tgt, score = got[i]
        assert n_got == n_tokens and is_tgt == (i % 2 == 0)
        # dsum quantizes each row to 1e-4 before summing; allow that
        # plus the final rounding as tolerance
        assert abs(score - llr / n_tokens) < 5e-4 + len(c) * 1e-4 / n_tokens


# ---------------------------------------------------------------------------
# Empty-input semantics (round-8 verdict item 5): split("") yields [""],
# so every tokenizing operator must explicitly treat an empty or
# whitespace-only document as having ZERO tokens. One property per
# family, with empty/whitespace-only docs guaranteed in the generator.
# The single documented exception: exact_dedup, where two empty docs
# ARE mutual exact duplicates (equal normalized content) by design.
# ---------------------------------------------------------------------------


@st.composite
def corpora_with_empties(draw):
    """word_corpora plus guaranteed empty, whitespace-only and NULL
    docs (a 100 TB web corpus contains all three)."""
    docs = draw(word_corpora())
    base = max(i for i, _ in docs) + 1
    ws = draw(st.sampled_from(["", " ", "  \t ", "\n\n", " \t\n"]))
    return docs + [
        (base, ""), (base + 1, ws), (base + 2, " "),
        (base + 3, None), (base + 4, None),
    ]


def _tokenless_ids(docs):
    return {i for i, t in docs if not (t or "").split()}


@SLOW
@given(docs=corpora_with_empties())
def test_exact_dedup_groups_empties_by_design(spark, docs):
    from uk_housing_dashboard_etl_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = exact_dedup(df).toPandas().set_index("doc_id")
    nulls = sorted(i for i, t in docs if t is None)
    empties = sorted(i for i in _tokenless_ids(docs) if i not in nulls)
    # all empty/whitespace docs normalize to "" and share one canonical
    canon = {out.loc[i, "canonical_id"] for i in empties}
    assert canon == {min(empties)}
    assert all(out.loc[i, "dup_count"] >= len(empties) for i in empties)
    # null-text docs hash to NULL — their own group, NOT merged with ""
    canon_null = {out.loc[i, "canonical_id"] for i in nulls}
    assert canon_null == {min(nulls)}
    assert all(out.loc[i, "dup_count"] == len(nulls) for i in nulls)


@SLOW
@given(docs=corpora_with_empties())
def test_shingle_family_never_pairs_tokenless_docs(spark, docs):
    """minhash / simhash / n-gram Jaccard / CDC: a token-less doc has an
    empty shingle/chunk set, emits no signature row, and never appears
    in any near-dup pair — at every n including 1."""
    from uk_housing_dashboard_etl_spark.operators.dedup import (
        cdc_chunk_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        simhash_pairs,
        simhash_signatures,
    )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    empty = _tokenless_ids(docs)

    assert not empty & {
        r.doc_id for r in minhash_signatures(df, shingle_n=1).collect()
    }
    assert not empty & {
        r.doc_id for r in simhash_signatures(df).collect()
    }
    for pairs in (
        minhash_lsh_pairs(df, shingle_n=1, threshold=0.01),
        simhash_pairs(df),
        ngram_jaccard_pairs(df, n=1, threshold=0.01),
        cdc_chunk_pairs(df, threshold=0.01),
    ):
        hit = [
            (r.doc_a, r.doc_b)
            for r in pairs.collect()
            if r.doc_a in empty or r.doc_b in empty
        ]
        assert not hit, hit


@SLOW
@given(docs=corpora_with_empties())
def test_span_and_chunk_family_zero_for_tokenless_docs(spark, docs):
    """dup_span_stats / chunk_documents / strip_boilerplate_chunks /
    pack_sequences / text_stats: token-less docs report 0 tokens, 0
    grams, 0 boilerplate chunks — never a phantom '' token."""
    from uk_housing_dashboard_etl_spark.operators.curation import (
        pack_sequences,
    )
    from uk_housing_dashboard_etl_spark.operators.dedup import dup_span_stats
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        chunk_documents,
        strip_boilerplate_chunks,
        text_stats,
    )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    empty = _tokenless_ids(docs)

    spans = dup_span_stats(df, k=1).toPandas().set_index("doc_id")
    for i in empty:
        assert spans.loc[i, "n_tokens"] == 0
        assert spans.loc[i, "covered_tokens"] == 0

    ch = chunk_documents(df).toPandas()
    mine = ch[ch.doc_id.isin(empty)]
    # documented short-doc rule: exactly one chunk, but a LENGTH-0 one
    assert (mine.groupby("doc_id").size() == 1).all()
    assert (mine.chunk_len == 0).all() and (mine.chunk_text == "").all()

    sb = strip_boilerplate_chunks(df).toPandas().set_index("doc_id")
    for i in empty:
        assert sb.loc[i, "n_chunks"] == 0
        assert sb.loc[i, "clean_text"] == ""

    pk = pack_sequences(df).toPandas().set_index("doc_id")
    for i in empty:
        assert pk.loc[i, "n_tokens"] == 0

    ts = text_stats(df).toPandas().set_index("doc_id")
    for i in empty:
        assert ts.loc[i, "n_tokens"] == 0
        assert pd.isna(ts.loc[i, "avg_token_len"])


@SLOW
@given(docs=corpora_with_empties())
def test_bpe_words_empty_for_tokenless_docs(spark, docs):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        _bpe_words,
    )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r.doc_id: r.w
        for r in df.select("doc_id", _bpe_words("text").alias("w")).collect()
    }
    for i in _tokenless_ids(docs):
        assert out[i] == []


@SLOW
@given(docs=corpora_with_empties())
def test_tf_family_omits_tokenless_docs(spark, docs):
    """lm_scores / tfidf / repetition+quality marts: token-less docs
    either drop out of tf-grain outputs (no content, no score) or
    report zeros/0.0-quality — and nothing divides by zero on them."""
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        lm_scores,
        quality_score,
        repetition_stats,
        tfidf_top_terms,
    )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    empty = _tokenless_ids(docs)

    assert not empty & {r.doc_id for r in lm_scores(df).collect()}
    assert not empty & {r.doc_id for r in tfidf_top_terms(df).collect()}
    rep = {r.doc_id: r for r in repetition_stats(df).collect()}
    for i in empty:
        assert rep[i].total_ngrams == 0
        assert rep[i].dup_token_ratio == 0.0
    q = {r.doc_id: r for r in quality_score(df).collect()}
    for i in empty:
        assert q[i].n_tokens == 0 and q[i].quality == 0.0


def test_sample_frames_null_payload_yields_no_frames(spark):
    """r9 tripwire inverted (fixed in r10): a NULL payload (failed
    fetch) must yield ZERO frames, not max_frames phantom null frames —
    octet_length(NULL) is null and Spark's least() ignores nulls, so
    the frame count is guarded with coalesce(octet_length, 0)."""
    from uk_housing_dashboard_etl_spark.operators.multimodal import (
        sample_frames,
    )

    media = spark.createDataFrame(
        [(1, None), (2, bytearray(b"0123456789"))],
        "doc_id long, payload binary",
    )
    out = sample_frames(media, every_n_bytes=4).toPandas()
    assert (out.doc_id == 2).all(), "null payload must yield zero frames"


def test_winsorized_stats_skips_null_values(spark):
    """r9 tripwire inverted (fixed in r10, oracle edited in the same
    commit): a NULL value stays NULL through the clip (guarded CASE)
    so dmean skips it — without the guard, null-ignoring least()
    clipped nulls to the upper fence and inflated the winsorized mean
    while raw_mean skipped them."""
    from uk_housing_dashboard_etl_spark.operators.stats import (
        winsorized_stats,
    )

    df = spark.createDataFrame(
        [("g", float(v)) for v in [1, 2, 3, 4, 100]] + [("g", None)],
        "grp string, value double",
    )
    with_null = winsorized_stats(df, "grp", "value").collect()[0]
    without = winsorized_stats(
        df.where(F.col("value").isNotNull()), "grp", "value"
    ).collect()[0]
    assert with_null["winsorized_mean"] == without["winsorized_mean"]


# --------------------------------------------------------------------
# r10 empty/NULL-input sweep for the families the r9 round didn't reach
# (VERDICT r9 item 6): linkage normalizers, lang_id, redact_pii, and a
# streaming drain fed empty-text docs. Same discipline as the r9
# shingle sweep — one property block per family, the semantics stated
# in the assertion, corpora always containing '', whitespace-only and
# NULL entries.


@st.composite
def name_tables_with_empties(draw):
    """(key, name) records with guaranteed empty/whitespace/NULL names
    plus a planted near-pair so the linkage machinery has signal."""
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    n = draw(st.integers(min_value=2, max_value=20))
    first = ["alpha", "beta", "gamma"]
    rows = [
        (
            i,
            f"{rng.choice(first)} part {int(rng.integers(0, 5))}",
        )
        for i in range(n)
    ]
    rows[1] = (1, rows[0][1])  # planted exact pair
    base = n
    ws = draw(st.sampled_from([" ", "  \t ", "\n"]))
    return rows + [
        (base, ""), (base + 1, ""), (base + 2, ws),
        (base + 3, None), (base + 4, None),
    ]


@SLOW
@given(recs=name_tables_with_empties())
def test_fuzzy_family_null_and_empty_name_semantics(spark, recs):
    """Linkage family: NULL names NEVER pair (SQL null-safe: NULL block
    joins nothing, matching DuckDB's oracle join), while ''/whitespace
    names pair among themselves at distance <= their length difference
    — the same 'empties group, nulls stay apart' rule exact_dedup pins.
    The compressed (name-grain) histogram must agree with the pair-
    grain histogram on exactly these corpora too."""
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        fuzzy_pair_histogram,
        fuzzy_pairs,
        rare_token_pairs,
    )

    df = spark.createDataFrame(recs, "p_partkey long, p_name string")
    null_keys = {k for k, nm in recs if nm is None}

    pairs = fuzzy_pairs(df, max_dist=3).toPandas()
    touched = set(pairs.key_a) | set(pairs.key_b)
    assert not (touched & null_keys), "NULL names must never pair"
    # planted exact pair survives blocking
    assert ((pairs.key_a == 0) & (pairs.key_b == 1)).any()
    # the two '' names pair at distance 0
    empty_keys = sorted(k for k, nm in recs if nm == "")
    ek_a, ek_b = empty_keys[0], empty_keys[1]
    hit = pairs[(pairs.key_a == ek_a) & (pairs.key_b == ek_b)]
    assert len(hit) == 1 and hit.distance.iloc[0] == 0

    # compressed histogram == pair-grain histogram on the same corpus
    hist_pairs = (
        fuzzy_pairs(df, max_dist=3)
        .groupBy("distance")
        .count()
        .toPandas()
        .set_index("distance")["count"]
        .sort_index()
    )
    hist_comp = (
        fuzzy_pair_histogram(df, max_dist=3)
        .toPandas()
        .set_index("distance")["n_pairs"]
        .sort_index()
    )
    assert hist_pairs.to_dict() == hist_comp.to_dict()

    # rare-token blocking: NULL names contribute no tokens, never pair
    rt = rare_token_pairs(df, max_dist=3).toPandas()
    assert not ((set(rt.key_a) | set(rt.key_b)) & null_keys)


@SLOW
@given(docs=corpora_with_empties())
def test_lang_id_tokenless_docs_deterministic(spark, docs):
    """lang_id: a token-less doc (empty/whitespace/NULL text) scores 0
    on every language and predicts LANG_ORDER[0] via the fixed argmax
    tie-break — deterministic, never NULL, and identical to the oracle
    CASE chain for non-null text (NULL-text parity is enforced
    upstream by test_fixture_invariants)."""
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        LANG_ORDER,
        lang_id,
    )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in lang_id(df).collect()}
    for i in _tokenless_ids(docs):
        row = out[i]
        assert all(row[f"score_{lang}"] == 0 for lang in LANG_ORDER)
        assert row.predicted_lang == LANG_ORDER[0]


def test_redact_pii_null_text_is_pii_free(spark):
    """r10 regression (same null-edge class as sample_frames): NULL
    text carries ZERO PII — counts 0 and has_pii false, so the doc
    keeps deterministic behavior under where(has_pii) AND
    where(~has_pii); redacted_text stays NULL (a failed fetch must not
    alias a genuinely empty doc)."""
    from uk_housing_dashboard_etl_spark.operators.curation import redact_pii

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a@b.com calls +1 (555) 123-4567")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].redacted_text is None
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (0, 0, 0)
    assert out[1].has_pii is False
    assert out[2].has_pii is False and out[2].n_emails == 0
    assert out[3].has_pii is True and out[3].n_emails == 1
    kept = redact_pii(df).where(F.col("has_pii")).count()
    dropped = redact_pii(df).where(~F.col("has_pii")).count()
    assert kept + dropped == 3, "every doc must land in exactly one filter"


def test_streaming_dedup_groups_empty_and_null_text(spark, tmp_path):
    """Streaming drain fed empty-text docs (VERDICT r9 item 6): the
    content-hash identity must group ''/whitespace docs together and
    NULL-text docs together-but-separately, exactly like batch
    exact_dedup — one survivor per group, so the batch/stream identity
    rule survives the zero-token semantics."""
    import datetime as dt

    from uk_housing_dashboard_etl_spark.streaming.dedup_stream import (
        dedup_documents_stream,
    )

    d = str(tmp_path / "landing")
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, None, t0),
        (2, "", t0),
        (3, None, t0),
        (4, "  \t ", t0),
        (5, "real doc", t0),
        (6, "real  DOC", t0),  # normalizes to doc 5's content
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, ingest_ts timestamp"
    ).write.mode("append").parquet(d)
    stream = spark.readStream.schema(
        "doc_id long, text string, ingest_ts timestamp"
    ).parquet(d)
    q = (
        dedup_documents_stream(stream, watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out")).toPandas()
    survivors = set(out.doc_id)
    assert len(survivors & {1, 3}) == 1, "one survivor for the NULL group"
    assert len(survivors & {2, 4}) == 1, "one survivor for the '' group"
    assert len(survivors & {5, 6}) == 1, "one survivor per content group"
    assert len(survivors) == 3


def test_behavioral_family_null_event_discipline(spark):
    """Proactive r10 sweep extension (the item-6 pattern applied to the
    events family — a 100 TB event stream has NULL ts/user_id/type from
    malformed ingests): every sequencing/windowing operator EXCLUDES
    rows whose ordering key (ts) or partition key (user_id) is NULL —
    pinned here because a NULL ts would otherwise sort first and
    corrupt lag/rank/sequence semantics silently — and none of the
    family crashes on NULL event_type or NULL value."""
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.behavior import (
        cap_events_per_key,
        debounce_events,
        top_paths,
        user_sequences,
    )

    t0 = dt.datetime(2024, 1, 1)

    def T(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, 10, "click", T(0), 1.0),
        (2, 10, "click", T(1), 2.0),
        (3, 10, "click", None, 3.0),   # NULL ts: excluded from windows
        (4, None, "view", T(2), 4.0),  # NULL user: excluded
        (5, None, "view", T(3), 5.0),
        (6, 11, None, T(4), 6.0),      # NULL type: kept, attr is null
        (7, 11, None, T(5), 7.0),
        (8, 12, "purchase", T(6), None),  # NULL value: kept
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double"
    )

    deb = debounce_events(df).toPandas()
    assert set(deb.event_id) == {1, 2, 6, 7, 8}  # 3 (null ts), 4-5 (null key) out
    assert bool(deb.set_index("event_id").loc[2, "is_dup"]) is True

    cap = cap_events_per_key(df, max_per_day=1).toPandas()
    assert set(cap.event_id) == {1, 2, 6, 7, 8}
    kept = cap[cap.kept]
    assert set(kept.event_id) == {1, 6, 8}  # earliest per (user, day)

    seq = user_sequences(df).toPandas().set_index("key")
    assert set(seq.index) == {10, 11, 12}
    assert seq.loc[10, "seq_len"] == 2  # the NULL-ts click is excluded
    # NULL attrs are skipped by concat_ws but still counted: documented
    assert seq.loc[11, "seq_len"] == 2 and seq.loc[11, "sequence"] == ""

    tp = top_paths(df).toPandas()
    assert not tp.empty  # and no NULL-keyed path rows
    assert tp.path.notna().all()


def test_scd2_null_state_is_a_state(spark):
    """r10 sweep fix: NULL is a legitimate SCD2 attribute state. The
    plain != change test made a leading NULL state an interval but
    silently swallowed a mid-stream one (and A,NULL,A produced two
    adjacent same-attr intervals, violating the merge invariant). The
    null-safe test (eqNullSafe / IS DISTINCT FROM, operator + oracle in
    one commit) gives every unknown-state run its own interval."""
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.incremental import (
        scd2_history,
    )

    t0 = dt.datetime(2024, 1, 1)

    def T(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, 10, "A", T(0)), (2, 10, None, T(1)), (3, 10, "B", T(2)),
        (4, 11, None, T(0)), (5, 11, "C", T(1)),
        (6, 12, "A", T(0)), (7, 12, None, T(1)), (8, 12, "A", T(2)),
        (9, 13, "X", T(0)), (10, 13, "X", T(1)),  # repeat run merges
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = scd2_history(df).toPandas().sort_values(["key", "version"])
    runs = {
        k: list(g.attr) for k, g in out.groupby("key")
    }
    assert runs[10] == ["A", None, "B"]
    assert runs[11] == [None, "C"]
    assert runs[12] == ["A", None, "A"]
    assert runs[13] == ["X"]
    # intervals still partition each key's timeline: valid_to of interval
    # i equals valid_from of interval i+1; last is open
    for k, g in out.groupby("key"):
        g = g.sort_values("version")
        assert g.valid_to.iloc[:-1].tolist() == g.valid_from.iloc[1:].tolist()
        assert pd.isna(g.valid_to.iloc[-1]) and bool(g.is_current.iloc[-1])


def test_snapshot_diff_null_text_is_content_not_absence(spark):
    """r10 sweep fix: presence in a snapshot is decided by the doc's
    ROW, not its hash — a NULL-text doc present in both snapshots must
    report changed/unchanged by content (null-safe), never
    added/removed; NULL -> 'x' is changed, NULL -> NULL unchanged."""
    from uk_housing_dashboard_etl_spark.operators.curation import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, None), (2, "same"), (3, None), (4, "gone"), (6, "x")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "now real"), (2, "same"), (3, None), (5, "fresh"), (6, None)],
        "doc_id long, text string",
    )
    out = (
        snapshot_diff(old, new).toPandas().set_index("doc_id")["status"]
    )
    assert out[1] == "changed"    # NULL -> real text
    assert out[2] == "unchanged"
    assert out[3] == "unchanged"  # NULL -> NULL
    assert out[4] == "removed"
    assert out[5] == "added"
    assert out[6] == "changed"    # real -> NULL


def test_apply_cdc_ignores_corrupt_trailing_record(spark):
    """r10 sweep fix (same round, tripwire inverted): a corrupt
    (NULL-op) record arriving LAST must not delete the entity — replay
    filters op IS NOT NULL before the rank window so the latest VALID
    change wins. cdc_replay's oracle is unchanged (it synthesizes ops
    via CASE, never NULL)."""
    from uk_housing_dashboard_etl_spark.operators.incremental import (
        apply_cdc,
    )

    ch = spark.createDataFrame(
        [(1, 1, "I", "a"), (1, 2, None, "b")],
        "key long, lsn long, op string, val string",
    )
    out = apply_cdc(ch, ["key"], ["lsn"], "op").collect()
    assert len(out) == 1 and out[0]["val"] == "a", (
        "latest VALID change must survive a corrupt trailing record"
    )


def test_asof_join_null_ts_never_matches(spark):
    """r10 sweep fix (same round, tripwire inverted): 'as of unknown
    time' is not a match — NULL-ts right rows are excluded from
    candidacy and NULL-ts left rows emit null match values, in BOTH
    directions. DuckDB's native ASOF JOIN (the oracle) is already
    null-rejecting, so Spark and oracle now agree on NULL input too."""
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.temporal_joins import (
        asof_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=5), "L1"), (1, None, "L2")],
        "key long, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, t0 + dt.timedelta(minutes=1), 1.0)],
        "key long, ts timestamp, px double",
    )
    out = {
        r.lbl: r.asof_px
        for r in asof_join(left, right, "key", right_value_cols=["px"]).collect()
    }
    assert out["L1"] == 1.0
    assert out["L2"] is None, "a NULL-ts left row must carry no match"


def test_media_kernels_null_payload_yields_null_rows(spark):
    """r10 sweep fix: all three Arrow media kernels crashed the whole
    batch on a NULL payload (bytes(None)); a failed fetch is a DATA
    condition, not a decode error — it yields a null media row under
    both on_error modes, and real rows in the same batch survive."""
    from uk_housing_dashboard_etl_spark.operators.multimodal import (
        audio_features,
        decode_images,
        extract_features,
    )

    media = spark.createDataFrame(
        [(1, None, "png", None), (2, bytearray(b"0123456789abcdef"), "png", 16)],
        "doc_id long, payload binary, format string, n_bytes long",
    )
    dec = {r.doc_id: r for r in decode_images(media, fake=True).collect()}
    assert dec[1].width is None and dec[1].pixels is None
    assert dec[2].width is not None
    feat = {r.doc_id: r for r in extract_features(media, fake=True).collect()}
    assert feat[1].feature is None and feat[1].feat_norm is None
    assert feat[2].feature is not None
    aud = {r.doc_id: r for r in audio_features(media, fake=True).collect()}
    assert aud[1].n_samples is None and aud[1].rms is None
    assert aud[2].n_samples == 16


def test_audio_gate_and_operator_agree_on_contaminated_frame(spark):
    """r10 verdict item 4: the audio oracle gate
    (contract._audio_digest_batches) is DELIBERATELY closure-independent
    of audio_features — it vouches for the byte→sample convention, not
    the operator's code. This test is the coupling the closure doesn't
    provide: both run on the same NULL-contaminated frame, NULL payloads
    yield null rows in BOTH (the gate crashed here pre-r11, the exact
    bytes(None) class 6c1eee0 fixed in the operators), and on real rows
    the digest↔feature identities hold: rms == sqrt(sum_sq/n)/128 and
    zcr == crossings/(n-1)."""
    import math

    from uk_housing_dashboard_etl_spark import contract
    from uk_housing_dashboard_etl_spark.operators.multimodal import (
        audio_features,
    )

    media = spark.createDataFrame(
        [
            (1, None, "wav", None),
            (2, bytearray(b"0123456789abcdef"), "wav", 16),
            (3, bytearray(b""), "wav", 0),
            (4, bytearray(bytes([0, 255, 0, 255, 128])), "wav", 5),
        ],
        "doc_id long, payload binary, format string, n_bytes long",
    )
    gate = {
        r.doc_id: r
        for r in media.mapInPandas(
            contract._audio_digest_batches, contract._AUDIO_DIGEST_SCHEMA
        ).collect()
    }
    ops = {r.doc_id: r for r in audio_features(media, fake=True).collect()}

    # null alignment: the failed-fetch row degrades per-row on BOTH sides
    assert gate[1].n_samples is None and gate[1].sum_sq is None
    assert ops[1].n_samples is None and ops[1].rms is None

    for doc in (2, 4):
        n, sum_sq, crossings = (
            gate[doc].n_samples,
            gate[doc].sum_sq,
            gate[doc].crossings,
        )
        assert n == ops[doc].n_samples
        assert math.isclose(
            ops[doc].rms, math.sqrt(sum_sq / n) / 128.0, rel_tol=1e-5
        )
        assert math.isclose(
            ops[doc].zero_crossing_rate, crossings / (n - 1), rel_tol=1e-9
        )
    # empty payload: 0 samples, zero digests; operator's guard gives a
    # single zero sample (len 1) — divergence documented by assertion
    assert gate[3].n_samples == 0 and gate[3].sum_sq == 0


def test_kll_summary_all_null_group_reports_null_estimates(spark):
    """r10 sweep fix: a group whose values are ALL NULL emits a
    non-null but EMPTY KLL sketch buffer, and an unguarded
    kll_sketch_get_quantile_double crashes the job
    (KLL_INVALID_INPUT_SKETCH_BUFFER). The probe is now guarded on the
    group's non-null value count: such a group reports NULL estimates
    next to its NULL exact percentiles, and real groups are
    unaffected."""
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.sketches import (
        quantile_sketch_summary,
    )

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0, "a", None), (2, t0, "a", None),
         (3, t0, "b", 1.5), (4, t0, "b", 2.5)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    out = {r.event_type: r for r in quantile_sketch_summary(ev).collect()}
    assert out["a"].approx_median is None and out["a"].exact_median is None
    assert out["b"].approx_median is not None
    assert out["b"].exact_median == 2.0


def test_cms_rejects_non_integral_keys_at_plan_time(spark):
    """r10 sweep fix: the CMS multiplicative hash is defined over
    integral keys (what keeps it bit-identical in the DuckDB oracle);
    a string key used to die executor-side with an opaque
    CAST_INVALID_INPUT — now a plan-time ValueError with guidance."""
    import pytest as _pytest

    from uk_housing_dashboard_etl_spark.operators.sketches import (
        cms_frequency_estimates,
    )

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    with _pytest.raises(ValueError, match="integral key"):
        cms_frequency_estimates(df, "k", df)
