"""Unit tests for the round-4 operators: interarrival/burstiness,
Benford profile, CUSUM changepoints, shingle containment, rare-token
blocking, and chunk-grain boilerplate removal. Each pins hand-computed
semantics on tiny fixtures; oracle parity at sf0.01 is covered by the
contract registry (tools/selfcheck.py)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_interarrival_hand_computed(spark):
    from uk_housing_dashboard_etl_spark.operators.behavior import (
        interarrival_stats,
    )

    rows = [
        # user 1: gaps 60s, 120s, 180s -> mean 120, sd 60 (ddof=1), cv .5
        (1, _ts(0), 1),
        (2, _ts(1), 1),
        (3, _ts(3), 1),
        (4, _ts(6), 1),
        # user 2: one gap only -> below min_gaps, dropped
        (5, _ts(0), 2),
        (6, _ts(5), 2),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    out = {r["user_id"]: r for r in interarrival_stats(df).collect()}
    assert set(out) == {1}
    r = out[1]
    assert r["n_gaps"] == 3
    assert r["mean_gap_s"] == 120.0
    assert r["cv_gap"] == 0.5
    # burstiness = (0.5 - 1) / (0.5 + 1) = -1/3
    assert r["burstiness"] == pytest.approx(-0.3333, abs=1e-4)


def test_interarrival_ties_deterministic(spark):
    from uk_housing_dashboard_etl_spark.operators.behavior import (
        interarrival_stats,
    )

    # same-timestamp burst: the (ts, event_id) total order makes the
    # zero gaps well-defined instead of partition-order dependent
    rows = [(i, _ts(0), 7) for i in range(3)] + [(9, _ts(2), 7)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    r = interarrival_stats(df).collect()[0]
    assert r["n_gaps"] == 3  # gaps 0, 0, 120s
    assert r["mean_gap_s"] == 40.0


def test_benford_digits_and_expectation(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import benford_profile

    # 10 ones-leading, 5 twos-leading, across magnitudes + boundary cases
    vals = (
        [1.0, 10.0, 100.0, 1000.0, 19.99, 150.0, 1.5, 17.0, 123.4, 1999.0]
        + [2.0, 25.0, 200.0, 2999.0, 2.5]
        + [0.5]  # below min_value: excluded
    )
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    out = {r["digit"]: r for r in benford_profile(df, "x").collect()}
    assert set(out) == {1, 2}
    assert out[1]["n"] == 10 and out[2]["n"] == 5
    assert out[1]["share"] == pytest.approx(0.6667, abs=1e-4)
    assert out[1]["benford"] == pytest.approx(round(math.log10(2), 4), abs=1e-4)
    assert out[2]["benford"] == pytest.approx(
        round(math.log10(1.5), 4), abs=1e-4
    )
    # chi2 term is n_total * (share-expected)^2 / expected
    t = 15.0
    sh, ex = 10.0 / 15.0, math.log10(2)
    assert out[1]["chi2_term"] == pytest.approx(
        t * (sh - ex) ** 2 / ex, abs=1e-3
    )


def test_cusum_detects_level_shift(spark):
    from uk_housing_dashboard_etl_spark.operators.timeseries import (
        cusum_changepoints,
    )

    # 10 weeks at 10 then 2 weeks at 22: mu = 12. slack=2.5 absorbs the
    # low-regime drift on BOTH sides (10-12-2.5 < 0 pins s+ at 0;
    # 10-12+2.5 > 0 pins s- at 0), so only the genuine upward shift
    # accumulates: s+ = 7.5 then 15.0, crossing threshold=12 on the
    # second high week
    rows = [
        ("LA1", dt.date(2024, 1, 1) + dt.timedelta(weeks=i), 10 if i < 10 else 22)
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, ["local_authority", "week", "transactions"]
    )
    out = (
        cusum_changepoints(df, slack=2.5, threshold=12.0)
        .orderBy("week")
        .collect()
    )
    assert [r["changepoint"] for r in out] == [False] * 11 + [True]
    assert all(r["cusum_pos"] == 0.0 for r in out[:10])
    assert all(r["cusum_neg"] == 0.0 for r in out)
    assert out[10]["cusum_pos"] == pytest.approx(7.5, abs=1e-4)
    assert out[11]["cusum_pos"] == pytest.approx(15.0, abs=1e-4)


def test_cusum_series_length_guard(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from uk_housing_dashboard_etl_spark.operators.timeseries import (
        cusum_changepoints,
    )

    rows = [
        ("LA1", dt.date(2024, 1, 1) + dt.timedelta(days=i), i)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, ["local_authority", "week", "transactions"]
    )
    with pytest.raises(SparkRuntimeException, match="max_series_len"):
        cusum_changepoints(df, max_series_len=10).collect()


def test_containment_asymmetric(spark):
    from uk_housing_dashboard_etl_spark.operators.dedup import (
        containment_pairs,
    )

    short = "alpha beta gamma delta"  # 2 shingles, both inside long
    long = "alpha beta gamma delta epsilon zeta eta theta"  # 6 shingles
    other = "one two three four five"
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, other)], ["doc_id", "text"]
    )
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in containment_pairs(df, threshold=0.5).collect()
    }
    # short is fully contained in long; long is only 2/6 contained in short
    assert set(out) == {(1, 2)}
    assert out[(1, 2)]["containment"] == 1.0
    assert out[(1, 2)]["n_common"] == 2 and out[(1, 2)]["size_a"] == 2
    # lowering the threshold surfaces the reverse direction at 2/6
    both = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, threshold=0.1).collect()
    }
    assert both[(2, 1)] == pytest.approx(0.3333, abs=1e-4)


def test_containment_df_cap_is_lower_bound(spark):
    from uk_housing_dashboard_etl_spark.operators.dedup import (
        containment_pairs,
    )

    rows = [(i, f"all rights reserved body{i // 2} tail{i}") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, threshold=0.0).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(
            df, threshold=0.0, max_shingle_df=2
        ).collect()
    }
    for pair, c in capped.items():
        assert c <= exact[pair] + 1e-9


def test_rare_token_blocking_recall_beats_first_token(spark):
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        fuzzy_pairs,
        rare_token_pairs,
    )

    # the edit is in the FIRST word: first-token blocking separates the
    # pair, rarest-token blocking ("widget" is rarer than the typo'd
    # first words) keeps it together
    rows = [
        (1, "red widget"),
        (2, "ted widget"),
        (3, "red wagon"),
        (4, "red wheel"),
        (5, "red window"),
    ]
    df = spark.createDataFrame(rows, ["p_partkey", "p_name"])
    first = {
        (r["key_a"], r["key_b"]) for r in fuzzy_pairs(df, max_dist=1).collect()
    }
    rare = {
        (r["key_a"], r["key_b"])
        for r in rare_token_pairs(df, max_dist=1).collect()
    }
    assert (1, 2) not in first
    assert (1, 2) in rare


def test_rare_token_block_bounded_by_df(spark):
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        rare_token_pairs,
    )

    # every name shares dominant token 'the' (df=8) and a df=2 middle
    # token; the trailing v{i} tokens are df=1 and excluded from the
    # argmin -> blocks form on the df=2 tokens, never on 'the', so the
    # dominant token cannot create a quadratic block
    rows = [(i, f"the part{i // 2} v{i}") for i in range(8)]
    df = spark.createDataFrame(rows, ["p_partkey", "p_name"])
    got = {
        (r["key_a"], r["key_b"])
        for r in rare_token_pairs(df, max_dist=10).collect()
    }
    assert got == {(0, 1), (2, 3), (4, 5), (6, 7)}


def test_strip_boilerplate_chunks(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        strip_boilerplate_chunks,
    )

    boiler = "w1 w2 w3 w4 w5"  # one 5-token chunk shared by 3 docs
    rows = [
        (1, f"{boiler} u1a u1b u1c u1d u1e"),
        (2, f"{boiler} u2a u2b u2c u2d u2e"),
        (3, f"{boiler} u3a u3b u3c u3d u3e"),
        (4, boiler),  # pure boilerplate -> empty output
        (5, "v1 v2 v3 v4 v5 v6 v7"),  # unique chunks, untouched
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_chunks(
            df, chunk_tokens=5, max_chunk_df=2
        ).collect()
    }
    assert out[1]["n_chunks"] == 2 and out[1]["n_removed"] == 1
    assert out[1]["clean_text"] == "u1a u1b u1c u1d u1e"
    assert out[4]["n_removed"] == 1 and out[4]["clean_text"] == ""
    assert out[5]["n_removed"] == 0
    assert out[5]["clean_text"] == "v1 v2 v3 v4 v5 v6 v7"


def test_strip_boilerplate_preserves_order(spark):
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        strip_boilerplate_chunks,
    )

    # 30 tokens -> 10 chunks of 3; chunks must reassemble in position
    # order even though collect_list is unordered
    text = " ".join(f"t{i:02d}" for i in range(30))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = strip_boilerplate_chunks(df, chunk_tokens=3, max_chunk_df=5).collect()[0]
    assert r["clean_text"] == text
    assert r["n_chunks"] == 10 and r["n_removed"] == 0


def test_rare_token_histogram_equals_record_grain(spark):
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        rare_token_pair_histogram,
        rare_token_pairs,
    )

    # duplicated names so the name-grain compression actually compresses
    rows = [(i, f"the part{i // 3} x{i % 2}") for i in range(12)]
    df = spark.createDataFrame(rows, ["p_partkey", "p_name"])
    brute = (
        rare_token_pairs(df, max_dist=3)
        .groupBy("distance")
        .count()
        .collect()
    )
    hist = {
        r["distance"]: r["n_pairs"]
        for r in rare_token_pair_histogram(df, max_dist=3).collect()
    }
    assert hist == {r["distance"]: r["count"] for r in brute}
    # and the length_bucket refinement is lossless here too
    hist_b = {
        r["distance"]: r["n_pairs"]
        for r in rare_token_pair_histogram(
            df, max_dist=3, length_bucket=3
        ).collect()
    }
    assert hist_b == hist


def test_theil_sen_robust_to_outlier(spark):
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.stats import theil_sen_slope

    # perfect slope 1/day with one wild outlier week: the median of
    # pairwise slopes stays ~1 where OLS would be dragged far off
    rows = [
        ("LA1", dt.date(2024, 1, 1) + dt.timedelta(days=7 * i),
         7 * i if i != 5 else 10_000)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, ["local_authority", "week", "transactions"]
    )
    r = theil_sen_slope(df).collect()[0]
    assert r["n_pairs"] == 45
    assert abs(r["theil_sen_slope"] - 1.0) < 0.01


def test_holt_tracks_linear_trend(spark):
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.timeseries import holt_linear

    # on a pure linear ramp Holt's trend converges to the slope and the
    # one-step forecast converges to the next value; EWMA would lag
    rows = [
        ("LA1", dt.date(2024, 1, 1) + dt.timedelta(weeks=i), 10 * i)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, ["local_authority", "week", "transactions"]
    )
    out = holt_linear(df).orderBy("week").collect()
    # hand-check the first two steps: l2 = .5*10 + .5*(0+0) = 5,
    # b2 = .5*(5-0) + .5*0 = 2.5
    assert out[1]["level"] == 5.0 and out[1]["trend"] == 2.5
    # convergence: late forecasts within 1% of the next true value
    assert abs(out[-1]["forecast"] - 200.0) / 200.0 < 0.02


def test_basket_lift_hand_computed(spark):
    import datetime as dt

    from uk_housing_dashboard_etl_spark.operators.behavior import basket_lift

    def ev(i, u, day, t):
        return (i, dt.datetime(2024, 1, day, 12), u, t)

    rows = [
        # 4 baskets: {a,b}, {a,b}, {a}, {b,c}
        ev(1, 1, 1, "a"), ev(2, 1, 1, "b"),
        ev(3, 2, 1, "a"), ev(4, 2, 1, "b"),
        ev(5, 3, 1, "a"),
        ev(6, 4, 1, "b"), ev(7, 4, 1, "c"),
        # duplicate event in a basket must not double-count
        ev(8, 1, 1, "a"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {(r["item_a"], r["item_b"]): r for r in basket_lift(df).collect()}
    # only (a,b) reaches min_pair_count=2: c_ab=2, c_a=3, c_b=3, N=4
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert r["pair_baskets"] == 2
    assert r["baskets_a"] == 3 and r["baskets_b"] == 3
    assert r["support"] == 0.5
    assert abs(r["confidence"] - 2 / 3) < 1e-3
    assert abs(r["lift"] - (2 * 4) / (3 * 3)) < 1e-3


def test_cdc_boundaries_survive_insertion(spark):
    """The CDC property: an insertion near the start of a copy shifts
    every FIXED chunk after it, but content-defined boundaries re-align
    downstream — most chunks still match."""
    import random

    from uk_housing_dashboard_etl_spark.operators.dedup import cdc_chunk_pairs

    random.seed(7)
    vocab = [f"w{i}" for i in range(300)]
    base = [random.choice(vocab) for _ in range(120)]
    shifted = base[:3] + ["zzz"] + base[3:]
    unrelated = [random.choice(vocab) for _ in range(120)]
    df = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(shifted)), (3, " ".join(unrelated))],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in cdc_chunk_pairs(df, threshold=0.3).collect()
    }
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    # only the chunk containing the inserted token differs
    assert r["shared_chunks"] >= r["chunks_a"] - 2
    assert r["overlap"] >= 0.7


def test_cdc_chunks_partition_the_doc(spark):
    """Chunks must tile the token stream: rejoining them in any order
    of discovery reproduces the token multiset, and a doc shorter than
    the hash window is one single chunk."""
    from uk_housing_dashboard_etl_spark.operators.dedup import cdc_chunk_pairs

    tiny = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    out = cdc_chunk_pairs(tiny, threshold=0.5).collect()
    assert len(out) == 1
    assert out[0]["chunks_a"] == 1 and out[0]["shared_chunks"] == 1
    assert out[0]["overlap"] == 1.0


def test_hard_negatives_exclude_same_label(spark):
    from uk_housing_dashboard_etl_spark.operators.similarity import (
        brute_force_topk,
        hard_negative_mining,
    )

    # corpus: label 0 vectors near the query, label 1 vectors further —
    # the miner must skip the similar same-label items entirely
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0], 0),
            (11, [0.99, 0.1], 0),
            (12, [0.8, 0.6], 1),
            (13, [0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)],
        "query_id long, embedding array<double>, label int",
    )
    out = hard_negative_mining(corpus, queries, k=2).collect()
    assert [r["vec_id"] for r in out] == [12, 13]
    assert all(r["neg_label"] != r["query_label"] for r in out)
    # hardest negative ranks first, and scores agree with the exact
    # scorer on the same pairs
    ref = {
        r["vec_id"]: r["score"]
        for r in brute_force_topk(corpus, queries, k=4).collect()
    }
    for r in out:
        assert r["score"] == ref[r["vec_id"]]


def test_benford_rejects_sub_one_min_value(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import benford_profile

    df = spark.createDataFrame([(1.5,)], ["x"])
    with pytest.raises(ValueError, match="min_value"):
        benford_profile(df, "x", min_value=0.01)


def test_ks_separates_shifted_distributions(spark):
    import math

    from uk_housing_dashboard_etl_spark.operators.stats import ks_two_sample

    rows = [("a", float(i)) for i in range(100)] + [
        ("b", float(i) + 50.0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    # disjoint-half shift: D = 0.5 exactly (max gap at v=49..50)
    assert r["d_stat"] == 0.5
    assert r["shifted"] is True
    # identical samples -> D = 0, p -> ~1 (clamped)
    same = spark.createDataFrame(
        [("a", float(i % 10)) for i in range(50)]
        + [("b", float(i % 10)) for i in range(50)],
        ["g", "v"],
    )
    r2 = ks_two_sample(same, "g", "v", "a", "b").collect()[0]
    assert r2["d_stat"] == 0.0 and r2["shifted"] is False
    assert r2["p_approx"] == 1.0
    # p matches the hand-computed 3-term Kolmogorov series
    ne = 100 * 100 / 200
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * 0.5
    p_ref = 2 * (
        math.exp(-2 * lam * lam)
        - math.exp(-8 * lam * lam)
        + math.exp(-18 * lam * lam)
    )
    assert r["p_approx"] == pytest.approx(max(0.0, min(1.0, p_ref)), abs=1e-4)


def test_ab_ztest_hand_computed_and_degenerate(spark):
    import math

    from uk_housing_dashboard_etl_spark.operators.stats import (
        ab_proportions_ztest,
    )

    # 10 users even (A), 10 odd (B); A converts 8/10, B converts 2/10
    rows = []
    eid = 0
    for u in range(20):
        variant_a = u % 2 == 0
        converts = (u // 2 < 8) if variant_a else (u // 2 < 2)
        rows.append((eid, u, "purchase" if converts else "view"))
        eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type"])
    r = ab_proportions_ztest(df).collect()[0]
    assert r["n_a"] == 10 and r["n_b"] == 10
    assert r["rate_a"] == 0.8 and r["rate_b"] == 0.2
    pool = 0.5
    z_ref = (0.8 - 0.2) / math.sqrt(pool * 0.5 * (0.1 + 0.1))
    assert r["z_stat"] == pytest.approx(z_ref, abs=1e-3)
    assert r["significant"] is True

    # degenerate: everyone converts -> z undefined, not an error
    all_conv = spark.createDataFrame(
        [(i, i, "purchase") for i in range(10)],
        ["event_id", "user_id", "event_type"],
    )
    d = ab_proportions_ztest(all_conv).collect()[0]
    assert d["z_stat"] is None and d["significant"] is None
    assert d["rate_a"] == 1.0 and d["rate_b"] == 1.0


def test_interarrival_all_zero_gaps_yield_null_cv(spark):
    from uk_housing_dashboard_etl_spark.operators.behavior import (
        interarrival_stats,
    )

    rows = [(i, _ts(0), 9) for i in range(4)]  # one timestamp, 3 zero gaps
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    r = interarrival_stats(df).collect()[0]
    assert r["mean_gap_s"] == 0.0
    assert r["cv_gap"] is None and r["burstiness"] is None


def test_ks_missing_group_yields_nulls(spark):
    from uk_housing_dashboard_etl_spark.operators.stats import ks_two_sample

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["g", "v"])
    r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert r["d_stat"] is None and r["shifted"] is None


def test_simjoin_prefix_matches_brute_force(spark):
    """Prefix filtering finds exactly the pairs the unfiltered shingle
    self-join finds at the same threshold — completeness AND exactness
    on a fixture with a near-dup pair, an identical pair, and noise."""
    from uk_housing_dashboard_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from uk_housing_dashboard_etl_spark.operators.simjoin import (
        set_similarity_join,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail"),          # near-dup of 1
            (3, base),                    # exact dup of 1
            (4, "completely different words about spark shuffles here"),
            (5, "another unrelated document with its own token stream"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in set_similarity_join(docs, threshold=0.8).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert got == want
    assert (1, 3, 1.0) in got and any(p[:2] == (1, 2) for p in got)
    assert not any(4 in p[:2] or 5 in p[:2] for p in got)


def test_simjoin_threshold_validation(spark):
    from uk_housing_dashboard_etl_spark.operators.simjoin import (
        set_similarity_join,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        set_similarity_join(docs, threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        set_similarity_join(docs, threshold=1.5)
