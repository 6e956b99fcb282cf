"""Round-7 additions: exact-substring (suffix-grain) dedup spans."""

from __future__ import annotations

from uk_housing_dashboard_etl_spark.operators.dedup import (
    exact_substr_spans,
    exact_substr_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_substr_finds_cross_doc_span(spark):
    shared = "x" * 5 + "abcdefghij" * 4  # 45 chars incl. a 40-char repeat
    rows = [
        (1, "AAA " + shared + " tail one unique piece here today"),
        (2, "BBBBBB " + shared + " other unique ending entirely"),
        (3, "completely unrelated text with no duplication at all okay"),
    ]
    spans = (
        exact_substr_spans(_docs(spark, rows), min_len=30, hash_grams=False)
        .orderBy("doc_id")
        .collect()
    )
    by_doc = {r["doc_id"]: r for r in spans}
    assert set(by_doc) == {1, 2}
    # doc 1: shared starts at offset 4, doc 2: offset 7; each maximal
    # span covers exactly the 45 shared chars (plus the shared leading
    # space? no — the preceding chars differ, so the span starts where
    # the first duplicated 30-gram starts)
    assert by_doc[1]["span_end"] - by_doc[1]["span_start"] >= 45
    assert by_doc[2]["span_end"] - by_doc[2]["span_start"] >= 45
    for r in spans:
        assert r["span_len"] == r["span_end"] - r["span_start"]
        assert r["span_len"] >= 30


def test_exact_substr_within_doc_repeat_merges_to_one_span_each(spark):
    block = "0123456789abcdefghijklmnopqrstuv"  # 32 chars
    text = block + "-----SEP-----" + block
    spans = (
        exact_substr_spans(
            _docs(spark, [(7, text)]), min_len=30, hash_grams=False
        )
        .orderBy("span_start")
        .collect()
    )
    # both copies of the block are duplicated; the separator is not
    assert len(spans) == 2
    assert spans[0]["span_start"] == 0
    assert spans[0]["span_end"] == 32
    assert spans[1]["span_start"] == len(block) + 13
    assert spans[1]["span_end"] == len(text)


def test_exact_substr_stats_zeros_for_clean_and_short_docs(spark):
    rows = [
        (1, "short"),  # below min_len: no grams at all
        (2, "a perfectly unique sentence that repeats nothing of note"),
    ]
    out = {
        r["doc_id"]: r
        for r in exact_substr_stats(
            _docs(spark, rows), min_len=30, hash_grams=False
        ).collect()
    }
    assert out[1]["n_spans"] == 0 and out[1]["dup_chars"] == 0
    assert out[2]["dup_frac"] == 0.0
    assert out[1]["n_chars"] == 5


def test_exact_substr_hash_and_string_paths_agree(spark):
    shared = "the same long duplicated fragment appearing twice over"
    rows = [
        (1, "prefix one " + shared),
        (2, "prefix two longer " + shared),
        (3, "nothing in common with the others whatsoever right here"),
    ]
    a = sorted(
        exact_substr_stats(
            _docs(spark, rows), min_len=30, hash_grams=False
        ).collect()
    )
    b = sorted(
        exact_substr_stats(
            _docs(spark, rows), min_len=30, hash_grams=True
        ).collect()
    )
    assert a == b


def test_exact_substr_maximal_extension(spark):
    # a 50-char duplicated region must surface as ONE span of exactly
    # 50 chars (21 duplicated 30-gram starts merging), not 21 spans
    region = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMN"  # 50
    # distinct flanking chars on every side so the duplicated region is
    # exactly the 50 shared chars
    rows = [(1, "U1!" + region + "?V1"), (2, "W22" + region + ".Z2")]
    spans = exact_substr_spans(
        _docs(spark, rows), min_len=30, hash_grams=False
    ).collect()
    assert len(spans) == 2
    for r in spans:
        assert r["span_len"] == 50


def test_exact_substr_trim_rebuilds_and_cuts(spark):
    from uk_housing_dashboard_etl_spark.operators.dedup import (
        exact_substr_trim,
    )

    shared = "this exact fragment is long enough to be duplicated!"
    rows = [
        (1, "AA_" + shared + "_keepme"),
        (2, "BB__" + shared + "__alsokept"),
        (3, "totally novel text that should pass through unchanged ok"),
    ]
    out = {
        r["doc_id"]: r
        for r in exact_substr_trim(
            _docs(spark, rows), min_len=30, hash_grams=False
        ).collect()
    }
    # doc 3 untouched: trimmed == original
    assert out[3]["trimmed_chars"] == out[3]["n_chars"]
    assert out[3]["n_cuts"] == 0
    # docs 1/2: the shared region is cut, the unique flanks survive
    assert out[1]["n_cuts"] == 1
    assert out[1]["trimmed_chars"] < out[1]["n_chars"]
    assert out[2]["trimmed_chars"] < out[2]["n_chars"]
    # md5 of doc 3's trimmed text equals md5 of its original text
    import hashlib

    assert out[3]["trimmed_md5"] == hashlib.md5(
        rows[2][1].encode()
    ).hexdigest()
