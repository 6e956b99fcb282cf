"""Unit tests for the fuzzy record-linkage operators.

Pins: blocking never pairs across first tokens, the length prefilter
is lossless, pair order canonicalization, and the best-match argmin
tie-break.
"""

from __future__ import annotations

import pytest

from uk_housing_dashboard_etl_spark.operators.linkage import (
    best_fuzzy_match,
    fuzzy_pairs,
)


@pytest.fixture(scope="module")
def parts(spark):
    rows = [
        (1, "red widget"),
        (2, "red widgets"),      # dist 1 from #1
        (3, "red wadget"),       # dist 1 from #1, dist 2 from #2
        (4, "blue widget"),      # other block: never paired with red*
        (5, "red straightedge"), # same block, far in length -> prefiltered
    ]
    return spark.createDataFrame(rows, ["p_partkey", "p_name"])


def test_pairs_block_and_threshold(parts):
    got = {
        (r["key_a"], r["key_b"]): r["distance"]
        for r in fuzzy_pairs(parts, max_dist=2).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 2}
    # canonical order: key_a < key_b always
    assert all(a < b for a, b in got)


def test_pairs_cross_block_never_compared(parts):
    rows = fuzzy_pairs(parts, max_dist=10).collect()
    keys = {k for r in rows for k in (r["key_a"], r["key_b"])}
    assert 4 not in keys  # 'blue widget' is 1 substitution from 'red widget'
    # but at max_dist=10 the long same-block name now passes the length gate
    assert 5 in keys


def test_best_match_argmin_tiebreak(parts):
    out = {r["left_key"]: r for r in best_fuzzy_match(parts, parts, max_dist=2).collect()}
    # part 1 is dist-1 from both 2 and 3: tie resolves to smaller key 2
    assert out[1]["match_key"] == 2 and out[1]["distance"] == 1
    assert out[2]["match_key"] == 1
    assert out[3]["match_key"] == 1
    assert 4 not in out and 5 not in out


def test_sorted_neighborhood_subset_and_linearity(parts, spark):
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    full = {
        (r["key_a"], r["key_b"])
        for r in fuzzy_pairs(parts, max_dist=2).collect()
    }
    snm = [
        (r["key_a"], r["key_b"])
        for r in sorted_neighborhood_pairs(parts, window=5, max_dist=2).collect()
    ]
    # subset property: the rank band only prunes, never invents pairs
    assert set(snm) <= full
    assert len(snm) == len(set(snm))
    # with a window covering the whole block, recall is total
    all_snm = {
        (r["key_a"], r["key_b"])
        for r in sorted_neighborhood_pairs(parts, window=100, max_dist=2).collect()
    }
    assert all_snm == full


def test_sorted_neighborhood_window_bounds_candidates(spark):
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    # one block of n identical-prefix names: candidate volume must be
    # ~ n*window, not n^2/2
    n, w = 60, 2
    rows = [(i, "blk name%03d" % i) for i in range(n)]
    df = spark.createDataFrame(rows, ["p_partkey", "p_name"])
    got = sorted_neighborhood_pairs(df, window=w, max_dist=10).count()
    assert got <= n * w


def test_compressed_variants_equal_record_grain(parts, spark):
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        best_fuzzy_match_compressed,
        fuzzy_pair_histogram,
    )

    # duplicate some names so the compression actually compresses
    extra = spark.createDataFrame(
        [(10, "red widget"), (11, "red widget"), (12, "red widgets")],
        ["p_partkey", "p_name"],
    )
    recs = parts.unionByName(extra)

    plain = best_fuzzy_match(recs, recs, max_dist=2).collect()
    comp = best_fuzzy_match_compressed(recs, recs, max_dist=2).collect()
    key = lambda r: (r["left_key"], r["match_key"], r["distance"])
    assert sorted(map(key, plain)) == sorted(map(key, comp))

    hist = {
        r["distance"]: r["n_pairs"]
        for r in fuzzy_pair_histogram(recs, max_dist=2).collect()
    }
    brute = fuzzy_pairs(recs, max_dist=2).groupBy("distance").count().collect()
    assert hist == {r["distance"]: r["count"] for r in brute}
