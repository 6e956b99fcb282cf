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


def test_length_bucket_composite_block_is_lossless(parts, spark):
    """The (token, length-bucket) composite block with ±1 fan-out must
    return EXACTLY the unbucketed pair set (VERDICT r3 item 4)."""
    rows = [(i, "blk name%s" % ("x" * (i % 9))) for i in range(30)]
    df = spark.createDataFrame(rows, ["p_partkey", "p_name"])
    for frame in (parts, df):
        plain = {
            (r["key_a"], r["key_b"], r["distance"])
            for r in fuzzy_pairs(frame, max_dist=2).collect()
        }
        for w in (2, 3, 5):
            bucketed = [
                (r["key_a"], r["key_b"], r["distance"])
                for r in fuzzy_pairs(
                    frame, max_dist=2, length_bucket=w
                ).collect()
            ]
            # identical set AND no duplicate pairs from the fan-out
            assert len(bucketed) == len(set(bucketed))
            assert set(bucketed) == plain


def test_length_bucket_histogram_lossless(parts, spark):
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        fuzzy_pair_histogram,
    )

    extra = spark.createDataFrame(
        [(10, "red widget"), (11, "red widget"), (12, "red widgets")],
        ["p_partkey", "p_name"],
    )
    recs = parts.unionByName(extra)
    plain = {
        (r["distance"], r["n_pairs"], r["n_name_pairs"])
        for r in fuzzy_pair_histogram(recs, max_dist=2).collect()
    }
    bucketed = {
        (r["distance"], r["n_pairs"], r["n_name_pairs"])
        for r in fuzzy_pair_histogram(
            recs, max_dist=2, length_bucket=3
        ).collect()
    }
    assert bucketed == plain


def test_length_bucket_narrower_than_max_dist_rejected(parts):
    with pytest.raises(ValueError, match="length_bucket"):
        fuzzy_pairs(parts, max_dist=3, length_bucket=2).collect()


def test_length_bucket_bounds_dominant_block(spark):
    """One dominant first token: the composite block must cut candidate
    volume while keeping the result identical. Candidate volume is read
    from the planted length spread — names in different length cells
    (beyond max_dist apart) can never pair, so the bucketed join's
    output equals the plain join's output while the quadratic term is
    per length cell."""
    rows = [(i, "the item%d%s" % (i, "z" * ((i % 6) * 5))) for i in range(80)]
    df = spark.createDataFrame(rows, ["p_partkey", "p_name"])
    plain = {
        (r["key_a"], r["key_b"])
        for r in fuzzy_pairs(df, max_dist=2).collect()
    }
    bucketed = {
        (r["key_a"], r["key_b"])
        for r in fuzzy_pairs(df, max_dist=2, length_bucket=4).collect()
    }
    assert bucketed == plain


def test_resolve_entities_transitive_chain(spark):
    """a~b and b~c must land in ONE entity even when a and c are
    further apart than max_dist (the transitive-closure point)."""
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        resolve_entities,
    )

    rows = [
        (1, "red widget"),
        (2, "red widgett"),    # dist 1 from #1
        (3, "red widgettt"),   # dist 1 from #2, dist 2 from #1
        (4, "red widgetttt"),  # dist 1 from #3, dist 3 from #1
        (5, "blue thing"),     # separate entity
        (6, "red widget"),     # duplicate record of #1's name
    ]
    df = spark.createDataFrame(rows, ["p_partkey", "p_name"])
    out = {r["key"]: r for r in resolve_entities(df, max_dist=1).collect()}
    assert out[1]["entity_id"] == "red widget"
    # all chain members share the canonical (min) name
    assert (
        out[1]["entity_id"] == out[2]["entity_id"] == out[3]["entity_id"]
        == out[4]["entity_id"] == out[6]["entity_id"]
    )
    assert out[5]["entity_id"] == "blue thing"
    assert out[1]["n_records"] == 5 and out[1]["n_names"] == 4
    assert out[5]["n_records"] == 1 and out[5]["n_names"] == 1


def test_resolve_entities_distributed_fallback_equivalent(spark, monkeypatch):
    """Above the driver-union-find edge cap the distributed contraction
    must produce the identical labeling."""
    from uk_housing_dashboard_etl_spark.operators import linkage
    from uk_housing_dashboard_etl_spark.operators.linkage import (
        resolve_entities,
    )

    rows = [(i, "red widget" + "t" * (i % 4)) for i in range(12)] + [
        (100, "blue thing")
    ]
    df = spark.createDataFrame(rows, ["p_partkey", "p_name"])
    fast = sorted(
        (r["key"], r["entity_id"], r["n_names"], r["n_records"])
        for r in resolve_entities(df, max_dist=1).collect()
    )
    monkeypatch.setattr(linkage, "ENTITY_DRIVER_UNION_MAX_EDGES", -1)
    slow = sorted(
        (r["key"], r["entity_id"], r["n_names"], r["n_records"])
        for r in resolve_entities(df, max_dist=1).collect()
    )
    assert fast == slow
