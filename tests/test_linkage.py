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
