"""Registry-wide invariants over ``contract.QUERIES``.

The driver's correctness harness canonicalizes every registered query's
output with a pandas sort-and-hash over ALL columns; array/map cells are
unhashable there (round-2 ERR on multimodal_decode/features). These tests
pin the fix: no top-level registered query may expose ArrayType/MapType
(or BinaryType, equally unsortable) columns — digest them instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, BinaryType, MapType

from uk_housing_dashboard_etl_spark import contract

# Streaming queries EXECUTE inside the builder (awaitTermination before
# returning); their scalar-only schemas are asserted separately in
# test_streaming.py, so the lazy schema sweep here skips them.
_LAZY = [n for n in contract.QUERIES if not n.startswith("streaming_")]


@pytest.mark.parametrize("name", _LAZY)
def test_no_unhashable_columns(spark, sf_small, name):
    schema = contract.QUERIES[name](spark, sf_small).schema
    offending = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, BinaryType))
    ]
    assert not offending, (
        f"{name} exposes driver-unhashable columns {offending}; project "
        "them to md5/to_json digests before registering"
    )


def test_oracle_keys_subset_of_queries():
    extra = set(contract.ORACLES) - set(contract.QUERIES)
    assert not extra, f"oracles without a registered query: {sorted(extra)}"


def test_registry_front_window_is_unverified_families():
    """Round-5 rotation: the first slots must be the seven round-4b
    additions no driver window has ever checked, then the three round-4
    hash-mismatch rows re-verified after their type-level fixes, then
    every query added in round 5, and the declared front ordering must
    be applied verbatim."""
    first = list(contract.QUERIES)[:10]
    expected = {
        "simjoin_prefix", "copurchase_triangles", "pagerank_trade",
        "degree_profile", "communities", "weighted_sample",
        "streaming_enriched",
        "sql_weekly_by_la", "ks_values", "ab_ztest",
    }
    assert set(first) == expected
    n_new = len(contract._R5_NEW)
    assert list(contract.QUERIES)[10 : 10 + n_new] == contract._R5_NEW
    assert list(contract.QUERIES)[: len(contract._R5_FRONT)] == (
        contract._R5_FRONT
    )
