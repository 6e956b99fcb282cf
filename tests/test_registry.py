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
    """Round-6 rotation (README r6 row): round-6 additions first, then
    the twenty r1-era dedup/sketch/§2-satellite entries the r5 window
    displaced, then the r2-era similarity/text/curation block — and the
    declared front ordering must be applied verbatim."""
    order = list(contract.QUERIES)
    n_new = len(contract._R6_NEW)
    assert order[:n_new] == contract._R6_NEW
    # the ~50-query driver window must be filled by the oldest-verified
    # families: every r1-era satellite sits inside the first 50 slots
    r1_era = {
        "asof_join", "dedup_exact", "dedup_ngram_jaccard",
        "dedup_clusters", "top_ngrams", "dedup_minhash", "dedup_simhash",
        "sketch_cardinalities", "sketch_weekly_distinct",
        "sketch_quantiles", "type_breakdown", "coverage_report",
        "grid_weekly", "qa_metrics", "week_over_week", "props_json",
        "quality_checks", "latest_by_key", "revenue_filter",
        "weekly_type_pivot",
    }
    assert r1_era <= set(order[:50])
    assert order[: len(contract._R6_FRONT)] == contract._R6_FRONT
