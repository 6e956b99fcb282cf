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
    """Round-7 rotation (README r7 row): round-7 additions first, then
    every query whose last driver check was round 2 (the 37-name true
    debt — the planned r4 tail sample never ran), then the oldest
    r3-era block — and the declared front ordering must be applied
    verbatim."""
    order = list(contract.QUERIES)
    n_new = len(contract._R7_NEW)
    assert order[:n_new] == contract._R7_NEW
    # the ~50-query driver window must be filled by the oldest-verified
    # families: every r2-era name sits inside the first 50 slots
    r2_era = {
        "sessionize", "range_join", "similarity_topk",
        "embedding_near_dup_lsh", "text_stats", "quality_score",
        "doc_fingerprint", "filter_funnel", "embedding_quantize",
        "token_histogram", "robust_anomalies", "price_deciles",
        "lapsed_parts", "source_cap", "weekly_unpivot",
        "repeat_customers", "supplier_percentile", "gap_interpolation",
        "top_parts_per_nation", "modal_type", "curate_corpus",
        "knn_classify", "embedding_centroids", "conversion_funnel",
        "weekly_retention", "multimodal_meta", "multimodal_frames",
        "cumulative_users", "event_transitions", "first_last_touch",
        "corr_stats", "price_histogram", "grouping_sets",
        "range_rolling", "active_suppliers", "similarity_lsh_recall",
        "similarity_ivf_recall",
    }
    assert r2_era <= set(order[:50])
    assert order[: len(contract._R7_FRONT)] == contract._R7_FRONT
