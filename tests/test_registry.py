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
    """Round-4 rotation: the first 23 slots must be the round-3b
    additions no driver window has ever checked (VERDICT r3 item 1),
    and the declared front ordering must be applied verbatim."""
    first = list(contract.QUERIES)[:23]
    expected = {
        "cohort_matrix", "funnel_timing", "value_trend", "pmi_pairs",
        "semantic_decontaminate", "psi_drift", "attribution_credit",
        "embedding_health", "bpe_merges", "split_leakage",
        "table_profile", "twap", "join_cardinality",
        "streaming_rate_cap", "streaming_anomaly", "rrf_fusion",
        "quality_calibrate", "vocab_growth", "trimmed_stats",
        "fuzzy_matches", "fuzzy_pair_stats", "fuzzy_snm_recall",
        "ewma_weekly",
    }
    assert set(first) == expected
    assert list(contract.QUERIES)[: len(contract._R4_FRONT)] == (
        contract._R4_FRONT
    )
