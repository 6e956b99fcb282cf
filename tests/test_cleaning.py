"""P1-P9 scalar layer: discovery, lenient coercions, normalizations.

Mirrors the reference's runtime self-checks plus the SURVEY.md §4 gotcha
list (null-on-coerce, whitespace stripping, prefix fallback).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.cleaning import (
    coerce_double,
    coerce_timestamp,
    discover_columns,
    normalize_category,
    normalize_code,
    prefix_key,
)
from uk_housing_dashboard_etl_spark.operators import standardize_transactions


def test_discover_columns_substring_match():
    roles = discover_columns(
        ["Transaction_Unique_ID", "Price", "Date_of_Transfer", "PostCode", "Property_Type"]
    )
    assert roles["date"] == "Date_of_Transfer"
    assert roles["price"] == "Price"
    assert roles["postcode"] == "PostCode"
    assert roles["transaction_id"] == "Transaction_Unique_ID"
    assert roles["prop_type"] == "Property_Type"


def test_discover_columns_missing_required_raises():
    with pytest.raises(RuntimeError, match="date or price"):
        discover_columns(["foo", "bar"])


def test_coercions_null_on_failure(spark):
    df = spark.createDataFrame(
        [("2024-01-08", "100.5"), ("not a date", "n/a")], ["d", "p"]
    ).select(
        coerce_timestamp(F.col("d")).alias("d"),
        coerce_double(F.col("p")).alias("p"),
    )
    rows = df.collect()
    assert rows[0]["d"] is not None and rows[0]["p"] == 100.5
    assert rows[1]["d"] is None and rows[1]["p"] is None


def test_normalizations(spark):
    df = spark.createDataFrame([("sw1A 1aa", "  Detached ")], ["pc", "pt"]).select(
        normalize_code(F.col("pc")).alias("pc"),
        normalize_category(F.col("pt")).alias("pt"),
        prefix_key(normalize_code(F.col("pc"))).alias("prefix"),
    )
    row = df.collect()[0]
    assert row["pc"] == "SW1A1AA"
    assert row["pt"] == "detached"
    assert row["prefix"] == "SW1A"


def test_standardize_drops_bad_dates_and_synthesizes_id(spark):
    raw = spark.createDataFrame(
        [("2024-01-08", "250000"), ("garbage", "100"), ("2024-01-09", "x")],
        ["date_of_transfer", "price"],
    )
    out = standardize_transactions(raw)
    rows = out.collect()
    assert len(rows) == 2  # bad date dropped (P4)
    assert {r["price"] for r in rows} == {250000.0, None}  # bad price nulled (P6)
    assert len({r["transaction_id"] for r in rows}) == 2  # P5 surrogate ids distinct
    assert all(r["key"] is None for r in rows)  # no postcode column
