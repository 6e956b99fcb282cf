from uk_housing_dashboard_etl_spark.functions.cleaning import (
    discover_columns,
    normalize_code,
    normalize_category,
    coerce_timestamp,
    coerce_double,
    prefix_key,
)

__all__ = [
    "discover_columns",
    "normalize_code",
    "normalize_category",
    "coerce_timestamp",
    "coerce_double",
    "prefix_key",
]
