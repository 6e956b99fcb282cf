from uk_housing_dashboard_etl_spark.operators.weekly import (
    standardize_transactions,
    enrich_with_lookup,
    weekly_mart,
    type_breakdown,
    coverage_report,
)
from uk_housing_dashboard_etl_spark.operators.densify import densify_weekly_grid
from uk_housing_dashboard_etl_spark.operators.rolling import rolling_windows
from uk_housing_dashboard_etl_spark.operators.anomaly import detect_anomalies
from uk_housing_dashboard_etl_spark.operators.snapshot import latest_snapshot, qa_metrics

__all__ = [
    "standardize_transactions",
    "enrich_with_lookup",
    "weekly_mart",
    "type_breakdown",
    "coverage_report",
    "densify_weekly_grid",
    "rolling_windows",
    "detect_anomalies",
    "latest_snapshot",
    "qa_metrics",
]
