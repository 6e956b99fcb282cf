from uk_housing_dashboard_etl_spark.sources.readers import (
    read_table,
    read_csv_sniffed,
    read_lookup_csv,
)
from uk_housing_dashboard_etl_spark.sources.sinks import write_csv_artifact

__all__ = [
    "read_table",
    "read_csv_sniffed",
    "read_lookup_csv",
    "write_csv_artifact",
]
