from uk_housing_dashboard_etl_spark.streaming.weekly_stream import (
    weekly_stream,
    run_stream_once,
)

__all__ = ["weekly_stream", "run_stream_once"]
