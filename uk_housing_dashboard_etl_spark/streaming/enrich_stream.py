"""Stream-static enrichment: a streaming fact joined against a batch
dimension, then aggregated — the canonical Structured Streaming
pattern the rest of the family doesn't yet demonstrate (weekly/
sessions/dedup are pure stateful aggs; attribution joins stream state,
not a static table).

Semantics and scale: the STATIC side is re-resolved per micro-batch
(so a dimension update lands on the next trigger without restarting
the query) and broadcast — the stream side never shuffles for the
join, only for the downstream aggregate. State is the open aggregate
groups (segments × event types), independent of stream volume.

Reference anchor: the batch enrichment join this streams is J1
(ref ``etl/etl_main.py`` lookup join; `operators/weekly.py:91`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.streaming.weekly_stream import (
    EVENTS_STREAM_SCHEMA,
)


def enriched_segment_stream(
    spark: SparkSession,
    source_dir: str,
    dim: DataFrame,
    dim_key: str = "c_custkey",
    segment_col: str = "c_mktsegment",
) -> DataFrame:
    """Per (market segment, event type) event counts and deterministic
    value sums over the event stream, segment resolved by a
    stream-static broadcast join against the customer dimension.

    The value sum uses the batch mart's half-up 1e-4 integer-unit rule
    so the result is bit-identical under any micro-batch split — the
    property the driver gate hash-compares. NaN/±Inf values are
    excluded from the sum like NULLs (they cannot quantize to integer
    units; Spark's floor silently saturates them while the oracle
    engine raises — r12 fuzz finding); the row still counts in
    ``n_events``.
    """
    raw = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(source_dir)
    seg = F.broadcast(
        dim.select(
            F.col(dim_key).alias("user_id"),
            F.col(segment_col).alias("segment"),
        )
    )
    return (
        raw.where(F.col("ts").isNotNull())
        .join(seg, "user_id")  # stream-static: re-read per micro-batch
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(
                    F.expr(
                        "CASE WHEN NOT isnan(value)"
                        " AND abs(value) < CAST('Infinity' AS DOUBLE)"
                        " THEN CAST(floor(value * 10000.0 + 0.5)"
                        " AS BIGINT) END"
                    )
                ).cast("double")
                / 10000.0
            ).alias("value_sum"),
        )
    )
