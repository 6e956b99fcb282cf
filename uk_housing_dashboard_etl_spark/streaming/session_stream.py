"""Streaming sessionization via native session windows.

The streaming twin of ``operators.sessionize`` (batch lag/cumsum
formulation): ``F.session_window(ts, gap)`` merges events closer than
``gap`` into one growing window per user, maintained incrementally
across micro-batches — a session stays open while events keep arriving
and closes (emits, in append mode) once the watermark passes its end.

Semantics vs the batch operator: identical session membership except at
the exact boundary — batch keeps an event at gap == timeout in the same
session (strict ``>`` test on the lag), while a session window is
half-open ``[start, last_ts + gap)`` so that event opens a new session.
Real timestamps sit on the boundary with probability ~0; the
equivalence test avoids exact-boundary gaps.

Scale notes: state is one struct per OPEN session (merged eagerly as
events arrive), keyed by (user, window) — bounded by active users ×
watermark horizon, independent of history length. This is Spark's
built-in stateful operator; no applyInPandasWithState needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from uk_housing_dashboard_etl_spark.streaming.weekly_stream import (
    EVENTS_STREAM_SCHEMA,
)


def session_stream(
    spark: SparkSession,
    source_dir: str,
    gap_minutes: float = 30.0,
    watermark: str = "1 day",
    schema: StructType = EVENTS_STREAM_SCHEMA,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Per-(user, session) rollup over a parquet landing zone:
    (user_id, session_start, session_last, n_events, value_sum).

    ``max_files_per_trigger=1`` (default) splits an availableNow drain
    into one micro-batch per file. This matters for append emission: the
    watermark advances BETWEEN micro-batches (and only the watermark —
    not max event time — survives a restart in the offset log), so a
    single-batch drain can never move it past a session's end. With
    per-file batches plus Spark's trailing no-data batch, sessions whose
    end the watermark passes are emitted within the same drain.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(source_dir)
    # integer interval string: "30.0 minutes" is NOT a valid interval —
    # session_window silently yields null windows and every row vanishes
    gap = f"{int(gap_minutes * 60)} seconds"
    return (
        raw.where(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            "user_id",
            "session_start",
            "session_last",
            "n_events",
            "value_sum",
        )
    )
