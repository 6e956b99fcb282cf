"""Stream-stream interval join: click attribution as two live streams.

The last Structured Streaming join shape the family doesn't yet cover:
``enrich_stream`` joins a stream to a STATIC dimension; this joins two
STREAMS (clicks and purchases from the same event feed) on key + a
time-range condition — the canonical "purchase within N minutes of a
click" attribution join, state-bounded by watermarks on BOTH sides.

Semantics: inner join on user with ``click_ts < purchase_ts ≤ click_ts
+ window`` — every qualifying (click, purchase) pair, exactly the rows
the equivalent batch join produces (inner stream-stream joins emit a
pair as soon as both sides arrive; the watermark only bounds retained
state, it never drops a pair under AvailableNow draining of a bounded
backlog).

Scale: each side's state is its watermark-window of rows, keyed by
user — the join co-partitions both streams on user, so state lookups
are partition-local; the time-range predicate lets Spark evict a row
the moment the other side's watermark passes ``ts + window``. Without
the range condition state would grow unboundedly — the condition is
load-bearing, not an optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.streaming.weekly_stream import (
    EVENTS_STREAM_SCHEMA,
)


def click_purchase_join_stream(
    spark: SparkSession,
    source_dir: str,
    attribution_window: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """(click, purchase) pairs within ``attribution_window``, per user,
    as a stream-stream inner join — pair grain; aggregate downstream
    (a second stateful operator after a stream-stream join needs
    chained-stateful support; the drain-then-batch-aggregate split
    keeps the streaming part exactly the join under test).
    """
    clicks = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .parquet(source_dir)
        .where(
            (F.col("event_type") == "click")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .parquet(source_dir)
        .where(
            (F.col("event_type") == "purchase")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id"
            " AND purchase_ts > click_ts"
            f" AND purchase_ts <= click_ts + interval {attribution_window}"
        ),
        "inner",
    ).drop("p_user_id")
