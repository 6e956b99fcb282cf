"""Stream-stream joins: click attribution as two live streams.

The last Structured Streaming join shapes the family doesn't cover:
``enrich_stream`` joins a stream to a STATIC dimension; these join two
STREAMS (clicks and purchases from the same event feed) on key + a
time-range condition — the canonical "purchase within N minutes of a
click" attribution join, state-bounded by watermarks on BOTH sides.

Inner semantics: ``click_ts < purchase_ts ≤ click_ts + window`` —
every qualifying (click, purchase) pair, exactly the rows the
equivalent batch join produces (inner stream-stream joins emit a pair
as soon as both sides arrive; the watermark only bounds retained
state, it never drops a pair under AvailableNow draining of a bounded
backlog).

Left-outer semantics add the unanswered clicks: a click with NO
purchase in its window is emitted with NULL purchase columns — but
only once the watermark passes ``click_ts + window`` (before that a
matching purchase could still arrive). A single-drain caller must
therefore advance the watermark past the data: the registered query
uses the session-window trick (far-future sentinel file +
``maxFilesPerTrigger=1`` so the sentinel lands in a LATER micro-batch
and the trailing no-data batch flushes the timed-out clicks).

The watermark is applied BEFORE the event-type filter on each side:
the sentinel row must reach the watermark operator to advance it, and
for the join result the placement is immaterial (the filter still
drops sentinel rows from the join inputs).

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
    join_type: str = "inner",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """(click, purchase) pairs within ``attribution_window`` per user —
    pair grain; aggregate downstream (a second stateful operator after
    a stream-stream join needs chained-stateful support; the
    drain-then-batch-aggregate split keeps the streaming part exactly
    the join under test). ``join_type='left_outer'`` also emits
    watermark-expired unmatched clicks with NULL purchase columns.
    """

    def _side() -> DataFrame:
        reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", max_files_per_trigger
            )
        return reader.parquet(source_dir).where(F.col("ts").isNotNull())

    clicks = (
        _side()
        .withColumnRenamed("ts", "click_ts")
        .withWatermark("click_ts", watermark)
        .where(
            (F.col("event_type") == "click") & F.col("user_id").isNotNull()
        )
        .select("user_id", "click_ts", F.col("event_id").alias("click_id"))
    )
    purchases = (
        _side()
        .withColumnRenamed("ts", "purchase_ts")
        .withWatermark("purchase_ts", watermark)
        .where(
            (F.col("event_type") == "purchase")
            & F.col("user_id").isNotNull()
        )
        .select(
            F.col("user_id").alias("p_user_id"),
            "purchase_ts",
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id"
            " AND purchase_ts > click_ts"
            f" AND purchase_ts <= click_ts + interval {attribution_window}"
        ),
        join_type,
    ).drop("p_user_id")
