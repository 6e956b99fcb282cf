"""Structured Streaming variant of the weekly mart.

The reference's operational loop is a daily cron that re-downloads and
recomputes everything (ref ``.github/workflows/daily-etl.yml:9-12``).
The streaming-native re-expression: a landing zone consumed by
``readStream`` with a Monday-anchored 7-day tumbling window aggregation
and a watermark for late data — each arriving file updates only the
affected (week, LA) groups instead of recomputing the world.

Window anchoring: ``window(ts, '7 days')`` aligns to the epoch (a
Thursday); ``startTime='96 hours'`` shifts the grid to Mondays so
``window.start`` coincides exactly with the batch mart's
``date_trunc('week', ts)`` buckets (W1 parity).

Scale notes: tumbling-window + watermark is incremental state the size
of the open windows (weeks × LAs), not the data; ``availableNow``
triggers give the daily-batch cadence the reference has, with exactly-
once file tracking replacing its 24 h cache heuristic (S2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

MONDAY_ANCHOR = "96 hours"  # epoch (Thu) + 96h = Monday grid


def weekly_stream(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "14 days",
    schema: StructType = EVENTS_STREAM_SCHEMA,
    deterministic_sum: bool = False,
) -> DataFrame:
    """Streaming weekly mart: per (Monday week, event_type) transaction
    count and mean value, tolerant of ``watermark`` of lateness.

    ``deterministic_sum`` computes the mean from half-up-rounded 1e-4
    integer units (the batch mart's ``_dsum`` rule) so the result is
    bit-identical regardless of micro-batch partitioning/combine order —
    required when the output is hash-compared against an oracle.
    NaN/±Inf values are excluded from the deterministic mean like NULLs
    (they cannot quantize to integer units; Spark's floor(double)
    silently saturates them to LONG while the oracle engine raises —
    r12 fuzz finding).
    """
    raw = spark.readStream.schema(schema).parquet(source_dir)
    if deterministic_sum:
        units = F.expr(
            "CASE WHEN NOT isnan(value)"
            " AND abs(value) < CAST('Infinity' AS DOUBLE)"
            " THEN CAST(floor(value * 10000.0 + 0.5) AS BIGINT) END"
        )
        mean = (
            F.sum(units).cast("double") / 10000.0 / F.count(units)
        ).alias("value_mean")
    else:
        mean = F.avg("value").alias("value_mean")
    return (
        raw.where(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "7 days", "7 days", MONDAY_ANCHOR).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("transactions"),
            mean,
        )
        .select(
            F.col("win.start").alias("week"),
            "event_type",
            "transactions",
            "value_mean",
        )
    )


def run_stream_once(
    stream_df: DataFrame,
    query_name: str = "weekly_stream",
    output_mode: str = "complete",
    checkpoint: str | None = None,
) -> DataFrame:
    """Drain all currently-available input (Trigger.AvailableNow — the
    daily-batch cadence) into an in-memory sink and return the result as
    a batch DataFrame.

    ``output_mode='append'`` + a ``checkpoint`` path is the session-window
    pattern: append only emits a window once the watermark passes its
    end, which for availableNow means on a LATER run — state carries
    across runs through the checkpoint, exactly like a daily relaunch.
    """
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def run_stream_to_parquet(
    stream_df: DataFrame, path: str, checkpoint: str
) -> None:
    """Drain available input into an append-only parquet sink.

    The durable variant of :func:`run_stream_once`: the file sink is
    fault-tolerant, so a LATER run with the same checkpoint resumes the
    stream's state — the pattern session windows need (append mode emits
    a session only once the watermark passes its end, i.e. typically on
    a subsequent daily run). The memory sink cannot recover a
    checkpoint; this one can.
    """
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def distinct_stream(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "14 days",
    schema: StructType = EVENTS_STREAM_SCHEMA,
    rsd: float = 0.02,
) -> DataFrame:
    """Streaming weekly distinct-user counts via the HLL++ sketch —
    ``approx_count_distinct`` is the ONLY distinct aggregate a streaming
    query can run (exact COUNT DISTINCT needs unbounded per-window
    member state; the sketch keeps 2^p registers per open window,
    independent of cardinality). The batch twin is
    ``sketches.mergeable_daily_distinct``; the driver gate joins this
    stream's drain against the exact batch distinct and asserts the
    HLL error envelope, exactly like the batch sketch gates.
    """
    raw = spark.readStream.schema(schema).parquet(source_dir)
    return (
        raw.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "7 days", "7 days", MONDAY_ANCHOR).alias("win"))
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .select(F.col("win.start").alias("week"), "approx_users")
    )
