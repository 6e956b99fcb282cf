"""Stateful streaming CDC replay: MERGE-INTO semantics as a live stream.

The batch operator (``incremental.apply_cdc``) compacts a finished
change log; this is its incremental twin — per-key state holds ONLY the
current winning change (sequence position, tombstone flag, payload), so
applying a day's CDC feed touches the keys in that feed instead of
re-windowing the full history. State is O(live keys), independent of
change-log length — the property that matters when the log is years
deep but the daily delta is thin.

Each micro-batch emits the affected keys' new current state (including
tombstones, flagged); the latest emission per key IS the table state,
and after a full drain it equals the batch ``apply_cdc`` exactly —
driver-gated hash-exact against the same oracle family.

``applyInPandasWithState`` is the sanctioned custom-stateful surface
(same as the anomaly/funnel/rate-cap operators): evolving cross-batch
per-key state with win-by-sequence logic isn't expressible with the
built-in streaming aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from uk_housing_dashboard_etl_spark.streaming.weekly_stream import (
    EVENTS_STREAM_SCHEMA,
)

CDC_STATE_SCHEMA = StructType(
    [
        StructField("seq_us", LongType()),
        StructField("seq_tie", LongType()),
        StructField("deleted", BooleanType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

CDC_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("deleted", BooleanType()),
    ]
)


def _replay_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Keep the (ts, event_id)-max change per key across batches; emit
    the key's current state once per batch it appears in."""
    if state.exists:
        seq_us, seq_tie, deleted, etype, value = state.get
    else:
        seq_us, seq_tie, deleted, etype, value = -1, -1, False, None, None
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            us = int(r.ts.value // 1000)  # pandas ns -> µs
            tie = int(r.event_id)
            if (us, tie) > (seq_us, seq_tie):
                seq_us, seq_tie = us, tie
                deleted = r.event_type == "error"
                etype = r.event_type
                value = None if pd.isna(r.value) else float(r.value)
    state.update((seq_us, seq_tie, deleted, etype, value))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_id": [seq_tie],
            "ts": [pd.Timestamp(seq_us * 1000)],
            "event_type": [etype],
            "value": [value],
            "deleted": [deleted],
        }
    )


def cdc_replay_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """Current-state-per-affected-key stream over the event CDC feed
    ('error' = tombstone, everything else = upsert). Downstream, take
    the latest emission per key and drop tombstones to materialize the
    table — after an AvailableNow drain that equals batch
    ``apply_cdc`` bit-for-bit."""
    raw = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(source_dir)
    changes = raw.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select("user_id", "event_id", "ts", "event_type", "value")
    return changes.groupBy("user_id").applyInPandasWithState(
        _replay_group,
        outputStructType=CDC_OUTPUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
