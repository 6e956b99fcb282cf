"""Streaming per-key daily rate cap: the incremental twin of
``operators.behavior.cap_events_per_key``.

The batch operator re-ranks every (key, day) partition per run; the
streaming twin keeps ONE counter per (key, day) in
``applyInPandasWithState`` and assigns ``day_seq``/``kept`` as events
arrive — O(active key-days) state, each micro-batch touches only the
key-days present in it. Within a batch events are sorted by
(ts, event_id); exact batch parity therefore needs per-key
non-decreasing arrival ACROSS batches (the same caveat as
``funnel_stream``, and the same reason the batch operator exists for
backfills). A single AvailableNow drain sees one sorted batch, so its
output equals the batch operator row-for-row — that equality is the
driver oracle gate.

State lifecycle: a (key, day) counter is dead once the watermark passes
the day; production deployments set a timeout to reap it
(state size = active key-days, not history).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DateType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType([StructField("n_seen", IntegerType())])

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("day", DateType()),
        StructField("day_seq", IntegerType()),
        StructField("kept", BooleanType()),
    ]
)


def _make_cap(max_per_day: int):
    def _cap(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, ts in zip(pdf["event_id"], pdf["ts"]):
                n += 1
                out.append((int(eid), ts, n, n <= max_per_day))
        state.update((n,))
        if out:
            yield pd.DataFrame(
                {
                    "event_id": [r[0] for r in out],
                    "user_id": [key[0]] * len(out),
                    "ts": [r[1] for r in out],
                    "day": [key[1]] * len(out),
                    "day_seq": [r[2] for r in out],
                    "kept": [r[3] for r in out],
                }
            )

    return _cap


def rate_cap_stream(
    events: DataFrame,
    max_per_day: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Streaming daily rate cap over a streaming DataFrame — emits every
    event with its within-(key, day) sequence number and keep flag."""
    from pyspark.sql import functions as F

    keyed = events.where(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(tie_col).alias("event_id"),
        F.col(key_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.to_date(ts_col).alias("day"),
    )
    return keyed.groupBy("user_id", "day").applyInPandasWithState(
        _make_cap(max_per_day),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
