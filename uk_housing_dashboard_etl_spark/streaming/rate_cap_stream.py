"""Streaming per-key daily rate cap: the incremental twin of
``operators.behavior.cap_events_per_key``.

The batch operator re-ranks every (key, day) partition per run; the
streaming twin keeps (current_day, count_today) in
``applyInPandasWithState`` and assigns ``day_seq``/``kept`` as events
arrive. State is keyed by the USER alone — keying by (user, day) would
multiply the per-group Python round-trip by the day count (measured
17.3 s → 2.4 s at sf0.1 for the drain), and a single (epoch_day, count)
pair is sufficient because events are processed in timestamp order per
key, so day transitions are monotone. The per-group work itself is
vectorized (``groupby(day).cumcount()``), no Python row loop.

Within a batch events are sorted by (ts, event_id); exact batch parity
therefore needs per-key non-decreasing arrival ACROSS batches (the same
caveat as ``funnel_stream``, and the same reason the batch operator
exists for backfills). A single AvailableNow drain sees one sorted
batch, so its output equals the batch operator row-for-row — that
equality is the driver oracle gate.

State lifecycle: one (epoch_day, count) pair per active key —
O(active keys), independent of history; production deployments add a
timeout to reap keys idle past the watermark.
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

STATE_SCHEMA = StructType(
    [
        StructField("epoch_day", LongType()),
        StructField("n_today", IntegerType()),
    ]
)

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
        last_day, n_today = state.get if state.exists else (-1, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        days = pdf["ts"].dt.floor("D")
        epoch_days = (days.astype("int64") // 86_400_000_000_000).to_numpy()
        seq = pdf.groupby(epoch_days).cumcount().to_numpy() + 1
        # carry the stored count into the first day if it continues
        if len(epoch_days) and epoch_days[0] == last_day:
            seq = seq + (epoch_days == last_day) * n_today
        state.update((int(epoch_days[-1]), int(seq[epoch_days == epoch_days[-1]].max())))
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": key[0],
                "ts": pdf["ts"].to_numpy(),
                "day": days.dt.date.to_numpy(),
                "day_seq": seq.astype("int32"),
                "kept": seq <= max_per_day,
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
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_cap(max_per_day),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
