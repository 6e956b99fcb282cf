"""Streaming conversion funnel: per-user journey state across batches.

The batch operator (``operators.funnel.funnel_steps``) folds each user's
full event history per run; the streaming twin keeps (stage, last_ts) in
``applyInPandasWithState`` and advances it incrementally as micro-batches
arrive — O(users) state, no reprocessing, same strict
timestamp-ordering semantics (an event only advances the funnel if it is
the next step's type AND strictly later than the timestamp that
satisfied the previous step).

Caveat shared with any incremental funnel: events must arrive per-user
in non-decreasing ts order across batches for exact batch parity (within
a batch they are sorted); out-of-order cross-batch arrivals can only be
reconciled by a batch backfill, which is why the batch operator exists.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("stage", IntegerType()),
        StructField("last_us", LongType()),  # µs epoch of the satisfying event
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user", LongType()),
        StructField("stage", IntegerType()),
        StructField("reached_at", TimestampType()),
    ]
)


def _make_advance(steps: list[str]):
    n = len(steps)

    def _advance(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        stage, last_us = state.get if state.exists else (0, 0)
        last_ts = pd.Timestamp(last_us, unit="us") if stage > 0 else None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, etype in zip(pdf["ts"], pdf["etype"]):
                if (
                    stage < n
                    and etype == steps[stage]
                    and (stage == 0 or ts > last_ts)
                ):
                    stage += 1
                    last_ts = ts
        if stage > 0:
            state.update((stage, int(last_ts.value // 1000)))
            yield pd.DataFrame(
                {
                    "user": [key[0]],
                    "stage": [stage],
                    "reached_at": [last_ts],
                }
            )

    return _advance


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel stage over a streaming DataFrame — emits the
    user's current (stage, reached_at) after every batch that contains
    events for them. Downstream a plain batch ``groupBy(stage)`` on the
    sink table yields the funnel counts."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).where(F.col("etype").isin(steps))
    return keyed.groupBy("user").applyInPandasWithState(
        _make_advance(steps),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
