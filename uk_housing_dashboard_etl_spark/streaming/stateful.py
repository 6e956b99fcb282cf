"""Custom stateful streaming operator: running per-key anomaly scores.

The reference computes z-scores over the full history every day (ref
``etl/etl_main.py:260-282``). The streaming-native equivalent keeps
per-LA Welford accumulators (count, mean, M2) in state and scores each
arriving micro-batch against the statistics *so far* — O(keys) state,
no reprocessing.

This is the one operator family where Spark's built-ins genuinely can't
express the semantics (evolving cross-batch state with custom math), so
it uses ``applyInPandasWithState`` — Arrow-batched per-group pandas,
state round-trips as a plain tuple.
"""

from __future__ import annotations

import logging
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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

_LOG = logging.getLogger(__name__)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)

# Establishing the total (ts, event_id) fold order materializes ONE
# GROUP's ENTIRE MICRO-BATCH as a single pandas frame — O(rows-per-key-
# per-batch) executor memory, and with a low-cardinality key (the
# default event_type has ~5 values) a catch-up batch puts a key's whole
# backlog in one frame. Guard it like the quadratic baselines
# (similarity.NEAR_DUP_QUADRATIC_MAX_ROWS): fail fast past the cap with
# remediation guidance instead of OOMing an executor. 20M rows of
# (key, id, ts, value) is ~1 GB of pandas — comfortable on a production
# executor, far above any bounded-trigger micro-batch.
GROUP_BATCH_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_STATEFUL_GROUP_MAX_ROWS", 20_000_000)
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("is_anomaly", BooleanType()),
        StructField("n_seen", LongType()),
    ]
)


def _score_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Welford update + score. Each value is scored against the stats of
    all PRIOR values (so the first observation of a key is never
    anomalous), then folded into the state.

    DETERMINISTIC fold order (r10 verdict item 3): the group's chunks
    are concatenated and sorted by ``(ts, event_id)`` — not per-chunk by
    ``ts`` alone, which (a) left same-``ts`` rows in shuffle-dependent
    order and (b) broke the global sort whenever Arrow split one group
    across chunks. With a total order per batch, a single-batch drain is
    row-for-row equal to the batch prefix z-score window
    (``contract.q_streaming_anomaly_check``), which is what makes the
    drain oracle-gateable.

    NULL ``event_id`` rows are OUT OF CONTRACT for the equality (the
    same boundary as snapshot_diff's NULL ids): pandas sorts a NULL id
    last within its timestamp while Spark's ``orderBy`` puts nulls
    first, so a tie between a NULL-id and a real-id row at the same
    ``ts`` folds in a different order on the two sides. event_id is the
    source's primary key — callers feeding synthetic streams must
    supply non-null ids (or pre-assign surrogates) for score parity.

    MEMORY BOUND: the total order requires the group's micro-batch in
    one frame, so the accumulation is capped at ``GROUP_BATCH_MAX_ROWS``
    and raises with remediation guidance rather than OOMing — bound the
    trigger (smaller ``maxFilesPerTrigger``/``maxBytesPerTrigger``) or
    stream on a higher-cardinality key."""
    import math

    if state.exists:
        n, mean, m2 = state.get
    else:
        n, mean, m2 = 0, 0.0, 0.0
    chunks, total, warned = [], 0, False
    for c in pdfs:
        if not len(c):
            continue
        total += len(c)
        if not warned and total * 2 > GROUP_BATCH_MAX_ROWS:
            # advance signal at 50% of the cap (r12 advice item 5): a
            # catch-up backlog grows across batches, so operators get a
            # logged warning one regime before the hard failure
            warned = True
            _LOG.warning(
                "streaming_anomaly_scores: key %r is past 50%% of "
                "GROUP_BATCH_MAX_ROWS (%d of %d rows in one micro-batch)"
                " — bound the trigger before the cap hard-fails",
                key[0], total, GROUP_BATCH_MAX_ROWS,
            )
        if total > GROUP_BATCH_MAX_ROWS:
            raise ValueError(
                f"streaming_anomaly_scores: key {key[0]!r} has more than "
                f"{GROUP_BATCH_MAX_ROWS} rows in one micro-batch; the "
                "deterministic (ts, event_id) fold must hold a key's "
                "whole micro-batch in memory. Bound the trigger (smaller "
                "maxFilesPerTrigger / maxBytesPerTrigger), stream on a "
                "higher-cardinality key, or raise "
                "SPARK_GRAFT_STATEFUL_GROUP_MAX_ROWS."
            )
        chunks.append(c)
    if not chunks:
        return
    pdf = pd.concat(chunks).sort_values(["ts", "event_id"], kind="mergesort")
    out_z, out_flag, out_n = [], [], []
    for v in pdf["value"]:
        # a NULL/NaN/±Inf value must NOT fold into the accumulators —
        # one such event would set mean/m2 to NaN/Inf and poison the
        # key's state for every future batch (r10 sweep caught
        # NULL/NaN; the r12 fuzz caught ±Inf doing the same through
        # the Welford delta). It scores as unknown (NULL z, NULL
        # flag) and n_seen stays put.
        if v is None or (
            isinstance(v, float) and (math.isnan(v) or math.isinf(v))
        ):
            out_z.append(None)
            out_flag.append(None)
            out_n.append(n)
            continue
        v = float(v)
        if n >= 2:
            var = m2 / (n - 1)  # ddof=1, matching the batch operator
            std = math.sqrt(var)
            z = (v - mean) / std if std > 0 else 0.0
        else:
            z = 0.0
        out_z.append(z)
        out_flag.append(abs(z) > 3.0)
        n += 1
        delta = v - mean
        mean += delta / n
        m2 += delta * (v - mean)
        out_n.append(n)
    yield pd.DataFrame(
        {
            "key": key[0],
            "event_id": pdf["event_id"],
            "ts": pdf["ts"],
            "value": pdf["value"],
            "zscore": out_z,
            "is_anomaly": out_flag,
            "n_seen": out_n,
        }
    )
    state.update((n, mean, m2))


def streaming_anomaly_scores(
    events: DataFrame, key_col: str = "event_type", id_col: str = "event_id"
) -> DataFrame:
    """Score a stream of (key, id, ts, value) rows against evolving
    per-key statistics. ``events`` must be a streaming DataFrame;
    ``id_col`` breaks ``ts`` ties so the fold order — and therefore
    every score — is deterministic."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("event_id"),
        "ts",
        "value",
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _score_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
