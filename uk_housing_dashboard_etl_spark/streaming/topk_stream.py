"""Streaming Misra-Gries heavy-hitter maintenance: the live twin of
``sketches.mg_heavy_hitters``.

MG is a one-pass streaming algorithm by construction — a capacity-k
counter summary folded sequentially over the stream — so the streaming
form is the NATURAL one: per-shard counters live in
``applyInPandasWithState`` state (≤ k entries per shard, O(k · shards)
total — independent of the key cardinality, which is the whole point
for trending-key dashboards over heavy-tailed streams), and every
micro-batch folds in incrementally. Batch boundaries are invisible to
the algorithm: state persistence makes the multi-batch fold identical
to the single-pass fold, so the classical guarantee holds over the
WHOLE drained stream — every key with global frequency > N_shard/k
survives its shard's summary.

Sharding: keys are routed by ``pmod(xxhash64(key), n_shards)``, so ALL
occurrences of a key land in one shard and the per-shard bound
N_shard/k is TIGHTER than the global N/k — sharding strengthens the
superset guarantee while parallelizing the state updates (the classic
single-summary MG would serialize the entire stream through one
state partition).

The driver gate (``streaming_mg_topk``) drains the stream with
AvailableNow, takes each shard's LATEST candidate set, exact-counts
the bounded candidate union in one batch pass, and filters to the
> N/k survivors — which must equal the exact batch GROUP BY/HAVING
heavy-hitter set, the same oracle as ``mg_heavy_hitters``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MG_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("batch_seq", LongType()),
    ]
)

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("key", StringType()),
        StructField("batch_seq", LongType()),
    ]
)


def _make_mg_fold(k: int):
    """Per-shard MG fold: resume counters from state, fold the batch's
    keys, emit the post-fold candidate set stamped with a batch
    sequence (the drain keeps each shard's max-seq rows)."""

    def _fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts, seq = state.get
            counters = dict(zip(list(keys), list(counts)))
        else:
            counters, seq = {}, 0
        seq += 1
        for pdf in pdfs:
            for v in pdf["key"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [c for c in counters if counters[c] == 1]
                    for c in counters:
                        counters[c] -= 1
                    for c in dead:
                        del counters[c]
        state.update(
            (list(counters.keys()), list(counters.values()), seq)
        )
        yield pd.DataFrame(
            {
                "shard": key[0],
                "key": list(counters.keys()),
                "batch_seq": seq,
            }
        )

    return _fold


def mg_candidate_stream(
    spark: SparkSession,
    source_dir: str,
    key_expr: str,
    schema: StructType,
    k: int = 60,
    n_shards: int = 8,
) -> DataFrame:
    """Streaming MG candidate maintenance over a parquet-landing stream:
    (shard, key, batch_seq) rows — each shard's ≤ k live candidates
    after every micro-batch. ``key_expr`` is a SQL expression producing
    the (string-castable) tracked key from the raw rows."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    keyed = raw.select(
        F.expr(key_expr).cast("string").alias("key")
    ).where(F.col("key").isNotNull())
    sharded = keyed.withColumn(
        "shard", F.pmod(F.xxhash64("key"), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _make_mg_fold(k),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
