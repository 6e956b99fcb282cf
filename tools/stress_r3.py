"""Scaling evidence for the round-3 session operators.

Reuses the fabricators from stress.py (Zipf-skewed events) and
stress_docs.py (corpora with planted dups): times the span-coverage,
chunker, snapshot-diff, incremental-index dedup, event-hygiene,
sequence, skew-diagnostic, SCD2, and resampling operators at sizes the
per-round bench (sf0.1) never reaches. Prints one JSON line per scale.

Usage: python tools/stress_r3.py [n_docs n_events ...]  (default 1M 20M)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.stress import fabricate as fabricate_events
from tools.stress_docs import fabricate_docs
from uk_housing_dashboard_etl_spark.operators.behavior import (
    basket_lift,
    cap_events_per_key,
    debounce_events,
    interarrival_stats,
    top_paths,
    user_sequences,
)
from uk_housing_dashboard_etl_spark.operators.curation import snapshot_diff
from uk_housing_dashboard_etl_spark.operators.dedup import (
    build_dedup_index,
    dedup_against_index,
    dup_span_stats,
)
from uk_housing_dashboard_etl_spark.operators.incremental import scd2_history
from uk_housing_dashboard_etl_spark.operators.stats import (
    heavy_hitters,
    key_skew_summary,
)
from uk_housing_dashboard_etl_spark.operators.text_analysis import (
    chunk_documents,
)
from uk_housing_dashboard_etl_spark.session import get_spark

OUT = "/tmp/spark_graft_stress_r3"


def timed(fn) -> tuple[float, int]:
    """Time with FULL materialization: a bare count() lets Catalyst
    prune every column the row count doesn't need (window flags, md5s,
    join-side projections), silently timing a fraction of the operator.
    Hashing every output column into one aggregate forces it all."""
    t = time.time()
    df = fn()
    row = (
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x"))
        .collect()[0]
    )
    return round(time.time() - t, 1), row["n"]


def main() -> None:
    sizes = [
        (int(a), int(b))
        for a, b in zip(sys.argv[1::2], sys.argv[2::2])
    ] or [(1_000_000, 20_000_000)]
    spark = get_spark(app_name="stress-r3")
    spark.sparkContext.setLogLevel("ERROR")
    for n_docs, n_events in sizes:
        dpath, epath = f"{OUT}/docs_{n_docs}", f"{OUT}/events_{n_events}"
        fabricate_docs(spark, n_docs, dpath)
        fabricate_events(spark, n_events, 200_000, epath)
        docs = spark.read.parquet(dpath)
        events = spark.read.parquet(epath)
        r: dict[str, object] = {"n_docs": n_docs, "n_events": n_events}

        r["dup_span_stats_s"], _ = timed(lambda: dup_span_stats(docs, k=5))
        r["doc_chunks_s"], r["n_chunks"] = timed(
            lambda: chunk_documents(docs)
        )
        old = docs.where(F.col("doc_id") % 4 != 3)
        new = docs.where(F.col("doc_id") % 4 != 0)
        r["snapshot_diff_s"], _ = timed(lambda: snapshot_diff(old, new))

        index_docs = docs.where(F.col("doc_id") % 2 == 0)
        batch = docs.where(F.col("doc_id") % 100 == 1).localCheckpoint()
        hashes, bands = build_dedup_index(index_docs)
        r["incremental_dedup_s"], r["batch_rows"] = timed(
            lambda: dedup_against_index(batch, hashes, bands)
        )

        r["debounce_s"], _ = timed(lambda: debounce_events(events))
        r["cap_events_s"], _ = timed(lambda: cap_events_per_key(events))
        r["user_sequences_s"], _ = timed(
            lambda: user_sequences(events, max_len=32)
        )
        r["scd2_s"], r["scd2_rows"] = timed(lambda: scd2_history(events))
        r["heavy_hitters_s"], _ = timed(
            lambda: heavy_hitters(events, ["user_id"])
        )
        r["key_skew_s"], _ = timed(
            lambda: key_skew_summary(events, ["user_id"])
        )

        # round-4 behavioral family at the same Zipf-skewed 20M events
        r["interarrival_s"], r["interarrival_keys"] = timed(
            lambda: interarrival_stats(events)
        )
        r["basket_lift_s"], r["basket_pairs"] = timed(
            lambda: basket_lift(events)
        )
        r["top_paths_s"], _ = timed(lambda: top_paths(events))
        print(json.dumps(r), flush=True)
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
