"""Streaming-funnel scaling evidence: per-batch cost stays flat while
the batch operator's full-history recompute grows with history.

Fabricates B micro-batches of events (same deterministic generator
shape as tools/stress.py), lands them one at a time, and after each
landing:

- drains the incremental ``funnel_stream`` (availableNow + shared
  checkpoint ⇒ only the NEW file is processed, state carries over);
- re-runs the batch ``funnel_steps`` fold over the FULL history.

Prints one JSON line per batch with both wall times. The expected
shape: stream drain ~constant in batch size, batch fold linear in
cumulative rows — the operational argument for running the stream for
freshness and the batch fold only for backfill.

Usage: python tools/stress_stream.py [rows_per_batch] [n_batches]
       (default: 2_000_000 rows x 5 batches)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.funnel import funnel_steps
from uk_housing_dashboard_etl_spark.session import get_spark
from uk_housing_dashboard_etl_spark.streaming import funnel_stream

OUT = "/tmp/spark_graft_stress_stream"
STEPS = ["signup", "view", "click", "purchase"]


def fabricate_batch(spark, n_rows: int, n_users: int, batch: int, path: str):
    """Batch ``batch`` covers its own time slice (later batches are
    strictly later in time, the incremental funnel's contract)."""
    base_us = 1704067200_000000 + batch * 86400 * 1_000_000
    df = spark.range(batch * n_rows, (batch + 1) * n_rows).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(base_us) + (F.col("id") * 104729) % (86400 * 1_000_000)
        ).alias("ts"),
        (
            F.pow((F.col("id") * 2654435761 % 1000003) / 1000003.0, 2.0) * n_users
        ).cast("long").alias("user_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ["click", "view", "purchase", "signup", "error"]]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
        ((F.col("id") * 48271 % 99991) / 99991.0 * 490.0 + 0.01).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    df.coalesce(8).write.mode("append").parquet(path)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_users = max(1000, rows // 10)

    spark = get_spark(app_name="stress_stream")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT, ignore_errors=True)
    landing, ckpt, sink = f"{OUT}/landing", f"{OUT}/ckpt", f"{OUT}/sink"

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )

    for b in range(batches):
        fabricate_batch(spark, rows, n_users, b, landing)

        t0 = time.time()
        stream = spark.readStream.schema(schema).parquet(landing)
        q = (
            funnel_stream(stream, STEPS)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(sink)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t_stream = round(time.time() - t0, 2)

        t0 = time.time()
        funnel_steps(spark.read.parquet(landing), STEPS).count()
        t_batch = round(time.time() - t0, 2)

        print(
            json.dumps(
                {
                    "batch": b + 1,
                    "cumulative_rows": rows * (b + 1),
                    "stream_drain_s": t_stream,
                    "batch_fold_s": t_batch,
                }
            ),
            flush=True,
        )

    # cross-check: stream's final per-user stages reproduce the batch
    # funnel's reach counts over the full history
    from pyspark.sql import Window

    latest = (
        spark.read.parquet(sink)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user").orderBy(F.desc("stage"))
            ),
        )
        .where("rn = 1")
    )
    got = {
        r["stage"]: r["users"]
        for r in latest.groupBy("stage")
        .agg(F.count(F.lit(1)).alias("users"))
        .collect()
    }
    reach = {
        s: sum(v for k, v in got.items() if k >= s) for s in range(1, len(STEPS) + 1)
    }
    want = {
        r["step"]: r["users"]
        for r in funnel_steps(spark.read.parquet(landing), STEPS).collect()
    }
    ok = reach == want
    print(json.dumps({"parity": ok, "stream_reach": reach, "batch_reach": want}))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
