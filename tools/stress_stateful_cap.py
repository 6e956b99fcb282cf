"""Measured evidence for the stateful anomaly fold's memory bound
(r11 verdict item 4, landed r12 as `stateful.GROUP_BATCH_MAX_ROWS`).

Two phases over a fabricated 1M-row / 5-key landing (the worst-case
keyspace the verdict named — the default `event_type` key has ~5
values, so one catch-up AvailableNow batch puts ~200k rows of one key
in a single pandas frame):

1. **default cap** — the drain must complete, and the per-key frame
   (~200k rows) is measured against the 20M-row default to show the
   headroom factor (~100x) a real catch-up batch has before the guard
   fires.
2. **low cap (50k)** — the same drain must FAIL FAST with the
   documented remediation message, proving the guard surfaces through
   the real applyInPandasWithState path (not just the unit test's
   direct `_score_group` call) and names maxFilesPerTrigger as the
   operator's lever. The cap is wired through the
   ``SPARK_GRAFT_STATEFUL_GROUP_MAX_ROWS`` env var because that IS the
   production interface: the fold executes on Python WORKERS, which
   re-import the module fresh — a driver-side module attribute never
   reaches them (this script's first draft proved that the hard way),
   so phase 2 re-execs itself with the env var set.

Prints one JSON line per phase.

Usage: PYTHONPATH=/root/repo python tools/stress_stateful_cap.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.session import get_spark
from uk_housing_dashboard_etl_spark.streaming import stateful
from uk_housing_dashboard_etl_spark.streaming.stateful import (
    streaming_anomaly_scores,
)

OUT = "/tmp/spark_graft_stress_statecap"
N_KEYS = 5


def fabricate(spark, n: int, path: str) -> None:
    """n events over 5 keys, deterministic values/timestamps — all
    synthesized JVM-side."""
    spark.range(n).select(
        F.col("id").alias("event_id"),
        F.expr(
            "CAST('2024-01-01 00:00:00' AS TIMESTAMP)"
            " + make_interval(0, 0, 0, 0, 0, 0, id % 86400)"
        ).alias("ts"),
        (F.col("id") % 1000).alias("user_id"),
        F.concat(F.lit("k"), (F.col("id") % N_KEYS)).alias("event_type"),
        (F.col("id") % 997).cast("double").alias("value"),
        F.lit("").alias("props"),
    ).write.mode("overwrite").parquet(path)


def drain(spark, path: str):
    raw = spark.readStream.schema(
        spark.read.parquet(path).schema
    ).parquet(path)
    scored = streaming_anomaly_scores(raw)
    name = f"cap_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0]["n"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="stress-statecap")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(N_KEYS))
    path = f"{OUT}/events_{n}"
    fabricate(spark, n, path)
    per_key = n // N_KEYS

    if os.environ.get("SPARK_GRAFT_STATECAP_PHASE2"):
        # re-exec'd with SPARK_GRAFT_STATEFUL_GROUP_MAX_ROWS=50000 in
        # the environment, which the local-mode Python workers inherit
        try:
            drain(spark, path)
            outcome = "FAILED TO RAISE — guard did not fire"
        except Exception as e:  # noqa: BLE001 — asserting on the message
            msg = str(e)
            fired = "maxFilesPerTrigger" in msg and "50000" in msg
            outcome = (
                "guard fired with remediation message"
                if fired
                else f"raised WITHOUT the documented message: {msg[:300]}"
            )
        print(
            json.dumps(
                {
                    "phase": "low_cap_50k",
                    "rows_per_key_per_batch": per_key,
                    "cap": stateful.GROUP_BATCH_MAX_ROWS,
                    "outcome": outcome,
                }
            )
        )
        return

    t0 = time.time()
    rows = drain(spark, path)
    sec = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "phase": "default_cap",
                "n_rows": n,
                "n_keys": N_KEYS,
                "rows_per_key_per_batch": per_key,
                "cap": stateful.GROUP_BATCH_MAX_ROWS,
                "headroom_factor": round(
                    stateful.GROUP_BATCH_MAX_ROWS / per_key, 1
                ),
                "drained_rows": rows,
                "sec": sec,
                "rows_per_sec": int(n / sec),
            }
        )
    )

    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_STATEFUL_GROUP_MAX_ROWS"] = "50000"
    env["SPARK_GRAFT_STATECAP_PHASE2"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(n)],
        env=env,
        capture_output=True,
        text=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            print(line)


if __name__ == "__main__":
    main()
