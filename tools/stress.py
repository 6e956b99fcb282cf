"""Scaling-evidence harness: run the core pipeline far beyond sf0.1.

Fabricates an events table of N rows with ``spark.range`` (pure
executor-side generation — nothing touches the read-only testdata),
writes it as parquet (so scans, pushdown, and shuffles are real), and
times the full reference pipeline plus sessionization at increasing
sizes. Prints one JSON line per size with rows/sec so the scaling slope
is visible.

Usage: python tools/stress.py [rows ...]   (default: 2M 20M)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators import (
    densify_weekly_grid,
    detect_anomalies,
    enrich_with_lookup,
    rolling_windows,
    standardize_transactions,
    weekly_mart,
)
from uk_housing_dashboard_etl_spark.operators.funnel import (
    funnel_steps,
    weekly_retention,
)
from uk_housing_dashboard_etl_spark.operators.sessionize import session_stats
from uk_housing_dashboard_etl_spark.session import get_spark

OUT = "/tmp/spark_graft_stress"


def fabricate(spark, n_rows: int, n_users: int, path: str) -> None:
    """Deterministic synthetic events: 2 years of data, Zipf-ish user
    skew (user 0 gets ~100x the traffic via a squared transform)."""
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1704067200_000000)  # 2024-01-01
                + (F.col("id") * 104729) % (730 * 86400 * 1_000_000)
            ).alias("ts"),
            (
                F.pow((F.col("id") * 2654435761 % 1000003) / 1000003.0, 2.0)
                * n_users
            ).cast("long").alias("user_id"),
            F.element_at(
                F.array(*[F.lit(x) for x in ["click", "view", "purchase", "signup", "error"]]),
                (F.col("id") % 5 + 1).cast("int"),
            ).alias("event_type"),
            ((F.col("id") * 48271 % 99991) / 99991.0 * 490.0 + 0.01).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        )
    )
    df.write.mode("overwrite").parquet(path)


def run_suite(spark, path: str) -> dict[str, float]:
    ev = spark.read.parquet(path)
    raw = ev.select(
        F.col("event_id").alias("transaction_unique_id"),
        F.col("ts").alias("date_of_transfer"),
        F.col("value").alias("price"),
        F.col("user_id").alias("postcode"),
        F.col("event_type").alias("property_type"),
    )
    lookup = (
        spark.range(0, 100000)
        .select(
            F.col("id").cast("string").alias("key"),
            F.concat(F.lit("LA_"), (F.col("id") % 400).cast("string")).alias(
                "local_authority"
            ),
        )
    )
    times: dict[str, float] = {}

    t0 = time.time()
    enriched = enrich_with_lookup(standardize_transactions(raw), lookup)
    weekly = weekly_mart(enriched)
    weekly.count()
    times["weekly_mart"] = round(time.time() - t0, 2)

    t0 = time.time()
    anomalies = detect_anomalies(rolling_windows(densify_weekly_grid(weekly)))
    anomalies.count()
    times["densify_rolling_anomalies"] = round(time.time() - t0, 2)

    t0 = time.time()
    session_stats(ev, tie_cols=["event_id"]).count()
    times["sessionize"] = round(time.time() - t0, 2)

    t0 = time.time()
    funnel_steps(ev, ["signup", "view", "click", "purchase"]).count()
    times["funnel"] = round(time.time() - t0, 2)

    t0 = time.time()
    weekly_retention(ev).count()
    times["retention"] = round(time.time() - t0, 2)
    return times


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [2_000_000, 20_000_000]
    spark = get_spark(app_name="stress")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        path = f"{OUT}/events_{n}"
        fabricate(spark, n, n_users=max(1000, n // 100), path=path)
        times = run_suite(spark, path)
        total = round(sum(times.values()), 2)
        print(
            json.dumps(
                {
                    "rows": n,
                    "total_sec": total,
                    "rows_per_sec": int(n * len(times) / total),
                    "stages": times,
                }
            )
        )
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
