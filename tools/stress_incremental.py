"""Quantify incremental mart maintenance vs full recompute.

Fabricates a two-year week-partitioned zone, seeds the mart, then
times one daily tick (a 1-2 week increment) done (a) incrementally via
``operators.incremental.daily_increment`` and (b) as the reference
does it — full-history recompute. Prints one JSON line.

Usage: python tools/stress_incremental.py [n_history_rows] [n_increment_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.incremental import (
    daily_increment,
)
from uk_housing_dashboard_etl_spark.operators.weekly import weekly_mart
from uk_housing_dashboard_etl_spark.session import get_spark


def fabricate(spark, n: int, day_offset_expr: str):
    """Enriched-shape rows: 2-year span (or a fixed day), 400 LAs."""
    return spark.range(n).select(
        F.concat(F.lit("t"), F.col("id")).alias("transaction_id"),
        F.expr(
            f"timestamp '2023-01-02 00:00:00' + make_interval(0, 0, 0, {day_offset_expr}, 0, 0, 0)"
        ).alias("date"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 1_000_000 / 100.0).alias("price"),
        F.concat(
            F.lit("LA"), (F.abs(F.xxhash64("id", F.lit(2))) % 400)
        ).alias("local_authority"),
    )


def main() -> None:
    n_hist = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_inc = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark(app_name="stress-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="graft_inc_")
    zone, mart = base + "/zone", base + "/mart"

    # two years of history, then one "new day" whose rows fall in the
    # last ~10 days (touching at most 2 Monday weeks)
    history = fabricate(spark, n_hist, "CAST(abs(xxhash64(id, 3)) % 728 AS INT)")
    increment = fabricate(
        spark, n_inc, "CAST(718 + abs(xxhash64(id, 4)) % 10 AS INT)"
    )

    t0 = time.time()
    daily_increment(spark, history, zone, mart)
    seed_s = round(time.time() - t0, 2)

    t0 = time.time()
    inc_mart = daily_increment(spark, increment, zone, mart)
    inc_s = round(time.time() - t0, 2)
    inc_rows = inc_mart.count()

    t0 = time.time()
    full = weekly_mart(
        spark.read.parquet(zone).drop("week_key")
    )
    full_rows = full.count()
    full_s = round(time.time() - t0, 2)

    assert inc_rows == full_rows, (inc_rows, full_rows)
    print(
        json.dumps(
            {
                "history_rows": n_hist,
                "increment_rows": n_inc,
                "seed_sec": seed_s,
                "incremental_tick_sec": inc_s,
                "full_recompute_sec": full_s,
                "speedup": round(full_s / inc_s, 1) if inc_s else None,
                "mart_rows": inc_rows,
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
