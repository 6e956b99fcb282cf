"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is timed as a full action (``df.count()`` after the plan is
built) on a fresh DataFrame — no caching between queries, so every number
includes scan + shuffle + compute. Each query runs twice and reports the
best: the first run pays one-time JVM/codegen warmup that a long-running
cluster amortizes, the second is the engine's steady-state throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from uk_housing_dashboard_etl_spark import contract  # noqa: E402
from uk_housing_dashboard_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "weekly_by_la",
    "type_breakdown",
    "rolling_windows",
    "anomalies",
    "latest_snapshot",
]


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None

    # warm the JVM + parquet footers with one cheap action
    try:
        contract.QUERIES["coverage_report"](spark, SF_DIR).count()
    except Exception:  # noqa: BLE001 — warmup failure must not kill the bench
        pass

    times: dict[str, float] = {}
    failures: dict[str, str] = {}
    extra = [q for q in contract.BENCH_EXTRA if q in contract.QUERIES]
    for name in HEADLINE + extra:
        fn = contract.QUERIES[name]
        best = float("inf")
        # per-query isolation: one broken query must never zero the bench
        try:
            for _ in range(2):
                t0 = time.time()
                fn(spark, SF_DIR).count()
                best = min(best, time.time() - t0)
            times[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"[:500]

    total = round(sum(times.values()), 3)
    payload = {
        "metric": "headline-suite wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if failures:
        payload["failures"] = failures
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
