"""Per-round benchmark: the FULL query registry at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is timed as a full action (``df.count()`` after the plan is
built) on a fresh DataFrame — no caching between queries, so every number
includes scan + shuffle + compute. Each query runs twice and reports the
best: the first run pays one-time JVM/codegen warmup that a long-running
cluster amortizes, the second is the engine's steady-state throughput.
(Streaming queries execute their drain inside the builder, so their
time covers the whole readStream→sink pass, run once — a second drain
would replay identical state transitions at the same cost.)

If any query fails, ``complete`` is false and ``value`` is null: a suite
total over a shrunken query set must never be compared against a full
run as if it were a speedup. Per-query times and the failure reasons are
still attached.
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
    extra = [q for q in contract.QUERIES if q not in HEADLINE]
    for name in HEADLINE + extra:
        fn = contract.QUERIES[name]
        # streaming builders run their drain eagerly; timing a repeat
        # would re-execute the same stateful pass for no extra signal
        runs = 1 if name.startswith("streaming_") else 2
        best = float("inf")
        # per-query isolation: one broken query must never zero the bench
        try:
            for _ in range(runs):
                t0 = time.time()
                fn(spark, SF_DIR).count()
                best = min(best, time.time() - t0)
            times[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"[:500]

    complete = not failures
    payload = {
        "metric": "full-registry suite wall time",
        "value": round(sum(times.values()), 3) if complete else None,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_queries": len(times),
        "complete": complete,
        # the reference-parity chain alone (BASELINE.md's surface), so the
        # suite total growing with registry coverage never reads as a
        # regression against the reference's envelope
        "headline_sec": round(
            sum(times[q] for q in HEADLINE if q in times), 3
        ),
    }
    if failures:
        payload["failures"] = failures
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
