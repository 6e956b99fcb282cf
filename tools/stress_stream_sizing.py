"""Reproduce the r11 state-store sizing measurements (SCALE.md §7).

Runs a chosen set of contract streaming drains at sf0.1 under forced
shuffle-partition settings (best-of-N per setting, warm machinery) and
prints the measured matrix next to what ``_sized_state_partitions``
would pick from the measured group count — so the two-regime rule
(python-stateful: one partition per group up to the default; JVM
stateful: ~25k state keys per shard, floor 4, clamp to the session
default) stays auditable against live numbers instead of a committed
table.

Usage:
    python tools/stress_stream_sizing.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time
from contextlib import contextmanager
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# drain -> (state-key exprs on its landing table, table, python_stateful)
DRAINS = {
    "streaming_rate_cap": (("user_id",), "events", True),
    "streaming_anomaly": (("event_type",), "events", True),
    "streaming_sessions": (("user_id",), "events", False),
    "streaming_weekly": (("date_trunc('week', ts)", "event_type"), "events", False),
    "streaming_dedup": (("text",), "documents", False),
    "streaming_joined_agg": (("user_id",), "events", False),
}

SETTINGS = (4, 8, 16, 32)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import uk_housing_dashboard_etl_spark.contract as contract
    from uk_housing_dashboard_etl_spark.session import get_spark

    spark = get_spark()
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # what the landed rule picks, from the same measured group counts
    picks = {}
    for name, (exprs, table, py) in DRAINS.items():
        g = contract._measured_groups(spark, sf_dir, table, exprs)
        picks[name] = (
            g,
            max(4, min(g, default))
            if py
            else max(4, min(-(-g // 25_000), default)),
        )

    # warm the streaming machinery once
    contract.QUERIES["streaming_weekly"](spark, sf_dir).count()

    @contextmanager
    def forced(n):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    print(f"{'drain':26s} groups rule | " + " | ".join(f"n={n}" for n in SETTINGS))
    for name, (exprs, table, py) in DRAINS.items():
        row = []
        for n in SETTINGS:
            # force the setting by replacing the sized scope: run the
            # drain builder under a pinned conf; the q functions read
            # the conf through the context manager, so pin the sized
            # helper to a fixed-width scope for the duration
            orig = contract._sized_state_partitions

            @contextmanager
            def pinned(spark_, n_groups, python_stateful=False, _n=n):
                with forced(_n):
                    yield

            contract._sized_state_partitions = pinned
            try:
                best = float("inf")
                for _ in range(runs):
                    t0 = time.time()
                    contract.QUERIES[name](spark, sf_dir).count()
                    best = min(best, time.time() - t0)
            finally:
                contract._sized_state_partitions = orig
            row.append(f"{best:5.2f}")
        g, pick = picks[name]
        print(f"{name:26s} {g:6d} {pick:4d} | " + " | ".join(row))


if __name__ == "__main__":
    main()
