"""Scale-direction evidence for the ANN FIT path (r11 verdict item 6).

The streaming state-sizing rule got a 1M-row stress proof in r11; this
is the same kind of proof for the k-means / PQ training loops
(`ivf.kmeans_fit`, `pq.pq_fit`): fabricate a clustered embedding corpus
at N and 10N vectors (the `stress_ann` mixture — ANN's operating
regime), time each fit at both scales, and measure the driver-side
codebook footprint after collect.

What the numbers must show for the 100 TB claim to hold:

- **fit time scales ~linearly in N** — every Lloyd's iteration is one
  corpus scan (broadcast assign, JVM-side distance codegen) plus a
  partial-combined `Summarizer.mean` whose exchange carries ≤ k (or
  m·k) rows per partition regardless of N. A super-linear ratio would
  mean an accidental shuffle of the corpus itself.
- **driver codebook memory is O(k·D) / O(m·k·D/m) = O(k·D)** —
  independent of N. The fit result is the only thing that ever reaches
  the driver; the corpus stays distributed.

Prints one JSON line per (op, n) with wall seconds, rows-per-second,
and collected codebook bytes.

Usage: python tools/stress_ann_fit.py [n_base [factor]]
       (default: 100000 10 — i.e. 100k and 1M vectors)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stress_ann import DIM, fabricate_embeddings  # noqa: E402

from uk_housing_dashboard_etl_spark.operators.ivf import kmeans_fit  # noqa: E402
from uk_housing_dashboard_etl_spark.operators.pq import pq_fit  # noqa: E402
from uk_housing_dashboard_etl_spark.session import get_spark  # noqa: E402

OUT = "/tmp/spark_graft_stress_ann_fit"

KMEANS_K = 64
KMEANS_ITERS = 8
PQ_M = 8
PQ_K = 16
PQ_ITERS = 4


def codebook_bytes(rows) -> int:
    """Approximate driver-resident footprint of a collected codebook:
    8 bytes per double plus per-row object overhead — the number that
    must stay flat as N grows 10x."""
    return sum(len(r[-1]) * 8 + 64 for r in rows)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="stress-ann-fit")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[int, float]] = {"kmeans_fit": {}, "pq_fit": {}}
    for n in (n_base, n_base * factor):
        path = f"{OUT}/vecs_{n}"
        fabricate_embeddings(spark, n, path)
        corpus = spark.read.parquet(path)

        t0 = time.time()
        km = kmeans_fit(corpus, k=KMEANS_K, iterations=KMEANS_ITERS)
        km_rows = km.collect()
        km_sec = round(time.time() - t0, 2)
        results["kmeans_fit"][n] = km_sec
        print(
            json.dumps(
                {
                    "op": "kmeans_fit",
                    "n": n,
                    "k": KMEANS_K,
                    "iterations": KMEANS_ITERS,
                    "sec": km_sec,
                    "rows_per_sec": int(n / km_sec),
                    "codebook_rows": len(km_rows),
                    "codebook_bytes": codebook_bytes(km_rows),
                }
            )
        )

        t0 = time.time()
        pq = pq_fit(corpus, m=PQ_M, k=PQ_K, iterations=PQ_ITERS)
        pq_rows = pq.collect()
        pq_sec = round(time.time() - t0, 2)
        results["pq_fit"][n] = pq_sec
        print(
            json.dumps(
                {
                    "op": "pq_fit",
                    "n": n,
                    "m": PQ_M,
                    "k": PQ_K,
                    "iterations": PQ_ITERS,
                    "sec": pq_sec,
                    "rows_per_sec": int(n / pq_sec),
                    "codebook_rows": len(pq_rows),
                    "codebook_bytes": codebook_bytes(pq_rows),
                }
            )
        )

    for op, series in results.items():
        lo, hi = sorted(series)
        ratio = round(series[hi] / series[lo], 2)
        print(
            json.dumps(
                {
                    "op": op,
                    "scale_factor": factor,
                    "time_ratio": ratio,
                    "verdict": (
                        "LINEAR-ISH"
                        if ratio <= factor * 1.3
                        else "SUPER-LINEAR — investigate"
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
