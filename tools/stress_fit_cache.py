"""Scale evidence for the round-8 `_cached_fit_large` change: corpus-
sized ANN fit artifacts (PQ code frames) as write-once parquet instead
of driver-collected rows.

Fabricates N 64-dim vectors (JVM-side), PQ-encodes them through the
real contract cache, and reports:
- build seconds (fit + encode + parquet write) and REUSE seconds
  (read-back scan) — the cost structure every repeat caller sees;
- artifact bytes on disk;
- driver max-RSS growth for the parquet path versus what the r7
  driver-collect path holds (measured by actually collecting the same
  frame, as `_cached_fit` did).

Usage: python tools/stress_fit_cache.py [n_vectors ...] (default 1M)
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.stress_ann import fabricate_embeddings
from uk_housing_dashboard_etl_spark import contract
from uk_housing_dashboard_etl_spark.operators.pq import pq_encode, pq_fit
from uk_housing_dashboard_etl_spark.session import get_spark

OUT = "/tmp/spark_graft_stress_fitcache"


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _dir_mb(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 1e6


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000]
    spark = get_spark(app_name="stress_fit_cache")
    spark.sparkContext.setLogLevel("ERROR")
    contract.clear_large_fit_cache()
    for n in sizes:
        path = os.path.join(OUT, str(n))
        fabricate_embeddings(spark, n, path)
        emb = spark.read.parquet(path).select(
            F.col("vec_id"), F.col("embedding")
        )
        codebooks = pq_fit(emb, m=32, k=16, iterations=2)

        t0 = time.time()
        codes = contract._cached_fit_large(
            spark, path, "stress_pq_codes",
            lambda: pq_encode(emb, codebooks),
        )
        n_rows = codes.count()
        build_s = round(time.time() - t0, 2)

        t0 = time.time()
        reused = contract._cached_fit_large(
            spark, path, "stress_pq_codes",
            lambda: (_ for _ in ()).throw(AssertionError("must not rebuild")),
        )
        assert reused.count() == n_rows
        reuse_s = round(time.time() - t0, 2)

        cache_root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(contract.__file__))),
            "spark-warehouse", "_fit_cache",
        )
        artifact_mb = round(_dir_mb(cache_root), 1)

        rss_before = _rss_mb()
        held = reused.collect()  # what the r7 driver-rows path retained
        rss_collect_delta = round(_rss_mb() - rss_before, 1)
        del held

        print(
            json.dumps(
                {
                    "n_vectors": n,
                    "code_rows": n_rows,
                    "build_sec": build_s,
                    "reuse_sec": reuse_s,
                    "artifact_mb": artifact_mb,
                    "driver_rss_delta_if_collected_mb": rss_collect_delta,
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    contract.clear_large_fit_cache()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
