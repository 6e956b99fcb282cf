"""Scaling evidence for the fuzzy record-linkage operators.

Fabricates a name table with a configurable number of blocks and a
per-block near-dup clique fraction, then times blocked pair generation
(quadratic per block) vs sorted-neighborhood (linear per block) at
sizes the per-round bench (sf0.1) never reaches, and reports candidate
volumes so the linear-vs-quadratic claim is measured, not asserted.

Usage: python tools/stress_linkage.py [n_rows ...]   (default 200000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.linkage import (
    best_fuzzy_match,
    fuzzy_pairs,
    sorted_neighborhood_pairs,
)
from uk_housing_dashboard_etl_spark.session import get_spark

WORDS = ["alpha", "beta", "gamma", "delta", "epsil", "zeta", "theta", "kappa"]


def fabricate_names(spark, n_rows: int, n_blocks: int = 400):
    """(key, name) rows: block word + a mostly-unique tail; every 20th
    row reuses the previous tail with one edit (a planted near-dup)."""
    base = spark.range(n_rows).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.lit("blk"),
            (F.col("id") % n_blocks).cast("string"),
            F.lit(" item"),
            F.when(
                F.col("id") % 20 == 0, ((F.col("id") - 1) / F.lit(1)).cast("long")
            ).otherwise(F.col("id")).cast("string"),
        ).alias("p_name"),
    )
    return base


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000]
    spark = get_spark(app_name="stress-linkage")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        names = fabricate_names(spark, n).localCheckpoint()
        t0 = time.time()
        n_blocked = fuzzy_pairs(names, max_dist=2).count()
        t_blocked = time.time() - t0
        t0 = time.time()
        n_snm = sorted_neighborhood_pairs(names, window=5, max_dist=2).count()
        t_snm = time.time() - t0
        t0 = time.time()
        n_best = best_fuzzy_match(names, names, max_dist=2).count()
        t_best = time.time() - t0
        print(
            json.dumps(
                {
                    "n_rows": n,
                    "blocked_pairs": n_blocked,
                    "blocked_s": round(t_blocked, 2),
                    "snm_pairs": n_snm,
                    "snm_s": round(t_snm, 2),
                    "best_match_rows": n_best,
                    "best_match_s": round(t_best, 2),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
