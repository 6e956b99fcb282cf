"""Scaling evidence for the fuzzy record-linkage operators.

Two workloads, both far above the per-round bench (sf0.1):

1. EVEN: names spread over `n_blocks` first-token blocks with a planted
   SAME-BLOCK near-dup every 20th row (row `id` duplicates the tail of
   row `id − n_blocks` — its previous same-block neighbor — with a
   one-char suffix edit, so every plant is reachable by blocked
   matching). Times blocked pair generation (quadratic per block) vs
   sorted-neighborhood (linear per block) vs best-match, and checks the
   plants are actually found.
2. DOMINANT: every name shares ONE first token (the "THE …" catalog
   pathology), lengths spread over ~12 length cells. Compares the plain
   token-blocked join (one quadratic block) against the composite
   (token, length-bucket) blocking of ``fuzzy_pairs(length_bucket=…)``
   and asserts the outputs are IDENTICAL — the composite block is
   lossless, just bounded.

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


def fabricate_names(spark, n_rows: int, n_blocks: int = 401):
    """(key, name) rows: block word + a mostly-unique tail; every 20th
    row (with id >= n_blocks) reuses the tail of its PREVIOUS SAME-BLOCK
    member (id − n_blocks) plus a one-char edit — a planted in-block
    near-dup at Levenshtein distance 1. ``n_blocks`` must NOT be a
    multiple of 20: the twin id − n_blocks then lands on a different
    residue mod 20, so it is never itself a plant and its tail really
    is ``str(id − n_blocks)``."""
    assert n_blocks % 20 != 0, "twin of a plant must not be a plant"
    plant = (F.col("id") % 20 == 0) & (F.col("id") >= n_blocks)
    return spark.range(n_rows).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.lit("blk"),
            (F.col("id") % n_blocks).cast("string"),
            F.lit(" item"),
            F.when(plant, F.col("id") - n_blocks)
            .otherwise(F.col("id"))
            .cast("string"),
            F.when(plant, F.lit("x")).otherwise(F.lit("")),
        ).alias("p_name"),
    )


def fabricate_dominant(spark, n_rows: int, n_lengths: int = 12):
    """Every name shares the first token; tails pad the name into one of
    ``n_lengths`` length cells so composite (token, length-bucket)
    blocking has something to cut."""
    pad = F.col("id") % n_lengths
    return spark.range(n_rows).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.lit("the item"),
            F.col("id").cast("string"),
            F.repeat(F.lit("z"), pad.cast("int") * 4),
        ).alias("p_name"),
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000]
    spark = get_spark(app_name="stress-linkage")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        names = fabricate_names(spark, n).localCheckpoint()
        n_blocks = 401
        n_planted = sum(
            1 for i in range(n_blocks, n) if i % 20 == 0
        )
        t0 = time.time()
        blocked = fuzzy_pairs(names, max_dist=2)
        n_blocked = blocked.count()
        t_blocked = time.time() - t0
        # every planted pair is (id-n_blocks, id) at distance 1: verify
        # the blocked operator actually sees the plants
        found_plants = (
            blocked.where(
                (F.col("key_b") - F.col("key_a") == n_blocks)
                & (F.col("distance") == 1)
            ).count()
        )
        t0 = time.time()
        n_snm = sorted_neighborhood_pairs(names, window=5, max_dist=2).count()
        t_snm = time.time() - t0
        t0 = time.time()
        n_best = best_fuzzy_match(names, names, max_dist=2).count()
        t_best = time.time() - t0
        print(
            json.dumps(
                {
                    "workload": "even",
                    "n_rows": n,
                    "planted": n_planted,
                    "planted_found": found_plants,
                    "blocked_pairs": n_blocked,
                    "blocked_s": round(t_blocked, 2),
                    "snm_pairs": n_snm,
                    "snm_s": round(t_snm, 2),
                    "best_match_rows": n_best,
                    "best_match_s": round(t_best, 2),
                }
            )
        )

        # the UNbucketed dominant-token run is one quadratic block in ONE
        # join task (single hash key — no parallelism), so it is capped:
        # the evidence is the time RATIO and the identical output, not
        # absolute scale. The bucketed path has no such cap in practice.
        n_dom = min(n, 30_000)
        dom = fabricate_dominant(spark, n_dom).localCheckpoint()
        t0 = time.time()
        n_plain = fuzzy_pairs(dom, max_dist=2).count()
        t_plain = time.time() - t0
        t0 = time.time()
        n_comp = fuzzy_pairs(dom, max_dist=2, length_bucket=4).count()
        t_comp = time.time() - t0
        print(
            json.dumps(
                {
                    "workload": "dominant-token",
                    "n_rows": n_dom,
                    "plain_pairs": n_plain,
                    "plain_s": round(t_plain, 2),
                    "bucketed_pairs": n_comp,
                    "bucketed_s": round(t_comp, 2),
                    "lossless": n_plain == n_comp,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
