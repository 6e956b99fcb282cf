"""Scaling evidence for connected components: worst-case deep chains.

A single N-node chain is the adversarial input for label propagation
(needs N rounds — hopeless at any scale); alternating large-star/
small-star contraction resolves it in O(log N) rounds. This harness
fabricates a graph of long chains plus random cross-edges executor-side
and times `connected_components`, verifying every node lands on its
chain's minimum. Prints one JSON line per size.

Usage: python tools/stress_cc.py [n_nodes ...]   (default: 100000 1000000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.dedup import connected_components
from uk_housing_dashboard_etl_spark.session import get_spark


def run(spark, n_nodes: int, chain_len: int = 10_000) -> dict:
    """Chains of `chain_len` consecutive ids: edges (i, i+1) except at
    chain boundaries. Component minimum of node i is i - i % chain_len."""
    ids = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    pairs = (
        spark.range(n_nodes - 1)
        .where((F.col("id") % chain_len) != (chain_len - 1))
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    t0 = time.time()
    labels = connected_components(ids, pairs, max_iterations=40)
    wrong = labels.where(
        F.col("cluster_id") != (F.col("node") - F.col("node") % chain_len)
    ).count()
    elapsed = time.time() - t0
    assert wrong == 0, f"{wrong} mislabeled nodes"
    return {
        "metric": "cc_chain_stress",
        "n_nodes": n_nodes,
        "chain_len": chain_len,
        "value": round(elapsed, 2),
        "unit": "sec",
    }


def run_union_find(spark, n_nodes: int, chain_len: int = 10_000) -> dict:
    """r10: the SAME chain graph through duplicate_clusters' bounded
    driver union-find fast path (edge count <= cap) vs the distributed
    path (cap forced to 0) — results must be identical row-for-row, and
    the timing quantifies what the one-collect path saves in job-
    scheduling rounds at the largest size the cap admits."""
    from uk_housing_dashboard_etl_spark.operators.dedup import (
        duplicate_clusters,
    )

    ids = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    pairs = (
        spark.range(n_nodes - 1)
        .where((F.col("id") % chain_len) != (chain_len - 1))
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    t0 = time.time()
    fast = duplicate_clusters(ids, pairs)
    wrong_fast = fast.where(
        F.col("cluster_id") != (F.col("doc_id") - F.col("doc_id") % chain_len)
    ).count()
    t_fast = time.time() - t0
    t0 = time.time()
    dist = duplicate_clusters(ids, pairs, driver_union_max_edges=0)
    wrong_dist = dist.where(
        F.col("cluster_id") != (F.col("doc_id") - F.col("doc_id") % chain_len)
    ).count()
    t_dist = time.time() - t0
    assert wrong_fast == 0 and wrong_dist == 0
    return {
        "metric": "cc_union_find_vs_distributed",
        "n_nodes": n_nodes,
        "n_edges": n_nodes - n_nodes // chain_len,
        "union_find_sec": round(t_fast, 2),
        "distributed_sec": round(t_dist, 2),
    }


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark()
    for n in sizes:
        print(json.dumps(run(spark, n)), flush=True)
        print(json.dumps(run_union_find(spark, n)), flush=True)


if __name__ == "__main__":
    main()
