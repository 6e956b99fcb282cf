"""Scaling evidence for the graph operators (round 4b).

Fabricates a hub-heavy random graph — both endpoints log-uniform over
[1, N], so the smallest ids are hubs holding a constant FRACTION of all
edges (node 1 alone draws ~ln(2)/ln(N) of endpoints, ~5% at N=1M) —
the exact regime where a naive neighbour self-join explodes and
degree-ordered orientation is supposed to hold the wedge join at
O(m^1.5). Times triangle_stats and 5-iteration pagerank at sizes the
per-round bench (sf0.1) never reaches. Prints one JSON line per scale.

Determinism: endpoints derive from xxhash64(edge id), not RNG state, so
every run (and both engines, were an oracle attached) sees the same
graph.

Usage: python tools/stress_graph.py [n_nodes n_edges ...] (default 1M 5M)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.graph import (
    degree_profile,
    label_propagation,
    pagerank,
    triangle_stats,
)
from uk_housing_dashboard_etl_spark.session import get_spark


def fabricate_graph(spark, n_nodes: int, n_edges: int):
    """Log-uniform endpoints: u ~ U(0,1) from a hash, node = floor(N^u).
    Self-loops dropped, multi-edges collapsed with a count weight."""

    def endpoint(salt: int):
        u = (
            F.abs(F.xxhash64(F.col("id") + F.lit(salt * 1_000_003)))
            / F.lit(float(2**63))
        )
        return F.floor(F.pow(F.lit(float(n_nodes)), u)).cast("bigint")

    e = (
        spark.range(n_edges)
        .select(endpoint(1).alias("src"), endpoint(2).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return e


def timed(fn):
    t = time.time()
    df = fn()
    row = (
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x"))
        .collect()[0]
    )
    return round(time.time() - t, 1), row["n"]


def main() -> None:
    sizes = [
        (int(a), int(b)) for a, b in zip(sys.argv[1::2], sys.argv[2::2])
    ] or [(1_000_000, 5_000_000)]
    spark = get_spark(app_name="stress-graph")
    spark.sparkContext.setLogLevel("ERROR")
    for n_nodes, n_edges in sizes:
        edges = fabricate_graph(spark, n_nodes, n_edges).localCheckpoint()
        r: dict[str, object] = {"n_nodes": n_nodes, "n_edges_drawn": n_edges}
        r["n_edges"] = edges.count()
        hub = (
            edges.select(F.col("src").alias("n"))
            .unionAll(edges.select(F.col("dst").alias("n")))
            .groupBy("n")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        r["max_degree"] = hub
        t, _ = timed(lambda: triangle_stats(edges))
        r["triangle_stats_s"] = t
        row = triangle_stats(edges).collect()[0]
        r["n_triangles"] = row["n_triangles"]
        t, n = timed(lambda: pagerank(edges))
        r["pagerank5_s"], r["pagerank_nodes"] = t, n
        t, n = timed(lambda: degree_profile(edges))
        r["degree_profile_s"], r["distinct_degrees"] = t, n
        t, _ = timed(lambda: label_propagation(edges, iters=5))
        r["lpa5_s"] = t
        r["n_communities"] = (
            label_propagation(edges, iters=5)
            .select("label")
            .distinct()
            .count()
        )
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
