"""Scaling evidence for the ANN family: fabricated embedding corpora.

Generates N synthetic unit-ish vectors JVM-side (no Python in the data
path), writes parquet, then times brute-force cosine top-k vs the two
scale paths (sign-projection LSH buckets, IVF/k-means) for a fixed query
set — and, critically, measures the CANDIDATE volume each path scores
versus the N×Q brute-force grid, which is the number that decides
whether the plan survives 100 TB.

Prints one JSON line per corpus size with times, recall@k vs brute
force, and candidate-pruning factors.

Usage: python tools/stress_ann.py [n_vectors ...]   (default: 200k 1M)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.ivf import ivf_index, ivf_topk, kmeans_fit
from uk_housing_dashboard_etl_spark.operators.similarity import (
    _bucket_expr,
    brute_force_topk,
    lsh_bucketed_topk,
)
from uk_housing_dashboard_etl_spark.session import get_spark

OUT = "/tmp/spark_graft_stress_ann"
DIM = 64
N_QUERIES = 64
K = 10
BITS = 8
N_CLUSTERS = 64


N_TRUE_CLUSTERS = 256  # latent structure in the fabricated corpus


def fabricate_embeddings(spark, n: int, path: str) -> None:
    """Deterministic clustered vectors, synthesized inside codegen —
    1M×64 floats never touch the driver or Python.

    Mixture shape (center + 15% noise) mirrors real embedding corpora —
    ANN's operating regime; uniform random vectors are the known
    degenerate case where every bucketing scheme's recall collapses.
    """
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {DIM}), i -> CAST("
            f" sin(CAST(xxhash64(id % {N_TRUE_CLUSTERS}, i) % 100000 AS DOUBLE) / 1000.0)"
            " + 0.15 * sin(CAST(xxhash64(id, i) % 100000 AS DOUBLE) / 1000.0)"
            " AS FLOAT))"
        ).alias("embedding"),
    )
    vecs.write.mode("overwrite").parquet(path)


def recall_at_k(approx, exact) -> float:
    hits = approx.join(exact, ["query_id", "vec_id"], "inner").count()
    total = exact.count()
    return round(hits / total, 4) if total else 0.0


def lsh_candidate_count(corpus, queries) -> int:
    """Rows the LSH path actually scores: corpus-bucket histogram joined
    with the multi-probe set of query buckets (bucket math identical to
    ``lsh_bucketed_topk``)."""
    sizes = (
        corpus.select(_bucket_expr("embedding", BITS).alias("bucket"))
        .groupBy("bucket")
        .count()
    )
    probes = (
        queries.select(_bucket_expr("embedding", BITS).alias("bucket"))
        .select(
            F.explode(
                F.expr(
                    f"array_union(array(bucket), transform(sequence(0, {BITS - 1}),"
                    f" j -> CAST(bucket ^ shiftleft(1, j) AS INT)))"
                )
            ).alias("bucket")
        )
    )
    row = probes.join(sizes, "bucket").agg(F.sum("count")).collect()[0][0]
    return int(row or 0)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_spark(app_name="stress-ann")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        path = f"{OUT}/vecs_{n}"
        fabricate_embeddings(spark, n, path)
        corpus = spark.read.parquet(path)
        queries = (
            corpus.where(F.col("vec_id") % (n // N_QUERIES) == 0)
            .limit(N_QUERIES)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        queries.cache().count()

        times: dict[str, float] = {}
        t0 = time.time()
        exact = brute_force_topk(corpus, queries, k=K)
        exact.cache().count()
        times["brute_force"] = round(time.time() - t0, 2)

        t0 = time.time()
        lsh = lsh_bucketed_topk(corpus, queries, k=K, bits=BITS)
        lsh.cache().count()
        times["lsh_topk"] = round(time.time() - t0, 2)
        lsh_recall = recall_at_k(lsh, exact)

        t0 = time.time()
        centroids = kmeans_fit(corpus, k=N_CLUSTERS, iterations=5)
        index = ivf_index(corpus, centroids)
        ivf = ivf_topk(index, centroids, queries, k=K, n_probes=8)
        ivf.cache().count()
        times["ivf_topk_incl_fit"] = round(time.time() - t0, 2)
        ivf_recall = recall_at_k(ivf, exact)

        brute_candidates = n * N_QUERIES
        lsh_cand = lsh_candidate_count(corpus, queries)
        # IVF scores n_probe/n_clusters of the corpus per query (cluster
        # sizes vary; this is the expected volume)
        ivf_cand = int(n * N_QUERIES * 8 / N_CLUSTERS)

        print(
            json.dumps(
                {
                    "n_vectors": n,
                    "dim": DIM,
                    "n_queries": N_QUERIES,
                    "k": K,
                    "times_sec": times,
                    "recall_at_k": {"lsh": lsh_recall, "ivf": ivf_recall},
                    "candidates_scored": {
                        "brute_force": brute_candidates,
                        "lsh": lsh_cand,
                        "ivf_expected": ivf_cand,
                    },
                    "pruning_factor": {
                        "lsh": round(brute_candidates / max(lsh_cand, 1), 1),
                        "ivf": round(brute_candidates / max(ivf_cand, 1), 1),
                    },
                }
            )
        )
        for df in (queries, exact, lsh, ivf):
            df.unpersist()


if __name__ == "__main__":
    main()
