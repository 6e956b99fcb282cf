"""Scaling evidence for the round-5 operators.

Times Mann-Whitney, chi-square, Pareto skyline, sweep-line peak
concurrency, CDC replay, and the PQ index (fit / encode / ADC+rerank
search) at sizes the per-round bench (sf0.1) never reaches. Events
reuse the Zipf-skewed fabricator from stress.py; vectors are
fabricated deterministically here. Prints one JSON line per scale.

Usage: python tools/stress_r5.py [n_events n_vectors ...]
       (default 20M events, 200k x 64-dim vectors)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.stress import fabricate as fabricate_events
from uk_housing_dashboard_etl_spark.operators.incremental import apply_cdc
from uk_housing_dashboard_etl_spark.operators.pq import (
    pq_encode,
    pq_fit,
    pq_topk_rerank,
)
from uk_housing_dashboard_etl_spark.operators.relational import pareto_skyline
from uk_housing_dashboard_etl_spark.operators.stats import (
    chi2_independence,
    mannwhitney_two_sample,
)
from uk_housing_dashboard_etl_spark.operators.timeseries import peak_concurrency
from uk_housing_dashboard_etl_spark.session import get_spark

OUT = "/tmp/spark_graft_stress_r5"


def timed(fn) -> tuple[float, int]:
    """Time with FULL materialization (hash every output column)."""
    t = time.time()
    df = fn()
    row = (
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x"))
        .collect()[0]
    )
    return round(time.time() - t, 1), row["n"]


def fabricate_vectors(spark, n: int, dim: int, path: str) -> None:
    """Deterministic pseudo-random unit-cube vectors: hash-mix id×dim."""
    expr = (
        f"transform(sequence(0, {dim - 1}), i ->"
        " CAST((((id * 2654435761 + i * 40503) % 1000003) / 1000003.0)"
        " * 2.0 - 1.0 AS FLOAT))"
    )
    spark.range(n).select(
        F.col("id").alias("vec_id"), F.expr(expr).alias("embedding")
    ).write.mode("overwrite").parquet(path)


def main() -> None:
    sizes = [
        (int(a), int(b)) for a, b in zip(sys.argv[1::2], sys.argv[2::2])
    ] or [(20_000_000, 200_000)]
    spark = get_spark(app_name="stress-r5")
    spark.sparkContext.setLogLevel("ERROR")
    for n_events, n_vecs in sizes:
        epath = f"{OUT}/events_{n_events}"
        vpath = f"{OUT}/vecs_{n_vecs}"
        fabricate_events(spark, n_events, 200_000, epath)
        fabricate_vectors(spark, n_vecs, 64, vpath)
        events = spark.read.parquet(epath)
        vecs = spark.read.parquet(vpath)
        r: dict[str, object] = {"n_events": n_events, "n_vectors": n_vecs}

        # value is fact-grain-continuous: quantize to 1e-2 first, the
        # documented precondition for the distribution-grain windows
        quant = events.withColumn(
            "value", F.round(F.col("value"), 2)
        )
        r["mannwhitney_s"], _ = timed(
            lambda: mannwhitney_two_sample(
                quant, "event_type", "value", "click", "purchase"
            )
        )
        r["chi2_s"], _ = timed(
            lambda: chi2_independence(
                events.where(F.col("user_id").isNotNull()),
                "event_type",
                (F.col("user_id") % 2).cast("int"),
            )
        )
        # skyline over (value-as-price, user_id-as-size): quantized
        # minimize column, per the operator's scale contract
        r["skyline_s"], r["skyline_rows"] = timed(
            lambda: pareto_skyline(
                quant.where(F.col("value").isNotNull()), "value", "event_id"
            )
        )
        iv = events.where(F.col("ts").isNotNull()).select(
            F.col("ts").alias("start_ts"),
            F.expr(
                "ts + make_interval(0, 0, 0, 0, 0, 0,"
                " 1 + CAST(floor(value) AS BIGINT) % 3600)"
            ).alias("end_ts"),
        )
        r["peak_concurrency_s"], r["n_days"] = timed(
            lambda: peak_concurrency(iv)
        )
        changes = events.where(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        ).select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            "value",
            F.when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
        )
        r["apply_cdc_s"], r["cdc_rows"] = timed(
            lambda: apply_cdc(changes, ["user_id"], ["ts", "event_id"], "op")
        )

        # stream-stream interval join: drain the full event backlog as
        # two watermarked streams (one batch + trailing no-data batch)
        import shutil
        import uuid

        from uk_housing_dashboard_etl_spark.streaming.join_stream import (
            click_purchase_join_stream,
        )

        t = time.time()
        sdf = click_purchase_join_stream(spark, epath)
        qname = f"ssj_{uuid.uuid4().hex[:8]}"
        ckpt = f"{OUT}/ssj_ckpt_{uuid.uuid4().hex}"
        q = (
            sdf.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        r["stream_join_pairs"] = spark.sql(
            f"SELECT count(*) AS c FROM {qname}"
        ).collect()[0]["c"]
        r["stream_join_s"] = round(time.time() - t, 1)
        shutil.rmtree(ckpt, ignore_errors=True)

        t = time.time()
        codebooks = pq_fit(vecs, m=8, k=16, iterations=4)
        codebooks.count()
        r["pq_fit_s"] = round(time.time() - t, 1)
        t = time.time()
        cpath = f"{OUT}/codes_{n_vecs}"
        pq_encode(vecs, codebooks).write.mode("overwrite").parquet(cpath)
        r["pq_encode_s"] = round(time.time() - t, 1)
        codes = spark.read.parquet(cpath)
        queries = vecs.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        r["pq_search_s"], _ = timed(
            lambda: pq_topk_rerank(
                codes, codebooks, vecs, queries, k=10, oversample=5
            )
        )
        print(json.dumps(r))


if __name__ == "__main__":
    main()
