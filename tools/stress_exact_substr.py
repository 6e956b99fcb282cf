"""Scaling evidence for the exact-substring span dedup (round 7).

Reuses the stress_docs fabricator (planted exact/near duplicate pairs)
and times the suffix-grain ExactSubstr family at corpus sizes the
per-round bench never reaches, on the production (hash-keyed) path:
per-doc span stats and the full trim rebuild. The char-grain gram
exchange is the only data-sized shuffle — this measures exactly how it
scales. Prints one JSON line per size.

Usage: python tools/stress_exact_substr.py [n_docs ...] (default 100k 500k)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.stress_docs import fabricate_docs
from uk_housing_dashboard_etl_spark.operators.dedup import (
    exact_substr_stats,
    exact_substr_trim,
)
from uk_housing_dashboard_etl_spark.session import get_spark

OUT = "/tmp/spark_graft_stress_exsub"


def timed(fn):
    """Time with FULL materialization (hash every output column)."""
    t = time.time()
    df = fn()
    row = (
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x"))
        .collect()[0]
    )
    return round(time.time() - t, 2), int(row["n"])


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 500_000]
    spark = get_spark(app_name="stress_exact_substr")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        path = os.path.join(OUT, str(n))
        fabricate_docs(spark, n, path)
        docs = spark.read.parquet(path)
        n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
        stats_s, stats_n = timed(
            lambda: exact_substr_stats(docs, min_len=30, hash_grams=True)
        )
        dup_docs = (
            exact_substr_stats(docs, min_len=30, hash_grams=True)
            .where(F.col("dup_frac") >= 0.5)
            .count()
        )
        trim_s, trim_n = timed(
            lambda: exact_substr_trim(docs, min_len=30, hash_grams=True)
        )
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "corpus_chars": int(n_chars),
                    "stats_sec": stats_s,
                    "stats_rows": stats_n,
                    "docs_dup_frac_ge_05": dup_docs,
                    "trim_sec": trim_s,
                    "trim_rows": trim_n,
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
