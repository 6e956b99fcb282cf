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


def fabricate_skewed_docs(spark, n_docs: int, path: str) -> None:
    """Hot-key corpus (round-7 verdict item 7): 99% of docs carry the
    SAME ~600-char boilerplate header (the license-header case) plus a
    short unique tail, so ~99% of corpus characters are duplicate mass
    and every boilerplate 30-gram is one hot exchange key shared by
    ~0.99*n_docs rows."""
    words = " ".join(f"licenseword{i:03d}" for i in range(40))  # ~640 chars
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 100 != 0,
            F.concat(
                F.lit(words + " "), F.format_string("unique%09d", F.col("id"))
            ),
        )
        .otherwise(
            # the 1% minority: arithmetic-unique text, no boilerplate
            F.expr(
                "concat_ws(' ', transform(sequence(1, 80),"
                " i -> concat('u', CAST(abs(xxhash64(id, i)) % 100000 AS"
                " STRING))))"
            )
        )
        .alias("text"),
    )
    docs.write.mode("overwrite").parquet(path)


def spans_groupby_variant(documents, min_len: int = 30):
    """A/B harness ONLY: exact_substr_spans' hash path with the
    dup-gram filter as groupBy+join (map-side-combinable counts, AQE
    skew-split-eligible join) instead of count-over-window — the
    candidate fix if the hot-key window stalls. Mirrors
    operators/dedup.py exact_substr_spans line-for-line elsewhere."""
    from pyspark.sql import Window

    text_col, id_col = "text", "doc_id"
    starts = F.expr(
        f"""CASE WHEN length({text_col}) < {min_len} THEN array()
             ELSE transform(
               sequence(0, length({text_col}) - {min_len}),
               i -> struct(i AS pos,
                           xxhash64(substring({text_col}, i + 1, {min_len}))
                               AS gh))
            END"""
    )
    spark = documents.sparkSession
    target = spark.sparkContext.defaultParallelism
    docs_par = documents
    if documents.rdd.getNumPartitions() < target:
        docs_par = documents.repartition(target, F.col(id_col))
    grams = docs_par.select(
        F.col(id_col).alias("doc_id"), F.explode(starts).alias("__s")
    ).select(
        "doc_id",
        F.col("__s.pos").cast("bigint").alias("pos"),
        F.col("__s.gh").alias("gh"),
    )
    counts = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= 2)
        .select("gh")
    )
    # merge hint: the static planner sizes the exploded gram frame from
    # its tiny parquet parent and tries to BROADCAST ~10^8 gram rows
    # (driver maxResultSize abort at 200k docs); sort-merge keeps the
    # exchange honest and is AQE-skew-split eligible
    dup = grams.join(counts.hint("merge"), "gh").select("doc_id", "pos")
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    marked = dup.withColumn(
        "__new",
        F.when(
            F.lag("pos").over(w_doc).isNull()
            | (F.col("pos") - F.lag("pos").over(w_doc) > F.lit(min_len)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = marked.withColumn(
        "span_id",
        F.sum("__new").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(min_len)).alias("span_end"),
        )
        .select(
            "doc_id",
            F.col("span_id").cast("bigint").alias("span_id"),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
    )


def skew_main(sizes: list[int]) -> None:
    from uk_housing_dashboard_etl_spark.operators.dedup import (
        exact_substr_spans,
    )

    spark = get_spark(app_name="stress_exact_substr_skew")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        path = os.path.join(OUT, f"skew{n}")
        fabricate_skewed_docs(spark, n, path)
        docs = spark.read.parquet(path)
        n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
        win_s, win_n = timed(
            lambda: exact_substr_spans(docs, min_len=30, hash_grams=True)
        )
        gby_s, gby_n = timed(lambda: spans_groupby_variant(docs, min_len=30))
        print(
            json.dumps(
                {
                    "mode": "skew99",
                    "n_docs": n,
                    "corpus_chars": int(n_chars),
                    "window_sec": win_s,
                    "window_rows": win_n,
                    "groupby_join_sec": gby_s,
                    "groupby_join_rows": gby_n,
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(OUT, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        skew_main([int(s) for s in sys.argv[2:]] or [1_000_000])
        return
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
