"""Scaling evidence for the round-9 empty/NULL-document fixes.

A web-scale corpus is CONTAMINATED: a real crawl carries empty
documents, whitespace-only documents, and NULL text rows. Before the
round-9 fixes, ``split("")`` gave every token-less doc the singleton
shingle set ``{""}`` — at corpus scale that is the hottest possible
join key: 100k empty docs share ONE shingle, so the exact-Jaccard
self-join at n=1 would enumerate C(100k, 2) ~ 5e9 candidate pairs (and
MinHash at shingle_n=1 would bucket all of them together), while
dup_span_stats would abort outright under ANSI (0/0). The fix is
therefore a SCALE property, not just a correctness one — token-less
mass must contribute ZERO join keys and ~zero wall time.

A/B design: a clean corpus of N normal docs (planted exact + near
duplicate pairs, the stress_docs scheme) vs the same corpus plus
N//2 token-less docs (40% empty "", 30% whitespace-only, 30% NULL).
For each operator the contaminated run must (a) return EXACTLY the
clean run's pair set / per-doc values on the normal ids, (b) report
zeros and no pairs for the token-less ids, and (c) cost about the
same wall time — the contamination shows up in the scan, never in a
shuffle key.

Prints one JSON line per corpus size.

Usage: python tools/stress_empty_docs.py [n_normal ...] (default 200k)
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
from uk_housing_dashboard_etl_spark.operators.curation import pack_sequences
from uk_housing_dashboard_etl_spark.operators.dedup import (
    dup_span_stats,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from uk_housing_dashboard_etl_spark.operators.text_analysis import (
    chunk_documents,
    strip_boilerplate_chunks,
)
from uk_housing_dashboard_etl_spark.session import get_spark

OUT = "/tmp/spark_graft_stress_empty"


def contaminate(spark, clean_path: str, n_normal: int, path: str) -> None:
    """clean corpus + n_normal//2 token-less docs (ids above n_normal):
    40% empty string, 30% whitespace-only, 30% NULL text."""
    junk = spark.range(n_normal, n_normal + n_normal // 2).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 4, F.lit(""))
        .when(F.col("id") % 10 < 7, F.lit(" \t  \n "))
        .otherwise(F.lit(None).cast("string"))
        .alias("text"),
    )
    spark.read.parquet(clean_path).unionByName(junk).write.mode(
        "overwrite"
    ).parquet(path)


def timed(fn):
    t = time.time()
    out = fn()
    return round(time.time() - t, 2), out


def pair_digest(df):
    """(n_pairs, max doc id seen) — the max id catches any token-less
    doc (id >= n_normal) leaking into a pair frame."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.greatest(F.max("doc_a"), F.max("doc_b")).alias("mx"),
    ).collect()[0]
    return int(row["n"] or 0), row["mx"] and int(row["mx"])


def run_size(spark, n_normal: int) -> dict:
    clean_p = os.path.join(OUT, f"clean_{n_normal}")
    cont_p = os.path.join(OUT, f"cont_{n_normal}")
    fabricate_docs(spark, n_normal, clean_p)
    contaminate(spark, clean_p, n_normal, cont_p)
    clean = spark.read.parquet(clean_p)
    cont = spark.read.parquet(cont_p)
    n_junk = n_normal // 2

    res: dict = {"n_normal": n_normal, "n_tokenless": n_junk, "ops": {}}

    pair_ops = {
        # shingle_n=1 exercises exactly the key the bug poisoned
        "minhash_lsh_n1": lambda d: minhash_lsh_pairs(
            d, shingle_n=1, threshold=0.5
        ),
        "simhash_pairs": lambda d: simhash_pairs(d),
    }
    if n_normal <= 5_000:
        # exact n=1 Jaccard is inherently quadratic through the REAL
        # common unigrams of the fixed-1000-word fabricated vocab
        # (unigram df ~ 0.1*n_docs -> 3.6e9 join rows already at 20k),
        # so the exact path only runs at demonstration size
        pair_ops["ngram_jaccard_n1"] = lambda d: ngram_jaccard_pairs(
            d, n=1, threshold=0.9
        )
    for name, op in pair_ops.items():
        t_clean, (nc, _) = timed(lambda: pair_digest(op(clean)))
        t_cont, (nn, mx) = timed(lambda: pair_digest(op(cont)))
        assert nn == nc, f"{name}: contaminated pair count {nn} != clean {nc}"
        assert mx is None or mx < n_normal, (
            f"{name}: token-less doc leaked into a pair (max id {mx})"
        )
        res["ops"][name] = {"clean_s": t_clean, "cont_s": t_cont, "pairs": nc}

    # per-doc marts: token-less ids must be zeros, normal ids unchanged
    def span_check(d):
        out = dup_span_stats(d, k=5)
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("doc_id") >= n_normal)
                    & (
                        (F.col("n_tokens") != 0)
                        | (F.col("covered_tokens") != 0)
                    ),
                    1,
                ).otherwise(0)
            ).alias("bad"),
        ).collect()[0]

    t_clean, _ = timed(lambda: span_check(clean))
    t_cont, row = timed(lambda: span_check(cont))
    assert int(row["n"]) == n_normal + n_junk
    assert int(row["bad"] or 0) == 0, "token-less doc with nonzero spans"
    res["ops"]["dup_span_stats"] = {"clean_s": t_clean, "cont_s": t_cont}

    for name, op, zero_col in [
        ("exact_dedup", exact_dedup, None),
        ("pack_sequences", pack_sequences, "n_tokens"),
        ("chunk_documents", chunk_documents, "chunk_len"),
        ("strip_boilerplate", strip_boilerplate_chunks, "n_chunks"),
    ]:
        def drain(d, op=op, zero_col=zero_col):
            out = op(d)
            agg = [F.count(F.lit(1)).alias("n")]
            if zero_col is not None:
                agg.append(
                    F.sum(
                        F.when(
                            (F.col("doc_id") >= n_normal)
                            & (F.col(zero_col) != 0),
                            1,
                        ).otherwise(0)
                    ).alias("bad")
                )
            return out.agg(*agg).collect()[0]

        t_clean, _ = timed(lambda: drain(clean))
        t_cont, row = timed(lambda: drain(cont))
        if zero_col is not None:
            assert int(row["bad"] or 0) == 0, (
                f"{name}: token-less doc with nonzero {zero_col}"
            )
        res["ops"][name] = {"clean_s": t_clean, "cont_s": t_cont}

    return res


def poisoned_key_cost(spark, n_hot: int) -> dict:
    """Quantify what the pre-fix world costs: n_hot docs sharing ONE
    unigram (here real one-token docs — exactly the join shape the ""
    shingle created for empty docs before round 9). The exact n=1 self-
    join must enumerate C(n_hot, 2) pairs; the measurement extrapolates
    why a 100k-empty crawl would have been a 5e9-row join on one key."""
    docs = spark.range(n_hot).select(
        F.col("id").alias("doc_id"), F.lit("e").alias("text")
    )
    t = time.time()
    n = ngram_jaccard_pairs(docs, n=1, threshold=0.9).count()
    return {
        "n_hot": n_hot,
        "pairs": int(n),
        "seconds": round(time.time() - t, 2),
    }


def main() -> None:
    sizes = [int(a.replace("k", "000")) for a in sys.argv[1:]] or [200_000]
    shutil.rmtree(OUT, ignore_errors=True)
    spark = get_spark(app_name="stress-empty-docs")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"poisoned_key_sim": poisoned_key_cost(spark, 2500)}),
          flush=True)
    for n in sizes:
        print(json.dumps(run_size(spark, n)), flush=True)
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
