"""Scaling evidence for the training-data operators: fabricated corpora.

Generates N synthetic documents executor-side (~100 words each from a
1000-word vocabulary, with planted exact-duplicate pairs (ids ≡ 1 mod
10 copy id-1) and near-duplicate pairs (ids ≡ 2 mod 10 copy id-2 plus
one extra word)), writes parquet, and times the dedup/text operators.
Prints one JSON line per size.

Usage: python tools/stress_docs.py [n_docs ...]   (default: 200k 1M)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.dedup import (
    cdc_chunk_pairs,
    containment_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_pairs,
    simhash_signatures,
)
from uk_housing_dashboard_etl_spark.operators.curation import (
    curate_corpus,
    decontaminate,
    hash_sample,
)
from uk_housing_dashboard_etl_spark.operators.simjoin import set_similarity_join
from uk_housing_dashboard_etl_spark.operators.text_analysis import (
    doc_fingerprint,
    quality_score,
    repetition_stats,
    text_stats,
    top_ngrams,
)
from uk_housing_dashboard_etl_spark.session import get_spark

OUT = "/tmp/spark_graft_stress_docs"


def fabricate_docs(spark, n_docs: int, path: str, words_per_doc: int = 100) -> None:
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 1, F.col("id") - 1)
        .when(F.col("id") % 10 == 2, F.col("id") - 2)
        .otherwise(F.col("id"))
        .alias("seed"),
        (F.col("id") % 10 == 2).alias("is_near"),
    )
    # words synthesized arithmetically ('w' + hash%1000) — a vocab array
    # column would materialize 1000 strings per row
    text = F.concat_ws(
        " ",
        F.expr(
            f"transform(sequence(1, {words_per_doc}),"
            " i -> concat('w', CAST(abs(xxhash64(seed, i)) % 1000 AS STRING)))"
        ),
    )
    docs = base.withColumn("__base_text", text).select(
        "doc_id",
        F.when(
            F.col("is_near"), F.concat(F.col("__base_text"), F.lit(" extraword"))
        )
        .otherwise(F.col("__base_text"))
        .alias("text"),
    )
    docs.write.mode("overwrite").parquet(path)


def _pairs_in_buckets(bucketed, keys: list[str]) -> int:
    """Sum of C(size, 2) over buckets — the candidate join volume the
    banded path actually pays, to compare against N·(N-1)/2 all-pairs."""
    row = (
        bucketed.groupBy(*keys)
        .count()
        .agg(F.sum(F.expr("count * (count - 1) / 2")))
        .collect()[0][0]
    )
    return int(row or 0)


def minhash_candidate_volume(docs, num_hashes=16, bands=4) -> int:
    """Band-bucket collision volume under the exact production banding."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes=num_hashes)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.element_at("signature", b * rows + r + 1) for r in range(rows)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    entries = sig.select(
        F.explode(F.array(*band_structs)).alias("be")
    ).select("be.band", "be.bucket")
    return _pairs_in_buckets(entries, ["band", "bucket"])


def simhash_candidate_volume(docs, max_hamming=3) -> int:
    """Chunk-bucket collision volume under the production pigeonhole
    banding (chunks = max_hamming + 1)."""
    chunks = max_hamming + 1
    width = -(-63 // chunks)
    mask = (1 << width) - 1
    sig = simhash_signatures(docs)
    entries = sig.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {chunks - 1}),"
                f" c -> struct(c AS chunk,"
                f" shiftright(simhash, CAST(c * {width} AS INT)) & {mask} AS val))"
            )
        ).alias("ch")
    ).select("ch.chunk", "ch.val")
    return _pairs_in_buckets(entries, ["chunk", "val"])


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_spark(app_name="stress-docs")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        path = f"{OUT}/docs_{n}"
        fabricate_docs(spark, n, path)
        docs = spark.read.parquet(path)
        times: dict[str, float] = {}
        counts: dict[str, int] = {}

        t0 = time.time()
        counts["exact_dups"] = exact_dedup(docs).where("is_duplicate").count()
        times["exact_dedup"] = round(time.time() - t0, 2)

        t0 = time.time()
        counts["minhash_pairs"] = minhash_lsh_pairs(docs, threshold=0.5).count()
        times["minhash_lsh"] = round(time.time() - t0, 2)

        t0 = time.time()
        counts["simhash_pairs"] = simhash_pairs(docs, max_hamming=3).count()
        times["simhash"] = round(time.time() - t0, 2)

        t0 = time.time()
        counts["simjoin_pairs"] = set_similarity_join(
            docs, threshold=0.8
        ).count()
        times["simjoin_prefix"] = round(time.time() - t0, 2)

        # candidate-join volume vs all-pairs: the pruning factor that
        # decides whether the banded paths survive 100 TB
        all_pairs = n * (n - 1) // 2
        mh_cand = minhash_candidate_volume(docs)
        sh_cand = simhash_candidate_volume(docs)
        counts["candidate_volume"] = {
            "all_pairs": all_pairs,
            "minhash_banded": mh_cand,
            "simhash_banded": sh_cand,
            "minhash_pruning_x": round(all_pairs / max(mh_cand, 1), 1),
            "simhash_pruning_x": round(all_pairs / max(sh_cand, 1), 1),
        }

        t0 = time.time()
        text_stats(docs).count()
        quality_score(docs).count()
        doc_fingerprint(docs).count()
        times["text_analysis"] = round(time.time() - t0, 2)

        t0 = time.time()
        top_ngrams(docs, n=2, k=50).count()
        times["top_ngrams"] = round(time.time() - t0, 2)

        t0 = time.time()
        repetition_stats(docs).count()
        times["repetition_stats"] = round(time.time() - t0, 2)

        # benchmark side = 0.1% of the corpus (an eval-suite-sized set)
        t0 = time.time()
        bench = hash_sample(docs, "doc_id", percent=1)
        counts["contaminated"] = (
            decontaminate(docs, bench, n=3, threshold=5)
            .where("contaminated")
            .count()
        )
        times["decontaminate"] = round(time.time() - t0, 2)

        # end-to-end curation mart (funnel -> dedup -> inventory);
        # synthetic lang/source tags so the rollup has real key groups
        tagged = docs.select(
            "doc_id",
            "text",
            F.concat(F.lit("l"), (F.col("doc_id") % 5).cast("string")).alias(
                "lang"
            ),
            F.concat(F.lit("s"), (F.col("doc_id") % 20).cast("string")).alias(
                "source"
            ),
        )
        t0 = time.time()
        counts["curated_groups"] = curate_corpus(tagged).count()
        times["curate_corpus"] = round(time.time() - t0, 2)

        # round-2 operators: quality-ranked dedup, temperature mix,
        # sequence packing
        from uk_housing_dashboard_etl_spark.operators.curation import (
            pack_sequences,
            temperature_mix,
        )
        from uk_housing_dashboard_etl_spark.operators.dedup import (
            keep_best_dedup,
        )

        t0 = time.time()
        counts["kept_best"] = keep_best_dedup(docs).where("keep").count()
        times["keep_best_dedup"] = round(time.time() - t0, 2)

        t0 = time.time()
        counts["mix_rows"] = temperature_mix(tagged).count()
        times["temperature_mix"] = round(time.time() - t0, 2)

        from uk_housing_dashboard_etl_spark.operators.text_analysis import (
            strip_boilerplate_chunks,
        )

        # round-4 corpus ops: boilerplate chunk removal (AQE-adaptive
        # anti-join) and df-capped containment on the planted near-dups
        t0 = time.time()
        counts["boiler_chunks_removed"] = int(
            strip_boilerplate_chunks(docs, chunk_tokens=10, max_chunk_df=4)
            .agg(F.sum("n_removed"))
            .collect()[0][0]
        )
        times["strip_boilerplate"] = round(time.time() - t0, 2)

        t0 = time.time()
        counts["containment_pairs"] = containment_pairs(
            docs, threshold=0.9, max_shingle_df=8
        ).count()
        times["containment_capped"] = round(time.time() - t0, 2)

        # CDC chunking must recover the planted near-dup pairs (the
        # id-2 copies differ by one extra word -> most chunks shared)
        t0 = time.time()
        counts["cdc_pairs"] = cdc_chunk_pairs(
            docs, threshold=0.5, max_chunk_df=8
        ).count()
        times["cdc_chunks"] = round(time.time() - t0, 2)

        t0 = time.time()
        packed = pack_sequences(docs, budget_tokens=2048, n_shards=64)
        counts["packed_bins"] = packed.select("shard", "bin_idx").distinct().count()
        times["pack_sequences"] = round(time.time() - t0, 2)

        print(
            json.dumps(
                {
                    "docs": n,
                    "total_sec": round(sum(times.values()), 2),
                    "stages": times,
                    "found": counts,
                }
            )
        )
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
