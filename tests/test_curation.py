"""Curation operators: redaction correctness on real PII shapes, and
deterministic sampling/splitting stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.curation import (
    dataset_split,
    hash_sample,
    redact_pii,
    split_summary,
    weighted_sample,
)


def test_redact_pii_patterns(spark):
    docs = spark.createDataFrame(
        [
            (0, "contact alice.smith+x@example.co.uk or bob@test.org today"),
            (1, "call +44 20 7946 0958 or (555) 123-4567 now"),
            (2, "server at 192.168.1.100 and 10.0.0.1 are up"),
            (3, "no sensitive content here at all"),
        ],
        ["doc_id", "text"],
    )
    out = redact_pii(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "n_emails"] == 2
    assert "<EMAIL>" in out.loc[0, "redacted_text"]
    assert "example.co.uk" not in out.loc[0, "redacted_text"]
    assert out.loc[1, "n_phones"] >= 2
    assert "<PHONE>" in out.loc[1, "redacted_text"]
    assert out.loc[2, "n_ips"] == 2
    assert "192.168.1.100" not in out.loc[2, "redacted_text"]
    assert not bool(out.loc[3, "has_pii"])
    assert out.loc[3, "redacted_text"] == "no sensitive content here at all"


def test_hash_sample_stable_and_proportional(spark):
    big = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    s1 = set(r.doc_id for r in hash_sample(big, "doc_id", 10).collect())
    s2 = set(r.doc_id for r in hash_sample(big, "doc_id", 10).collect())
    assert s1 == s2  # deterministic
    assert 0.07 < len(s1) / 10_000 < 0.13  # ~10%
    # membership is stable under corpus growth: the sample of a prefix is
    # a subset of the sample of the whole
    small = spark.range(0, 1_000).withColumnRenamed("id", "doc_id")
    s_small = set(r.doc_id for r in hash_sample(small, "doc_id", 10).collect())
    assert s_small <= s1
    # nested sampling: 5% sample is a subset of the 10% sample
    s5 = set(r.doc_id for r in hash_sample(big, "doc_id", 5).collect())
    assert s5 <= s1


def test_weighted_sample_exact_k_deterministic_weight_biased(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        # ids below 1000 carry 50× the weight of the rest
        F.when(F.col("id") < 1_000, 500).otherwise(10).alias("w"),
    )
    s1 = [r.doc_id for r in weighted_sample(df, "doc_id", "w", 200).collect()]
    assert len(s1) == 200
    # deterministic, and invariant under partitioning
    s2 = [
        r.doc_id
        for r in weighted_sample(
            df.repartition(13), "doc_id", "w", 200
        ).collect()
    ]
    assert set(s1) == set(s2)
    # heavy rows are 10% of the corpus but 85% of its total weight —
    # they must dominate the sample (binomially impossible otherwise)
    heavy = sum(1 for d in s1 if d < 1_000)
    assert heavy > 120
    # non-positive weights are never sampled
    withzero = df.withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, 0).otherwise(F.col("w"))
    )
    szero = [
        r.doc_id
        for r in weighted_sample(withzero, "doc_id", "w", 200).collect()
    ]
    assert len(szero) == 200 and all(d % 2 == 1 for d in szero)


def test_weighted_sample_plan_is_topk_not_full_sort(spark):
    df = spark.range(0, 1_000).select(
        F.col("id").alias("doc_id"), F.lit(7).alias("w")
    )
    plan = weighted_sample(df, "doc_id", "w", 50)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # global top-k compiles to per-partition heaps + a k-row driver
    # merge, never a full sort shuffle of the corpus
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_dataset_split_partitions_everything(spark):
    big = spark.range(0, 5_000).withColumnRenamed("id", "doc_id")
    out = dataset_split(big, "doc_id").toPandas()
    assert len(out) == 5_000
    counts = out["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    summary = split_summary(big, "doc_id").toPandas().set_index("split")
    assert summary["n_docs"].sum() == 5_000
    assert 0.06 < summary.loc["test", "n_docs"] / 5_000 < 0.14


def test_decontaminate_flags_benchmark_overlap(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            # verbatim copy: shares every benchmark 3-gram (7 of them)
            (0, "the quick brown fox jumps over the lazy dog"),
            # partial leak: "quick brown fox jumps" = two shared 3-grams
            (1, "she saw a quick brown fox jumps right past"),
            # clean doc, same vocabulary but no shared 3-gram
            (2, "dog lazy the over jumps fox brown quick the"),
            # too short for any 3-gram
            (3, "hi there"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, n=3, threshold=3).collect()
    }
    assert out[0]["ngram_hits"] == 7 and out[0]["contaminated"]
    assert out[1]["ngram_hits"] == 2 and not out[1]["contaminated"]
    assert out[2]["ngram_hits"] == 0 and not out[2]["contaminated"]
    assert out[3]["ngram_hits"] == 0 and not out[3]["contaminated"]
    # the benchmark n-gram set must broadcast — the corpus never shuffles
    plan = (
        decontaminate(docs, bench, n=3, threshold=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_decontaminate_repeated_grams_count_once(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import decontaminate

    bench = spark.createDataFrame([(9, "a b c")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(0, "a b c a b c a b c")], ["doc_id", "text"]
    )
    row = decontaminate(docs, bench, n=3, threshold=1).collect()[0]
    # "a b c" appears 3x in the doc but is ONE distinct shared gram
    assert row["ngram_hits"] == 1 and row["contaminated"]


def test_stratified_sample_rates_and_stability(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import (
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)],
        ["doc_id", "lang"],
    )
    out = stratified_sample(
        docs, "doc_id", "lang", rates={"en": 20}, default_percent=80
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    # hash is uniform-ish: en keeps ~20% of 1000, zh ~80% of 1000
    assert 120 <= counts["en"] <= 280
    assert 700 <= counts["zh"] <= 900
    # deterministic: same ids selected on re-run
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in stratified_sample(
        docs, "doc_id", "lang", rates={"en": 20}, default_percent=80
    ).collect())
    assert ids1 == ids2
    # strata are subsets of the unstratified sample at the same rate
    from uk_housing_dashboard_etl_spark.operators.curation import hash_sample
    flat20 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 20).collect()}
    en_ids = {r["doc_id"] for r in out.where("lang = 'en'").collect()}
    assert en_ids <= flat20


def test_curate_corpus_filters_then_dedups(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import curate_corpus

    good = (
        "the value of a table is that it holds the data and the rows for "
        "all to scan and it is a fast plan"
    )
    docs = spark.createDataFrame(
        [
            # two exact dups (after whitespace normalization) + one unique
            (0, good, "en", "s1"),
            (1, good + " ", "en", "s1"),
            (2, good + " again", "en", "s1"),
            # fails the funnel (too short) -> never reaches dedup
            (3, "tiny", "en", "s1"),
            # different group entirely kept
            (4, good, "en", "s2"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    out = {
        (r["lang"], r["source"]): (
            r["n_docs"], r["n_kept"], r["n_final"], r["tokens_final"]
        )
        for r in curate_corpus(docs).collect()
    }
    n_good = len(good.split())
    # s1: 4 docs in, 3 past filters, dedup folds 0/1 -> 2 survivors
    assert out[("en", "s1")] == (4, 3, 2, n_good + n_good + 1)
    # s2: the same text is NOT a duplicate across this run's kept set?
    # doc 4 is an exact dup of doc 0 (dedup is corpus-wide, not per
    # group): only the canonical doc 0 survives
    assert out[("en", "s2")] == (1, 1, 0, 0)


def test_source_cap_two_phase_prune_is_exact_on_skew(spark):
    """The salted pre-prune must keep EXACTLY the rows a plain per-source
    window would: one mega-source (80 docs), one small (3), cap=5."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from uk_housing_dashboard_etl_spark.operators.curation import source_cap
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        quality_score,
    )

    words = "the value of a table is that it holds data for all to scan"
    docs = spark.createDataFrame(
        [
            # varying quality: longer repetitions of the stopword-rich text
            (i, " ".join([words] * (1 + i % 7)), "en", "mega" if i < 80 else "small")
            for i in range(83)
        ],
        ["doc_id", "text", "lang", "source"],
    )
    got = source_cap(docs, cap=5, salt_buckets=4)

    plain = (
        quality_score(docs, keep_cols=("source",))
        .withColumn(
            "source_rank",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("quality").desc(), F.col("doc_id")
                )
            ),
        )
        .where(F.col("source_rank") <= 5)
        .select("doc_id", "source", "quality", "source_rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    # quota respected: 5 from the mega source, all 3 from the small one
    sizes = {r["source"]: r["n"] for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"mega": 5, "small": 3}


def test_temperature_mix_flattens_sources(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import temperature_mix

    # source 'big' has 900 docs, 'small' has 100
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = (
        temperature_mix(docs, alpha=0.7)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    assert out.loc["small", "rate"] == 1.0  # smallest source keeps all
    assert out.loc["small", "n_kept"] == 100
    expected_big = round((100 / 900) ** 0.3, 4)
    assert abs(out.loc["big", "rate"] - expected_big) < 1e-9
    # hash-kept count lands near rate * n (deterministic, not random)
    assert 0.8 * expected_big * 900 <= out.loc["big", "n_kept"] <= 1.2 * expected_big * 900
    # alpha=1 keeps the natural distribution entirely
    nat = temperature_mix(docs, alpha=1.0).toPandas().set_index("source")
    assert nat.loc["big", "n_kept"] == 900 and nat.loc["small", "n_kept"] == 100


def test_pack_sequences_respects_budget_boundaries(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 40)) for i in range(50)],  # 40 tokens each
        ["doc_id", "text"],
    )
    out = pack_sequences(docs, budget_tokens=100, n_shards=2).toPandas()
    assert len(out) == 50 and set(out.shard) <= {0, 1}
    # bins are contiguous from 0 within each shard
    for s, g in out.groupby("shard"):
        bins = sorted(g.bin_idx.unique())
        assert bins == list(range(len(bins)))
        # a doc starts in bin floor(preceding_tokens / budget): with
        # 40-token docs and budget 100, bins hold <= 3 docs (start
        # offsets 0,40,80 fit; 120 rolls over)
        assert g.groupby("bin_idx").size().max() <= 3
    # deterministic: re-running yields identical assignment
    again = pack_sequences(docs, budget_tokens=100, n_shards=2).toPandas()
    merged = out.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged.bin_idx_a == merged.bin_idx_b).all()
    assert (merged.shard_a == merged.shard_b).all()


def test_bloom_filter_no_false_negatives_and_bounded_fp(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import (
        bloom_might_contain,
        build_bloom,
    )
    from pyspark.sql import functions as F

    members = spark.createDataFrame(
        [(f"gram-{i}",) for i in range(500)], "ngram string"
    )
    others = spark.createDataFrame(
        [(f"absent-{i}",) for i in range(2000)], "ngram string"
    )
    m_bits, k = 1 << 16, 5
    bloom = build_bloom(members, "ngram", m_bits, k)
    # bitmap is bounded by m_bits/64 rows regardless of member count
    assert bloom.count() <= m_bits // 64

    probed_in = bloom_might_contain(members, bloom, "ngram", m_bits, k)
    assert probed_in.where(~F.col("in_bloom")).count() == 0  # NEVER misses

    probed_out = bloom_might_contain(others, bloom, "ngram", m_bits, k)
    fp = probed_out.where(F.col("in_bloom")).count()
    # (1 - e^{-kn/m})^k with n=500, m=65536, k=5 -> ~4e-8; allow slack
    assert fp <= 2


def test_decontaminate_bloom_contains_exact(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import (
        decontaminate,
        decontaminate_bloom,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "a completely different sentence with no overlap here"),
            (3, "the quick brown fox jumps over the lazy dog again"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    exact = decontaminate(docs, bench, n=3, threshold=3)
    bloom = decontaminate_bloom(docs, bench, n=3, threshold=3).select(
        "doc_id", F.col("contaminated").alias("bc"), "bloom_hits"
    )
    j = {r.doc_id: r for r in exact.join(bloom, "doc_id").collect()}
    assert j[1].contaminated and j[1].bc
    assert j[3].contaminated and j[3].bc
    assert not j[2].contaminated
    for r in j.values():  # bloom only ever over-counts
        assert r.bloom_hits >= r.ngram_hits


def test_snapshot_diff_statuses(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma v2"), (4, "delta")], ["doc_id", "text"]
    )
    out = snapshot_diff(old, new).toPandas().set_index("doc_id")
    assert out.loc[1, "status"] == "removed" and out.loc[1].new_hash is None
    assert out.loc[2, "status"] == "unchanged"
    assert out.loc[3, "status"] == "changed"
    assert out.loc[4, "status"] == "added" and out.loc[4].old_hash is None


def test_importance_resample_deterministic_and_complete(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import (
        importance_resample,
    )
    from pyspark.sql import functions as F

    rows = [
        (i, ("target words alpha beta" if i % 3 == 0 else "other stuff gamma delta"), )
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "tgt", F.col("doc_id") % 3 == 0
    )
    out1 = importance_resample(df, F.col("tgt"), k=10).toPandas()
    out2 = importance_resample(df, F.col("tgt"), k=10).toPandas()
    # derandomized noise -> identical selection on rerun
    assert out1.equals(out2)
    assert len(out1) == 10 and list(out1["rank"]) == list(range(1, 11))
    # keys are finite (u strictly inside (0,1) by the +0.5 offset)
    assert out1.sample_key.notna().all()
    # ranks follow the key order with doc_id tie-break
    sk = list(out1.sort_values(["rank"]).sample_key)
    assert sk == sorted(sk, reverse=True)


def test_split_leakage_flags_cross_split_near_dups(spark):
    from uk_housing_dashboard_etl_spark.operators.curation import (
        dataset_split,
        split_leakage,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    # find ids landing in train vs eval under the real hash split
    probe = dataset_split(
        spark.range(0, 60).withColumnRenamed("id", "doc_id"), "doc_id"
    ).toPandas()
    train_ids = list(probe[probe.split == "train"].doc_id)
    eval_ids = list(probe[probe.split != "train"].doc_id)
    assert train_ids and eval_ids
    t0, t1, e0 = train_ids[0], train_ids[1], eval_ids[0]
    rows = [
        (int(t0), base),                              # leaks: near-dup of e0
        (int(e0), base.replace("lazy", "sleepy")),    # eval twin
        (int(t1), "completely unrelated text about catalyst plans"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = split_leakage(df, threshold=0.5).toPandas().set_index("doc_id")
    assert bool(out.loc[t0, "leaky"]) and out.loc[t0, "leaks_to"] == e0
    assert not out.loc[t1, "leaky"] and out.loc[t1, "n_eval_dups"] == 0
    assert e0 not in out.index  # output is train docs only
    # minhash path flags the same leak
    out2 = (
        split_leakage(df, threshold=0.5, method="minhash")
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out2.loc[t0, "leaky"])
