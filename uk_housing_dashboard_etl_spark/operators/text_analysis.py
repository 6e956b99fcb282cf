"""Text-analysis operators for training-data curation pipelines.

- ``text_stats``      : length/token/punctuation/stopword quality metrics
- ``quality_score``   : composite 0-1 heuristic from those metrics
- ``lang_id``         : n-gram-free stopword-overlap language heuristic
- ``doc_fingerprint`` : order-sensitive polynomial rolling hash

Everything is built-in column expressions (split/filter/aggregate/
regexp) — one scan, no shuffle, no Python on executors. All ratios are
exact integer ratios in double, so cross-engine comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.rounding import dsum, round4
from uk_housing_dashboard_etl_spark.functions.topk import deterministic_topk

# Tiny per-language stopword sets (top function words). Deterministic
# lexicons, not a model — the point is the *operator shape*: token-set
# overlap scoring per language, argmax with a fixed tie order.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "por"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "les", "des", "en"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "中"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]

FP_MOD = 1_000_000_000_000_003  # fits acc*31+255 in int64, no overflow

_PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"
_BPE_TOKEN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def _tokens(text_col: str) -> F.Column:
    # array_remove: split("") yields [""] — an empty or whitespace-only
    # document must count 0 tokens (ratios over n_tokens go null, the
    # correct "no content" answer), not 1 empty token. coalesce: NULL
    # text likewise has 0 tokens — token COUNTS are counts and never
    # null; char-level stats (n_chars etc.) stay null-faithful since
    # they derive from the raw text column.
    return F.array_remove(
        F.split(
            F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
        ),
        "",
    )


def text_stats(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics used by quality filters.

    n_chars, n_tokens (whitespace), n_bpe_tokens (BPE-ish regex pieces),
    avg_token_len, punct_ratio, digit_ratio, stopword_ratio (English
    function words), all exact.
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    nonspace = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), _PUNCT_CLASS, ""))
    digits = n_chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
    # explicit 0-denominator guards: ANSI mode (Spark 4 default) makes
    # 0/0 an ERROR, not null — a token-less or empty doc reports null
    # ratios (undefined), found by the empty-input property tests
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{_BPE_TOKEN}', 0)")).alias(
            "n_bpe_tokens"
        ),
        round4(F.when(n_tokens > 0, nonspace / n_tokens)).alias(
            "avg_token_len"
        ),
        round4(F.when(n_chars > 0, punct / n_chars)).alias("punct_ratio"),
        round4(F.when(n_chars > 0, digits / n_chars)).alias("digit_ratio"),
        round4(F.when(n_tokens > 0, stop_hits / n_tokens)).alias(
            "stopword_ratio"
        ),
    )


def quality_score(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Composite quality heuristic in [0,1]:
    0.4·stopword_signal + 0.3·length_signal + 0.3·(1 − punct_noise).

    Built from the UNROUNDED ratios (rounding only the final score) so the
    composite is exact integer-ratio math until the last step.
    ``keep_cols`` carries extra pass-through columns (e.g. ``source``)
    so composing operators stay single-scan instead of joining back."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), _PUNCT_CLASS, ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
    stopword_ratio = stop_hits / n_tokens
    punct_ratio = punct / n_chars
    # n_tokens > 0 implies n_chars > 0, so one guard covers both ANSI
    # 0/0 traps; a token-less doc has ZERO quality by definition
    score = F.when(
        n_tokens > 0,
        F.lit(0.4) * F.least(F.lit(1.0), stopword_ratio * 5)
        + F.lit(0.3) * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 10)),
    ).otherwise(F.lit(0.0))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        round4(score).alias("quality"),
        *keep_cols,
    )


def lang_id(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language heuristic.

    One column per language with the count of its function words among
    the doc's tokens; prediction = argmax with fixed LANG_ORDER
    tie-break (a deterministic CASE chain, identical in the SQL oracle).
    """
    toks = _tokens(text_col)

    def _hits(words: list[str]) -> F.Column:
        # NB: the lambda must take exactly one param — F.filter interprets
        # a second param as the array index.
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    scores = {lang: _hits(ws) for lang, ws in STOPWORDS.items()}
    # first-match-wins CASE chain: ties resolve to the earlier language
    pred = None
    for lang in LANG_ORDER:
        cond = None
        for other in LANG_ORDER:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    out_scores = [scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER]
    return documents.select(
        F.col(id_col).alias("doc_id"), *out_scores, pred.alias("predicted_lang")
    )


def top_ngrams(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 50,
) -> DataFrame:
    """Corpus-wide top-k word n-grams by frequency (vocab/boilerplate
    analysis). Deterministic cut: rank by (count desc, ngram asc).

    One explode + one hash aggregate (map-side combinable) + distributed
    top-k (TakeOrderedAndProject; see functions/topk.py) over the
    aggregated (ngram-grain) frame — at corpus scale the ngram vocabulary
    is huge, so the cut must never funnel it through one partition.
    """
    toks = _tokens(text_col)
    grams = F.expr(
        f"""CASE WHEN size(__toks) < {n} THEN array()
             ELSE transform(sequence(0, size(__toks) - {n}),
                            i -> concat_ws(' ', slice(__toks, i + 1, {n})))
            END"""
    )
    counts = (
        documents.select(toks.alias("__toks"))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = deterministic_topk(
        counts, [F.col("freq").desc(), F.col("ngram")], k
    )
    return ranked.select("ngram", "freq", "rank")


def repetition_stats(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    flag_threshold: float = 0.2,
) -> DataFrame:
    """Within-document repetition metrics (Gopher-style quality rule):
    the fraction of repeated word ``n``-grams and repeated tokens inside
    each document. Highly repetitive docs (boilerplate, keyword spam,
    degenerate generations) get ``repetitive = true``.

    dup_ngram_ratio = 1 − distinct_ngrams/total_ngrams (0 when a doc has
    no n-grams); dup_token_ratio likewise over single tokens. Pure
    row-local array expressions — one scan, zero shuffles, exact integer
    ratios so the oracle comparison is bit-exact.
    """
    # coalesce: NULL text is no content — size(null) is null and the
    # repeated-gram TOTALS would go null instead of 0
    toks = F.array_remove(
        F.split(
            F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
        ),
        "",
    )
    grams = F.expr(
        f"""CASE WHEN size(__toks) < {n} THEN array()
             ELSE transform(sequence(0, size(__toks) - {n}),
                            i -> concat_ws(' ', slice(__toks, i + 1, {n})))
            END"""
    )
    base = documents.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).select("doc_id", "__toks", grams.alias("__grams"))
    n_tokens = F.size(F.col("__toks"))
    total = F.size(F.col("__grams"))
    distinct = F.size(F.array_distinct(F.col("__grams")))
    distinct_toks = F.size(F.array_distinct(F.col("__toks")))
    dup_ngram = F.when(total > 0, 1.0 - distinct / total).otherwise(F.lit(0.0))
    dup_token = F.when(
        n_tokens > 0, 1.0 - distinct_toks / n_tokens
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        total.alias("total_ngrams"),
        distinct.alias("distinct_ngrams"),
        round4(dup_ngram).alias("dup_ngram_ratio"),
        round4(dup_token).alias("dup_token_ratio"),
        (round4(dup_ngram) > F.lit(flag_threshold)).alias("repetitive"),
    )


def doc_fingerprint(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive polynomial rolling hash of the normalized text:
    fold over code points of h → (h·31 + code) mod FP_MOD.

    Sequential integer fold — bit-identical everywhere; anagrams get
    different fingerprints (unlike bag-of-words hashes)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    fp = F.expr(
        f"""aggregate(
              transform(sequence(1, length(__norm)), i -> ascii(substring(__norm, i, 1))),
              CAST(0 AS BIGINT),
              (acc, c) -> (acc * 31 + c) % {FP_MOD}
            )"""
    )
    return documents.select(
        F.col(id_col).alias("doc_id"), norm.alias("__norm")
    ).select("doc_id", fp.alias("fingerprint"))


def filter_funnel(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    min_quality: float = 0.5,
    max_dup_ngram: float = 0.2,
    langs: tuple[str, ...] = ("en",),
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The curation keep/drop funnel (C4/Gopher-style): length, quality,
    repetition and language rules evaluated in ONE pass, with the first
    failing rule recorded as ``drop_reason``.

    Everything is row-local column math (no joins between the metric
    marts, no shuffle at any corpus size); rule thresholds compare
    4dp-rounded values so the decision is bit-identical across engines.
    ``carry_cols`` are passed through untouched so composed pipelines
    (see ``curation.curate_corpus``) can stay single-scan instead of
    joining the verdict back to the source table.
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), _PUNCT_CLASS, ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
    # same n_tokens > 0 guard as quality_score: CASE laziness protects
    # the too_short branch, but the funnel must stay total on empty
    # docs even if a caller sets min_tokens = 0
    quality = round4(
        F.when(
            n_tokens > 0,
            F.lit(0.4) * F.least(F.lit(1.0), (stop_hits / n_tokens) * 5)
            + F.lit(0.3) * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
            + F.lit(0.3)
            * (F.lit(1.0) - F.least(F.lit(1.0), (punct / n_chars) * 10)),
        ).otherwise(F.lit(0.0))
    )
    grams = F.expr(
        """CASE WHEN size(__toks) < 2 THEN array()
             ELSE transform(sequence(0, size(__toks) - 2),
                            i -> concat_ws(' ', slice(__toks, i + 1, 2)))
            END"""
    )
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias(text_col),
        toks.alias("__toks"),
        *carry_cols,
    ).select("doc_id", text_col, "__toks", grams.alias("__grams"), *carry_cols)
    total = F.size(F.col("__grams"))
    dup = round4(
        F.when(
            total > 0, 1.0 - F.size(F.array_distinct(F.col("__grams"))) / total
        ).otherwise(F.lit(0.0))
    )

    def _hits(words: list[str]) -> F.Column:
        # one-param lambda only: F.filter treats a 2nd param as the index
        return F.size(F.filter(F.col("__toks"), lambda t: t.isin(words)))

    scores = {lang: _hits(ws) for lang, ws in STOPWORDS.items()}
    pred = None
    for lang in LANG_ORDER:
        cond = None
        for other in LANG_ORDER:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))

    n_toks2 = F.size(F.col("__toks"))
    drop_reason = (
        F.when(n_toks2 < min_tokens, F.lit("too_short"))
        .when(quality < F.lit(min_quality), F.lit("low_quality"))
        .when(dup > F.lit(max_dup_ngram), F.lit("repetitive"))
        .when(~pred.isin(*langs), F.lit("wrong_lang"))
        .otherwise(F.lit(None).cast("string"))
    )
    # recompute quality/stop exprs against base's text column
    return base.select(
        "doc_id",
        n_toks2.alias("n_tokens"),
        quality.alias("quality"),
        dup.alias("dup_ngram_ratio"),
        pred.alias("predicted_lang"),
        drop_reason.alias("drop_reason"),
        drop_reason.isNull().alias("keep"),
        *carry_cols,
    )


def tfidf_top_terms(
    documents: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic keyword/salience
    extractor a curation pipeline uses to profile a corpus.

    tf = term count within the doc, idf = ln(N / df) with df = number of
    docs containing the term. Scores are rounded to 4dp BEFORE ranking
    (with a term-asc tie-break) so the cut is deterministic and matches
    the DuckDB oracle bit-for-bit.

    Plan shape: ONE corpus scan — explode → (doc, term) count (map-side
    combinable), then df as a count window over the tf frame partitioned
    by term (a shuffle of the compact (doc, term, tf) rows, NOT a
    broadcast of the term dictionary, which at corpus scale is billions
    of entries) → per-doc window top-k (Spark's WindowGroupLimit pushes
    the rank-≤-k cut map-side). N is a 1-row broadcast from a
    column-pruned count scan, never a driver collect. Document bodies
    are never shuffled.
    """
    from uk_housing_dashboard_etl_spark.operators.dedup import _norm_text

    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(_norm_text(F.col(text_col)), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = documents.select(F.count(F.lit(1)).alias("n_docs"))
    w_term = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_term))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            round4(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


def ngram_novelty(
    documents: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty: the fraction of its distinct word n-grams
    that appear in NO other document (global df = 1).

    High-novelty docs carry fresh content; low-novelty docs are
    boilerplate/template — the cheap corpus-level signal between exact
    dedup (too strict) and MinHash (pairwise). Docs with fewer than ``n``
    tokens have no n-grams and are excluded (matches the oracle).

    Plan: distinct shingles per doc → shingle-keyed global df (map-side
    combinable) → doc-keyed ratio aggregate. Both shuffles carry
    (doc_id, shingle) — at petabyte scale you would pre-hash the shingle
    to a long (xxhash64) to shrink the exchange; kept as strings here for
    bit-exact oracle parity.
    """
    from uk_housing_dashboard_etl_spark.operators.dedup import _word_shingles

    sh = _word_shingles(documents, text_col, id_col, n, distinct=True)
    w = Window.partitionBy("shingle")
    tagged = sh.select(
        "doc_id", (F.count(F.lit(1)).over(w) == 1).alias("is_novel")
    )
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(F.col("is_novel").cast("int")).alias("novel_ngrams"),
        round4(
            F.sum(F.col("is_novel").cast("int"))
            / F.count(F.lit(1)).cast("double")
        ).alias("novelty"),
    )


def _doc_tf(
    documents: DataFrame,
    text_col: str,
    id_col: str,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, term, tf) unigram counts — the shared frame under the
    LM-style scorers. One explode + one map-side-combinable groupBy;
    document bodies are never shuffled, only the compact count rows.
    ``keep_cols`` must be constant per document (e.g. ``source``)."""
    from uk_housing_dashboard_etl_spark.operators.dedup import _norm_text

    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        *keep_cols,
        F.explode(F.split(_norm_text(F.col(text_col)), " ")).alias("term"),
    ).where(F.col("term") != "")
    return toks.groupBy("doc_id", "term", *keep_cols).agg(
        F.count(F.lit(1)).alias("tf")
    )


def lm_scores(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram-LM quality signals — the model-free analogue
    of the CCNet/KenLM perplexity filter:

    - ``entropy``       : Shannon entropy of the doc's OWN unigram
      distribution, Σ (tf/len)·ln(len/tf). Low ⇒ repetitive/templated
      text (complements ``repetition_stats``).
    - ``cross_entropy`` : (1/len)·Σ tf·ln(corpus_total/corpus_count) —
      token-level cross-entropy under the corpus unigram LM
      (= ln perplexity). High ⇒ rare-token/gibberish-heavy; low ⇒
      stereotyped high-frequency text. The standard curation axis when
      a trained LM isn't available.

    Both float sums go through the order-independent fixed-point
    ``dsum`` so partial-aggregation order can never perturb the 4dp
    result (every ln contribution is quantized identically in Spark and
    the DuckDB oracle before the exact integer sum).

    Plan: ONE corpus scan → compact (doc, term, tf) counts → corpus term
    counts as a sum-window over the tf frame (term-keyed shuffle of
    count rows, never a term-dictionary broadcast — at 100 TB that
    dictionary is billions of entries) → doc-keyed window for lengths →
    per-doc aggregate. The 1-row corpus token total broadcasts; no
    global window (which would funnel the frame through one partition).
    """
    tf = _doc_tf(documents, text_col, id_col)
    total = tf.agg(F.sum("tf").alias("__total"))
    w_term = Window.partitionBy("term")
    w_doc = Window.partitionBy("doc_id")
    scored = (
        tf.withColumn("ctf", F.sum("tf").over(w_term))
        .withColumn("doc_len", F.sum("tf").over(w_doc))
        .crossJoin(F.broadcast(total))
    )
    ent_contrib = F.col("tf") * F.log(
        F.col("doc_len").cast("double") / F.col("tf")
    )
    ce_contrib = F.col("tf") * F.log(
        F.col("__total").cast("double") / F.col("ctf")
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_terms"),
        round4(dsum(ent_contrib) / F.sum("tf")).alias("entropy"),
        round4(dsum(ce_contrib) / F.sum("tf")).alias("cross_entropy"),
    )


def dsir_scores(
    documents: DataFrame,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance score (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document average
    log-likelihood ratio between a TARGET-domain unigram LM and the
    corpus unigram LM,

        score(d) = (1/len)·Σ_t tf_t·( ln p̂_target(t) − ln p̂_corpus(t) )

    with add-one smoothing on the target model — p̂_target(t) =
    (target_tf + 1)/(target_total + V), V = corpus vocabulary size — so
    terms absent from the target stay finite. Docs scoring high look
    like the target domain; resampling by this score up-weights them.
    ``target`` is a boolean Column over ``documents`` (e.g.
    ``F.col("source") == "src0"``) marking the in-domain exemplars.

    Plan (round-8 revision): both models come from the same
    (doc, term, tf) frame. Corpus and target term counts are ONE
    vocabulary-grain aggregate (``term_stats`` — the target count is a
    conditional sum inside it), joined back to the tf frame unhinted so
    AQE broadcasts it while it fits; the token totals and vocabulary
    size DERIVE from that same vocab-sized aggregate (a second tiny
    agg), so nothing re-scans the corpus-sized tf frame. The r3-r7
    version computed the per-term counts as two sum-windows (a
    term-keyed sort the aggregate doesn't need) and the totals as a
    separate aggregate over the full tf frame (a second corpus-scale
    pass); measured at sf0.1 the rewrite is 0.87 s vs 0.97 s best-of-5
    on the resample path with bit-identical output. Float summation
    is fixed-point (``dsum``) — deterministic under any partial-agg
    order. All-integer ratios inside the two ``ln``s ⇒ bit-identical in
    the DuckDB oracle.
    """
    docs = documents.withColumn("__tgt", target)
    tf = _doc_tf(docs, text_col, id_col, keep_cols=("__tgt",))
    tgt_tf = F.sum(F.when(F.col("__tgt"), F.col("tf")).otherwise(F.lit(0)))
    term_stats = tf.groupBy("term").agg(
        F.sum("tf").alias("ctf"), tgt_tf.alias("ttf")
    )
    totals = term_stats.agg(
        F.sum("ctf").alias("__total"),
        F.sum("ttf").alias("__tgt_total"),
        F.count(F.lit(1)).alias("__vocab"),
    )
    scored = tf.join(term_stats, "term").crossJoin(F.broadcast(totals))
    llr = F.col("tf") * (
        F.log(
            (F.col("ttf") + F.lit(1)).cast("double")
            / (F.col("__tgt_total") + F.col("__vocab"))
        )
        - F.log(F.col("ctf").cast("double") / F.col("__total"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.max(F.col("__tgt").cast("int")).cast("boolean").alias("is_target"),
        round4(dsum(llr) / F.sum("tf")).alias("dsir_score"),
    )

def source_overlap(
    documents: DataFrame,
    n: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise word-``n``-gram Jaccard between corpus SOURCES — the
    dataset-card contamination matrix ("how much of src A is already in
    src B?"). High containment flags a source that's a re-crawl/mirror
    of another; the per-doc analogues are ``ngram_jaccard_pairs`` (pair
    grain) and ``decontaminate`` (benchmark grain).

    Emits one row per unordered source pair that shares at least one
    n-gram: shared counts, per-source distinct totals, Jaccard
    (shared / union) and containment (shared / smaller side), both 4dp.

    Plan: ONE corpus scan → distinct (source, shingle) (the corpus
    collapses to its per-source vocabulary) → per-shingle sorted source
    set → pairs generated ROW-LOCALLY from each set (a shingle held by
    S sources expands to S²/2 combination rows, bounded by the SOURCE
    count, never by corpus rows — and without the shingle-keyed
    self-join, whose probe side would re-scan the corpus). Per-source
    totals and pair counts both aggregate off the same per-shingle
    frame, so the exchange is reused rather than recomputed; both are
    source-grain (tiny) and broadcast back onto the pair rows.
    """
    from uk_housing_dashboard_etl_spark.operators.dedup import _word_shingles

    vocab = _word_shingles(
        documents, text_col, source_col, n=n, distinct=True
    ).withColumnRenamed("doc_id", "source")
    per_sh = vocab.groupBy("shingle").agg(
        F.sort_array(F.collect_set("source")).alias("srcs")
    )
    sizes = per_sh.select(F.explode("srcs").alias("source")).groupBy(
        "source"
    ).agg(F.count(F.lit(1)).alias("n_shingles"))
    pair_expr = F.expr(
        "flatten(transform(sequence(0, size(srcs) - 2), i ->"
        " transform(slice(srcs, i + 2, size(srcs) - i - 1),"
        " s -> struct(srcs[i] AS source_a, s AS source_b))))"
    )
    shared = (
        per_sh.where(F.size("srcs") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.source_a").alias("source_a"), F.col("p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n_shingles").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n_shingles").alias("n_b")))
    out = shared.join(sa, "source_a").join(sb, "source_b")
    union = F.col("n_a") + F.col("n_b") - F.col("shared_ngrams")
    return out.select(
        "source_a",
        "source_b",
        "shared_ngrams",
        "n_a",
        "n_b",
        round4(F.col("shared_ngrams") / union).alias("jaccard"),
        round4(
            F.col("shared_ngrams") / F.least(F.col("n_a"), F.col("n_b"))
        ).alias("containment"),
    )

def bm25_scores(
    documents: DataFrame,
    terms: list[str],
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25 (the
    Lucene/Okapi form):

        score(d) = Σ_t  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen))
        idf(t)   = ln( (N − df + 0.5)/(df + 0.5) + 1 )

    The retrieval scorer a curation pipeline uses to mine docs matching
    a probe query (contamination audits, targeted subsets). Fully
    deterministic: per-term contributions go through the fixed-point
    ``dsum``, the final score is 4dp-rounded BEFORE the rank cut, ties
    break on doc_id.

    Plan: the corpus scans once into the compact (doc, term, tf) frame,
    which the broadcast term list immediately prunes to query terms only
    — everything downstream (df window, lens join, scoring, top-k) runs
    on rows-that-match, a vanishing fraction of the corpus. Doc lengths
    come from a second row-local scan joined doc-keyed (the pruned side
    broadcasts when small). N and avglen ride one 1-row broadcast.
    Global top-k compiles to TakeOrderedAndProject — per-partition
    k-row heaps, never a single-partition window.
    """
    from uk_housing_dashboard_etl_spark.operators.dedup import _norm_text

    tf = _doc_tf(documents, text_col, id_col).where(
        F.col("term").isin([t.lower() for t in terms])
    )
    lens = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.filter(
                F.split(_norm_text(F.col(text_col)), " "), lambda t: t != ""
            )
        ).alias("doc_len"),
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("doc_len").cast("double") / F.count(F.lit(1))).alias("avglen"),
    )
    w_term = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_term))
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("doc_len") / F.col("avglen")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matched_terms"),
        round4(dsum(contrib)).alias("bm25"),
    )
    ranked = deterministic_topk(
        per_doc, [F.col("bm25").desc(), F.col("doc_id")], k
    )
    return ranked.select("doc_id", "n_matched_terms", "bm25", "rank")


def perplexity_buckets(
    documents: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank every
    document by its cross-entropy under the corpus unigram LM WITHIN its
    language, then cut into ``n_buckets`` equal-frequency buckets —
    head (lowest perplexity / most fluent), middle, tail. CCNet keeps
    head+middle and drops or down-weights tail; the per-language split
    matters because absolute perplexity is not comparable across
    languages.

    Output: ``doc_id, lang, cross_entropy, bucket`` (1-based) and
    ``bucket_label`` (head/middle/tail when ``n_buckets == 3``, else
    ``b<i>``).

    Plan: one corpus scan feeds :func:`lm_scores` (term-keyed + doc-keyed
    exchanges); language tags join back on doc_id. The ntile is a
    per-language sort — exact equal-frequency cuts, kept for bit-exact
    oracle parity (cross_entropy is pre-rounded to 4dp, doc_id breaks
    ties, so the rank order is engine-independent). At 100 TB you would
    replace the full per-language sort with approx-percentile cutpoints
    (one aggregate, cutpoints broadcast, bucket assignment a comparison
    — no sort); the bucket boundaries then carry the sketch's rank
    error, which CCNet tolerates by design.
    """
    scores = lm_scores(documents, text_col, id_col)
    langs = documents.select(
        F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
    )
    w = Window.partitionBy("lang").orderBy("cross_entropy", "doc_id")
    bucket = F.ntile(n_buckets).over(w)
    if n_buckets == 3:
        label = (
            F.when(bucket == 1, F.lit("head"))
            .when(bucket == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    else:
        label = F.concat(F.lit("b"), bucket.cast("string"))
    return (
        scores.join(langs, "doc_id")
        .select(
            "doc_id",
            "lang",
            "cross_entropy",
            bucket.alias("bucket"),
            label.alias("bucket_label"),
        )
    )


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the retrieval/context-window chunker (embedding indexing, long-doc
    training prep). Stride = ``chunk_tokens − overlap``; the last chunk
    may be shorter; a doc shorter than one chunk yields exactly one.

    Output: ``doc_id, chunk_idx, start_token, chunk_len, chunk_text,
    chunk_md5`` — one row per chunk, deterministic given the tokenizer
    (whitespace here), so chunk ids are stable across reruns and the
    md5 keys chunk-level dedup/caching.

    Plan: pure codegen — tokenize once, compute the chunk count
    ``1 + ceil((n − chunk)/stride)`` per doc, posexplode the start
    offsets, slice. No shuffle at all: chunking is embarrassingly
    row-local, the shape you want feeding a downstream embed stage.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_tokens "
            f"({chunk_tokens})"
        )
    # array_remove: an empty doc is [] — it still yields exactly one
    # chunk (the documented short-doc rule) but with chunk_len 0 and
    # empty chunk_text, not a phantom 1-token "" chunk. coalesce: NULL
    # text means no content too — without it size(__toks) is null and
    # least(chunk_tokens, null - start) silently reports a full-length
    # chunk (least IGNORES nulls), found by the null-text fuzz probe.
    toks = F.array_remove(
        F.split(
            F.lower(
                F.trim(
                    F.regexp_replace(
                        F.coalesce(F.col(text_col), F.lit("")), r"\s+", " "
                    )
                )
            ),
            r"\s+",
        ),
        "",
    )
    base = documents.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).withColumn(
        "__n_chunks",
        (
            F.lit(1)
            + F.greatest(
                F.lit(0),
                F.ceil(
                    (F.size("__toks") - F.lit(chunk_tokens))
                    / F.lit(float(stride))
                ),
            )
        ).cast("int"),
    )
    starts = F.expr(
        f"transform(sequence(0, __n_chunks - 1), i -> i * {stride})"
    )
    chunk = F.expr(f"slice(__toks, start_token + 1, {chunk_tokens})")
    return (
        base.select(
            "doc_id",
            F.size("__toks").alias("__n"),
            F.posexplode(starts).alias("chunk_idx", "start_token"),
            "__toks",
        )
        .select(
            "doc_id",
            "chunk_idx",
            "start_token",
            F.least(
                F.lit(chunk_tokens), F.col("__n") - F.col("start_token")
            ).alias("chunk_len"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
        .withColumn("chunk_md5", F.md5(F.col("chunk_text")))
    )


def bpe_merge_candidates(
    documents: DataFrame,
    top_n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One BPE training iteration at corpus scale: frequency of every
    adjacent character pair inside words, ranked — the merge table a
    byte-pair-encoding tokenizer trainer consumes (Sennrich et al.
    2016). Full BPE is a driver loop (apply top merge, recount); this
    is the distributed inner step, starting from the character vocab.

    Output: ``rank, pair, n_occurrences`` (top ``top_n``, count-desc
    with pair tie-break).

    Plan: the corpus collapses to DISTINCT-word counts first (word-keyed
    combinable aggregate — at 100 TB distinct words are orders of
    magnitude fewer than tokens), pairs explode from that compact frame
    weighted by word frequency, and the pair aggregate is map-side
    combinable over ≤ |alphabet|² keys. The final rank is the
    TakeOrderedAndProject top-N.
    """
    from uk_housing_dashboard_etl_spark.functions.topk import (
        deterministic_topk,
    )

    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))),
        r"\s+",
    )
    word_counts = (
        documents.select(F.explode(toks).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_words"))
    )
    pair_expr = F.expr(
        "transform(sequence(1, length(word) - 1),"
        " i -> substring(word, i, 2))"
    )
    pairs = word_counts.select(
        F.explode(pair_expr).alias("pair"), "n_words"
    ).groupBy("pair").agg(F.sum("n_words").alias("n_occurrences"))
    return deterministic_topk(
        pairs, [F.col("n_occurrences").desc(), F.col("pair")], top_n
    )


def pmi_pairs(
    documents: DataFrame,
    top_n: int = 50,
    min_support: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top word pairs by pointwise mutual information over document
    co-occurrence: PMI(a,b) = ln(N·c_ab / (c_a·c_b)) with document
    frequencies — the classic collocation/association statistic behind
    phrase mining and embedding-era co-occurrence matrices
    (word2vec/GloVe train on exactly these counts).

    ``min_support`` drops rare pairs whose PMI is high by accident (the
    standard correction); ranking is total (PMI desc, then pair).

    Plan: distinct (doc, word) → per-doc pair fan-out via a doc-keyed
    self-join — quadratic in each DOCUMENT'S vocabulary (bounded by doc
    length), linear in documents, and the pair aggregate combines
    map-side. At web scale cap per-doc vocabulary first (sample or
    truncate long docs) — the fan-out bound is then a constant. The
    PMI ratio is integer·integer / integer·integer in one double
    divide, so both engines compute the identical ln input.
    """
    from uk_housing_dashboard_etl_spark.functions.topk import (
        deterministic_topk,
    )

    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))),
        r"\s+",
    )
    dw = (
        documents.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )
    n_docs = dw.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("__n_docs")
    )
    cw = dw.groupBy("word").agg(F.count(F.lit(1)).alias("__cw"))
    a = dw.alias("a")
    b = dw.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .groupBy(
            F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b")
        )
        .agg(F.count(F.lit(1)).alias("n_docs_both"))
        .where(F.col("n_docs_both") >= min_support)
    )
    ca = cw.select(F.col("word").alias("word_a"), F.col("__cw").alias("__ca"))
    cb = cw.select(F.col("word").alias("word_b"), F.col("__cw").alias("__cb"))
    scored = (
        pairs.join(ca, "word_a")
        .join(cb, "word_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "word_a",
            "word_b",
            "n_docs_both",
            round4(
                F.log(
                    (F.col("__n_docs") * F.col("n_docs_both"))
                    / (F.col("__ca") * F.col("__cb"))
                )
            ).alias("pmi"),
        )
    )
    return deterministic_topk(
        scored,
        [F.col("pmi").desc(), F.col("word_a"), F.col("word_b")],
        top_n,
    )


def rrf_fusion(
    documents: DataFrame,
    term_sets: list[list[str]],
    k: int = 50,
    k_rrf: int = 60,
    depth: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of several BM25 probe-query rankings:

        rrf(d) = Σ_lists  1 / (k_rrf + rank_list(d))

    The standard way a curation pipeline merges retrieval lists from
    different probe queries (or scorers) into one mining set without
    calibrating their score scales. Each list is the top-``depth`` BM25
    result for one term set; a doc absent from a list contributes 0.

    Determinism: each contribution is snapped to exact 1e-4 units with
    the floor(x+0.5) IEEE sequence (``rounding.py``), summed as bigint,
    final rank ties break on doc_id.

    Plan: each BM25 list is already a ``depth``-row frame (see
    ``bm25_scores`` — TakeOrderedAndProject, corpus scanned per list but
    never shuffled); the fusion full-outer-join runs over ≤ Σ depth rows,
    driver-trivial at any corpus size.
    """
    fused = None
    for i, terms in enumerate(term_sets):
        ranked = bm25_scores(
            documents, terms, k=depth, text_col=text_col, id_col=id_col
        ).select("doc_id", F.col("rank").alias(f"rank_{i}"))
        fused = (
            ranked
            if fused is None
            else fused.join(ranked, "doc_id", "full_outer")
        )
    unit_terms = []
    hit_terms = []
    for i in range(len(term_sets)):
        r = F.col(f"rank_{i}")
        unit_terms.append(
            F.when(
                r.isNotNull(),
                F.floor(
                    F.lit(10000.0) / (F.lit(float(k_rrf)) + r) + F.lit(0.5)
                ),
            ).otherwise(F.lit(0))
        )
        hit_terms.append(F.when(r.isNotNull(), 1).otherwise(0))
    units = sum(unit_terms[1:], unit_terms[0])
    n_lists = sum(hit_terms[1:], hit_terms[0])
    scored = fused.select(
        "doc_id",
        n_lists.cast("int").alias("n_lists"),
        units.cast("bigint").alias("__units"),
    ).withColumn("rrf", F.col("__units").cast("double") / F.lit(10000.0))
    return deterministic_topk(
        scored, [F.col("__units").desc(), F.col("doc_id")], k
    ).select("doc_id", "n_lists", "rrf", "rank")


def quality_calibrate(
    documents: DataFrame,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source quantile calibration of the composite quality score.

    A global quality threshold systematically biases against whole
    sources (a clean-prose source dominates the top of a raw-score cut);
    the standard fix is to rank WITHIN each source and threshold the
    per-source percentile instead. Emits percent_rank within source
    (ties broken by doc_id so the rank is a total order) and the keep
    flag at ``threshold``.

    Plan: one corpus scan computes the score (pure column exprs), one
    shuffle partitions by source for the rank window. Source cardinality
    is bounded, but one giant source serializes into a single reducer —
    at scale swap the exact window for a per-source KLL quantile sketch
    cut (``operators/sketches.py``), which needs no per-source sort.
    """
    q = quality_score(
        documents, text_col=text_col, id_col=id_col, keep_cols=("source",)
    )
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    return (
        q.select(
            "doc_id",
            "source",
            "quality",
            round4(F.percent_rank().over(w)).alias("src_pctile"),
        )
        .withColumn(
            "keep", (F.col("src_pctile") >= F.lit(threshold)).cast("int")
        )
    )


def vocab_growth(
    documents: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law vocabulary growth curve over the corpus in doc-id order.

    Buckets the corpus into ``n_buckets`` contiguous doc-id ranges and
    reports, per bucket, the running token total and the running number
    of DISTINCT terms (a term counts in the bucket where it first
    appears). The curve is the standard corpus-card diagnostic for
    vocabulary saturation / dedup effectiveness.

    Plan: bucket = floor(doc_id·B/(max_id+1)) — exact integer math off a
    1-row max collected once up front (a sanctioned driver-side scalar,
    like the similarity query side), so no global sort or ntile, and the
    two downstream aggregation branches don't each recompute the max
    subtree. First appearance is min(bucket) per term: one shuffle keyed
    by term with map-side combine. The cumulative sums run a window over
    B rows (constant).
    """
    from uk_housing_dashboard_etl_spark.operators.dedup import _norm_text

    max_id = documents.agg(
        F.max(F.col(id_col)).cast("bigint")
    ).collect()[0][0]
    if max_id is None:
        # empty corpus: no bucket boundaries exist — return an empty
        # frame with the output schema instead of int(None) blowing up
        return documents.sparkSession.createDataFrame(
            [],
            "bucket int, n_docs bigint, tokens_cum bigint, vocab_cum bigint",
        )
    b = F.floor(
        F.col(id_col).cast("bigint")
        * F.lit(n_buckets)
        / F.lit(int(max_id) + 1)
    ).cast("int")
    docs = documents.select(
        F.col(id_col).alias("doc_id"),
        b.alias("bucket"),
        F.size(
            F.filter(
                F.split(_norm_text(F.col(text_col)), " "), lambda t: t != ""
            )
        ).alias("__len"),
        F.split(_norm_text(F.col(text_col)), " ").alias("__toks"),
    )
    per_bucket = docs.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("__len").alias("__tokens")
    )
    first_seen = (
        docs.select("bucket", F.explode("__toks").alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__new_terms"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(first_seen, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            F.sum("__tokens").over(w).alias("tokens_cum"),
            F.sum(F.coalesce(F.col("__new_terms"), F.lit(0)))
            .over(w)
            .alias("vocab_cum"),
        )
        .orderBy("bucket")
    )


def strip_boilerplate_chunks(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 10,
    max_chunk_df: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate removal at fixed token-chunk grain —
    the CCNet/RefinedWeb line-dedup move, generalized to corpora whose
    documents carry no newline structure: split each normalized doc
    into consecutive ``chunk_tokens``-token chunks, drop every chunk
    whose corpus document frequency exceeds ``max_chunk_df`` (headers,
    footers, license blocks, navigation text — anything repeated
    verbatim across more docs than independent authorship explains),
    and reassemble the survivors in order.

    Output: one row per input document — (doc_id, n_chunks, n_removed,
    clean_text). Documents whose every chunk is boilerplate come back
    with ``clean_text = ''`` (they are pure template; downstream
    quality filters drop them).

    Plan, scale-first: chunking is transform/slice inside codegen (no
    Python); the df count shuffles (doc, chunk-hash)-grain rows once;
    the BOILERPLATE SET (chunks with df > cap) is the only thing joined
    back — normally the tiny repeated tail of the chunk distribution,
    so the anti-join broadcasts, but the broadcast decision is left to
    AQE's runtime size check rather than a static hint: a pathological
    template corpus (most chunks repeated) makes the set arbitrarily
    large, and a forced broadcast there would OOM executors where the
    AQE fallback is a correct shuffled anti-join (the same
    unbounded-frame reasoning as the best_fuzzy_match_compressed
    guard, solved adaptively because sizing the set up front would
    cost a second corpus scan). The chunk texts themselves never
    travel: both the df count and the anti-join key on a 64-bit
    xxhash of the chunk.
    """
    from uk_housing_dashboard_etl_spark.operators.dedup import _norm_text

    # array_remove: a token-less doc has ZERO chunks (n_chunks 0,
    # clean_text '' via the left join below) — without it every empty
    # doc carried one "" chunk whose shared hash made all empties
    # mutual boilerplate. sequence(0, -1) DESCENDS, hence the guard.
    toks = F.array_remove(F.split(_norm_text(F.col(text_col)), r"\s+"), "")
    n_chunks = F.ceil(F.size("__toks") / F.lit(float(chunk_tokens))).cast(
        "int"
    )
    chunk_at = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda c: F.array_join(
                F.slice(F.col("__toks"), c * chunk_tokens + 1, chunk_tokens),
                " ",
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    chunks = (
        documents.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .select("doc_id", F.posexplode(chunk_at).alias("pos", "chunk"))
        .withColumn("__h", F.xxhash64("chunk"))
    )
    boiler = (
        chunks.select("doc_id", "__h")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") > F.lit(max_chunk_df))
        .select("__h")
    )
    kept = chunks.join(boiler, "__h", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.array_sort(F.collect_list(F.struct("pos", "chunk"))).getField(
                "chunk"
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    return (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            (
                F.coalesce("n_chunks", F.lit(0))
                - F.coalesce("__n_kept", F.lit(0))
            ).cast("int").alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


# ONE word-segmentation engine for the whole BPE family (round-6
# advice): an EXPLICIT ASCII whitespace class, not \s — Java \s is
# ASCII-only while Python re's is Unicode, so training, encoding and
# the DuckDB oracle would disagree on e.g. U+00A0 if each tokenized
# with its own engine's \s. Train and apply both call this Spark-side
# splitter (the apply kernel receives pre-split word arrays), and the
# bpe_encode_check oracle uses the identical class in RE2.
_BPE_WS = r"[ \t\n\r\f\x0B]+"


def _bpe_words(text_col: str) -> F.Column:
    """Non-empty lowercased words of ``text_col`` under the shared
    ASCII-whitespace segmentation — array<string>, Spark-side. NULL
    text is no content: [] (not null), so downstream encode/train
    arithmetic never sees a null word array."""
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), _BPE_WS),
        lambda w: F.length(w) >= 1,
    )


def bpe_train(
    documents: DataFrame,
    n_merges: int = 40,
    text_col: str = "text",
    max_vocab_rows: int = 2_000_000,
) -> DataFrame:
    """Train a byte-pair-encoding merge list (Sennrich et al. 2016):
    returns (rank 1-based, left, right, merged) — the sequential merge
    table :func:`bpe_apply` consumes.

    Scale split (the ``pca_fit`` pattern): the DATA-sized work is ONE
    distributed word-count aggregate (corpus tokens collapse to the
    distinct-word frame — at 100 TB, millions of rows vs trillions of
    tokens); the MODEL-sized work — the inherently SEQUENTIAL merge
    loop, where merge i+1's counts depend on merge i — runs driver-side
    over that compact table, exactly like the classical trainer. The
    collect is VOCABULARY-grain and guarded: above ``max_vocab_rows``
    the trainer keeps the most frequent words (documented truncation —
    the standard practice of training tokenizers on a capped vocab /
    sample; rare-word tails contribute ~nothing to pair counts).

    Determinism: ties on pair count break on the pair itself, so the
    merge list is a pure function of the word-count table.
    """
    toks = _bpe_words(text_col)
    wc = (
        documents.select(F.explode(toks).alias("word"))
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from uk_housing_dashboard_etl_spark.functions.topk import (
        deterministic_topk,
    )

    rows = deterministic_topk(
        wc, [F.col("n").desc(), F.col("word")], max_vocab_rows
    ).collect()
    vocab = {tuple(r["word"]): int(r["n"]) for r in rows}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merged = best[0] + best[1]
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
        merges.append((rank, best[0], best[1], merged))
    return documents.sparkSession.createDataFrame(
        merges, "rank int, left string, right string, merged string"
    )


def bpe_apply(
    documents: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a trained merge list: per doc,
    ``n_words, n_symbols_before (characters), n_symbols_after (BPE
    tokens), roundtrip_ok (concatenating each word's tokens rebuilds
    the word — tokenization is lossless by construction, so FALSE means
    a bug), compressed_ok (words ≤ tokens ≤ characters)``.

    Plan: the merge list is model-grain (n_merges rows) and broadcasts
    inside an Arrow-batched ``mapInPandas`` kernel — encoding is the
    per-word sequential merge fold, memoized per DISTINCT word within
    each batch (Zipf reuse makes the memo hit rate high), so this is a
    sanctioned stateful kernel on the UDF-allowed list, not row-at-a-
    time Python in a hot loop. Word segmentation happens SPARK-SIDE
    (:func:`_bpe_words` — the same engine ``bpe_train`` used; the
    kernel receives word arrays and never re-tokenizes, so no
    Python-vs-Java regex divergence can split words differently than
    training did). The corpus never shuffles; output is doc-grain.
    """
    import pandas as pd

    merge_list = [
        (r["left"], r["right"]) for r in sorted(
            merges.collect(), key=lambda r: r["rank"]
        )
    ]

    def _encode_word(word: str, memo: dict) -> list:
        if word in memo:
            return memo[word]
        syms = list(word)
        for left, right in merge_list:
            i, out = 0, []
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = syms
        return syms

    def _kernel(pdfs):
        memo: dict = {}
        for pdf in pdfs:
            recs = []
            for doc_id, words in zip(pdf["doc_id"], pdf["words"]):
                words = list(words) if words is not None else []
                n_chars = sum(len(w) for w in words)
                n_tok = 0
                ok = True
                for w in words:
                    t = _encode_word(w, memo)
                    n_tok += len(t)
                    if "".join(t) != w:
                        ok = False
                recs.append(
                    (
                        doc_id,
                        len(words),
                        n_chars,
                        n_tok,
                        ok,
                        len(words) <= n_tok <= n_chars if words else True,
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id",
                    "n_words",
                    "n_symbols_before",
                    "n_symbols_after",
                    "roundtrip_ok",
                    "compressed_ok",
                ],
            )

    base = documents.select(
        F.col(id_col).alias("doc_id"),
        _bpe_words(text_col).alias("words"),
    )
    return base.mapInPandas(
        _kernel,
        "doc_id long, n_words long, n_symbols_before long,"
        " n_symbols_after long, roundtrip_ok boolean,"
        " compressed_ok boolean",
    )
