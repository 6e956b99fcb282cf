"""Deduplication operators for large-scale training-data pipelines.

Four families, all pure DataFrame ops (no Python UDFs):

- ``exact_dedup``          : content-hash groupBy (the 100 TB workhorse)
- ``ngram_jaccard_pairs``  : exact set-similarity via shingle self-join
                             (quadratic in co-shingled docs — the oracle
                             baseline the scale paths approximate)
- ``minhash_lsh_pairs``    : MinHash signatures + banded LSH bucketing —
                             the scale path: shuffle is O(docs × bands),
                             never all-pairs
- ``simhash_pairs``        : 63-bit SimHash + chunk-banded Hamming join

Scale notes: every family shuffles on a short hash key, never on raw
text; signatures/aggregates are map-side combinable; banding bounds the
candidate-pair blowup and AQE's skew-join splitting handles hot buckets
(e.g. boilerplate shingles). Thresholds/parameters mirror common
practice for web-scale corpus dedup (e.g. GPT-3/C4-style MinHash LSH).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.rounding import round4

MOD_61 = (1 << 61) - 1


def _norm_text(col) -> F.Column:
    """Whitespace-collapse + trim + lowercase — the canonical form hashed
    for exact dedup and shingled for near-dup."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized content hash.

    Output: one row per input doc with its content hash, the canonical
    (minimum) id of its duplicate group, group size, and a duplicate flag.
    The shuffle key is the 32-char md5, not the document body.
    """
    hashed = documents.select(
        F.col(id_col).alias("doc_id"),
        F.md5(_norm_text(F.col(text_col))).alias("content_hash"),
    )
    w = Window.partitionBy("content_hash")
    return hashed.select(
        "doc_id",
        "content_hash",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("dup_count"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_duplicate"),
    )


def _word_shingles(
    documents: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles per document: (doc_id, shingle).

    Built with sequence/transform/explode — stays in whole-stage codegen.
    ``distinct=True`` gives set semantics (required for exact Jaccard);
    MinHash passes ``distinct=False`` because min() over a multiset
    equals min() over its set — identical signatures without the
    full-corpus dedup shuffle.
    """
    # split("") yields [""], not [] — strip empty tokens so an empty or
    # whitespace-only document has an EMPTY shingle set at every n
    # (otherwise two empty docs would join with Jaccard 1.0 at n=1).
    toks = F.array_remove(F.split(_norm_text(F.col(text_col)), r"\s+"), "")
    shingle_expr = F.expr(
        f"""CASE WHEN size(__toks) < {n} THEN array()
             ELSE transform(
               sequence(0, size(__toks) - {n}),
               i -> concat_ws(' ', slice(__toks, i + 1, {n})))
            END"""
    )
    out = (
        documents.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .select("doc_id", F.explode(shingle_expr).alias("shingle"))
    )
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (doc_a < doc_b, sim ≥ threshold).

    |A∩B| from a shingle self-join, |A∪B| = |A|+|B|−|A∩B|; the Jaccard is
    an exact integer ratio so the threshold comparison is deterministic.

    ``max_shingle_df=None`` (default) is EXACT mode — the sf0.01 oracle.
    It is quadratic in documents sharing a shingle: one boilerplate
    shingle shared by 1M docs creates a 10¹²-row join. At scale pass
    ``max_shingle_df=k`` to drop shingles whose document frequency
    exceeds ``k`` BEFORE the self-join (standard near-dup practice —
    a df-k shingle alone contributes ≤ k·(k−1)/2 candidate rows, so the
    join volume is bounded by Σ_shingle df² ≤ k·|shingles|). Union sizes
    still count every shingle, so the capped Jaccard only LOSES common
    shingles: it is a lower bound on the true similarity (false
    negatives on pairs glued together by boilerplate — which is the
    point — never false positives). ``minhash_lsh_pairs`` remains the
    recommended scale path.
    """
    sh = _word_shingles(documents, text_col, id_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    joinable = sh
    if max_shingle_df is not None:
        if max_shingle_df < 2:
            raise ValueError(
                f"max_shingle_df must be >= 2 (a shingle needs df >= 2 to "
                f"link any pair), got {max_shingle_df}"
            )
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_shingle_df)
            .select("shingle")
        )
        # inner join on the surviving shingle keys: shuffles on the same
        # key the self-join shuffles on, so AQE coalesces the exchanges
        joinable = sh.join(rare, "shingle")
    a = joinable.alias("a")
    b = joinable.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            round4(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "size_a", "size_b", "jaccard")
    )


def minhash_signatures(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: k independent min-hashes of the shingle
    set, using xxhash64 with the hash index as a mixed-in seed column.

    The k mins are one map-side-combinable groupBy — a single shuffle of
    (doc_id, k longs) regardless of document size. Shingles skip the
    set-dedup shuffle (min over a multiset equals min over its set);
    instead the DOCUMENTS are repartitioned up front — shuffling the raw
    docs is ~100× cheaper than shuffling their exploded shingles, and it
    restores full-cluster parallelism for the explode+hash stage that
    would otherwise run at input-split granularity.
    """
    spark = documents.sparkSession
    target = spark.sparkContext.defaultParallelism
    docs = documents.repartition(target, F.col(id_col))
    sh = _word_shingles(docs, text_col, id_col, shingle_n, distinct=False)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def _band_entries(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, signature, band, bucket) rows — one per (doc, band).

    Band bucket = xxhash64 over the band's signature components directly
    (fixed-width longs — no serialization on the hot path).
    """
    rows = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.element_at("signature", b * rows + r + 1) for r in range(rows)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id",
        "signature",
        F.explode(F.array(*band_structs)).alias("be"),
    ).select(
        "doc_id",
        "signature",
        F.col("be.band").alias("band"),
        F.col("be.bucket").alias("bucket"),
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH.

    b bands of r = k/b rows; docs colliding on any band's hash become
    candidates; estimated Jaccard = fraction of matching signature
    components; pairs below ``threshold`` are dropped. Collision
    probability 1-(1-j^r)^b — with k=16, b=4: ~0.97 at j=0.8, ~0.04 at
    j=0.2, the classic S-curve.
    """
    sig = minhash_signatures(documents, text_col, id_col, num_hashes, shingle_n)
    # SHUFFLE_HASH self-join: both sides are the identical plan, so
    # hash-partitioning on (band, bucket) lets ReuseExchange compute
    # the signature lineage (shingle explode + min-hash agg) ONCE — a
    # broadcast join would rebuild it for the build side.
    band_entries = _band_entries(sig, num_hashes, bands).hint("shuffle_hash")
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)"
    ) / F.lit(float(num_hashes))
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.signature").alias("sig_a"),
        F.col("b.signature").alias("sig_b"),
    )
    # estimate + filter BEFORE the pair-dedup shuffle: the zip_with is
    # free in-task, so dropDuplicates only sees above-threshold pairs
    # (doc ids + one double), never the multi-band fan-out dragging two
    # 16-int signature arrays per row through an exchange
    return (
        cand.withColumn("est_jaccard", round4(est))
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round: every node's strictly-larger neighbors are
    re-pointed at the minimum of its closed neighborhood.

    ``sym`` holds both directions of every edge as (u, v). Implemented
    as groupBy-min + join (never collect_list), so a billion-degree hub
    costs one map-side-combinable aggregate, not one giant array row.
    """
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges_down: DataFrame) -> DataFrame:
    """One small-star round over downward edges (u > v): each node and
    its smaller neighbors all re-point at the neighborhood minimum."""
    mins = edges_down.groupBy("u").agg(F.min("v").alias("m"))
    joined = edges_down.join(mins, "u")
    repointed = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edge = mins.select("u", F.col("m").alias("v"))
    return (
        repointed.unionByName(self_edge)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., *Connected Components in MapReduce and
    Beyond*, SoCC'14): each node ends up labeled with the minimum id
    reachable from it.

    Converges in O(log n) rounds regardless of graph shape — a
    64-node chain resolves in 3 rounds where plain min-label
    propagation needs 63. Each round is two groupBy-min + join passes
    (both skew-safe: no collect_list, hubs are plain aggregates that
    AQE can split), a digest aggregate detects the fixpoint, and
    ``localCheckpoint`` truncates the iterative lineage so the plan
    doesn't grow exponentially across rounds.
    """
    edges = (
        pairs.select(
            F.greatest(F.col("doc_a"), F.col("doc_b")).alias("u"),
            F.least(F.col("doc_a"), F.col("doc_b")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_digest = None
    for _ in range(max_iterations):
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # large-star emits upward re-pointings (may be u<v); canonicalize
        # back to downward (u>v) for the small-star pass.
        grown = _large_star(sym).select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        edges = _small_star(grown).localCheckpoint()
        digest = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        digest = (digest["n"], digest["h"])
        if digest == prev_digest:
            break
        prev_digest = digest
    mapping = edges.groupBy("u").agg(F.min("v").alias("root"))
    return ids.select(F.col(id_col).alias("node")).join(
        mapping, F.col("node") == F.col("u"), "left"
    ).select(
        "node", F.coalesce(F.col("root"), F.col("node")).alias("cluster_id")
    )


# duplicate_clusters collects the DISTINCT near-dup edge list for a
# driver-side union-find when it fits (one collect job vs O(log n)
# distributed contraction rounds of scheduling) — the same bounded
# cluster-grain convention as linkage.ENTITY_DRIVER_UNION_MAX_EDGES.
# Near-dup edges are duplicate-grain, not corpus-grain: even a 100 TB
# corpus with 10% near-dups in size-2 clusters is ~edges << docs, and
# above the cap the distributed path takes over losslessly.
# ~16 B/edge → the cap is ~32 MB of driver memory.
DEDUP_DRIVER_UNION_MAX_EDGES = 2_000_000


def duplicate_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
    driver_union_max_edges: int = DEDUP_DRIVER_UNION_MAX_EDGES,
) -> DataFrame:
    """Transitive duplicate clustering: connected components over a
    near-dup pair graph, labeled with the min reachable doc_id plus the
    cluster size.

    ``ids`` is the node set (one column ``id_col``); ``pairs`` has
    (doc_a, doc_b) edges from any near-dup detector. The distinct edge
    list is COUNTED first (estimate-before-collect, the arrow_topk /
    resolve_entities convention): when it fits
    ``driver_union_max_edges`` the labeling is a driver-side union-find
    with union-by-min — one collect of duplicate-grain edges and one
    broadcast back, where the distributed fixpoint pays O(log n) rounds
    of job scheduling (measured 6.1 s → ~0.5 s for the sf0.1 clusters02
    fit, whose edge list is a few hundred rows). Above the cap it
    delegates to :func:`connected_components` (large-star/small-star,
    O(log n) rounds) so deep duplicate chains — common when boilerplate
    strings daisy-chain documents — cost the same as the tiny stars LSH
    usually emits. Both paths label every node with its component's
    MINIMUM id, so results are identical by construction.
    """
    # materialize the canonical distinct edges ONCE (localCheckpoint):
    # the count, the collect, and the distributed fallback all read the
    # same materialized frame — when ``pairs`` is an inline near-dup
    # detector rather than a cached artifact, the dominant
    # pair-generation cost would otherwise be paid two or three times
    # (r10 advice).
    edges = (
        pairs.select(
            F.greatest(F.col("doc_a"), F.col("doc_b")).alias("u"),
            F.least(F.col("doc_a"), F.col("doc_b")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    if edges.count() <= driver_union_max_edges:
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for r in edges.collect():
            ra, rb = find(r["u"]), find(r["v"])
            if ra != rb:
                # union by MIN root: the final root of every component
                # is its minimum member, matching connected_components
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rows = [(n, find(n)) for n in parent]
        spark = ids.sparkSession
        id_type = ids.schema[id_col].dataType
        nodes = ids.select(F.col(id_col).alias("node"))
        if rows:
            from pyspark.sql.types import StructField, StructType

            mapping = F.broadcast(
                spark.createDataFrame(
                    rows,
                    StructType(
                        [
                            StructField("node", id_type),
                            StructField("__root", id_type),
                        ]
                    ),
                )
            )
            labels = nodes.join(mapping, "node", "left").select(
                "node",
                F.coalesce(F.col("__root"), F.col("node")).alias(
                    "cluster_id"
                ),
            )
        else:
            labels = nodes.select(
                "node", F.col("node").alias("cluster_id")
            )
    else:
        # hand the fallback the MATERIALIZED edges, not the raw pair
        # plan: connected_components' own canonicalize/distinct is a
        # no-op on them (u > v already), so the detector never re-runs
        labels = connected_components(
            ids,
            edges.select(
                F.col("u").alias("doc_a"), F.col("v").alias("doc_b")
            ),
            id_col,
            max_iterations,
        )
    w = Window.partitionBy("cluster_id")
    return labels.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def simhash_signatures(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 63
) -> DataFrame:
    """63-bit SimHash per doc: sign of the per-bit sum of token hashes.

    One explode + one groupBy with ``bits`` conditional sums (all map-side
    combinable); the signature assembles JVM-side from bit tests — no
    Python, no second shuffle. 63 bits keeps the value a positive long.
    """
    # empty/whitespace-only docs have no tokens (split("") yields [""]
    # which must NOT hash) — they emit no signature row, consistent with
    # MinHash over an empty shingle set.
    toks = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_remove(F.split(_norm_text(F.col(text_col)), r"\s+"), "")
            ).alias("tok"),
        )
        .withColumn("h", F.xxhash64("tok"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    simhash = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")),
        range(bits),
        F.lit(0).cast("long"),
    )
    return agg.select("doc_id", simhash.alias("simhash"))


def simhash_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int | None = None,
    bits: int = 63,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the ``bits``-bit hash into ``chunks``
    equal-width chunks. A pair at Hamming distance d can differ in at most
    d chunks, so whenever ``chunks > max_hamming`` every qualifying pair
    must agree on ≥1 chunk — candidates come from per-chunk equality
    joins, then the exact ``bit_count(xor)`` filter runs only on
    candidates. ``chunks`` defaults to ``max_hamming + 1`` (the minimum
    that makes the guarantee exact); passing fewer raises rather than
    silently dropping recall.

    Scale note: chunk width is ``ceil(bits / chunks)``, so bucket
    selectivity is ``2^width``. The default (max_hamming=3 → 4 chunks of
    16 bits, 65 536 buckets per chunk) buckets well at corpus scale;
    raising ``max_hamming`` narrows chunks exponentially (8 → 9×7-bit
    chunks = 128 buckets) and candidate volume approaches all-pairs —
    prefer MinHash-LSH when you need a looser similarity net.
    """
    sig = simhash_signatures(documents, text_col, id_col, bits=bits)
    return simhash_pairs_from_signatures(sig, max_hamming, chunks, bits)


def simhash_pairs_from_signatures(
    sig: DataFrame,
    max_hamming: int = 3,
    chunks: int | None = None,
    bits: int = 63,
) -> DataFrame:
    """Banded Hamming join over a ``(doc_id, simhash)`` signature frame.

    Split out from :func:`simhash_pairs` so the pigeonhole guarantee can be
    tested on explicitly-constructed signatures.
    """
    if chunks is None:
        chunks = max_hamming + 1
    if chunks <= max_hamming:
        raise ValueError(
            f"chunks={chunks} cannot guarantee recall at max_hamming="
            f"{max_hamming}; need chunks > max_hamming (pigeonhole)"
        )
    width = -(-bits // chunks)  # ceil: last chunk may be narrower
    mask = (1 << width) - 1
    chunked = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {chunks - 1}),"
                f" c -> struct(c AS chunk,"
                f" shiftright(simhash, CAST(c * {width} AS INT)) & {mask} AS val))"
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", F.col("ch.chunk").alias("chunk"), F.col("ch.val").alias("val"))
    # SHUFFLE_HASH, not broadcast: both sides of this SELF-join are the
    # identical plan, so hash-partitioning on (chunk, val) lets
    # ReuseExchange compute the signature lineage (shingle explode +
    # hash aggregation) ONCE; a broadcast join recomputes it to build.
    chunked = chunked.hint("shuffle_hash")
    a = chunked.alias("a")
    b = chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        # Filter BEFORE dropDuplicates: the exact bit_count predicate is
        # free in-task, while dedup is a shuffle — running it on the full
        # banded fan-out (every chunk collision) instead of the tiny
        # within-radius set is the dominant cost at scale.
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def keep_best_dedup(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup that keeps the HIGHEST-QUALITY member of each
    duplicate group (ties → smallest id) instead of the smallest id —
    what a curation pipeline actually wants when near-identical docs
    differ in boilerplate/noise.

    Content hash and quality score come from one projection over one
    scan (``quality_score`` carries the hash through ``keep_cols``, no
    join-back); the canonical pick is a window over the hash key — the
    same single content-hash shuffle as ``exact_dedup``, never document
    bodies.
    """
    from uk_housing_dashboard_etl_spark.operators.text_analysis import (
        quality_score,
    )

    hashed = documents.withColumn(
        "__hash", F.md5(_norm_text(F.col(text_col)))
    )
    q = quality_score(hashed, text_col, id_col, keep_cols=("__hash",))
    w = Window.partitionBy("__hash").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return q.select(
        "doc_id",
        F.col("__hash").alias("content_hash"),
        "quality",
        F.first("doc_id").over(w).alias("canonical_id"),
        (F.row_number().over(w) == 1).alias("keep"),
    )


def dup_span_stats(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    hash_shingles: bool = True,
) -> DataFrame:
    """Exact-substring duplication coverage (the ExactSubstr metric of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): for each document, the fraction of token positions covered
    by some word ``k``-gram that occurs at least twice in the corpus
    (any doc, including within-doc repeats).

    Where ``ngram_novelty`` counts DISTINCT shingles with df=1, this
    measures POSITIONAL coverage — how much of the doc's actual text is
    duplicated material — which is the quantity the suffix-array dedup
    literature cuts on (docs above ~50% coverage are near-verbatim
    copies; mid-range docs carry boilerplate worth span-level trimming).

    Output: one row per input doc —
    ``doc_id, n_tokens, dup_starts, covered_tokens, dup_ratio``.

    Plan: one corpus scan → positional k-gram explode (codegen
    sequence/transform, no UDF) → shingle-keyed count (the only big
    shuffle). ``hash_shingles=True`` (default, the scale path) keys
    that exchange on ``xxhash64(shingle)`` instead of the shingle text
    — ~5× fewer shuffle bytes, measured 134 s → 79 s at 1M docs on
    local[32] (a groupBy+join-back plan that avoids the window sort
    measured 165 s: double-shuffling the gram set costs more than
    sorting it once) — at the cost of a ~N²/2⁶⁴ false-dup probability
    from hash collisions; the oracle-checked contract query passes
    ``False`` for bit-exact string semantics. Then duplicated start
    positions shuffle back on doc_id for the interval-union window. Coverage needs no doc-length clamp:
    a start at pos has n_tokens - pos >= k by construction, so each
    contribution is ``least(k, next_start - pos)`` with the last run
    contributing ``k``. Short docs (< k tokens) emit no k-grams and
    report zero coverage via the left join back to the length frame.
    """
    # array_remove: an empty doc is [] (0 tokens, no grams), not [""];
    # coalesce: NULL text is no content too (n_tokens 0, not null)
    toks = F.array_remove(
        F.split(
            _norm_text(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
        ),
        "",
    )
    base = documents.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    )
    lens = base.select("doc_id", F.size("__toks").alias("n_tokens"))
    shingle_expr = F.expr(
        f"""CASE WHEN size(__toks) < {k} THEN array()
             ELSE transform(
               sequence(0, size(__toks) - {k}),
               i -> concat_ws(' ', slice(__toks, i + 1, {k})))
            END"""
    )
    grams = base.select(
        "doc_id", F.posexplode(shingle_expr).alias("pos", "shingle")
    )
    if hash_shingles:
        grams = grams.select(
            "doc_id", "pos", F.xxhash64("shingle").alias("shingle")
        )
    w_sh = Window.partitionBy("shingle")
    dup = (
        grams.withColumn("__c", F.count(F.lit(1)).over(w_sh))
        .where(F.col("__c") >= 2)
        .select("doc_id", "pos")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    covered = dup.withColumn(
        "__contrib",
        F.least(
            F.lit(k),
            F.coalesce(F.lead("pos").over(w_doc) - F.col("pos"), F.lit(k)),
        ),
    ).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dup_starts"),
        F.sum("__contrib").alias("covered_tokens"),
    )
    return lens.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_starts", F.lit(0)).alias("dup_starts"),
        F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
        round4(
            # a token-less doc has nothing duplicated: ratio 0, not 0/0
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("covered_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens"),
            ).otherwise(F.lit(0.0))
        ).alias("dup_ratio"),
    )


def build_dedup_index(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Precompute the persistent dedup index an incremental ingest
    pipeline checks new batches against: ``(hashes, bands)`` where
    ``hashes`` is the distinct content-hash set and ``bands`` the
    MinHash band-bucket entries (band, bucket, doc_id, signature).

    In production both frames live as bucketed parquet (hash-keyed /
    (band, bucket)-keyed) and are appended per ingest; at 100 TB the
    index is orders of magnitude larger than any daily batch, which is
    exactly why :func:`dedup_against_index` never shuffles it.
    """
    hashes = documents.select(
        F.md5(_norm_text(F.col(text_col))).alias("content_hash")
    ).distinct()
    sig = minhash_signatures(documents, text_col, id_col, num_hashes, shingle_n)
    return hashes, _band_entries(sig, num_hashes, bands)


def dedup_against_index(
    new_docs: DataFrame,
    index_hashes: DataFrame,
    index_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Incremental dedup: flag each document of a new ingest batch
    against the historical corpus index (exact + MinHash near-dup) and
    against earlier docs in its own batch (exact).

    Output per new doc: ``doc_id, content_hash, exact_dup_in_index,
    exact_dup_in_batch, near_dup_in_index, keep`` (keep = none of the
    three flags).

    Scale shape — the index NEVER shuffles: the new batch (days of
    ingest vs years of corpus) is the broadcast side of both probes.
    Matched hashes / matched band buckets are distilled to frames no
    larger than the batch itself, then broadcast back onto it, so the
    big side of every join streams map-side. The near-dup check applies
    the same estimated-Jaccard S-curve cut as :func:`minhash_lsh_pairs`
    on the colliding (new, index) signature pairs.
    """
    new = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
    ).withColumn("content_hash", F.md5(_norm_text(F.col("__text"))))

    # exact vs index: distill index hits to <= batch-size, broadcast back
    new_hashes = new.select("content_hash").distinct()
    hit_hashes = (
        index_hashes.join(F.broadcast(new_hashes), "content_hash")
        .select("content_hash")
        .distinct()
        .withColumn("__in_index", F.lit(1))
    )

    # exact within batch: first occurrence (min doc_id) keeps
    w_h = Window.partitionBy("content_hash")
    flagged = new.join(F.broadcast(hit_hashes), "content_hash", "left").select(
        "doc_id",
        "__text",
        "content_hash",
        F.col("__in_index").isNotNull().alias("exact_dup_in_index"),
        (F.col("doc_id") != F.min("doc_id").over(w_h)).alias(
            "exact_dup_in_batch"
        ),
    )

    # near vs index: batch band entries broadcast into the index bands
    new_sig = minhash_signatures(
        new.select("doc_id", F.col("__text").alias(text_col)),
        text_col,
        "doc_id",
        num_hashes,
        shingle_n,
    )
    new_bands = _band_entries(new_sig, num_hashes, bands).select(
        F.col("doc_id").alias("new_id"),
        F.col("signature").alias("new_sig"),
        "band",
        "bucket",
    )
    est = F.expr(
        "aggregate(zip_with(new_sig, signature,"
        " (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
        " 0, (acc, v) -> acc + v)"
    ) / F.lit(float(num_hashes))
    near_ids = (
        index_bands.join(F.broadcast(new_bands), ["band", "bucket"])
        .where(round4(est) >= threshold)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
        .withColumn("__near", F.lit(1))
    )

    return flagged.join(F.broadcast(near_ids), "doc_id", "left").select(
        "doc_id",
        "content_hash",
        "exact_dup_in_index",
        "exact_dup_in_batch",
        F.col("__near").isNotNull().alias("near_dup_in_index"),
        (
            ~F.col("exact_dup_in_index")
            & ~F.col("exact_dup_in_batch")
            & F.col("__near").isNull()
        ).alias("keep"),
    )


def containment_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs: c(A→B) = |A∩B| / |A|,
    emitted as ordered (doc_a, doc_b) rows where doc_a's shingle set is
    ≥ ``threshold`` contained in doc_b's.

    Containment is the quote/nesting detector symmetric Jaccard misses:
    a short document fully embedded in a long one has tiny Jaccard
    (|A∪B| is dominated by B) but containment 1.0 — exactly the
    relationship that matters when curating training data against
    wholesale inclusion of one source inside another (Broder's
    original distinction between resemblance and containment).

    Mechanics mirror :func:`ngram_jaccard_pairs`: distinct-shingle
    self-join for |A∩B| (each unordered join row fans out to both
    directions), set sizes joined back, exact integer ratio → 4dp.
    ``max_shingle_df`` caps the self-join exactly as there — the capped
    containment only LOSES common shingles (lower bound, never a false
    positive). Scale path: cap + the MinHash candidate generator.
    """
    sh = _word_shingles(documents, text_col, id_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    joinable = sh
    if max_shingle_df is not None:
        if max_shingle_df < 2:
            raise ValueError(
                f"max_shingle_df must be >= 2 (a shingle needs df >= 2 to "
                f"link any pair), got {max_shingle_df}"
            )
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_shingle_df)
            .select("shingle")
        )
        joinable = sh.join(rare, "shingle")
    a = joinable.alias("a")
    b = joinable.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_x"), F.col("b.doc_id").alias("doc_y")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # one unordered intersection row serves both directions
    directed = inter.select(
        F.col("doc_x").alias("doc_a"),
        F.col("doc_y").alias("doc_b"),
        "n_common",
    ).unionByName(
        inter.select(
            F.col("doc_y").alias("doc_a"),
            F.col("doc_x").alias("doc_b"),
            "n_common",
        )
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a")
    )
    return (
        directed.join(sa, "doc_a")
        .withColumn(
            "containment", round4(F.col("n_common") / F.col("size_a"))
        )
        .where(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "n_common", "size_a", "containment")
    )


# CDC rolling-hash constants: token hashes mod a small prime keep the
# 4-term windowed gear sum inside exact int64 range in BOTH engines
# (max term ≈ 1e6 · 131³ ≈ 2.3e12; four terms ≈ 9e12 « 2^63).
CDC_TOKEN_MOD = 1_000_003
CDC_BASE = 131


def cdc_chunk_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    divisor: int = 16,
    threshold: float = 0.5,
    max_chunk_df: int | None = None,
) -> DataFrame:
    """Content-defined-chunking near-dup pairs: split each document at
    positions where a rolling hash of the last ``window`` tokens is
    ≡ 0 mod ``divisor`` (average chunk ≈ ``divisor`` tokens), then pair
    documents by shared chunk hashes with overlap = shared /
    min(chunks_a, chunks_b).

    WHY CDC instead of fixed chunks: boundaries are a function of local
    CONTENT, not position — inserting one token near the start of a
    copy shifts every fixed ``strip_boilerplate_chunks``-style chunk
    after it (zero shared chunks), while CDC boundaries downstream of
    the edit land on the same token patterns and the tail chunks still
    match (the rsync/FastCDC property, pinned by
    ``test_cdc_boundaries_survive_insertion``). This is the dedup
    family's edit-resistant complement to shingle Jaccard: chunk grain
    (≈ ``divisor`` tokens) instead of n-gram grain, so the join carries
    |doc|/divisor keys per doc instead of |doc| shingles.

    Determinism: token hashes are the repo's polynomial ascii fold mod
    ``CDC_TOKEN_MOD``; the gear sum is exact int64 in both engines, so
    boundaries — and therefore chunks — are bit-identical under any
    partitioning. Chunk identity travels as md5; document bodies never
    join. ``max_chunk_df`` caps the self-join exactly like
    ``ngram_jaccard_pairs`` (shared-chunk counts only LOSE repeated
    chunks — lower bound, never a false positive).

    Plan: chunking is pure row-local array codegen (nested
    transform/aggregate/filter/slice — no Python, no shuffle); the
    pair join shuffles (doc, chunk-md5) rows once.
    """
    w = int(window)
    if w < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    b1 = CDC_BASE
    b2, b3 = b1 * b1, b1 * b1 * b1
    coefs = [b3, b2, b1, 1][-w:] if w <= 4 else None
    if coefs is None:
        raise ValueError("window > 4 would overflow the exact int64 gear sum")
    gear = " + ".join(
        f"element_at(__th, j - {w - 1 - k}) * {c}" if c != 1
        else f"element_at(__th, j)"
        for k, c in enumerate(coefs)
    )
    # array_remove: an empty doc has zero tokens and therefore zero
    # chunks — without it split("") yields [""] and every empty doc
    # would share one md5("") chunk, pairing all empties spuriously.
    toks = F.array_remove(F.split(_norm_text(F.col(text_col)), r"\s+"), "")
    th = F.expr(
        "transform(__toks, tok -> aggregate("
        "  transform(sequence(1, length(tok)),"
        "            i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT)),"
        "  CAST(0 AS BIGINT),"
        f" (a, c) -> (a * 31 + c) % {CDC_TOKEN_MOD}))"
    )
    # Spark's sequence(lo, hi) DESCENDS when lo > hi, so short docs must
    # short-circuit to an empty boundary-candidate list explicitly
    bpos = F.expr(
        "array_sort(array_distinct(concat("
        "  array(0),"
        f" CASE WHEN size(__th) < {w} THEN CAST(array() AS ARRAY<INT>)"
        f"      ELSE filter(transform(sequence({w}, size(__th)),"
        f"             j -> CASE WHEN ({gear}) % {divisor} = 0"
        "                       THEN j ELSE -1 END),"
        "             p -> p > 0) END,"
        "  array(size(__toks)))))"
    )
    # size(__bpos) == 1 happens only for token-less docs (bpos [0]);
    # sequence(1, 0) DESCENDS in Spark, so short-circuit to no chunks.
    chunks_arr = F.expr(
        "CASE WHEN size(__bpos) < 2 THEN CAST(array() AS ARRAY<STRING>)"
        " ELSE transform(sequence(1, size(__bpos) - 1),"
        " i -> array_join(slice(__toks, element_at(__bpos, i) + 1,"
        "        element_at(__bpos, i + 1) - element_at(__bpos, i)), ' '))"
        " END"
    )
    ch = (
        documents.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .withColumn("__th", th)
        .withColumn("__bpos", bpos)
        .select("doc_id", F.explode(chunks_arr).alias("__chunk"))
        .select("doc_id", F.md5("__chunk").alias("chunk_md5"))
        .distinct()
    )
    sizes = ch.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    joinable = ch
    if max_chunk_df is not None:
        if max_chunk_df < 2:
            raise ValueError(
                f"max_chunk_df must be >= 2, got {max_chunk_df}"
            )
        rare = (
            ch.groupBy("chunk_md5")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_chunk_df)
            .select("chunk_md5")
        )
        joinable = ch.join(rare, "chunk_md5")
    a = joinable.alias("a")
    b = joinable.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.chunk_md5") == F.col("b.chunk_md5"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_chunks").alias("chunks_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_chunks").alias("chunks_b")
    )
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "overlap",
            round4(
                F.col("shared_chunks")
                / F.least(F.col("chunks_a"), F.col("chunks_b"))
            ),
        )
        .where(F.col("overlap") >= threshold)
        .select(
            "doc_a", "doc_b", "shared_chunks", "chunks_a", "chunks_b",
            "overlap",
        )
    )


def exact_substr_spans(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 30,
    hash_grams: bool = True,
    spread_input: bool | None = None,
) -> DataFrame:
    """EXACT maximal duplicated character spans (the cut list of Lee et
    al. 2022's ExactSubstr dedup): every maximal interval of a document
    covered by some length-``min_len`` substring that occurs >= 2 times
    in the corpus (any doc, including within-doc repeats). Output one
    row per span: ``doc_id, span_id (1-based per doc), span_start
    (0-based char offset), span_end (exclusive), span_len``.

    This is the suffix-grain formulation of the suffix-array algorithm:
    grouping all suffixes by their first ``min_len`` characters is
    exactly the first ``min_len`` columns of the suffix-array sort, and
    a repeated substring of length M >= min_len surfaces as M−min_len+1
    consecutive duplicated suffix positions, which the within-document
    extension pass (the gaps-and-islands merge below) re-joins into the
    single maximal span [start, last_start + min_len). Character-grain
    and string-exact — unlike :func:`dup_span_stats`, which measures
    word-k-gram POSITIONAL coverage, this emits the actual byte ranges
    a span-level trimmer would cut.

    Plan: one corpus scan → row-local prefix explode (codegen
    sequence/substring, no UDF) → ONE gram-keyed exchange to find
    repeated prefixes → duplicated starts shuffle back on doc_id for a
    per-doc bounded sort + island merge. The DATA-SIZED exchange always
    keys on ``xxhash64(gram)`` — fixed 8-byte keys instead of
    min_len-char strings. ``hash_grams=False`` (the oracle-checked
    contract queries) stays STRING-EXACT via a verification phase:
    hash-equality is necessary for string-equality, so the hash pass
    can only over-admit, and the admitted candidates (the duplicated
    tail of the corpus — a small fraction by construction) re-extract
    their actual grams from the text and regroup on the string,
    discarding any hash-collision false positives. Bit-exact results
    at hash-exchange cost (measured 4.0 s → 2.1 s at sf0.1). At 100 TB
    the gram exchange is the only data-sized shuffle and is linear in
    corpus characters; Lee et al.'s in-memory suffix array is replaced
    by Spark's distributed sort, which is the honest cluster
    equivalent.

    ``spread_input`` caller guidance (r9 advice): the ``None`` default
    decides from ``inputFiles()`` scan metadata, which probes as ``[]``
    for NON-FILE frames (``createDataFrame``, post-shuffle/post-join
    inputs) and therefore never repartitions them — correct for
    shuffle outputs (their parallelism was already set upstream) but a
    silent single-core explode for a few-partition in-memory frame.
    Callers feeding small ``createDataFrame`` corpora (tests, notebook
    experiments) should pass ``spread_input=True`` explicitly; file
    readers at any scale can rely on the default.
    """
    starts = F.expr(
        f"""CASE WHEN length({text_col}) < {min_len} THEN array()
             ELSE transform(
               sequence(0, length({text_col}) - {min_len}),
               i -> struct(i AS pos,
                           xxhash64(substring({text_col}, i + 1, {min_len}))
                               AS gh))
            END"""
    )
    # repartition the RAW docs before the ~n_chars× explode — but ONLY
    # when the scan is under-parallel (the minhash_signatures pattern,
    # made conditional): a small corpus in one input split would run
    # the hash+explode stage on one core (measured 2.9 s → 0.5 s at
    # sf0.1, a single-split scan), while a corpus that already fans out
    # across the cluster must NOT pay a full raw-text shuffle for
    # nothing (measured +35% on the 500k-doc stress when forced).
    # ``spread_input=None`` decides from scan METADATA only
    # (``inputFiles()`` — analyzed-plan file listing, no physical
    # planning, unlike the former ``rdd.getNumPartitions()`` probe
    # which converted the whole plan to an RDD on the driver): fewer
    # input files than cores means the map stage cannot fill the
    # cluster (testdata-sized single-file scans), while a 100 TB corpus
    # has >> cores files and skips the shuffle. Multi-split large files
    # under-count (they parallelize fine without help) and non-file
    # frames probe as [] (their parallelism was set by the upstream
    # shuffle) — both sides err toward NOT shuffling. Callers that know
    # better pass the bool explicitly.
    spark = documents.sparkSession
    target = spark.sparkContext.defaultParallelism
    if spread_input is None:
        n_files = len(documents.inputFiles())
        spread_input = 0 < n_files < target
    docs_par = (
        documents.repartition(target, F.col(id_col))
        if spread_input
        else documents
    )
    grams = docs_par.select(
        F.col(id_col).alias("doc_id"), F.explode(starts).alias("__s")
    ).select(
        "doc_id",
        F.col("__s.pos").cast("bigint").alias("pos"),
        F.col("__s.gh").alias("gh"),
    )
    w_gram = Window.partitionBy("gh")
    dup = (
        grams.withColumn("__c", F.count(F.lit(1)).over(w_gram))
        .where(F.col("__c") >= 2)
        .select("doc_id", "pos")
    )
    if not hash_grams:
        # exact verification: candidates re-extract their true gram
        # from the text (broadcast-or-shuffle equi-join on doc id; the
        # candidate frame is the duplicated subset only) and regroup on
        # the STRING — a hash collision whose strings differ fails this
        # count and drops out, so the result is bit-identical to
        # grouping on the strings directly
        texts = documents.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("__txt")
        )
        cand = dup.join(texts, "doc_id").select(
            "doc_id",
            "pos",
            F.expr(
                f"substring(__txt, CAST(pos AS INT) + 1, {min_len})"
            ).alias("gram"),
        )
        w_str = Window.partitionBy("gram")
        dup = (
            cand.withColumn("__c", F.count(F.lit(1)).over(w_str))
            .where(F.col("__c") >= 2)
            .select("doc_id", "pos")
        )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    # two length-min_len windows at p1 < p2 overlap or touch iff
    # p2 <= p1 + min_len, so a NEW maximal span starts where the gap
    # from the previous duplicated start exceeds min_len
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
        F.sum("__new").over(
            w_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
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


def exact_substr_stats(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 30,
    hash_grams: bool = True,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Per-document roll-up of :func:`exact_substr_spans`: ``doc_id,
    n_chars, n_spans, dup_chars, dup_frac`` for EVERY input doc (docs
    with no duplicated span report zeros). ``dup_frac`` is the exact
    character-grain analogue of ``dup_span_stats.dup_ratio`` — the
    fraction of the document's characters inside some maximal
    duplicated span; Lee et al. cut documents above ~0.5-0.8.

    ``spans`` accepts a precomputed :func:`exact_substr_spans` frame —
    the production shape: derive the cut list ONCE, then roll up stats,
    trim, and audits from the same table instead of re-running the
    corpus-sized gram exchange per consumer."""
    if spans is None:
        spans = exact_substr_spans(
            documents, text_col, id_col, min_len, hash_grams
        )
    lens = documents.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("bigint").alias("n_chars"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("dup_chars"),
    )
    return lens.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("dup_chars", F.lit(0)).cast("bigint").alias("dup_chars"),
        round4(
            F.coalesce("dup_chars", F.lit(0)).cast("double")
            / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
        ).alias("dup_frac"),
    )


def exact_substr_trim(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 30,
    hash_grams: bool = True,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Apply the ExactSubstr cut list: remove every maximal duplicated
    span (:func:`exact_substr_spans`) from each document — the
    aggressive span-level variant of Lee et al.'s dedup, which treats
    corpus-repeated material as boilerplate and keeps only the novel
    text. Output per input doc: ``doc_id, n_chars, trimmed_chars,
    n_cuts, trimmed_md5`` (the md5 keeps the result driver-hashable
    without exposing the rebuilt string).

    Plan: spans collapse to ONE sorted struct-array row per doc (span
    grain, bounded by n_chars/min_len per doc), join back to the text,
    and the rebuild is a row-local ``aggregate`` fold over the span
    array inside codegen — concatenating the inter-span segments in
    order. No shuffle beyond what the span derivation already does; at
    100 TB the rebuild is a map-only pass over (text, spans).
    ``spans`` accepts a precomputed cut list (see
    :func:`exact_substr_stats`).
    """
    if spans is None:
        spans = exact_substr_spans(
            documents, text_col, id_col, min_len, hash_grams
        )
    sp = spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__sp")
    )
    trimmed = F.expr(
        f"""CASE WHEN __sp IS NULL THEN {text_col} ELSE
            aggregate(
              __sp,
              struct(CAST('' AS STRING) AS t, CAST(0 AS BIGINT) AS p),
              (acc, s) -> struct(
                concat(acc.t, substring({text_col},
                    CAST(acc.p AS INT) + 1,
                    CAST(s.span_start - acc.p AS INT))),
                s.span_end),
              acc -> concat(acc.t, substring({text_col},
                  CAST(acc.p AS INT) + 1,
                  CAST(length({text_col}) - acc.p AS INT))))
            END"""
    )
    return (
        documents.select(F.col(id_col).alias("doc_id"), text_col)
        .join(sp, "doc_id", "left")
        .select(
            "doc_id",
            F.length(text_col).cast("bigint").alias("n_chars"),
            trimmed.alias("__t"),
            F.coalesce(F.size("__sp"), F.lit(0)).cast("bigint").alias(
                "n_cuts"
            ),
        )
        .select(
            "doc_id",
            "n_chars",
            F.length("__t").cast("bigint").alias("trimmed_chars"),
            "n_cuts",
            F.md5(F.col("__t").cast("binary")).alias("trimmed_md5"),
        )
    )
