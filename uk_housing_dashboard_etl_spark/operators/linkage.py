"""Fuzzy record linkage: blocked edit-distance matching.

The entity-resolution primitive a curation pipeline needs when keys
don't exist — near-identical product/supplier/author names that exact
dedup can't see. Reference scope: the reference engine has no fuzzy
matching at all (`etl/etl_main.py` joins on exact postcode only); this
family is part of the beyond-reference curation surface.

Shape: candidate generation by BLOCKING (never all-pairs), then exact
Levenshtein on candidates only. Everything is built-in JVM expressions
(`F.levenshtein`, `F.split`) — no Python on executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    records: DataFrame,
    name_col: str = "p_name",
    key_col: str = "p_partkey",
    max_dist: int = 3,
) -> DataFrame:
    """All record pairs whose names are within ``max_dist`` edits,
    generated block-wise.

    Block = first whitespace token of the name (swap in any cheap
    canonical prefix). Within a block, the self-join is additionally
    prefiltered by ``|len(a) − len(b)| ≤ max_dist`` — a lossless cut,
    since edit distance is bounded below by the length difference — so
    the expensive Levenshtein runs on a fraction of block pairs.
    ``key_a < key_b`` canonicalizes pair order.

    Plan: one shuffle keyed by block on compact (key, name, len) rows;
    Levenshtein evaluates JVM-side inside the join. Block size drives
    cost quadratically — at 100 TB use a finer block (first token +
    length bucket, or a sorted-neighborhood pass within block) and cap
    block cardinality the same way `ngram_jaccard_pairs` caps shingle
    document frequency.
    """
    base = records.select(
        F.col(key_col).alias("key"),
        F.col(name_col).alias("name"),
        F.split(F.col(name_col), r"\s+")[0].alias("block"),
        F.length(name_col).alias("len"),
    )
    a = base.alias("a")
    b = base.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") < F.col("b.key"))
            & (
                F.abs(F.col("a.len") - F.col("b.len"))
                <= F.lit(max_dist)
            ),
        )
        .where(dist <= F.lit(max_dist))
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            dist.cast("int").alias("distance"),
        )
    )


def best_fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    name_col: str = "p_name",
    key_col: str = "p_partkey",
    max_dist: int = 3,
) -> DataFrame:
    """For every left record, its single closest right-side name within
    ``max_dist`` edits (ties: smaller right key). The lookup-enrichment
    form of linkage — joining a dirty feed against a master table.

    Same blocking + length prefilter as :func:`fuzzy_pairs`; the
    argmin per left key is a map-side-combinable ``min_by``-style
    struct-min aggregate, not a rank window.
    """
    lb = left.select(
        F.col(key_col).alias("left_key"),
        F.col(name_col).alias("left_name"),
        F.split(F.col(name_col), r"\s+")[0].alias("block"),
        F.length(name_col).alias("left_len"),
    )
    rb = right.select(
        F.col(key_col).alias("right_key"),
        F.col(name_col).alias("right_name"),
        F.split(F.col(name_col), r"\s+")[0].alias("block"),
        F.length(name_col).alias("right_len"),
    )
    dist = F.levenshtein(F.col("left_name"), F.col("right_name"))
    cand = (
        lb.join(
            rb,
            (lb.block == rb.block)
            & (F.col("left_key") != F.col("right_key"))
            & (
                F.abs(F.col("left_len") - F.col("right_len"))
                <= F.lit(max_dist)
            ),
        )
        .withColumn("distance", dist.cast("int"))
        .where(F.col("distance") <= F.lit(max_dist))
    )
    # struct-min picks (distance, right_key) lexicographically: the
    # closest match, ties broken by the smaller right key.
    pick = F.min(F.struct("distance", "right_key", "right_name")).alias("m")
    return (
        cand.groupBy("left_key", "left_name")
        .agg(pick)
        .select(
            "left_key",
            "left_name",
            F.col("m.right_key").alias("match_key"),
            F.col("m.right_name").alias("match_name"),
            F.col("m.distance").alias("distance"),
        )
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    name_col: str = "p_name",
    key_col: str = "p_partkey",
    window: int = 5,
    max_dist: int = 3,
) -> DataFrame:
    """Sorted-neighborhood candidate generation: rank records within
    each block by (name, key) and compare only neighbors whose ranks
    differ by at most ``window``.

    The scale-safe linkage path promised in SCALE.md: candidate volume
    is ``window`` per record — LINEAR in block size where the blocked
    self-join of :func:`fuzzy_pairs` is quadratic. The price is recall:
    a true pair further than ``window`` positions apart in sort order is
    missed (near-identical names sort adjacently, so misses are rare —
    measure with the recall gate, don't assume).

    Plan: one shuffle keyed by block, one per-block sort for the rank.
    The rank band is then folded INTO the equi-join key — each row gets
    bucket = rn div window, the probe side fans out to [bucket,
    bucket+1], and the join runs equi on (block, bucket). Any forward
    neighbor within ``window`` ranks lives in the same or the next
    bucket, so the band predicate only trims inside ≈window-sized hash
    groups. Joining equi on block alone and filtering the band AFTER
    would enumerate the full quadratic block pairs first — measured 10×
    slower than the blocked join at 200k rows (tools/stress_linkage.py)
    — exactly the mistake this shape exists to avoid. ``key_a < key_b``
    holds because ranks are a total order and only forward neighbors
    join.
    """
    from pyspark.sql import Window as W

    base = records.select(
        F.col(key_col).alias("key"),
        F.col(name_col).alias("name"),
        F.split(F.col(name_col), r"\s+")[0].alias("block"),
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("block").orderBy("name", "key")
        ),
    )
    bucket = F.floor((F.col("rn") - 1) / F.lit(window)).cast("bigint")
    a = (
        base.withColumn(
            "bucket", F.explode(F.array(bucket, bucket + F.lit(1)))
        )
    ).alias("a")
    b = base.withColumn("bucket", bucket).alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.rn") > F.col("a.rn"))
            & (F.col("b.rn") <= F.col("a.rn") + F.lit(window)),
        )
        .where(dist <= F.lit(max_dist))
        .select(
            F.least(F.col("a.key"), F.col("b.key")).alias("key_a"),
            F.greatest(F.col("a.key"), F.col("b.key")).alias("key_b"),
            dist.cast("int").alias("distance"),
        )
    )
