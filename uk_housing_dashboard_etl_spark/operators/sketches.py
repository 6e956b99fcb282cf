"""Sketch-based approximate aggregation (Apache DataSketches built-ins).

At 100 TB the exact versions of these queries are the expensive ones:
count-distinct shuffles every distinct value, exact percentiles need
per-group sorts. Sketches are constant-memory, map-side combinable and
— critically — MERGEABLE: a day's sketch is computed once and unioned
into weekly/monthly rollups without rescanning the day.

- ``approx_cardinalities``   : HLL distinct counts next to exact ones
  (the error actually paid is part of the output).
- ``mergeable_daily_distinct``: per-day HLL sketches → ``hll_union_agg``
  weekly rollup, compared against the exact weekly distinct — the
  pre-aggregation pattern that makes 100 TB dashboards cheap.
- ``quantile_sketch_summary`` : KLL quantile estimates vs the exact
  percentiles — the documented degradation path for the weekly mart's
  A3/A4 when group sorts become the bottleneck.

Driver contract: the sketch estimates themselves are engine-specific, so
the contract queries expose the exact values plus within-bound flags the
DuckDB oracle asserts TRUE — estimates drifting outside the envelope go
red. Tighter error bounds are additionally asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_cardinalities(
    events: DataFrame,
    group_col: str = "event_type",
    id_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """Per-group exact vs HLL distinct-id counts with relative error.

    A group whose every id is NULL has exact_distinct 0 — the CASE
    keeps the ANSI division off that row (r13: DIVIDE_BY_ZERO);
    rel_error is 0 when the sketch agrees the group is empty, +Inf
    when it somehow doesn't (so a 5% band flag reads false).
    """
    return (
        events.groupBy(group_col)
        .agg(
            F.countDistinct(id_col).alias("exact_distinct"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(id_col), F.lit(lg_k))
            ).alias("approx_distinct"),
        )
        .withColumn(
            "rel_error",
            F.when(
                F.col("exact_distinct") > 0,
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
            ).otherwise(
                F.when(F.col("approx_distinct") == 0.0, 0.0).otherwise(
                    F.lit(float("inf"))
                )
            ),
        )
    )


def mergeable_daily_distinct(
    events: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """Weekly distinct users from MERGED per-day HLL sketches.

    Stage 1 sketches each day once; stage 2 unions day-sketches into
    weeks — the incremental-rollup shape where yesterday's raw data is
    never rescanned. Output carries the exact weekly distinct for
    comparison.

    NULL timestamps are excluded at this operator boundary (r13 sweep):
    "unknown time" belongs to no week, and the engines otherwise
    DISAGREE structurally — the sketch/exact join drops the NULL week
    (Spark's equi-join never matches NULL) while a SQL GROUP BY keeps
    it as a row.
    """
    events = events.where(F.col(ts_col).isNotNull())
    daily = (
        events.withColumn("day", F.date_trunc("day", F.col(ts_col)))
        .groupBy("day")
        .agg(F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("day_sketch"))
    )
    weekly_sketch = (
        daily.withColumn("week", F.date_trunc("week", F.col("day")))
        .groupBy("week")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("day_sketch")).alias(
                "approx_weekly_distinct"
            )
        )
    )
    weekly_exact = (
        events.withColumn("week", F.date_trunc("week", F.col(ts_col)))
        .groupBy("week")
        .agg(F.countDistinct(id_col).alias("exact_weekly_distinct"))
    )
    return weekly_sketch.join(weekly_exact, "week")


# normalized rank-error band for the KLL accuracy gate: k=200 bounds the
# rank error at ~1.65% with 99% confidence (Karnin-Lang-Liberty 2016),
# so a 3% band makes the per-run flag deterministic in practice while
# still failing on any real sketch regression.
#
# Expected flake rate (r9 advice — the gate stays PROBABILISTIC because
# Spark SQL exposes no seed for KLL's compaction): 99% @ 1.65% implies
# a per-quantile normalized rank-error sigma of ~0.65%, so the ±3%
# band sits at ~4.6 sigma — P(miss) ≈ 2e-5 per flag. The driver checks
# 2 quantiles × |event_type| groups (≤ ~10 flags/run): ≈ 2e-4 chance of
# a spurious red per round, ~0.4% across a 20-round project. Accepted:
# tightening it further would need either a seeded sketch (a UDF
# reimplementation — slower and no longer the JVM datasketches path) or
# a second independent in-plan sketch OR'd into the flag (stales the
# query for a ~2e-4 risk). If a round DOES flake here, rerunning the
# driver window reproduces green with near-certainty.
RANK_EPS = 0.03


def quantile_sketch_summary(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    k: int = 200,
) -> DataFrame:
    """Per-group KLL quantile estimates vs exact percentiles.

    The sketch path is one map-side-combinable aggregate — no per-group
    sort — which is exactly what replaces exact percentiles (A3/A4) when
    a 100 TB group no longer fits a sort.

    Accuracy gating checks KLL's ACTUAL guarantee — a RANK band, not a
    value band: the estimate must lie between the exact discrete
    quantiles at rank q ± rank_eps. KLL's compaction is internally
    RANDOMIZED (no seed exposed through Spark SQL), so once a group
    exceeds the sketch capacity any fixed value tolerance flips
    run-to-run on heavy-tailed data (the round-8/9 sf0.001 artifact:
    a ~1000-row group's p90 estimate legitimately lands on a neighbor
    element >5% away in VALUE while being <1% off in RANK). The rank
    band is scale-free: at groups the sketch holds exactly, estimate ==
    disc(q) and the band is trivially satisfied; at any larger n,
    rank_eps = 0.03 sits far above k=200's ~1.65% 99%-confidence
    normalized rank error. The interpolated percentile rides along as
    the classical hash-checked report number.
    """
    lo_m, hi_m = 0.5 - RANK_EPS, 0.5 + RANK_EPS
    lo_p, hi_p = 0.9 - RANK_EPS, min(1.0, 0.9 + RANK_EPS)
    # the sketch aggregates ONCE per group and the quantile probes are
    # guarded on the group's NON-NULL VALUE COUNT: a group whose values
    # are all NULL still emits a (non-null but EMPTY) sketch buffer,
    # and kll_sketch_get_quantile_double crashes on it with
    # KLL_INVALID_INPUT_SKETCH_BUFFER (r10 sweep — same live ANSI-crash
    # class as r9's 0/0 fixes; an IS NULL guard does NOT catch it).
    # Such a group reports NULL estimates next to its NULL exact
    # percentiles. Non-finite values are dropped at this operator
    # boundary (r13 sweep: Spark's exact percentile ranks NaN greatest
    # while the oracle's percentile_cont skips it, shifting the
    # interpolation by one element — and a quantile of NaN/±Inf is
    # meaningless for the sketch's rank guarantee anyway); NULL-value
    # rows still flow through unchanged.
    vd = F.col(value_col).cast("double")
    events = events.where(
        F.col(value_col).isNull()
        | (~F.isnan(vd) & (F.abs(vd) < F.expr("CAST('Infinity' AS DOUBLE)")))
    )
    return (
        events.groupBy(group_col)
        .agg(
            F.expr(f"kll_sketch_agg_double({value_col}, {k})").alias("__ks"),
            F.count(F.col(value_col)).alias("__nv"),
            F.percentile(value_col, 0.5).alias("exact_median"),
            F.expr(
                f"percentile_disc({lo_m}) WITHIN GROUP (ORDER BY {value_col})"
            ).alias("median_band_lo"),
            F.expr(
                f"percentile_disc({hi_m}) WITHIN GROUP (ORDER BY {value_col})"
            ).alias("median_band_hi"),
            F.percentile(value_col, 0.9).alias("exact_p90"),
            F.expr(
                f"percentile_disc({lo_p}) WITHIN GROUP (ORDER BY {value_col})"
            ).alias("p90_band_lo"),
            F.expr(
                f"percentile_disc({hi_p}) WITHIN GROUP (ORDER BY {value_col})"
            ).alias("p90_band_hi"),
        )
        .withColumn(
            "approx_median",
            F.expr(
                "CASE WHEN __nv = 0 THEN NULL"
                " ELSE kll_sketch_get_quantile_double(__ks, 0.5) END"
            ),
        )
        .withColumn(
            "approx_p90",
            F.expr(
                "CASE WHEN __nv = 0 THEN NULL"
                " ELSE kll_sketch_get_quantile_double(__ks, 0.9) END"
            ),
        )
        .drop("__ks", "__nv")
        .withColumn(
            "median_rel_error",
            F.abs(F.col("approx_median") - F.col("exact_median"))
            / F.col("exact_median"),
        )
    )


def cms_frequency_estimates(
    df: DataFrame,
    key_col: str,
    probe_keys: DataFrame,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch frequency estimation with its guarantee made
    checkable: build the d×w counter sketch in one pass, then estimate
    each probe key's frequency as ``min`` over its d counters.
    Output per probe key: ``<key_col>, true_n, est_n, overestimate,
    never_under`` — CMS guarantees ``est ≥ true`` ALWAYS (the oracle
    asserts the flag), and the expected overestimate is ``N/w`` per
    row, surfaced rather than hidden. EVERY non-null probe key gets a
    row: a key absent from ``df`` reports ``true_n = 0`` with whatever
    ``est_n ≥ 0`` its counters accumulated from colliding keys (the
    round-5 advice fix — previously such probes were silently dropped).

    The hash family is the portable multiplicative hash (same rule as
    ``weighted_sample``), so the DuckDB oracle rebuilds the IDENTICAL
    sketch and the driver compare is hash-exact, not approximate.

    Scale: the sketch is d·w counters regardless of input (map-side
    combinable groupBy over a row-local d-way explode); it is MERGEABLE
    by counter-wise addition, making it the frequency complement to the
    HLL/KLL family. Probe lookups are a broadcast join against the
    d·w-row sketch. True counts here cost one exact groupBy — at
    100 TB you'd skip them and keep only the sketch path; the contract
    query pays for them because they ARE the gate.
    """
    # the multiplicative hash is defined over INTEGRAL keys (that is
    # what keeps it bit-identical in the DuckDB oracle); a string key
    # would die executor-side with an opaque CAST_INVALID_INPUT at the
    # first non-numeric value — fail fast at plan time instead
    key_type = df.schema[key_col].dataType.simpleString()
    if key_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"cms_frequency_estimates requires an integral key column; "
            f"{key_col!r} is {key_type}. Hash non-numeric keys to a "
            "bigint first (e.g. xxhash64) — the sketch is over key "
            "identity, so any injective pre-hash preserves its counts."
        )
    buckets = F.expr(
        f"transform(sequence(0, {depth - 1}), i -> struct(i AS row,"
        f" CAST(({key_col} * 2654435761 + i * 40503) % 1000003"
        f" % {width} AS INT) AS bucket))"
    )
    sketch = (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(buckets).alias("__b"))
        .groupBy(
            F.col("__b.row").alias("row"), F.col("__b.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # truth anchored on probe_keys (left join + coalesce 0), so probes
    # absent from df still answer with true_n = 0 instead of vanishing
    truth = (
        probe_keys.where(F.col(key_col).isNotNull())
        .select(key_col)
        .distinct()
        .join(
            df.where(F.col(key_col).isNotNull())
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("true_n")),
            key_col,
            "left",
        )
        .withColumn("true_n", F.coalesce("true_n", F.lit(0)))
    )
    probes = truth.select(
        key_col,
        "true_n",
        F.explode(buckets).alias("__b"),
    )
    # left join: an absent key can hash to counters no df key touched —
    # a missing sketch row means that counter is exactly 0
    est = (
        probes.join(
            F.broadcast(sketch),
            (F.col("__b.row") == F.col("row"))
            & (F.col("__b.bucket") == F.col("bucket")),
            "left",
        )
        .groupBy(key_col, "true_n")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_n"))
    )
    return est.select(
        key_col,
        "true_n",
        "est_n",
        (F.col("est_n") - F.col("true_n")).alias("overestimate"),
        (F.col("est_n") >= F.col("true_n")).alias("never_under"),
    )


def mg_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
) -> DataFrame:
    """Distributed Misra-Gries heavy hitters, exact-verified: every key
    with frequency > N/k is found, with its EXACT count. Output:
    ``<key_col>, n, n_rows, is_heavy`` for each surviving candidate.

    The classical two-pass composition (MG summaries are mergeable, and
    the union of per-batch survivor sets is a superset of the true
    heavy hitters):

    1. Every Arrow batch folds through a capacity-``k`` Misra-Gries
       summary inside ``mapInPandas`` — per-batch sequential state is
       exactly what MG is, so this is a sanctioned stateful kernel, not
       a row-at-a-time UDF, and it needs NO repartition: a batch with
       n_b rows emits ≤ k candidates including every key with LOCAL
       frequency > n_b/k, and a key with GLOBAL frequency > N/k must
       exceed that local bar in at least one batch (pigeonhole over
       Σn_b = N), so the union of survivors is a guaranteed superset.
    2. The bounded candidate set (≤ k × batches rows — sketch-grain,
       NEVER data-grain) deduplicates and broadcasts back as a semi-
       join, and one exact count pass runs over the matching rows only.

    At 100 TB pass 2's shuffle carries counts for ≤ k·P keys instead of
    every distinct key — the whole point vs a full groupBy: the
    heavy-tail key space (url, token, user-agent) never materializes.
    The ``is_heavy`` flag applies the exact N/k cut; rows below it are
    FALSE candidates MG over-admitted, kept so the oracle can assert
    completeness (every exact heavy hitter appears with is_heavy TRUE).
    """
    import pandas as pd

    keyed = df.select(F.col(key_col).cast("string").alias("__key")).where(
        F.col("__key").isNotNull()
    )
    # N counts the NULL-FILTERED stream: candidate counts and the MG
    # pigeonhole argument both run over `keyed`, so a null-inclusive N
    # would inflate the N/k cut and could flag a true heavy hitter of
    # the non-null stream is_heavy=FALSE (round-6 advice)
    n_total = keyed.count()  # 1-row digest; also fixes the N in N/k

    def _mg(pdf_iter):
        for pdf in pdf_iter:
            counters: dict[str, int] = {}
            for v in pdf["__key"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [c for c in counters if counters[c] == 1]
                    for c in counters:
                        counters[c] -= 1
                    for c in dead:
                        del counters[c]
            yield pd.DataFrame({"__key": list(counters.keys())})

    candidates = keyed.mapInPandas(_mg, "`__key` string").distinct()
    return (
        keyed.join(F.broadcast(candidates), "__key", "left_semi")
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("__key").alias(key_col),
            "n",
            F.lit(n_total).cast("long").alias("n_rows"),
            (F.col("n") > F.lit(n_total) / F.lit(k)).alias("is_heavy"),
        )
    )


def hll_intersection_estimate(
    df: DataFrame,
    set_col: str,
    id_col: str,
    set_a: str,
    set_b: str,
    lg_k: int = 12,
) -> DataFrame:
    """Estimate |A ∩ B| from HLL sketches via inclusion-exclusion
    (|A| + |B| − |A ∪ B|) next to the EXACT intersection — the
    set-overlap question (audience overlap, benchmark contamination
    overlap) answered without materializing either id set.

    One row out: exact_a/b/union/inter, est_inter, within_bound. HLL
    union is LOSSLESS over sketches (the registers max-merge), so the
    only error is estimation error on three cardinalities; the bound
    flag allows 3 standard HLL errors (3·1.04/√2^lg_k) on the UNION
    magnitude — inclusion-exclusion error scales with |A ∪ B|, not
    with the (possibly tiny) intersection, and the output surfaces
    that honestly rather than promising relative accuracy.

    Plan: one scan builds both sketches (conditional aggregates), the
    exact side is two semi-joined count-distincts for the gate; at
    100 TB you keep ONLY the sketches (mergeable, ~4 KB each) and the
    exact side disappears.
    """
    ids = df.select(
        F.col(set_col).alias("__s"), F.col(id_col).alias("__id")
    ).where(F.col("__s").isin(set_a, set_b) & F.col("__id").isNotNull())
    a_ids = F.when(F.col("__s") == set_a, F.col("__id"))
    b_ids = F.when(F.col("__s") == set_b, F.col("__id"))
    sk = ids.agg(
        F.hll_sketch_agg(a_ids, F.lit(lg_k)).alias("__ska"),
        F.hll_sketch_agg(b_ids, F.lit(lg_k)).alias("__skb"),
        F.countDistinct(a_ids).alias("exact_a"),
        F.countDistinct(b_ids).alias("exact_b"),
    ).select(
        "exact_a",
        "exact_b",
        F.hll_sketch_estimate("__ska").alias("__ea"),
        F.hll_sketch_estimate("__skb").alias("__eb"),
        F.hll_sketch_estimate(
            F.hll_union("__ska", "__skb")
        ).alias("__eu"),
    )
    exact_inter = (
        ids.where(F.col("__s") == set_a)
        .select("__id")
        .intersect(ids.where(F.col("__s") == set_b).select("__id"))
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    exact_union = ids.agg(
        F.countDistinct("__id").alias("exact_union")
    )
    err = 3.0 * 1.04 / (2.0 ** (lg_k / 2.0))
    return (
        sk.crossJoin(exact_inter)  # three 1-row frames: scalar joins
        .crossJoin(exact_union)
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_inter",
            (F.col("__ea") + F.col("__eb") - F.col("__eu")).alias(
                "est_inter"
            ),
            (
                F.abs(
                    (F.col("__ea") + F.col("__eb") - F.col("__eu"))
                    - F.col("exact_inter")
                )
                <= F.lit(err) * F.col("exact_union")
            ).alias("within_bound"),
        )
    )
