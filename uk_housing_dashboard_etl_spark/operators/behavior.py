"""Behavioral analytics over the events fact table: adoption curves,
transition matrices, and first/last-touch attribution.

Beyond-reference surface (the reference's fact table is sales events;
these are the standard questions a product/ops team asks of any event
stream the reference's weekly mart cannot answer). All three operators
are pure DataFrame compositions — no UDFs, no collects.

Scale notes:
- ``cumulative_users``: the distinct-first-week trick turns "running
  COUNT(DISTINCT user) per week" (quadratic state, or an expensive
  exact distinct-window) into one groupBy(user) + one groupBy(week) +
  one tiny running-sum window over |weeks| rows. Two shuffles on the
  fact table, then window state that is O(weeks), not O(users).
- ``event_transitions``: one (user_id) shuffle shared by the lag window,
  then a partial-aggregated groupBy on the (prev, next) pair — the
  transition matrix is |types|² rows, so the final agg is tiny.
- ``first_last_touch``: single (user_id) shuffle; first/last/sum/count
  all ride the same unbounded frame over one sort, and min_by/max_by
  on a (ts, event_id) struct keeps ties deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cumulative_users(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Weekly new-user and running cumulative distinct-user counts.

    A user is "new" in the Monday-start week of their first event.
    ``cumulative_users`` at week w = COUNT(DISTINCT user_id) over all
    events with week <= w — computed as a running sum of new-user counts,
    which is exact because first weeks partition the user set.
    """
    first_week = (
        events.na.drop(subset=["user_id", ts_col])
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min(ts_col)).alias("week"))
    )
    new_by_week = first_week.groupBy("week").agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, 0)
    return new_by_week.select(
        "week",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """Event-type bigram (Markov transition) counts per user journey.

    For each user's events ordered by (ts, event_id) — event_id breaks
    timestamp ties deterministically — count each consecutive
    (prev_type, next_type) pair across all users. The first event of a
    user has no predecessor and is excluded (matches SQL lag semantics).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts-null rows are dropped (not ordered): Spark sorts NULLS FIRST and
    # DuckDB NULLS LAST, so keeping them would make transition counts
    # engine-dependent. The oracle applies the same filter.
    pairs = events.na.drop(subset=["user_id", "ts"]).select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    return (
        pairs.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("transitions"))
    )


def first_last_touch(
    events: DataFrame, deterministic_sum: bool = False
) -> DataFrame:
    """Per-user journey summary: first/last event type, span, volume.

    first/last are ordered by (ts, event_id) — deterministic under
    timestamp ties. Realized with min_by/max_by over a struct key, which
    aggregates with partial combine (no window sort needed).

    ``deterministic_sum`` sums ``value`` in exact 1e-4-unit integers so
    the total is partitioning/engine independent (oracle mode); plain
    double sum otherwise. Non-finite values leave the sum like NULLs
    in that mode (the quantization saturates on Spark, raises on the
    oracle's bigint cast — r13 sweep) while ``n_events`` still counts
    the row on both engines.
    """
    if deterministic_sum:
        tv = (
            F.sum(
                F.expr(
                    "CASE WHEN NOT isnan(value)"
                    " AND abs(value) < CAST('Infinity' AS DOUBLE)"
                    " THEN CAST(round(value * 10000.0) AS BIGINT) END"
                )
            )
            .cast("double")
            / F.lit(10000.0)
        )
    else:
        tv = F.sum("value")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.na.drop(subset=["user_id", "ts"])
        .groupBy("user_id")
        .agg(
            F.min_by("event_type", key).alias("first_type"),
            F.max_by("event_type", key).alias("last_type"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_events"),
            tv.alias("total_value"),
        )
    )


def debounce_events(
    events: DataFrame,
    gap_minutes: int = 10,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Debounce dedup: flag an event as a duplicate when the SAME key
    fired within the previous ``gap_minutes`` — the standard guard
    against double-clicks / retry storms / at-least-once replays before
    an event stream feeds counts or training data.

    Chained-lag semantics (each event compares to its immediate
    predecessor, kept or not): the debounce/throttle convention, and
    the one expressible as a single window — anchor-to-last-KEPT
    semantics would need a per-key recursive fold. Output is every
    input event plus ``is_dup``; callers filter or aggregate.

    Plan: ONE key-keyed exchange; the lag rides a total
    (``ts_col, tie_col``) ordering, so flags are engine-independent
    even for same-timestamp bursts (which are exactly what debouncing
    targets).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tie_col)
    prev = F.lag(ts_col).over(w)
    gap_s = gap_minutes * 60
    return events.where(
        F.col(ts_col).isNotNull() & F.col(key_cols[0]).isNotNull()
    ).select(
        tie_col,
        *key_cols,
        ts_col,
        (
            prev.isNotNull()
            & (
                F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
                < gap_s * 1_000_000
            )
        ).alias("is_dup"),
    )


def cap_events_per_key(
    events: DataFrame,
    max_per_day: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Per-key daily rate cap: keep at most ``max_per_day`` events per
    (key, day), earliest first — the per-user contribution cap a
    behavioral-training pipeline applies so hyperactive keys (bots,
    test accounts) cannot dominate the dataset, the event-stream
    analogue of ``curation.source_cap``.

    Plan: one (key, day)-keyed exchange for the rank window; ordering
    is total (``ts_col, tie_col``) so the cut is deterministic. A
    hyperactive key still owns a single reducer for its day — at
    extreme skew, pre-filter with :func:`stats.heavy_hitters` or cap
    in two phases like ``source_cap``'s salted top-k.
    """
    day = F.to_date(ts_col)
    w = Window.partitionBy(key_col, day).orderBy(ts_col, tie_col)
    return events.where(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        tie_col,
        key_col,
        ts_col,
        day.alias("day"),
        F.row_number().over(w).alias("day_seq"),
        (F.row_number().over(w) <= max_per_day).alias("kept"),
    )


def user_sequences(
    events: DataFrame,
    max_len: int = 32,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Per-key ordered action sequence, truncated to the most recent
    ``max_len`` — the canonical feature shape for sequence models over
    behavioral data (next-event prediction, session embeddings).

    Output per key: ``key, seq_len, truncated, sequence`` where
    ``sequence`` is the space-joined attribute run (most recent last) —
    a string rather than an array so downstream sinks and the driver
    canonicalizer treat it as a scalar; a tokenizer splits it back.

    Plan: ONE key exchange, no window sort — collect (ts, tie, attr)
    structs per key and ``array_sort`` them in-group (struct order =
    field order, so the sequence order is the total (ts, tie) order
    regardless of partitioning), then a slice keeps the LAST
    ``max_len`` entries (recency truncation, the standard choice).
    A key's whole history lands on one reducer — cap pathological keys
    first with :func:`cap_events_per_key` if per-key volume is
    unbounded.
    """
    per_key = (
        events.where(
            F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
        )
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("t"),
                            F.col(tie_col).alias("i"),
                            F.col(attr_col).alias("a"),
                        )
                    )
                ),
                lambda x: x["a"],
            ).alias("__seq")
        )
    )
    n = F.size("__seq")
    tail = F.when(
        n > max_len,
        F.slice("__seq", n - max_len + 1, max_len),
    ).otherwise(F.col("__seq"))
    return per_key.select(
        "key",
        F.least(n, F.lit(max_len)).alias("seq_len"),
        (n > max_len).alias("truncated"),
        F.concat_ws(" ", tail).alias("sequence"),
    )


def attribution_credit(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click", "signup"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Linear multi-touch attribution: every conversion distributes one
    unit of credit equally across the touch events since the user's
    PREVIOUS conversion (exclusive) — the model marketing/behavior
    teams reach for after last-touch stops explaining anything.
    Conversions with no preceding touch keep their unit as
    'unattributed' (credited to the conversion type itself).

    Output per touch type: ``event_type, n_touches, credit`` (4dp),
    plus one row for the conversion type holding the unattributed
    credit. Total credit across rows = number of conversions.

    Plan: ONE user-keyed sort shared by both windows — a running
    conversion counter assigns every touch to the conversion window it
    precedes; per-(user, window) touch counts come from a second pass
    over the same partitioning; credits are exact rationals (1/n)
    quantized through ``dsum``.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import dsum, round4

    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    relevant = events.where(
        F.col(ts_col).isNotNull()
        & F.col(key_col).isNotNull()
        & F.col(type_col).isin([conversion_type, *touch_types])
    )
    is_conv = (F.col(type_col) == conversion_type).cast("int")
    # conversions BEFORE this row (exclusive): touches between conv k and
    # conv k+1 carry window id k; conversion k itself also carries k
    marked = relevant.select(
        F.col(key_col).alias("user"),
        F.col(type_col).alias("etype"),
        F.coalesce(
            F.sum(is_conv).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("win"),
        is_conv.alias("is_conv"),
    )
    touches = marked.where(F.col("is_conv") == 0)
    convs = marked.where(F.col("is_conv") == 1).select(
        "user", F.col("win").alias("cwin")
    )
    sizes = touches.groupBy("user", "win").agg(
        F.count(F.lit(1)).alias("n_in_win")
    )
    # each touch's window is credited only if that window ENDS in a
    # conversion (join on the conversion's window id)
    credited = (
        touches.join(
            convs, (touches.user == convs.user) & (touches.win == convs.cwin)
        )
        .drop(convs.user)
        .join(sizes, ["user", "win"])
        .select("etype", (F.lit(1.0) / F.col("n_in_win")).alias("credit"))
    )
    unattributed = (
        convs.join(sizes, (convs.user == sizes.user) & (convs.cwin == sizes.win), "left_anti")
        .select(F.lit(conversion_type).alias("etype"), F.lit(1.0).alias("credit"))
    )
    return (
        credited.unionByName(unattributed)
        .groupBy(F.col("etype").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            round4(dsum(F.col("credit"))).alias("credit"),
        )
    )


def interarrival_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    min_gaps: int = 2,
) -> DataFrame:
    """Per-key inter-arrival-time profile: gap count, mean gap, sample
    CV (stddev/mean, ddof=1) and the Goh-Barabási burstiness score
    B = (cv − 1) / (cv + 1) — the behavioral fingerprint separating
    Poisson-like users (B ≈ 0), periodic bots (B → −1) and bursty
    humans (B → 1). The training-data angle: burstiness is a standard
    bot/abuse feature when curating interaction logs.

    Determinism across engines: gaps are exact integer microseconds off
    a total (ts, tie) ordering; the dispersion moments are EXACT sums
    (bigint Σgap, decimal(38) Σgap² — a day-scale gap squared overflows
    bigint) and only the final variance/cv/burstiness arithmetic runs
    in double, as the identical operation sequence the oracle writes
    out. Keys need ``min_gaps`` gaps for ddof=1 to be defined.

    Plan: ONE key-keyed exchange shared by the lag window and the
    groupBy (same partitioning, no second shuffle); moment sums combine
    map-side. Beyond-reference surface (the reference has no event
    analytics at all).
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    us = F.unix_micros(F.col(ts_col))
    gaps = (
        events.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            key_col,
            (us - F.lag(us).over(w)).alias("__gap_us"),
        )
        .where(F.col("__gap_us").isNotNull())
    )
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("__gap_us").alias("__sum"),
        F.sum(F.col("__gap_us").cast("decimal(38,0)") * F.col("__gap_us"))
        .alias("__sumsq"),
    )
    n = F.col("n_gaps").cast("double")
    s = F.col("__sum").cast("double")
    s2 = F.col("__sumsq").cast("double")
    mean_us = s / n
    var_us = (s2 - s * s / n) / (n - F.lit(1.0))
    # a key whose events all share one timestamp has mean gap 0: CV and
    # burstiness are undefined (0/0), not infinite — NULL, never an
    # ANSI divide-by-zero crash
    cv = F.when(F.col("__sum") > 0, F.sqrt(var_us) / mean_us)
    return (
        agg.where(F.col("n_gaps") >= min_gaps)
        .select(
            key_col,
            "n_gaps",
            round4(mean_us / F.lit(1_000_000.0)).alias("mean_gap_s"),
            round4(cv).alias("cv_gap"),
            round4((cv - F.lit(1.0)) / (cv + F.lit(1.0))).alias(
                "burstiness"
            ),
        )
    )


def basket_lift(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    item_col: str = "event_type",
    min_pair_count: int = 2,
) -> DataFrame:
    """Association mining over daily baskets: for every unordered pair
    of item types co-occurring in a (key, day) basket, the support,
    confidence (both directions' max is recoverable; emitted a→b on the
    lexicographic order), and LIFT — the classic market-basket screen,
    here the behavioral analog of ``pmi_pairs`` (events instead of
    tokens, baskets instead of documents).

    Pair generation is ROW-LOCAL: each basket collects its distinct
    item set once (sorted, so pairs come out canonically ordered) and
    fans out its C(k,2) pairs with nested ``transform`` inside codegen
    — no self-join of the basket table, no shuffle beyond the basket
    groupBy and the final pair count. Item-type cardinality bounds the
    fan-out (k ≤ |types|); with huge per-basket item sets, cap the
    basket first (standard practice — a 10k-item basket says nothing
    about association).

    lift = (c_ab · N) / (c_a · c_b): exact integer products, one double
    division (identical in the oracle); N joins on via a 1-row
    broadcast.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    baskets = (
        events.where(
            F.col(ts_col).isNotNull()
            & F.col(item_col).isNotNull()
            & F.col(key_cols[0]).isNotNull()
        )
        .groupBy(*key_cols, F.to_date(ts_col).alias("__day"))
        .agg(F.array_sort(F.collect_set(item_col)).alias("__items"))
    )
    pair_expr = F.flatten(
        F.transform(
            "__items",
            lambda x, i: F.transform(
                F.slice(
                    F.col("__items"),
                    i + F.lit(2),
                    F.greatest(F.size("__items") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    pair_counts = (
        baskets.select(F.explode(pair_expr).alias("__p"))
        .groupBy(
            F.col("__p.item_a").alias("item_a"),
            F.col("__p.item_b").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_baskets"))
        .where(F.col("pair_baskets") >= min_pair_count)
    )
    singles = (
        baskets.select(F.explode("__items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("item_baskets"))
    )
    totals = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    sa = singles.select(
        F.col("item").alias("item_a"), F.col("item_baskets").alias("__ca")
    )
    sb = singles.select(
        F.col("item").alias("item_b"), F.col("item_baskets").alias("__cb")
    )
    out = (
        pair_counts.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(totals))
    )
    n = F.col("n_baskets").cast("double")
    return out.select(
        "item_a",
        "item_b",
        "pair_baskets",
        F.col("__ca").alias("baskets_a"),
        F.col("__cb").alias("baskets_b"),
        round4(F.col("pair_baskets").cast("double") / n).alias("support"),
        round4(
            F.col("pair_baskets").cast("double")
            / F.col("__ca").cast("double")
        ).alias("confidence"),
        round4(
            (F.col("pair_baskets") * F.col("n_baskets")).cast("double")
            / (F.col("__ca") * F.col("__cb")).cast("double")
        ).alias("lift"),
    )


def top_paths(
    events: DataFrame,
    max_steps: int = 5,
    k: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Top-k user journey prefixes: each user's first ``max_steps``
    event types in (ts, tie) order joined into a path string, counted
    across users, ranked (count desc, path asc) — the "how do users
    actually move through the product" mart, and the aggregate view of
    ``user_sequences``.

    Plan: one user-keyed exchange builds each user's ordered prefix
    row-locally (struct-collect + array_sort + slice, like
    ``user_sequences``); the path groupBy is map-side combinable and
    the deterministic top-k cut runs on the aggregated |distinct
    paths| frame via TakeOrderedAndProject — no global sort of users.
    """
    from uk_housing_dashboard_etl_spark.functions.topk import (
        deterministic_topk,
    )

    prefix = (
        events.where(
            F.col(ts_col).isNotNull()
            & F.col(key_col).isNotNull()
            & F.col(item_col).isNotNull()
        )
        .groupBy(key_col)
        .agg(
            F.array_join(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct(ts_col, tie_col, item_col)
                        )
                    ).getField(item_col),
                    1,
                    max_steps,
                ),
                " > ",
            ).alias("path")
        )
    )
    counts = prefix.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    ranked = deterministic_topk(
        counts, [F.col("n_users").desc(), F.col("path")], k
    )
    return ranked.select("path", "n_users", "rank")
