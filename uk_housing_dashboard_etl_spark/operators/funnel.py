"""Behavioral funnel + cohort-retention operators over the events table.

Beyond-reference surface (the reference pipeline has no user-journey
analytics; ref ``etl/etl_main.py`` stops at weekly marts): these are the
standard product-analytics queries a training-data/event pipeline runs
next to the marts.

Scale design:

- ``funnel_steps`` is ONE shuffle (groupBy user) regardless of the number
  of funnel steps. The naive formulation is a cascade of join+agg per
  step (n_steps shuffles over the full events table); instead we sort
  each user's events once (``array_sort(collect_list(...))``) and advance
  the funnel with a sequential JVM ``aggregate`` fold — per-user state is
  (stage, last_ts), exactly the strictly-increasing-timestamp semantics
  of the staged-min SQL. Per-user event lists are bounded by per-user
  activity, not table size; a pathological power user is one fat row, not
  a skewed join.
- ``weekly_retention`` is a distinct + one self-join co-partitioned on
  (user, week) — both sides share the same shuffle key, and the
  week-arithmetic lives on the build side so AQE can still pick a
  broadcast for small cohorts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.rounding import round4


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict sequential conversion funnel.

    A user reaches step i when an event of type ``steps[i]`` occurs
    STRICTLY after the timestamp that satisfied step i-1 (step 0 is the
    user's first ``steps[0]`` event). Returns one row per step:
    ``(step, event_type, users)`` with ``users`` = count of users whose
    funnel progressed at least that far.
    """
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    typed = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).where(F.col(type_col).isin(steps))

    # one shuffle: per-user time-ordered fold advancing (stage, last_ts).
    # Ties on ts are irrelevant: the strict `>` check excludes equal-ts
    # events no matter how the sort ordered them, matching the staged
    # min(ts WHERE ts > prev) SQL bit-for-bit.
    ordered = F.array_sort(F.collect_list(F.struct("ts", "etype")))
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("t")
    )

    def _advance(acc: F.Column, e: F.Column) -> F.Column:
        can = (
            (acc.stage < F.lit(n))
            & (e.etype == F.element_at(steps_arr, acc.stage + 1))
            & ((acc.stage == 0) | (e.ts > acc.t))
        )
        return F.when(
            can,
            F.struct((acc.stage + 1).alias("stage"), e.ts.alias("t")),
        ).otherwise(acc)

    # counts of users whose funnel ENDED at each stage (≤ n tiny rows)
    ended = (
        typed.groupBy("user")
        .agg(F.aggregate(ordered, init, _advance).getField("stage").alias("stage"))
        .where(F.col("stage") >= 1)
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # users reaching step i = Σ counts of final stages ≥ i; join the ended
    # counts onto the FULL step list first so steps nobody ended at still
    # accumulate the users who progressed past them
    all_steps = reduce(
        DataFrame.unionByName,
        [
            events.sparkSession.range(1).select(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("event_type"),
            )
            for i, s in enumerate(steps)
        ],
    )
    w = Window.orderBy(F.col("step").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        all_steps.join(
            F.broadcast(ended), all_steps.step == ended.stage, "left"
        )
        .select(
            "step",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
        .select(
            "step", "event_type", F.sum("n").over(w).alias("users")
        )
    )


def weekly_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Week-over-week cohort retention.

    For each Monday-start week: how many distinct users were active, and
    how many of them were also active the following week. Rate is rounded
    to 4dp (cross-engine float policy).
    """
    active = events.select(
        F.date_trunc("week", F.col(ts_col)).alias("week"),
        F.col(user_col).alias("user_id"),
    ).distinct()
    nxt = active.select(
        F.col("user_id").alias("u2"),
        (F.col("week") - F.expr("INTERVAL 7 DAYS")).alias("wprev"),
    )
    j = active.join(
        nxt,
        (active.week == nxt.wprev) & (active.user_id == nxt.u2),
        "left",
    )
    return j.groupBy("week").agg(
        F.count(F.lit(1)).alias("active_users"),
        F.count("u2").alias("retained_users"),
        round4(F.count("u2") / F.count(F.lit(1))).alias("retention_rate"),
    )


def cohort_matrix(
    events: DataFrame,
    max_offset: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Full cohort retention matrix: users grouped by their FIRST-active
    Monday week (the cohort), then for each week offset 0..``max_offset``
    the count and fraction of the cohort active that week — the
    classic triangle chart behind every retention dashboard, and the
    generalization of :func:`weekly_retention` (which is its offset=1
    diagonal).

    Output: ``cohort_week, week_offset, cohort_size, active_users,
    retention`` (4dp), offset 0 rows always at retention 1.

    Plan: one (user)-keyed aggregate pins each user's cohort week; the
    distinct (user, week) activity frame joins back on the user key —
    both sides are far smaller than the fact table (distinct users /
    user-weeks), so the fact table is scanned twice but shuffled only
    as compact keys. The matrix itself is |cohorts| × |offsets| rows —
    driver-tiny at any corpus size.
    """
    active = (
        events.na.drop(subset=[user_col, ts_col])
        .select(
            F.col(user_col).alias("user_id"),
            F.date_trunc("week", F.col(ts_col)).alias("week"),
        )
        .distinct()
    )
    cohorts = active.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    joined = active.join(cohorts, "user_id").select(
        "cohort_week",
        "user_id",
        (
            F.datediff(F.col("week"), F.col("cohort_week")) / 7
        ).cast("int").alias("week_offset"),
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        joined.where(F.col("week_offset") <= max_offset)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_size",
            "active_users",
            round4(F.col("active_users") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
    )


def funnel_timing(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert between adjacent funnel stages: for each stage
    transition, among users who made it, the exact median and p90 of
    the elapsed seconds — where the funnel is LOSING people slowly vs
    fast, the follow-up question to :func:`funnel_steps`' counts.

    Semantics share the strict greedy fold: the same single-shuffle
    per-user ``aggregate`` as ``funnel_steps``, extended to carry the
    ARRAY of satisfying timestamps, so both operators are one scan and
    agree by construction. Elapsed times are integer microseconds into
    the exact percentile (linear interpolation), divided to seconds and
    4dp-rounded only at the end.

    Output: ``stage_from, stage_to, n_users, median_s, p90_s``.
    """
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    typed = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).where(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull())

    ordered = F.array_sort(F.collect_list(F.struct("ts", "etype")))
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("t"),
        F.array().cast("array<timestamp>").alias("times"),
    )

    def _advance(acc: F.Column, e: F.Column) -> F.Column:
        can = (
            (acc.stage < F.lit(n))
            & (e.etype == F.element_at(steps_arr, acc.stage + 1))
            & ((acc.stage == 0) | (e.ts > acc.t))
        )
        return F.when(
            can,
            F.struct(
                (acc.stage + 1).alias("stage"),
                e.ts.alias("t"),
                F.array_append(acc.times, e.ts).alias("times"),
            ),
        ).otherwise(acc)

    times = typed.groupBy("user").agg(
        F.aggregate(ordered, init, _advance).getField("times").alias("times")
    )
    # one row per achieved transition: stage i -> i+1 with elapsed µs
    deltas = times.select(
        F.posexplode(
            F.expr(
                # sequence(1, 0) would generate DESCENDING [1, 0]: guard
                # single-stage users with an explicit empty array
                "CASE WHEN size(times) < 2 THEN array()"
                " ELSE transform(sequence(1, size(times) - 1), i ->"
                " unix_micros(times[i]) - unix_micros(times[i - 1])) END"
            )
        ).alias("idx", "dt_us")
    ).select((F.col("idx") + 1).alias("stage_from"), "dt_us")
    pcts = F.percentile("dt_us", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        deltas.where(F.col("dt_us").isNotNull())
        .groupBy("stage_from")
        .agg(F.count(F.lit(1)).alias("n_users"), pcts.alias("__p"))
        .select(
            F.col("stage_from").cast("int").alias("stage_from"),
            (F.col("stage_from") + 1).cast("int").alias("stage_to"),
            "n_users",
            round4(F.col("__p")[0] / F.lit(1e6)).alias("median_s"),
            round4(F.col("__p")[1] / F.lit(1e6)).alias("p90_s"),
        )
    )
