"""Time-series comparison operators: period-over-period change.

The reference's header advertises "YOY change" (ref ``etl/etl_main.py:5``)
but never implements it — this module supplies it properly. Generic
lag-based comparison over the densified weekly grid: WoW is ``periods=1``,
YOY is ``periods=52`` (the grid guarantees one row per week per LA, so
row-lag equals time-lag).

Scale notes: a single ranking-window pass over the same
(partitionBy la, orderBy week) exchange the rolling operators use —
Catalyst schedules lag in the same Window operator when composed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.rounding import round4


def period_over_period(
    dense_weekly: DataFrame,
    value_cols: list[str] = ("transactions", "price_mean"),
    periods: int = 1,
) -> DataFrame:
    """Append ``<col>_prev``, ``<col>_delta`` and ``<col>_pct_change``
    for each value column, lagged ``periods`` grid rows per LA.

    pct_change is null when the prior value is 0 or null (no fabricated
    infinities — matches pandas ``pct_change`` on a zero base yielding
    inf, which downstream consumers reject anyway; we surface null).
    """
    w = Window.partitionBy("local_authority").orderBy("week")
    out = dense_weekly
    for c in value_cols:
        prev = F.lag(c, periods).over(w)
        out = (
            out.withColumn(f"{c}_prev", prev)
            .withColumn(f"{c}_delta", F.col(c) - prev)
            .withColumn(
                f"{c}_pct_change",
                F.when(
                    prev.isNull() | (prev == 0), F.lit(None).cast("double")
                ).otherwise(round4((F.col(c) - prev) / prev * 100.0)),
            )
        )
    return out


def rolling_time_range(
    weekly: DataFrame, days: int = 28
) -> DataFrame:
    """Time-RANGE rolling aggregates over the SPARSE weekly mart.

    The reference's k-row rolling (ref ``etl/etl_main.py:247-251``) is only
    time-correct because the grid is densified first (J2). RANGE frames
    make densification unnecessary: the frame is ``[week - days, week]``
    on the time axis, so missing weeks simply contribute nothing. At
    100 TB this skips materializing the weeks × LAs grid entirely —
    the window input is |observed weekly rows|, and both rolling columns
    share one (la, week-ordered) exchange.

    ``rolling_price_mean`` uses the same exact integer-unit trick as
    ``rolling.rolling_windows``: window sums over doubles are
    combine-order dependent across engines; sums of 1e-4-unit integers
    are not.
    """
    w = (
        Window.partitionBy("local_authority")
        .orderBy(F.unix_date(F.to_date("week")))
        .rangeBetween(-days, 0)
    )
    pm_units = F.round(F.col("price_mean") * F.lit(10000.0)).cast("bigint")
    rpm = (
        F.sum(pm_units).over(w).cast("double")
        / F.lit(10000.0)
        / F.count("price_mean").over(w)
    )
    return weekly.select(
        "week",
        "local_authority",
        "transactions",
        F.sum("transactions").over(w).alias("range_trans"),
        round4(rpm).alias("range_price_mean"),
        F.count("*").over(w).alias("weeks_present"),
    )


def interpolate_gaps(
    dense_weekly: DataFrame,
    value_col: str = "price_mean",
    key_col: str = "local_authority",
    ts_col: str = "week",
) -> DataFrame:
    """Linear interpolation of null gaps in a densified per-key series.

    For each null row: find the nearest non-null value before and after
    (ignore-nulls last/first over the same (key, week) sort) and
    interpolate linearly on the TIME axis — exact integer epoch-µs
    deltas, so the blend fraction is the same IEEE double in any engine.
    Boundary gaps (no neighbor on one side) stay null, matching pandas
    ``Series.interpolate(limit_area='inside')``.

    Scale: both ignore-nulls windows share the one
    (partitionBy key, orderBy ts) exchange — forward and backward frames
    are two passes over the same sorted partition, no second shuffle.
    The input is the mart-sized grid, not the fact table.
    """
    v = F.col(value_col)
    ts = F.col(ts_col)
    wp = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    marked_ts = F.when(v.isNotNull(), ts)
    prev_val = F.last(v, ignorenulls=True).over(wp)
    prev_ts = F.last(marked_ts, ignorenulls=True).over(wp)
    next_val = F.first(v, ignorenulls=True).over(wn)
    next_ts = F.first(marked_ts, ignorenulls=True).over(wn)
    frac = (F.unix_micros(ts) - F.unix_micros(prev_ts)) / (
        F.unix_micros(next_ts) - F.unix_micros(prev_ts)
    )
    interp = (
        F.when(v.isNotNull(), round4(v))
        .when(
            prev_val.isNull() | next_val.isNull(), F.lit(None).cast("double")
        )
        .otherwise(round4(prev_val + (next_val - prev_val) * frac))
    )
    return dense_weekly.select(
        ts.alias("week"),
        F.col(key_col).alias("local_authority"),
        "transactions",
        interp.alias("price_interp"),
        (v.isNull() & prev_val.isNotNull() & next_val.isNotNull()).alias(
            "is_interpolated"
        ),
    )


def time_weighted_mean(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average value per key (TWAP): each observation is
    weighted by how long it was the latest one, Σ vᵢ·Δtᵢ / Σ Δtᵢ with
    Δtᵢ = next_tsᵢ − tsᵢ — the correct mean for irregularly-sampled
    state (prices, sensor readings, feature values), where the plain
    mean over-weights bursts. The last observation of a key carries no
    interval and contributes nothing; a single-observation key yields
    NULL (no elapsed time to weight by).

    Plan: ONE key-keyed exchange; lead() and the aggregate share the
    partitioning. Weights are integer microseconds and values quantize
    to 1e-4 units before the weighted sum, so the result is exact
    integer arithmetic until the final divide (engine-independent;
    the oracle reproduces it bit-for-bit), then 4dp-rounded.

    Non-finite values (NaN/±Inf) are excluded BEFORE the lead — they
    pass an IS NOT NULL filter but cannot quantize to integer units
    (the ANSI bigint cast overflows on a single ±Inf row; r12 fuzz
    finding, same class as benford_profile). A dropped observation's
    holding interval accrues to its predecessor, identically on both
    engines since the oracle filters at the same stage.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    dt_us = F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(
        F.col(ts_col)
    )
    # value-units × µs-gaps overflows bigint (5e6 × 6e13 per row), so the
    # weighted terms accumulate in decimal(38) — exact in Spark, and the
    # oracle's hugeint sum matches it exactly
    v_units = (
        F.round(F.col(value_col) * F.lit(10000.0))
        .cast("bigint")
        .cast("decimal(38,0)")
    )
    weighted = (
        events.where(
            F.col(ts_col).isNotNull()
            & F.col(key_col).isNotNull()
            & F.col(value_col).isNotNull()
            & ~F.isnan(F.col(value_col))
            & (F.abs(F.col(value_col)) < F.lit(float("inf")))
        )
        .select(
            F.col(key_col).alias("key"),
            (v_units * dt_us).alias("__wv"),
            dt_us.alias("__w"),
        )
    )
    # a key whose observations are ALL timestamp-tied has Σdt = 0 (not
    # NULL — that's the single-observation case): no elapsed time to
    # weight by, so twap is NULL, never an ANSI divide-by-zero (r12
    # fuzz finding)
    total_w = F.sum("__w")
    return weighted.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        round4(
            F.when(
                total_w > 0,
                F.sum("__wv").cast("double") / F.lit(10000.0) / total_w,
            )
        ).alias("twap"),
    )


def ewma_smooth(
    weekly: DataFrame,
    value_col: str = "transactions",
    key_col: str = "local_authority",
    time_col: str = "week",
    alpha: float = 0.5,
    max_series_len: int = 10_000,
) -> DataFrame:
    """Per-key exponential moving average over the time series:

        ewma_t = α·x_t + (1−α)·ewma_{t−1},   ewma_0 = x_0

    EWMA is a RECURSIVE fold, which no window frame expresses — but it
    is still a pure column expression: collect each key's (time, value)
    series sorted, fold it with ``F.aggregate`` building the running
    array, then zip-and-explode back to rows. No UDF, no Python.

    Determinism: oracle parity rests on IDENTICAL OPERATION SEQUENCES,
    not exactness — the oracle's recursive CTE runs the same
    ``α·x + (1−α)·prev`` fold in the same order, so both engines round
    identically at every step. (With dyadic α and small integer inputs
    the steps happen to be exact in IEEE double, but once ewma_t needs
    more than 53 mantissa bits — long series × large values — steps DO
    round; they just round the same way on both sides.)

    Plan: one shuffle keyed by ``key_col`` (the same exchange any
    per-key window needs); each key's series folds row-locally. The
    fold rebuilds the accumulator array each step (O(n²) copies per
    key), which is fine at MART grain (weeks per key — the same size
    discipline as ``rolling.py``) but pathological on fact-grain input,
    so the contract is enforced: any key whose series exceeds
    ``max_series_len`` raises inside the plan rather than grinding
    quadratically. Re-aggregate to mart grain first, or raise the bound
    deliberately.
    """
    series = (
        weekly.groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(time_col, value_col))
            ).alias("__s")
        )
    )
    guard_msg = F.concat(
        F.lit("ewma_smooth: series length "),
        F.size("__s").cast("string"),
        F.lit(
            f" for key '{key_col}'="
        ),
        F.col(key_col).cast("string"),
        F.lit(
            f" exceeds max_series_len={max_series_len}; the F.aggregate "
            "fold copies the accumulator each step (quadratic). Pass "
            "mart-grain input or raise max_series_len explicitly."
        ),
    )
    series = series.withColumn(
        "__s",
        F.when(
            F.size("__s") > F.lit(max_series_len), F.raise_error(guard_msg)
        ).otherwise(F.col("__s")),
    )
    vals = F.col("__s").getField(value_col).cast("array<double>")
    ewma_arr = F.aggregate(
        vals,
        F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(F.size(acc) == 0, x).otherwise(
                    F.lit(alpha) * x
                    + F.lit(1.0 - alpha) * F.element_at(acc, -1)
                )
            ),
        ),
    )
    zipped = F.arrays_zip(
        F.col("__s").getField(time_col).alias("t"),
        vals.alias("x"),
        ewma_arr.alias("e"),
    )
    return (
        series.select(key_col, F.explode(zipped).alias("__z"))
        .select(
            key_col,
            F.col("__z.t").alias(time_col),
            F.col("__z.x").alias(value_col),
            F.col("__z.e").alias("ewma"),
        )
    )


def cusum_changepoints(
    weekly: DataFrame,
    value_col: str = "transactions",
    key_col: str = "local_authority",
    time_col: str = "week",
    slack: float = 0.0,
    threshold: float = 5.0,
    max_series_len: int = 10_000,
) -> DataFrame:
    """Per-key two-sided CUSUM level-shift detector over the series:

        s⁺_t = max(0, s⁺_{t−1} + (x_t − μ − slack))
        s⁻_t = min(0, s⁻_{t−1} + (x_t − μ + slack)),   s⁺_0 = s⁻_0 = 0

    with μ the key's own series mean. A sustained shift accumulates in
    one of the sums until it crosses ``threshold``; single-point blips
    decay — the complement to the z-score anomaly operator
    (point outliers) in the monitoring family.

    Like :func:`ewma_smooth`, CUSUM is a recursive fold no window frame
    expresses, run as a pure column expression: collect each key's
    sorted series and fold with ``F.aggregate``. Oracle parity rests on
    the IDENTICAL operation sequence — μ is one exact-integer-sum
    division, and both engines then run the same add/max chain, so
    every intermediate rounds identically. Same mart-grain contract as
    ``ewma_smooth``: series longer than ``max_series_len`` raise inside
    the plan rather than folding quadratically.

    Plan: one shuffle keyed by ``key_col``; the fold is row-local.
    """
    series = weekly.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(time_col, value_col))
        ).alias("__s")
    )
    guard_msg = F.concat(
        F.lit("cusum_changepoints: series length "),
        F.size("__s").cast("string"),
        F.lit(f" for key '{key_col}'="),
        F.col(key_col).cast("string"),
        F.lit(
            f" exceeds max_series_len={max_series_len}; pass mart-grain "
            "input or raise max_series_len explicitly."
        ),
    )
    series = series.withColumn(
        "__s",
        F.when(
            F.size("__s") > F.lit(max_series_len), F.raise_error(guard_msg)
        ).otherwise(F.col("__s")),
    )
    vals = F.col("__s").getField(value_col).cast("array<double>")
    # μ = exact Σx / n: one double division, identical on the oracle side
    mu = F.aggregate(
        vals, F.lit(0.0), lambda acc, x: acc + x
    ) / F.size("__s").cast("double")
    series = series.withColumn("__mu", mu)

    def fold(step) -> F.Column:
        return F.aggregate(
            vals,
            F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    step(
                        F.when(F.size(acc) == 0, F.lit(0.0)).otherwise(
                            F.element_at(acc, -1)
                        ),
                        x,
                    )
                ),
            ),
        )

    spos = fold(
        lambda prev, x: F.greatest(
            F.lit(0.0), prev + (x - F.col("__mu") - F.lit(slack))
        )
    )
    sneg = fold(
        lambda prev, x: F.least(
            F.lit(0.0), prev + (x - F.col("__mu") + F.lit(slack))
        )
    )
    zipped = F.arrays_zip(
        F.col("__s").getField(time_col).alias("t"),
        vals.alias("x"),
        spos.alias("sp"),
        sneg.alias("sn"),
    )
    return series.select(
        key_col, F.explode(zipped).alias("__z")
    ).select(
        key_col,
        F.col("__z.t").alias(time_col),
        F.col("__z.x").alias(value_col),
        round4(F.col("__z.sp")).alias("cusum_pos"),
        round4(F.col("__z.sn")).alias("cusum_neg"),
        (
            (F.col("__z.sp") > F.lit(threshold))
            | (F.col("__z.sn") < F.lit(-threshold))
        ).alias("changepoint"),
    )


def holt_linear(
    weekly: DataFrame,
    value_col: str = "transactions",
    key_col: str = "local_authority",
    time_col: str = "week",
    alpha: float = 0.5,
    beta: float = 0.5,
    max_series_len: int = 10_000,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + trend):

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        l_1 = x_1,  b_1 = 0

    The trending sibling of :func:`ewma_smooth` — EWMA lags a trending
    series by design; Holt's coupled level/trend recursion tracks it.
    Emits per row the level, trend, and one-step-ahead forecast
    (l + b) the NEXT observation should be compared against.

    Two COUPLED recursions in one fold: the ``F.aggregate`` accumulator
    is an array of (l, b) structs, so the pattern that expressed
    EWMA/CUSUM generalizes to multi-state recursions without Python.
    Oracle parity is the identical-operation-sequence argument: the
    recursive CTE computes l then b with the same expressions in the
    same order. Same mart-grain contract and in-plan length guard as
    the siblings.
    """
    series = weekly.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(time_col, value_col))
        ).alias("__s")
    )
    guard_msg = F.concat(
        F.lit("holt_linear: series length "),
        F.size("__s").cast("string"),
        F.lit(f" for key '{key_col}'="),
        F.col(key_col).cast("string"),
        F.lit(
            f" exceeds max_series_len={max_series_len}; pass mart-grain "
            "input or raise max_series_len explicitly."
        ),
    )
    series = series.withColumn(
        "__s",
        F.when(
            F.size("__s") > F.lit(max_series_len), F.raise_error(guard_msg)
        ).otherwise(F.col("__s")),
    )
    vals = F.col("__s").getField(value_col).cast("array<double>")
    lb = F.aggregate(
        vals,
        F.expr("CAST(array() AS ARRAY<STRUCT<l: DOUBLE, b: DOUBLE>>)"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(
                    F.size(acc) == 0,
                    F.struct(
                        x.alias("l"), F.lit(0.0).alias("b")
                    ),
                ).otherwise(
                    F.struct(
                        (
                            F.lit(alpha) * x
                            + F.lit(1.0 - alpha)
                            * (
                                F.element_at(acc, -1).getField("l")
                                + F.element_at(acc, -1).getField("b")
                            )
                        ).alias("l"),
                        (
                            F.lit(beta)
                            * (
                                (
                                    F.lit(alpha) * x
                                    + F.lit(1.0 - alpha)
                                    * (
                                        F.element_at(acc, -1).getField("l")
                                        + F.element_at(acc, -1).getField("b")
                                    )
                                )
                                - F.element_at(acc, -1).getField("l")
                            )
                            + F.lit(1.0 - beta)
                            * F.element_at(acc, -1).getField("b")
                        ).alias("b"),
                    )
                )
            ),
        ),
    )
    zipped = F.arrays_zip(
        F.col("__s").getField(time_col).alias("t"),
        vals.alias("x"),
        lb.getField("l").alias("l"),
        lb.getField("b").alias("b"),
    )
    return series.select(key_col, F.explode(zipped).alias("__z")).select(
        key_col,
        F.col("__z.t").alias(time_col),
        F.col("__z.x").alias(value_col),
        round4(F.col("__z.l")).alias("level"),
        round4(F.col("__z.b")).alias("trend"),
        round4(F.col("__z.l") + F.col("__z.b")).alias("forecast"),
    )


def peak_concurrency(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Sweep-line interval-overlap profile: per day, the number of
    intervals starting that day and the PEAK number simultaneously
    active — the "max concurrent sessions/users/connections" metric.
    End-exclusive semantics: an interval ending at t releases its slot
    before one starting at t claims it, so back-to-back intervals never
    double-count.

    Plan: the textbook single-machine algorithm is a global sort +
    running sum — which would be one unpartitioned window over the
    whole fact table. This is the distributed two-phase prefix-sum
    version instead: (1) collapse endpoints to (day, instant) grain
    with start/end counts (map-side combinable); (2) running sums
    WITHIN each day (window partitioned by day — parallel across
    days); (3) a day-grain frame of per-day net totals gets the
    cross-day carry via one bounded unpartitioned window (|days| rows);
    (4) join the carry back (day-grain, AQE-broadcast) and take the
    per-day max.

    Peak semantics are EVENT-INSTANT-ONLY (the spec shared with the
    DuckDB oracle and the property test): a day's peak is the maximum
    level measured AT its endpoints, so a day whose true maximum is the
    midnight carry level before its first event reports the lower
    post-event value, and days crossed by intervals but containing no
    endpoints are absent from the output. The carry still propagates
    midnight-crossing intervals' net effect into every later day's
    endpoint levels — only the endpoint-free carry plateau itself is
    unreported.
    """
    # endpoints via row-local explode, not a 2-scan union: one pass
    # over the interval table emits both the +1 start and −1 end points
    pts = (
        intervals.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(start_col).alias("t"),
                        F.lit(1).alias("ns"),
                        F.lit(0).alias("ne"),
                    ),
                    F.struct(
                        F.col(end_col).alias("t"),
                        F.lit(0).alias("ns"),
                        F.lit(1).alias("ne"),
                    ),
                )
            ).alias("__p")
        )
        .select("__p.t", "__p.ns", "__p.ne")
        .where(F.col("t").isNotNull())
        .groupBy(F.to_date("t").alias("day"), F.col("t"))
        .agg(F.sum("ns").alias("ns"), F.sum("ne").alias("ne"))
    )
    w_day = (
        Window.partitionBy("day")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the per-day NET rides the same day-partitioned Window exchange as
    # the cumulative sums (a separate groupBy lineage would re-derive
    # the point frame — and therefore re-scan the fact table)
    w_day_all = Window.partitionBy("day")
    within = pts.select(
        "day",
        "ns",
        (F.sum("ns").over(w_day) - F.sum("ne").over(w_day)).alias("__act"),
        F.sum(F.col("ns") - F.col("ne")).over(w_day_all).alias("__net"),
    )
    # reduce to day grain FIRST (reuses the hash(day) partitioning — no
    # new exchange), then apply the cross-day carry as a window over the
    # |days|-row frame and add it to the within-day max. The carry is
    # constant per day, so max(act + carry) = max(act) + carry — no
    # join back to point grain, the whole plan is ONE linear lineage
    # (one fact scan; verified in the executed plan).
    daily = within.groupBy("day").agg(
        F.sum("ns").alias("n_started"),
        F.max("__act").alias("__max_act"),
        F.max("__net").alias("__net"),
    )
    w_days = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return daily.select(
        "day",
        "n_started",
        (
            F.col("__max_act")
            + F.coalesce(F.sum("__net").over(w_days), F.lit(0))
        ).alias("peak_active"),
    )


def autocorrelation(
    series: DataFrame,
    time_col: str,
    value_col: str,
    max_lag: int = 6,
) -> DataFrame:
    """Sample autocorrelation function: for each lag 1..``max_lag``,
    ``acf = Σ_t (x_t − x̄)(x_{t+lag} − x̄) / Σ_t (x_t − x̄)²`` with the
    FULL-series mean and variance (the standard biased ACF estimator —
    the denominator runs over all n points, the numerator over the
    n − lag overlapping pairs). Output: (lag, n_pairs, acf).

    ``series`` is ONE series at (time, value) grain — e.g. the global
    weekly transaction count. Determinism: x̄ is a single exact
    division of an order-independent sum, each product term is then an
    identical IEEE double on every engine, and both Σs quantize each
    term to 1e-4 units before an exact integer sum (the ``dsum`` rule),
    so partitioning can never move the ratio; the result rounds to 4dp.

    Plan: the series frame is AGGREGATE-grain (|periods| rows — weeks,
    days), so the lag windows run one bounded unpartitioned sort, the
    same documented exception as ``holt_linear``/``cusum_changepoints``.
    The fan-out to ``max_lag`` lag columns happens in ONE window pass
    (every F.lag shares the frame), not max_lag unions. At 100 TB the
    heavy part is producing ``series`` (a groupBy of the fact table);
    the ACF itself never sees fact-grain data.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import dsum

    # a NULL time key has no position in the series: Spark's lag window
    # sorts it FIRST, DuckDB's LAST (r14 sweep, order axis — a single
    # NULL-ts event shifted every lag pair), so it is excluded on both
    # engines (oracle: WHERE ts IS NOT NULL before the weekly groupBy)
    x = series.select(
        F.col(time_col).alias("__t"),
        F.col(value_col).cast("double").alias("__x"),
    ).where(F.col("__x").isNotNull() & F.col("__t").isNotNull())
    # exact mean of the bounded series: integer-unit sum / count
    stats = x.agg(
        (
            F.sum(F.round(F.col("__x") * 10000.0).cast("bigint")).cast(
                "double"
            )
            / 10000.0
            / F.count(F.lit(1))
        ).alias("__mean"),
    )
    w = Window.orderBy("__t")  # bounded: |periods| rows by contract
    lagged = x.crossJoin(F.broadcast(stats)).select(
        "__x",
        "__mean",
        *[
            F.lag("__x", lag).over(w).alias(f"__l{lag}")
            for lag in range(1, max_lag + 1)
        ],
    )
    dev = F.col("__x") - F.col("__mean")
    per_lag = [
        lagged.agg(
            F.lit(lag).alias("lag"),
            F.count(f"__l{lag}").alias("n_pairs"),
            dsum((F.col(f"__l{lag}") - F.col("__mean")) * dev).alias(
                "__num"
            ),
            dsum(dev * dev).alias("__den"),
        )
        for lag in range(1, max_lag + 1)
    ]
    out = per_lag[0]
    for p in per_lag[1:]:
        out = out.unionAll(p)
    return out.select(
        "lag",
        "n_pairs",
        round4(F.col("__num") / F.col("__den")).alias("acf"),
    )
