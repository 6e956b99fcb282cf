"""Statistical summary operators: correlation/covariance, fixed-width
histograms, and GROUPING SETS lattices.

Beyond-reference surface: the reference computes only location statistics
(mean/median/percentiles, ``etl/etl_main.py:212-218``); these add the
dispersion/association layer a pricing-analytics user expects, plus the
explicit multi-granularity aggregation the CUBE/ROLLUP queries imply.

Scale notes: all three are single-pass partial-aggregable plans — corr /
covar / stddev decompose into moment sums that combine map-side, and a
fixed-width histogram bucket is a projection, so the shuffle carries
|groups| (or |buckets|) rows, never the fact table. GROUPING SETS
replicates each input row once per matching set at the partial-agg stage
(Spark's Expand operator) — 3 sets here, bounded fan-out before combine.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def corr_stats(lineitem: DataFrame) -> DataFrame:
    """Per (returnflag, linestatus): association between quantity and
    gross price — Pearson corr, sample covariance, both sample stddevs.

    Rows with a non-finite quantity OR price are excluded at this
    operator boundary (r13 sweep): one ±Inf row makes Spark's moment
    aggregates emit NaN/Inf while DuckDB's STDDEV raises an
    out-of-range error — and a correlation over sentinel values is
    meaningless. Both columns must be finite so every statistic sees
    the SAME n (corr/covar pairwise semantics). The correlation itself
    is the post-agg division covar/(σq·σp), NULL when either variance
    is zero: Spark's ANSI ``corr`` RAISES DIVIDE_BY_ZERO on a
    constant-valued group where DuckDB's returns NULL (r13 fresh-draw
    fuzz).
    """
    q, p = F.col("l_quantity").cast("double"), F.col(
        "l_extendedprice"
    ).cast("double")
    inf = F.expr("CAST('Infinity' AS DOUBLE)")
    both_ok = (
        q.isNotNull() & ~F.isnan(q) & (F.abs(q) < inf)
        & p.isNotNull() & ~F.isnan(p) & (F.abs(p) < inf)
    )
    return (
        lineitem.where(both_ok)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.covar_samp("l_quantity", "l_extendedprice").alias(
                "qty_price_covar"
            ),
            F.stddev_samp("l_quantity").alias("qty_stddev"),
            F.stddev_samp("l_extendedprice").alias("price_stddev"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "n",
            F.when(
                (F.col("qty_stddev") > 0) & (F.col("price_stddev") > 0),
                F.col("qty_price_covar")
                / (F.col("qty_stddev") * F.col("price_stddev")),
            ).alias("qty_price_corr"),
            "qty_price_covar",
            "qty_stddev",
            "price_stddev",
        )
    )


def price_histogram(orders: DataFrame, bucket_width: float = 25000.0) -> DataFrame:
    """Fixed-width histogram of order totals.

    Bucket = floor(price / width); bounds are exact integer multiples of
    the width, so bucket assignment is engine-independent. Emits count
    plus within-bucket min/max (the data-driven bucket envelope).

    Non-finite prices are excluded like NULLs at this operator boundary
    (r13 sweep: Spark's floor silently saturates ±Inf to a phantom
    ±maxlong bucket while the oracle's bigint cast raises — and a
    histogram bucket for NaN/Inf is meaningless).
    """
    pv = F.col("o_totalprice").cast("double")
    b = F.floor(F.col("o_totalprice") / F.lit(bucket_width))
    return (
        orders.na.drop(subset=["o_totalprice"])
        .where(
            ~F.isnan(pv)
            & (F.abs(pv) < F.expr("CAST('Infinity' AS DOUBLE)"))
        )
        .groupBy(b.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .withColumn("bucket_lo", F.col("bucket") * F.lit(bucket_width))
    )


def grouping_sets_summary(lineitem: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS lattice: ((rf, ls), (rf), ()) — the subtotal
    shape a report needs without paying for the full CUBE.

    Uses Spark SQL GROUPING SETS (the DataFrame API exposes only
    cube/rollup); GROUPING_ID disambiguates the all-null subtotal rows
    from genuine NULL group keys.
    """
    spark = SparkSession.getActiveSession() or lineitem.sparkSession
    # per-call unique view name: a fixed name would race when two threads
    # call this concurrently on the same session with different inputs
    view = f"__gs_lineitem_{uuid.uuid4().hex}"
    lineitem.createOrReplaceTempView(view)
    try:
        # spark.sql analyzes eagerly — the view resolves to this input's
        # plan here, so dropping it afterwards is safe even pre-action
        return spark.sql(
            f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
                   count(*) AS n,
                   -- non-finite terms leave the sums like NULLs (r13)
                   CAST(sum(CASE WHEN NOT isnan(l_quantity)
                                 AND abs(l_quantity) < CAST('Infinity' AS DOUBLE)
                            THEN CAST(round(l_quantity * 10000.0) AS BIGINT)
                            END) AS DOUBLE)
                       / 10000.0 AS sum_qty,
                   CAST(sum(CASE WHEN NOT isnan(l_extendedprice)
                                 AND abs(l_extendedprice) < CAST('Infinity' AS DOUBLE)
                            THEN CAST(round(l_extendedprice * 10000.0) AS BIGINT)
                            END) AS DOUBLE)
                       / 10000.0 AS sum_price
            FROM {view}
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), ())
            """
        )
    finally:
        spark.catalog.dropTempView(view)


def heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Top-N most frequent keys with their traffic share — the first
    diagnostic to run before any key-partitioned join/agg at scale: a
    key holding >1/shuffle-partitions of the rows will straggle its
    reducer, and the cure (salting, AQE skew split, broadcast) depends
    on how concentrated the head is.

    Output: ``rank, <key_cols>, n_rows, share, cum_share`` (shares 4dp).

    Plan: map-side-combinable count per key, a 1-row broadcast total,
    then the scalable global top-N (``TakeOrderedAndProject`` via
    ``deterministic_topk`` — a per-task N-row heap, never a full sort).
    The running cumulative share is a window over the N surviving rows
    only. Ordering is total (count desc, then keys) so the cut is
    deterministic under ties.
    """
    from uk_housing_dashboard_etl_spark.functions.topk import (
        deterministic_topk,
    )
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    order = [F.col("n_rows").desc()] + [F.col(c) for c in key_cols]
    top = deterministic_topk(counts, order, top_n)
    w_cum = Window.orderBy("rank")
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "rank",
            *key_cols,
            "n_rows",
            round4(F.col("n_rows") / F.col("__total")).alias("share"),
            round4(
                F.sum("n_rows").over(w_cum) / F.col("__total")
            ).alias("cum_share"),
        )
    )


def key_skew_summary(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """One-row skew profile of a prospective shuffle key: key count, row
    count, the heaviest key's size, exact p50/p90/p99 of per-key sizes,
    and ``skew_factor`` = max/mean — the multiplier on the slowest
    reducer vs a uniform shuffle. A skew_factor near 1 means hash
    partitioning is safe; large values call for salting
    (``functions.skew.salted_agg``) or AQE skew-join splitting.

    Plan: per-key counts (map-side combinable) then ONE global aggregate
    over |keys| rows; the three percentile points share one sort buffer
    (single ``percentile`` call, same decision as ``weekly_mart``).
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    pcts = F.percentile("__n", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("n_rows"),
        F.max("__n").alias("max_count"),
        pcts.alias("__pcts"),
    ).select(
        "n_keys",
        "n_rows",
        "max_count",
        round4(F.col("__pcts")[0]).alias("p50_count"),
        round4(F.col("__pcts")[1]).alias("p90_count"),
        round4(F.col("__pcts")[2]).alias("p99_count"),
        round4(
            F.col("max_count") * F.col("n_keys") / F.col("n_rows")
        ).alias("skew_factor"),
    )


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """ANALYZE-style per-column profile: row count, null count and
    fraction, exact distinct count and fraction — the statistics a
    cost-based planner, data-contract check, or dataset card starts
    from, as one long-format row per column.

    Plan: ONE aggregate over the scan computes every column's counts
    (the multi-column exact countDistinct goes through Spark's Expand —
    one replicated row per profiled column before partial aggregation,
    a deliberate |cols|× map-side cost bounded by column pruning to the
    profiled set); the long-format melt of the 1-row result is
    driver-trivial. At 100 TB profile hot columns individually or swap
    exact ndv for ``approx_count_distinct`` (HLL, no Expand) — the
    sketches module's mergeable path.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(per_col).alias("p"))
        .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct")
        .withColumn(
            "null_frac", round4(F.col("n_nulls") / F.col("n_rows"))
        )
        .withColumn(
            "distinct_frac", round4(F.col("n_distinct") / F.col("n_rows"))
        )
    )


def join_cardinality(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Exact predicted inner-join output size WITHOUT running the join:
    Σ_k cL(k)·cR(k) over the shared keys — the number that decides
    whether an equi-join is safe to run at all (a hot key on both sides
    multiplies), plus the matched-key count and an amplification factor
    vs the larger input. Run this (cost: two compact count aggregates)
    before any fact-fact join a query planner hasn't seen.

    Plan: each side collapses to (key, count) map-side; the count
    frames join on the key (rows = distinct keys, not input rows) and
    reduce to ONE row. Per-key products accumulate in decimal(38) —
    two hot keys can overflow bigint.
    """
    cl = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nl"))
    cr = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nr"))
    tl = left.agg(
        F.count(F.lit(1)).alias("left_rows"),
    ).crossJoin(right.agg(F.count(F.lit(1)).alias("right_rows")))
    prod = F.col("__nl").cast("decimal(38,0)") * F.col("__nr")
    matched = cl.join(cr, keys).agg(
        F.count(F.lit(1)).alias("matched_keys"),
        F.sum(prod).cast("decimal(38,0)").alias("join_rows"),
    )
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    return matched.crossJoin(F.broadcast(tl)).select(
        "matched_keys",
        F.col("join_rows").cast("bigint").alias("join_rows"),
        "left_rows",
        "right_rows",
        round4(
            F.col("join_rows").cast("double")
            / F.greatest(F.col("left_rows"), F.col("right_rows"))
        ).alias("amplification"),
    )


def grouped_slope(
    df: DataFrame,
    group_cols: list[str],
    x_col,
    y_col,
) -> DataFrame:
    """Per-group OLS trend line (slope + intercept) from exact moment
    sums: slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) — the "is this metric
    drifting" primitive (price trend per region, value trend per event
    type) as ONE map-side-combinable aggregate, no window, no sort.

    Determinism: x must be integer-valued (e.g. days since epoch); y
    quantizes to 1e-4 units; all five moments accumulate in decimal(38)
    (Σxy with day-scale x and 1e-4-unit y overflows bigint), so the
    slope is exact integer arithmetic until the final divide, then
    4dp-rounded — bit-identical in the SQL oracle's hugeint sums.
    Groups with a single point (or constant x) have zero variance and
    yield NULL slope/intercept. Non-finite y rows are excluded like
    NULLs at this operator boundary (the 1e-4 quantization would
    otherwise CAST_OVERFLOW on Spark and raise on the oracle's bigint
    cast — the r12 NaN/±Inf fuzz class); the oracle filters
    ``isfinite(value)`` in the same place so n_points agrees.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    x = x_col.cast("decimal(38,0)")
    yd = y_col.cast("double")
    finite_y = ~F.isnan(yd) & (F.abs(yd) < F.expr("CAST('Infinity' AS DOUBLE)"))
    yu = F.round(y_col * F.lit(10000.0)).cast("bigint").cast("decimal(38,0)")
    agg = df.where(x_col.isNotNull() & y_col.isNotNull() & finite_y).groupBy(
        *group_cols
    ).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(yu).alias("__sy"),
        F.sum(x * yu).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    den = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    slope_units = F.when(den != 0, num / den)
    mean_y = F.col("__sy").cast("double") / F.col("__n").cast("double")
    mean_x = F.col("__sx").cast("double") / F.col("__n").cast("double")
    return agg.select(
        *group_cols,
        F.col("__n").cast("bigint").alias("n_points"),
        round4(slope_units / F.lit(10000.0)).alias("slope"),
        round4((mean_y - slope_units * mean_x) / F.lit(10000.0)).alias(
            "intercept"
        ),
    )


def psi_drift(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    period_col,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index per group between two periods: bucket
    the CURRENT period's values by the REFERENCE period's exact decile
    edges and compute Σ (p−q)·ln(p/q) — the standard drift monitor for
    model inputs/outputs (rule of thumb: <0.1 stable, >0.2 drifted).
    ``period_col`` is a boolean column: true = reference, false =
    current.

    Add-one smoothing on bucket counts (p = (c+1)/(n+buckets)) keeps
    empty buckets finite and the statistic exactly reproducible — no
    epsilon tuning. The per-bucket ln terms are 1e-4-quantized before
    the (10-row) sum (``dsum``) so partial-agg order can't perturb the
    4dp result.

    Plan: one pass for per-group reference deciles (exact percentile —
    groups × 9 edges, a broadcastable frame), one pass assigning every
    row its bucket via a codegen ``filter(edges, x -> v > x)`` count,
    then a groups × buckets aggregate — nothing larger than
    |groups|·|buckets| ever reaches the driver side of the plan.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import (
        dsum,
        round4,
    )

    # non-finite values are excluded like NULLs at this operator
    # boundary (r13 sweep: the engines BUCKET them at opposite ends —
    # Spark's NaN > edge is false → bucket 1, DuckDB's NaN is greatest
    # in its total order → bucket 10 — and an Inf in the reference
    # period poisons the decile edges; a drift statistic over
    # non-finite input is meaningless)
    vd = F.col(value_col).cast("double")
    tagged = df.where(
        F.col(value_col).isNotNull()
        & ~F.isnan(vd)
        & (F.abs(vd) < F.expr("CAST('Infinity' AS DOUBLE)"))
    ).select(
        *group_cols,
        F.col(value_col).alias("__v"),
        period_col.alias("__ref"),
    )
    pts = F.array(
        *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
    )
    edges = (
        tagged.where(F.col("__ref"))
        .groupBy(*group_cols)
        .agg(F.percentile("__v", pts).alias("__edges"))
    )
    bucketed = tagged.join(F.broadcast(edges), group_cols).select(
        *group_cols,
        "__ref",
        (
            F.lit(1)
            + F.size(F.filter("__edges", lambda x: F.col("__v") > x))
        ).alias("__b"),
    )
    counts = bucketed.groupBy(*group_cols, "__b").agg(
        F.sum(F.when(F.col("__ref"), 1).otherwise(0)).alias("__cr"),
        F.sum(F.when(~F.col("__ref"), 1).otherwise(0)).alias("__cc"),
    )
    # densify to all buckets so absent buckets still contribute
    all_buckets = edges.select(
        *group_cols,
        F.explode(
            F.sequence(F.lit(1), F.lit(n_buckets))
        ).alias("__b"),
    )
    dense = all_buckets.join(counts, [*group_cols, "__b"], "left").select(
        *group_cols,
        "__b",
        F.coalesce("__cr", F.lit(0)).alias("__cr"),
        F.coalesce("__cc", F.lit(0)).alias("__cc"),
    )
    w = Window.partitionBy(*group_cols)
    nb = F.lit(float(n_buckets))
    p = (F.col("__cr") + 1) / (F.sum("__cr").over(w) + nb)
    q = (F.col("__cc") + 1) / (F.sum("__cc").over(w) + nb)
    term = (p - q) * F.log(p / q)
    per_bucket = dense.select(
        *group_cols,
        F.col("__cr").alias("cr"),
        F.col("__cc").alias("cc"),
        term.alias("__t"),
    )
    return per_bucket.groupBy(*group_cols).agg(
        F.sum("cr").alias("n_ref"),
        F.sum("cc").alias("n_cur"),
        round4(dsum(F.col("__t"))).alias("psi"),
    ).withColumn("drifted", F.col("psi") >= 0.2)


def benford_profile(
    df: DataFrame,
    value_col: str,
    min_value: float = 1.0,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic data-quality / fraud screen for multiplicative magnitudes
    (prices, revenues): natural data follows P(d) = log10(1 + 1/d),
    fabricated or truncated data doesn't. Emits, per digit 1-9, the
    observed count, observed share, Benford-expected share, and the
    chi-square contribution n·(share − expected)²/expected.

    Digit extraction is engine-deterministic: e = floor(log10(x)) is
    CLAMPED one step either way against exact powers of 10 (libm log10
    may differ by an ulp between engines near a boundary; the clamp
    re-derives e from the order comparison, which is exact because
    10^e is an exact double for 0 ≤ e ≤ 22), then digit =
    floor(x / 10^e) on exactly-rounded IEEE division. Values below
    ``min_value`` (≥ 1 keeps e non-negative) are excluded, and so are
    NaN and +Inf: neither has a first digit, and both sort ABOVE any
    finite threshold in Spark's comparison semantics (NaN > +Inf >
    every finite double), so without the explicit finiteness filter a
    single +Inf row overflows the digit cast under ANSI (r12 NaN/Inf
    fuzz finding).

    Plan: one projection + a 9-group partial aggregate; the share
    normalization is a window over the 9-row aggregate. Scales as a
    single fact scan.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    if min_value < 1.0:
        raise ValueError(
            f"min_value must be >= 1 (got {min_value}): values below 1 "
            "need negative powers of 10, which are NOT exact doubles — "
            "the cross-engine digit clamp only holds for e >= 0. Scale "
            "the column up (e.g. x*100 for cents) instead."
        )
    x = F.col(value_col).cast("double")
    e0 = F.floor(F.log10(x)).cast("int")
    p0 = F.pow(F.lit(10.0), e0.cast("double"))
    # clamp against ulp-level log10 disagreement: the comparisons below
    # are exact, so every engine lands on the same (e, p)
    e = (
        F.when(x < p0, e0 - F.lit(1))
        .when(x >= p0 * F.lit(10.0), e0 + F.lit(1))
        .otherwise(e0)
    )
    p = F.pow(F.lit(10.0), e.cast("double"))
    digit = F.floor(x / p).cast("int")
    counts = (
        df.where(
            F.col(value_col).isNotNull()
            & ~F.isnan(x)
            & (x < F.lit(float("inf")))
            & (x >= F.lit(min_value))
        )
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy()  # 9 aggregated rows — total-order window is fine
    total = F.sum("n").over(w).cast("double")
    share = F.col("n").cast("double") / total
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return counts.select(
        "digit",
        "n",
        round4(share).alias("share"),
        round4(expected).alias("benford"),
        round4(
            total * (share - expected) * (share - expected) / expected
        ).alias("chi2_term"),
    )


def theil_sen_slope(
    weekly: DataFrame,
    value_col: str = "transactions",
    key_col: str = "local_authority",
    time_col: str = "week",
) -> DataFrame:
    """Per-key Theil-Sen robust trend: the MEDIAN of all pairwise slopes
    (y_j − y_i)/(x_j − x_i), i<j on the time axis — the breakdown-robust
    complement to :func:`grouped_slope`'s OLS (one wild week moves OLS
    arbitrarily; Theil-Sen tolerates ~29% outliers).

    Pairwise slopes are quadratic in SERIES length, so this is a
    mart-grain operator by contract (weeks per key, like the rolling
    family): the per-key self-join emits C(w,2) rows per key — at 10
    years of weeks that is ~135k pairs per key, still trivially
    partition-local. Never point it at fact-grain data; aggregate
    first. Slopes are exact integer differences divided once in double
    (identical IEEE op in the oracle); the median is the engine-shared
    linear-interpolation percentile.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    base = weekly.select(
        F.col(key_col).alias("key"),
        F.datediff(
            F.to_date(time_col), F.lit("1970-01-01").cast("date")
        ).alias("x"),
        F.col(value_col).cast("bigint").alias("y"),
    )
    a = base.alias("a")
    b = base.alias("b")
    slopes = a.join(
        b, (F.col("a.key") == F.col("b.key")) & (F.col("a.x") < F.col("b.x"))
    ).select(
        F.col("a.key").alias("key"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )
    return (
        slopes.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            round4(F.percentile("slope", 0.5)).alias("theil_sen_slope"),
        )
        .withColumnRenamed("key", key_col)
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two groups: D = sup_x |F_a(x) − F_b(x)|, with the
    asymptotic p-value (Kolmogorov distribution, 3-term series) and a
    reject flag at α = 0.05 — the distribution-shift complement to
    ``psi_drift`` (PSI needs binning; KS is binless and exact).

    One output row: n_a, n_b, d_stat, p_approx, shifted.

    Plan: the fact scan aggregates to VALUE grain first (one map-side
    combinable groupBy); the cumulative CDFs then run an unpartitioned
    window over the |distinct values| frame — distribution-grain, the
    same bounded-frame discipline as the other total-order windows
    here, and documented as such: for fact-grain-unique value columns
    at 100 TB, pre-quantize the value (or compare KLL sketches) before
    calling. The sup is attained at observed points, so evaluating at
    each distinct value is exact. All arithmetic mirrors the oracle
    operation for operation.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    base = df.where(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([group_a, group_b])
    )
    per_val = base.groupBy(F.col(value_col).alias("v")).agg(
        F.sum((F.col(group_col) == group_a).cast("long")).alias("ca"),
        F.sum((F.col(group_col) == group_b).cast("long")).alias("cb"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # distribution-grain unpartitioned windows (|distinct values| rows);
    # an absent group (n = 0) leaves the CDF — and therefore D — NULL
    # instead of crashing the ANSI division
    cdf = per_val.select(
        F.when(
            F.sum("ca").over(wt) > 0,
            F.sum("ca").over(wc).cast("double")
            / F.sum("ca").over(wt).cast("double"),
        ).alias("fa"),
        F.when(
            F.sum("cb").over(wt) > 0,
            F.sum("cb").over(wc).cast("double")
            / F.sum("cb").over(wt).cast("double"),
        ).alias("fb"),
        F.sum("ca").over(wt).alias("na"),
        F.sum("cb").over(wt).alias("nb"),
    )
    agg = cdf.groupBy("na", "nb").agg(
        F.max(F.abs(F.col("fa") - F.col("fb"))).alias("d")
    )
    n_eff = (
        F.col("na").cast("double")
        * F.col("nb").cast("double")
        / (F.col("na").cast("double") + F.col("nb").cast("double"))
    )
    lam = (
        F.sqrt(n_eff) + F.lit(0.12) + F.lit(0.11) / F.sqrt(n_eff)
    ) * F.col("d")
    p = (
        F.lit(2.0)
        * (
            F.exp(F.lit(-2.0) * lam * lam)
            - F.exp(F.lit(-8.0) * lam * lam)
            + F.exp(F.lit(-18.0) * lam * lam)
        )
    )
    # with an absent group (n = 0) the test is undefined: D is already
    # NULL from the CDF guard, and lam's 0.11/sqrt(0) term must not
    # run under ANSI — the whole statistic goes NULL together
    both = (F.col("na") > 0) & (F.col("nb") > 0)
    p_clamped = F.when(
        both, F.greatest(F.lit(0.0), F.least(F.lit(1.0), p))
    )
    return agg.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        round4(F.col("d")).alias("d_stat"),
        round4(p_clamped).alias("p_approx"),
        (p_clamped < F.lit(0.05)).alias("shifted"),
    )


def ab_proportions_ztest(
    events: DataFrame,
    key_col: str = "user_id",
    convert_expr: F.Column | None = None,
    variant_expr: F.Column | None = None,
) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: per variant the
    user count and conversion rate, then the pooled-variance z
    statistic and a |z| > 1.96 significance flag — the experimentation
    primitive next to :func:`ks_two_sample`'s distribution drift.

    ``variant_expr`` assigns each user a variant (default: a
    deterministic ``user_id % 2`` hash split — swap in the real
    assignment column); ``convert_expr`` marks converting EVENTS
    (default: ``event_type = 'purchase'``); a user converts when any
    of their events does.

    Plan: one user-keyed aggregate (max of the event flag) then a
    2-row variant aggregate — everything downstream of the fact scan
    is map-side combinable, and the z arithmetic is a single-row
    projection mirrored operation-for-operation by the oracle.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    conv = (
        convert_expr
        if convert_expr is not None
        else (F.col("event_type") == "purchase")
    )
    variant = (
        variant_expr
        if variant_expr is not None
        else (F.col(key_col) % 2 == 0)
    )
    per_user = (
        events.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.max(conv.cast("int")).alias("__conv"),
            # min, not first: first() is nondeterministic across
            # partitionings when variant_expr isn't constant per key
            # (an inconsistent event-level assignment column would
            # silently yield run-to-run different z stats); min() is
            # deterministic under any ordering and identical to
            # first() whenever the assignment IS per-key constant
            F.min(variant.cast("int")).alias("__va"),
        )
    )
    agg = per_user.agg(
        F.sum("__va").alias("n_a"),
        F.sum(F.lit(1) - F.col("__va")).alias("n_b"),
        F.sum(F.col("__va") * F.col("__conv")).alias("c_a"),
        F.sum((F.lit(1) - F.col("__va")) * F.col("__conv")).alias("c_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("c_a").cast("double"), F.col("c_b").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    # a degenerate experiment (pooled rate exactly 0 or 1 — nobody or
    # everybody converts) has zero pooled variance: the z statistic is
    # undefined, not infinite — emit NULLs rather than divide by zero
    defined = (pool > F.lit(0.0)) & (pool < F.lit(1.0))
    z = F.when(
        defined,
        (pa - pb)
        / F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (F.lit(1.0) / na + F.lit(1.0) / nb)
        ),
    )
    return agg.select(
        "n_a",
        "n_b",
        round4(pa).alias("rate_a"),
        round4(pb).alias("rate_b"),
        round4(pa - pb).alias("uplift"),
        round4(z).alias("z_stat"),
        F.when(defined, F.abs(z) > F.lit(1.96)).alias("significant"),
    )


def mannwhitney_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two groups' value
    distributions — the rank-based (outlier-robust) complement to
    :func:`ks_two_sample`: KS asks "did the shape shift anywhere",
    MWU asks "is one group stochastically larger". Normal
    approximation with the exact tie correction; one output row:
    n_a, n_b, u_stat, z_stat, significant (|z| > 1.96).

    Plan: identical shape to the KS plan — the fact scan aggregates to
    VALUE grain (map-side combinable), so ranks are computed per
    distinct value with the standard midrank-for-ties formula
    (rank = count-below + (ties + 1) / 2) from cumulative counts; the
    windows run over the distribution-grain frame (|distinct values|
    rows), with the same 100 TB caveat as KS: pre-quantize a
    fact-grain-unique value column (or feed KLL sketch quantiles)
    before calling. Σ(t³−t) tie correction folds into the same pass.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    base = df.where(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([group_a, group_b])
    )
    per_val = base.groupBy(F.col(value_col).alias("v")).agg(
        F.sum((F.col(group_col) == group_a).cast("long")).alias("ca"),
        F.sum((F.col(group_col) == group_b).cast("long")).alias("cb"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    # distribution-grain unpartitioned window, same discipline as KS
    ranked = per_val.select(
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("t"),
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(wc), F.lit(0)).alias(
            "below"
        ),
    )
    agg = ranked.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca").cast("double")
            * (
                F.col("below").cast("double")
                + (F.col("t").cast("double") + F.lit(1.0)) / F.lit(2.0)
            )
        ).alias("r_a"),
        F.sum(
            F.col("t").cast("double") * F.col("t").cast("double")
            * F.col("t").cast("double")
            - F.col("t").cast("double")
        ).alias("tie_sum"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    u = F.col("r_a") - na * (na + F.lit(1.0)) / F.lit(2.0)
    mu = na * nb / F.lit(2.0)
    var = (
        na
        * nb
        / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("tie_sum") / (n * (n - F.lit(1.0))))
    )
    # degenerate frames (a group absent, n < 2, or every value tied)
    # have zero rank variance: z is undefined, not infinite
    defined = (na > 0) & (nb > 0) & (n > F.lit(1.0)) & (var > F.lit(0.0))
    z = F.when(defined, (u - mu) / F.sqrt(var))
    return agg.select(
        "n_a",
        "n_b",
        round4(u).alias("u_stat"),
        round4(z).alias("z_stat"),
        F.when(defined, F.abs(z) > F.lit(1.96)).alias("significant"),
    )


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_expr: F.Column,
    col_name: str = "bucket",
) -> DataFrame:
    """Pearson chi-square test of independence between a categorical
    column and a (derived) bucket column, with Cramér's V effect size —
    "does event mix differ by segment", the categorical complement to
    the numeric drift tests. One row: n, n_rows, n_cols, dof, chi2,
    cramers_v.

    Plan: one map-side-combinable groupBy to contingency-cell grain
    (|rows| × |cols| cells — category-grain, tiny by construction),
    then marginals via two category-grain aggregates joined back and a
    single-row reduce. Nothing after the fact scan exceeds the
    contingency-table size, so the plan is scale-free in the fact
    volume.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import round4

    base = df.where(F.col(row_col).isNotNull() & col_expr.isNotNull())
    cells = base.groupBy(
        F.col(row_col).alias("r"), col_expr.alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    # marginals as WINDOWS over the contingency frame, not groupBy+join:
    # separate marginal aggregates would re-derive `cells` from the fact
    # scan once per consumer (Catalyst has no common-subplan
    # materialization), turning one 100 TB scan into four. The windows
    # run on the |rows|×|cols| cell frame — tiny by construction.
    withm = cells.select(
        "r",
        "c",
        "o",
        F.sum("o").over(Window.partitionBy("r")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("c")).alias("col_tot"),
        F.sum("o").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__N"),
    )
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("__N").cast("double")
    )
    term = F.pow(F.col("o").cast("double") - e, F.lit(2.0)) / e
    # order-independent float sum: per-cell terms are identical IEEE
    # doubles on both engines; scale to 1e-6 units and sum exactly as
    # bigint (the dsum discipline, finer scale for a test statistic)
    units = F.round(term * F.lit(1000000.0)).cast("bigint")
    agg = withm.agg(
        F.max("__N").alias("n"),
        F.count_distinct("r").alias("n_rows"),
        F.count_distinct("c").alias("n_cols"),
        (F.sum(units).cast("double") / F.lit(1000000.0)).alias("__chi2"),
    )
    mindim = F.least(F.col("n_rows"), F.col("n_cols")) - F.lit(1)
    v = F.when(
        (F.col("n") > 0) & (mindim > 0),
        F.sqrt(
            F.col("__chi2")
            / (F.col("n").cast("double") * mindim.cast("double"))
        ),
    )
    return agg.select(
        "n",
        "n_rows",
        "n_cols",
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).alias("dof"),
        round4(F.col("__chi2")).alias("chi2"),
        round4(v).alias("cramers_v"),
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorized mean: values CLIP to the group's exact
    [p_lo, p_hi] percentile envelope (linear interpolation — the same
    exact-percentile contract as the weekly mart's A3/A4), then average
    — the bounded-influence alternative to trimming when row COUNT must
    be preserved (every row still votes, outliers just vote at the
    fence). Output: group, n, p_lo, p_hi, raw_mean, winsorized_mean.

    Plan: ONE grouped aggregate computes both percentile fences AND the
    raw moments (single shuffle); the fences broadcast back onto the
    rows (group-grain frame, k rows) for a row-local clip, and the
    winsorized mean reduces through the dsum discipline so partitioning
    can't move it. Two passes over the fact input, one shuffle each —
    at 100 TB swap the exact fences for KLL estimates and the plan
    shape is unchanged.

    NaN/±Inf rows are excluded entirely (NULLs keep their documented
    skip-but-count behavior): a non-finite value poisons the exact
    percentile fences AND overflows dsum's ANSI bigint quantization
    (r12 fuzz finding) — and a clip-to-fence of an Inf row would
    silently launder the sentinel into the mean.
    """
    from uk_housing_dashboard_etl_spark.functions.rounding import (
        dmean,
        round4,
    )

    vc = F.col(value_col)
    df = df.where(
        vc.isNull() | (~F.isnan(vc) & (F.abs(vc) < F.lit(float("inf"))))
    )
    fences = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        round4(F.percentile(value_col, lo)).alias("p_lo"),
        round4(F.percentile(value_col, hi)).alias("p_hi"),
        round4(dmean(F.col(value_col))).alias("raw_mean"),
    )
    clipped = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("__v")
    ).join(F.broadcast(fences), "grp")
    # NULL values stay NULL so dmean skips them, matching the raw
    # mean's null semantics: Spark's least/greatest IGNORE nulls, so a
    # bare least(NULL, p_hi) would clip a null row to the upper fence
    # and inflate the winsorized mean (r9 verdict item 2).
    clip = F.when(
        F.col("__v").isNotNull(),
        F.greatest(F.least(F.col("__v"), F.col("p_hi")), F.col("p_lo")),
    )
    wmean = clipped.groupBy(
        "grp", "n", "p_lo", "p_hi", "raw_mean"
    ).agg(round4(dmean(clip)).alias("winsorized_mean"))
    return wmean.select(
        F.col("grp").alias(group_col),
        "n",
        "p_lo",
        "p_hi",
        "raw_mean",
        "winsorized_mean",
    )


def expectation_suite(
    df: DataFrame,
    checks: list[tuple[str, "F.Column"]],
) -> DataFrame:
    """Data-quality constraint suite (the Deequ/Great-Expectations
    shape): evaluate NAMED row-level expectations in ONE scan and
    report, per check, the row count, violation count and pass flag.
    ``checks`` is [(name, boolean Column)]; a NULL predicate result
    counts as a violation (unknown ≠ verified).

    Plan: every check compiles to one conditional-sum aggregate in a
    SINGLE global aggregation — one pass over the fact table, fully
    map-side combinable, regardless of how many expectations run. The
    wide 1-row result unpivots row-locally to check-grain. This is the
    shape a 100 TB nightly data-contract job needs: checks scale on the
    expression budget, never on extra scans.
    """
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")]
    for name, expr in checks:
        aggs.append(
            F.sum(
                F.when(F.coalesce(expr, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{name}', `__v_{name}`" for name, _ in checks
    )
    return wide.select(
        F.expr(
            f"stack({len(checks)}, {stack}) AS (check_name, n_violations)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "check_name",
        "n_rows",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
