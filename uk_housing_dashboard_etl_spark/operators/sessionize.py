"""Event sessionization: gap-based session ids + per-session rollups.

A training-data staple (conversation/interaction sessionization) the
reference's event-stream domain implies but never ships. Classic
two-window formulation, all JVM-side:

1. ``lag(unix_micros(ts))`` per user → gap to previous event;
2. ``session_start = gap IS NULL OR gap > timeout``;
3. session index = running ``sum(int(session_start))`` per user
   (cumulative window);
4. per-session aggregation.

Gap math runs on integer microseconds (``unix_micros``) — exact and
engine-portable; ``tie_cols`` pins the within-timestamp order so session
assignment is deterministic under ties.

Scale notes: two window passes over the SAME (partitionBy user, orderBy
ts) exchange — one shuffle+sort — then one hash aggregate on
(user, session_idx). A hot user's sessions still split across reducers
at the aggregate because the key includes the session index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.rounding import dmean, round4


def assign_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    timeout_minutes: float = 30.0,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Append ``session_idx`` (1-based per user) to each event row."""
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    gap_us = us - F.lag(us).over(w)
    timeout_us = int(timeout_minutes * 60 * 1_000_000)
    is_start = F.when(gap_us.isNull() | (gap_us > timeout_us), 1).otherwise(0)
    return events.withColumn(
        "session_idx",
        F.sum(is_start).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    timeout_minutes: float = 30.0,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session mart: event count, start, span seconds, value mean.

    Non-finite values leave the mean like NULLs at this operator
    boundary (the dmean quantization saturates on Spark, raises on the
    oracle's bigint cast — r13 sweep); the row still counts into
    ``n_events`` on both engines, and the guarded expression is what
    the mean's denominator counts. NULL timestamps are excluded before
    sessionization (r13 sweep): "unknown time" belongs to no session,
    and the engines otherwise place the row at OPPOSITE ends of the
    gap walk (Spark NULLS FIRST → its own session; DuckDB NULLS LAST →
    absorbed into the last session)."""
    with_sessions = assign_sessions(
        events.where(F.col(ts_col).isNotNull()),
        user_col,
        ts_col,
        timeout_minutes,
        tie_cols,
    )
    us = F.unix_micros(F.col(ts_col))
    span_seconds = (F.max(us) - F.min(us)) / F.lit(1_000_000.0)
    v = F.col(value_col).cast("double")
    fv = F.when(
        ~F.isnan(v) & (F.abs(v) < F.expr("CAST('Infinity' AS DOUBLE)")),
        F.col(value_col),
    )
    return with_sessions.groupBy(F.col(user_col), F.col("session_idx")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        round4(span_seconds).alias("span_seconds"),
        round4(dmean(fv)).alias("value_mean"),
    )
