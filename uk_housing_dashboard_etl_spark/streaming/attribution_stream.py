"""Watermarked stream-stream join: view → purchase attribution.

The one streaming shape the rest of the package doesn't cover — two
unbounded sides joined on key + time bound. Spark buffers both sides in
state; the interval condition plus BOTH watermarks let it evict: a view
older than (watermark − attribution window) can never match a future
purchase, so state is bounded by traffic inside the watermark horizon,
not by history. Without the time bound the state grows forever — the
bound is what makes a stream-stream join runnable at 100 TB/day.

Append-mode semantics: a joined row emits only once both inputs exist;
an unmatched view simply never emits (inner join — use the
left-outer variant with the same bounds for "views WITHOUT purchase"
once Spark's outer stream-stream join fits the need).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_stream(
    events: DataFrame,
    window: str = "1 hour",
    view_type: str = "view",
    buy_type: str = "purchase",
    view_watermark: str = "1 hour",
    buy_watermark: str = "2 hours",
) -> DataFrame:
    """Each purchase joined to every same-user view in the preceding
    ``window`` (inclusive of the purchase instant). ``events`` is a
    streaming DataFrame with (ts, user_id, event_type, value).

    The buy-side watermark should cover view_watermark + window so a
    late-but-admissible purchase can still find its buffered view.
    Returns (user_id, view_ts, buy_ts, value) — ``value`` is the
    purchase amount being attributed.
    """
    views = (
        events.where(F.col("event_type") == view_type)
        .select("user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", view_watermark)
    )
    buys = (
        events.where(F.col("event_type") == buy_type)
        .select(
            F.col("user_id").alias("buy_user"),
            F.col("ts").alias("buy_ts"),
            "value",
        )
        .withWatermark("buy_ts", buy_watermark)
    )
    return views.join(
        buys,
        F.expr(
            f"user_id = buy_user AND buy_ts >= view_ts "
            f"AND buy_ts <= view_ts + interval {window}"
        ),
    ).select("user_id", "view_ts", "buy_ts", "value")
