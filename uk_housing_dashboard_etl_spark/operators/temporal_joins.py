"""Temporal join operators Spark lacks natively: as-of join and
point-in-interval range join.

- ``asof_join`` : for each left row, the single latest right row with
  ``right.ts <= left.ts`` per key (market-data / state-lookup join).
  Spark has no ASOF JOIN; the composition here is the UNION + ordered
  window + ``last(ignorenulls)`` carry-forward formulation:
  one shuffle on the key, one sort, no join node at all — O(n log n)
  per key versus the quadratic naive inequality join. Ties
  (right.ts == left.ts) match, mirroring standard ASOF semantics.

- ``range_join_binned`` : points joined to [start, end) intervals. The
  naive form is an inequality (theta) join — BroadcastNestedLoop at
  best. The scale path bins time into fixed buckets, explodes each
  interval to the buckets it covers, and equi-joins on the bucket
  before the exact range filter: candidate pairs shrink from |P|·|I|
  to only same-bucket pairs, and Catalyst shuffles on the bucket key.

Both verified against DuckDB's native ASOF JOIN / inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_value_cols: list[str] | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """Left as-of join: append the latest right values at-or-before each
    left row's timestamp (null when no prior right row exists).

    ``tie_col`` orders simultaneous right rows (latest wins
    deterministically).
    """
    rvals = right_value_cols or [
        c for c in right.columns if c not in (key, ts)
    ]
    lhs = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in rvals],
        F.lit(None).cast("long").alias("__rtie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    rhs = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__rv_{c}") for c in rvals],
        (F.col(tie_col) if tie_col else F.lit(0)).cast("long").alias("__rtie"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
    )
    # right rows sort BEFORE left rows at equal ts (__is_left asc) so an
    # exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("__is_left"), F.col("__rtie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in rvals
        ],
    )
    out = carried.where(F.col("__is_left") == 1).select(
        F.col("__lrow.*"),
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in rvals],
    )
    return out


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    by: list[str] | None = None,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join via time binning (+ optional equality keys).

    Each interval explodes to the bins it overlaps; points equi-join on
    (bin, *by); the exact ``start <= ts < end`` predicate then filters.
    A point lives in exactly one bin, so no duplicate pairs arise.
    ``bin_seconds`` trades explode fan-out (long intervals → many bins)
    against candidate precision (wide bins → more false candidates);
    size it near the median interval length. Candidates shrink from
    |P|·|I| (the naive theta join's BroadcastNestedLoop) to same-bucket
    pairs shuffled on an equi key.
    """
    usec = bin_seconds * 1_000_000
    p_bin = (F.unix_micros(F.col(ts)) / F.lit(usec)).cast("long")
    i_start_bin = (F.unix_micros(F.col(start)) / F.lit(usec)).cast("long")
    i_end_bin = (F.unix_micros(F.col(end)) / F.lit(usec)).cast("long")
    binned_points = points.withColumn("__bin", p_bin)
    binned_intervals = intervals.withColumn(
        "__bin", F.explode(F.sequence(i_start_bin, i_end_bin))
    )
    join_keys = ["__bin"] + list(by or [])
    joined = binned_points.join(binned_intervals, join_keys).where(
        (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("__bin")
