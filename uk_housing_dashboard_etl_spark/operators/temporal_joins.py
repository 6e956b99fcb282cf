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
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: append the matched right values per left row
    (null when no match exists) — pandas ``merge_asof`` semantics.

    ``direction='backward'`` (default) matches the LATEST right row
    at-or-before the left timestamp; ``'forward'`` matches the EARLIEST
    right row at-or-after it. ``tolerance_seconds`` nulls the match
    when the matched right row is further than that from the left
    timestamp (pandas ``tolerance``). ``tie_col`` orders simultaneous
    right rows (backward: latest wins; forward: earliest wins —
    deterministic either way).

    Plan (both directions): ONE key-keyed exchange; the union + ordered
    carry window scans each key's merged timeline once — backward uses
    a last-ignorenulls over the preceding frame, forward a
    first-ignorenulls over the following frame, with the left/right
    interleave order at equal timestamps flipped so exact matches stay
    visible. Tolerance is a row-local post-filter on the carried right
    timestamp (exact integer µs, no extra shuffle).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    # "as of unknown time" is not a match (r10 empty/NULL sweep):
    # a NULL-ts RIGHT row sorts first under the asc window order and
    # would carry into NULL-ts left rows (and, forward, a NULL-ts left
    # row would match the earliest real right row) — pandas merge_asof
    # rejects null keys outright. The same holds for a NULL KEY
    # (r13): Spark's window partitioning groups NULL keys into ONE
    # partition, so NULL-key left rows would silently match NULL-key
    # right rows where any SQL equi/asof join (and merge_asof) never
    # matches NULL to NULL. Right rows with NULL ts or NULL key are
    # excluded from candidacy; left rows with NULL ts or NULL key pass
    # through with null match values (masked below).
    right = right.where(F.col(ts).isNotNull() & F.col(key).isNotNull())
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
    if tolerance_seconds is not None:
        # carry the matched right timestamp so tolerance can compare it
        lhs = lhs.withColumn("__rv___match_ts", F.lit(None).cast("long"))
        rhs = rhs.withColumn("__rv___match_ts", F.unix_micros(F.col(ts)))
        rvals_int = [*rvals, "__match_ts"]
    else:
        rvals_int = list(rvals)
    # the carried match is ONE struct per right row — never per-column
    # ignorenulls carries (r13: a NULL right VALUE would otherwise
    # carry an older right row's value while the timestamp came from
    # the newer one, de-synchronizing the matched row's columns; the
    # struct is non-null for every right row even when its fields are
    # null, so the carry always lands on the matched row wholesale)
    match = F.when(
        F.col("__is_left") == 0,
        F.struct(
            *[F.col(f"__rv_{c}").alias(c) for c in rvals_int]
        ),
    )
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts (__is_left asc)
        # so an exactly-simultaneous right row is visible; among
        # simultaneous rights the LATEST tie wins (last over asc ties)
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts), F.col("__is_left"), F.col("__rtie"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last(match, ignorenulls=True).over(w)
    else:
        # left rows sort BEFORE right rows at equal ts (__is_left desc)
        # so an exactly-simultaneous right row is inside the FOLLOWING
        # frame; among simultaneous rights the EARLIEST tie wins
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts), F.col("__is_left").desc(), F.col("__rtie"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first(match, ignorenulls=True).over(w)
    carried = lhs.unionByName(rhs).select(
        "*",
        *[carry[c].alias(f"__asof_{c}") for c in rvals_int],
    )
    # a NULL-ts or NULL-key left row carries no match (see the
    # candidacy note above)
    keep = F.col(ts).isNotNull() & F.col(key).isNotNull()
    if tolerance_seconds is not None:
        keep = keep & (
            F.abs(F.col("__asof___match_ts") - F.unix_micros(F.col(ts)))
            <= F.lit(tolerance_seconds * 1_000_000)
        )
    out = carried.where(F.col("__is_left") == 1).select(
        F.col("__lrow.*"),
        *[
            F.when(keep, F.col(f"__asof_{c}")).alias(f"asof_{c}")
            for c in rvals
        ],
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
