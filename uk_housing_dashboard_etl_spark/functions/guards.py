"""Finiteness guards for operator boundaries.

Spark's integer-unit quantization (``round(x*1e4).cast('bigint')`` /
``floor(x)``) raises ANSI CAST_OVERFLOW on NaN/±Inf — or, for bare
``floor``, silently saturates — while the DuckDB oracles' bigint casts
raise; both engines' exact percentiles also RANK non-finite values
differently (Spark sorts NaN greatest, DuckDB's quantile_cont skips
it). The repo-wide containment rule (SCALE.md r12/r13): guard at each
OPERATOR's boundary with this helper — never inside the shared
``dsum``/``round4``, whose edit would stale most of the query registry
in one round — and mirror the guard in the oracle with
``CASE WHEN isfinite(expr) THEN expr END`` in the same position.

A NULLed term leaves sums/means exactly like a SQL NULL (mean
denominators must count the GUARDED expression, which ``dmean`` does
when handed the guarded column), while row counts still include the
row on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = "CAST('Infinity' AS DOUBLE)"


def finite_or_null(col: Column) -> Column:
    """``col`` when finite, NULL otherwise (NULL stays NULL)."""
    v = col.cast("double")
    return F.when(~F.isnan(v) & (F.abs(v) < F.expr(_INF)), col)


def is_finite(col: Column) -> Column:
    """Boolean: non-NULL and finite (false for NULL/NaN/±Inf)."""
    v = col.cast("double")
    return (
        col.isNotNull() & ~F.isnan(v) & (F.abs(v) < F.expr(_INF))
    )
