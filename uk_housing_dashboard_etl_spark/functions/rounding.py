"""Engine-portable deterministic rounding.

``F.round``/DuckDB ``round`` disagree on doubles whose shortest decimal
representation lands exactly on a half at the target scale: Spark rounds
the shortest string repr via BigDecimal (HALF_UP on decimal digits),
DuckDB rounds numerically. The fix is to round with plain IEEE
arithmetic — ``floor(x·10^4 + 0.5) / 10^4`` — which both engines compute
bit-identically (same input double → same product, sum, floor, divide).

Semantics: half-up toward +inf (so −1.23455 → −1.2345). Direction is
irrelevant for the oracle contract; identical-on-both-sides is the point.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10_000.0  # 4 decimal places


def round4(col: Column) -> Column:
    """Deterministic 4dp rounding (Spark side)."""
    return F.floor(col * F.lit(SCALE) + F.lit(0.5)) / F.lit(SCALE)


def round4_sql(expr: str) -> str:
    """Deterministic 4dp rounding (DuckDB oracle side) — the identical
    IEEE operation sequence as :func:`round4`."""
    return f"floor(({expr}) * 10000.0 + 0.5) / 10000.0"


def dsum(expr: Column) -> Column:
    """Order-independent float sum: per-row scale to integer 1e-4 units
    (both engines round the identical IEEE double), exact bigint sum,
    descale. Null terms are skipped like a normal SQL sum."""
    units = F.round(expr * F.lit(SCALE)).cast("bigint")
    return F.sum(units).cast("double") / F.lit(SCALE)


def dmean(expr: Column) -> Column:
    """Deterministic mean: :func:`dsum` divided by the non-null count.

    Unlike ``avg``, immune to summation-order fp noise — required where
    a group's true mean can land exactly on a rounding boundary (e.g.
    2-decimal prices averaged over denominators like 800). Differs from
    the true mean by at most the 1e-4 input quantization.
    """
    return dsum(expr) / F.count(expr)


def dsum_sql(expr: str) -> str:
    return (
        f"CAST(sum(CAST(round(({expr}) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0"
    )


def dmean_sql(expr: str) -> str:
    return f"({dsum_sql(expr)}) / count({expr})"
