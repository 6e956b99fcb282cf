"""Scalar cleaning layer — P1-P9/P11 from SURVEY.md §2.2.

All column expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen friendly); schema discovery is a driver-side function
over ``df.columns``. Zero Python UDFs.

Reference parity: column discovery by substring (ref ``etl/etl_main.py:
149-153``), lenient coercions with null-on-failure (ref ``:158,168``),
postcode/category normalization (ref ``:171-174,222``), prefix fallback
(ref ``:182,190``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def discover_columns(columns: list[str]) -> dict[str, str | None]:
    """P1: first column whose lowercase name contains each marker substring.

    Returns a mapping role → source column (or None). Raises (P2) if the
    required date/price roles are missing — same hard error as the
    reference (ref ``etl/etl_main.py:155-156``).
    """

    def first(*needles: str) -> str | None:
        return next(
            (c for c in columns if any(n in c.lower() for n in needles)), None
        )

    roles = {
        "date": first("date"),
        "price": first("price"),
        "postcode": first("postcode"),
        "transaction_id": first("unique", "id"),
        "prop_type": first("property", "type"),
    }
    if roles["date"] is None or roles["price"] is None:
        raise RuntimeError(
            "Required columns (date or price) not found in input data"
        )
    return roles


def coerce_timestamp(col: Column) -> Column:
    """P3: timestamp parse, null on failure (``to_datetime(errors='coerce')``)."""
    return F.try_to_timestamp(col.cast("string"))


def coerce_double(col: Column) -> Column:
    """P6: numeric coercion, null on failure (``to_numeric(errors='coerce')``)."""
    return col.cast("string").try_cast("double")


def normalize_code(col: Column) -> Column:
    """P7: cast→string, strip ALL whitespace, uppercase (postcode normalize)."""
    return F.upper(F.regexp_replace(col.cast("string"), r"\s+", ""))


def normalize_category(col: Column) -> Column:
    """P9: cast→string, trim, lowercase (property-type normalize)."""
    return F.lower(F.trim(col.cast("string")))


def prefix_key(col: Column, n: int = 4) -> Column:
    """P8: leading-``n``-chars fallback key (postcode prefix → pseudo-LA)."""
    return F.substring(col.cast("string"), 1, n)
