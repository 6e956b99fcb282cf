"""Data-quality constraint checks — the reference's runtime self-checks
(SURVEY.md §5: column presence, coverage %, QA record) generalized into
a declarative constraint report.

One pass over the table computes every constraint as a conditional
aggregate (all map-side combinable — a single reduced row regardless of
input size), then the report unpivots to one row per constraint with
pass/fail. This is the "expectations" pattern (cf. Deequ/Great
Expectations) expressed with nothing but built-in aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    # fraction of rows violating the predicate (0.0 = clean)
    violation: Column
    max_violation_rate: float = 0.0


def not_null(col: str, max_rate: float = 0.0) -> Check:
    return Check(
        f"not_null_{col}",
        F.avg(F.when(F.col(col).isNull(), 1.0).otherwise(0.0)),
        max_rate,
    )


def unique_key(col: str) -> Check:
    """count vs count-distinct as a ratio-based uniqueness check."""
    return Check(
        f"unique_{col}",
        (F.count(F.col(col)) - F.countDistinct(F.col(col)))
        / F.count(F.col(col)),
        0.0,
    )


def in_range(col: str, lo: float, hi: float, max_rate: float = 0.0) -> Check:
    return Check(
        f"range_{col}",
        F.avg(
            F.when(
                F.col(col).isNotNull()
                & ((F.col(col) < lo) | (F.col(col) > hi)),
                1.0,
            ).otherwise(0.0)
        ),
        max_rate,
    )


def accepted_values(col: str, values: list[str], max_rate: float = 0.0) -> Check:
    return Check(
        f"accepted_{col}",
        F.avg(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).isin(values), 1.0
            ).otherwise(0.0)
        ),
        max_rate,
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in ONE aggregate pass; return a report frame
    (check_name, violation_rate, threshold, passed) sorted by name."""
    aggs = [c.violation.alias(c.name) for c in checks]
    row = df.agg(*aggs)
    # unpivot with ONE explode so the aggregate subtree runs exactly once
    structs = [
        F.struct(
            F.lit(c.name).alias("check_name"),
            F.round(F.coalesce(F.col(c.name), F.lit(0.0)) * 10000.0)
            .cast("double")
            .alias("violation_bps"),
            F.lit(c.max_violation_rate * 10000.0).alias("threshold_bps"),
            (
                F.coalesce(F.col(c.name), F.lit(0.0))
                <= F.lit(c.max_violation_rate)
            ).alias("passed"),
        )
        for c in checks
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("__r"))
        .select("__r.*")
        .orderBy("check_name")
    )
