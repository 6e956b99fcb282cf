"""Distributed deterministic top-k.

A global ``row_number().over(Window.orderBy(...))`` moves the ENTIRE
frame through one partition before the filter can drop rows — Spark even
warns ("No Partition Defined for Window operation"). The scalable global
top-k is ``orderBy(...).limit(k)``, which Catalyst compiles to
``TakeOrderedAndProject``: each task keeps a k-row heap, only k rows per
partition reach the driver-side merge. The rank column is then attached
by a window over the k surviving rows only (k is a small constant), so
the single-partition stage touches k rows, not the corpus.

Callers must pass a TOTAL ordering (tie-break on a unique key) or the
cut itself is nondeterministic under any engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deterministic_topk(
    df: DataFrame,
    order: Sequence[Column],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Top-k rows of ``df`` under ``order`` with a 1-based ``rank_name``
    column. ``order`` must be a total order (include a unique tie-break
    column). Physical plan: TakeOrderedAndProject(k) then a window over
    exactly k rows."""
    order = list(order)
    topk = df.orderBy(*order).limit(k)
    return topk.withColumn(rank_name, F.row_number().over(Window.orderBy(*order)))
