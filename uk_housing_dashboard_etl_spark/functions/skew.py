"""Skew-mitigation utilities: salted two-phase aggregation.

AQE's skew-join splitting handles join-side skew automatically (enabled
in ``session.py``), but a groupBy on a pathologically hot key (one LA
with 100× the rows — London in the reference's domain) still funnels
that key's rows through one reducer. Salting splits the hot key into
``salt_buckets`` sub-keys for a partial aggregate, then merges partials
— two small shuffles instead of one skewed one.

Only algebraic aggregates (reassociatable: sum/count/min/max) can be
salted this way; compose means as sum/count at the call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps column → one of sum/count/min/max. Phase 1 groups by
    (keys + random salt) — the hot key spreads over ``salt_buckets``
    reducers; phase 2 merges partials by the real keys (count merges by
    sum). The salt is ``rand``-derived: correctness never depends on it,
    only load balance.
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_aggs = []
    for col, how in aggs.items():
        if how not in mergers:
            raise ValueError(f"non-algebraic aggregate {how!r} cannot be salted")
        fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[how]
        phase1_aggs.append(fn(col).alias(f"__p_{how}_{col}"))
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    phase2_aggs = [
        mergers[how](f"__p_{how}_{col}").alias(f"{how}_{col}")
        for col, how in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-salted equi-join: identical result to ``fact ⋈ dim``, but a
    pathologically hot fact key spreads over ``salt_buckets`` reducers
    instead of funneling through one.

    Fact rows get a per-ROW salt (``rand``-derived — correctness never
    depends on it); the dim side replicates each row ``salt_buckets``
    times via a row-local explode, and the join runs on
    (key, salt) — so the hot key's rows land on ``salt_buckets``
    distinct reducers, each holding a full copy of that key's dim rows.

    Cost model: dim inflates ``salt_buckets``×, so this is for the
    MEDIUM dim — too big to broadcast (where the skew problem wouldn't
    exist), small enough that B× replication beats one straggler
    reducer holding the hot key's entire fact volume. AQE's skew-join
    split covers most such cases automatically (enabled in session.py);
    this operator is the explicit form for engines/paths where AQE
    can't see the skew (e.g. a first-shuffle straight off a scan with
    no runtime stats yet).
    """
    f = fact.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    d = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return f.join(
        d,
        (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]),
    ).drop("__salt")
