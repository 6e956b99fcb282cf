"""Hypothesis property tests for the round-5 operators: random frames
→ each Spark operator must match an independent naive-Python reference
(O(n²) skyline scan, literal sweep-line, pandas groupby-last replay,
rank-sum from first principles)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 20),  # price (small grid -> many ties)
            st.integers(0, 20),  # size
        ),
        min_size=1,
        max_size=60,
    )
)
def test_pareto_skyline_matches_naive_scan(spark, rows):
    from uk_housing_dashboard_etl_spark.operators.relational import (
        pareto_skyline,
    )

    data = [(i, float(p), s) for i, (p, s) in enumerate(rows)]
    df = spark.createDataFrame(data, ["id", "price", "size"])
    got = sorted(r["id"] for r in pareto_skyline(df, "price", "size").collect())
    want = sorted(
        i
        for i, p, sz in data
        if not any(
            (q <= p and t >= sz and (q < p or t > sz))
            for _, q, t in data
        )
    )
    assert got == want


@SLOW
@given(
    iv=st.lists(
        st.tuples(
            st.integers(0, 5000),  # start offset minutes
            st.integers(1, 3000),  # duration minutes
        ),
        min_size=1,
        max_size=50,
    )
)
def test_peak_concurrency_matches_naive_sweep(spark, iv):
    from uk_housing_dashboard_etl_spark.operators.timeseries import (
        peak_concurrency,
    )

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (t0 + dt.timedelta(minutes=s), t0 + dt.timedelta(minutes=s + d))
        for s, d in iv
    ]
    df = spark.createDataFrame(data, ["start_ts", "end_ts"])
    got = {
        str(r["day"]): (r["n_started"], r["peak_active"])
        for r in peak_concurrency(df).collect()
    }
    # naive global sweep: at each distinct instant t, active count =
    # |starts <= t| - |ends <= t| (end-exclusive), tracked per day
    instants = sorted({t for s, e in data for t in (s, e)})
    want: dict[str, list[int]] = {}
    for t in instants:
        active = sum(1 for s, e in data if s <= t) - sum(
            1 for s, e in data if e <= t
        )
        day = str(t.date())
        want.setdefault(day, [0, 0])
        want[day][1] = max(want[day][1], active)
    for s, _ in data:
        want[str(s.date())][0] += 1
    # days with only end-points still appear in `want`; the operator
    # reports them too (they host sweep points), with n_started 0
    assert got == {d: tuple(v) for d, v in want.items()}


@SLOW
@given(
    changes=st.lists(
        st.tuples(
            st.integers(0, 6),  # key
            st.integers(0, 100),  # seq
            st.booleans(),  # is delete
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),  # seq unique within key
    )
)
def test_apply_cdc_matches_pandas_last(spark, changes):
    from uk_housing_dashboard_etl_spark.operators.incremental import (
        apply_cdc,
    )

    data = [(k, s, "D" if d else "U", f"v{k}:{s}") for k, s, d in changes]
    df = spark.createDataFrame(data, ["k", "seq", "op", "val"])
    got = {
        r["k"]: r["val"]
        for r in apply_cdc(df, ["k"], ["seq"], "op").collect()
    }
    want = {}
    for k in {c[0] for c in changes}:
        last = max((c for c in data if c[0] == k), key=lambda c: c[1])
        if last[2] != "D":
            want[k] = last[3]
    assert got == want


@SLOW
@given(
    vals=st.lists(
        st.tuples(st.booleans(), st.integers(0, 8)),
        min_size=4,
        max_size=80,
    )
)
def test_mannwhitney_matches_first_principles(spark, vals):
    from uk_housing_dashboard_etl_spark.operators.stats import (
        mannwhitney_two_sample,
    )

    data = [("a" if g else "b", float(v)) for g, v in vals]
    if not any(g == "a" for g, _ in data) or not any(
        g == "b" for g, _ in data
    ):
        return
    df = spark.createDataFrame(data, ["g", "v"])
    r = mannwhitney_two_sample(df, "g", "v", "a", "b").collect()[0]
    # reference: midranks via sorting
    all_vals = sorted(v for _, v in data)
    rank = {}
    i = 0
    while i < len(all_vals):
        j = i
        while j < len(all_vals) and all_vals[j] == all_vals[i]:
            j += 1
        rank[all_vals[i]] = (i + 1 + j) / 2.0  # midrank of positions i+1..j
        i = j
    ra = sum(rank[v] for g, v in data if g == "a")
    na = sum(1 for g, _ in data if g == "a")
    nb = len(data) - na
    u = ra - na * (na + 1) / 2.0
    assert r["u_stat"] == pytest.approx(u, abs=1e-4)
    # tie-corrected variance
    from collections import Counter

    t = Counter(v for _, v in data)
    tie = sum(c**3 - c for c in t.values())
    n = na + nb
    var = na * nb / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    if var > 0:
        z = (u - na * nb / 2.0) / math.sqrt(var)
        assert r["z_stat"] == pytest.approx(z, abs=1e-3)
    else:
        assert r["z_stat"] is None
