"""Round-13 property blocks (r12 verdict items 1-2): the remaining
members of the non-finite unit-sum class the r12 NaN/±Inf fuzz proved —
Spark's integer-unit quantization (``floor(value*1e4+0.5)`` /
``round(value*1e4).cast(bigint)``) silently saturates ±Inf/NaN where
DuckDB's bigint cast raises, so every pair in the class needs a
symmetric finiteness guard at the operator boundary on BOTH engines.

Covered here, each against its OWN DuckDB oracle via the exact
driver-gate comparison (tools.selfcheck canonicalize/compare), on
hypothesis tables whose generators GUARANTEE NaN/+Inf/-Inf/NULL draws:

- value_trend (grouped_slope's decimal moment sums — the one query the
  r12 fuzz probed RED: CAST_OVERFLOW on a single ±Inf row)
- salted_event_stats (salted two-phase unit sum)
- streaming_joined / streaming_joined_outer / streaming_joined_agg
  (the stream-stream join family's attributed_value unit sums —
  real AvailableNow drains, not batch stand-ins)
- embedding_health / embedding_quantile_norm (non-finite VECTOR
  components: Spark's round4 saturates ±Inf where DuckDB emits inf —
  excluded at the operator boundary, never inside shared round4)
- band_join / latest_by_key / scd2_history / cdc_replay (r12 verdict
  item 7: probed clean in r12 but previously un-pinned — the
  adversarial axes are tied/NULL timestamps and non-finite values
  riding through passthrough columns)

Free by construction: tests are outside the rotation tracer's scope,
so property coverage grows without staling any driver-window query
(the operator guards themselves stale their queries — budgeted).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo/tools")

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

FAST = settings(
    max_examples=3,  # each example drains a real streaming query
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

T0 = dt.datetime(2024, 1, 1)

EVENTS_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)

EMBEDDINGS_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]
)


def _gate(spark, name: str, sf_dir: str, tables: dict[str, pd.DataFrame]):
    """Run contract query `name` AND its DuckDB oracle on the same
    generated parquet, compared exactly like the driver gate."""
    import duckdb

    from selfcheck import canonicalize, compare
    from uk_housing_dashboard_etl_spark import contract

    con = duckdb.connect()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(sf_dir, t + '.parquet')}'"
        )
    got = contract.QUERIES[name](spark, sf_dir).toPandas()
    want = con.sql(contract.ORACLES[name]).df()
    con.close()
    problems = compare(canonicalize(got), canonicalize(want))
    assert not problems, f"{name} diverged on fuzzed input: {problems}"


def _write_sf(tables: dict[str, tuple[pd.DataFrame, pa.Schema]]) -> str:
    d = tempfile.mkdtemp(prefix="fuzz_sf_")
    for t, (pdf, schema) in tables.items():
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            os.path.join(d, f"{t}.parquet"),
        )
    return d


@st.composite
def adversarial_values(draw, n_min=8, n_max=40):
    """A float64 column with GUARANTEED NaN, +Inf, -Inf and NULL
    entries, plus random finite draws including exact ties, negatives
    and zero."""
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    n = draw(st.integers(min_value=n_min, max_value=n_max))
    finite = rng.uniform(-100.0, 1000.0, n).round(2)  # 2dp -> ties
    vals = list(finite) + [float("nan"), float("inf"), float("-inf"), None]
    rng.shuffle(vals)
    return vals


def _events_pdf(rng: np.random.Generator, vals: list) -> pd.DataFrame:
    n = len(vals)
    # timestamps: spread over ~40 days, with forced ties and NULLs —
    # ties exercise the (ts, event_id) tie-breaks of the temporal family
    hours = rng.integers(0, 24 * 40, n)
    ts = [T0 + dt.timedelta(hours=int(h)) for h in hours]
    for i in range(0, n, 7):
        ts[i] = ts[min(i + 1, n - 1)]  # forced tie
    if n > 3:
        ts[3] = None
    users = rng.integers(1, max(2, n // 4), n).astype(object)
    if n > 5:
        users[5] = None
    return pd.DataFrame(
        {
            "event_id": pd.array(range(1, n + 1), dtype="int64"),
            "ts": ts,
            "user_id": pd.array(list(users), dtype="Int64"),
            "event_type": rng.choice(
                ["click", "purchase", "view"], n
            ).astype(object),
            "value": vals,
            "props": [""] * n,
        }
    )


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_value_trend_engine_identical_under_nan_inf(spark, vals, seed):
    """grouped_slope vs its hugeint-moments oracle on NaN/±Inf values:
    pre-fix the 1e-4 quantization CAST_OVERFLOWed on Spark while the
    oracle's bigint cast raised — non-finite y rows now leave the
    moments like NULLs on both engines (n_points agrees)."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "value_trend", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_salted_event_stats_engine_identical_under_nan_inf(
    spark, vals, seed
):
    """salted_agg's two-phase unit sum vs the plain GROUP BY oracle on
    NaN/±Inf values: the sum skips non-finite, n_events still counts
    them, identically on both engines."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "salted_event_stats", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@FAST
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_streaming_joined_engine_identical_under_nan_inf(
    spark, vals, seed
):
    """The stream-stream inner interval join's attributed_value unit
    sum vs the batch join oracle under NaN/±Inf, across a real
    AvailableNow drain."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "streaming_joined", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@FAST
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_streaming_joined_outer_engine_identical_under_nan_inf(
    spark, vals, seed
):
    """The LEFT OUTER stream-stream join's unit sum under NaN/±Inf —
    unmatched clicks keep NULL purchase columns, non-finite purchase
    values leave the sum like NULLs, on both engines."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "streaming_joined_outer", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_asof_join_engine_identical_on_ties_and_null_keys(
    spark, vals, seed
):
    """asof_join vs its rewritten argmax oracle on tied purchase
    timestamps, NULL timestamps and NULL user keys: the old native
    ASOF LEFT JOIN oracle picked ties arbitrarily, and Spark's window
    partitioning would have matched NULL-key rows to each other —
    both now deterministic ((ts, event_id) tie-break, NULL never
    matches) on both engines."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "asof_join", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_asof_forward_engine_identical_on_ties_and_null_keys(
    spark, vals, seed
):
    """asof_join(direction='forward', tolerance=1h) vs its argmax
    oracle on tied/NULL timestamps and NULL keys — the earliest
    (ts, event_id) future purchase wins on both engines."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "asof_forward", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


def test_asof_join_tied_purchases_pick_latest_event_id(spark):
    """Deterministic tied-timestamp fixture (r12 verdict item 3): two
    purchases by the same user at the IDENTICAL timestamp must resolve
    to the one with the larger event_id — on Spark AND on the oracle,
    which previously used DuckDB's native ASOF JOIN and picked
    arbitrarily."""
    t = T0 + dt.timedelta(hours=1)
    pdf = pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3], dtype="int64"),
            "ts": [t, t, t + dt.timedelta(minutes=5)],
            "user_id": pd.array([7, 7, 7], dtype="Int64"),
            "event_type": ["purchase", "purchase", "view"],
            "value": [10.0, 20.0, 0.0],
            "props": [""] * 3,
        }
    )
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        from uk_housing_dashboard_etl_spark import contract

        got = (
            contract.QUERIES["asof_join"](spark, sf)
            .where("event_id = 3")
            .collect()
        )
        assert len(got) == 1
        # the larger event_id (2, value 20.0) wins the (ts, tie) race
        assert got[0]["asof_purchase_value"] == 20.0
        _gate(spark, "asof_join", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_latest_by_key_engine_identical_on_ties_and_nulls(
    spark, vals, seed
):
    """latest_by_key vs its oracle on (ts, event_id)-tied orders, NULL
    timestamps and NULL users, with NaN/±Inf riding through the value
    passthrough column (r12 verdict item 7: probed clean, now pinned)."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "latest_by_key", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_scd2_history_engine_identical_on_ties_and_nulls(
    spark, vals, seed
):
    """scd2_history vs its oracle: run-length intervals over a
    (ts, event_id) total order with forced timestamp ties, NULL
    ts/user rows and non-finite passthrough values."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "scd2_history", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_cdc_replay_engine_identical_on_ties_and_nulls(spark, vals, seed):
    """apply_cdc (MERGE-INTO replay) vs its oracle: tombstone/upsert
    resolution at the max (ts, event_id) sequence under forced ties,
    NULL ts/user rows and non-finite passthrough values."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "cdc_replay", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


ORDERS_SCHEMA = pa.schema(
    [
        ("o_orderkey", pa.int64()),
        ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")),
    ]
)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_band_join_engine_identical_under_nan_inf_prices(
    spark, vals, seed
):
    """band_join's floor-bucketed |Δ| ≤ ε equi-join vs the naive theta
    oracle on NaN/±Inf/NULL prices: a non-finite price must pair with
    nothing on both engines (its bucket is a saturated sentinel on
    Spark; the exact |Δ| filter rejects it either way)."""
    rng = np.random.default_rng(seed)
    n = len(vals)
    # most orders inside 1996-Q1 (the query's window), some outside;
    # clustered finite prices guarantee real in-band pairs
    days = rng.integers(0, 120, n)
    dates = [dt.datetime(1996, 1, 1) + dt.timedelta(days=int(d)) for d in days]
    prices = [
        v if v is None or not np.isfinite(v) else float(round(v % 100, 2))
        for v in vals
    ]
    pdf = pd.DataFrame(
        {
            "o_orderkey": pd.array(range(1, n + 1), dtype="int64"),
            "o_totalprice": prices,
            "o_orderdate": dates,
        }
    )
    sf = _write_sf({"orders": (pdf, ORDERS_SCHEMA)})
    try:
        _gate(spark, "band_join", sf, {"orders": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@st.composite
def adversarial_embeddings(draw, dim=8, n_min=6, n_max=24):
    """An embeddings table with GUARANTEED adversarial vectors: a +Inf
    component, a -Inf component, a NaN component, a NULL component, an
    all-zero vector (zero norm) and a NULL vector, plus random finite
    vectors (some tied component values across vectors)."""
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    n = draw(st.integers(min_value=n_min, max_value=n_max))
    vecs: list = [
        list(rng.uniform(-2, 2, dim).round(2).astype(np.float32))
        for _ in range(n)
    ]
    specials = [
        [float("inf")] + [0.5] * (dim - 1),
        [float("-inf")] + [0.5] * (dim - 1),
        [float("nan")] + [0.5] * (dim - 1),
        [None] + [0.5] * (dim - 1),
        [0.0] * dim,
        None,
    ]
    vecs.extend(specials)
    rng.shuffle(vecs)
    return vecs


@SLOW
@given(vecs=adversarial_embeddings(), seed=st.integers(0, 2**31))
def test_embedding_health_engine_identical_under_nonfinite_components(
    spark, vecs, seed
):
    """embedding_health vs its oracle on vectors with NaN/±Inf/NULL
    components: pre-fix a +Inf component produced an Inf norm that
    Spark's round4 saturated to ~9.2e14 where DuckDB emitted inf —
    non-finite components now count into n_nan and leave the norm
    percentiles on both engines."""
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "vec_id": pd.array(range(1, len(vecs) + 1), dtype="int64"),
            "embedding": vecs,
            "label": pd.array(
                rng.integers(0, 3, len(vecs)), dtype="int32"
            ),
        }
    )
    sf = _write_sf({"embeddings": (pdf, EMBEDDINGS_SCHEMA)})
    try:
        _gate(spark, "embedding_health", sf, {"embeddings": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vecs=adversarial_embeddings(), seed=st.integers(0, 2**31))
def test_embedding_quantile_norm_engine_identical_under_nonfinite(
    spark, vecs, seed
):
    """quantile_normalize vs its oracle on vectors with NaN/±Inf/NULL
    components: NULL and non-finite coordinates are excluded from the
    per-dim rank on both engines (pre-fix round4 saturated non-finite
    on Spark, and the engines order NULLs at opposite window ends)."""
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "vec_id": pd.array(range(1, len(vecs) + 1), dtype="int64"),
            "embedding": vecs,
            "label": pd.array(
                rng.integers(0, 3, len(vecs)), dtype="int32"
            ),
        }
    )
    sf = _write_sf({"embeddings": (pdf, EMBEDDINGS_SCHEMA)})
    try:
        _gate(spark, "embedding_quantile_norm", sf, {"embeddings": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@FAST
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_streaming_joined_agg_engine_identical_under_nan_inf(
    spark, vals, seed
):
    """The chained stateful join→windowed-agg drain's unit sum under
    NaN/±Inf — the guard rides INSIDE the streaming aggregate."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "streaming_joined_agg", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


# ---- round-13 registry-sweep classes (tools/stress_adversarial_registry
# found 30+ pairs beyond the hand-picked r12 set; these blocks pin the
# representative operator per input class) ----

LINEITEM_FULL_SCHEMA = pa.schema(
    [
        ("l_orderkey", pa.int64()),
        ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()),
        ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()),
        ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()),
        ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()),
        ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ]
)

ORDERS_FULL_SCHEMA = pa.schema(
    [
        ("o_orderkey", pa.int64()),
        ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()),
        ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")),
        ("o_orderpriority", pa.string()),
    ]
)


def _lineitem_pdf(rng: np.random.Generator, vals: list) -> pd.DataFrame:
    n = len(vals)
    qty = list(rng.uniform(1, 50, n).round(0))
    # spread the non-finite draws across ALL FOUR measures so every
    # guarded expression sees them
    disc = list(rng.uniform(0, 0.1, n).round(2))
    tax = list(rng.uniform(0, 0.08, n).round(2))
    for i, v in enumerate(vals):
        if v is None or not np.isfinite(v):
            qty[i % n] = v
            disc[(i + 1) % n] = v
            tax[(i + 2) % n] = v
    return pd.DataFrame(
        {
            "l_orderkey": pd.array(
                rng.integers(1, max(2, n // 3), n), dtype="int64"
            ),
            "l_partkey": pd.array(rng.integers(1, 8, n), dtype="int64"),
            "l_suppkey": pd.array(rng.integers(1, 5, n), dtype="int64"),
            "l_linenumber": pd.array(range(1, n + 1), dtype="int32"),
            "l_quantity": qty,
            "l_extendedprice": vals,
            "l_discount": disc,
            "l_tax": tax,
            "l_returnflag": rng.choice(["A", "N", "R"], n).astype(object),
            "l_linestatus": rng.choice(["F", "O"], n).astype(object),
            "l_shipdate": [
                T0 + dt.timedelta(days=int(d))
                for d in rng.integers(0, 600, n)
            ],
        }
    )


def _orders_pdf(rng: np.random.Generator, vals: list) -> pd.DataFrame:
    n = len(vals)
    return pd.DataFrame(
        {
            "o_orderkey": pd.array(range(1, n + 1), dtype="int64"),
            "o_custkey": pd.array(rng.integers(1, 9, n), dtype="int64"),
            "o_orderstatus": rng.choice(["F", "O", "P"], n).astype(object),
            "o_totalprice": vals,
            "o_orderdate": [
                T0 + dt.timedelta(days=int(d))
                for d in rng.integers(0, 600, n)
            ],
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM"], n
            ).astype(object),
        }
    )


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_pricing_summary_engine_identical_under_nan_inf(spark, vals, seed):
    """TPC-H Q1's four unit sums and three deterministic means vs the
    oracle with NaN/±Inf/NULL spread across every measure column —
    non-finite terms leave each sum/mean like NULLs on both engines
    while count_order keeps the row (r13 sweep class)."""
    rng = np.random.default_rng(seed)
    pdf = _lineitem_pdf(rng, vals)
    sf = _write_sf({"lineitem": (pdf, LINEITEM_FULL_SCHEMA)})
    try:
        _gate(spark, "pricing_summary", sf, {"lineitem": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_trimmed_stats_engine_identical_under_null_rank_order(
    spark, vals, seed
):
    """trimmed_stats vs its oracle with NULL and non-finite prices in
    the ranked population: pre-fix a NULL price ranked FIRST on Spark
    and LAST on DuckDB, shifting the whole trim band (r13 sweep) —
    both are now excluded from ranking on both engines."""
    rng = np.random.default_rng(seed)
    pdf = _orders_pdf(rng, vals)
    sf = _write_sf({"orders": (pdf, ORDERS_FULL_SCHEMA)})
    try:
        _gate(spark, "trimmed_stats", sf, {"orders": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_price_histogram_engine_identical_under_nan_inf(spark, vals, seed):
    """price_histogram vs its oracle under NaN/±Inf prices: pre-fix
    Spark's floor silently fabricated a ±maxlong phantom bucket where
    DuckDB's bigint cast raised — non-finite prices now have no bucket
    on either engine."""
    rng = np.random.default_rng(seed)
    pdf = _orders_pdf(rng, vals)
    sf = _write_sf({"orders": (pdf, ORDERS_FULL_SCHEMA)})
    try:
        _gate(spark, "price_histogram", sf, {"orders": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_sessionize_engine_identical_on_null_ts_and_ties(spark, vals, seed):
    """session_stats vs its oracle on NULL timestamps, forced (ts,
    event_id) ties and non-finite values: pre-fix a NULL-ts row opened
    its own session on Spark (NULLS FIRST) but absorbed into the last
    session on DuckDB (NULLS LAST), and the oracle's running session
    sum walked a different tie order than its own lag (r13 sweep)."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "sessionize", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


CUSTOMER_SCHEMA = pa.schema(
    [
        ("c_custkey", pa.int64()),
        ("c_name", pa.string()),
        ("c_nationkey", pa.int32()),
        ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ]
)

NATION_SCHEMA = pa.schema(
    [
        ("n_nationkey", pa.int32()),
        ("n_name", pa.string()),
        ("n_regionkey", pa.int32()),
    ]
)


def _lookup_pdfs(rng: np.random.Generator, n_users: int):
    cust = pd.DataFrame(
        {
            "c_custkey": pd.array(range(1, n_users + 1), dtype="int64"),
            "c_name": [f"c{i}" for i in range(1, n_users + 1)],
            "c_nationkey": pd.array(
                rng.integers(0, 3, n_users), dtype="int32"
            ),
            "c_acctbal": list(rng.uniform(0, 1000, n_users).round(2)),
            "c_mktsegment": ["BUILDING"] * n_users,
        }
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": pd.array([0, 1, 2], dtype="int32"),
            "n_name": ["ALPHA", "BETA", "GAMMA"],
            "n_regionkey": pd.array([0, 0, 1], dtype="int32"),
        }
    )
    return cust, nation


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_weekly_by_la_engine_identical_under_nan_inf(spark, vals, seed):
    """The §2 flagship mart vs its _BASE_FIN oracle on NaN/±Inf/NULL
    prices with NULL timestamps and users: pre-fix one non-finite price
    crashed the deterministic mean's bigint quantization on BOTH
    engines — it now leaves mean/percentiles like a NULL while the row
    still counts into transactions."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    n_users = int(pd.Series(pdf["user_id"]).max() or 5) + 2
    cust, nation = _lookup_pdfs(rng, n_users)
    sf = _write_sf(
        {
            "events": (pdf, EVENTS_SCHEMA),
            "customer": (cust, CUSTOMER_SCHEMA),
            "nation": (nation, NATION_SCHEMA),
        }
    )
    try:
        _gate(
            spark, "weekly_by_la", sf,
            {"events": pdf, "customer": cust, "nation": nation},
        )
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_corr_stats_engine_identical_under_nan_inf(spark, vals, seed):
    """corr_stats vs its oracle with NaN/±Inf spread across both
    measure columns: pre-fix Spark's moments NaN-poisoned where
    DuckDB's STDDEV raised out-of-range — rows with a non-finite
    measure are now excluded on both engines (same n everywhere)."""
    rng = np.random.default_rng(seed)
    pdf = _lineitem_pdf(rng, vals)
    sf = _write_sf({"lineitem": (pdf, LINEITEM_FULL_SCHEMA)})
    try:
        _gate(spark, "corr_stats", sf, {"lineitem": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_sketch_weekly_distinct_engine_identical_on_null_ts(
    spark, vals, seed
):
    """mergeable_daily_distinct vs its oracle with NULL timestamps:
    pre-fix the sketch/exact equi-join dropped the NULL-week group the
    oracle's GROUP BY kept — 'unknown time' now belongs to no week on
    both engines."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "sketch_weekly_distinct", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_sketch_cardinalities_engine_identical_on_all_null_group(
    spark, vals, seed
):
    """approx_cardinalities vs its oracle when an entire group's ids
    are NULL (exact distinct 0): pre-fix the rel_error ratio raised
    ANSI DIVIDE_BY_ZERO — the CASE now keeps the division off empty
    groups, flag true iff the sketch agrees the group is empty."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    pdf.loc[pdf["event_type"] == "view", "user_id"] = None
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "sketch_cardinalities", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)
