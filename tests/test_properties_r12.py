"""Round-12 property blocks (r11 verdict item 5): adversarial ±Inf/NaN
value fuzz for the stats family, each operator run against its OWN
DuckDB oracle (the exact driver-gate comparison, via tools.selfcheck's
canonicalize/compare) on hypothesis-drawn tables whose generators
GUARANTEE NaN, +Inf, -Inf and NULL draws in the value column — the
class of input where Spark and DuckDB semantics can silently diverge
(Spark's total order puts NaN above +Inf; a bare ``x >= 1.0`` filter
keeps both). The r12 seed probe of this exact shape found a real crash:
``benford_profile`` overflowed the ANSI digit cast on a single +Inf row
(fixed with an explicit finiteness filter on both engines; pinned
below).

Covered pairs: ks_values (ks_two_sample), mannwhitney_values
(mannwhitney_two_sample), benford_prices (benford_profile), psi_drift
(psi_drift), interarrival_stats (interarrival_stats — timestamps carry
no NaN/Inf, so its adversarial classes are NULL/duplicate/tied
timestamps, NULL users and single-event users), and the second sweep's
findings: twap (time_weighted_mean — ANSI bigint overflow on ±Inf in
the integer-unit quantization), peak_sessions (ENGINE DIVERGENCE:
Spark's floor(double) returns LONG and silently saturates ±Inf/NaN
while DuckDB's stays DOUBLE and its cast raises), trimmed_stats and
winsorized_prices (both crash in dsum's quantization on ±Inf reaching
the kept/clipped rows).

Free by construction: tests are outside the rotation tracer's scope,
so property coverage grows without staling any driver-window query
(the benford operator fix itself stales benford_prices — budgeted).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile

import numpy as np
import pytest
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
LINEITEM_SCHEMA = pa.schema(
    [
        ("l_orderkey", pa.int64()),
        ("l_linenumber", pa.int64()),
        ("l_quantity", pa.float64()),
        ("l_extendedprice", pa.float64()),
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
def adversarial_values(draw, n_min=8, n_max=40, positive=False):
    """A float64 column with GUARANTEED NaN, +Inf, -Inf and NULL
    entries, plus random finite draws including exact ties and (unless
    positive) negatives and zero."""
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    n = draw(st.integers(min_value=n_min, max_value=n_max))
    lo = 0.5 if positive else -100.0
    finite = rng.uniform(lo, 1000.0, n).round(2)  # 2dp -> natural ties
    if positive:
        # magnitude spread for digit extraction, incl. 10^e boundaries
        finite = np.concatenate(
            [finite, [1.0, 10.0, 100.0, 9.999999999, 0.5, 123.45]]
        )
    vals = list(finite) + [float("nan"), float("inf"), float("-inf"), None]
    rng.shuffle(vals)
    return vals


def _events_pdf(rng: np.random.Generator, vals: list) -> pd.DataFrame:
    n = len(vals)
    # timestamps: spread over ~40 days (straddles psi's 01-16 split),
    # with duplicates (ties) and some NULLs
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
def test_ks_values_engine_identical_under_nan_inf(spark, vals, seed):
    """ks_two_sample vs its DuckDB oracle on values including NaN/±Inf:
    both engines must place the specials identically in the pooled CDF
    (NaN groups as a single value, ±Inf at the order extremes)."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "ks_values", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_mannwhitney_engine_identical_under_nan_inf(spark, vals, seed):
    """mannwhitney_two_sample vs its oracle: midranks over a pooled
    order containing NaN/±Inf and exact ties must agree bit-for-bit."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "mannwhitney_values", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_psi_drift_engine_identical_under_nan_inf(spark, vals, seed):
    """psi_drift vs its oracle: reference-decile bucketing with NaN/±Inf
    present in either window must bin identically on both engines."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "psi_drift", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_interarrival_engine_identical_on_tied_null_timestamps(
    spark, vals, seed
):
    """interarrival_stats vs its oracle: gaps over (ts, event_id)-tied
    orders, NULL ts/user rows and single-event users (values carry the
    NaN/±Inf draws but don't enter the statistic — the adversarial axis
    here is the ordering)."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "interarrival_stats", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(positive=True), seed=st.integers(0, 2**31))
def test_benford_engine_identical_under_nan_inf(spark, vals, seed):
    """benford_profile vs its oracle with NaN/±Inf in the price column:
    the r12 seed probe crashed here (ANSI CAST_OVERFLOW on +Inf — NaN
    and +Inf both pass ``x >= 1.0`` under Spark's total order); the
    finiteness filter on both engines must hold on every draw,
    including exact powers of 10 and near-boundary magnitudes."""
    rng = np.random.default_rng(seed)
    n = len(vals)
    pdf = pd.DataFrame(
        {
            "l_orderkey": pd.array(range(1, n + 1), dtype="int64"),
            "l_linenumber": pd.array(
                list(rng.integers(1, 7, n)), dtype="int64"
            ),
            "l_quantity": rng.integers(1, 50, n).astype(float),
            "l_extendedprice": vals,
        }
    )
    sf = _write_sf({"lineitem": (pdf, LINEITEM_SCHEMA)})
    try:
        _gate(spark, "benford_prices", sf, {"lineitem": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


ORDERS_SCHEMA = pa.schema(
    [
        ("o_orderkey", pa.int64()),
        ("o_custkey", pa.int64()),
        ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.date32()),
        ("o_orderstatus", pa.string()),
        ("o_orderpriority", pa.string()),
    ]
)


def _orders_pdf(rng: np.random.Generator, vals: list) -> pd.DataFrame:
    n = len(vals)
    return pd.DataFrame(
        {
            "o_orderkey": pd.array(range(1, n + 1), dtype="int64"),
            "o_custkey": pd.array(
                list(rng.integers(1, max(2, n // 3), n)), dtype="int64"
            ),
            "o_totalprice": vals,
            "o_orderdate": [
                dt.date(2024, 1, int(d)) for d in rng.integers(1, 28, n)
            ],
            "o_orderstatus": rng.choice(["F", "O", "P"], n).astype(object),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM"], n
            ).astype(object),
        }
    )


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_twap_engine_identical_under_nan_inf(spark, vals, seed):
    """time_weighted_mean vs its oracle: a single ±Inf/NaN observation
    crashed the ANSI bigint quantization pre-fix; post-fix both engines
    drop non-finite observations BEFORE the lead so holding intervals
    accrue identically."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "twap", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_peak_sessions_engine_identical_under_nan_inf(spark, vals, seed):
    """peak_concurrency vs its oracle: pre-fix Spark's floor(double)
    SILENTLY saturated ±Inf to maxlong (a 1807 s phantom session) and
    NaN to 0 while DuckDB raised — the worst divergence class, one
    engine wrong and the other dead. The finiteness filter must hold on
    every draw, midnight-crossers included."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "peak_sessions", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_trimmed_stats_engine_identical_under_nan_inf(spark, vals, seed):
    """trimmed_stats vs its oracle: non-finite rows must leave the
    ranked population on BOTH engines (NULLs keep their rank-first
    behavior), so the trim boundaries and the kept-row dsum agree."""
    rng = np.random.default_rng(seed)
    pdf = _orders_pdf(rng, vals)
    sf = _write_sf({"orders": (pdf, ORDERS_SCHEMA)})
    try:
        _gate(spark, "trimmed_stats", sf, {"orders": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_winsorized_engine_identical_under_nan_inf(spark, vals, seed):
    """winsorized_stats vs its oracle: percentile fences, raw mean and
    clipped mean all exclude non-finite rows identically — an Inf row
    clipped to a fence would silently launder the sentinel into the
    mean on whichever engine survived it."""
    rng = np.random.default_rng(seed)
    pdf = _orders_pdf(rng, vals)
    sf = _write_sf({"orders": (pdf, ORDERS_SCHEMA)})
    try:
        _gate(spark, "winsorized_prices", sf, {"orders": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_streaming_anomaly_check_engine_identical_under_nan_inf(
    spark, vals, seed
):
    """The stateful anomaly drain's batch twin vs its oracle on values
    including NaN/±Inf: non-finite values must score unknown and leave
    the prefix stats on BOTH engines — pre-fix, a single ±Inf folded
    into the Welford state (mean=Inf, m2=NaN) and poisoned every later
    score for the key, the exact class the fold's NaN guard was built
    for."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "streaming_anomaly_check", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


CUSTOMER_SCHEMA = pa.schema(
    [
        ("c_custkey", pa.int64()),
        ("c_name", pa.string()),
        ("c_mktsegment", pa.string()),
        ("c_nationkey", pa.int64()),
    ]
)

FAST = settings(
    max_examples=3,  # each example drains a real streaming query
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _customer_pdf(rng: np.random.Generator, n_users: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "c_custkey": pd.array(range(1, n_users + 1), dtype="int64"),
            "c_name": [f"c{i}" for i in range(1, n_users + 1)],
            "c_mktsegment": rng.choice(
                ["BUILDING", "MACHINERY"], n_users
            ).astype(object),
            "c_nationkey": pd.array([0] * n_users, dtype="int64"),
        }
    )


@FAST
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_streaming_weekly_gate_engine_identical_under_nan_inf(
    spark, vals, seed
):
    """The weekly drain's deterministic integer-unit mean vs its batch
    oracle on NaN/±Inf values: pre-fix Spark's floor silently saturated
    them into the unit sum while DuckDB raised — non-finite now leaves
    the mean like NULL on both engines, across a real drain."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "streaming_weekly", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@FAST
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_streaming_enriched_gate_engine_identical_under_nan_inf(
    spark, vals, seed
):
    """The stream-static enrichment drain's integer-unit value sum vs
    its batch join oracle under NaN/±Inf — the sum skips non-finite,
    the row still counts in n_events, identically on both engines."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    cust = _customer_pdf(rng, int(pd.Series(pdf["user_id"]).max() or 5) + 2)
    sf = _write_sf(
        {"events": (pdf, EVENTS_SCHEMA), "customer": (cust, CUSTOMER_SCHEMA)}
    )
    try:
        _gate(spark, "streaming_enriched", sf, {"events": pdf, "customer": cust})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_mg_heavy_hitters_engine_identical_under_nan_inf(spark, vals, seed):
    """mg_heavy_hitters vs its exact GROUP BY/HAVING oracle: non-finite
    values have no bucket (Spark floor saturates +Inf to a phantom
    maxlong bucket, NaN to bucket 0; DuckDB raises) — both engines now
    filter to finite before bucketing."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "mg_heavy_hitters", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_seasonality_profile_engine_identical_under_nan_inf(
    spark, vals, seed
):
    """seasonality_profile vs its oracle: the per-(type, dow) unit-sum
    mean skips non-finite values like NULLs on both engines while the
    share denominators still count every row."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "seasonality_profile", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_ab_ztest_engine_identical_under_nan_inf(spark, vals, seed):
    """ab_ztest vs its oracle under NaN/±Inf draws: the proportion test
    counts conversions, never sums values, so it survives the class by
    construction — pinned so a future value-sum addition can't silently
    join the quantization class."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "ab_ztest", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_chi2_type_split_engine_identical_under_nan_inf(spark, vals, seed):
    """chi2_type_split vs its oracle under NaN/±Inf draws: pure count
    contingency — survives by construction, pinned."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "chi2_type_split", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
def test_attribution_credit_engine_identical_under_nan_inf(
    spark, vals, seed
):
    """attribution_credit vs its oracle under NaN/±Inf draws and tied/
    NULL timestamps: credit fractions come from touch COUNTS between
    purchases, not values — survives by construction, pinned."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "attribution_credit", sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)

EXOTIC_TEXTS = [
    "plain ascii text with words and more words here",
    "café naïve résumé straße",
    "élève combining marks é",
    "\U0001F600 \U0001F680 emoji \U0001F9E0 mixed with text",
    "中文文本处理 chinese text",
    "مرحبا بالعالم arabic",
    "\U00010400\U00010401 deseret astral letters",
    "tab\tseparated\nand newline",
    "",
    "   ",
]


def _docs_pdf(rng: np.random.Generator) -> pd.DataFrame:
    extra = [f"doc {i} body words {'x' * int(rng.integers(1, 40))}" for i in range(10)]
    texts = EXOTIC_TEXTS + extra
    n = len(texts)
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(1, n + 1), dtype="int64"),
            "text": texts,
            "lang": rng.choice(["en", "xx", "de"], n).astype(object),
            "source": rng.choice(["s1", "s2", "s3"], n).astype(object),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )


@SLOW
@given(vals=adversarial_values(), seed=st.integers(0, 2**31))
@pytest.mark.parametrize(
    "name", ["funnel_timing", "cohort_matrix", "top_paths", "basket_lift"]
)
def test_events_pairs_survive_nan_inf_by_construction(
    spark, name, vals, seed
):
    """Events-based pairs that survive the non-finite class by
    construction (count/timing-based, no value quantization) — pinned
    so a future value-sum addition can't silently join it."""
    rng = np.random.default_rng(seed)
    pdf = _events_pdf(rng, vals)
    sf = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, name, sf, {"events": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)


@SLOW
@given(seed=st.integers(0, 2**31))
@pytest.mark.parametrize(
    "name",
    [
        "weighted_sample",
        "importance_resample",
        "temperature_mix",
        "hash_sample",
        "stratified_sample",
    ],
)
def test_sampling_pairs_engine_identical_on_exotic_documents(
    spark, name, seed
):
    """The five sampling pairs over documents with exotic Unicode
    (astral plane, CJK, RTL, combining marks), empty and whitespace
    texts — deterministic hashes and weights must agree bit-for-bit on
    both engines regardless of text content."""
    rng = np.random.default_rng(seed)
    pdf = _docs_pdf(rng)
    sf = _write_sf({"documents": (pdf, DOCS_SCHEMA)})
    try:
        _gate(spark, name, sf, {"documents": pdf})
    finally:
        shutil.rmtree(sf, ignore_errors=True)
