"""Round-14 property blocks: the classes the 6-axis registry sweep
proved this round, each pinned against its OWN DuckDB oracle via the
exact driver-gate comparison on generated adversarial tables.

- the valid-embeddings ingest boundary (the ``embeddings`` axis
  crashed 25/27 vector pairs on one NULL/ragged/non-finite/zero
  vector): unit semantics of the filter itself, plus a gate run of
  ``embedding_centroids`` on a contaminated corpus;
- acf_weekly's NULL-week exclusion (Spark's lag window sorts a NULL
  order key FIRST, DuckDB's LAST — one NULL-ts event shifted every
  lag pair);
- the expectations range checks' explicit finiteness conjunct
  (DuckDB's columnar BETWEEN admits NaN where its constant fold and
  Spark both reject it);
- salted_join_stats' unit-sum guard (the last unguarded ``_dsum``,
  reached through the 1996-order join by the price_infilter axis).

Tests live outside the rotation tracer's scope, so pins accumulate
without staling any driver-window query.
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

LINEITEM_SCHEMA = pa.schema(
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

ORDERS_SCHEMA = pa.schema(
    [
        ("o_orderkey", pa.int64()),
        ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()),
        ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")),
        ("o_orderpriority", pa.string()),
    ]
)


def _gate(spark, name: str, sf_dir: str, tables: list[str]):
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


# ------------------------------------------------- embeddings boundary


def _emb_pdf(rng: np.random.Generator, n_clean: int, dim: int):
    """Clean vectors + one of every malformed class the sweep plants."""
    clean = [
        [float(x) for x in rng.uniform(-1, 1, dim).round(3)]
        for _ in range(n_clean)
    ]
    bad = [
        [float("nan")] + clean[0][1:],          # NaN component
        [float("inf")] + clean[0][1:],          # +Inf component
        [None] + clean[0][1:],                  # NULL component
        [0.0] * dim,                            # zero norm
        clean[0][: max(1, dim // 2)],           # ragged
        None,                                   # NULL vector
    ]
    vecs = clean + bad
    return pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": vecs,
            "label": (np.arange(len(vecs)) % 3).astype(np.int32),
        }
    )


def test_valid_embeddings_keeps_exactly_the_wellformed(spark):
    from pyspark.sql import functions as F

    from uk_housing_dashboard_etl_spark.operators.similarity import (
        valid_embeddings,
    )

    rng = np.random.default_rng(7)
    d = _write_sf({"embeddings": (_emb_pdf(rng, 8, 6), EMBEDDINGS_SCHEMA)})
    try:
        from uk_housing_dashboard_etl_spark.sources.readers import read_table

        emb = read_table(spark, d, "embeddings")
        kept = valid_embeddings(emb).select("vec_id").toPandas()["vec_id"]
        # exactly the 8 clean ids survive; all six malformed rows drop
        assert sorted(kept) == list(range(8))
        # and the boundary is a no-op when re-applied
        again = valid_embeddings(
            valid_embeddings(emb), dim=6
        ).count()
        assert again == 8
        # dim override skips the census but filters identically
        assert (
            valid_embeddings(emb, dim=6).select("vec_id").toPandas()["vec_id"]
            .tolist()
            == sorted(kept)
        )
        assert emb.where(F.col("vec_id") >= 8).count() == 6  # planted
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(data=st.data())
@SLOW
def test_embedding_centroids_gate_on_contaminated_corpus(spark, data):
    from uk_housing_dashboard_etl_spark import contract

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n_clean = data.draw(st.integers(min_value=6, max_value=20))
    dim = data.draw(st.integers(min_value=3, max_value=10))
    d = _write_sf(
        {"embeddings": (_emb_pdf(rng, n_clean, dim), EMBEDDINGS_SCHEMA)}
    )
    try:
        # r15: the census memo moved inside the emb_valid fit artifact,
        # which is keyed on the (unique) temp dir — nothing to pop
        _gate(spark, "embedding_centroids", d, ["embeddings"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------- acf NULL-week


@given(data=st.data())
@SLOW
def test_acf_weekly_gate_with_null_and_tied_timestamps(spark, data):
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n = data.draw(st.integers(min_value=30, max_value=80))
    hours = rng.integers(0, 24 * 70, n)
    ts = [T0 + dt.timedelta(hours=int(h)) for h in hours]
    ts[0] = ts[1]          # forced tie
    ts[2] = None           # the NULL week that shifted every lag pair
    ts[3] = None
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(1, 6, n).astype(np.int64),
            "event_type": rng.choice(["click", "view"], n),
            "value": rng.uniform(0, 100, n).round(2),
            "props": ["{}"] * n,
        }
    )
    d = _write_sf({"events": (pdf, EVENTS_SCHEMA)})
    try:
        _gate(spark, "acf_weekly", d, ["events"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ------------------------------------- expectations + salted_join_stats


def _lineitem_pdf(rng: np.random.Generator, orderkeys: np.ndarray):
    n = len(orderkeys)
    qty = rng.uniform(0.5, 60, n).round(2)
    price = rng.uniform(10, 1000, n).round(2)
    disc = rng.uniform(0.0, 0.12, n).round(3)
    # guaranteed adversaries riding real join keys
    for i, v in enumerate(
        [float("nan"), float("inf"), float("-inf"), None]
    ):
        qty[i % n] = v if v is not None else qty[i % n]
        price[(i + 1) % n] = v
        disc[(i + 2) % n] = v
    return pd.DataFrame(
        {
            "l_orderkey": orderkeys.astype(np.int64),
            "l_partkey": rng.integers(1, 20, n).astype(np.int64),
            "l_suppkey": rng.integers(1, 10, n).astype(np.int64),
            "l_linenumber": np.arange(n, dtype=np.int32),
            "l_quantity": qty,
            "l_extendedprice": price,
            "l_discount": disc,
            "l_tax": rng.uniform(0, 0.08, n).round(3),
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_linestatus": rng.choice(["O", "F"], n),
            "l_shipdate": [
                T0 + dt.timedelta(days=int(x)) for x in rng.integers(0, 900, n)
            ],
        }
    )


@given(data=st.data())
@SLOW
def test_expectations_gate_with_nonfinite_measures(spark, data):
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n = data.draw(st.integers(min_value=10, max_value=40))
    pdf = _lineitem_pdf(rng, rng.integers(1, 15, n))
    d = _write_sf({"lineitem": (pdf, LINEITEM_SCHEMA)})
    try:
        _gate(spark, "expectations", d, ["lineitem"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(data=st.data())
@SLOW
def test_salted_join_stats_gate_with_nonfinite_measures(spark, data):
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n = data.draw(st.integers(min_value=10, max_value=40))
    okeys = rng.integers(1, 15, n)
    li = _lineitem_pdf(rng, okeys)
    # orders straddling the 1996 window so the join filter is real
    dates = [
        dt.datetime(1995, 6, 1),
        dt.datetime(1996, 2, 1),
        dt.datetime(1996, 11, 30),
        dt.datetime(1997, 3, 1),
    ]
    uniq = np.unique(okeys)
    orders = pd.DataFrame(
        {
            "o_orderkey": uniq.astype(np.int64),
            "o_custkey": (uniq % 7 + 1).astype(np.int64),
            "o_orderstatus": ["O"] * len(uniq),
            "o_totalprice": np.round(
                np.random.default_rng(1).uniform(100, 9999, len(uniq)), 2
            ),
            "o_orderdate": [dates[int(k) % 4] for k in uniq],
            "o_orderpriority": [
                ["1-URGENT", "2-HIGH", "3-MEDIUM"][int(k) % 3] for k in uniq
            ],
        }
    )
    d = _write_sf(
        {
            "lineitem": (li, LINEITEM_SCHEMA),
            "orders": (orders, ORDERS_SCHEMA),
        }
    )
    try:
        _gate(spark, "salted_join_stats", d, ["lineitem", "orders"])
    finally:
        shutil.rmtree(d, ignore_errors=True)
