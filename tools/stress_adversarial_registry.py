"""Registry-wide adversarial sweep: run EVERY contract query/oracle
pair on a contaminated copy of the driver corpus and report any
divergence or crash — the empirical check behind SCALE.md §7's "no
known wrong-on-adversarial-input pairs" claim.

The r11-r13 fuzz program pinned ~30 hand-picked pairs with hypothesis
blocks; this tool closes the OTHER direction — unknown unknowns — by
sweeping the whole registry at once. Contamination is applied per AXIS
so a failure attributes to the input class that caused it:

- ``value``:  non-finite (NaN/+Inf/-Inf) and NULL doubles appended to
              events.value with clean keys/timestamps — the integer-
              unit quantization / floor-bucket class.
- ``order``:  tied (user_id, ts) rows, NULL timestamps and NULL
              user_ids in events — the total-order / carry-forward /
              window-frame class.
- ``price``:  non-finite and NULL doubles in orders.o_totalprice and
              lineitem l_extendedprice/l_discount/l_tax/l_quantity —
              the relational (TPC-H shape) surface's exposure.

documents/embeddings stay CLEAN by design: exotic text is the
documented U+0130 comparison-layer boundary (ASCII fixture invariant +
selfcheck warning), and non-finite vector components are the
embedding_health contract ("health-check before index build") with the
health/quantile pairs themselves pinned by hypothesis blocks.

Usage:  PYTHONPATH=.:tools python tools/stress_adversarial_registry.py \
            [axis ...] [--base /root/testdata/sf0.001] [--only q1,q2]

Oracle-less (rows-only) queries still run their Spark side — a crash
there is a finding even without a comparison.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

NONFINITE = [float("nan"), float("inf"), float("-inf"), None]


def _copy_corpus(base: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(dst, f"{t}.parquet"))


def _append_rows(path: str, rows: "pa.Table") -> None:
    tbl = pq.read_table(path)
    out = pa.concat_tables([tbl, rows.cast(tbl.schema)])
    pq.write_table(out, path)


def _contaminate_value(d: str) -> None:
    """Non-finite/NULL event values on clean keys/timestamps: clone 4
    real rows (fresh event_ids) and overwrite only `value`."""
    path = os.path.join(d, "events.parquet")
    tbl = pq.read_table(path)
    head = tbl.slice(0, len(NONFINITE)).to_pydict()
    max_id = duckdb.sql(
        f"SELECT max(event_id) FROM '{path}'"
    ).fetchone()[0]
    head["event_id"] = [max_id + 1 + i for i in range(len(NONFINITE))]
    head["value"] = list(NONFINITE)
    _append_rows(path, pa.Table.from_pydict(head))


def _contaminate_order(d: str) -> None:
    """Total-order adversaries: exact (user_id, ts) duplicates of real
    rows, a NULL-ts row and a NULL-user row (finite values)."""
    path = os.path.join(d, "events.parquet")
    tbl = pq.read_table(path)
    base = tbl.slice(0, 4).to_pydict()
    max_id = duckdb.sql(
        f"SELECT max(event_id) FROM '{path}'"
    ).fetchone()[0]
    base["event_id"] = [max_id + 1 + i for i in range(4)]
    # rows 0-1 duplicate existing (user, ts) pairs exactly (tie class);
    # row 2 NULL ts; row 3 NULL user
    base["ts"] = [base["ts"][0], base["ts"][1], None, base["ts"][3]]
    base["user_id"] = [
        base["user_id"][0], base["user_id"][1], base["user_id"][2], None,
    ]
    base["value"] = [1.25, 2.5, 3.75, 5.0]
    _append_rows(path, pa.Table.from_pydict(base))


def _contaminate_price(d: str) -> None:
    """Non-finite/NULL prices in the relational tables."""
    for t, cols in (
        ("orders", ["o_totalprice"]),
        ("lineitem", ["l_extendedprice", "l_discount", "l_tax",
                      "l_quantity"]),
    ):
        path = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        tbl = pq.read_table(path)
        head = tbl.slice(0, len(NONFINITE)).to_pydict()
        if t == "orders":
            max_id = duckdb.sql(
                f"SELECT max(o_orderkey) FROM '{path}'"
            ).fetchone()[0]
            head["o_orderkey"] = [
                max_id + 1 + i for i in range(len(NONFINITE))
            ]
        for c in cols:
            if c in head:
                head[c] = list(NONFINITE)
        _append_rows(path, pa.Table.from_pydict(head))


def _contaminate_price_infilter(d: str) -> None:
    """Non-finite prices on rows built to SURVIVE the relational
    family's date/predicate filters (r13 residual probe): lineitem rows
    shipped mid-1996 (inside the promo/revenue/market windows),
    orders mid-1996, and positive-balance customers (idle_capital's
    ``c_acctbal > 0``). The plain ``price`` axis clones head rows whose
    dates fall wherever they fall — these are aimed."""
    import datetime as dt

    # CORRELATED contamination: the cloned lineitem rows point at
    # cloned mid-1996 orders (and carry returnflag R), so multi-join
    # revenue paths (orders-window joins like Q5/Q10/Q3/Q8 shapes) see
    # the non-finite measures too — uncorrelated clones only reach
    # single-table scans
    od = os.path.join(d, "orders.parquet")
    new_orderkeys = []
    if os.path.exists(od):
        tbl = pq.read_table(od)
        head = tbl.slice(0, len(NONFINITE)).to_pydict()
        max_id = duckdb.sql(
            f"SELECT max(o_orderkey) FROM '{od}'"
        ).fetchone()[0]
        new_orderkeys = [
            max_id + 1 + i for i in range(len(NONFINITE))
        ]
        head["o_orderkey"] = list(new_orderkeys)
        head["o_orderdate"] = [
            dt.datetime(1996, 2, 1)] * len(NONFINITE)
        head["o_totalprice"] = list(NONFINITE)
        _append_rows(od, pa.Table.from_pydict(head))
    li = os.path.join(d, "lineitem.parquet")
    if os.path.exists(li):
        tbl = pq.read_table(li)
        head = tbl.slice(0, len(NONFINITE)).to_pydict()
        if new_orderkeys:
            head["l_orderkey"] = list(new_orderkeys)
        head["l_shipdate"] = [
            dt.datetime(1996, 2, 1)] * len(NONFINITE)
        head["l_returnflag"] = ["R"] * len(NONFINITE)
        head["l_extendedprice"] = list(NONFINITE)
        head["l_discount"] = [0.04] * len(NONFINITE)
        head["l_quantity"] = list(NONFINITE)
        _append_rows(li, pa.Table.from_pydict(head))
    cu = os.path.join(d, "customer.parquet")
    if os.path.exists(cu):
        tbl = pq.read_table(cu)
        head = tbl.slice(0, len(NONFINITE)).to_pydict()
        max_id = duckdb.sql(
            f"SELECT max(c_custkey) FROM '{cu}'"
        ).fetchone()[0]
        head["c_custkey"] = [
            max_id + 1 + i for i in range(len(NONFINITE))
        ]
        # inf/nan survive c_acctbal > 0 in BOTH engines? NaN > 0 is
        # false on both; +Inf > 0 true on both — keep the draws as-is
        head["c_acctbal"] = list(NONFINITE)
        _append_rows(cu, pa.Table.from_pydict(head))


def _contaminate_price_reach(d: str) -> None:
    """Fifth axis (r14): non-finite prices on rows that SATISFY the six
    residual pairs' JOIN predicates — the co-location/segment/region
    paths ``price_infilter`` could not reach (r13 verdict item 2).

    Per-pair reach, all through four cloned mid-1996 orders placed by an
    ASIA BUILDING customer:

    - ``revenue_by_nation``  (Q5): l_suppkey is a supplier in that same
      customer's nation (the co-location predicate), order in 1996.
    - ``shipping_priority``  (Q3): BUILDING segment, o_orderdate
      1996-02-01 < cutoff < l_shipdate 1996-08-01.
    - ``market_share``       (Q8): l_partkey is a STANDARD part; the
      order's customer is in ASIA.
    - ``small_qty_revenue`` (Q17): one Brand#3 part gets a NaN-quantity
      line (poisons the per-part avg threshold), a second Brand#3 part
      gets a tiny-quantity line with NaN price (passes the 20% cut,
      poisons the revenue sum).
    - ``disjunctive_revenue`` (Q19): a Brand#15 size≤15 part with
      l_quantity 25 (third OR branch) and +Inf price.
    - ``slow_suppliers``     (Q21): a NULL-suppkey, NULL-shipdate line
      (no float measures there — reach proves it CLEAN, not RED).
    """
    import datetime as dt

    con = duckdb.connect()
    for t in ("customer", "supplier", "nation", "region", "part",
              "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{os.path.join(d, t + '.parquet')}'")
    cust, supp = con.sql("""
        SELECT c.c_custkey, s.s_suppkey FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        JOIN supplier s ON s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA' AND c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, s.s_suppkey LIMIT 1""").fetchone()
    (std_part,) = con.sql(
        "SELECT p_partkey FROM part WHERE p_type = 'STANDARD' "
        "ORDER BY p_partkey LIMIT 1").fetchone()
    b3 = [r[0] for r in con.sql("""
        SELECT l_partkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#3' GROUP BY 1
        HAVING avg(l_quantity) > 1 ORDER BY 1 LIMIT 2""").fetchall()]
    b15 = con.sql(
        "SELECT p_partkey FROM part WHERE p_brand = 'Brand#15' "
        "AND p_size BETWEEN 1 AND 15 ORDER BY p_partkey LIMIT 1"
    ).fetchone()
    con.close()
    b3_a, b3_b = (b3 + [std_part, std_part])[:2]
    b15_part = b15[0] if b15 else std_part

    od = os.path.join(d, "orders.parquet")
    tbl = pq.read_table(od)
    head = tbl.slice(0, len(NONFINITE)).to_pydict()
    max_id = duckdb.sql(f"SELECT max(o_orderkey) FROM '{od}'").fetchone()[0]
    okeys = [max_id + 1 + i for i in range(len(NONFINITE))]
    head["o_orderkey"] = list(okeys)
    head["o_custkey"] = [cust] * len(NONFINITE)
    head["o_orderdate"] = [dt.datetime(1996, 2, 1)] * len(NONFINITE)
    head["o_totalprice"] = list(NONFINITE)
    _append_rows(od, pa.Table.from_pydict(head))

    li = os.path.join(d, "lineitem.parquet")
    tbl = pq.read_table(li)
    nan, inf = float("nan"), float("inf")
    #       orderkey  partkey   suppkey  shipdate          price  qty
    rows = [
        (okeys[0], std_part, supp, dt.datetime(1996, 8, 1), nan,   5.0),
        (okeys[1], std_part, supp, dt.datetime(1996, 8, 1), inf,   5.0),
        (okeys[2], std_part, supp, dt.datetime(1996, 8, 1), -inf,  5.0),
        (okeys[3], std_part, supp, dt.datetime(1996, 8, 1), None,  5.0),
        (okeys[0], b3_a,     supp, dt.datetime(1996, 8, 1), 100.0, nan),
        (okeys[1], b3_b,     supp, dt.datetime(1996, 8, 1), nan,   1e-4),
        (okeys[2], b15_part, supp, dt.datetime(1996, 8, 1), inf,   25.0),
        (okeys[3], std_part, None, None,                    50.0,  5.0),
    ]
    head = tbl.slice(0, len(rows)).to_pydict()
    head["l_orderkey"] = [r[0] for r in rows]
    head["l_partkey"] = [r[1] for r in rows]
    head["l_suppkey"] = [r[2] for r in rows]
    head["l_shipdate"] = [r[3] for r in rows]
    head["l_extendedprice"] = [r[4] for r in rows]
    head["l_quantity"] = [r[5] for r in rows]
    head["l_discount"] = [0.04] * len(rows)
    head["l_tax"] = [0.02] * len(rows)
    head["l_returnflag"] = ["R"] * len(rows)
    _append_rows(li, pa.Table.from_pydict(head))


def _contaminate_embeddings(d: str) -> None:
    """Sixth axis (r14, verdict item 4): the similarity/PCA/covariance/
    SemDeDup family had never been swept as a REGISTRY — the r13 sweep
    left embeddings clean on hand-picked-pair reasoning. Clones (fresh
    vec_ids, real labels): a NaN component, a +Inf component, a NULL
    component, an all-zero (zero-norm) vector, a short/ragged vector,
    and a NULL embedding."""
    path = os.path.join(d, "embeddings.parquet")
    tbl = pq.read_table(path)
    dim = len(tbl.column("embedding")[0].as_py())
    max_id = duckdb.sql(f"SELECT max(vec_id) FROM '{path}'").fetchone()[0]
    base = [0.01 * (i % 7) - 0.02 for i in range(dim)]

    def vec(k, v):
        out = list(base)
        out[k] = v
        return out

    vecs = [
        vec(0, float("nan")),
        vec(1, float("inf")),
        vec(2, None),
        [0.0] * dim,
        base[: max(1, dim // 2)],
        None,
    ]
    head = tbl.slice(0, len(vecs)).to_pydict()
    head["vec_id"] = [max_id + 1 + i for i in range(len(vecs))]
    head["embedding"] = vecs
    _append_rows(path, pa.Table.from_pydict(head))


AXES = {
    "value": _contaminate_value,
    "order": _contaminate_order,
    "price": _contaminate_price,
    "price_infilter": _contaminate_price_infilter,
    "price_reach": _contaminate_price_reach,
    "embeddings": _contaminate_embeddings,
}


def run_axis(axis: str, base: str, only: set[str]) -> dict[str, str]:
    import __spark_entry__ as e
    from selfcheck import compare, duck_connection
    from uk_housing_dashboard_etl_spark.session import get_spark

    d = tempfile.mkdtemp(prefix=f"adv_{axis}_")
    _copy_corpus(base, d)
    AXES[axis](d)
    spark = get_spark(app_name=f"adversarial_{axis}")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(d)
    qs, oracles = e.queries(), e.oracle_sql()
    findings: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, d).toPandas()
        except Exception as exc:  # noqa: BLE001 — crash IS the finding
            findings[name] = f"SPARK-CRASH {type(exc).__name__}: {exc}"[:300]
            print(f"FAIL {name}: {findings[name]}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ok "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            findings[name] = f"ORACLE-CRASH {type(exc).__name__}: {exc}"[:300]
            print(f"FAIL {name}: {findings[name]}")
            continue
        problems = compare(sdf, ddf)
        if problems:
            findings[name] = "; ".join(problems)[:300]
            print(f"FAIL {name}: {findings[name]}")
        else:
            print(f"ok   {name} ({time.time()-t0:.1f}s)")
    con.close()
    shutil.rmtree(d, ignore_errors=True)
    return findings


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    base = "/root/testdata/sf0.001"
    only: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--base="):
            base = a.split("=", 1)[1]
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    axes = [a for a in args if a in AXES] or list(AXES)
    all_findings: dict[str, dict[str, str]] = {}
    for axis in axes:
        print(f"=== axis: {axis} ===")
        f = run_axis(axis, base, only)
        if f:
            all_findings[axis] = f
    print("\n=== SUMMARY ===")
    if not all_findings:
        print("CLEAN: no divergence or crash on any axis")
        return 0
    for axis, f in all_findings.items():
        print(f"[{axis}] {len(f)} findings:")
        for name, why in sorted(f.items()):
            print(f"  {name}: {why[:200]}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
