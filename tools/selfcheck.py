"""Self-check harness mimicking the driver's t2 correctness gate.

For every query in ``__spark_entry__.queries()`` with an oracle: run the
Spark query and the DuckDB oracle at the given sf, then compare row count,
sorted column names, and an order-insensitive value comparison (columns
sorted by name, rows sorted by all columns, exact equality on the already-
rounded values). Queries without an oracle get a rows-only report.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


# queries whose hashed columns derive from lower()-folded document
# text: Java's Locale-independent lower() and DuckDB's utf8proc fold
# U+0130 (LATIN CAPITAL LETTER I WITH DOT ABOVE, and a handful of other
# special-casing codepoints) DIFFERENTLY — a documented, unfixable
# engine boundary (SCALE.md r12), safe exactly while the corpus is
# ASCII. This layer warns rather than letting a regenerated corpus
# silently convert the documented boundary into unexplained failures.
CASEFOLD_BOUNDARY_QUERIES = ("doc_fingerprint", "top_ngrams", "doc_chunks")


def casefold_boundary_warning(con, sf_dir: str) -> str | None:
    """Return a warning string when documents.text carries non-ASCII
    (the regime where lower()-derived hash columns may legitimately
    diverge between engines), else None."""
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        return None
    # non-ASCII iff the UTF-8 byte length exceeds the codepoint count
    n = con.sql(
        "SELECT count(*) FROM documents"
        " WHERE octet_length(encode(text)) <> length(text)"
    ).fetchone()[0]
    if not n:
        return None
    return (
        f"WARNING: {n} non-ASCII documents in {sf_dir} — the Java-vs-"
        "utf8proc case-folding boundary (U+0130 class) is now REACHABLE;"
        " treat value mismatches on "
        + ", ".join(CASEFOLD_BOUNDARY_QUERIES)
        + " as the documented engine boundary, not a regression"
        " (SCALE.md: case-folding boundary)"
    )


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            # a SQL NULL in an object column surfaces as None from
            # Spark's toPandas but NaN from DuckDB's .df() — same
            # value, different pandas spelling; normalize BEFORE the
            # string compare (seen live: NULL boolean flags in the
            # r12 NaN/Inf fuzz). The sentinel is a private-use Unicode
            # char no real data carries (r12 advice item 4: the old
            # "<NULL>" literal could collide with a genuine string and
            # silently equate a SQL NULL with that value).
            na = out[c].isna()
            out[c] = out[c].astype(str)
            out.loc[na, c] = "NULL"
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} != {len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
        )
        return problems
    if problems:
        return problems
    # dtype probe: the driver's value hash is dtype-sensitive — an
    # int64 vs float64 column (DuckDB HUGEINT → float64) or a Spark
    # DECIMAL (object of decimal.Decimal) vs a double oracle flips the
    # hash even when the values are numerically equal (seen live in
    # CORRECTNESS_r04: sql_weekly_by_la, ks_values, ab_ztest). Treat a
    # numeric KIND mismatch, a Decimal-bearing object column paired
    # with a numeric oracle column, OR an integer/float same-kind WIDTH
    # mismatch (int32 vs int64 — the repo convention is to CAST both
    # engines to the same width) as hard failures; only datetime/
    # timedelta width diffs (ns vs us) remain warnings, which the
    # driver's canonicalizer normalizes.
    import decimal

    for c in sorted(spark_pdf.columns):
        da, db = spark_pdf[c].dtype, duck_pdf[c].dtype
        sa, sb = str(da), str(db)
        ka, kb = da.kind, db.kind
        if ka == "O" and len(spark_pdf) and any(
            isinstance(v, decimal.Decimal)
            for v in spark_pdf[c].dropna().head(5)
        ):
            problems.append(
                f"column {c}: Spark emits DECIMAL objects (oracle dtype "
                f"{sb}) — cast the Spark side to DOUBLE/BIGINT"
            )
            continue
        if kb == "O" and len(duck_pdf) and any(
            isinstance(v, decimal.Decimal)
            for v in duck_pdf[c].dropna().head(5)
        ):
            problems.append(
                f"column {c}: oracle emits DECIMAL objects (spark dtype "
                f"{sa}) — cast the oracle side to DOUBLE/BIGINT"
            )
            continue
        if ka != kb and "O" not in (ka, kb):
            if {ka, kb} <= {"i", "u"} or {ka, kb} <= {"M", "m"}:
                print(f"  [dtype-warn] {c}: spark={sa} duck={sb}")
            else:
                problems.append(
                    f"column {c}: dtype kind mismatch spark={sa} "
                    f"duck={sb} — driver value-hash will differ"
                )
        elif sa != sb and ka in ("i", "u", "f") and kb in ("i", "u", "f"):
            # same kind, different WIDTH (int32 vs int64): the repo
            # convention is to CAST both engines to the same width
            # (grouping_sets gid, top_ngrams rank) — treat drift as a
            # failure so new queries keep the discipline
            problems.append(
                f"column {c}: dtype width mismatch spark={sa} duck={sb}"
                " — CAST one side to match"
            )
        elif sa != sb and "O" not in (ka, kb):
            print(f"  [dtype-warn] {c}: spark={sa} duck={sb}")
    if problems:
        return problems
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            import numpy as np

            x, y = av.astype(float).to_numpy(), bv.astype(float).to_numpy()
            # BIT-EXACT: the driver hashes values, so 1-ulp drift fails there
            ok = ((x == y) | (np.isnan(x) & np.isnan(y))).all()
        else:
            ok = (av.astype(str) == bv.astype(str)).all()
        if not ok:
            bad = (av.astype(str) != bv.astype(str))
            idx = bad[bad].index[:3].tolist()
            problems.append(
                f"column {c} mismatch at rows {idx}: "
                f"spark={av.iloc[idx[0]]!r} duck={bv.iloc[idx[0]]!r}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from uk_housing_dashboard_etl_spark.session import get_spark

    spark = get_spark(app_name="selfcheck")
    con = duck_connection(sf_dir)
    boundary = casefold_boundary_warning(con, sf_dir)
    if boundary:
        print(boundary)
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows):")
            for p in problems:
                print(f"   - {p}")
        else:
            print(f"OK   {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
