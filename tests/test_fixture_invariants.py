"""Invariants over the DRIVER'S testdata that the oracle contract
leans on (r10, ADVICE r9 item 1).

The shared DuckDB tokenizer macro ``contract._TOKS`` returns NULL token
counts for NULL text while the Spark-side ``_tokens`` coalesces NULL to
zero tokens; the parity boundary is safe exactly as long as
``documents.text`` is never NULL. Rather than documenting that as an
assumption, this test re-reads the actual parquet the driver ships at
EVERY present scale factor each round — if a regenerated corpus ever
gains NULL text, this goes red and the ``_TOKS`` oracles must migrate
to ``_TOKS_NN`` in the same change.
"""

from __future__ import annotations

import os

import duckdb
import pytest

_SF_ROOT = "/root/testdata"
_SF_DIRS = sorted(
    os.path.join(_SF_ROOT, d)
    for d in (os.listdir(_SF_ROOT) if os.path.isdir(_SF_ROOT) else [])
    if d.startswith("sf")
)


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_documents_text_never_null(sf_dir):
    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"no documents table at {sf_dir}")
    n_null = duckdb.sql(
        f"SELECT count(*) FROM '{path}' WHERE text IS NULL"
    ).fetchone()[0]
    assert n_null == 0, (
        f"{path} has {n_null} NULL-text docs: the _TOKS oracle macro "
        "returns NULL token counts for them while Spark's _tokens "
        "returns 0 — migrate the _TOKS oracles to _TOKS_NN (see "
        "contract.py's parity-boundary note) before relying on the "
        "driver gate"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_embeddings_vector_never_null(sf_dir):
    """Same boundary for the ANN family: the cosine/dot oracles fold
    over ``embedding`` positionally and assume non-null vectors (the
    operators filter ``embedding IS NOT NULL`` where they tolerate
    them; the recall-gate oracles do not)."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        pytest.skip(f"no embeddings table at {sf_dir}")
    n_null = duckdb.sql(
        f"SELECT count(*) FROM '{path}' WHERE embedding IS NULL"
    ).fetchone()[0]
    assert n_null == 0, f"{path} has {n_null} NULL embeddings"


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_numeric_columns_are_finite(sf_dir):
    """NaN/Inf parity boundary (r11): cross-engine NaN semantics are
    NOT aligned — Spark groups NaN as equal-to-NaN and sorts it
    greatest, aggregates propagate it, while the DuckDB oracles' window
    percentiles and round4 floor arithmetic degrade differently — so
    the whole float-comparing oracle surface (z-scores, winsorize,
    percentiles, TWAP, embedding math) leans on the driver corpus
    containing only FINITE doubles (NULL is the one sanctioned missing
    marker, and the r10 sweep hardened the operators for it). This
    re-reads the actual parquet at every shipped scale: if a
    regenerated corpus ever gains NaN/Inf, this goes red and each
    family needs an explicit NaN policy (filter-at-read or
    score-as-unknown) landed with oracle parity in the same change."""
    checks = {
        "events.parquet": "isnan(value) OR isinf(value)",
        "lineitem.parquet": (
            "isnan(l_extendedprice) OR isinf(l_extendedprice) "
            "OR isnan(l_discount) OR isinf(l_discount) "
            "OR isnan(l_tax) OR isinf(l_tax)"
        ),
        "orders.parquet": "isnan(o_totalprice) OR isinf(o_totalprice)",
        "embeddings.parquet": (
            "len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0"
        ),
    }
    for table, pred in checks.items():
        path = os.path.join(sf_dir, table)
        if not os.path.exists(path):
            continue
        n_bad = duckdb.sql(
            f"SELECT count(*) FROM '{path}' WHERE {pred}"
        ).fetchone()[0]
        assert n_bad == 0, (
            f"{path} has {n_bad} NaN/Inf rows: the float-comparing "
            "oracle gates assume finite doubles — land a per-family "
            "NaN policy with oracle parity before trusting the gate"
        )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_documents_text_is_ascii(sf_dir):
    """Case-folding parity boundary (r12, promoted to a contract test
    in r13): Java's lower() and DuckDB's utf8proc fold U+0130-class
    codepoints differently — an unfixable engine boundary that is safe
    exactly while documents.text is ASCII. If a regenerated corpus
    gains non-ASCII text this goes red, and the comparison layer's
    casefold_boundary_warning (tools/selfcheck.py) flags the affected
    lower()-derived queries instead of letting them read as unexplained
    regressions."""
    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"no documents table at {sf_dir}")
    n_bad = duckdb.sql(
        f"SELECT count(*) FROM '{path}' "
        "WHERE octet_length(encode(text)) <> length(text)"
    ).fetchone()[0]
    assert n_bad == 0, (
        f"{path} has {n_bad} non-ASCII docs: the Java-vs-utf8proc "
        "case-folding boundary (doc_fingerprint / top_ngrams / "
        "doc_chunks) is now reachable — see SCALE.md's boundary note"
    )


def test_casefold_boundary_warning_fires_on_non_ascii(tmp_path):
    """The comparison layer's guard: silent on an ASCII corpus, loud on
    a corpus carrying the U+0130 class."""
    import sys

    import duckdb as _duck
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo/tools")
    from selfcheck import casefold_boundary_warning

    def corpus(texts, d):
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": list(range(len(texts))),
                    "text": texts,
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        con = _duck.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{os.path.join(d, 'documents.parquet')}'"
        )
        return con

    ascii_dir = str(tmp_path / "ascii")
    con = corpus(["plain ascii", "more ascii"], ascii_dir)
    assert casefold_boundary_warning(con, ascii_dir) is None
    con.close()

    turkish_dir = str(tmp_path / "turkish")
    con = corpus(["plain ascii", "İstanbul doc"], turkish_dir)
    warning = casefold_boundary_warning(con, turkish_dir)
    assert warning is not None and "doc_fingerprint" in warning
    con.close()
