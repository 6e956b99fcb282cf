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
