"""Registry-wide invariants over ``contract.QUERIES``.

The driver's correctness harness canonicalizes every registered query's
output with a pandas sort-and-hash over ALL columns; array/map cells are
unhashable there (round-2 ERR on multimodal_decode/features). These tests
pin the fix: no top-level registered query may expose ArrayType/MapType
(or BinaryType, equally unsortable) columns — digest them instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, BinaryType, MapType

from uk_housing_dashboard_etl_spark import contract

# Streaming queries EXECUTE inside the builder (awaitTermination before
# returning); their scalar-only schemas are asserted separately in
# test_streaming.py, so the lazy schema sweep here skips them.
_LAZY = [n for n in contract.QUERIES if not n.startswith("streaming_")]


@pytest.mark.parametrize("name", _LAZY)
def test_no_unhashable_columns(spark, sf_small, name):
    schema = contract.QUERIES[name](spark, sf_small).schema
    offending = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, BinaryType))
    ]
    assert not offending, (
        f"{name} exposes driver-unhashable columns {offending}; project "
        "them to md5/to_json digests before registering"
    )


def test_oracle_keys_subset_of_queries():
    extra = set(contract.ORACLES) - set(contract.QUERIES)
    assert not extra, f"oracles without a registered query: {sorted(extra)}"


def test_rotation_window_covers_new_and_stale():
    """Round-8 rule (VERDICT r7 item 3), enforced MECHANICALLY: any
    query whose implementing code (static call-graph closure), oracle
    SQL, or registered binding changed since the round-close commit of
    its last green CORRECTNESS row MUST sit inside the ~50-slot driver
    window — a green row against old code is not a green row. Never-
    verified queries likewise. tools/rotation.py computes the required
    set from git + the committed per-round oracle snapshots, so ANY
    code change that stales a verified query breaks this test until the
    query re-enters the window (or the window overflows, in which case
    the window must be spent entirely on required + oldest names)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools import rotation

    order = list(contract.QUERIES)
    window = set(order[:50])
    required = rotation.required_in_window()
    missing = set(required) - window
    assert not missing, (
        f"queries with changed code/oracle (or never verified) outside "
        f"the driver window: "
        f"{sorted((n, required[n]) for n in missing)} — re-run the "
        f"rotation (tools/rotation.py) and update _R10_FRONT"
    )
    # the declared front/queue ordering must be applied verbatim
    assert order[: len(contract._R10_FRONT)] == contract._R10_FRONT
    n_front = len(contract._R10_FRONT)
    assert (
        order[n_front : n_front + len(contract._R10_QUEUE)]
        == contract._R10_QUEUE
    )
    # non-required window slots must go to the OLDEST-verified queries:
    # nothing outside the window+queue may be older than a fill slot
    verified = rotation.last_verified()
    fill_rounds = [
        verified[n] for n in order[:50] if n not in required
    ]
    outside = [
        verified[n]
        for n in order[50 + len(contract._R10_QUEUE) :]
        if n not in required
    ]
    if fill_rounds and outside:
        assert max(fill_rounds) <= min(outside), (
            "window fill is not the oldest-verified set: "
            f"fill max r{max(fill_rounds)} > outside min r{min(outside)}"
        )


def test_fit_salt_covers_or_pins_every_traced_dependency():
    """Round-8 advice (medium): _fit_code_salt hashes only the directly
    named modules, so an edit to a TRANSITIVE dependency (e.g.
    similarity.norm_expr under pq_encode, functions/rounding under
    ngram_jaccard_pairs) changes on-disk artifact contents WITHOUT
    changing the salt — the parquet fit cache would then serve stale
    truth sets/codes, and the rotation's re-verification would run
    against the stale artifact and green-light old code.

    The in-package fix (derive the salt from the traced closure) stales
    the whole PQ/IVF family and cannot fit the already-full r9 window;
    it is queued for r10. MEANWHILE this tripwire makes the risk loud
    instead of silent: the traced closure of every fit builder must be
    covered by its salt modules, and any module the salt does NOT cover
    must be byte-identical to the r9-close state pinned here. Editing
    an unsalted dependency turns this red, forcing either the salt fix
    or a cache clear in the same change.
    """
    import hashlib
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    from tools import rotation

    PKG = "uk_housing_dashboard_etl_spark"
    DEFAULT_SALT = {f"{PKG}.operators.pq", f"{PKG}.operators.ivf"}
    # builder root -> salt modules actually passed at the call site
    builders = {
        (f"{PKG}.operators.pq", "pq_encode"): DEFAULT_SALT,
        (f"{PKG}.operators.ivf", "ivf_index"): DEFAULT_SALT,
        (f"{PKG}.operators.pq", "ivfpq_residual_build"): DEFAULT_SALT,
        (f"{PKG}.operators.dedup", "ngram_jaccard_pairs"): {
            f"{PKG}.operators.dedup"
        },
        (f"{PKG}.operators.similarity", "embedding_near_dup"): {
            f"{PKG}.operators.similarity"
        },
    }
    # unsalted dependencies as of the r9 close — md5 of the exact bytes
    # the current on-disk artifacts were built from
    pinned = {
        f"{PKG}.operators.similarity": "657c8798045ce36b00863392fb1e76b6",
        f"{PKG}.functions.topk": "77cbd9010b693a25312c3009c8a1a3e7",
        f"{PKG}.functions.rounding": "e30f63ad2c86b8296c8d0689a8361976",
    }
    for (mod, unit), salt in builders.items():
        closure_mods = {m for m, _ in rotation._closure(mod, unit)}
        for dep in sorted(closure_mods - salt):
            assert dep in pinned, (
                f"{mod}.{unit} gained an UNSALTED dependency {dep}: add it "
                "to the call site's salt_mods (or land the r10 traced-salt "
                "fix) before relying on cached fit artifacts"
            )
            path = repo / (dep.replace(".", "/") + ".py")
            got = hashlib.md5(path.read_bytes()).hexdigest()
            assert got == pinned[dep], (
                f"{dep} changed but is NOT covered by the fit-cache salt "
                f"of {mod}.{unit}: cached PQ/IVF/truth-set artifacts would "
                "be served stale. Either add the module to salt_mods at "
                "the _cached_fit_large call sites (stales the ANN family "
                "into the next rotation window) or implement the traced-"
                "closure salt (r10 plan), then refresh this pin."
            )
