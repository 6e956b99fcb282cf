"""The rotation staleness engine (tools/rotation.py) is load-bearing:
tests/test_registry.py trusts it to say which queries must re-enter the
driver window. If the tracer silently broke (empty closures, missed
imports), that test would pass vacuously — these tests pin the tracer's
actual detection power on both synthetic sources and the live repo."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import rotation
from tools.rotation import PKG, _ModuleInfo


def _mod(name: str, src: str) -> _ModuleInfo:
    return _ModuleInfo(f"{PKG}.{name}", src)


# ----------------------------------------------------- pure unit level


def test_module_units_and_normalization():
    a = _mod("m", "X = 1\n\ndef f(y):\n    # a comment\n    return X + y\n")
    b = _mod("m", "X = 1\n\ndef f(y):\n    return X + y  # other comment\n")
    # comment/formatting differences must NOT read as changes
    assert a.units["f"] == b.units["f"]
    assert a.units["X"] == b.units["X"]
    c = _mod("m", "X = 2\n\ndef f(y):\n    return X + y\n")
    assert a.units["X"] != c.units["X"]


def test_relative_import_resolution():
    info = _mod(
        "operators.demo",
        "from ..functions.rounding import round4\n",
    )
    assert info.imports["round4"] == (
        f"{PKG}.functions.rounding",
        "round4",
    )


def test_resolve_follows_reexport_chain():
    mods = rotation._modules(None)
    # contract imports qa_metrics from the operators package __init__,
    # which re-exports it from operators.snapshot
    tgt = rotation._resolve(mods, f"{PKG}.operators", "qa_metrics")
    assert tgt is not None and tgt[0].endswith(".snapshot")


# ------------------------------------------------- live-repo tracing


def test_closure_reaches_function_local_imports():
    """q_mg_heavy_hitters imports its operator INSIDE the function body;
    round-8 found the tracer originally missed exactly this and
    under-reported staleness."""
    from uk_housing_dashboard_etl_spark import contract

    fn = contract.QUERIES["mg_heavy_hitters"]
    cl = rotation._closure(fn.__module__, fn.__qualname__.split(".")[0])
    assert (f"{PKG}.operators.sketches", "mg_heavy_hitters") in cl


def test_closure_reaches_shared_helpers_transitively():
    from uk_housing_dashboard_etl_spark import contract

    fn = contract.QUERIES["similarity_pq"]
    cl = rotation._closure(fn.__module__, fn.__qualname__.split(".")[0])
    mods = {m for m, _ in cl}
    assert f"{PKG}.operators.pq" in mods
    # the fit-cache helpers inside contract itself must be reachable
    assert (f"{PKG}.contract", "_cached_fit") in cl


def test_every_registered_query_has_nonempty_closure():
    """An empty closure means the tracer lost the query root — the
    failure mode that would make the window test vacuous."""
    from uk_housing_dashboard_etl_spark import contract

    for name, fn in contract.QUERIES.items():
        root = fn.__qualname__.split(".")[0]
        cl = rotation._closure(fn.__module__, root)
        assert (fn.__module__, root) in cl, name
        # every contract query reads at least one table or helper
        assert len(cl) >= 2, f"{name}: suspiciously bare closure {cl}"


def test_oracle_snapshots_exist_for_every_verified_round():
    verified = rotation.last_verified()
    for r in sorted(set(verified.values()) - {0}):
        assert rotation._snapshot(r), r


def test_unchanged_queries_are_not_flagged():
    """Sanity: the required set must stay a small subset — flagging
    everything would burn the window; flagging nothing after this
    round's edits would mean detection is broken."""
    req = rotation.required_in_window()
    from uk_housing_dashboard_etl_spark import contract

    assert 0 < len(req) < len(contract.QUERIES) // 2
    # round-8 ground truth: simjoin.py was rewritten this round, so
    # simjoin_prefix must be flagged until a CORRECTNESS row covers it
    verified = rotation.last_verified()
    if verified["simjoin_prefix"] <= 7:
        assert "simjoin_prefix" in req
