"""Pure-python tests for the bench harness plumbing (no Spark): the
round-stamped detail filename must track the driver's BENCH_r{NN}.json
records, because a mis-stamped file would make the official per-query
record ambiguous."""

from __future__ import annotations

import importlib
import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return importlib.reload(bench)


def test_next_round_tracks_existing_bench_records(tmp_path, monkeypatch):
    bench = _bench()
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    assert bench.next_round() == 1
    (tmp_path / "BENCH_r01.json").write_text("{}")
    (tmp_path / "BENCH_r03.json").write_text("{}")
    assert bench.next_round() == 4
    # stray non-record files never confuse the stamp
    (tmp_path / "BENCH_DETAIL_r09.json").write_text("{}")
    (tmp_path / "BENCH_random.json").write_text("{}")
    assert bench.next_round() == 4


def test_headline_queries_exist_in_registry():
    bench = _bench()
    from uk_housing_dashboard_etl_spark import contract

    for q in bench.HEADLINE:
        assert q in contract.QUERIES and q in contract.ORACLES


def test_calibration_probe_returns_positive_seconds(spark):
    """Round-8: the ambient-speed probe must be cheap, deterministic in
    shape (pure generated data), and return a plausible wall-time."""
    bench = _bench()
    t = bench.calibration_probe(spark)
    assert 0.0 < t < 60.0


def test_calnorm_divides_out_ambient_speed():
    """The r12 noise-robust headline: a run whose synthetic probe reads
    2x the reference must report half its raw total, and a run at the
    reference probe reports the raw total unchanged."""
    bench = _bench()
    assert bench.calnorm(100.0, bench.CALIBRATION_REF) == 100.0
    assert bench.calnorm(100.0, 2 * bench.CALIBRATION_REF) == 50.0
    # normalized totals of two runs of the same tree under different
    # ambient speeds agree: (raw, probe) pairs that differ only by a
    # common ambient factor normalize to the same number
    assert bench.calnorm(173.2, 0.484 * (173.2 / 156.3)) == bench.calnorm(
        156.3, 0.484
    )
