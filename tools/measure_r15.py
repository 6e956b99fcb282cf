"""r15 optimization-round measurement harness (guide §1).

Per query: best-of-3 timed ``count()`` (the bench's exact methodology,
clean-cache room between runs) plus an optional noop-sink timing
(``df.write.format("noop")`` — times every column of every row, so a
count()-prunable plan can't hide work), and writes
``plans/r15/<query>_<tag>.txt`` with the ``explain("formatted")`` output.

Usage:
    python tools/measure_r15.py [--tag before|after] [--noop] q1 q2 ...
    python tools/measure_r15.py --tag before --all-over 1.0   # every query
        whose BENCH_DETAIL_r14 best time exceeds the threshold
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from uk_housing_dashboard_etl_spark import contract  # noqa: E402
from uk_housing_dashboard_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS = os.path.join(REPO, "plans", "r15")


def release_caches(spark) -> None:
    import gc

    gc.collect()
    spark.catalog.clearCache()
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist()


def explain_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default=None, help="write plans/r15/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true", help="also time the noop sink")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--all-over", type=float, default=None)
    args = ap.parse_args()

    names = list(args.queries)
    if args.all_over is not None:
        detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL_r14.json")))
        names += [
            q
            for q, t in sorted(detail["queries"].items(), key=lambda kv: -kv[1])
            if t >= args.all_over and q not in names
        ]
    if not names:
        ap.error("no queries given")

    spark = get_spark(app_name="measure_r15")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py so first-run numbers mean the same thing
    try:
        contract.QUERIES["coverage_report"](spark, SF_DIR).count()
    except Exception:  # noqa: BLE001
        pass
    if any(n.startswith("streaming_") for n in names):
        try:
            contract.QUERIES["streaming_rate_cap"](spark, SF_DIR).count()
        except Exception:  # noqa: BLE001
            pass
    contract.clear_large_fit_cache()

    os.makedirs(PLANS, exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        fn = contract.QUERIES[name]
        spark.sparkContext.setJobDescription(f"r15:{name}")
        rec: dict = {}
        try:
            samples = []
            for _ in range(args.runs):
                release_caches(spark)
                t0 = time.time()
                fn(spark, SF_DIR).count()
                samples.append(round(time.time() - t0, 3))
            rec["count"] = samples
            rec["best"] = min(samples)
            if args.noop:
                noops = []
                for _ in range(args.runs):
                    release_caches(spark)
                    t0 = time.time()
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    noops.append(round(time.time() - t0, 3))
                rec["noop"] = noops
            if args.tag:
                txt = explain_text(fn(spark, SF_DIR))
                with open(
                    os.path.join(PLANS, f"{name}_{args.tag}.txt"), "w"
                ) as f:
                    f.write(txt)
                rec["plan_exchanges"] = txt.count("Exchange")
                rec["plan_python"] = (
                    txt.count("ArrowEvalPython")
                    + txt.count("BatchEvalPython")
                    + txt.count("MapInPandas")
                    + txt.count("FlatMapGroupsInPandas")
                )
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
        spark.sparkContext.setJobDescription(None)

    print("==SUMMARY==")
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
