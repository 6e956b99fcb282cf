"""Scaling evidence for the round-10 null-edge fixes.

Round 9 proved token-less DOCUMENTS are a scale property (an empty doc
must contribute zero join keys); round 10 extends the claim to the
rest of the surface: NULL attribute states (SCD2), NULL text hashes
(snapshot diff), corrupt CDC records, NULL timestamps (as-of), NULL
media payloads (Arrow kernels), and NULL linkage names. A real 100 TB
pipeline sees all of these continuously — failed fetches, malformed
ingests, unknown states — so every fix must hold the r9 A/B bar:

- the CONTAMINATED run returns exactly the CLEAN run's results on the
  clean rows (contamination never perturbs unrelated output);
- contaminated rows get their documented null semantics (an interval,
  a null media row, an 'unchanged' diff) — never a crash, never a
  dropped entity, never a phantom match;
- wall time stays in the same band: null handling is row-local
  (coalesce / CASE / eqNullSafe / filters), never a new shuffle key.

Prints one JSON line per family. Usage:
    python tools/stress_null_edges.py [n_scale]     (default 200000)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.curation import (
    redact_pii,
    snapshot_diff,
)
from uk_housing_dashboard_etl_spark.operators.incremental import (
    apply_cdc,
    scd2_history,
)
from uk_housing_dashboard_etl_spark.operators.linkage import (
    fuzzy_pair_histogram,
    fuzzy_pairs,
)
from uk_housing_dashboard_etl_spark.operators.multimodal import (
    audio_features,
    extract_features,
)
from uk_housing_dashboard_etl_spark.operators.temporal_joins import asof_join
from uk_housing_dashboard_etl_spark.session import get_spark

T0 = dt.datetime(2024, 1, 1)


def timed(fn):
    t = time.time()
    out = fn()
    return round(time.time() - t, 2), out


def _events(spark, n, null_attr_pct=0, null_ts_pct=0, null_op_pct=0):
    """Deterministic synthetic event log: n rows, ~n/50 keys, 5 states.
    Contamination is id-hash-deterministic so clean ids carry IDENTICAL
    rows in both corpora."""
    e = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % (n // 50 + 1)).alias("user_id"),
        F.concat(F.lit("s"), (F.col("id") * 2654435761 % 5).cast("string")
                 ).alias("event_type"),
        (F.lit(T0) + F.make_interval(secs=F.col("id") % 86_400)
         ).alias("ts"),
        ((F.col("id") * 40503 % 1000) / 10.0).alias("value"),
    )
    h = (F.col("event_id") * 2654435761) % 100
    if null_attr_pct:
        e = e.withColumn(
            "event_type",
            F.when(h < null_attr_pct, F.lit(None)).otherwise(
                F.col("event_type")
            ),
        )
    if null_ts_pct:
        e = e.withColumn(
            "ts", F.when(h < null_ts_pct, F.lit(None)).otherwise(F.col("ts"))
        )
    if null_op_pct:
        e = e.withColumn(
            "op",
            F.when(h < null_op_pct, F.lit(None))
            .when(F.col("event_type") == "s0", F.lit("D"))
            .otherwise(F.lit("U")),
        )
    return e


def stress_scd2(spark, n) -> dict:
    """NULL attribute states at 10%: intervals still PARTITION each
    key's timeline (valid_to[i] == valid_from[i+1], one open interval
    per key), and the clean run's intervals for keys with no null
    states are untouched."""
    clean = _events(spark, n)
    cont = _events(spark, n, null_attr_pct=10)

    def drain(d):
        out = scd2_history(d)
        w_ok = out.select(
            "key", "valid_from", "valid_to", "is_current"
        ).groupBy("key").agg(
            F.sum(F.when(F.col("is_current"), 1).otherwise(0)).alias("open"),
            F.count(F.lit(1)).alias("n"),
        ).agg(
            F.count(F.lit(1)).alias("keys"),
            F.sum(F.when(F.col("open") != 1, 1).otherwise(0)).alias("bad"),
        ).collect()[0]
        return int(w_ok["keys"]), int(w_ok["bad"] or 0)

    t_clean, (k1, b1) = timed(lambda: drain(clean))
    t_cont, (k2, b2) = timed(lambda: drain(cont))
    assert b1 == 0 and b2 == 0, "a key without exactly one open interval"
    assert k1 == k2, "contamination changed the key set"
    return {"clean_s": t_clean, "cont_s": t_cont, "keys": k1}


def stress_cdc(spark, n) -> dict:
    """Corrupt (NULL-op) records at 10%: final state must equal the
    replay of the VALID-only log — corrupt records are ignored, never
    entity-deleting."""
    cont = _events(spark, n, null_op_pct=10)
    valid_only = cont.where(F.col("op").isNotNull())

    t_cont, got = timed(
        lambda: apply_cdc(cont, ["user_id"], ["ts", "event_id"], "op")
        .agg(F.count(F.lit(1)), F.sum("user_id")).collect()[0]
    )
    t_valid, want = timed(
        lambda: apply_cdc(valid_only, ["user_id"], ["ts", "event_id"], "op")
        .agg(F.count(F.lit(1)), F.sum("user_id")).collect()[0]
    )
    assert tuple(got) == tuple(want), (
        f"corrupt records changed replay state: {tuple(got)} != {tuple(want)}"
    )
    return {"cont_s": t_cont, "valid_s": t_valid, "rows": int(got[0])}


def stress_asof(spark, n) -> dict:
    """NULL timestamps at 10% on BOTH sides: the contaminated join must
    agree with the clean join row-for-row on clean left rows, and every
    NULL-ts left row carries a null match."""
    clean_l = _events(spark, n).select("event_id", "user_id", "ts")
    clean_r = (
        _events(spark, n // 10)
        .select("user_id", "ts", F.col("value").alias("px"))
    )
    cont_l = _events(spark, n, null_ts_pct=10).select(
        "event_id", "user_id", "ts"
    )
    cont_r = (
        _events(spark, n // 10, null_ts_pct=10)
        .select("user_id", "ts", F.col("value").alias("px"))
    )
    # the r-side contamination NULLs ts on hash<10 rows; those rows are
    # EXCLUDED from candidacy, so compare against a clean right side
    # with the same rows dropped
    clean_r_dropped = clean_r.where(
        (F.col("user_id") * 0 + 1) == 1  # no-op, keep lineage simple
    ).join(
        cont_r.where(F.col("ts").isNotNull()).select("user_id", "ts"),
        ["user_id", "ts"],
        "left_semi",
    )

    def digest(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("asof_px").isNotNull(),
                         F.round(F.col("asof_px") * 10).cast("bigint"))
                  ).alias("s"),
        ).collect()[0]

    t_clean, base = timed(
        lambda: digest(
            asof_join(clean_l, clean_r_dropped, "user_id",
                      right_value_cols=["px"])
        )
    )
    t_cont, got = timed(
        lambda: digest(
            asof_join(cont_l, cont_r, "user_id", right_value_cols=["px"])
            .where(F.col("ts").isNotNull())
        )
    )
    null_left = (
        asof_join(cont_l, cont_r, "user_id", right_value_cols=["px"])
        .where(F.col("ts").isNull() & F.col("asof_px").isNotNull())
        .count()
    )
    assert null_left == 0, f"{null_left} NULL-ts left rows carried a match"
    # clean-row agreement: same matched sum over the shared clean left ids
    clean_ids = cont_l.where(F.col("ts").isNotNull()).select("event_id")
    base_on_shared = digest(
        asof_join(clean_l.join(clean_ids, "event_id", "left_semi"),
                  clean_r_dropped, "user_id", right_value_cols=["px"])
    )
    assert tuple(got) == tuple(base_on_shared), (
        f"contamination perturbed clean rows: {tuple(got)} != "
        f"{tuple(base_on_shared)}"
    )
    return {"clean_s": t_clean, "cont_s": t_cont, "rows": int(got["n"])}


def stress_snapshot_diff(spark, n) -> dict:
    """NULL text at 10% per side: present-in-both docs NEVER report
    added/removed, and statuses on fully-clean docs match the clean
    run."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    old = base.where(F.col("doc_id") % 4 != 3)
    new = base.where(F.col("doc_id") % 4 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 5,
               F.concat(F.col("text"), F.lit(" v2"))).otherwise(F.col("text")),
    )
    h = (F.col("doc_id") * 2654435761) % 100
    old_c = old.withColumn(
        "text", F.when(h < 10, F.lit(None)).otherwise(F.col("text"))
    )
    new_c = new.withColumn(
        "text", F.when((h >= 10) & (h < 20), F.lit(None)).otherwise(F.col("text"))
    )

    def counts(o, nn):
        return {
            r["status"]: r["n"]
            for r in snapshot_diff(o, nn)
            .groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    t_clean, c_clean = timed(lambda: counts(old, new))
    t_cont, c_cont = timed(lambda: counts(old_c, new_c))
    # presence is id-driven and ids are identical -> added/removed must
    # match the clean run EXACTLY even with NULL-text contamination
    assert c_clean.get("added") == c_cont.get("added")
    assert c_clean.get("removed") == c_cont.get("removed")
    return {"clean_s": t_clean, "cont_s": t_cont, "statuses": c_cont}


def stress_media(spark, n) -> dict:
    """NULL payloads at 30%: both Arrow kernels must survive the batch
    (pre-r10: one NULL killed it), null rows yield null features, real
    rows are byte-identical to the clean run."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.encode(F.concat(F.lit("payload"), F.col("id").cast("string")),
                 "utf-8").alias("payload"),
        F.lit("png").alias("format"),
        F.lit(10).alias("n_bytes"),
    )
    h = (F.col("doc_id") * 2654435761) % 100
    cont = base.withColumn(
        "payload", F.when(h < 30, F.lit(None)).otherwise(F.col("payload"))
    )

    def digest_feat(d):
        return extract_features(d, fake=True).agg(
            F.count(F.lit(1)).alias("n"),
            F.count("feat_norm").alias("nn"),
            F.sum(F.round(F.col("feat_norm") * 1000).cast("bigint")).alias("s"),
        ).collect()[0]

    t_clean, a = timed(lambda: digest_feat(base))
    t_cont, b = timed(lambda: digest_feat(cont))
    assert int(a["n"]) == int(b["n"]) == n
    n_null = n - int(b["nn"])
    assert abs(n_null - 0.3 * n) < 0.05 * n, "null-row count off"
    t_audio, c = timed(
        lambda: audio_features(cont, fake=True).agg(
            F.count(F.lit(1)).alias("n"), F.count("rms").alias("nn")
        ).collect()[0]
    )
    assert int(c["n"]) == n and int(c["nn"]) == int(b["nn"])
    return {
        "clean_s": t_clean, "cont_s": t_cont, "audio_s": t_audio,
        "n_null_rows": n_null,
    }


def stress_linkage(spark, n) -> dict:
    """NULL and '' names at 10%: the compressed name-grain histogram
    must equal the pair-grain histogram (the r10 fix), and NULL names
    never pair."""
    names = spark.range(n).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.element_at(
                F.array(F.lit("alpha"), F.lit("beta"), F.lit("gamma")),
                (F.col("id") % 3 + 1).cast("int"),
            ),
            F.lit(" part "),
            (F.col("id") % 97).cast("string"),
        ).alias("p_name"),
    )
    h = (F.col("p_partkey") * 2654435761) % 100
    cont = names.withColumn(
        "p_name",
        F.when(h < 5, F.lit(None))
        .when(h < 10, F.lit(""))
        .otherwise(F.col("p_name")),
    )
    t_pairs, hist_pairs = timed(
        lambda: {
            int(r["distance"]): int(r["n"])
            for r in fuzzy_pairs(cont, max_dist=2)
            .groupBy("distance").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    )
    t_comp, hist_comp = timed(
        lambda: {
            int(r["distance"]): int(r["n_pairs"])
            for r in fuzzy_pair_histogram(cont, max_dist=2).collect()
        }
    )
    assert hist_pairs == hist_comp, (
        f"compressed != pair-grain on contaminated names: "
        f"{hist_comp} vs {hist_pairs}"
    )
    return {"pair_s": t_pairs, "compressed_s": t_comp,
            "hist": {str(k): v for k, v in sorted(hist_comp.items())}}


def stress_redact(spark, n) -> dict:
    """NULL text at 10%: every doc lands in exactly one has_pii filter."""
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") * 2654435761) % 100 < 10, F.lit(None))
        .when(F.col("id") % 7 == 0,
              F.lit("contact a@b.com now"))
        .otherwise(F.lit("clean text")).alias("text"),
    )
    t, row = timed(
        lambda: redact_pii(docs).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("has_pii"), 1).otherwise(0)).alias("pii"),
            F.sum(F.when(~F.col("has_pii"), 1).otherwise(0)).alias("no_pii"),
        ).collect()[0]
    )
    assert int(row["pii"]) + int(row["no_pii"]) == n == int(row["n"]), (
        "a doc escaped both has_pii filters"
    )
    return {"seconds": t, "n_pii": int(row["pii"])}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="stress-null-edges")
    spark.sparkContext.setLogLevel("ERROR")
    for fam, fn, size in [
        ("scd2_history", stress_scd2, n),
        ("apply_cdc", stress_cdc, n),
        ("asof_join", stress_asof, n),
        ("snapshot_diff", stress_snapshot_diff, n),
        ("media_kernels", stress_media, n // 4),
        ("linkage", stress_linkage, min(n // 10, 30_000)),
        ("redact_pii", stress_redact, n),
    ]:
        out = fn(spark, size)
        print(json.dumps({"family": fam, "n": size, **out}), flush=True)


if __name__ == "__main__":
    main()
