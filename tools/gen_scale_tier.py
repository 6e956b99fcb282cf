"""Deterministic K× amplification of an existing sf tier (r15, VERDICT
r14 item 2: the sf0.1 bench is overhead-dominated — 8 cores beat 32 on
every headline query — so shuffle/skew work is invisible; this builds a
larger tier for a scaling-visibility subset WITHOUT touching the
driver's read-only /root/testdata).

Each copy c in 0..K-1 offsets every PRIMARY key space by c·(max+1) and
remaps the foreign keys that reference it, so referential integrity and
per-entity densities are preserved while entity counts and fact volume
scale by K:

- customer/supplier/part replicate with offset keys (nation/region stay
  fixed — they are bounded reference data at any scale);
- orders/lineitem remap orderkey/custkey/partkey/suppkey and shift
  dates by c weeks (so time-windowed work scales linearly instead of
  stacking K identical timestamps into the same windows);
- events remap event_id/user_id and shift ts by c weeks (stream-stream
  joins stay per-user linear — identical timestamps would have made
  the click×purchase window join grow quadratically in K);
- embeddings remap vec_id and apply a tiny deterministic perturbation
  (±0.1%, rng seeded by the copy index) so the corpus grows K× without
  the identical-vector pathology (exact duplicates would multiply
  near-dup pair counts by K² — not representative of a larger corpus).
  Only copy 0 keeps vec_id < 5, so the registered ANN queries keep
  exactly 5 query vectors against a K× corpus;
- documents copy verbatim (the doc-dedup families are excluded from the
  scale subset precisely because text replication distorts their pair
  volume — see OPTIMIZATION_r15.md).

Pure function of the source tier + K: byte-stable across runs.

Usage: python tools/gen_scale_tier.py SRC_DIR DST_DIR [K]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

WEEK = pd.Timedelta(days=7)


def _read(src: str, name: str) -> tuple[pd.DataFrame, pa.Schema]:
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    return t.to_pandas(), t.schema


def _write(dst: str, name: str, frames: list[pd.DataFrame], schema: pa.Schema) -> None:
    out = pd.concat(frames, ignore_index=True)
    table = pa.Table.from_pandas(out, schema=schema, preserve_index=False)
    pq.write_table(table, os.path.join(dst, f"{name}.parquet"))
    print(f"{name}: {len(out)} rows", flush=True)


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    import shutil

    for fixed in ("nation", "region", "documents"):
        shutil.copyfile(
            os.path.join(src, f"{fixed}.parquet"),
            os.path.join(dst, f"{fixed}.parquet"),
        )

    cust, cust_s = _read(src, "customer")
    supp, supp_s = _read(src, "supplier")
    part, part_s = _read(src, "part")
    orders, orders_s = _read(src, "orders")
    li, li_s = _read(src, "lineitem")
    ev, ev_s = _read(src, "events")
    emb, emb_s = _read(src, "embeddings")

    ck = int(cust["c_custkey"].max()) + 1
    sk = int(supp["s_suppkey"].max()) + 1
    pk = int(part["p_partkey"].max()) + 1
    ok = int(orders["o_orderkey"].max()) + 1
    ek = int(ev["event_id"].max()) + 1
    uk = int(ev["user_id"].max()) + 1
    vk = int(emb["vec_id"].max()) + 1

    def copies(base: pd.DataFrame, fn) -> list[pd.DataFrame]:
        out = []
        for c in range(k):
            d = base.copy()
            fn(d, c)
            out.append(d)
        return out

    _write(dst, "customer", copies(cust, lambda d, c: d.__setitem__(
        "c_custkey", d["c_custkey"] + c * ck)), cust_s)
    _write(dst, "supplier", copies(supp, lambda d, c: d.__setitem__(
        "s_suppkey", d["s_suppkey"] + c * sk)), supp_s)
    _write(dst, "part", copies(part, lambda d, c: d.__setitem__(
        "p_partkey", d["p_partkey"] + c * pk)), part_s)

    def amp_orders(d: pd.DataFrame, c: int) -> None:
        d["o_orderkey"] = d["o_orderkey"] + c * ok
        d["o_custkey"] = d["o_custkey"] + c * ck
        d["o_orderdate"] = d["o_orderdate"] + c * WEEK

    _write(dst, "orders", copies(orders, amp_orders), orders_s)

    def amp_li(d: pd.DataFrame, c: int) -> None:
        d["l_orderkey"] = d["l_orderkey"] + c * ok
        d["l_partkey"] = d["l_partkey"] + c * pk
        d["l_suppkey"] = d["l_suppkey"] + c * sk
        d["l_shipdate"] = d["l_shipdate"] + c * WEEK

    _write(dst, "lineitem", copies(li, amp_li), li_s)

    def amp_ev(d: pd.DataFrame, c: int) -> None:
        d["event_id"] = d["event_id"] + c * ek
        d["user_id"] = d["user_id"] + c * uk
        d["ts"] = d["ts"] + c * WEEK

    _write(dst, "events", copies(ev, amp_ev), ev_s)

    base_vecs = [np.asarray(v, dtype=np.float32) for v in emb["embedding"]]

    def amp_emb(d: pd.DataFrame, c: int) -> None:
        d["vec_id"] = d["vec_id"] + c * vk
        if c:
            rng = np.random.default_rng(c)
            d["embedding"] = [
                (v * (1.0 + rng.uniform(-1e-3, 1e-3, len(v)).astype(
                    np.float32))).astype(np.float32)
                for v in base_vecs
            ]

    _write(dst, "embeddings", copies(emb, amp_emb), emb_s)


if __name__ == "__main__":
    main()
