#!/usr/bin/env python3
"""Scale sf0.1 testdata 10x into an sf1 directory for the PERF.md scaling
measurement (driver-side tooling, like local_verify.py — NOT part of the
engine).

Method: replicate every fact table 10 times with key-domain offsets that
preserve referential integrity (copy k's orders reference copy k's
customers, etc). Non-key attributes are kept verbatim, so value
distributions, selectivities and skew are unchanged — the 10x run measures
plan scaling, not distribution drift. The fixed-size dimension tables
(region, nation) are NOT replicated, exactly like TPC-H scaling.

Key domains and their foreign-key propagation:
  customer.c_custkey   -> orders.o_custkey
  orders.o_orderkey    -> lineitem.l_orderkey
  part.p_partkey       -> lineitem.l_partkey
  supplier.s_suppkey   -> lineitem.l_suppkey
  documents.doc_id     -> embeddings.vec_id (the doc_id = vec_id join key)
  events.event_id / user_id: both offset (more users at constant per-user
  volume — the realistic high-throughput shape; window density grows 10x)

Deterministic: pure arithmetic on the source rows, no RNG.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10  # default; override with argv[3] (e.g. 3 for the sf10 -> sf30 leg)


def stride_of(table: pa.Table, col: str) -> int:
    return pc.max(table.column(col)).as_py() + 1


def replicate(table: pa.Table, offsets: dict) -> pa.Table:
    """Concatenate COPIES copies of `table`, adding k*stride to each listed
    key column in copy k."""
    parts = []
    for k in range(COPIES):
        cols = {}
        for name in table.column_names:
            c = table.column(name)
            if name in offsets and k > 0:
                c = pc.add(c, k * offsets[name])
            cols[name] = c
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    t = {
        name: pq.read_table(os.path.join(src, f"{name}.parquet"))
        for name in [
            "region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings",
        ]
    }
    cust = stride_of(t["customer"], "c_custkey")
    supp = stride_of(t["supplier"], "s_suppkey")
    part = stride_of(t["part"], "p_partkey")
    okey = stride_of(t["orders"], "o_orderkey")
    doc = stride_of(t["documents"], "doc_id")
    evt = stride_of(t["events"], "event_id")
    user = stride_of(t["events"], "user_id")

    out = {
        "region": t["region"],
        "nation": t["nation"],
        "customer": replicate(t["customer"], {"c_custkey": cust}),
        "supplier": replicate(t["supplier"], {"s_suppkey": supp}),
        "part": replicate(t["part"], {"p_partkey": part}),
        "orders": replicate(t["orders"], {"o_orderkey": okey, "o_custkey": cust}),
        "lineitem": replicate(t["lineitem"], {
            "l_orderkey": okey, "l_partkey": part, "l_suppkey": supp}),
        "events": replicate(t["events"], {"event_id": evt, "user_id": user}),
        "documents": replicate(t["documents"], {"doc_id": doc}),
        # vec_id rides the DOC stride so doc_id = vec_id stays aligned
        "embeddings": replicate(t["embeddings"], {"vec_id": doc}),
    }
    for name, table in out.items():
        pq.write_table(table, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    if len(sys.argv) > 3:
        COPIES = int(sys.argv[3])
    main(src, dst)
