"""Build a local 10x scale-up of sf0.1 for optimization-round measurement.

The driver's own sf1.0 is generated on its side and removed afterwards
(BENCH_r05.json records "sf": "/root/testdata/sf1.0"); this script makes a
distribution-preserving stand-in so before/after timings can be captured at
the driver's measurement scale. NOT driver data — never used by tests or
the correctness gate; replicas live in disjoint key namespaces:

* fact/dim tables: key columns shifted by replica * (max_key + 1), so join
  fan-out per key is identical to sf0.1 and cardinalities scale 10x;
* events: user_id and event_id shifted the same way (per-key event count
  preserved);
* documents: every token gets a replica-unique prefix, so within-replica
  near-dup structure is identical to sf0.1 and no cross-replica LSH pairs
  appear (pair count scales ~10x, not quadratically);
* embeddings: one dimension perturbed per replica (no exact cross-replica
  duplicate vectors).

Usage: python tools/make_sf1x.py [--out /root/sf1x] [--reps 10]
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}
COPY_TABLES = ["nation", "region"]


def scale_table(name: str, reps: int, out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    shifts = {}
    for c in SHIFT_COLS.get(name, []):
        col = t.column(c)
        shifts[c] = int(pc.max(col).as_py()) + 1
    batches = []
    for r in range(reps):
        cols = []
        for c in t.column_names:
            col = t.column(c)
            if c in shifts:
                col = pc.add(col, r * shifts[c])
            elif name == "documents" and c == "text" and r > 0:
                txt = col.to_pylist()
                pref = f"r{r}"
                col = pa.array(
                    [None if s is None else re.sub(r"(\w+)", pref + r"\1", s)
                     for s in txt],
                    type=pa.string(),
                )
            elif name == "embeddings" and c == "embedding" and r > 0:
                vec = col.to_pylist()
                col = pa.array(
                    [None if v is None else [v[0] + r * 1e-3] + v[1:]
                     for v in vec],
                    type=t.schema.field(c).type,
                )
            cols.append(col)
        batches.append(pa.table(dict(zip(t.column_names, cols))))
    # one file per replica under a directory named <table>.parquet — the
    # multi-file layout a Spark-side generator produces, so scans split
    # across tasks like the driver's own sf1.0 (a single 80 MB file would
    # serialize e.g. the whole q1 scan on one core)
    d = os.path.join(out_dir, f"{name}.parquet")
    os.makedirs(d, exist_ok=True)
    for r, b in enumerate(batches):
        pq.write_table(b, os.path.join(d, f"part-{r:03d}.parquet"),
                       compression="snappy", row_group_size=128 * 1024)
    print(f"{name}: {t.num_rows} -> {sum(b.num_rows for b in batches)}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/sf1x")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in COPY_TABLES:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(t, os.path.join(args.out, f"{name}.parquet"),
                       compression="snappy")
        print(f"{name}: copied {t.num_rows}")
    for name in SHIFT_COLS:
        scale_table(name, args.reps, args.out)


if __name__ == "__main__":
    main()
