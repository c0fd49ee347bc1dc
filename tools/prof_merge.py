"""Phase-level profile of one bench_cdc_merge pass (guide §1).

Monkeypatches timers around the phases of merge_into so the per-batch
fixed costs are attributable: batch plan construction, the winners/write
Spark job, the _stage_write footer-stat loop, and the manifest commit.
Measurement-only; no engine code is modified.

Usage: python tools/prof_merge.py [--sf DIR] [--mode cow|mor] [--keys N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collections import defaultdict

TIMES: dict[str, list[float]] = defaultdict(list)


def timed(label, fn):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        TIMES[label].append(time.perf_counter() - t0)
        return out
    return wrap


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/sf1x")
    ap.add_argument("--mode", default="cow")
    ap.add_argument("--keys", type=int, default=20_000)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import types as T

    from encode_ingest_spark.cdc import generator, repo_file_events
    from encode_ingest_spark.lake import LakeTable, merge_into
    from encode_ingest_spark.lake import merge as merge_mod
    from encode_ingest_spark.lake import table as table_mod
    from encode_ingest_spark.session import get_spark

    # instrument
    table_mod.LakeTable._stage_write = timed(
        "stage_write", table_mod.LakeTable._stage_write)
    merge_mod._commit = timed("commit", merge_mod._commit)
    merge_mod.normalize_batch = timed("normalize", merge_mod.normalize_batch)

    import pyarrow.parquet as _pq
    orig_pf = _pq.ParquetFile
    _pq.ParquetFile = timed("pq_footer", orig_pf)

    spark = get_spark("prof_merge", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="prof_lake_", dir=shm)
    schema = T.StructType([
        T.StructField(c, T.StringType())
        for c in ["repo", "path", "commit", "lang", "content"]
    ])

    n_keys = args.keys
    total = n_keys * 3

    # warm both merge branches like bench.py does
    warm = LakeTable.create(spark, os.path.join(root, "warm"), schema,
                            ["repo", "path", "commit"], num_buckets=32)
    merge_into(warm, repo_file_events(spark, n_keys=2000, events_per_key=3, seed=7),
               batch_id=1, mode=args.mode)
    merge_into(warm, repo_file_events(spark, n_keys=2000, events_per_key=3, seed=8),
               batch_id=2, mode=args.mode)
    TIMES.clear()

    for p in range(2):
        t = LakeTable.create(spark, os.path.join(root, f"t{p}"), schema,
                             ["repo", "path", "commit"], num_buckets=32)
        t_pass = time.perf_counter()
        for i in range(args.batches):
            lo = i * total // args.batches
            hi = (i + 1) * total // args.batches
            t0 = time.perf_counter()
            batch = repo_file_events(spark, n_keys=n_keys, events_per_key=3,
                                     seed=42, slot_range=(lo, hi))
            TIMES["gen_plan"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            merge_into(t, batch, batch_id=i + 1, offset_range=(lo, hi - 1),
                       mode=args.mode)
            TIMES["merge_total"].append(time.perf_counter() - t0)
        TIMES["pass_total"].append(time.perf_counter() - t_pass)

    import shutil
    shutil.rmtree(root, ignore_errors=True)

    print(f"mode={args.mode} keys={n_keys} batches={args.batches} (2 passes)")
    for k in ("pass_total", "merge_total", "gen_plan", "normalize",
              "stage_write", "commit", "pq_footer"):
        v = TIMES.get(k, [])
        if not v:
            continue
        print(f"  {k:12s} n={len(v):3d} sum={sum(v):7.3f}s "
              f"mean={sum(v)/len(v)*1000:8.1f}ms max={max(v)*1000:8.1f}ms")


if __name__ == "__main__":
    main()
