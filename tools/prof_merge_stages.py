"""Attribute the merge job's cost: generation vs winners-agg vs write.

Times, back-to-back in one session (same window), min-of-N each:
  gen   : noop-sink the 15k-event batch (scan+expr cost only)
  agg   : noop-sink the winners aggregate (adds the shuffle + max_by)
  wagg  : winners repartitioned by key to 32 then agg (candidate MOR shape)
  write : plain parquet write of winners to /dev/shm (adds encoding+IO)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from encode_ingest_spark.cdc import repo_file_events
from encode_ingest_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    n_keys = 20_000
    spark = get_spark("prof_stages", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    batch = repo_file_events(spark, n_keys=n_keys, events_per_key=3, seed=42,
                             slot_range=(0, n_keys * 3 // 4))
    keys = ["repo", "path", "commit"]
    non_key = [c for c in batch.columns if c not in keys]
    seq = F.coalesce(F.col("event_seq"), F.lit(-1))
    winners = (batch.groupBy(*keys)
               .agg(F.max_by(F.struct(*non_key), seq).alias("_w"))
               .select(*keys, "_w.*"))
    pre = batch.repartition(32, *[F.col(c) for c in keys])
    winners_pre = (pre.groupBy(*keys)
                   .agg(F.max_by(F.struct(*non_key), seq).alias("_w"))
                   .select(*keys, "_w.*"))

    cases = {
        "gen": lambda: noop(batch),
        "agg": lambda: noop(winners),
        "wagg": lambda: noop(winners_pre),
    }
    root = tempfile.mkdtemp(prefix="prof_w_", dir="/dev/shm")

    def write_case():
        d = os.path.join(root, f"w{time.monotonic_ns()}")
        winners_pre.write.mode("overwrite").parquet(d)
        shutil.rmtree(d, ignore_errors=True)

    cases["write"] = write_case

    # warm all
    for fn in cases.values():
        fn()
    out = {}
    for name, fn in cases.items():
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    shutil.rmtree(root, ignore_errors=True)
    print(out)
    print("probe loadavg", os.getloadavg())


if __name__ == "__main__":
    main()
