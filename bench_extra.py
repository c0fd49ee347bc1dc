"""Per-query isolation harness for the optimization round (guide §1.4).

NOT the driver contract — bench.py stays frozen. This file times each
timed query in isolation with the noop sink (min-of-N after a warm-up
pass), captures ``explain("formatted")`` for plan diffing, and records
the same window-evidence fields bench.py uses so numbers from different
captures can be compared honestly.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --trials 3
  python bench_extra.py --plans plans/r06 --suffix before   # dump plans
  python bench_extra.py --queries d4_minhash_lsh_pairs,q5_nation_revenue
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, _cpu_ticks, _host_speed_probe, _loadavg, _steal_pct


TIMED = HEADLINE  # the 9 noop-sink headline queries (merges timed separately)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans", default="",
                    help="directory to write <query>_<suffix>.txt explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--merge", action="store_true",
                    help="also time cdc_merge_e2e / cdc_merge_mor (bench.py body)")
    args = ap.parse_args()

    from encode_ingest_spark.session import get_spark
    from encode_ingest_spark.suite import QUERIES

    names = [q for q in (args.queries.split(",") if args.queries else TIMED) if q]
    load_start = _loadavg()
    ticks = _cpu_ticks()
    probe = _host_speed_probe()
    spark = get_spark("bench_extra", cores=args.cpus)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {name}_{args.suffix}.txt", file=sys.stderr)
        return

    # warm-up at the smallest scale (JIT of interpreted HOF paths)
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            _force(QUERIES[name](spark, warm))
        except Exception:
            pass
    spark.range(1000).count()

    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        best = None
        samples[name] = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.perf_counter()
            _force(fn(spark, args.sf))
            dt = time.perf_counter() - t0
            samples[name].append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)

    if args.merge:
        from bench import bench_cdc_merge
        for mode in ("cow", "mor"):
            best = None
            for _ in range(max(2, args.trials - 1)):
                sec, n_ev = bench_cdc_merge(spark, args.sf, mode=mode)
                best = sec if best is None else min(best, sec)
            key = "cdc_merge_e2e" if mode == "cow" else "cdc_merge_mor"
            out[key] = round(best, 3)

    print(json.dumps({
        "metric": "bench_extra isolated min-of-%d" % args.trials,
        "value": round(sum(out.values()), 3),
        "unit": "sec",
        "queries": out,
        "samples": samples,
        "sf": args.sf,
        "cpus": args.cpus,
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
        "steal_pct": _steal_pct(ticks, _cpu_ticks()),
        **probe,
    }))


if __name__ == "__main__":
    main()
