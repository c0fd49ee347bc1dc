"""Split each headline query's wall time into plan-construction vs
execution (noop sink), per guide §1 — is the residual driver-side?

Usage: SPARK_GRAFT_SF_DIR=... python tools/prof_construct.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encode_ingest_spark.session import get_spark  # noqa: E402
from encode_ingest_spark.suite import QUERIES  # noqa: E402

HEADLINE = [
    "cdc_dedup_latest", "cdc_final_state", "q1_pricing_summary",
    "q3_top_revenue_orders", "q5_nation_revenue", "j2_grouped_left_join",
    "t3_quality_score", "d4_minhash_lsh_pairs", "s1_cosine_topk",
]


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("prof_construct", cores=cpus)
    # same warmup discipline as bench.py
    warm = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            QUERIES[name](spark, warm).write.format("noop").mode(
                "overwrite").save()
        except Exception:
            pass
    spark.range(1000).count()

    print(f"{'query':28s} {'build_ms':>9s} {'exec_ms':>9s} {'total_ms':>9s}")
    for name in HEADLINE:
        builds, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append((t1 - t0) * 1000)
            execs.append((t2 - t1) * 1000)
        b, e = min(builds), min(execs)
        print(f"{name:28s} {b:9.1f} {e:9.1f} {b + e:9.1f}")


if __name__ == "__main__":
    main()
