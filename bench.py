"""Benchmark harness (driver contract + scaling evidence).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "events_per_sec": ...}

Scaling mode (python bench.py --scaling): run the identical CDC
merge job at two parallelism levels (default 8 and 32) in separate JVMs
and print throughput at both + scaling efficiency — the sandbox evidence
for the north rule's two-cluster-size criterion (see BASELINE.md).

Queries are forced with the noop sink (format("noop")) so Catalyst cannot
prune the computed columns the way a count() would.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# events for the CDC merge benchmark, keyed by scale dir suffix
CDC_KEYS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}

HEADLINE = [
    "cdc_dedup_latest",
    "cdc_final_state",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "j2_grouped_left_join",
    "t3_quality_score",
    "d4_minhash_lsh_pairs",
    "s1_cosine_topk",
]


def _cdc_keys_for(sf_dir: str) -> int:
    for suffix, n in CDC_KEYS.items():
        if sf_dir.rstrip("/").endswith(suffix):
            return n
    return 20_000


#: 1-min loadavg above which a capture window counts as CONTENDED —
#: co-tenant noise on this host inflates identical runs 10-25%
#: (VERDICT r4 adjudicated a whole recorded bench as window noise), so
#: the artifact must carry its own evidence: loadavg fields + extra
#: headline trials when the window is dirty.
LOAD_THRESHOLD = float(os.environ.get("SPARK_GRAFT_LOAD_THRESHOLD", "2.0"))

#: cpu_probe_sec above which the capture window counts as contended
#: (quiet windows on this host measure ~0.23-0.31 s; co-tenant waves
#: push it past 0.4). Complements LOAD_THRESHOLD because this box's
#: loadavg can read 10+ while genuinely idle (kernel accounting bug).
_CPU_PROBE_THRESHOLD = float(
    os.environ.get("SPARK_GRAFT_CPU_PROBE_THRESHOLD", "0.38")
)

#: membw_gbps below which the window counts as contended. The round-5
#: final session caught the regime neither loadavg, steal, nor the CPU
#: probe sees: membw measured 9.1 GB/s (vs 20.1 the same morning) with
#: cpu_probe_sec a quiet 0.251 — and the membw-bound streaming e2e ran
#: 3x under its quiet figure (same-window A/B pinned the code as
#: equal-or-faster). Extra trials can't fix a bandwidth-starved window,
#: but the flag makes the artifact say so.
_MEMBW_THRESHOLD = float(
    os.environ.get("SPARK_GRAFT_MEMBW_THRESHOLD", "12.0")
)


def _loadavg() -> list[float]:
    return [round(x, 2) for x in os.getloadavg()]


def _cpu_ticks() -> list[int]:
    """Aggregate /proc/stat cpu counters (user..guest_nice)."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except OSError:  # non-Linux fallback: steal evidence unavailable
        return []


def _steal_pct(start: list[int], end: list[int]) -> float | None:
    """Hypervisor CPU-steal %% between two _cpu_ticks snapshots.

    Loadavg misses the sandbox's real noise source: this VM loses CPU
    to the host in waves (measured: identical merge benches 4s vs 52s
    while in-VM loadavg started <0.5 both times). /proc/stat's steal
    field counts exactly those involuntary-wait ticks, so the recorded
    artifact carries the evidence that adjudicates fast-vs-slow
    captures — steal_pct ~0 means the number is the machine's, high
    steal means the window was robbed."""
    if not start or not end or len(start) != len(end):
        return None
    d = [b - a for a, b in zip(start, end)]
    total = sum(d)
    if total <= 0 or len(d) < 8:
        return None
    return round(100.0 * d[7] / total, 2)


def _host_speed_probe() -> dict:
    """Fixed-work calibration probe recorded into every bench artifact.

    Measured this round: identical code in two zero-steal, zero-loadavg
    windows ran 48.5k vs ~149.7k ev/s — a ~3x swing that neither loadavg
    nor /proc/stat steal captures (the co-tenant pressure is on memory
    bandwidth / effective clock, not scheduled-out ticks). A constant
    single-thread CPU loop plus a numpy memory-stream pass give the
    artifact an absolute same-window yardstick: compare `cpu_probe_sec`
    / `membw_gbps` across artifacts to normalize throughput numbers
    before calling anything a regression."""
    import numpy as _np

    cpu_sec = float("inf")
    for _ in range(3):  # best-of-3: the probe reports capability, not luck
        t0 = time.perf_counter()
        x = 0
        for i in range(5_000_000):
            x += i * i
        cpu_sec = min(cpu_sec, time.perf_counter() - t0)

    a = _np.ones(64 * 1024 * 1024 // 8, dtype=_np.float64)  # 64 MiB
    b = _np.empty_like(a)
    _np.multiply(a, 1.0000001, out=b)  # warmup: fault in both buffers
    bw = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            _np.multiply(a, 1.0000001, out=b)
            a, b = b, a
        bw = max(bw, (4 * 2 * a.nbytes / (time.perf_counter() - t0)) / 1e9)
    return {"cpu_probe_sec": round(cpu_sec, 3), "membw_gbps": round(bw, 2)}


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_cdc_merge(spark, sf_dir: str, n_batches: int = 4, n_keys: int | None = None, mode: str = "cow", flood_key_pct: int = 0) -> tuple[float, int]:
    """End-to-end CDC throughput: generate → dedup → MERGE commit, over
    n_batches micro-batches. Returns (seconds, events).

    ``flood_key_pct`` redirects that share of ALL events to one
    (repo,path,commit) key — the pathological hot-key stream. The merge
    absorbs it in the map-side partial aggregate (one row per key per
    map task reaches the shuffle), so throughput should hold; measured
    via ``--flood-pct`` (north rule: skew handled explicitly)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from encode_ingest_spark.cdc import repo_file_events
    from encode_ingest_spark.lake import LakeTable, merge_into

    n_keys = n_keys or int(os.environ.get("SPARK_GRAFT_CDC_KEYS", 0)) or _cdc_keys_for(sf_dir)
    # The event source stays a lazy generator (pure column expressions):
    # each micro-batch materializes its slice inside the merge job, which
    # models the real tail (decode/parse CPU on ingest) and keeps the
    # benchmark CPU-bound. A persisted cache would instead measure
    # single-box memory bandwidth (observed: flat 8→32-core scaling).
    # Batches are disjoint slot ranges of the scrambled stream — each
    # batch generates ONLY its slice (range-source pruning), where the
    # old `filter(seq % n == i)` form re-generated the full stream per
    # batch and threw 3/4 of it away.
    total = n_keys * 3

    # Lake root on tmpfs when available: on a real cluster the sink's
    # aggregate bandwidth (S3/HDFS) scales with the cluster; the sandbox
    # has ONE virtio disk (~300 MB/s), which otherwise caps every
    # parallelism level at the same ~6 s/batch write floor.
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="bench_lake_", dir=shm)
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
    # warm the merge paths (JIT of agg/stage/write pipelines) on a
    # throwaway table — BOTH the bootstrap branch (first merge) and the
    # union branch (second merge into a non-empty table); an unwarmed
    # union path costs 5-15x JIT on its first timed batch
    warm_table = LakeTable.create(
        spark, os.path.join(root, "warm"), schema, ["repo", "path", "commit"], num_buckets=32
    )
    merge_into(warm_table, repo_file_events(spark, n_keys=2_000, events_per_key=3, seed=7),
               batch_id=1, mode=mode)
    merge_into(warm_table, repo_file_events(spark, n_keys=2_000, events_per_key=3, seed=8),
               batch_id=2, mode=mode)

    # min-of-3 passes: the sandbox host has co-tenant CPU-steal spikes
    # that can double a single pass (observed 13s vs 35s back-to-back on
    # identical code); the fastest pass is the machine-capability number.
    # Each pass ingests into a FRESH table (identical work).
    def one_pass(pass_idx: int) -> float:
        t = LakeTable.create(
            spark, os.path.join(root, f"t{pass_idx}"), schema,
            ["repo", "path", "commit"], num_buckets=32,
        )
        t0 = time.perf_counter()
        for i in range(n_batches):
            lo, hi = i * total // n_batches, (i + 1) * total // n_batches
            batch = repo_file_events(
                spark, n_keys=n_keys, events_per_key=3, seed=42,
                slot_range=(lo, hi), flood_key_pct=flood_key_pct,
            )
            merge_into(t, batch, batch_id=i + 1, offset_range=(lo, hi - 1), mode=mode)
        return time.perf_counter() - t0

    dt = min(one_pass(p) for p in range(3))
    shutil.rmtree(root, ignore_errors=True)
    return dt, total


def bench_narrow_batch(spark, sf_dir: str) -> dict:
    """Steady-state shape the 4-batch loop can't show: a NARROW batch
    (15k events, 5k keys) merging into an ALREADY-LARGE table (600k
    rows). Compares the staged sub-strategies — broadcast (map-only
    target side) vs union-agg (target shuffle) — min-of-2 each."""
    from pyspark.sql import types as T

    from encode_ingest_spark.cdc import repo_file_events
    from encode_ingest_spark.lake import LakeTable, merge_into

    n_keys = _cdc_keys_for(sf_dir)
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="bench_narrow_", dir=shm)
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    base = repo_file_events(spark, n_keys=n_keys, events_per_key=3, seed=42)
    out = {}
    try:
        for strategy in ("broadcast", "agg"):
            best = None
            for trial in range(2):
                t = LakeTable.create(
                    spark, os.path.join(root, f"{strategy}{trial}"), schema,
                    ["repo", "path", "commit"], num_buckets=32,
                )
                merge_into(t, base, batch_id=1)
                # narrow update batch: same key universe, new versions
                batch = repo_file_events(
                    spark, n_keys=5_000, events_per_key=3, seed=43
                )
                t0 = time.perf_counter()
                merge_into(t, batch, batch_id=2, stage_batch=True,
                           merge_strategy=strategy)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[f"narrow_batch_{strategy}_sec"] = round(best, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out["narrow_batch_events"] = 15_000
    return out


def bench_changelog_pruning(spark, sf_dir: str) -> dict:
    """The r2-named scale-killer, measured: per-micro-batch changelog
    cost with manifest-diff bucket pruning vs the full two-snapshot
    diff. Shape: a 10-key batch lands in a large table (sf-scaled keys,
    32 buckets) — the 10^10-row steady state in miniature, where a
    micro-batch touches a small fraction of the bucket space (here ≤10
    of 32; at real scale, dozens of thousands). min-of-2 each."""
    from pyspark.sql import types as T

    from encode_ingest_spark.cdc import repo_file_events
    from encode_ingest_spark.lake import LakeTable, merge_into

    n_keys = _cdc_keys_for(sf_dir)
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="bench_chlog_", dir=shm)
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    out = {}
    try:
        t = LakeTable.create(
            spark, os.path.join(root, "t"), schema,
            ["repo", "path", "commit"], num_buckets=32,
        )
        merge_into(t, repo_file_events(spark, n_keys=n_keys, events_per_key=3,
                                       seed=42), batch_id=1)
        v1 = t.current_version()
        # stage_batch=True = the large-table steady-state merge path
        # (auto-chosen above 5M rows; the sandbox table is smaller), so
        # only the touched buckets' files change
        merge_into(t, repo_file_events(spark, n_keys=10, events_per_key=1,
                                       seed=77), batch_id=2, stage_batch=True)
        v2 = t.current_version()
        out["changelog_buckets_touched"] = len(t.changed_buckets(v1, v2))
        t.read_changes(v1, v2).write.format("noop").mode("overwrite").save()  # JIT
        for label, prune in (("pruned", True), ("full", False)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                t.read_changes(v1, v2, prune=prune).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[f"changelog_{label}_sec"] = round(best, 3)
            # the scale-honest number: files (∝ bytes) actually scanned —
            # wall time at sandbox volume is floored by job fixed costs
            out[f"changelog_{label}_files"] = len(
                t.read_changes(v1, v2, prune=prune).inputFiles()
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def bench_streaming_e2e(spark, sf_dir: str, n_batches: int = 4,
                        trials: int = 2) -> dict:
    """The north metric measured LITERALLY: change-events/sec sustained
    end-to-end through Structured Streaming — rate-micro-batch tail →
    foreachBatch dedup+MERGE → committed snapshot, including checkpoint
    and fence overhead per epoch. (bench_cdc_merge times the same work
    without the streaming machinery; the delta between the two is the
    per-epoch fixed cost.)

    min-of-``trials`` full passes, each against a FRESH table +
    checkpoint: this was the only headline metric captured single-pass,
    and the one co-tenant windows inflated hardest (BENCH_r04 recorded
    streaming −36% on byte-identical code; every other metric already
    carried a min-of-N)."""
    import time as _time

    from pyspark.sql import types as T

    from encode_ingest_spark.lake import LakeTable
    from encode_ingest_spark.streaming.pipeline import CdcStreamPipeline

    n_keys = _cdc_keys_for(sf_dir)
    total = n_keys * 3
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="bench_stream_", dir=shm)
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )

    def one_pass(idx: int) -> tuple[float, int]:
        table = LakeTable.create(
            spark, os.path.join(root, f"t{idx}"), schema,
            ["repo", "path", "commit"], num_buckets=32,
        )
        pipe = CdcStreamPipeline(
            table, checkpoint_dir=os.path.join(root, f"ckpt{idx}"),
            source="rate",
            rate_opts={"n_keys": n_keys, "events_per_key": 3,
                       "rows_per_batch": total // n_batches},
        )
        t0 = _time.perf_counter()
        query = (
            pipe._stream_df(spark)
            .writeStream.foreachBatch(pipe._apply_batch)
            .option("checkpointLocation", pipe.checkpoint_dir)
            .start()
        )
        try:
            deadline = _time.time() + 600
            while _time.time() < deadline and len(
                [r for r in pipe.batch_results if not r.skipped]
            ) < n_batches:
                _time.sleep(0.2)
            dt = _time.perf_counter() - t0
        finally:
            query.stop()
            query.awaitTermination(30)
        done = len([r for r in pipe.batch_results if not r.skipped])
        return dt, min(done, n_batches) * (total // n_batches)

    try:
        # pick the best THROUGHPUT pass, not the shortest wall: passes
        # that deadline with different batch counts complete different
        # event totals, and min-dt would keep the slowest of those
        best_rate, dt, events = None, 0.0, 0
        for idx in range(trials):
            p_dt, ev = one_pass(idx)
            rate = ev / p_dt if p_dt else 0.0
            if ev and (best_rate is None or rate > best_rate):
                best_rate, dt, events = rate, p_dt, ev
        return {
            "streaming_e2e_sec": round(dt, 3),
            "streaming_e2e_events": events,
            "events_per_sec_stream": round(events / dt, 1) if dt else 0.0,
            "streaming_trials": trials,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_soak(sf_dir: str, cpus: int, n_files: int = 60) -> dict:
    """Endurance soak (steady-state invariants a short bench can't
    show): a MOR streaming ingest with the full derived-table DAG under
    a transactional group, followed by maintain(). Asserts — and
    reports — bounded files/bucket, bounded manifest cache, FK-clean
    group snapshots, and derived == full recompute."""
    import time as _time

    from pyspark.sql import types as T

    from encode_ingest_spark.entities import split_all
    from encode_ingest_spark.entities.incremental import (
        referential_integrity_report,
    )
    from encode_ingest_spark.cdc import repo_file_events
    from encode_ingest_spark.lake import LakeTable, TableGroup
    from encode_ingest_spark.session import get_spark
    from encode_ingest_spark.streaming.pipeline import (
        CdcStreamPipeline,
        write_event_files,
    )

    spark = get_spark("soak", cores=cpus)
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    base = tempfile.mkdtemp(prefix="bench_soak_", dir=shm)
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    try:
        src = LakeTable.create(
            spark, os.path.join(base, "src"), schema,
            ["repo", "path", "commit"], num_buckets=16,
            properties={"write.sort_within_buckets": "repo",
                        "mor.compact.threshold": "3"},
        )
        shapes = {
            "file": ("file_id string, label string, file_format string, "
                     "xref array<string>, size_bytes long, content_sha256 "
                     "string, repo_id string, commit_activity_id string, "
                     "part_of_dataset_id string", ["file_id"]),
            "repo": ("repo_id string, n_files long, languages array<string>, "
                     "n_commits long, part_of_dataset_id string", ["repo_id"]),
            "commit_activity": (
                "activity_id string, repo_id string, commit_sha string, "
                "generated_file_id array<string>, used_language "
                "array<string>, n_files long, activity_type string",
                ["activity_id"]),
        }
        targets = {
            name: LakeTable.create(
                spark, os.path.join(base, name),
                T._parse_datatype_string(ddl), keys, num_buckets=8,
            )
            for name, (ddl, keys) in shapes.items()
        }
        grp = TableGroup.create(spark, os.path.join(base, "grp"), targets)
        ev = repo_file_events(spark, n_keys=3000, events_per_key=3, seed=97)
        write_event_files(ev, os.path.join(base, "ev"), n_files=n_files)
        pipe = CdcStreamPipeline(
            src, os.path.join(base, "ev"), os.path.join(base, "ckpt"),
            max_files_per_trigger=1, merge_mode="mor", derived_group=grp,
        )
        t0 = _time.perf_counter()
        epochs = pipe.run_available_now(spark, timeout_sec=2400)
        dt = _time.perf_counter() - t0
        per_bucket: dict[int, int] = {}
        for f in src.current_manifest().files:
            per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
        maint = src.maintain(tombstone_horizon_seq=10**12, keep_snapshots=3)
        fresh = LakeTable.load(spark, src.root)
        fk = referential_integrity_report(
            grp.read("file"), grp.read("repo"), grp.read("commit_activity")
        ).first()
        want = split_all(fresh.read())
        got = {tuple(r) for r in grp.read("file")
               .select("file_id", "content_sha256").collect()}
        exp = {tuple(r) for r in want["file"]
               .select("file_id", "content_sha256").collect()}
        return {
            "metric": "endurance soak (MOR stream + derived group + maintain)",
            "value": round(dt, 1),
            "unit": "sec",
            "epochs": epochs,
            "events": 9000,
            "max_files_per_bucket": max(per_bucket.values()),
            "manifest_cache_entries": len(src._manifest_cache),
            "maintain": maint,
            "fk_orphans": [int(fk.orphan_repo_refs), int(fk.orphan_activity_refs)],
            "derived_equals_full_recompute": got == exp,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_bench(sf_dir: str, cpus: int) -> dict:
    from encode_ingest_spark.session import get_spark
    from encode_ingest_spark.suite import QUERIES

    # sample the window BEFORE our own Spark work inflates loadavg —
    # this is the co-tenant noise indicator the artifact records
    load_start = _loadavg()
    ticks_start = _cpu_ticks()
    host_probe = _host_speed_probe()
    spark = get_spark("bench", cores=cpus)

    # Warm-up: run every headline query once at the smallest scale so the
    # timed pass measures steady-state execution, not first-call JIT
    # compilation of the interpreted higher-order-function paths
    # (observed 5-15x cold-vs-warm on the sketch-heavy queries; at
    # production scale JIT warm-up amortizes to zero).
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        for name in HEADLINE:
            try:
                _force(QUERIES[name](spark, warm_sf))
            except Exception:
                pass
    spark.range(1000).count()

    def headline_pass() -> dict[str, float]:
        out: dict[str, float] = {}
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            out[name] = round(time.perf_counter() - t0, 3)
        return out

    # self-defending capture (VERDICT r4: a contended window once
    # recorded as a phantom 14% regression): min-of-2 headline passes
    # always, a third when the window started dirty; the emitted JSON
    # carries the loadavg/steal/host-probe evidence + per-trial sums so
    # a noisy capture is diagnosable from the artifact alone.
    # Contention gate: the host-speed probe, NOT loadavg — this box's
    # loadavg is unreliable (observed 10.4 while vmstat read 100% idle
    # and no R/D tasks existed), while the probe directly measures what
    # co-tenancy takes away (quiet windows: cpu_probe_sec ~0.23-0.31).
    contended = (
        host_probe["cpu_probe_sec"] > _CPU_PROBE_THRESHOLD
        or host_probe["membw_gbps"] < _MEMBW_THRESHOLD
        or load_start[0] > LOAD_THRESHOLD
    )
    n_passes = 3 if contended else 2
    trial_sums: list[float] = []
    timings: dict[str, float] = {}
    for _ in range(n_passes):
        t = headline_pass()
        trial_sums.append(round(sum(t.values()), 3))
        timings = {
            k: min(v, timings.get(k, v)) for k, v in t.items()
        }

    # Merge benches get the same min-of-N self-defense as the headline
    # queries: the first pass pays JIT/plan-cache warm-up on the merge
    # path (measured 5.9 s cold vs 3.0 s warm on identical code — a
    # single-pass capture once read as a phantom 47% regression).
    merge_trials: list[float] = []
    n_events = 0
    for _ in range(n_passes):
        sec, n_events = bench_cdc_merge(spark, sf_dir)
        merge_trials.append(round(sec, 3))
    merge_sec = min(merge_trials)
    timings["cdc_merge_e2e"] = round(merge_sec, 3)
    events_per_sec = round(n_events / merge_sec, 1)
    mor_trials: list[float] = []
    for _ in range(n_passes):
        sec, _ = bench_cdc_merge(spark, sf_dir, mode="mor")
        mor_trials.append(round(sec, 3))
    mor_sec = min(mor_trials)
    timings["cdc_merge_mor"] = round(mor_sec, 3)

    narrow = bench_narrow_batch(spark, sf_dir)
    chlog = bench_changelog_pruning(spark, sf_dir)
    stream = bench_streaming_e2e(spark, sf_dir, trials=n_passes)

    # entity-universe maintenance probe (the round-4 layer): one
    # change-driven epoch vs the reference-shaped full recompute over
    # the 13-mapper DAG, at a corpus size past the fixed-cost crossover
    # (BASELINE.md round-4 table has the 1k/8k/24k curve). Opt out with
    # SPARK_GRAFT_SKIP_UNIVERSE=1 if the harness needs the short bench.
    uni: dict = {}
    if not os.environ.get("SPARK_GRAFT_SKIP_UNIVERSE"):
        u = run_universe_bench(sf_dir, cpus, n_exp=8000, spark=spark)
        uni = {
            "universe_n_experiments": u["n_experiments"],
            "universe_epoch_sec": u["incremental_epoch_sec"],
            "universe_full_recompute_sec": u["full_recompute_sec"],
            "universe_speedup_vs_full": u["speedup_vs_full"],
        }

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline query wall time (sum) at sf on local[%d]" % cpus,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
        "steal_pct": _steal_pct(ticks_start, _cpu_ticks()),
        **host_probe,
        "headline_trials": len(trial_sums),
        "headline_trial_sums": trial_sums,
        "window_contended": contended,
        "sf": sf_dir,
        "cpus": cpus,
        "cdc_events": n_events,
        "events_per_sec": events_per_sec,
        "events_per_sec_mor": round(n_events / mor_sec, 1),
        "merge_trial_secs": merge_trials,
        "mor_trial_secs": mor_trials,
        **narrow,
        **chlog,
        **stream,
        **uni,
    }


def bench_sketch(spark, sf_dir: str, repeat: int = 10, trials: int = 3) -> tuple[float, int]:
    """Compute-dense scaling probe: the MinHash+SimHash signature stage
    (tokenize → shingle → md5 → 16 permutations + 32 bit-sums) over the
    documents corpus replicated ``repeat``×. Pure per-row CPU — no joins,
    no wide shuffles — so it measures core scaling where DRAM bandwidth
    is not the wall (unlike the merge, see BASELINE.md). Returns
    (min seconds over trials, docs processed)."""
    from pyspark.sql import functions as F

    from encode_ingest_spark.operators import minhash_signatures
    from encode_ingest_spark.operators.dedup import simhash_signatures

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.explode(F.array(*[F.lit(i) for i in range(repeat)])).alias("rep"),
            "doc_id",
            "text",
        )
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text"
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)  # time the sketch math, not the scan
    )
    n_docs = docs.count()

    def run_once() -> float:
        t0 = time.perf_counter()
        _force(minhash_signatures(docs, "doc_id", "text", k=16))
        _force(simhash_signatures(docs, "doc_id", "text"))
        return time.perf_counter() - t0

    run_once()  # JIT warm-up
    return min(run_once() for _ in range(trials)), n_docs


def run_multijvm_scaling(sf_dir: str, low: int, high: int) -> dict:
    """Executor-count emulation: K ISOLATED single-core JVMs ingest
    disjoint shards of the same total event stream concurrently — the
    faithful sandbox stand-in for K executors (a real cluster runs one
    JVM per executor; each has its own GC, JIT and lock space). This
    probe exists because measured single-JVM thread scaling on this host
    is NOT executor scaling: concurrent regexp/string-heavy tasks inside
    ONE JVM anti-scale (8 tasks each ~8x slower, user-mode, independent
    of GC algorithm — see BASELINE.md), an artifact separate processes
    do not share. Aggregate throughput = sum of per-shard steady-state
    rates while all K run concurrently (startup/warm-up excluded by each
    shard's own harness).

    WEAK scaling (constant per-executor load): every JVM processes the
    same shard size at both K — the standard cluster measure, and the
    faithful one here: at the target scale (10^10 events) per-executor
    work is enormous at any N, so shrinking shards as K grows (strong
    scaling on a tiny sandbox total) would measure micro-batch fixed
    cost, not executor scaling."""
    n_keys_total = _cdc_keys_for(sf_dir)
    per = n_keys_total // low  # generous shards: steady-state per JVM
    results = {}
    for k in (low, high):
        procs = []
        for i in range(k):
            procs.append(
                subprocess.Popen(
                    [sys.executable, __file__, "--cores", "1", "--cdc-only"],
                    stdout=subprocess.PIPE,
                    text=True,
                    env={
                        **os.environ,
                        "SPARK_GRAFT_SF_DIR": sf_dir,
                        "SPARK_GRAFT_CDC_KEYS": str(per),
                        "SPARK_GRAFT_CPUS": "1",
                        "SPARK_DRIVER_MEM": "6g",
                    },
                )
            )
        total = 0.0
        for p in procs:
            out, _ = p.communicate(timeout=1800)
            line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
            total += json.loads(line)["events_per_sec"]
        results[k] = round(total, 1)
    eff = (results[high] / results[low]) / (high / low)
    return {
        "metric": "multi-JVM (executor emulation) CDC scaling %d -> %d executors"
        % (low, high),
        "value": round(min(eff, 1.0), 3),
        "raw_efficiency": round(eff, 3),
        **({"note": "raw efficiency >1.0 is a measurement artifact (the "
                    "low level drew a worse co-tenant window); displayed "
                    "value is capped at 1.0"} if eff > 1.0 else {}),
        "unit": "efficiency",
        "throughput": {str(low): results[low], str(high): results[high]},
        "sf": sf_dir,
        "protocol": "K isolated local[1] JVMs over disjoint key shards, "
        "aggregate steady-state events/s",
    }


def run_scaling(sf_dir: str, low: int, high: int, probe: str = "cdc", pairs: int = 2) -> dict:
    """Run the probe in fresh JVMs at local[low] and local[high],
    ALTERNATING low/high ``pairs`` times (sandbox co-tenant noise makes
    single runs meaningless — take the best of each level from
    interleaved trials); report throughput + scaling efficiency
    (eff = (thr_high/thr_low) / (high/low))."""
    flag = "--cdc-only" if probe == "cdc" else "--sketch-only"
    best: dict[int, float] = {}
    for _ in range(pairs):
        for cores in (low, high):
            out = subprocess.run(
                [sys.executable, __file__, "--cores", str(cores), flag],
                capture_output=True,
                text=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
                timeout=1800,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            thr = json.loads(line)["events_per_sec" if probe == "cdc" else "docs_per_sec"]
            best[cores] = max(best.get(cores, 0.0), thr)
    eff = (best[high] / best[low]) / (high / low)
    return {
        "metric": "%s scaling efficiency local[%d] -> local[%d]" % (probe, low, high),
        "value": round(min(eff, 1.0), 3),
        "raw_efficiency": round(eff, 3),
        **({"note": "raw efficiency >1.0 is a measurement artifact (the "
                    "low level drew a worse co-tenant window); displayed "
                    "value is capped at 1.0"} if eff > 1.0 else {}),
        "unit": "efficiency",
        "throughput": {str(low): best[low], str(high): best[high]},
        "sf": sf_dir,
        "protocol": "best-of-%d alternating pairs" % pairs,
    }


def run_datasource_bench(sf_dir: str, cpus: int) -> dict:
    """Native DataSource surface vs its batch twins, interleaved
    min-of-2 (co-tenant noise discipline):

    * SINK: `readStream.parquet(events) → writeStream.format("lake")`
      (one availableNow epoch) vs `merge_into(mode="mor")` on the same
      staged events — the sink skips the winners shuffle entirely (LWW
      resolves at scan) but pays the streaming-query fixed cost and
      Python-side bucketing, so the honest comparison is wall + ev/s
      on identical inputs.
    * SOURCE: draining a B-commit changelog via
      `readStream.format("lake_changes")` (memory sink) vs the
      Spark-side `read_changes(0)` collect over the same table.
    * POINT QUERY: a full-key predicate through the native reader with
      pushFilters bucket routing (scans ONE bucket) vs the same scan
      with `pushdown=false` (all buckets) — min-of-3 interleaved.
    """
    import pyarrow  # noqa: F401  (fail fast if arrow missing)

    from encode_ingest_spark.cdc import repo_file_events
    from encode_ingest_spark.lake import (
        LakeTable,
        merge_into,
        register_lake_sources,
    )
    from encode_ingest_spark.session import get_spark
    from pyspark.sql import types as T

    load_start = _loadavg()
    ticks0 = _cpu_ticks()
    spark = get_spark("bench-datasource", cores=cpus)
    register_lake_sources(spark)
    spark.range(1000).count()
    n_keys = _cdc_keys_for(sf_dir)
    total = n_keys * 3
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="bench_ds_", dir=shm)
    schema = T.StructType(
        [T.StructField(c, T.StringType())
         for c in ["repo", "path", "commit", "lang", "content"]]
    )
    keys = ["repo", "path", "commit"]
    evdir = os.path.join(root, "events")
    repo_file_events(
        spark, n_keys=n_keys, events_per_key=3, seed=42
    ).write.parquet(evdir)
    ev_schema = (
        "repo string, path string, commit string, lang string, "
        "content string, op string, event_seq long, event_ts timestamp"
    )

    def sink_pass(idx: int) -> float:
        t = LakeTable.create(
            spark, os.path.join(root, f"s{idx}"), schema, keys, num_buckets=32
        )
        t0 = time.perf_counter()
        q = (
            spark.readStream.schema(ev_schema).parquet(evdir)
            .writeStream.format("lake")
            .option("path", t.root)
            .option("checkpointLocation", os.path.join(root, f"ck{idx}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        assert t.current_version() >= 1
        return dt

    def merge_pass(idx: int) -> float:
        t = LakeTable.create(
            spark, os.path.join(root, f"m{idx}"), schema, keys, num_buckets=32
        )
        batch = spark.read.schema(ev_schema).parquet(evdir)
        t0 = time.perf_counter()
        merge_into(t, batch, batch_id=1, mode="mor")
        return time.perf_counter() - t0

    # warm both paths (JIT + streaming machinery) on throwaway tables
    warm_ev = os.path.join(root, "warm_ev")
    repo_file_events(spark, n_keys=2000, events_per_key=3, seed=7).write.parquet(warm_ev)
    wt = LakeTable.create(spark, os.path.join(root, "w"), schema, keys, num_buckets=8)
    q = (
        spark.readStream.schema(ev_schema).parquet(warm_ev)
        .writeStream.format("lake").option("path", wt.root)
        .option("checkpointLocation", os.path.join(root, "wck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    merge_into(
        LakeTable.create(spark, os.path.join(root, "wm"), schema, keys, num_buckets=8),
        spark.read.schema(ev_schema).parquet(warm_ev), batch_id=1, mode="mor",
    )

    sink_ts, merge_ts = [], []
    for i in range(2):  # interleaved min-of-2
        sink_ts.append(sink_pass(i))
        merge_ts.append(merge_pass(i))
    sink_dt, merge_dt = min(sink_ts), min(merge_ts)

    # ---- changelog source drain vs Spark-side read_changes ----
    src = LakeTable.create(
        spark, os.path.join(root, "chg_src"), schema, keys, num_buckets=32
    )
    for i in range(4):
        lo, hi = i * total // 4, (i + 1) * total // 4
        merge_into(
            src,
            repo_file_events(spark, n_keys=n_keys, events_per_key=3,
                             seed=42, slot_range=(lo, hi)),
            batch_id=i + 1, mode="mor",
        )

    def source_pass(idx: int) -> float:
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("lake_changes")
            .option("startingVersion", 0).load(src.root)
            .writeStream.format("memory").queryName(f"ds_chg_{idx}")
            .option("checkpointLocation", os.path.join(root, f"sck{idx}"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(600)
        n = spark.table(f"ds_chg_{idx}").count()
        dt = time.perf_counter() - t0
        return dt, n

    def spark_changes_pass() -> tuple[float, int]:
        t0 = time.perf_counter()
        n = src.read_changes(0).count()
        return time.perf_counter() - t0, n

    src_ts, spk_ts = [], []
    chg_rows = 0
    for i in range(2):
        dt, chg_rows = source_pass(i)
        src_ts.append(dt)
        dt2, _ = spark_changes_pass()
        spk_ts.append(dt2)
    src_dt, spk_dt = min(src_ts), min(spk_ts)

    # ---- pushFilters point query: routed (1 bucket) vs full scan ----
    probe = src.read().limit(1).collect()[0]
    pred = " and ".join(f"{k} = '{probe[k]}'" for k in keys)

    def point_pass(pushdown: bool) -> float:
        t0 = time.perf_counter()
        df = spark.read.format("lake")
        if not pushdown:
            df = df.option("pushdown", "false")
        n = df.load(src.root).where(pred).count()
        assert n == 1
        return time.perf_counter() - t0

    pt_on, pt_off = [], []
    point_pass(True)  # warm
    for _ in range(3):
        pt_on.append(point_pass(True))
        pt_off.append(point_pass(False))

    # ---- bloom file skipping: partial-key point query (no bucket
    # routing possible) on a bloomed vs unbloomed twin of the same
    # 4-batch table. `commit` is a KEY column, so bloom pruning is
    # per-FILE even in delta buckets; with no clustering configured
    # there are no col_stats, so blooms are the ONLY pruning signal.
    blm = LakeTable.create(
        spark, os.path.join(root, "chg_blm"), schema, keys, num_buckets=32,
        properties={"write.bloom_filter_columns": "commit"},
    )
    for i in range(4):
        lo, hi = i * total // 4, (i + 1) * total // 4
        merge_into(
            blm,
            repo_file_events(spark, n_keys=n_keys, events_per_key=3,
                             seed=42, slot_range=(lo, hi)),
            batch_id=i + 1, mode="mor",
        )
    probe_commit = probe["commit"]

    def bloom_pass(table_root: str) -> float:
        t0 = time.perf_counter()
        df = spark.read.format("lake").load(table_root)
        n = df.where(df.commit == probe_commit).count()
        assert n >= 1
        return time.perf_counter() - t0

    bl_on, bl_off = [], []
    bloom_pass(blm.root)  # warm
    for _ in range(3):
        bl_on.append(bloom_pass(blm.root))
        bl_off.append(bloom_pass(src.root))
    # structural evidence: files surviving the planner's pushFilters
    from encode_ingest_spark.lake.datasource import LakeSnapshotReader
    from pyspark.sql.datasource import EqualTo as _Eq

    def _planned_files(table) -> int:
        m = table.current_manifest()
        out_schema = T.StructType(
            [f for f in m.schema.fields if f.name not in ("_seq", "_deleted")]
        )
        r = LakeSnapshotReader(out_schema, {"path": table.root})
        r.pushFilters([_Eq(attribute=("commit",), value=probe_commit)])
        return len(r._files)

    bloom_files, plain_files = _planned_files(blm), _planned_files(src)

    shutil.rmtree(root, ignore_errors=True)
    return {
        "metric": "native DataSource surface vs batch twins",
        "unit": "sec",
        "sf": sf_dir,
        "cpus": cpus,
        "cdc_events": total,
        "sink_stream_sec": round(sink_dt, 3),
        "sink_stream_events_per_sec": round(total / sink_dt, 1),
        "merge_mor_sec": round(merge_dt, 3),
        "merge_mor_events_per_sec": round(total / merge_dt, 1),
        "changelog_rows": chg_rows,
        "source_drain_sec": round(src_dt, 3),
        "source_drain_rows_per_sec": round(chg_rows / src_dt, 1),
        "spark_read_changes_sec": round(spk_dt, 3),
        "point_query_pushdown_sec": round(min(pt_on), 3),
        "point_query_fullscan_sec": round(min(pt_off), 3),
        "point_query_speedup": round(min(pt_off) / min(pt_on), 2),
        "bloom_point_query_sec": round(min(bl_on), 3),
        "plain_point_query_sec": round(min(bl_off), 3),
        "bloom_point_query_speedup": round(min(bl_off) / min(bl_on), 2),
        "bloom_files_planned": bloom_files,
        "plain_files_planned": plain_files,
        "trials": {"sink": [round(x, 3) for x in sink_ts],
                   "merge": [round(x, 3) for x in merge_ts],
                   "source": [round(x, 3) for x in src_ts],
                   "spark_changes": [round(x, 3) for x in spk_ts],
                   "point_on": [round(x, 3) for x in pt_on],
                   "point_off": [round(x, 3) for x in pt_off],
                   "bloom_on": [round(x, 3) for x in bl_on],
                   "bloom_off": [round(x, 3) for x in bl_off]},
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
        "steal_pct": _steal_pct(ticks0, _cpu_ticks()),
    }


def run_zorder_bench(sf_dir: str, cpus: int) -> dict:
    """Z-order clustering payoff, measured: an id-keyed table with two
    INDEPENDENT value dimensions (x row-correlated, y anti-correlated —
    the shape where a lexicographic sort can only serve one of them),
    sf-scaled rows split across many files. For a point predicate on
    each dimension: files scanned + min-of-3 filtered-scan wall,
    BEFORE (unclustered) vs AFTER ``rewrite_clustered(zorder)``.

    The files-scanned ratio is the cluster-scale story (manifest-level
    pruning is what survives a 100× scale-up); wall at sandbox scale is
    fixed-cost-bound and reported for honesty."""
    from encode_ingest_spark.lake import LakeTable, merge_into, rewrite_clustered
    from encode_ingest_spark.session import get_spark
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    load_start = _loadavg()
    ticks0 = _cpu_ticks()
    spark = get_spark("bench-zorder", cores=cpus)
    spark.range(1000).count()
    n = _cdc_keys_for(sf_dir) * 3  # same row scale as the CDC benches
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="bench_z_", dir=shm)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("x", T.LongType(), True),
            T.StructField("y", T.LongType(), True),
            T.StructField("payload", T.StringType(), True),
        ]
    )
    try:
        t = LakeTable.create(
            spark, os.path.join(root, "t"), schema, ["id"], num_buckets=4
        )
        df = spark.range(n).select(
            "id",
            (F.col("id") / 500).cast("long").alias("x"),
            ((n - 1 - F.col("id")) / 500).cast("long").alias("y"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            F.lit("insert").alias("op"),
            F.lit(1).alias("event_seq"),
        )
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "5000")
        merge_into(t, df, batch_id=1)
        xmid, ymid = (n // 2) // 500, (n // 2) // 500

        def probe() -> dict:
            m = t.current_manifest()
            out = {"n_files": len(m.files)}
            for col, v in (("x", xmid), ("y", ymid)):
                kept = t.read(file_value_ranges={col: [v]})
                out[f"files_{col}"] = len(kept.inputFiles())
                walls = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    kept.where(F.col(col) == v).count()
                    walls.append(time.perf_counter() - t0)
                out[f"wall_{col}_sec"] = round(min(walls), 3)
            return out

        before = probe()
        t0 = time.perf_counter()
        rewrite_clustered(t, ["x", "y"], strategy="zorder", bits=4)
        rewrite_sec = time.perf_counter() - t0
        after = probe()
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return {
        "metric": "zorder rewrite payoff (files scanned for a point "
        "predicate per dimension)",
        "rows": n,
        "before": before,
        "after": after,
        "rewrite_sec": round(rewrite_sec, 3),
        "files_scanned_ratio_x": round(
            before["files_x"] / max(after["files_x"], 1), 1
        ),
        "files_scanned_ratio_y": round(
            before["files_y"] / max(after["files_y"], 1), 1
        ),
        "sf": sf_dir,
        "cpus": cpus,
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
        "steal_pct": _steal_pct(ticks0, _cpu_ticks()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cores", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--cdc-only", action="store_true")
    ap.add_argument("--sketch-only", action="store_true")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"])
    ap.add_argument("--flood-pct", type=int, default=0,
                    help="redirect this %% of events to ONE hot key (skew probe)")
    ap.add_argument("--soak", action="store_true",
                    help="endurance soak: MOR stream + derived group + maintain")
    ap.add_argument("--universe", action="store_true",
                    help="entity-universe epoch: incremental vs full recompute")
    ap.add_argument("--universe-soak", action="store_true",
                    help="entity-universe endurance: N epochs + maintain")
    ap.add_argument("--universe-flood", action="store_true",
                    help="hot-group skew probe: one experiment owns 50%% "
                         "of an epoch's changed files vs even spread")
    ap.add_argument("--universe-exp", type=int, default=2000)
    ap.add_argument("--universe-epochs", type=int, default=12)
    ap.add_argument("--datasource", action="store_true",
                    help="native DataSource sink/source vs batch twins")
    ap.add_argument("--zorder", action="store_true",
                    help="zorder rewrite payoff: files pruned for point "
                         "predicates on two independent dimensions")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-low", type=int, default=8)
    ap.add_argument("--scaling-high", type=int, default=32)
    ap.add_argument("--probe", default="cdc", choices=["cdc", "sketch", "cdc-jvms"])
    args = ap.parse_args()

    if args.soak:
        print(json.dumps(run_soak(args.sf_dir, min(args.cores, 16))))
        return
    if args.universe_flood:
        print(json.dumps(run_universe_flood(
            args.sf_dir, args.cores, n_exp=args.universe_exp)))
        return
    if args.universe_soak:
        print(json.dumps(run_universe_soak(
            args.sf_dir, args.cores, n_exp=args.universe_exp,
            epochs=args.universe_epochs)))
        return
    if args.universe:
        print(json.dumps(run_universe_bench(
            args.sf_dir, args.cores, n_exp=args.universe_exp)))
        return
    if args.datasource:
        print(json.dumps(run_datasource_bench(args.sf_dir, args.cores)))
        return
    if args.zorder:
        print(json.dumps(run_zorder_bench(args.sf_dir, args.cores)))
        return
    if args.scaling:
        if args.probe == "cdc-jvms":
            print(
                json.dumps(
                    run_multijvm_scaling(args.sf_dir, args.scaling_low, args.scaling_high)
                )
            )
            return
        print(
            json.dumps(
                run_scaling(args.sf_dir, args.scaling_low, args.scaling_high, args.probe)
            )
        )
        return
    if args.sketch_only:
        from encode_ingest_spark.session import get_spark

        spark = get_spark("bench-sketch", cores=args.cores)
        spark.range(1000).count()
        sec, n = bench_sketch(spark, args.sf_dir)
        print(
            json.dumps(
                {
                    "metric": "sketch stage (minhash16 + simhash32)",
                    "value": round(sec, 3),
                    "unit": "sec",
                    "docs": n,
                    "docs_per_sec": round(n / sec, 1),
                    "cpus": args.cores,
                    "sf": args.sf_dir,
                }
            )
        )
        return
    if args.cdc_only:
        from encode_ingest_spark.session import get_spark

        spark = get_spark("bench-cdc", cores=args.cores)
        spark.range(1000).count()
        # Warm the merge path (JIT + plan cache) at the smallest SF so
        # the timed pass measures steady state, not first-call cost —
        # same rationale as run_bench's warm-up (5.9 s cold vs 3.0 s
        # warm measured on identical code).
        warm_sf = "/root/testdata/sf0.001"
        if os.path.isdir(warm_sf) and warm_sf != args.sf_dir:
            try:
                bench_cdc_merge(spark, warm_sf, n_batches=2, mode=args.mode)
            except Exception:
                pass
        sec, n = bench_cdc_merge(spark, args.sf_dir, n_batches=args.batches,
                                 mode=args.mode, flood_key_pct=args.flood_pct)
        print(
            json.dumps(
                {
                    "metric": "cdc merge e2e",
                    "value": round(sec, 3),
                    "unit": "sec",
                    "cdc_events": n,
                    "events_per_sec": round(n / sec, 1),
                    "cpus": args.cores,
                    "sf": args.sf_dir,
                    "flood_key_pct": args.flood_pct,
                }
            )
        )
        return
    print(json.dumps(run_bench(args.sf_dir, args.cores)))


# ---------------------------------------------------------------------------
# Entity-universe maintenance bench (round 4): the reference's weekly
# full recompute vs one change-driven epoch over the same 13-mapper DAG.
# ---------------------------------------------------------------------------
def _synth_universe_batches(spark, n_exp: int, epoch: int,
                            dirty_exp: int = 0, moved_reps: int = 0,
                            flood: bool = False):
    """Deterministic raw-entity CDC batches, pure column exprs (no
    driver rows): epoch 1 = the full seed; epoch 2 = updates to the
    files of ``dirty_exp`` experiments plus ``moved_reps`` replicate
    FK moves. ``flood=True`` re-points HALF the changed files' datasets
    at experiment EX0 — the one-experiment-owns-50%-of-files hot-group
    shape for the tree-refresh skew probe. event_seq = epoch*1e9 +
    xxhash(@id)%1e9 — deterministic and strictly increasing per key
    across epochs."""
    from encode_ingest_spark.entities.universe import UNIVERSE_SCHEMAS
    from encode_ingest_spark.lake.evolution import align_to_schema
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    E = n_exp

    def fin(name, df):
        target = T.StructType(
            [T.StructField(f.name, f.dataType, True)
             for f in T._parse_datatype_string(UNIVERSE_SCHEMAS[name]).fields]
        )
        out = align_to_schema(df, target)
        return out.withColumn("op", F.lit("upsert")).withColumn(
            "event_seq",
            F.lit(int(epoch)).cast("long") * F.lit(10**9).cast("long")
            + F.abs(F.xxhash64("@id")) % F.lit(10**9).cast("long"),
        )

    def sid(prefix, col):
        return F.concat(F.lit(prefix), col.cast("string"), F.lit("/"))

    i = F.col("id")
    if epoch == 1:
        exp = spark.range(E).select(
            sid("/experiments/EX", i).alias("@id"),
            F.when(i % 2 == 0, "RNA-seq").otherwise("ChIP-seq")
            .alias("assay_term_name"),
            F.concat(F.lit("OBI:"), i.cast("string")).alias("assay_term_id"),
            F.lit("released").alias("status"),
            F.lit("2020-01-01T00:00:00+00:00").alias("date_created"),
            F.array(sid("/replicates/R", i * 2), sid("/replicates/R", i * 2 + 1))
            .alias("replicates"),
        )
        reps = spark.range(2 * E).select(
            sid("/replicates/R", i).alias("@id"),
            sid("/experiments/EX", F.floor(i / 2)).alias("experiment"),
            sid("/libraries/LB", i).alias("library"),
        )
        libs = spark.range(2 * E).select(
            sid("/libraries/LB", i).alias("@id"),
            sid("/biosamples/BS", i % E).alias("biosample"),
            F.lit("2020-01-02T00:00:00+00:00").alias("date_created"),
            F.concat(F.lit("P"), (i % 5).cast("string")).alias("product_id"),
        )
        bios = spark.range(E).select(
            sid("/biosamples/BS", i).alias("@id"),
            F.lit("human").alias("organism"),
            F.lit("adult").alias("human_life_stage"),
            sid("/biosample-types/BT", i % 2).alias("biosample_ontology"),
            F.lit(False).alias("perturbed"),
            F.lit("2020-01-03T00:00:00+00:00").alias("date_created"),
        )
        files = spark.range(4 * E).select(
            sid("/files/F", i).alias("@id"),
            F.when(i % 4 < 2, "raw data").otherwise("alignment")
            .alias("output_category"),
            sid("/experiments/EX", i % E).alias("dataset"),
            F.when(i % 4 < 2, F.array(sid("/biosamples/BS", i % E)))
            .alias("origin_batches"),
            F.when(i % 4 >= 2, F.array(sid("/files/F", i - 2)))
            .alias("derived_from"),
            F.when(i % 4 >= 2, sid("/analysis-step-runs/SR", i))
            .alias("step_run"),
            F.when(i % 4 >= 2, F.array(F.lit("GRCh38"))).alias("assembly"),
            F.array(F.when(i % 2 == 0, "RNA-seq").otherwise("ChIP-seq"))
            .alias("assay_term_name"),
            i.alias("file_size"),
            F.lit("2020-01-04T00:00:00+00:00").alias("date_created"),
        )
        runs = spark.range(4 * E).filter(i % 4 >= 2).select(
            sid("/analysis-step-runs/SR", i).alias("@id"),
            sid("/analysis-step-versions/V", i % 3)
            .alias("analysis_step_version"),
        )
        vers = spark.range(3).select(
            sid("/analysis-step-versions/V", i).alias("@id"),
            F.concat(F.lit("v1."), i.cast("string")).alias("name"),
            sid("/analysis-steps/S", i % 2).alias("analysis_step"),
        )
        steps = spark.range(2).select(
            sid("/analysis-steps/S", i).alias("@id"),
            F.array(sid("/pipelines/P", i)).alias("pipelines"),
        )
        pipes = spark.range(2).select(
            sid("/pipelines/P", i).alias("@id"),
            F.array(F.lit("RNA-seq"), F.lit("ChIP-seq"))
            .alias("assay_term_names"),
            F.concat(F.lit("pipeline "), i.cast("string")).alias("title"),
        )
        orgs = spark.createDataFrame(
            [("/organisms/human/", "Homo sapiens")],
            "`@id` string, scientific_name string",
        )
        bt = spark.range(2).select(
            sid("/biosample-types/BT", i).alias("@id"),
            F.when(i == 0, "tissue").otherwise("cell line")
            .alias("classification"),
            F.concat(F.lit("UBERON:"), i.cast("string")).alias("term_id"),
        )
        return {
            "experiments": fin("experiments", exp),
            "replicates": fin("replicates", reps),
            "libraries": fin("libraries", libs),
            "biosamples": fin("biosamples", bios),
            "files": fin("files", files),
            "analysis_step_runs": fin("analysis_step_runs", runs),
            "analysis_step_versions": fin("analysis_step_versions", vers),
            "analysis_steps": fin("analysis_steps", steps),
            "pipelines": fin("pipelines", pipes),
            "organisms": fin("organisms", orgs),
            "biosample_types": fin("biosample_types", bt),
        }

    # epoch 2: files of the first `dirty_exp` experiments change size;
    # `moved_reps` replicates hop to the next experiment (FK move)
    ds2 = sid("/experiments/EX", i % E)
    if flood:
        ds2 = F.when(i % 2 == 0, sid("/experiments/EX", F.lit(0))).otherwise(ds2)
    files2 = spark.range(4 * E).filter((i % E) < dirty_exp).select(
        sid("/files/F", i).alias("@id"),
        F.when(i % 4 < 2, "raw data").otherwise("alignment")
        .alias("output_category"),
        ds2.alias("dataset"),
        F.when(i % 4 < 2, F.array(sid("/biosamples/BS", i % E)))
        .alias("origin_batches"),
        F.when(i % 4 >= 2, F.array(sid("/files/F", i - 2)))
        .alias("derived_from"),
        F.when(i % 4 >= 2, sid("/analysis-step-runs/SR", i)).alias("step_run"),
        F.when(i % 4 >= 2, F.array(F.lit("GRCh38"))).alias("assembly"),
        F.array(F.when(i % 2 == 0, "RNA-seq").otherwise("ChIP-seq"))
        .alias("assay_term_name"),
        (i + 10_000_000).alias("file_size"),
        F.lit("2020-01-04T00:00:00+00:00").alias("date_created"),
    )
    reps2 = spark.range(moved_reps).select(
        sid("/replicates/R", i * 2).alias("@id"),
        sid("/experiments/EX", (i + 1) % E).alias("experiment"),
        sid("/libraries/LB", i * 2).alias("library"),
    )
    return {"files": fin("files", files2), "replicates": fin("replicates", reps2)}


def run_universe_soak(sf_dir: str, cpus: int, n_exp: int = 2000,
                      epochs: int = 12) -> dict:
    """Endurance soak for the entity-universe layer: many consecutive
    change-driven epochs (rotating dirty slices) with periodic
    maintain() over every raw and derived table. Asserts — and
    reports — final incremental state == transform_all full recompute,
    bounded files/bucket across the whole fleet of tables, and flat
    epoch latency."""
    import time as _time

    from encode_ingest_spark.entities import transform_all
    from encode_ingest_spark.entities.universe import (
        create_entity_targets,
        create_universe,
        merge_universe_batches,
        refresh_entity_universe,
    )
    from encode_ingest_spark.lake import TableGroup
    from encode_ingest_spark.session import get_spark

    spark = get_spark("bench-universe-soak", cores=cpus)
    # lake root on tmpfs, same rationale as bench_cdc_merge: the sink's
    # aggregate bandwidth scales with a real cluster; the sandbox's one
    # virtio disk (~300 MB/s, 44-97% kernel time) would otherwise tax
    # ONLY the incremental side (the full-recompute comparator never
    # writes — it forces to the noop sink)
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="uni_soak_", dir=shm)
    try:
        universe = create_universe(spark, root + "/raw", num_buckets=4)
        targets = create_entity_targets(spark, root + "/out", num_buckets=4)
        group = TableGroup.create(
            spark, root + "/grp",
            {n: t for n, t in targets.items() if not n.startswith("_")},
        )
        seed = _synth_universe_batches(spark, n_exp, epoch=1)
        merge_universe_batches(universe, seed, source_id="soak", batch_id=1)
        fv = {n: 0 for n in universe}
        refresh_entity_universe(spark, universe, targets, fv, batch_id=1,
                                group=group)
        fv = {n: t.current_version() for n, t in universe.items()}

        epoch_secs = []
        for e in range(2, epochs + 2):
            # rotate the dirty slice so every epoch touches a different
            # 16-experiment window (updates) + a couple of FK moves
            ep = _synth_universe_batches(
                spark, n_exp, epoch=e,
                dirty_exp=16 + (e % 3), moved_reps=2,
            )
            merge_universe_batches(universe, ep, source_id="soak",
                                   batch_id=e)
            t0 = _time.perf_counter()
            refresh_entity_universe(spark, universe, targets, fv,
                                    batch_id=e, group=group)
            epoch_secs.append(round(_time.perf_counter() - t0, 2))
            fv = {n: t.current_version() for n, t in universe.items()}
            if e % 4 == 0:
                for t in list(universe.values()) + list(targets.values()):
                    t.maintain(keep_snapshots=3)
                group.expire_snapshots(keep_last=4)

        # invariants
        out = transform_all(spark, {n: t.read() for n, t in universe.items()})
        mismatched = []
        for name, want in out.items():
            got = group.read(name)
            cols = sorted(got.columns)
            a = sorted(tuple(str(v) for v in r)
                       for r in got.select(*cols).collect())
            b = sorted(tuple(str(v) for v in r)
                       for r in want.select(*cols).collect())
            if a != b:
                mismatched.append(name)
        max_fpb = 0
        for t in list(universe.values()) + list(targets.values()):
            per = {}
            for f in t.current_manifest().files:
                per[f.bucket] = per.get(f.bucket, 0) + 1
            if per:
                max_fpb = max(max_fpb, max(per.values()))
        return {
            "metric": "entity-universe endurance soak (%d epochs + maintain)"
                      % epochs,
            "value": round(sum(epoch_secs) / len(epoch_secs), 2),
            "unit": "sec/epoch (mean)",
            "sf": sf_dir,
            "cpus": cpus,
            "n_experiments": n_exp,
            "epochs": epochs,
            "epoch_secs": epoch_secs,
            "mismatched_tables": mismatched,
            "max_files_per_bucket": max_fpb,
            "group_version": group.current_version(),
            "group_history_len": len(group.history()),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_universe_flood(sf_dir: str, cpus: int, n_exp: int = 2000,
                       dirty_exp: int = 64) -> dict:
    """Tree-refresh skew probe (VERDICT r5 directive 7): one experiment
    owning 50% of an epoch's changed files vs the same-sized evenly-
    spread epoch. The merge layer's hot-KEY flood number exists
    (--flood-pct: composite-key hashing absorbs it); this measures the
    hot-GROUP shape the tree layer adds — group-closure restricts pull
    the flooded experiment's whole file set into one aggregate group.
    min-of-2 epochs per shape, interleaved (even, flood, even, flood)
    so a co-tenant spike cannot charge one shape only."""
    from encode_ingest_spark.entities.universe import (
        create_entity_targets,
        create_universe,
        merge_universe_batches,
        refresh_entity_universe,
    )
    from encode_ingest_spark.lake import TableGroup
    from encode_ingest_spark.session import get_spark

    spark = get_spark("bench-universe-flood", cores=cpus)
    load_start = _loadavg()
    ticks_start = _cpu_ticks()
    host_probe = _host_speed_probe()
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="uni_flood_", dir=shm)
    try:
        universe = create_universe(spark, root + "/raw", num_buckets=4)
        targets = create_entity_targets(spark, root + "/out", num_buckets=4)
        group = TableGroup.create(
            spark, root + "/grp",
            {n: t for n, t in targets.items() if not n.startswith("_")},
        )
        seed = _synth_universe_batches(spark, n_exp, epoch=1)
        merge_universe_batches(universe, seed, source_id="flood", batch_id=1)
        fv = {n: 0 for n in universe}
        refresh_entity_universe(spark, universe, targets, fv, batch_id=1,
                                group=group)
        fv = {n: t.current_version() for n, t in universe.items()}

        secs = {"even": [], "flood": []}
        for e, shape in ((2, "even"), (3, "flood"), (4, "even"),
                         (5, "flood")):
            ep = _synth_universe_batches(
                spark, n_exp, epoch=e, dirty_exp=dirty_exp,
                flood=(shape == "flood"),
            )
            merge_universe_batches(universe, ep, source_id="flood",
                                   batch_id=e)
            t0 = time.perf_counter()
            refresh_entity_universe(spark, universe, targets, fv,
                                    batch_id=e, group=group)
            secs[shape].append(round(time.perf_counter() - t0, 3))
            fv = {n: t.current_version() for n, t in universe.items()}
        even, flood = min(secs["even"]), min(secs["flood"])
        return {
            "metric": "entity-universe hot-group flood: one experiment owns "
                      "50% of the epoch's changed files",
            "value": round(flood / even, 3),
            "unit": "epoch-time ratio (flood / even)",
            "sf": sf_dir,
            "cpus": cpus,
            "loadavg_start": load_start,
            "loadavg_end": _loadavg(),
            "steal_pct": _steal_pct(ticks_start, _cpu_ticks()),
            **host_probe,
            "n_experiments": n_exp,
            "dirty_experiments": dirty_exp,
            "epoch_even_sec": even,
            "epoch_flood_sec": flood,
            "epoch_secs": secs,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_universe_bench(sf_dir: str, cpus: int, n_exp: int = 2000,
                       dirty_exp: int = 32, spark=None) -> dict:
    """One change-driven epoch over the full 13-mapper entity DAG vs the
    reference's full-recompute shape (transform_all over the current
    snapshots, COMPUTE ONLY — the incremental side additionally pays all
    its table writes and the group commit, and still wins)."""
    from encode_ingest_spark.entities import transform_all
    from encode_ingest_spark.entities.universe import (
        create_entity_targets,
        create_universe,
        merge_universe_batches,
        refresh_entity_universe,
    )
    from encode_ingest_spark.lake import TableGroup
    from encode_ingest_spark.session import get_spark

    if spark is None:
        spark = get_spark("bench-universe", cores=cpus)
    load_start = _loadavg()
    ticks_start = _cpu_ticks()
    host_probe = _host_speed_probe()
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    root = tempfile.mkdtemp(prefix="uni_bench_", dir=shm)
    try:
        universe = create_universe(spark, root + "/raw", num_buckets=4)
        targets = create_entity_targets(spark, root + "/out", num_buckets=4)
        group = TableGroup.create(
            spark, root + "/grp",
            {n: t for n, t in targets.items() if not n.startswith("_")},
        )
        seed = _synth_universe_batches(spark, n_exp, epoch=1)
        merge_universe_batches(universe, seed, source_id="bench", batch_id=1)
        fv = {n: 0 for n in universe}
        t0 = time.perf_counter()
        refresh_entity_universe(spark, universe, targets, fv, batch_id=1,
                                group=group)
        boot_sec = time.perf_counter() - t0
        fv = {n: t.current_version() for n, t in universe.items()}

        # min-of-3 change epochs (same dirty size, rotating epoch ids):
        # a single epoch is one co-tenant spike away from nonsense —
        # same rationale as bench_cdc_merge's min-of-3 passes
        epoch_secs = []
        for e in (2, 3, 4):
            ep = _synth_universe_batches(spark, n_exp, epoch=e,
                                         dirty_exp=dirty_exp, moved_reps=8)
            merge_universe_batches(universe, ep, source_id="bench",
                                   batch_id=e)
            t0 = time.perf_counter()
            refresh_entity_universe(spark, universe, targets, fv, batch_id=e,
                                    group=group)
            epoch_secs.append(round(time.perf_counter() - t0, 3))
            fv = {n: t.current_version() for n, t in universe.items()}
        inc_sec = min(epoch_secs)

        # the reference's full-recompute comparator, both shapes (its
        # weekly job WRITES its outputs): compute-only (noop sink, the
        # conservative comparison) and compute+write (overwrite the same
        # 15 bucketed tables — what a scheduled full rebuild really pays)
        full_secs = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = transform_all(
                spark, {n: t.read() for n, t in universe.items()}
            )
            for df in out.values():
                _force(df)
            full_secs.append(round(time.perf_counter() - t0, 3))
        full_sec = min(full_secs)
        t0 = time.perf_counter()
        out = transform_all(spark, {n: t.read() for n, t in universe.items()})
        for name, df in out.items():
            targets[name].overwrite(df)
        full_write_sec = round(time.perf_counter() - t0, 3)
        return {
            "metric": "entity-universe epoch: incremental refresh vs full "
                      "recompute (13 mappers / 15 tables)",
            "value": round(inc_sec, 3),
            "unit": "sec",
            "sf": sf_dir,
            "cpus": cpus,
            "loadavg_start": load_start,
            "loadavg_end": _loadavg(),
            "steal_pct": _steal_pct(ticks_start, _cpu_ticks()),
            **host_probe,
            "n_experiments": n_exp,
            "dirty_experiments": dirty_exp,
            "bootstrap_sec": round(boot_sec, 3),
            "incremental_epoch_sec": round(inc_sec, 3),
            "epoch_secs": epoch_secs,
            "full_recompute_sec": round(full_sec, 3),
            "full_recompute_write_sec": full_write_sec,
            "speedup_vs_full": round(full_sec / inc_sec, 2),
            "speedup_vs_full_write": round(full_write_sec / inc_sec, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

