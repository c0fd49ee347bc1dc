"""SparkSession factory with scale-aware defaults.

Local mode is a single JVM, so ``spark.driver.memory`` is the only memory
knob. The configuration below is what we would also ship for a real
multi-executor cluster (spark-submit --py-files): AQE on for runtime
re-planning (skew-join splitting, post-shuffle coalescing), shuffle
partitions sized to cores rather than the 200 default, Arrow enabled for
the vectorized pandas-UDF path, and a pinned UTC session timezone so
results compare bit-for-bit against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "encode_ingest_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores`` controls ``local[N]`` — the two-cluster-size scaling benchmark
    runs the identical job at two values of N (e.g. 8 vs 32) to evidence
    throughput scaling efficiency (BASELINE.md).
    """
    n = cores or default_parallelism()
    # Under spark-submit the master/executor topology belongs to the
    # submit command (--master yarn/k8s, --num-executors ...); forcing
    # local[N] here would silently collapse a cluster job to one JVM.
    # Detection: spark-submit of a Python app launches the driver from
    # an ALREADY-RUNNING JVM gateway and hands the python process its
    # port via PYSPARK_GATEWAY_PORT (that JVM's conf carries the submit
    # command's spark.master); bin/pyspark instead passes the submit
    # line via PYSPARK_SUBMIT_ARGS. Either signal means the topology is
    # owned elsewhere — leave spark.master alone.
    builder = SparkSession.builder
    if (
        "PYSPARK_GATEWAY_PORT" not in os.environ
        and "--master" not in os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    ):
        builder = builder.master(f"local[{n}]")
        # Python workers resolve imports from the PYTHONPATH the JVM
        # inherits, not from the driver's sys.path — a driver started
        # outside the repo (sys.path.insert) would strand pickled
        # module references (Python DataSources, module-level pandas
        # UDFs) in the workers. Export this package's parent before
        # the gateway launches; under spark-submit (gateway already
        # running) --py-files owns distribution and this is skipped.
        pkg_parent = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        pp = os.environ.get("PYTHONPATH", "")
        if pkg_parent not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pkg_parent + (os.pathsep + pp if pp else "")
            )
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size reducers by DATA, not cores: start wide and let AQE
        # coalesce to ~64 MB targets — shuffle.partitions == cores makes
        # multi-GB reducer partitions on big batches (observed: sort-agg
        # spill collapse on a 4 GB micro-batch at local[2])
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(4 * n, 128)),
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Join strategy (guide §3.1/§9): let the planner pick shuffled
        # hash join when its size conditions hold (sort-merge pays two
        # sorts for no benefit when a per-partition build side fits in
        # memory), and let AQE rewrite a planned sort-merge to shuffled
        # hash at runtime when every post-shuffle partition is small.
        # The 64m runtime threshold matches advisoryPartitionSizeInBytes
        # — after AQE coalescing a build partition is ~64 MB, well
        # within executor memory at any scale; the planner-side choice
        # is additionally guarded by Spark's own canBuildLocalHashMap
        # (plan size < shuffle.partitions × autoBroadcastJoinThreshold).
        # Measured on this suite (sf1.0): j2 −20%, q3 −28%, q1 −8%,
        # no regressions. Override via env for A/B.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP_MAX", "64m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # PySpark 4 wraps EVERY DataFrame/Column API call with a
        # call-site capture for error context: a conf.get py4j round
        # trip + a JVM PySparkCurrentOrigin.set + Python frame
        # inspection PER CALL. At micro-batch scale that is pure driver
        # fixed cost (profiled: ~1,900 wrapped calls and ~4 s of an
        # entity-universe epoch). Trade the prettier error call sites
        # for Spark-3-style errors; plan construction drops to one
        # py4j round trip per expression.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Spark 4.1's single-pass analyzer: every DataFrame operation
        # eagerly analyzes its plan, and at micro-batch cadence that
        # fixed-point analysis is pure driver fixed cost (profiled: the
        # memoized 8-expression CDC generator template still paid ~40 ms
        # per batch INSIDE Dataset.select; single-pass cuts it to
        # ~17 ms, 2.4x). Worth real wall time on every merge/epoch/plan-
        # heavy path; the full suite (incl. all 50 DuckDB oracle
        # parities) gates its semantics. Opt out via env for A/B.
        # "Tentatively": single-pass resolves what it supports and falls
        # back to the fixed-point analyzer per-plan otherwise (the plain
        # .enabled flag instead THROWS on e.g. RepartitionByExpression).
        .config(
            "spark.sql.analyzer.singlePassResolver.enabledTentatively",
            os.environ.get("SPARK_GRAFT_SINGLE_PASS_ANALYZER", "true"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark 4.1 HARD-FAILS a Python DataSource reader that
        # implements pushFilters while this is false — and the native
        # "lake" reader's bucket/file pruning is one
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # local mode = one JVM; this is the only memory knob that matters.
        # The sandbox box has 128 GiB — size the heap so 32 concurrent
        # tasks shuffling wide text rows never thrash GC.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
        # ParallelGC + pre-touched heap: the wide-string CDC payloads
        # allocate fast enough that G1's region management plus first-
        # touch page faults put the JVM at >90% kernel time beyond ~8
        # task threads (observed 4x throughput at local[32] from this
        # alone). Pre-touch moves the page-zeroing cost to startup.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS", "-XX:+AlwaysPreTouch -XX:+UseParallelGC"
            ),
        )
    )
    # Shuffle/spill files on tmpfs when available: the sandbox's /tmp is a
    # virtio disk whose writeback shows up as 90%+ kernel time and
    # flat-lines scaling; /dev/shm approximates the local NVMe a real
    # executor would use. Overridable via SPARK_LOCAL_DIRS.
    if "SPARK_LOCAL_DIRS" not in os.environ and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
