"""Deterministic synthetic repo-file CDC data (BASELINE.json input_hint).

Generates, entirely inside Spark (no driver-side row loops, no RNG state —
every value is a pure function of a row index and a seed, so any subset of
the stream can be regenerated bit-identically at any scale):

* ``repo_files``  — base lake table ``(repo, path, commit, lang, content)``
* ``repo_file_events`` — CDC log ``(op, event_seq, event_ts, repo, path,
  commit, lang, content)`` with out-of-order delivery, updates, deletes and
  Zipf-skewed hot repos (FIXTURES.md §§1-2).

Determinism technique: ``spark.range(n)`` + column expressions only —
``xxhash64(id, seed)`` drives every pseudo-random choice. This scales to
10^10 rows (range is split across partitions; no data is ever on the
driver) and is reproducible regardless of partitioning, cluster size, or
task retries — the property the crash-resume tests rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "scala", "java", "go", "rust", "sql", "md", "yaml"]


def _h(seed: int, *cols) -> F.Column:
    """Non-negative deterministic hash of (cols, seed)."""
    return F.abs(F.xxhash64(*cols, F.lit(seed)))


def _repo(idx: F.Column, n_repos: int, seed: int) -> F.Column:
    """Zipf-ish skewed repo pick: ~30% of rows land on repo 0, ~15% on
    repo 1, tail uniform — exercises hot-key handling (FIXTURES.md §1)."""
    r = _h(seed + 1, idx) % 100
    uniform = _h(seed + 2, idx) % F.lit(n_repos)
    return F.concat(
        F.lit("org"),
        ((_h(seed + 3, idx) % 7)).cast("string"),
        F.lit("/repo"),
        F.when(r < 30, F.lit(0))
        .when(r < 45, F.lit(1))
        .when(r < 55, F.lit(2))
        .otherwise(uniform)
        .cast("string"),
    )


def _content(idx: F.Column, seed: int) -> F.Column:
    """Deterministic pseudo-source text, 64-4096 chars: a repeated token
    stream derived from the row hash. Cheap (repeat + concat, codegen'd)
    but unique per (idx, seed) via the embedded hash header."""
    h1 = _h(seed + 10, idx)
    h2 = _h(seed + 11, idx)
    reps = (h1 % 64 + 4).cast("int")
    token = F.concat(
        F.lit("def fn_"),
        F.conv(h2.cast("string"), 10, 16),
        F.lit("(x):\n    return x * "),
        (h2 % 997).cast("string"),
        F.lit("\n"),
    )
    header = F.concat(F.lit("# file-"), F.conv(h1.cast("string"), 10, 16), F.lit("\n"))
    return F.concat(header, F.repeat(token, reps))


def repo_files(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_repos: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Base table: one row per (repo, path, commit); pure column exprs."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    idx = F.col("id")
    return df.select(
        _repo(idx, n_repos, seed).alias("repo"),
        F.concat(
            F.lit("src/"),
            (_h(seed + 4, idx) % 20).cast("string"),
            F.lit("/f"),
            idx.cast("string"),
            F.lit("."),
            F.element_at(F.array(*[F.lit(x) for x in LANGS]), (_h(seed + 5, idx) % 8 + 1).cast("int")),
        ).alias("path"),
        F.lpad(F.lower(F.conv(_h(seed + 6, idx).cast("string"), 10, 16)), 40, "0").alias(
            "commit"
        ),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]), (_h(seed + 5, idx) % 8 + 1).cast("int")
        ).alias("lang"),
        _content(idx, seed).alias("content"),
    )


def _affine_coeffs(n: int, seed: int) -> tuple[int, int]:
    """Coefficients of a bijective affine scramble slot' = (a·slot+b) mod n.
    ``a`` is kept ~2^20 so a·slot stays far inside int64 up to n ≈ 10^12
    (the 10^10-event scale with headroom); gcd(a, n) = 1 ⇒ full period."""
    import math

    a = 1_000_003 + 2 * (seed % 101)
    while math.gcd(a, n) != 1:
        a += 2
    return a, (seed * 7919) % n


#: plan-template memo for repo_file_events — see the comment at its use.
#: Maps (applicationId, generator params) → list[Column]. Holds at most
#: one entry (cleared on key change) so stale-JVM references never pile
#: up across session restarts.
_EVENT_EXPRS_CACHE: dict[tuple, list] = {}


def repo_file_events(
    spark: SparkSession,
    n_keys: int,
    events_per_key: int = 3,
    seed: int = 42,
    n_repos: int = 50,
    delete_pct: int = 10,
    partitions: int | None = None,
    slot_range: tuple[int, int] | None = None,
    flood_key_pct: int = 0,
) -> DataFrame:
    """CDC log: ``events_per_key`` events per key, shuffled delivery order.

    Per key k and version v (0..events_per_key-1):
      * event_seq = v * n_keys + k  (strictly increasing per key, globally
        interleaved)
      * op: first version 'insert'; later versions 'update', except
        ~delete_pct% of keys whose LAST version is 'delete'
      * content varies per version (update really changes the row)
      * delivery order (row order) is an affine permutation of the event
        index — within- and across-batch out-of-order (the dedup test
        scenario) WITHOUT a global sort: the previous hash-rank ``orderBy``
        cost a range-partitioner sampling pass (re-executing generation)
        plus a full shuffle+sort of the content payload PER CONSUMER.
      * ``slot_range=(lo, hi)`` generates only delivery slots [lo, hi) —
        a micro-batch slice straight off the range source (no generate-
        all-then-filter); slices are disjoint and their union is the
        full stream.
    """
    n = n_keys * events_per_key
    lo, hi = slot_range if slot_range is not None else (0, n)
    if partitions is None:
        # scale-adaptive slice partitioning (guide §2): size map tasks by
        # the SLICE, not the cluster — a 15k-event micro-batch on 32 fixed
        # slices pays 32 task launches for ~500 rows each (measured −12%
        # on the MOR merge bench from this alone), while a 10^9-row slice
        # still caps at the cluster's parallelism exactly as before.
        # ~2000 rows ≈ 4 MB of generated content per task (env-tunable).
        import os as _os

        target = int(_os.environ.get("SPARK_GRAFT_GEN_ROWS_PER_PARTITION", "2000"))
        partitions = max(
            1,
            min(spark.sparkContext.defaultParallelism, -(-(hi - lo) // target)),
        )
    df = spark.range(lo, hi, 1, partitions)
    # The expression template is identical for every micro-batch slice of
    # one stream (only the range bounds differ), but building it costs
    # ~600 py4j round trips (~70 ms) — pure driver fixed cost per batch
    # (guide §1.2: per-task work includes the driver's). Column objects
    # are immutable and reusable across DataFrames, so memoize the list
    # per (params, JVM application). This caches a PLAN TEMPLATE, never
    # data: every batch still computes its rows from the range source.
    key = (
        spark.sparkContext.applicationId,
        n_keys, events_per_key, seed, n_repos, delete_pct, flood_key_pct,
    )
    exprs = _EVENT_EXPRS_CACHE.get(key)
    if exprs is None:
        exprs = event_exprs(
            F.col("id"),
            n_keys=n_keys,
            events_per_key=events_per_key,
            seed=seed,
            n_repos=n_repos,
            delete_pct=delete_pct,
            flood_key_pct=flood_key_pct,
        )
        _EVENT_EXPRS_CACHE.clear()  # one app's templates at a time
        _EVENT_EXPRS_CACHE[key] = exprs
    return df.select(*exprs)


def event_exprs(
    slot: F.Column,
    n_keys: int,
    events_per_key: int = 3,
    seed: int = 42,
    n_repos: int = 50,
    delete_pct: int = 10,
    flood_key_pct: int = 0,
) -> list[F.Column]:
    """The CDC-event column expressions over a delivery-slot column —
    shared by the batch generator (spark.range) and the streaming rate
    source adapter (rate-micro-batch ``value``), so both emit the SAME
    deterministic stream.

    ``flood_key_pct`` > 0 redirects that percentage of ALL events to key
    0 — the pathological single-(repo,path,commit) flood (a bot rewriting
    one file). event_seq stays strictly increasing per key (floods take
    the raw scrambled index as their seq, unique across the stream and
    interleaved with everyone else's; key 0's own base events remain).
    Exercises the in-batch pre-aggregation bound: the merge's partial
    (map-side) aggregate collapses the hot key per input partition before
    any shuffle, so one reducer never sees the full flood."""
    n = n_keys * events_per_key
    # bijective scramble: slot (delivery order) -> event index (k, v);
    # every (k, v) appears exactly once across the full slot range
    a, b = _affine_coeffs(n, seed + 20)
    scr = (slot * F.lit(a) + F.lit(b)) % F.lit(n)
    k = (scr % n_keys).cast("long")
    v = F.floor(scr / n_keys).cast("long")
    seq = v * n_keys + k
    if flood_key_pct:
        is_flood = (_h(seed + 30, scr) % 100) < flood_key_pct
        k = F.when(is_flood, F.lit(0).cast("long")).otherwise(k)
        v = F.when(is_flood, F.lit(0).cast("long")).otherwise(v)
        # flood seqs sit past every base seq (n + scrambled index —
        # unique, per-key increasing), so the flood's last write wins
        seq = F.when(is_flood, F.lit(n) + scr).otherwise(seq)
    key_idx = k
    is_deleted_key = (_h(seed + 21, key_idx) % 100) < delete_pct
    last_v = events_per_key - 1
    op = (
        F.when(v == 0, F.lit("insert"))
        .when((v == last_v) & is_deleted_key, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    content_idx = key_idx * F.lit(1000) + v  # distinct content per version
    return [
        op.alias("op"),
        seq.alias("event_seq"),
        F.to_timestamp(
            F.from_unixtime(F.lit(1700000000) + (v * n_keys + k) + (_h(seed + 22, scr) % 120))
        ).alias("event_ts"),
        _repo(key_idx, n_repos, seed).alias("repo"),
        F.concat(
            F.lit("src/"),
            (_h(seed + 4, key_idx) % 20).cast("string"),
            F.lit("/f"),
            key_idx.cast("string"),
            F.lit("."),
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]), (_h(seed + 5, key_idx) % 8 + 1).cast("int")
            ),
        ).alias("path"),
        F.lpad(
            F.lower(F.conv(_h(seed + 6, key_idx).cast("string"), 10, 16)), 40, "0"
        ).alias("commit"),
        F.when(op == "delete", F.lit(None)).otherwise(
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]), (_h(seed + 5, key_idx) % 8 + 1).cast("int")
            )
        ).alias("lang"),
        F.when(op == "delete", F.lit(None)).otherwise(_content(content_idx, seed)).alias(
            "content"
        ),
    ]
