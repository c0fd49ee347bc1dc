"""CDC MERGE INTO for LakeTable — partition-pruned copy-on-write upsert.

Semantics (generalizing the reference's diff → soft-delete → append steps,
reference: orchestration/templates/ingest-processed-data.yaml:86-172):

Given a change batch with key columns, payload columns, an ``op`` column
(``insert``/``update``/``upsert``/``delete``) and a per-key monotone
``event_seq``, the post-merge table state holds, for every key, the row
carried by the highest event_seq ever seen — materialized as a tombstone
(``_deleted=true``) when that event is a delete. Tombstones are retained so
a late, lower-seq update can never resurrect a deleted key; ``read()``
filters them out.

Execution strategy (the scale-critical part) — two COW paths chosen by
target size (driver-side, from manifest row counts), plus MOR:

* **DIRECT** (small targets, ≤ ``merge.stage.threshold_rows``): ONE Spark
  job — raw batch ∪ current table → one whole-row ``max_by`` per key
  ordered by ``(event_seq, priority)`` (in-batch dup resolution and
  batch-vs-table supersession in the same aggregate; an exact replay with
  equal seq is deterministically won by the incoming row) → write. Below
  the threshold a full rewrite costs less than staging the batch.
* **STAGED** (large targets): the batch winners (pre-deduped, one
  whole-row max_by) are staged as parquet under the table root — the
  batch-side pipeline (stream decode / parse CPU) runs exactly once and
  the staged file is an optimizer barrier — then the bucket probe is a
  column-pruned int scan, ONLY touched buckets are read, merged (same
  union + max_by), and rewritten. Untouched buckets' files are carried
  into the new snapshot by reference — zero IO: the steady state at
  10^10 rows (thousands of buckets, few touched per micro-batch).
* **MOR** (``mode="mor"``): batch winners append as delta files; the
  read path resolves last-writer-wins; a delta-count threshold triggers
  auto-compaction.

Shared mechanics:

* **One full-data shuffle** — the union aggregate is fed by
  ``repartition(num_buckets, *keys)``, whose HashPartitioning IS the
  bucket expression ``pmod(hash(keys), B)``: the aggregate needs no
  second exchange and every post-agg partition holds whole buckets, so
  the bucket-partitioned write needs no routing shuffle either.
* **Whole-row max_by** — tied rows can never blend column values.
* **Skew** — the grouping key is the full (repo, path, commit) tuple, so
  a hot ``repo`` does NOT concentrate on one reducer — hashing the
  composite key is itself the skew mitigation (cf. SURVEY.md §2.3 notes;
  repo-only aggregations use operators/skew.py salting instead).
* **Write + atomic commit** — the new manifest swaps in new files for
  touched buckets only. A crash before commit leaves orphan data files
  and an unchanged CURRENT pointer: replay is safe (exactly-once via the
  batch-id fence).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .table import (
    BUCKET_COL,
    DELETED_COL,
    SEQ_COL,
    CommitConflictError,
    DataFile,
    LakeTable,
    Manifest,
    bucket_expr,
)

OP_COL = "op"
EVENT_SEQ_COL = "event_seq"
EVENT_TS_COL = "event_ts"
#: CDC envelope columns — stream metadata, never table payload
#: (event_ts is consumed by the streaming layer's watermark, not stored)
METADATA_COLS = (OP_COL, EVENT_SEQ_COL, EVENT_TS_COL)

_PRIORITY = "_prio"
_TARGET_LIVE = "_target_live"
#: auto threshold (live table rows) between the DIRECT one-job COW merge
#: (small targets: full rewrite beats staging the batch) and the STAGED
#: merge (stage batch → probe → prune → partial rewrite); override per
#: table via property "merge.stage.threshold_rows"
_STAGE_THRESHOLD_ROWS = 5_000_000
#: auto ceiling (batch winner rows) for the staged BROADCAST sub-strategy
#: — (key, seq, deleted) of every winner must fit a broadcast relation
#: (~100 B/key ⇒ ~200 MB at the default); override per table via
#: property "merge.broadcast.threshold_rows"
_BROADCAST_THRESHOLD_ROWS = 2_000_000
#: file-growth bound for append-shaped write paths (the broadcast merge
#: writes survivors+winners = 2 files per touched bucket per merge): any
#: bucket exceeding this many files is folded back to one after the
#: commit. Override per table via property "compact.max_files_per_bucket"
#: (0 = never auto-fold).
_MAX_FILES_PER_BUCKET = 8


def normalize_batch(batch: DataFrame, schema, keys) -> DataFrame:
    """Normalize a CDC batch to table shape: payload nulled on deletes,
    ``event_seq`` → ``_seq``, ``op`` → ``_deleted``, missing columns
    null-filled and types aligned to ``schema`` — fused as ONE
    selectExpr. A per-column Column build here costs ~6 py4j round-trips
    × width × every merge — on a 15-tree refresh epoch that driver-side
    cost IS the epoch floor (measured; the expressions are identical
    either way and stay inside whole-stage codegen)."""
    have = {f.name: f.dataType for f in batch.schema.fields}
    exprs = []
    for f in schema.fields:
        if f.name == SEQ_COL:
            exprs.append(f"CAST(`{EVENT_SEQ_COL}` AS BIGINT) AS `{SEQ_COL}`")
            continue
        if f.name == DELETED_COL:
            exprs.append(f"(`{OP_COL}` = 'delete') AS `{DELETED_COL}`")
            continue
        src = have.get(f.name)
        ddl = f.dataType.simpleString()
        if src is None:
            exprs.append(f"CAST(NULL AS {ddl}) AS `{f.name}`")
        elif f.name in keys:
            if src.simpleString() == ddl:
                exprs.append(f"`{f.name}`")
            else:
                exprs.append(f"CAST(`{f.name}` AS {ddl}) AS `{f.name}`")
        else:
            e = f"IF(`{OP_COL}` = 'delete', NULL, `{f.name}`)"
            if src.simpleString() != ddl:
                e = f"CAST({e} AS {ddl})"
            exprs.append(f"{e} AS `{f.name}`")
    return batch.selectExpr(*exprs)


class LocalPathUnsupportedError(ValueError):
    """The driver-local delta path cannot process this batch (e.g. a
    CHECK constraint whose expression only Spark can evaluate) — the
    DATA may be perfectly valid. Callers with a distributed fallback
    (``merge_small_batch``) catch this and re-route to ``merge_into``;
    direct ``merge_local_delta`` callers see the actionable message."""


class ConstraintViolationError(ValueError):
    """A CDC batch violates a table constraint. Raised BEFORE anything
    lands — table state is untouched, the offending batch is the
    caller's to fix or quarantine (Delta's constraint contract).

    Constraints live as table properties (set at ``create`` or via
    ``set_properties`` — the ``ALTER TABLE ADD CONSTRAINT`` analogue):

    * ``constraints.not_null`` = ``"col1,col2"`` — the named columns
      must be non-null on every LIVE (non-delete) row.
    * ``constraints.check.<name>`` = ``<ANSI boolean expr>`` — every
      live row must NOT make the expression FALSE (a NULL result
      passes, the SQL CHECK rule).

    Delete events are exempt: CDC tombstones carry nulled payloads by
    construction (normalize_batch), which is content, not corruption.
    Enforcement costs one bounded validation pass over the batch
    winners and only runs when constraints are configured."""


def table_constraints(m) -> tuple[list[str], dict[str, str]]:
    """(not_null columns, {name: check expr}) from manifest properties.

    Tokens are whitespace-stripped: a natural "repo, path" value would
    otherwise yield the unresolvable column ' path' and fail every
    subsequent merge with an analysis error instead of enforcing."""
    nn = [
        c.strip()
        for c in m.properties.get("constraints.not_null", "").split(",")
        if c.strip()
    ]
    checks = {
        k[len("constraints.check."):]: v
        for k, v in m.properties.items()
        if k.startswith("constraints.check.") and v
    }
    return nn, checks


def _enforce_constraints(winners: DataFrame, m) -> None:
    """Validate normalized batch winners against the table's declared
    constraints — ONE bounded action (``limit(4).collect()``), skipped
    entirely when the table declares none. Runs on the WINNERS (the
    rows that will actually land), not the raw batch: a violating row
    superseded in-batch by a clean one is not an error."""
    nn, checks = table_constraints(m)
    if not nn and not checks:
        return
    conds: list[tuple[str, str]] = []
    for c in nn:
        conds.append((f"not_null:{c}", f"`{c}` IS NULL"))
    for name, expr in checks.items():
        # NULL result passes (SQL CHECK rule) — only FALSE violates
        conds.append((f"check:{name}", f"NOT COALESCE(({expr}), TRUE)"))
    any_viol = " OR ".join(f"({e})" for _, e in conds)
    flags = [
        f"({e}) AS `__viol_{i}`" for i, (_, e) in enumerate(conds)
    ]
    sample = (
        winners.where(f"(NOT `{DELETED_COL}`) AND ({any_viol})")
        .selectExpr(*[f"`{k}`" for k in m.key_cols], *flags)
        .limit(4)
        .collect()
    )
    if not sample:
        return
    lines = []
    for r in sample:
        d = r.asDict()
        broken = [
            conds[i][0] for i in range(len(conds)) if d.get(f"__viol_{i}")
        ]
        keys = {k: d[k] for k in m.key_cols}
        lines.append(f"{keys} -> {broken}")
    raise ConstraintViolationError(
        f"batch violates table constraints (first {len(sample)} shown): "
        + "; ".join(lines)
    )


class MergeResult:
    def __init__(
        self,
        manifest: Manifest,
        counts: dict[str, int],
        skipped: bool,
        stale: bool = False,
    ):
        self.manifest = manifest
        self.counts = counts
        self.skipped = skipped
        # skipped because the caller's ``expected_watermark`` CAS failed
        # (another writer advanced/rewound this source's watermark since
        # the caller computed its batch) — the caller should recompute
        # from the CURRENT watermark and retry, unlike a fence skip
        # (which means THIS batch already landed)
        self.stale = stale

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"MergeResult(v={self.manifest.version}, counts={self.counts}, "
            f"skipped={self.skipped}, stale={self.stale})"
        )


def _watermark_stale(
    m: Manifest, source_id: str, expected_watermark: int | None
) -> bool:
    """True when the caller's compare-and-swap precondition fails: the
    table's CURRENT watermark for ``source_id`` is not the one the
    caller derived its batch from (-1 = no watermark yet). Guards the
    span-continuity of checkpointed consumers (ChangeFeedFollower):
    two overlapping polls sharing a stale checkpoint would otherwise
    both commit, and the wider (possibly empty) span could advance the
    checkpoint past the narrower span's rows."""
    if expected_watermark is None:
        return False
    wm = m.watermarks.get(source_id)
    cur = int(wm.get("batch_id", -1)) if wm is not None else -1
    return cur != int(expected_watermark)


def merge_into(
    table: LakeTable,
    batch: DataFrame,
    source_id: str = "default",
    batch_id: int | None = None,
    offset_range: tuple[int, int] | None = None,
    evolve: bool = True,
    prune_buckets: bool | None = None,
    mode: str = "cow",
    mor_compact_threshold: int | None = None,
    stage_batch: bool | None = None,
    merge_strategy: str | None = None,
    batch_unique: bool = False,
    expected_watermark: int | None = None,
    dml_origin: bool = False,
) -> MergeResult:
    """Apply one CDC batch to the table. See module docstring.

    ``batch`` columns: table key cols + payload cols + ``op`` + ``event_seq``.
    ``batch_id``: exactly-once fence — if the table has already committed a
    batch with id >= batch_id for this source, the call is a no-op (the
    reference's idempotency contract, ingest-processed-data.yaml:10-11).
    ``evolve``: reconcile new/widened batch columns into the table schema
    before merging (ALTER-then-MERGE, FIXTURES.md §2).
    ``mode``: ``"cow"`` (default) rewrites touched buckets — cheap reads,
    write amplification proportional to bucket residency. ``"mor"``
    appends the batch's in-batch winners as DELTA files — writes only
    the batch (the high-key-overlap steady state at 10^10 events writes
    ~2x less), reads pay a per-key max_by until ``compact_deltas()``
    folds them (``mor_compact_threshold`` / table property
    "mor.compact.threshold" triggers that automatically). Same
    last-writer-wins semantics either way (the read path resolves by
    event_seq; replay ties are content-identical).
    ``stage_batch``: COW strategy override — ``None`` (auto) stages the
    batch when the live table exceeds "merge.stage.threshold_rows"
    (default 5M) or when ``prune_buckets`` asks for the probe; ``False``
    forces the direct one-job full rewrite; ``True`` forces staging.
    ``batch_unique``: the CALLER asserts the batch holds at most one row
    per key, so the in-batch winners aggregate (one full-batch shuffle)
    is skipped. Derived-table refresh epochs qualify by construction
    (upserts are a per-id semi-join of a one-row-per-entity build;
    deletes are the disjoint anti-join) — with ``mode="mor"`` the whole
    merge is then ONE shuffle-free append of the change set, which is
    what keeps epoch write cost proportional to the change set rather
    than the corpus. A violated assertion degrades, not corrupts: equal
    event_seq duplicates resolve to an arbitrary-but-atomic whole-row
    winner at read time, exactly like a replay tie.
    ``dml_origin``: marks MOR delta files written by this merge as
    DML-minted (manifest flag, see DataFile.dml) so their rows lose an
    exact event_seq tie to real CDC rows at read time.
    ``expected_watermark``: optional compare-and-swap on this source's
    CURRENT watermark batch_id (-1 = none yet) — when it no longer
    matches, the commit is skipped with ``stale=True`` instead of
    landing a batch derived from an outdated checkpoint (span
    continuity for checkpointed consumers; see ChangeFeedFollower).
    The CAS is re-checked on every append-rebase retry, so a racing
    writer can never slip between the check and the commit.
    """
    if mode not in ("cow", "mor"):
        raise ValueError(f"unknown merge mode {mode!r} (expected 'cow' or 'mor')")
    m = table.current_manifest()

    # ---- exactly-once fence ----
    if batch_id is not None:
        wm = m.watermarks.get(source_id)
        if wm is not None and wm.get("batch_id", -1) >= batch_id:
            return MergeResult(m, {"inserted": 0, "updated": 0, "deleted": 0}, skipped=True)
    if _watermark_stale(m, source_id, expected_watermark):
        return MergeResult(
            m, {"inserted": 0, "updated": 0, "deleted": 0},
            skipped=True, stale=True,
        )

    # ---- schema evolution (metadata-only commit) ----
    batch = batch.drop(EVENT_TS_COL)
    if evolve:
        m = table.evolve_schema(batch.drop(OP_COL, EVENT_SEQ_COL).schema)
    schema = m.schema
    keys = m.key_cols
    data_cols = [f.name for f in schema.fields if f.name not in (SEQ_COL, DELETED_COL)]

    payload = normalize_batch(batch, schema, keys)

    # ---- 1. in-batch dedup → WINNERS. One whole-row max_by per key
    # (atomic: an event_seq tie can never blend column values from two
    # rows — replay ties are contract-identical, so the arbitrary-but-
    # atomic winner is deterministic state), bucket id attached. ----
    non_key = [c for c in payload.columns if c not in keys]
    seq_order = F.coalesce(F.col(SEQ_COL), F.lit(-1))
    winners_bucket_aligned = False

    def build_winners(bucket_aligned: bool):
        src = payload
        if bucket_aligned:
            # ONE bucket-aligned shuffle for agg AND write (same trick
            # as _merge_cow_write): repartition(B, keys) is
            # HashPartitioning(keys, B) = pmod(murmur3(keys), B) =
            # bucket_expr, so the aggregate inserts no exchange of its
            # own and every post-agg partition holds exactly one bucket
            # — _stage_write can skip its routing shuffle. The
            # alternative (groupBy straight off the batch) shuffles
            # through AQE's initialPartitionNum fan-out and then
            # _stage_write shuffles AGAIN by bucket token: measured on
            # the 15k-event bench batch, agg-only 0.56 s vs 0.22 s
            # bucket-aligned (guide §2.4 — two operations keyed the
            # same way share one exchange). Used by the MOR append,
            # whose agg output IS the written layout; the staged COW
            # path keeps the AQE shape instead — its stage file is
            # re-shuffled by the union-agg anyway, and a forced
            # B-partition stage would just write B tiny files.
            src = payload.repartition(
                m.num_buckets, *[F.col(c) for c in keys]
            )
        return (
            src.groupBy(*keys)
            .agg(F.max_by(F.struct(*non_key), seq_order).alias("_w"))
            .select(*keys, "_w.*")
            .withColumn(BUCKET_COL, bucket_expr(keys, m.num_buckets))
        )

    if batch_unique:
        # caller-asserted one-row-per-key batch: the winners ARE the
        # payload — no shuffle
        winners = payload.withColumn(BUCKET_COL, bucket_expr(keys, m.num_buckets))
    elif mode == "mor":
        winners = build_winners(bucket_aligned=True)
        winners_bucket_aligned = True
    else:
        winners = build_winners(bucket_aligned=False)

    # Constraint enforcement is PER PATH so the validation action never
    # doubles the batch pipeline: MOR persists the winners across the
    # check + write, the staged COW path validates the already-staged
    # parquet (a free re-read), and the direct COW path validates the
    # winners subtree (its write consumes `payload`, not `winners`, so
    # there is nothing to share).
    nn_cols, check_exprs = table_constraints(m)
    constrained = bool(nn_cols or check_exprs)

    if mode == "mor":
        # append winners as delta files — no target read, no rewrite
        if constrained:
            winners = winners.persist()
        try:
            _enforce_constraints(winners, m)
            obs = Observation()
            observed = winners.observe(obs, F.count(F.lit(1)).alias("n"))
            new_files = table._stage_write(
                observed, m.current_schema_version, is_delta=True,
                dml=dml_origin, pre_partitioned=winners_bucket_aligned,
            )
        finally:
            if constrained:
                winners.unpersist()
        counts = {"appended": int(obs.get["n"] or 0)}
        res = _commit(
            table, m, m.files, new_files, batch_id, source_id, offset_range,
            counts, expected_watermark=expected_watermark,
        )
        return _maybe_compact(table, res, mor_compact_threshold)

    # ---- 2. choose the COW strategy by target size (driver-side, from
    # manifest row counts — no Spark job):
    #
    # * DIRECT (small targets): ONE job — the raw batch unions straight
    #   into the per-key aggregate and every bucket is rewritten. No
    #   staging write, no probe; the batch subtree has a single consumer
    #   so it executes exactly once. Below the threshold a full rewrite
    #   costs less than staging the batch.
    # * STAGED (large targets): stage the batch winners as parquet under
    #   the table root — one job runs the batch-side pipeline (stream
    #   decode / parse CPU) exactly once, the staged file is the
    #   optimizer barrier that stops Catalyst re-inlining the batch
    #   subtree into both union-agg consumers, and the bucket probe
    #   becomes a column-pruned scan of one int column. (Measured on a
    #   150k-row × 2KB-content batch: parquet stage 2.6s vs
    #   localCheckpoint 4.6s vs columnar cache 1.8s-build but
    #   pathological on re-scan.) On a real deployment this is the
    #   standard stage-batch-to-lake-storage step. Pruning is always on:
    #   at the 10^10-row steady state (thousands of buckets, few touched
    #   per micro-batch) untouched buckets' files are carried into the
    #   new snapshot by reference — zero IO. ----
    table_rows = sum(f.rows for f in m.files)
    if stage_batch is None:
        threshold = int(
            m.properties.get("merge.stage.threshold_rows", _STAGE_THRESHOLD_ROWS)
        )
        # explicit prune request implies the staged path (the probe needs
        # a materialized batch); otherwise size decides
        stage_batch = bool(prune_buckets) or table_rows > threshold
    if constrained:
        # constraints need a MATERIALIZED batch: the direct path's write
        # consumes `payload` while the check would run over the `winners`
        # subtree — the batch source would execute twice, and for a non-
        # deterministic source the rows validated are not the rows that
        # land. The staged path validates the already-staged parquet (a
        # free re-read), so it is the only sound shape here.
        stage_batch = True

    if not stage_batch:
        if prune_buckets:
            raise ValueError(
                "prune_buckets=True requires the staged path (stage_batch=True): "
                "probing an unstaged batch would re-execute its source"
            )
        touched = list(range(m.num_buckets))
        src = payload.withColumn(BUCKET_COL, bucket_expr(keys, m.num_buckets))
        return _merge_cow_write(
            table, m, src, touched, [], [f for f in m.files], data_cols, keys,
            batch_id, source_id, offset_range, src_deduped=batch_unique,
            expected_watermark=expected_watermark,
        )

    import os
    import shutil
    import uuid as _uuid

    stage_dir = os.path.join(table.root, "_staging", f"batch_{_uuid.uuid4().hex}")
    os.makedirs(os.path.dirname(stage_dir), exist_ok=True)
    marker = table._stage_marker(stage_dir)
    try:
        winners.write.mode("overwrite").parquet(stage_dir)
        staged = table.spark.read.schema(winners.schema).parquet(stage_dir)
        if constrained:
            # a violation aborts here: the staging dir is cleaned by the
            # finally below and nothing has committed
            _enforce_constraints(staged, m)
        if prune_buckets is None:
            prune_buckets = True
        # one tiny probe job over the staged ints: touched buckets AND
        # the live-winner count (the broadcast path's count accounting)
        probe = (
            staged.groupBy(BUCKET_COL)
            .agg(F.sum(F.when(~F.col(DELETED_COL), 1).otherwise(0)).alias("live"))
            .collect()
        )
        staged_live = sum(int(r["live"] or 0) for r in probe)
        if prune_buckets:
            touched = sorted(r[BUCKET_COL] for r in probe)
            if not touched:
                return _commit(
                    table, m, m.files, [], batch_id, source_id, offset_range,
                    {"inserted": 0, "updated": 0, "deleted": 0},
                    expected_watermark=expected_watermark,
                )
        else:
            touched = list(range(m.num_buckets))
        keep = [f for f in m.files if f.bucket not in set(touched)]
        live_files = [f for f in m.files if f.bucket in set(touched)]
        # ---- staged sub-strategy: BROADCAST merge makes the target side
        # map-only — scanned against the broadcast (key, seq, deleted)
        # relation and written straight back out, NO target-side shuffle
        # (the union-agg path shuffles every touched-bucket row). On this
        # sandbox (shuffle on tmpfs ≈ memcpy) the agg path measures
        # slightly FASTER even at a 40:1 target:batch ratio (1.73 s vs
        # 2.08 s, 15k-event batch into 600k rows), so agg is the DEFAULT;
        # broadcast is the network-shuffle-bound cluster play — opt in
        # per call (merge_strategy="broadcast") or per table (property
        # "merge.strategy"). Requires the winner count to fit a broadcast
        # (staged parquet footers — driver metadata, no job) and no MOR
        # deltas in the touched buckets (their scan is an aggregate;
        # joining it twice would execute it twice). ----
        if merge_strategy is None:
            merge_strategy = m.properties.get("merge.strategy", "agg")
        if merge_strategy == "broadcast":
            bcast_max = int(
                m.properties.get(
                    "merge.broadcast.threshold_rows", _BROADCAST_THRESHOLD_ROWS
                )
            )
            if (
                not live_files
                or any(f.is_delta for f in live_files)
                or _staged_row_count(stage_dir) > bcast_max
            ):
                merge_strategy = "agg"  # infeasible → fall back
        if merge_strategy == "broadcast":
            return _merge_cow_broadcast(
                table, m, staged, touched, keep, data_cols, keys,
                batch_id, source_id, offset_range, staged_live,
                expected_watermark=expected_watermark,
            )
        return _merge_cow_write(
            table, m, staged, touched, keep, live_files, data_cols, keys,
            batch_id, source_id, offset_range, src_deduped=True,
            expected_watermark=expected_watermark,
        )
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
        try:
            os.remove(marker)
        except OSError:
            pass


def _maybe_compact(
    table: LakeTable, res: MergeResult, mor_compact_threshold: int | None
) -> MergeResult:
    """Auto-compaction policy shared by every MOR append path: once any
    single bucket accumulates more than ``threshold`` delta files, fold
    THAT bucket's deltas into its base file (manifest-pruned rewrite) so
    steady-state MOR scan cost stays bounded per bucket. Per-bucket, not
    global: one hot bucket can't force a whole-table compaction, and
    can't starve while a global count stays low. Threshold comes from
    the call or the table property "mor.compact.threshold"; 0/absent =
    manual-only.

    The table property "mor.compact.max_buckets" additionally CAPS how
    many buckets one commit may fold (worst-first; the rest wait for
    later commits). Tables that append on a shared cadence — the
    15-tree refresh epoch — otherwise cross the threshold in the SAME
    epoch on EVERY bucket, turning one epoch into a synchronized
    full-fleet rewrite storm; the cap amortizes that rewrite over
    epochs while read cost stays bounded at threshold + a few deltas."""
    threshold = mor_compact_threshold
    if threshold is None:
        threshold = int(res.manifest.properties.get("mor.compact.threshold", 0) or 0)
    if threshold:
        per_bucket: dict[int, int] = {}
        for f in res.manifest.files:
            if f.is_delta:
                per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
        dirty = sorted(b for b, c in per_bucket.items() if c > threshold)
        cap = int(res.manifest.properties.get("mor.compact.max_buckets", 0) or 0)
        if cap and len(dirty) > cap:
            dirty = sorted(
                sorted(dirty, key=lambda b: -per_bucket[b])[:cap]
            )
        if dirty:
            res.manifest = table.compact_deltas(buckets=dirty)
            res.counts["compacted_delta_files"] = sum(per_bucket[b] for b in dirty)
            res.counts["compacted_buckets"] = len(dirty)
    return res


def _contains_timestamp(dt: T.DataType) -> bool:
    if isinstance(dt, T.TimestampType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_timestamp(dt.elementType)
    if isinstance(dt, T.MapType):
        return _contains_timestamp(dt.keyType) or _contains_timestamp(
            dt.valueType
        )
    if isinstance(dt, T.StructType):
        return any(_contains_timestamp(f.dataType) for f in dt.fields)
    return False


def _utc_wall(v, dt: T.DataType):
    """Re-express every TimestampType value under ``dt`` as UTC wall
    time, at any nesting depth (see merge_local_delta: pa.array stores
    wall clocks without converting, so the driver-local write must do
    the timezone math itself). Naive datetimes are local by collect()'s
    contract; aware ones convert directly."""
    if v is None:
        return None
    if isinstance(dt, T.TimestampType):
        return v.astimezone(_dt.timezone.utc) if isinstance(v, _dt.datetime) else v
    if isinstance(dt, T.ArrayType):
        return [_utc_wall(x, dt.elementType) for x in v]
    if isinstance(dt, T.MapType):
        items = v.items() if isinstance(v, dict) else v
        return [
            (_utc_wall(k, dt.keyType), _utc_wall(x, dt.valueType))
            for k, x in items
        ]
    if isinstance(dt, T.StructType):
        if isinstance(v, dict):
            d = v
        elif isinstance(v, (tuple, list)):
            # positional struct values — pa.array accepts them, so we
            # must too rather than crash on a missing .asDict
            d = dict(zip([f.name for f in dt.fields], v))
        else:
            d = v.asDict()
        return {f.name: _utc_wall(d.get(f.name), f.dataType) for f in dt.fields}
    return v


def merge_local_delta(
    table: LakeTable,
    rows: list,
    source_id: str = "default",
    batch_id: int | None = None,
    offset_range: tuple[int, int] | None = None,
    mor_compact_threshold: int | None = None,
) -> MergeResult:
    """Land a DRIVER-LOCAL, table-shaped change set as MOR delta files —
    ZERO Spark jobs. The small-commit fast path of the incremental
    refresh epoch: a steady-state epoch's per-tree change set is micro-
    batch-sized (already on the driver from the batch plan's collect),
    and pushing ~1k rows back through a Spark write job pays a full
    job+shuffle+task round of fixed cost per tree per epoch. Here the
    rows are written straight to per-bucket parquet files with pyarrow
    (same staging-dir + liveness-marker + rename protocol as
    ``LakeTable._stage_write``, same footer-derived manifest stats) and
    committed with the SAME exactly-once fence, lineage, and
    auto-compaction as ``merge_into(mode="mor")`` — an Iceberg-style
    metadata commit for change sets below the cluster-work threshold.
    Large batches must keep the distributed path; callers bound ``rows``
    (see entities/universe.py's local-commit cap).

    ``rows``: list of dicts, one per key (caller asserts uniqueness,
    same contract as ``merge_into(batch_unique=True)``), each holding
    every current-schema column (``_seq``/``_deleted`` included) plus
    ``_bucket`` (computed IN the batch plan with the table's own
    ``bucket_expr`` — the driver never re-implements the hash)."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    m = table.current_manifest()
    if batch_id is not None:
        wm = m.watermarks.get(source_id)
        if wm is not None and wm.get("batch_id", -1) >= batch_id:
            return MergeResult(
                m, {"inserted": 0, "updated": 0, "deleted": 0}, skipped=True
            )
    schema = m.schema
    file_fields = [f for f in schema.fields]  # data cols + _seq + _deleted
    allowed = {f.name for f in file_fields} | {BUCKET_COL}
    for r in rows:
        unknown = r.keys() - allowed
        if unknown:
            # fail loudly: the column loop reads r.get(name), so an
            # unknown key (typo, or a column the table hasn't evolved
            # to yet) would otherwise be dropped silently — and unlike
            # merge_into this path never auto-evolves
            raise ValueError(
                f"row keys {sorted(unknown)} not in table schema "
                f"{sorted(allowed)}; evolve the schema first or use "
                "merge_into/merge_small_batch"
            )
    nn_cols, check_exprs = table_constraints(m)
    if nn_cols or check_exprs:
        # same contract as the Spark path's _enforce_constraints, kept
        # zero-Spark: not-null checks are pure Python; CHECK exprs
        # evaluate via DuckDB over the live rows (ANSI SQL, no Spark
        # job). Validation runs BEFORE any file is staged so a refusal
        # leaves no orphans.
        live = [r for r in rows if not r.get(DELETED_COL)]
        for c in nn_cols:
            bad = [r for r in live if r.get(c) is None]
            if bad:
                keys = {k: bad[0].get(k) for k in m.key_cols}
                raise ConstraintViolationError(
                    f"batch violates not_null:{c} on {len(bad)} row(s) "
                    f"(first key: {keys})"
                )
        if check_exprs and live:
            import duckdb
            import pyarrow as pa

            try:
                live_at = pa.Table.from_pylist(
                    [{k: v for k, v in r.items() if k != BUCKET_COL}
                     for r in live]
                )
            except (pa.ArrowInvalid, pa.ArrowTypeError) as e:
                raise LocalPathUnsupportedError(
                    "cannot evaluate CHECK constraints on the driver-"
                    f"local path for this batch ({e}); use merge_into"
                ) from e
            for name, expr in check_exprs.items():
                try:
                    n_bad = duckdb.sql(
                        "SELECT count(*) FROM live_at WHERE NOT "
                        f"COALESCE(({expr}), TRUE)"
                    ).fetchone()[0]
                except duckdb.Error as e:
                    raise LocalPathUnsupportedError(
                        f"CHECK constraint {name!r} ({expr!r}) is not "
                        "evaluable on the driver-local path "
                        f"({e}); use merge_into"
                    ) from e
                if n_bad:
                    raise ConstraintViolationError(
                        f"batch violates check:{name} ({expr!r}) on "
                        f"{n_bad} row(s)"
                    )

    from .cluster import load_boundaries, parse_cluster_spec, zorder_value_py

    arrow_schema = to_arrow_schema(T.StructType(file_fields))
    stat_cols, _is_zorder = parse_cluster_spec(m.properties)
    _zbnd, _zbits = load_boundaries(m.properties) if _is_zorder else ({}, 0)
    bloom_prop = m.properties.get("write.bloom_filter_columns", "")
    bloom_cols = [c for c in bloom_prop.split(",") if c]

    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(int(r[BUCKET_COL]), []).append(r)

    stage = os.path.join(table.root, "_staging", f"local_{_uuid.uuid4().hex}")
    os.makedirs(stage, exist_ok=True)
    marker = table._stage_marker(stage)
    new_files: list[DataFile] = []
    try:
        for bucket, brows in sorted(by_bucket.items()):
            if stat_cols:
                # keep the table's clustering contract: tight col_stats
                # need the same within-file ordering the Spark path has
                if _is_zorder and _zbnd:
                    brows = sorted(
                        brows,
                        key=lambda r: zorder_value_py(
                            r.get, stat_cols, _zbnd, _zbits
                        ),
                    )
                else:
                    brows = sorted(
                        brows,
                        key=lambda r: tuple(
                            (r.get(c) is None, r.get(c)) for c in stat_cols
                        ),
                    )
            cols = []
            for f, af in zip(file_fields, arrow_schema):
                vals = [r.get(f.name) for r in brows]
                if _contains_timestamp(f.dataType):
                    # Spark's collect() hands back NAIVE datetimes in
                    # the driver's OS timezone, and pa.array stores the
                    # WALL-CLOCK value under timestamp[us, tz=UTC] at
                    # ANY nesting depth (verified: it does not convert
                    # even tz-aware inputs) — on a non-UTC driver that
                    # shifts the stored instant by the UTC offset vs
                    # the distributed write path. Re-express every
                    # timestamp as UTC wall time first, recursing
                    # through arrays/structs/maps (_utc_wall also
                    # normalizes map dicts to item lists for pa.array).
                    vals = [_utc_wall(v, f.dataType) for v in vals]
                elif isinstance(f.dataType, T.MapType):
                    vals = [
                        list(v.items()) if isinstance(v, dict) else v
                        for v in vals
                    ]
                cols.append(pa.array(vals, type=af.type))
            at = pa.Table.from_arrays(cols, schema=arrow_schema)
            fname = f"{_uuid.uuid4().hex}.parquet"
            fpath = os.path.join(stage, fname)
            pq.write_table(at, fpath)
            dest_dir = os.path.join(
                table._data_dir, f"{BUCKET_COL}={bucket}"
            )
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(dest_dir, fname)
            os.replace(fpath, dest)
            seqs = [r.get(SEQ_COL) for r in brows]
            non_null = [s for s in seqs if s is not None]
            stats = {
                "has_tombstones": any(r.get(DELETED_COL) for r in brows),
                "min_seq": -1 if len(non_null) < len(seqs) else (
                    int(min(non_null)) if non_null else None
                ),
                "max_seq": int(max(non_null)) if non_null else None,
            }
            col_stats = {}
            for c in stat_cols:
                vs = [
                    r.get(c) for r in brows
                    if isinstance(r.get(c), (int, float, str, bool))
                ]
                if vs and len(vs) == len(brows):
                    col_stats[c] = [min(vs), max(vs)]
            if col_stats:
                stats["col_stats"] = col_stats
            if bloom_cols:
                from .bloom import build_bloom

                blooms = {}
                for c in bloom_cols:
                    bl = build_bloom(r.get(c) for r in brows)
                    if bl is not None:
                        blooms[c] = bl
                if blooms:
                    stats["blooms"] = blooms
            new_files.append(
                DataFile(
                    path=os.path.relpath(dest, table.root),
                    bucket=bucket,
                    rows=len(brows),
                    bytes=os.path.getsize(dest),
                    schema_version=m.current_schema_version,
                    is_delta=True,
                    stats=stats,
                )
            )
    finally:
        import shutil as _shutil

        _shutil.rmtree(stage, ignore_errors=True)
        try:
            os.remove(marker)
        except OSError:
            pass
    counts = {"appended": len(rows)}
    res = _commit(
        table, m, m.files, new_files, batch_id, source_id, offset_range,
        counts,
    )
    return _maybe_compact(table, res, mor_compact_threshold)


def merge_small_batch(
    table: LakeTable,
    batch: DataFrame,
    source_id: str = "default",
    batch_id: int | None = None,
    offset_range: tuple[int, int] | None = None,
    evolve: bool = True,
    local_cap: int = 2000,
    mor_compact_threshold: int | None = None,
) -> MergeResult:
    """MERGE with the driver-local small-commit fast path: plan the
    batch winners exactly like ``merge_into`` (normalize → per-key
    ``max_by`` → bucket id, all Spark-side so bucket hashing and tie
    resolution can never diverge from the distributed path), run ONE
    capped collect, and when the change set is ≤ ``local_cap`` rows
    land it via :func:`merge_local_delta` — zero further Spark work,
    same fence/lineage/stats/compaction. Over-cap batches fall back to
    ``merge_into(mode="mor")``, re-planning from the original batch
    (one wasted capped collect — the caller opts in because its batches
    are micro-sized by construction, e.g. a trickle CDC stream's
    steady-state micro-batches).

    Rationale: a micro-batch merge pays a full job + shuffle + write
    task round of fixed cost to move ~1k rows; at trickle cadence that
    fixed cost IS the pipeline's latency floor (the same measured trade
    as the entity-universe refresh's fused local commits)."""
    m = table.current_manifest()
    if batch_id is not None:
        wm = m.watermarks.get(source_id)
        if wm is not None and wm.get("batch_id", -1) >= batch_id:
            return MergeResult(
                m, {"inserted": 0, "updated": 0, "deleted": 0}, skipped=True
            )
    batch = batch.drop(EVENT_TS_COL)
    if evolve:
        m = table.evolve_schema(batch.drop(OP_COL, EVENT_SEQ_COL).schema)
    keys = m.key_cols
    payload = normalize_batch(batch, m.schema, keys)
    non_key = [c for c in payload.columns if c not in keys]
    seq_order = F.coalesce(F.col(SEQ_COL), F.lit(-1))
    winners = (
        payload.groupBy(*keys)
        .agg(F.max_by(F.struct(*non_key), seq_order).alias("_w"))
        .select(*keys, "_w.*")
        .withColumn(BUCKET_COL, bucket_expr(keys, m.num_buckets))
    )
    head = winners.limit(local_cap + 1).collect()
    if len(head) > local_cap:
        return merge_into(
            table, batch, source_id=source_id, batch_id=batch_id,
            offset_range=offset_range, evolve=False, mode="mor",
            mor_compact_threshold=mor_compact_threshold,
        )
    rows = [r.asDict(recursive=True) for r in head]
    try:
        return merge_local_delta(
            table, rows, source_id=source_id, batch_id=batch_id,
            offset_range=offset_range,
            mor_compact_threshold=mor_compact_threshold,
        )
    except LocalPathUnsupportedError:
        # e.g. a CHECK constraint only Spark can evaluate — the data may
        # be valid; re-route through the distributed merge (which
        # enforces the same constraints Spark-side) instead of failing a
        # trickle pipeline on an engine limitation
        return merge_into(
            table, batch, source_id=source_id, batch_id=batch_id,
            offset_range=offset_range, evolve=False, mode="mor",
            mor_compact_threshold=mor_compact_threshold,
        )


def _staged_row_count(stage_dir: str) -> int:
    """Total rows of a staged batch from parquet footers (driver-side
    metadata, no Spark job)."""
    import os

    import pyarrow.parquet as pq

    total = 0
    for fn in os.listdir(stage_dir):
        if fn.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(stage_dir, fn)).metadata.num_rows
    return total


def _merge_cow_broadcast(
    table, m, staged, touched, keep, data_cols, keys,
    batch_id, source_id, offset_range, staged_live,
    expected_watermark=None,
) -> MergeResult:
    """Broadcast MERGE: the touched buckets' rows are map-scanned against
    a broadcast (key, seq, deleted) relation of the batch winners —
    surviving target rows stream straight to the writer (no target-side
    shuffle, no aggregate); the batch side anti-joins the (tiny) set of
    winners a NEWER target row kills, then routes by bucket token (a
    batch-sized shuffle only). Semantics identical to the agg path:
    target survives iff it has no winner or strictly newer seq; on an
    equal seq the incoming row wins (replay determinism). Two files per
    touched bucket per merge (survivors + winners) instead of one —
    bounded: after the commit, any bucket past
    "compact.max_files_per_bucket" (default 8) is folded back to one
    file (manifest-pruned ``compact_buckets``), so long broadcast-mode
    ingest keeps O(1) files per bucket.

    Lineage counts come from ONE Observation on the target-side scan plus
    the probe's ``staged_live`` (inserted = live winners − updated −
    live winners a newer target killed). An observation on the anti-join
    side is a trap: when the batch is fully killed its metrics never
    materialize and Observation.get asserts (found by hypothesis)."""
    current = table.read(
        buckets=touched, include_tombstones=True, include_internal=True
    )
    wk = F.broadcast(
        staged.select(
            *keys,
            F.col(SEQ_COL).alias("_w_seq"),
            F.col(DELETED_COL).alias("_w_del"),
        )
    )
    tseq = F.coalesce(F.col(SEQ_COL), F.lit(-1))
    wseq = F.coalesce(F.col("_w_seq"), F.lit(-1))
    target_wins = F.col("_w_seq").isNull() | (tseq > wseq)

    obs_t = Observation()
    superseded_live = (
        F.col("_w_seq").isNotNull() & (wseq >= tseq) & ~F.col(DELETED_COL)
    )
    winner_killed_live = (
        F.col("_w_seq").isNotNull() & (tseq > wseq) & ~F.col("_w_del")
    )
    joined = current.join(wk, keys, "left").observe(
        obs_t,
        F.sum(F.when(superseded_live & ~F.col("_w_del"), 1).otherwise(0)).alias(
            "updated"
        ),
        F.sum(F.when(superseded_live & F.col("_w_del"), 1).otherwise(0)).alias(
            "deleted"
        ),
        F.sum(F.when(winner_killed_live, 1).otherwise(0)).alias("killed_live"),
    )
    survivors = (
        joined.filter(target_wins)
        .select(*data_cols, SEQ_COL, DELETED_COL)
        .withColumn(BUCKET_COL, bucket_expr(keys, m.num_buckets))
    )

    # winners a strictly-newer target row kills — bounded by batch size,
    # derived from a column-pruned scan of the same buckets
    kills = (
        current.select(*keys, F.coalesce(F.col(SEQ_COL), F.lit(-1)).alias("_t_seq"))
        .join(wk, keys)
        .filter(F.col("_t_seq") > wseq)
        .select(*keys)
    )
    final_winners = (
        staged.join(F.broadcast(kills), keys, "left_anti")
        # bucket-token routing of the BATCH side only, so winner tasks
        # don't sprinkle a file into every bucket dir
        .repartition(m.num_buckets, table._bucket_token_expr(m.num_buckets))
    )
    out = survivors.unionByName(final_winners.select(survivors.columns))
    new_files = table._stage_write(out, m.current_schema_version, pre_partitioned=True)
    got_t = obs_t.get
    updated = int(got_t["updated"] or 0)
    counts = {
        "inserted": staged_live - updated - int(got_t["killed_live"] or 0),
        "updated": updated,
        "deleted": int(got_t["deleted"] or 0),
    }
    res = _commit(
        table, m, keep, new_files, batch_id, source_id, offset_range, counts,
        expected_watermark=expected_watermark,
    )
    max_files = int(
        m.properties.get("compact.max_files_per_bucket", _MAX_FILES_PER_BUCKET) or 0
    )
    if max_files:
        overgrown = table.overgrown_buckets(max_files)
        if overgrown:
            res.manifest = table.compact_buckets(overgrown)
            res.counts["compacted_buckets"] = len(overgrown)
    return res


def _merge_cow_write(
    table, m, winners, touched, keep, live_files, data_cols, keys,
    batch_id, source_id, offset_range, src_deduped=True,
    expected_watermark=None,
) -> MergeResult:
    """Write phase of the COW merge. ``winners`` is the batch side —
    already per-key deduped on the staged path (src_deduped=True), raw on
    the direct path (the union aggregate dedups in-batch duplicates via
    the same (seq, priority) order)."""
    obs = Observation()
    union_path = bool(live_files) or not src_deduped
    if not union_path:
        # bootstrap / all-new buckets: no target rows can exist — write
        # winners directly, skipping the union aggregate entirely
        out = winners.observe(
            obs,
            F.sum(F.when(~F.col(DELETED_COL), 1).otherwise(0)).alias("inserted"),
            F.lit(0).alias("updated"),
            F.lit(0).alias("deleted"),
        )
    else:
        current = table.read(
            buckets=touched, include_tombstones=True, include_internal=True
        ).withColumn(BUCKET_COL, bucket_expr(keys, m.num_buckets))

        # ---- 3. union + ONE whole-row max_by per key (batch-vs-table
        # supersession), ordered by (event_seq, priority) so an exact
        # replay (equal seq) is deterministically won by the incoming
        # row. One shuffle; a full-outer join would shuffle both sides
        # AND lose map-side combining. Skew note: the grouping key is
        # the full composite key tuple, so a hot ``repo`` does NOT
        # concentrate on one reducer (repo-only rollups use
        # operators/skew.py salting instead). ----
        src = winners.withColumn(_PRIORITY, F.lit(1))
        tgt = current.withColumn(_PRIORITY, F.lit(0))
        unioned = tgt.unionByName(src)
        non_key_u = [c for c in unioned.columns if c not in keys]
        order = F.struct(
            F.coalesce(F.col(SEQ_COL), F.lit(-1)).alias("s"),
            F.col(_PRIORITY).alias("p"),
        )
        # ONE full-data shuffle for agg AND write: repartition(B, keys) is
        # HashPartitioning(keys, B) = pmod(murmur3(keys), B) — the exact
        # bucket_expr — so (a) the aggregate's clustering requirement is
        # already satisfied (no agg-inserted exchange; map-side partial
        # agg is worthless here anyway — the ≤2 rows of a key sit on
        # different union sides) and (b) every post-agg partition holds
        # exactly the rows of one bucket, so the write needs no token
        # repartition (pre_partitioned=True).
        unioned = unioned.repartition(m.num_buckets, *[F.col(c) for c in keys])
        merged = (
            unioned.groupBy(*keys)
            .agg(
                F.max_by(F.struct(*non_key_u), order).alias("_w"),
                F.max(
                    F.when((F.col(_PRIORITY) == 0) & ~F.col(DELETED_COL), 1).otherwise(0)
                ).alias(_TARGET_LIVE),
            )
            .select(*keys, "_w.*", _TARGET_LIVE)
        )

        # ---- 4. lineage counts ride along on the write job via the
        # Observation API (no second pass over merged) ----
        won = F.col(_PRIORITY) == 1
        out = merged.observe(
            obs,
            F.sum(F.when(won & ~F.col(DELETED_COL) & (F.col(_TARGET_LIVE) == 0), 1).otherwise(0)).alias("inserted"),
            F.sum(F.when(won & ~F.col(DELETED_COL) & (F.col(_TARGET_LIVE) == 1), 1).otherwise(0)).alias("updated"),
            F.sum(F.when(won & F.col(DELETED_COL) & (F.col(_TARGET_LIVE) == 1), 1).otherwise(0)).alias("deleted"),
        )
    out = out.select(*data_cols, SEQ_COL, DELETED_COL, BUCKET_COL)
    new_files = table._stage_write(
        out, m.current_schema_version, pre_partitioned=union_path
    )
    got = obs.get
    counts = {
        "inserted": int(got["inserted"] or 0),
        "updated": int(got["updated"] or 0),
        "deleted": int(got["deleted"] or 0),
    }
    return _commit(
        table, m, keep, new_files, batch_id, source_id, offset_range, counts,
        expected_watermark=expected_watermark,
    )


def _build_commit_manifest(
    parent: Manifest, files, batch_id, source_id, offset_range, counts
) -> Manifest:
    watermarks = dict(parent.watermarks)
    lineage = []
    if batch_id is not None:
        wm = {"batch_id": int(batch_id)}
        if offset_range is not None:
            wm["offset_end"] = int(offset_range[1])
        watermarks[source_id] = wm
        lineage.append(
            {
                "batch_id": int(batch_id),
                "source_id": source_id,
                "source_offset_start": int(offset_range[0]) if offset_range else -1,
                "source_offset_end": int(offset_range[1]) if offset_range else -1,
                "row_counts": counts,
            }
        )
    return Manifest(
        version=parent.version + 1,
        snapshot_id=parent.snapshot_id + 1,
        schemas=parent.schemas,
        current_schema_version=parent.current_schema_version,
        key_cols=parent.key_cols,
        num_buckets=parent.num_buckets,
        files=list(files),
        watermarks=watermarks,
        lineage=lineage,
        parent_version=parent.version,
        properties=parent.properties,
    )


#: commit-race retry budget for pure-append commits; each retry re-reads
#: CURRENT, so the budget only bounds pathological thundering herds.
#: Override per table via property "commit.retry.num-retries" (the
#: Iceberg knob name) when many writers share one table.
_APPEND_RETRY_ATTEMPTS = 5


def _commit(
    table: LakeTable,
    m: Manifest,
    keep_files,
    new_files,
    batch_id,
    source_id,
    offset_range,
    counts,
    expected_watermark=None,
) -> MergeResult:
    nm = _build_commit_manifest(
        m, list(keep_files) + list(new_files),
        batch_id, source_id, offset_range, counts,
    )
    try:
        table._write_manifest(nm)
        return MergeResult(nm, counts, skipped=False)
    except CommitConflictError:
        # Optimistic-concurrency rebase (the Iceberg fast-append retry):
        # a commit that REMOVED nothing from its base snapshot — MOR
        # delta appends, driver-local commits — is position-independent,
        # so losing the version race is recoverable by replaying the
        # same already-written files on top of the winner's manifest.
        # A commit that rewrote base files (COW merge, fused compaction)
        # raced against a writer that may have touched the same buckets:
        # its work is stale, re-raise for the caller to redo the merge.
        if {f.path for f in keep_files} != {f.path for f in m.files}:
            raise
        return _retry_append_commit(
            table, m, list(new_files), batch_id, source_id,
            offset_range, counts, expected_watermark=expected_watermark,
        )


def _retry_append_commit(
    table: LakeTable,
    m: Manifest,
    new_files,
    batch_id,
    source_id,
    offset_range,
    counts,
    expected_watermark=None,
) -> MergeResult:
    import time as _time

    def _drop_staged():
        # our staged files are referenced by no manifest — drop them
        for f in new_files:
            try:
                os.remove(os.path.join(table.root, f.path))
            except OSError:
                pass

    attempts = int(
        m.properties.get("commit.retry.num-retries", _APPEND_RETRY_ATTEMPTS)
    )
    for attempt in range(attempts):
        parent = table.current_manifest()
        if batch_id is not None:
            wm = parent.watermarks.get(source_id)
            if wm is not None and int(wm.get("batch_id", -1)) >= int(batch_id):
                # the winner committed this very batch (two replicas of
                # one stream replaying the same micro-batch): honor the
                # exactly-once fence instead of double-applying
                _drop_staged()
                return MergeResult(parent, counts, skipped=True)
        if _watermark_stale(parent, source_id, expected_watermark):
            # the caller's CAS precondition broke mid-commit: another
            # writer moved this source's watermark, so our batch was
            # derived from a superseded checkpoint — skip, never land
            _drop_staged()
            return MergeResult(parent, counts, skipped=True, stale=True)
        # Winner-shape safety: rebase only onto a winner that kept the
        # table's shape AND its history direction. A winner that REWOUND
        # any merge watermark (LakeTable.rollback_to) reverted committed
        # batches that must be REPLAYED — replaying our files on top and
        # re-asserting our (higher) watermark would fence out that whole
        # replay span permanently. Watermark monotonicity vs our base
        # snapshot is the discriminator: compaction / schema commits /
        # other appends never rewind watermarks, rollback always does
        # (when the rolled-back span contained merges).
        wm_monotone = all(
            int((parent.watermarks.get(sid) or {}).get("batch_id", -1))
            >= int((w or {}).get("batch_id", -1))
            for sid, w in m.watermarks.items()
        )
        rebase_safe = (
            parent.key_cols == m.key_cols
            and parent.num_buckets == m.num_buckets
            and wm_monotone
            and all(parent.schemas.get(k) == v for k, v in m.schemas.items())
        )
        if not rebase_safe:
            raise CommitConflictError(
                f"append commit on {table.root} lost its version race and "
                "the winning commit changed the table's schema set, keys, "
                "or bucketing, or rewound a merge watermark (rollback) — "
                "rebase is unsafe, redo the merge from CURRENT"
            )
        nm = _build_commit_manifest(
            parent, list(parent.files) + new_files,
            batch_id, source_id, offset_range, counts,
        )
        try:
            table._write_manifest(nm)
            return MergeResult(nm, counts, skipped=False)
        except CommitConflictError:
            # another writer landed between our re-read and our swap
            # (or the winner's CURRENT swap is still in flight): back
            # off briefly and re-read
            _time.sleep(0.02 * (attempt + 1))
    raise CommitConflictError(
        f"append commit on {table.root} lost {attempts} "
        "consecutive version races"
    )
