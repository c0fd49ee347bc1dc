"""Predicate DML for LakeTable — ``DELETE WHERE`` / ``UPDATE WHERE SET``.

The merge engine (lake/merge.py) applies *key-addressed* CDC batches; a
production lake format also needs *predicate-addressed* row operations
(Iceberg ``DELETE FROM``/``UPDATE``, Delta ``delete``/``update``) — the
right-to-be-forgotten path of a training-data lake, backfill corrections,
policy redactions. Both verbs here compile the predicate down to the SAME
CDC envelope the merge engine already handles, so every existing guarantee
(last-writer-wins by ``_seq``, tombstone resurrection safety, exactly-once
batch fences, lineage rows, schema-aligned writes, MOR auto-compaction)
applies to DML with zero new write-path code. Semantics generalize the
reference's staged soft-delete step (reference:
orchestration/templates/ingest-processed-data.yaml:86-172) from "rows
missing from the staged dataset" to an arbitrary predicate.

Execution shape (the scale-critical part):

1. **Find** — one predicate scan of the resolved snapshot
   (``table.read()``): Catalyst pushes the predicate into the parquet
   scan (row-group pruning / column pruning are free), MOR resolution
   runs only where deltas exist. The matched set is eagerly
   ``localCheckpoint``-ed: it is change-set-sized by definition of a
   DML statement, and the checkpoint makes "count matched" free and
   stops the merge from re-running the scan.
2. **Apply** — the matched rows become a one-row-per-key CDC batch
   (``batch_unique=True`` holds by construction: a resolved snapshot
   has one live row per key) with ``event_seq = current _seq + 1`` —
   per-key monotone, so the DML wins over current state but a later
   real CDC event (higher seq) still supersedes it, and a late,
   lower-seq update can never resurrect a deleted key.
3. **Commit** — ``merge_into`` lands it: ``mode="mor"`` (default)
   appends a change-set-sized delta (tombstones carry NULL payload —
   ``normalize_batch`` nulls non-key columns on deletes); ``"cow"``
   rewrites touched buckets only. An optional ``batch_id`` gives the
   statement an idempotency fence for orchestrators that retry.

Physical erasure: a delete lands a NULL-payload tombstone immediately;
the deleted content still exists in older snapshot files until
``compact_deltas()`` (folds the bucket, tombstone kept, payload stays
NULL) + ``expire_snapshots()`` (drops the old files) — the same
compact-then-expire cycle Iceberg/Delta document for GDPR erasure.
Pinned by tests/test_dml.py::test_delete_then_maintain_erases_content.

Concurrency: find-then-apply is read-modify-write; a writer landing a
higher-seq event for a matched key between the scan and the commit wins
at read time (last-writer-wins, exactly like any CDC race). Callers that
need span continuity pass ``expected_watermark`` for the merge-level CAS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .merge import (
    EVENT_SEQ_COL,
    OP_COL,
    MergeResult,
    _watermark_stale,
    merge_into,
)
from .table import DELETED_COL, SEQ_COL, LakeTable

#: source key sets at or below this collect into manifest-level file
#: pruning (``file_value_ranges``) for the matched-side target scan;
#: larger sources fall back to the plain keyed join (AQE picks the
#: physical strategy). Same shape as the universe restrict's cap.
MERGE_PUSHDOWN_CAP = 10_000


class DmlResult:
    """Outcome of one DML statement: ``rows_matched`` and the underlying
    ``MergeResult`` (``None`` when nothing matched — no commit, no
    version bump)."""

    def __init__(self, rows_matched: int, merge: MergeResult | None):
        self.rows_matched = rows_matched
        self.merge = merge

    @property
    def version(self) -> int | None:
        return None if self.merge is None else self.merge.manifest.version

    def __repr__(self) -> str:  # pragma: no cover
        return f"DmlResult(rows_matched={self.rows_matched}, merge={self.merge!r})"


def _as_column(condition: Column | str) -> Column:
    return F.expr(condition) if isinstance(condition, str) else condition


def _matched(table: LakeTable, condition: Column | str) -> DataFrame:
    """Live rows matching ``condition``, with ``_seq`` attached (internal
    cols ride along so the new event_seq can be minted per key)."""
    df = table.read(include_internal=True)
    return df.filter(_as_column(condition))


def _next_seq(qualifier: str | None = None) -> Column:
    """Per-key monotone successor of the matched row's current ``_seq``
    (built lazily — Column construction needs a live gateway)."""
    col = F.col(f"{qualifier}.`{SEQ_COL}`") if qualifier else F.col(SEQ_COL)
    return (F.coalesce(col, F.lit(-1)) + F.lit(1)).cast("long")


def _land(
    table: LakeTable,
    batch: DataFrame,
    *,
    source_id: str,
    batch_id: int | None,
    mode: str,
    expected_watermark: int | None,
) -> DmlResult:
    # change-set-sized by definition of a DML statement; the eager
    # checkpoint makes the empty-match guard free and guarantees the
    # predicate scan runs exactly once
    batch = batch.localCheckpoint(eager=True)
    n = batch.count()
    if n == 0:
        return DmlResult(0, None)
    res = merge_into(
        table,
        batch,
        source_id=source_id,
        batch_id=batch_id,
        mode=mode,
        batch_unique=True,
        expected_watermark=expected_watermark,
        # DML mints event_seq = current+1; with a dense upstream
        # sequence the next REAL event for a matched key carries exactly
        # that seq. The origin flag makes these rows lose that tie at
        # MOR resolution, so "a later real CDC event still supersedes
        # it" holds even at equal seq (ADVICE r5).
        dml_origin=True,
    )
    return DmlResult(n, res)


def delete_where(
    table: LakeTable,
    condition: Column | str,
    *,
    source_id: str = "dml",
    batch_id: int | None = None,
    mode: str = "mor",
    expected_watermark: int | None = None,
) -> DmlResult:
    """Tombstone every live row matching ``condition``. See module
    docstring for semantics, scale shape, and physical-erasure contract.

    ``condition`` is a SQL boolean expression string or a ``Column`` over
    the table's data columns. Nothing matched → no commit (version
    unchanged), ``rows_matched == 0``.
    """
    m = table.current_manifest()
    batch = _matched(table, condition).select(
        *m.key_cols,
        _next_seq().alias(EVENT_SEQ_COL),
        F.lit("delete").alias(OP_COL),
    )
    return _land(
        table, batch, source_id=source_id, batch_id=batch_id, mode=mode,
        expected_watermark=expected_watermark,
    )


def update_where(
    table: LakeTable,
    condition: Column | str,
    set_: dict[str, Column | str],
    *,
    source_id: str = "dml",
    batch_id: int | None = None,
    mode: str = "mor",
    expected_watermark: int | None = None,
) -> DmlResult:
    """Rewrite the assigned columns of every live row matching
    ``condition``; unassigned columns carry over unchanged.

    ``set_`` maps column name → SQL expression string / ``Column``. Every
    right-hand side is evaluated against the OLD row (ANSI UPDATE
    semantics — ``{"a": "b", "b": "a"}`` swaps), enforced by compiling
    all assignments into ONE ``select`` over the matched frame. Key
    columns cannot be assigned (that is an insert+delete, not an update);
    unknown columns raise — column ADDITION is schema evolution's job
    (``evolve_schema`` / merge ``evolve=True``), not DML's.
    """
    if not set_:
        raise ValueError("update_where requires at least one assignment")
    m = table.current_manifest()
    keys = set(m.key_cols)
    data_cols = [f.name for f in m.schema.fields if f.name not in (SEQ_COL, DELETED_COL)]
    known = set(data_cols)
    for col in set_:
        if col in keys:
            raise ValueError(
                f"cannot assign key column {col!r} (delete + insert instead)"
            )
        if col not in known:
            raise ValueError(
                f"unknown column {col!r}; add columns via schema evolution, not UPDATE"
            )
    exprs = [
        (_as_column(set_[c]) if c in set_ else F.col(c)).alias(c) for c in data_cols
    ]
    batch = _matched(table, condition).select(
        *exprs,
        _next_seq().alias(EVENT_SEQ_COL),
        F.lit("update").alias(OP_COL),
    )
    return _land(
        table, batch, source_id=source_id, batch_id=batch_id, mode=mode,
        expected_watermark=expected_watermark,
    )


# ---------------------------------------------------------------------------
# MERGE INTO — source-driven conditional upsert (ANSI / Delta / Iceberg
# MERGE semantics) compiled onto the same CDC envelope.
# ---------------------------------------------------------------------------

class MergeApplyResult:
    """Outcome of one MERGE statement: per-op row counts (``inserted`` /
    ``updated`` / ``deleted``) plus the underlying ``MergeResult``
    (``None`` when no clause matched any row — no commit)."""

    def __init__(self, counts: dict[str, int], merge: MergeResult | None):
        self.counts = counts
        self.merge = merge

    @property
    def version(self) -> int | None:
        return None if self.merge is None else self.merge.manifest.version

    def __repr__(self) -> str:  # pragma: no cover
        return f"MergeApplyResult(counts={self.counts}, merge={self.merge!r})"


def _clause_list(clauses) -> list[tuple[Column | str | None, object]]:
    """Accept one clause or a sequence; normalize to a list of
    (condition, action) pairs. A bare action means an unconditional
    clause."""
    if clauses is None:
        return []
    if isinstance(clauses, (str, dict)):
        return [(None, clauses)]
    if isinstance(clauses, tuple) and len(clauses) == 2 and (
        clauses[0] is None or isinstance(clauses[0], (str, Column))
    ) and isinstance(clauses[1], (str, dict)):
        return [clauses]
    out: list[tuple[Column | str | None, object]] = []
    for el in clauses:
        if isinstance(el, (str, dict)):
            out.append((None, el))
        elif isinstance(el, (tuple, list)) and len(el) == 2:
            out.append((el[0], el[1]))
        else:
            raise ValueError(
                "each clause must be an action or a (condition, action) "
                f"pair, got {el!r}"
            )
    return out


def _validate_clauses(clauses, allowed: set[str], where: str):
    for cond, action in clauses:
        if isinstance(action, str):
            if action not in allowed:
                raise ValueError(
                    f"{where}: action {action!r} not in {sorted(allowed)}"
                )
        elif not isinstance(action, dict):
            raise ValueError(
                f"{where}: action must be one of {sorted(allowed)} or an "
                f"assignment dict, got {type(action).__name__}"
            )
        elif not action:
            raise ValueError(f"{where}: empty assignment dict")
        if cond is not None and not isinstance(cond, (str, Column)):
            raise ValueError(f"{where}: condition must be SQL string or Column")


def merge_apply(
    table: LakeTable,
    source: DataFrame,
    *,
    when_matched=None,
    when_not_matched=None,
    when_not_matched_by_source=None,
    source_id: str = "merge",
    batch_id: int | None = None,
    mode: str = "mor",
    expected_watermark: int | None = None,
    check_cardinality: bool = True,
    evolve_schema: bool = False,
) -> MergeApplyResult:
    """``MERGE INTO table USING source ON keys`` — the ANSI / Delta /
    Iceberg conditional upsert, compiled to ONE CDC batch landed through
    ``merge_into`` so every engine guarantee (LWW by ``_seq``, tombstone
    resurrection safety, exactly-once fences, lineage, MOR/COW) applies
    unchanged. Generalizes the reference's staged-dataset sync
    (orchestration/templates/ingest-processed-data.yaml:86-172 — upsert
    staged rows, soft-delete rows missing from staging) into the full
    three-branch MERGE.

    ``source`` must carry the table's key columns with AT MOST one row
    per key (the ANSI cardinality rule; violation raises like Delta's
    "multiple source rows matched"). The match is always on the table's
    key columns — the lake's clustering keys — so the matched-side join
    is an equi-join Catalyst/AQE can plan, and small sources additionally
    prune the target scan at the MANIFEST level (file_value_ranges over
    all key columns, Bloom + min/max).

    Clauses — each ``(condition, action)`` or a bare action for an
    unconditional clause; the FIRST holding clause wins per row (ANSI
    order). Conditions/assignment RHS are SQL strings or Columns; in
    matched clauses qualify columns as ``source.x`` / ``target.x``
    (unqualified names shared by both sides are ambiguous, exactly as in
    SQL MERGE):

    * ``when_matched``: ``"update"`` (every same-named source column
      overwrites; others carry over), ``"delete"``, or ``{col: expr}``
      (unassigned columns carry over — RHS sees the OLD row).
    * ``when_not_matched``: ``"insert"`` (same-named source columns;
      missing table columns null) or ``{col: expr}``. A key whose only
      trace is a tombstone counts as NOT matched (SQL sees no row), and
      the minted ``event_seq`` still supersedes the tombstone.
    * ``when_not_matched_by_source``: ``"delete"`` or ``{col: expr}``
      over live target rows absent from the source — the reference's
      staged-sync soft-delete branch. Requires a full live-target
      anti-join (inherently corpus-sized; omit it and the statement's
      cost stays source-sized).

    ``evolve_schema`` (Delta's ``withSchemaEvolution()``): source columns
    beyond the table schema are appended through the engine's merge-time
    auto-evolution — ``update``/``insert`` actions write them, rows other
    clauses touch read null, and assignment dicts may target them. Off
    (default) they are ignored and assigning one raises.

    Scale shape: one eager checkpoint of the (change-set-sized) source;
    matched+insert branches compile to ONE select over a single
    left join (clause routing is a fused CASE — whole-stage codegen, no
    UDFs); the optional by-source branch is one left_anti; the landed
    batch is ``batch_unique`` by construction (cardinality rule + one
    action per key), so MOR mode is a shuffle-free delta append.
    """
    wm_clauses = _clause_list(when_matched)
    wnm_clauses = _clause_list(when_not_matched)
    wnmbs_clauses = _clause_list(when_not_matched_by_source)
    if not (wm_clauses or wnm_clauses or wnmbs_clauses):
        raise ValueError("merge_apply requires at least one WHEN clause")
    _validate_clauses(wm_clauses, {"update", "delete"}, "when_matched")
    _validate_clauses(wnm_clauses, {"insert"}, "when_not_matched")
    _validate_clauses(
        wnmbs_clauses, {"delete"}, "when_not_matched_by_source"
    )

    m = table.current_manifest()

    # statement-level fence pre-check: a retried statement must not pay
    # the full MERGE compute (checkpoint, cardinality agg, target join)
    # just to have merge_into skip it at the end; the fence is re-checked
    # at commit so a race here only costs the recompute, never a double
    # apply. Skipped statements report ZERO counts — the clause-match
    # counts describe rows that never landed.
    _zero = {"inserted": 0, "updated": 0, "deleted": 0}
    if batch_id is not None:
        wm = m.watermarks.get(source_id)
        if wm is not None and wm.get("batch_id", -1) >= batch_id:
            return MergeApplyResult(
                dict(_zero), MergeResult(m, dict(_zero), skipped=True)
            )
    if _watermark_stale(m, source_id, expected_watermark):
        return MergeApplyResult(
            dict(_zero),
            MergeResult(m, dict(_zero), skipped=True, stale=True),
        )

    keys = list(m.key_cols)
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"source lacks key column(s) {missing}")
    data_cols = [
        f.name for f in m.schema.fields if f.name not in (SEQ_COL, DELETED_COL)
    ]
    known = set(data_cols)
    reserved = {OP_COL, EVENT_SEQ_COL, SEQ_COL, DELETED_COL}
    extra = (
        [c for c in source.columns if c not in known and c not in reserved]
        if evolve_schema
        else []
    )
    assignable = known | set(extra)
    for cond, action in wm_clauses + wnm_clauses + wnmbs_clauses:
        if isinstance(action, dict):
            for c in action:
                if c in keys:
                    raise ValueError(
                        f"cannot assign key column {c!r} in a MERGE clause"
                    )
                if c not in assignable:
                    raise ValueError(
                        f"unknown column {c!r}; pass evolve_schema=True to "
                        "add source columns, or evolve the schema first"
                    )

    src = source.localCheckpoint(eager=True)
    if check_cardinality:
        dup = (
            src.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
        )
        if dup:
            key_repr = {k: dup[0][k] for k in keys}
            raise ValueError(
                f"MERGE source has multiple rows for key {key_repr} "
                "(ANSI cardinality violation); dedup the source first"
            )

    src_cols = set(src.columns)
    non_key_data = [c for c in data_cols if c not in keys]

    def _cond(c) -> Column:
        return F.lit(True) if c is None else _as_column(c)

    batches: list[DataFrame] = []

    # one bounded probe decides both physical strategies: a small source
    # prunes the matched-side target scan at the manifest level AND
    # broadcasts its key set into the by-source anti-join; an over-cap
    # source takes the plain keyed joins (AQE picks the strategy)
    kv = src.select(*keys).limit(MERGE_PUSHDOWN_CAP + 1).collect()
    small_source = len(kv) <= MERGE_PUSHDOWN_CAP

    if wm_clauses or wnm_clauses:
        # matched-side target scan: tombstones INCLUDED (seq minting must
        # see them — an insert over a tombstoned key supersedes it), with
        # manifest-level file pruning when the source key set is small
        fvr = None
        if small_source:
            fvr = {
                k: [r[k] for r in kv if r[k] is not None] for k in keys
            }
            fvr = {k: v for k, v in fvr.items() if v} or None
        cur = table.read(
            include_tombstones=True, include_internal=True,
            file_value_ranges=fvr,
        ).withColumn("_t_present", F.lit(True))
        j = src.alias("source").join(
            cur.alias("target"),
            [F.col(f"source.`{k}`") == F.col(f"target.`{k}`") for k in keys],
            "left",
        )
        live = F.coalesce(F.col("_t_present"), F.lit(False)) & ~F.coalesce(
            F.col(f"target.`{DELETED_COL}`"), F.lit(False)
        )
        # clause routing: one fused CASE picks the first holding clause
        route = F.lit(None).cast("int")
        n_wm = len(wm_clauses)
        for i in reversed(range(n_wm)):
            route = F.when(live & _cond(wm_clauses[i][0]), F.lit(i)).otherwise(
                route
            )
        routed = route
        route = F.lit(None).cast("int")
        for i in reversed(range(len(wnm_clauses))):
            route = F.when(
                ~live & _cond(wnm_clauses[i][0]), F.lit(n_wm + i)
            ).otherwise(route)
        routed = F.coalesce(routed, route)

        def _branch_val(action, col: str, matched: bool) -> Column:
            if isinstance(action, dict):
                if col in action:
                    return _as_column(action[col])
                return (
                    F.col(f"target.`{col}`") if matched
                    else F.lit(None)
                )
            if action == "delete":
                return F.lit(None)
            # "update" / "insert": same-named source column, else
            # carry-over (matched) / null (insert)
            if col in src_cols:
                return F.col(f"source.`{col}`")
            return F.col(f"target.`{col}`") if matched else F.lit(None)

        all_clauses = [(a, True) for _c, a in wm_clauses] + [
            (a, False) for _c, a in wnm_clauses
        ]
        def _branch_val_extra(action, col: str) -> Column:
            # evolving column: the target has no value yet, so carry-over
            # is null in every branch
            if isinstance(action, dict):
                return (
                    _as_column(action[col]) if col in action
                    else F.lit(None).cast(src.schema[col].dataType)
                )
            if action == "delete":
                return F.lit(None).cast(src.schema[col].dataType)
            return F.col(f"source.`{col}`")

        out_cols: list[Column] = [F.col(f"source.`{k}`").alias(k) for k in keys]
        for c in non_key_data:
            # typed seed: an all-delete statement would otherwise compile
            # every payload column to an untyped (void) NULL and trip
            # schema evolution
            v = F.lit(None).cast(m.schema[c].dataType)
            for i in reversed(range(len(all_clauses))):
                action, matched = all_clauses[i]
                v = F.when(routed == i, _branch_val(action, c, matched)).otherwise(v)
            out_cols.append(v.alias(c))
        for c in extra:
            v = F.lit(None).cast(src.schema[c].dataType)
            for i in reversed(range(len(all_clauses))):
                action, _matched = all_clauses[i]
                v = F.when(routed == i, _branch_val_extra(action, c)).otherwise(v)
            out_cols.append(v.alias(c))
        op = F.lit(None).cast("string")
        for i in reversed(range(len(all_clauses))):
            action, matched = all_clauses[i]
            o = (
                "delete" if action == "delete"
                else ("update" if matched else "insert")
            )
            op = F.when(routed == i, F.lit(o)).otherwise(op)
        out_cols.append(_next_seq(qualifier="target").alias(EVENT_SEQ_COL))
        out_cols.append(op.alias(OP_COL))
        batches.append(j.filter(routed.isNotNull()).select(*out_cols))

    if wnmbs_clauses:
        # live target rows absent from the source — inherently a full
        # live scan (the reference's staged-sync soft-delete shape)
        anti_keys = src.select(*keys)
        if small_source:
            anti_keys = F.broadcast(anti_keys)
        tgt = (
            table.read(include_internal=True)
            .alias("target")
            .join(anti_keys, on=keys, how="left_anti")
        )
        route = F.lit(None).cast("int")
        for i in reversed(range(len(wnmbs_clauses))):
            route = F.when(_cond(wnmbs_clauses[i][0]), F.lit(i)).otherwise(route)
        out_cols = [F.col(f"`{k}`").alias(k) for k in keys]
        for c in non_key_data:
            v = F.lit(None).cast(m.schema[c].dataType)
            for i in reversed(range(len(wnmbs_clauses))):
                action = wnmbs_clauses[i][1]
                bv = (
                    _as_column(action[c]) if isinstance(action, dict) and c in action
                    else (F.col(f"`{c}`") if isinstance(action, dict) else F.lit(None))
                )
                v = F.when(route == i, bv).otherwise(v)
            out_cols.append(v.alias(c))
        for c in extra:
            # target rows never carry an evolving column; only an explicit
            # assignment can set it here
            v = F.lit(None).cast(src.schema[c].dataType)
            for i in reversed(range(len(wnmbs_clauses))):
                action = wnmbs_clauses[i][1]
                if isinstance(action, dict) and c in action:
                    v = F.when(route == i, _as_column(action[c])).otherwise(v)
            out_cols.append(v.alias(c))
        op = F.lit(None).cast("string")
        for i in reversed(range(len(wnmbs_clauses))):
            o = "delete" if wnmbs_clauses[i][1] == "delete" else "update"
            op = F.when(route == i, F.lit(o)).otherwise(op)
        out_cols.append(_next_seq().alias(EVENT_SEQ_COL))
        out_cols.append(op.alias(OP_COL))
        batches.append(tgt.filter(route.isNotNull()).select(*out_cols))

    batch = batches[0]
    for b in batches[1:]:
        batch = batch.unionByName(b)
    batch = batch.localCheckpoint(eager=True)
    ops = {r[OP_COL]: r["n"] for r in batch.groupBy(OP_COL).agg(
        F.count(F.lit(1)).alias("n")
    ).collect()}
    counts = {
        "inserted": int(ops.get("insert", 0)),
        "updated": int(ops.get("update", 0)),
        "deleted": int(ops.get("delete", 0)),
    }
    if sum(counts.values()) == 0:
        return MergeApplyResult(counts, None)
    res = merge_into(
        table,
        batch,
        source_id=source_id,
        batch_id=batch_id,
        mode=mode,
        batch_unique=True,
        expected_watermark=expected_watermark,
    )
    if res.skipped:
        # a concurrent writer won the fence/CAS between the pre-check and
        # the commit: nothing landed, so report nothing
        counts = dict(_zero)
    return MergeApplyResult(counts, res)
