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

from .merge import EVENT_SEQ_COL, OP_COL, MergeResult, merge_into
from .table import DELETED_COL, SEQ_COL, LakeTable


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


def _next_seq() -> Column:
    """Per-key monotone successor of the matched row's current ``_seq``
    (built lazily — Column construction needs a live gateway)."""
    return (F.coalesce(F.col(SEQ_COL), F.lit(-1)) + F.lit(1)).cast("long")


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
