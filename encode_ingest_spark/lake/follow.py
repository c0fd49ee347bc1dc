"""Checkpointed change-feed follower — chain lake tables into pipelines.

The lake is a CDC *source* as well as a sink (``LakeTable.read_changes``,
the Iceberg changelog-scan / Delta ``table_changes`` analogue). This
module adds the CONSUMPTION loop that turns a table's changelog into a
derived table, exactly once — the Delta streaming table-tail pattern,
batch-driven so it composes with any scheduler (cron, Structured
Streaming ``foreachBatch``, the CLI ``follow`` verb).

Checkpoint design: the follower's position IS the target table's
``(source_id, batch_id)`` merge watermark, where ``batch_id`` = the
last consumed SOURCE VERSION. There is no external checkpoint file, so
there is no window where data and checkpoint disagree: a crash after
the merge but "before the checkpoint write" cannot exist, and a crash
before the merge just re-derives the same span next poll — the fence
skips it if it actually landed. Source versions are strictly monotone,
so the fence's ``>=`` comparison is exactly the resume rule. This is
the same fence the streaming pipelines use (reference idempotency
contract, ingest-processed-data.yaml:10-11), pointed at a lake table
instead of an external source.

Scale: each ``poll()`` reads only the buckets whose file lists changed
in the consumed span (``read_changes`` manifest pruning), so the work
per poll is proportional to the CHANGE SET, not the table — at 10^10
rows a quiet hour costs a manifest read, not a scan. The merge lands
MOR by default (append-shaped, compaction amortized by the table's
``mor.compact.threshold``), and a change-set that fits the local
commit cap could be landed driver-locally by callers that need it.

Ordering: mirrored rows ride at ``event_seq = to_version`` — the
consumed span's END SOURCE VERSION — not the source row's own ``_seq``.
Commit-version ordering is what changelog consumers need (Delta CDF's
``_commit_version``): ``read_changes`` already collapses a span to one
final-state row per key, so per-key order across polls IS source commit
order. Reusing row seqs instead would break twice: a mirrored delete
carrying the dead row's seq TIES the copy the target already holds
(MOR ties are arbitrary-winner), and a source ROLLBACK rewinds row
seqs, so the reverting update could never outrank the bad row it
reverts. Span-version seqs are strictly monotone per key by
construction, whatever the source's seq history does.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .merge import EVENT_SEQ_COL, OP_COL, MergeResult, merge_into
from .table import DELETED_COL, SEQ_COL, LakeTable


@dataclass
class FollowResult:
    """Outcome of one poll: the consumed source span (inclusive end),
    or ``None`` when already caught up."""

    from_version: Optional[int]
    to_version: Optional[int]
    merge: Optional[MergeResult]

    @property
    def caught_up(self) -> bool:
        return self.to_version is None


class ChangeFeedFollower:
    """Incrementally apply one LakeTable's changes to another.

    ``transform`` (optional) rewrites the ENVELOPE batch — key cols +
    payload cols + ``op`` + ``event_seq`` — before the merge (rename /
    derive / filter); it must preserve the target's key columns and the
    ``op``/``event_seq`` pair. A transform that keeps at most one row
    per key (the default assumption for a 1:1 projection; always true
    with no transform, since ``read_changes`` emits one row per changed
    key) lets the merge skip its in-batch winners shuffle
    (``batch_unique``) — pass ``batch_unique=False`` for a fan-out
    transform.
    """

    def __init__(
        self,
        source: LakeTable,
        target: LakeTable,
        source_id: str | None = None,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        merge_mode: str = "mor",
        batch_unique: bool = True,
        merge_kwargs: dict[str, Any] | None = None,
    ):
        self.source = source
        self.target = target
        # stable default identity: one follower lineage per source path
        self.source_id = source_id or (
            "follow:" + os.path.abspath(source.root)
        )
        self.transform = transform
        self.merge_mode = merge_mode
        self.batch_unique = batch_unique
        self.merge_kwargs = dict(merge_kwargs or {})

    # ---------- checkpoint ----------
    def checkpoint(self) -> int:
        """Last consumed source version (-1 = never polled)."""
        wm = self.target.current_manifest().watermarks.get(self.source_id)
        return -1 if wm is None else int(wm.get("batch_id", -1))

    def lag(self) -> int:
        """Source versions not yet consumed (0 = caught up)."""
        return max(0, self.source.current_version() - max(0, self.checkpoint()))

    # ---------- consumption ----------
    def _bootstrap_batch(self, to_version: int) -> DataFrame:
        # first consumption: every live row is an insert — a plain
        # pruned-by-nothing snapshot scan, no diff join (mirrors
        # read_changes' empty-base fast path without requiring the
        # possibly-expired version-0 manifest)
        new = self.source.read(version=to_version)
        return new.select(
            "*",
            F.lit("upsert").alias(OP_COL),
            F.lit(to_version).cast("long").alias(EVENT_SEQ_COL),
        )

    def _span_batch(self, from_version: int, to_version: int) -> DataFrame:
        try:
            changes = self.source.read_changes(from_version, to_version)
        except (FileNotFoundError, OSError) as e:
            # the checkpointed source version was expired by the
            # source's snapshot retention while this follower lagged —
            # an incremental span can no longer be derived
            raise ValueError(
                f"follower checkpoint at source version {from_version} of "
                f"{self.source.root} is no longer loadable (expired by "
                "snapshot retention while the follower lagged?) — the "
                "incremental span cannot be derived; recover with "
                "resync(), which re-mirrors the full current snapshot "
                "exactly once"
            ) from e
        is_del = F.col("_change_type") == "delete"
        return (
            changes
            .withColumn(
                OP_COL,
                F.when(is_del, F.lit("delete")).otherwise(F.lit("upsert")),
            )
            # commit-version ordering: see module docstring
            .withColumn(
                EVENT_SEQ_COL, F.lit(to_version).cast("long")
            )
            .drop("_change_type", SEQ_COL)
        )

    #: stale-CAS retries per poll — each retry recomputes the span from
    #: the fresh checkpoint, so one concurrent poll costs one recompute
    _POLL_ATTEMPTS = 3

    def poll(self) -> FollowResult:
        """Consume everything committed to the source since the last
        poll, exactly once. Returns the consumed span (``caught_up``
        when there was nothing new).

        Safe under OVERLAPPING polls (cron overlap, a second scheduler):
        the merge carries ``expected_watermark=from_v``, a compare-and-
        swap on the checkpoint — if another poll advanced it between
        this poll's span computation and its commit, the commit is
        skipped as stale (never landed) and the span is recomputed from
        the fresh checkpoint. Without the CAS, two polls sharing a
        stale checkpoint could both commit and the wider (possibly
        empty, e.g. after a source rollback to the checkpoint) span
        would advance the checkpoint past the narrower span's rows."""
        for _ in range(self._POLL_ATTEMPTS):
            to_v = self.source.current_version()
            from_v = self.checkpoint()
            if from_v >= to_v:
                return FollowResult(None, None, None)
            if from_v < 0:
                batch = self._bootstrap_batch(to_v)
            else:
                batch = self._span_batch(from_v, to_v)
            if self.transform is not None:
                batch = self.transform(batch)
            res = merge_into(
                self.target,
                batch,
                source_id=self.source_id,
                batch_id=to_v,
                offset_range=(max(0, from_v), to_v),
                mode=self.merge_mode,
                batch_unique=self.batch_unique,
                expected_watermark=from_v,
                **self.merge_kwargs,
            )
            if not getattr(res, "stale", False):
                return FollowResult(max(0, from_v), to_v, res)
            # checkpoint moved under us — loop recomputes from CURRENT
        raise RuntimeError(
            f"poll of {self.source.root} lost {self._POLL_ATTEMPTS} "
            "consecutive checkpoint races — another follower instance is "
            "actively consuming this feed into the same target"
        )

    def resync(self) -> FollowResult:
        """Full re-mirror: land the source's CURRENT snapshot as one
        batch — upserts for every live row plus deletes for target keys
        the source no longer holds — and move the checkpoint to the
        current source version. The recovery path when the checkpoint
        has been EXPIRED by source snapshot retention (``poll`` raises
        ``ValueError``): one full-snapshot scan + one target-keys
        anti-join instead of the unrecoverable incremental span. Runs
        under the same exactly-once fence and checkpoint CAS as
        ``poll``, so a concurrent poll/resync cannot double-apply."""
        to_v = self.source.current_version()
        from_v = self.checkpoint()
        if from_v >= to_v:
            return FollowResult(None, None, None)
        batch = self._bootstrap_batch(to_v)
        if self.transform is not None:
            batch = self.transform(batch)
        # deletes: target keys absent from the (transformed) live image.
        # Computed on TARGET keys so a renaming transform still works.
        keys = list(self.target.current_manifest().key_cols)
        gone = (
            self.target.read()
            .select(*keys)
            .join(batch.select(*keys), on=keys, how="left_anti")
            .select(
                "*",
                F.lit("delete").alias(OP_COL),
                F.lit(to_v).cast("long").alias(EVENT_SEQ_COL),
            )
        )
        full = batch.unionByName(gone, allowMissingColumns=True)
        res = merge_into(
            self.target,
            full,
            source_id=self.source_id,
            batch_id=to_v,
            offset_range=(max(0, from_v), to_v),
            mode=self.merge_mode,
            batch_unique=self.batch_unique,
            expected_watermark=from_v,
            **self.merge_kwargs,
        )
        return FollowResult(max(0, from_v), to_v, res)

    # ---------- convenience ----------
    @staticmethod
    def mirror_target(
        source: LakeTable, root: str, num_buckets: int | None = None
    ) -> LakeTable:
        """Create an empty target with the source's schema and keys —
        the plain-replica shape (same bucket count by default, so the
        mirrored feed lands pre-partitioned)."""
        m = source.current_manifest()
        schema = m.schema
        data_fields = [
            f for f in schema.fields if f.name not in (SEQ_COL, DELETED_COL)
        ]
        import pyspark.sql.types as T

        return LakeTable.create(
            source.spark,
            root,
            T.StructType(data_fields),
            list(m.key_cols),
            num_buckets=num_buckets or m.num_buckets,
            properties=dict(m.properties),
        )
