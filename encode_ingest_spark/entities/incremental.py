"""Incremental maintenance of the derived entity tables from the source
table's snapshot changelog — the round-trip the reference's weekly
full-recompute pipeline cannot do: instead of re-deriving all 16 tables
from a fresh full extract (cron-workflow.yaml:5-9), read ONLY what
changed between two source snapshots (`LakeTable.read_changes`) and
MERGE the delta into each derived table.

Two maintenance classes, chosen per derived table's shape:

* **row-wise projections** (the file entity): a changed source key maps
  1:1 to a derived key — project the change rows, carry the source
  ``_seq`` as the derived event_seq (monotone per key), op =
  delete→delete else upsert.
* **aggregates** (repo rollup, commit activity): classic dirty-group
  recomputation — the change set names the affected groups; recompute
  exactly those groups from the CURRENT source snapshot and upsert;
  dirty groups with zero remaining rows become deletes. The refresh's
  event_seq is the source snapshot version — monotone across refreshes,
  and a replayed refresh (same versions) ties with identical content.

At 10^10 rows this is the difference between touching a micro-batch's
worth of derived state and re-deriving everything: the changelog join
and the dirty-group semi-join are both bounded by the change set, not
the table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..lake import LakeTable, merge_into
from ..lake.merge import MergeResult
from .repo_entities import (
    composite_id,
    split_commit_activities,
    split_files,
    split_repos,
)


#: dirty-repo sets up to this size are collected to the driver and pushed
#: into the snapshot scan as an `isin` predicate (parquet row-group /
#: dictionary pruning); larger sets fall back to the semi-join-only plan.
DIRTY_GROUP_PUSHDOWN_CAP = 10_000


def incremental_split_refresh(
    source: LakeTable,
    targets: dict[str, LakeTable],
    from_version: int,
    to_version: int | None = None,
    batch_id: int | None = None,
) -> dict[str, MergeResult]:
    """Refresh derived tables (any of "file" / "repo" /
    "commit_activity") from the source changelog between two snapshots.
    ``from_version=0`` bootstraps (everything is an insert). Exactly-once
    composes: pass ``batch_id`` (e.g. the source version) and replayed
    refreshes fence off per target.

    Scale shape: the changelog scan is manifest-pruned to the buckets the
    interval actually touched (LakeTable.read_changes), and the dirty-
    group recompute scan is predicate-pruned to the dirty groups' repos
    (collected when ≤ DIRTY_GROUP_PUSHDOWN_CAP — a micro-batch touches
    few repos; the cap guards pathological batches). Every step is then
    proportional to the change set, not the table."""
    to_v = to_version if to_version is not None else source.current_version()
    if batch_id is not None:
        # replay fast path: drop targets whose fence already covers this
        # batch (manifest JSON reads only) — a fully-caught-up replay
        # then returns without launching a single Spark job
        pending = {}
        for name, t in targets.items():
            wm = t.current_manifest().watermarks.get("entity_refresh", {})
            if int(wm.get("batch_id", -1)) < int(batch_id):
                pending[name] = t
        if not pending:
            return {}
        targets = pending
    # the change set is consumed by up to four jobs (file batch, two
    # dirty-group sets, the pushdown collect) — materialize it once, AS
    # PARQUET SCRATCH: on wide-string payloads a parquet stage measures
    # ~2x cheaper than localCheckpoint (lake/merge.py's measured numbers,
    # 2.6 s vs 4.6 s on a 150k-row×2KB batch) and leaves no RDD blocks
    # lingering across a long stream's epochs
    import os
    import shutil
    import tempfile

    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    scratch = tempfile.mkdtemp(prefix="chlog_refresh_", dir=shm)
    try:
        raw = source.read_changes(from_version, to_v)
        stage = os.path.join(scratch, "changes")
        raw.write.mode("overwrite").parquet(stage)
        changes = source.spark.read.schema(raw.schema).parquet(stage)
        return _split_refresh_from_changes(
            source, targets, changes, to_v, batch_id
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _split_refresh_from_changes(
    source: LakeTable,
    targets: dict[str, LakeTable],
    changes,
    to_v: int,
    batch_id: int | None,
) -> dict[str, MergeResult]:
    results: dict[str, MergeResult] = {}
    is_del = F.col("_change_type") == F.lit("delete")

    if "file" in targets:
        batch = split_files(
            changes,
            extra={
                "op": F.when(is_del, F.lit("delete")).otherwise(F.lit("upsert")),
                "event_seq": F.col("_seq"),
            },
        )
        results["file"] = merge_into(
            targets["file"], batch, source_id="entity_refresh", batch_id=batch_id
        )

    current = None
    if "repo" in targets or "commit_activity" in targets:
        current = source.read(version=to_v)
        # every dirty group (repo rollup OR (repo,commit) activity) lives
        # inside the change set's repos — one pushdown-able predicate
        # prunes the recompute scan for both targets. `isin` on a plain
        # column reaches the parquet reader (row-group stats + dictionary
        # filtering), which a semi-join alone cannot.
        dirty_repos = [
            r[0]
            for r in changes.select("repo")
            .distinct()
            .limit(DIRTY_GROUP_PUSHDOWN_CAP + 1)
            .collect()
        ]
        if len(dirty_repos) <= DIRTY_GROUP_PUSHDOWN_CAP:
            current = current.filter(F.col("repo").isin(dirty_repos))

    if "repo" in targets:
        dirty = changes.select("repo").distinct()
        rolled = split_repos(current.join(dirty, "repo", "left_semi"))
        gone = dirty.select(F.col("repo").alias("repo_id")).join(
            rolled, "repo_id", "left_anti"
        )
        batch = (
            rolled.withColumn("op", F.lit("upsert"))
            .unionByName(
                gone.withColumn("op", F.lit("delete")), allowMissingColumns=True
            )
            .withColumn("event_seq", F.lit(to_v).cast("long"))
        )
        results["repo"] = merge_into(
            targets["repo"], batch, source_id="entity_refresh", batch_id=batch_id
        )

    if "commit_activity" in targets:
        dirty = changes.select(
            composite_id(F.col("repo"), F.col("commit")).alias("activity_id")
        ).distinct()
        rolled = split_commit_activities(
            current.join(
                dirty,
                composite_id(F.col("repo"), F.col("commit")) == dirty["activity_id"],
                "left_semi",
            )
        )
        gone = dirty.join(rolled, "activity_id", "left_anti")
        batch = (
            rolled.withColumn("op", F.lit("upsert"))
            .unionByName(
                gone.withColumn("op", F.lit("delete")), allowMissingColumns=True
            )
            .withColumn("event_seq", F.lit(to_v).cast("long"))
        )
        results["commit_activity"] = merge_into(
            targets["commit_activity"], batch,
            source_id="entity_refresh", batch_id=batch_id,
        )
    return results


def transactional_split_refresh(
    source: LakeTable,
    group,
    from_version: int,
    to_version: int | None = None,
    batch_id: int | None = None,
) -> dict[str, MergeResult]:
    """``incremental_split_refresh`` + ONE atomic cross-table commit: the
    derived tables' new versions become visible to group readers together
    or not at all (lake/txn.py TableGroup — the reference QC-checks FK
    integrity across its ~15 entity tables as a set,
    hack/check_for_missing_files.sh:16-47, which is only sound against a
    mutually-consistent snapshot vector).

    Crash anywhere before the group commit ⇒ group readers keep the
    previous consistent vector. Replay converges: member merges
    fence-skip, their committed versions are re-resolved from lineage,
    and the group commit re-issues the identical vector (or fence-skips
    if it landed)."""
    targets = group.tables()
    results = incremental_split_refresh(
        source, targets, from_version, to_version, batch_id
    )
    versions: dict[str, int] = {}
    for name, t in targets.items():
        if name in results:
            # skipped results still carry a post-batch manifest (the
            # fence implies the batch is already in the current state)
            versions[name] = results[name].manifest.version
        elif batch_id is not None:
            # dropped by the replay fast path: resolve the version that
            # committed this batch from the member's lineage
            v = group.version_for_batch(t, "entity_refresh", batch_id)
            versions[name] = v if v is not None else t.current_version()
        else:
            versions[name] = t.current_version()
    group.commit(versions, source_id="entity_refresh", batch_id=batch_id)
    return results


def referential_integrity_report(
    files_df, repos_df, activities_df
) -> "DataFrame":
    """FK orphan counts across the entity-split tables (the J15 anti-join
    shape, applied as the reference's cross-table QC,
    hack/check_for_missing_files.sh): files whose repo_id or
    commit_activity_id resolves to no row in the parent table. Run it
    over ONE group snapshot (TableGroup.read) — against mixed versions
    the counts are meaningless."""
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    orphan_repo = (
        files_df.join(
            repos_df.select(F.col("repo_id")), "repo_id", "left_anti"
        ).count()
    )
    orphan_act = (
        files_df.join(
            activities_df.select(F.col("activity_id").alias("commit_activity_id")),
            "commit_activity_id",
            "left_anti",
        ).count()
    )
    spark = files_df.sparkSession
    return spark.createDataFrame(
        [(int(orphan_repo), int(orphan_act))],
        "orphan_repo_refs long, orphan_activity_refs long",
    )
