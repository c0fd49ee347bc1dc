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
    refreshes fence off per target."""
    to_v = to_version if to_version is not None else source.current_version()
    changes = source.read_changes(from_version, to_v)
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
