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

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..lake import LakeTable, merge_into
from ..lake.merge import MergeResult
from .repo_entities import (
    composite_id,
    split_commit_activities,
    split_files,
    split_repos,
)


#: dirty-group sets up to this size are collected to the driver and pushed
#: into the snapshot scan as an `isin` predicate (parquet row-group /
#: dictionary pruning); larger sets fall back to the semi-join-only plan.
DIRTY_GROUP_PUSHDOWN_CAP = 10_000


@dataclass(frozen=True)
class ProjectionSpec:
    """Row-wise derived table: each changed source key maps 1:1 to a
    derived key. ``build(changes, extra)`` projects the change rows into
    the merge batch; ``extra`` supplies the CDC envelope (op carried
    from ``_change_type``, event_seq carried from the source ``_seq`` —
    monotone per derived key because it is monotone per source key)."""

    name: str
    build: Callable[[DataFrame, dict], DataFrame]


@dataclass(frozen=True)
class RollupSpec:
    """Dirty-group aggregate derived table, recomputed per affected
    group. ``group_id`` is a row-level group expression over SOURCE-
    shaped rows; it may reference MUTABLE payload columns — the refresh
    derives dirty groups from both the post-image and the ``_before``
    pre-image, so an update that moves a row between groups dirties
    both. ``build(subset)`` aggregates the dirty groups' current rows
    into rolled rows keyed by ``id_col``; groups with no remaining rows
    become deletes.

    ``pushdown_col`` names a plain source column whose dirty values form
    a scan predicate (manifest file pruning + parquet row-group/dict
    pruning; pair with the table's ``write.sort_within_buckets``).
    **INVARIANT: group membership must functionally determine the
    pushdown column** — every source row of a dirty group must carry one
    of the dirty groups' pushdown values, or the pruned recompute will
    silently miss rows (the builtins satisfy this: repo IS the group /
    a component of it). When unsure, leave ``pushdown_col=None`` —
    correctness never depends on it, only scan cost does.

    ``mutable_groups=False`` declares ``group_id`` a function of the
    table's KEY columns only (immutable per key): the refresh then skips
    the ``_before`` pre-image entirely — the changelog payload halves —
    because a row can never move between groups."""

    name: str
    id_col: str
    group_id: Callable[[], Column]
    build: Callable[[DataFrame], DataFrame]
    pushdown_col: str | None = None
    mutable_groups: bool = True


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
    # unknown names are ignored (a caller may pass split_all()'s whole
    # output dict; only the three built-in shapes are maintained here)
    known = {n: t for n, t in targets.items() if n in REPO_FILE_SPECS}
    specs = {name: REPO_FILE_SPECS[name] for name in known}
    return refresh_derived(
        source, known, specs, from_version, to_version, batch_id
    )


#: the built-in repo-file derived tables, expressed in the generic spec
#: vocabulary — users register their OWN derived tables the same way
REPO_FILE_SPECS: dict[str, ProjectionSpec | RollupSpec] = {
    "file": ProjectionSpec("file", split_files),
    "repo": RollupSpec(
        "repo",
        id_col="repo_id",
        group_id=lambda: F.col("repo"),
        build=split_repos,
        pushdown_col="repo",
        mutable_groups=False,  # repo is a key column
    ),
    "commit_activity": RollupSpec(
        "commit_activity",
        id_col="activity_id",
        group_id=lambda: composite_id(F.col("repo"), F.col("commit")),
        build=split_commit_activities,
        pushdown_col="repo",
        mutable_groups=False,  # (repo, commit) are key columns
    ),
}


def projection_spec_for(
    name: str,
    mapper: Callable[[DataFrame], DataFrame],
    id_expr: Callable[[], Column],
    id_col: str,
) -> ProjectionSpec:
    """Wrap ANY raw→entity mapper (raw_df → entity_df, reference §2.10
    shape) into a ProjectionSpec WITHOUT modifying it: the CDC envelope
    (op, event_seq) is computed over the change rows keyed by the same
    minted id expression and joined back onto the mapper output — a
    change-set-sized join, so every one of the reference's 13 mappers
    becomes incrementally maintainable in one line. Mappers with
    dimension inputs close over them (e.g.
    ``lambda raw: transform_antibody(raw, targets=targets_df)``)."""

    def build(changes: DataFrame, extra: dict) -> DataFrame:
        env = changes.select(
            id_expr().alias(id_col), *[c.alias(n) for n, c in extra.items()]
        )
        return mapper(changes).join(env, id_col)

    return ProjectionSpec(name, build)


def refresh_derived(
    source: LakeTable,
    targets: dict[str, LakeTable],
    specs: dict[str, "ProjectionSpec | RollupSpec"],
    from_version: int,
    to_version: int | None = None,
    batch_id: int | None = None,
) -> dict[str, MergeResult]:
    """Generic incremental maintenance: refresh each named derived table
    per its spec from the source changelog. The engine's user-facing
    materialized-view primitive — ``incremental_split_refresh`` is just
    this with the built-in ``REPO_FILE_SPECS``."""
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
    missing = set(targets) - set(specs)
    if missing:
        raise ValueError(f"no spec for derived tables: {sorted(missing)}")
    # the change set is consumed by several jobs (one per spec plus the
    # pushdown collects) — materialize it once, AS PARQUET SCRATCH: on
    # wide-string payloads a parquet stage measures ~2x cheaper than
    # localCheckpoint (lake/merge.py's measured numbers, 2.6 s vs 4.6 s
    # on a 150k-row×2KB batch) and leaves no RDD blocks lingering across
    # a long stream's epochs. Staged UNDER source.root/_staging (with
    # the table's pid-marker liveness convention) like every other
    # staging path in the engine: the table root is the one location
    # executors on a multi-node cluster are guaranteed to share — a
    # driver-local tempdir is invisible to them (ADVICE r3).
    import os
    import shutil
    import uuid as _uuid

    scratch = os.path.join(
        source.root, "_staging", f"chlog_refresh_{_uuid.uuid4().hex}"
    )
    os.makedirs(scratch, exist_ok=True)
    marker = source._stage_marker(scratch)
    try:
        # the _before pre-image doubles the changelog payload; carry it
        # only when some requested rollup can actually move rows between
        # groups (the built-in key-derived rollups cannot)
        need_before = any(
            isinstance(specs[n], RollupSpec) and specs[n].mutable_groups
            for n in targets
        )
        raw = source.read_changes(
            from_version, to_v, include_before=need_before
        )
        stage = os.path.join(scratch, "changes")
        raw.write.mode("overwrite").parquet(stage)
        changes = source.spark.read.schema(raw.schema).parquet(stage)

        keys = source.current_manifest().key_cols
        # pre-image rows re-shaped like source rows (keys are immutable
        # per key, payload from _before): group expressions over MUTABLE
        # columns evaluate on these to dirty the OLD group of a moved row
        before_rows = (
            changes.filter(F.col("_before").isNotNull()).select(
                *keys, "_before.*"
            )
            if need_before
            else None
        )

        def change_rows_for(spec: RollupSpec) -> DataFrame:
            if spec.mutable_groups and before_rows is not None:
                both_cols = [c for c in changes.columns
                             if c not in ("_change_type", "_before")]
                return changes.select(*both_cols).unionByName(
                    before_rows.select(*both_cols)
                )
            return changes

        # one collect per pushdown column, shared across specs (the two
        # built-in rollups both push down on `repo`)
        pushdown_cache: dict[tuple[str, bool], list] = {}

        results: dict[str, MergeResult] = {}
        is_del = F.col("_change_type") == F.lit("delete")
        for name, target in targets.items():
            spec = specs[name]
            if isinstance(spec, ProjectionSpec):
                batch = spec.build(
                    changes,
                    {
                        "op": F.when(is_del, F.lit("delete")).otherwise(
                            F.lit("upsert")
                        ),
                        "event_seq": F.col("_seq"),
                    },
                )
                results[name] = merge_into(
                    target, batch, source_id="entity_refresh", batch_id=batch_id
                )
                continue

            gid = spec.group_id()
            rows_for_dirty = change_rows_for(spec)
            dirty = (
                rows_for_dirty.select(gid.alias(spec.id_col))
                .filter(F.col(spec.id_col).isNotNull())
                .distinct()
            )
            cur = None
            if spec.pushdown_col is not None:
                # dirty groups live inside these plain-column values —
                # two pruning levels from one collected set: (a) a
                # manifest-level FILE prune against the per-file
                # col_stats ranges (tight when the source clusters with
                # write.sort_within_buckets; COW-only, see read()), and
                # (b) a pushdown-able predicate the parquet reader
                # prunes row groups / dictionaries with — neither of
                # which a semi-join alone can do
                ck = (spec.pushdown_col, spec.mutable_groups)
                vals = pushdown_cache.get(ck)
                if vals is None:
                    vals = [
                        r[0]
                        for r in rows_for_dirty.select(spec.pushdown_col)
                        .distinct()
                        .limit(DIRTY_GROUP_PUSHDOWN_CAP + 1)
                        .collect()
                    ]
                    pushdown_cache[ck] = vals
                if len(vals) <= DIRTY_GROUP_PUSHDOWN_CAP:
                    # NULL is never matched by isin(): handle it apart —
                    # a user group_id may map null pushdown values into
                    # a real group (e.g. coalesce(lang, 'unknown'))
                    non_null = [v for v in vals if v is not None]
                    from .universe import _isin_literal

                    pred = _isin_literal(spec.pushdown_col, non_null)
                    # value-range FILE pruning only when no null is
                    # sought: col_stats ranges say nothing about a
                    # file's null rows, so pruning could drop them
                    fvr = None
                    if len(non_null) == len(vals):
                        fvr = {spec.pushdown_col: non_null}
                    else:
                        pred = pred | F.col(spec.pushdown_col).isNull()
                    cur = source.read(
                        version=to_v, file_value_ranges=fvr
                    ).filter(pred)
                else:
                    # WIDE batch (> cap dirty values): collapse the set
                    # to its [min, max] INTERVAL — one agg over the
                    # change set, no driver-side value list — and prune
                    # files whose col_stats range misses the interval
                    # (tight when the table clusters on the column).
                    # The BETWEEN predicate keeps every dirty-group row
                    # (all dirty values lie inside the interval); the
                    # dirty semi-join below does the exact filtering.
                    c = F.col(spec.pushdown_col)
                    stats = pushdown_cache.get(("__range__", ck))
                    if stats is None:
                        stats = rows_for_dirty.agg(
                            F.min(spec.pushdown_col).alias("lo"),
                            F.max(spec.pushdown_col).alias("hi"),
                            F.max(c.isNull().cast("int")).alias("has_null"),
                        ).first()
                        pushdown_cache[("__range__", ck)] = stats
                    if stats.lo is not None:
                        pred = c.between(stats.lo, stats.hi)
                        fvr = {spec.pushdown_col: [(stats.lo, stats.hi)]}
                        if stats.has_null:
                            pred = pred | c.isNull()
                            fvr = None  # ranges say nothing about nulls
                        cur = source.read(
                            version=to_v, file_value_ranges=fvr
                        ).filter(pred)
            if cur is None:
                cur = source.read(version=to_v)
            subset = cur.join(
                dirty, spec.group_id() == dirty[spec.id_col], "left_semi"
            )
            rolled = spec.build(subset)
            gone = dirty.join(rolled, spec.id_col, "left_anti")
            batch = (
                rolled.withColumn("op", F.lit("upsert"))
                .unionByName(
                    gone.withColumn("op", F.lit("delete")),
                    allowMissingColumns=True,
                )
                .withColumn("event_seq", F.lit(to_v).cast("long"))
            )
            results[name] = merge_into(
                target, batch, source_id="entity_refresh", batch_id=batch_id
            )
        return results
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        try:
            os.remove(marker)
        except OSError:
            pass


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
