"""spark-submit-able job driver: ``python -m encode_ingest_spark <cmd>``.

The north-rule deployment shape is ``spark-submit --py-files`` on a
multi-executor cluster; this module is the job script that shape needs —
the same CDC engine the library exposes, behind a verb-per-operation CLI:

    create    make an empty bucketed lake table
    generate  stage a deterministic CDC event backlog (parquet files)
    merge     apply ONE batch file (exactly-once fenced) to a table
    ingest    tail an event directory: readStream -> foreachBatch MERGE
    maintain  housekeeping: compaction, tombstone purge, expiry, GC
    status    print table state: version, rows, watermarks, lineage tail
    rollback  commit-forward rollback (table or --group) for recovery
    follow    checkpointed change-feed poll into a derived table
    tag       named immutable snapshots (set / delete / list)
    branch    write-audit-publish refs (create / publish / drop / list;
              stage with `merge --ref`, audit with `status --ref`)

    universe-create   lay out the full entity universe (raw CDC tables,
                      derived output trees, atomic table group)
    universe-ingest   drain a multiplexed raw-entity changelog: per
                      epoch, merge raw tables then land ONE
                      transactional incremental refresh of every
                      derived tree (the reference's whole weekly
                      extract->transform DAG as a resumable job)
    universe-status   group version + per-table state

Cluster vs sandbox: under spark-submit the master/executor topology comes
from the submit command (session.get_spark detects PYSPARK_SUBMIT_ARGS and
leaves ``spark.master`` alone); run bare (``python -m encode_ingest_spark``)
it falls back to the tuned ``local[N]`` session used everywhere else.

    spark-submit --master yarn --deploy-mode client \
      --py-files encode_ingest_spark.zip \
      -m ... # (or: spark-submit cli.py where cli.py imports this main)
    python -m encode_ingest_spark ingest --root /lake/repo_files \
      --events-dir /wal/events --checkpoint /ckpt/s1 --source-id s1

Every command prints ONE JSON line (machine-readable, same contract as
bench.py) so an orchestrator (the reference drives everything from Argo
YAML, orchestration/cron-workflow.yaml:5-9) can chain verbs on exit code
plus parsed output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import types as T

REPO_FILE_DDL = "repo string, path string, commit string, lang string, content string"
DEFAULT_KEYS = "repo,path,commit"


def _spark(args) -> SparkSession:
    from .session import get_spark

    return get_spark(
        "encode_ingest_cli", cores=getattr(args, "cores", None) or None
    )


def _load(spark: SparkSession, root: str, ref: str | None = None):
    from .lake import LakeTable

    table = LakeTable.load(spark, root)
    return table.branch(ref) if ref else table


def _emit(payload: dict) -> None:
    print(json.dumps(payload, sort_keys=True))


def cmd_create(spark: SparkSession, args) -> int:
    from .lake import LakeTable

    schema = T.StructType.fromDDL(args.schema_ddl)
    table = LakeTable.create(
        spark,
        args.root,
        schema,
        [k.strip() for k in args.keys.split(",") if k.strip()],
        num_buckets=args.buckets,
        # bound MOR delta chains by default so `ingest --local-commit-cap`
        # (and mor-mode merges) can't grow read cost without limit
        properties={"mor.compact.threshold": str(args.mor_compact_threshold)}
        if args.mor_compact_threshold
        else None,
    )
    _emit(
        {
            "cmd": "create",
            "root": args.root,
            "version": table.current_version(),
            "buckets": args.buckets,
            "keys": table.current_manifest().key_cols,
        }
    )
    return 0


def cmd_generate(spark: SparkSession, args) -> int:
    from .cdc.generator import repo_file_events
    from .streaming.pipeline import write_event_files

    ev = repo_file_events(
        spark,
        n_keys=args.n_keys,
        events_per_key=args.events_per_key,
        seed=args.seed,
        n_repos=args.n_repos,
        delete_pct=args.delete_pct,
    )
    write_event_files(ev, args.out, n_files=args.files)
    _emit(
        {
            "cmd": "generate",
            "out": args.out,
            "events": args.n_keys * args.events_per_key,
            "files": args.files,
            "seed": args.seed,
        }
    )
    return 0


def cmd_merge(spark: SparkSession, args) -> int:
    from .lake.merge import merge_into

    table = _load(spark, args.root, ref=getattr(args, "ref", None))
    batch = spark.read.parquet(args.batch)
    res = merge_into(
        table,
        batch,
        source_id=args.source_id,
        batch_id=args.batch_id,
        mode=args.mode,
    )
    _emit(
        {
            "cmd": "merge",
            "root": args.root,
            "source_id": args.source_id,
            "batch_id": args.batch_id,
            "skipped": res.skipped,
            "version": res.manifest.version,
            "counts": res.counts,
        }
    )
    return 0


def cmd_delete(spark: SparkSession, args) -> int:
    from .lake.dml import delete_where

    table = _load(spark, args.root, ref=getattr(args, "ref", None))
    res = delete_where(
        table,
        args.where,
        source_id=args.source_id,
        batch_id=args.batch_id,
        mode=args.mode,
    )
    _emit(
        {
            "cmd": "delete",
            "root": args.root,
            "where": args.where,
            "rows_matched": res.rows_matched,
            "skipped": bool(res.merge and res.merge.skipped),
            "version": res.version if res.version is not None
            else table.current_version(),
        }
    )
    return 0


def cmd_update(spark: SparkSession, args) -> int:
    from .lake.dml import update_where

    table = _load(spark, args.root, ref=getattr(args, "ref", None))
    assignments: dict[str, str] = {}
    for item in args.set or []:
        col, eq, expr = item.partition("=")
        if not eq or not col:
            raise SystemExit(f"--set expects col=expr, got {item!r}")
        assignments[col.strip()] = expr
    res = update_where(
        table,
        args.where,
        assignments,
        source_id=args.source_id,
        batch_id=args.batch_id,
        mode=args.mode,
    )
    _emit(
        {
            "cmd": "update",
            "root": args.root,
            "where": args.where,
            "set": sorted(assignments),
            "rows_matched": res.rows_matched,
            "skipped": bool(res.merge and res.merge.skipped),
            "version": res.version if res.version is not None
            else table.current_version(),
        }
    )
    return 0


def cmd_sync(spark: SparkSession, args) -> int:
    """MERGE a staged parquet dataset into the table: upsert staged rows
    and (with --prune-missing) soft-delete live rows absent from staging
    — the reference's staged-dataset sync
    (orchestration/templates/ingest-processed-data.yaml:86-172) as one
    idempotent CLI statement over ``merge_apply``."""
    from .lake.dml import merge_apply

    table = _load(spark, args.root, ref=getattr(args, "ref", None))
    source = spark.read.parquet(args.source)
    if (
        args.prune_missing
        and not args.force_empty_source
        and not source.limit(1).take(1)
    ):
        raise SystemExit(
            "sync --prune-missing with an EMPTY source would soft-delete "
            "every live row (a failed upstream extract looks exactly like "
            "this); pass --force-empty-source if the wipe is intended"
        )
    res = merge_apply(
        table,
        source,
        when_matched="update",
        when_not_matched="insert",
        when_not_matched_by_source="delete" if args.prune_missing else None,
        source_id=args.source_id,
        batch_id=args.batch_id,
        mode=args.mode,
    )
    _emit(
        {
            "cmd": "sync",
            "root": args.root,
            "source": args.source,
            "prune_missing": bool(args.prune_missing),
            "counts": res.counts,
            "skipped": bool(res.merge and res.merge.skipped),
            "stale": bool(res.merge and res.merge.stale),
            "version": res.version if res.version is not None
            else table.current_version(),
        }
    )
    return 0


def cmd_ingest(spark: SparkSession, args) -> int:
    from .streaming.pipeline import CdcStreamPipeline

    table = _load(spark, args.root)
    pipe = CdcStreamPipeline(
        table,
        events_dir=args.events_dir,
        checkpoint_dir=args.checkpoint,
        source_id=args.source_id,
        max_files_per_trigger=args.max_files_per_trigger,
        merge_mode=args.merge_mode,
        local_commit_cap=args.local_commit_cap,
    )
    merged = pipe.run_available_now(spark, timeout_sec=args.timeout_sec)
    _emit(
        {
            "cmd": "ingest",
            "root": args.root,
            "source_id": args.source_id,
            "batches_merged": merged,
            "batches_fenced": len(pipe.batch_results) - merged,
            "version": table.current_version(),
            "last_committed_batch": pipe.last_committed_batch(),
        }
    )
    return 0


def _universe_layout(root: str) -> tuple[str, str, str]:
    return f"{root}/raw", f"{root}/out", f"{root}/group"


def _load_universe(spark: SparkSession, root: str):
    from .entities.universe import TREE_SPECS, UNIVERSE_SCHEMAS
    from .lake import LakeTable
    from .lake.txn import TableGroup

    raw_root, out_root, grp_root = _universe_layout(root)
    universe = {
        n: LakeTable.load(spark, f"{raw_root}/{n}") for n in UNIVERSE_SCHEMAS
    }
    targets = {
        n: LakeTable.load(spark, f"{out_root}/{n}") for n in TREE_SPECS
    }
    group = TableGroup.load(spark, grp_root)
    return universe, targets, group


def cmd_universe_create(spark: SparkSession, args) -> int:
    from .entities.universe import create_entity_targets, create_universe
    from .lake.txn import TableGroup

    raw_root, out_root, grp_root = _universe_layout(args.root)
    universe = create_universe(spark, raw_root, num_buckets=args.buckets)
    targets = create_entity_targets(spark, out_root, num_buckets=args.buckets)
    TableGroup.create(
        spark, grp_root,
        {n: t for n, t in targets.items() if not n.startswith("_")},
    )
    _emit(
        {
            "cmd": "universe-create",
            "root": args.root,
            "raw_tables": len(universe),
            "output_tables": len(targets),
        }
    )
    return 0


def cmd_universe_ingest(spark: SparkSession, args) -> int:
    from .streaming.pipeline import UniverseStreamPipeline

    universe, targets, group = _load_universe(spark, args.root)
    pipe = UniverseStreamPipeline(
        universe,
        targets,
        args.events_dir,
        args.checkpoint,
        group=group,
        source_id=args.source_id,
        max_files_per_trigger=args.max_files_per_trigger,
        local_commit_cap=args.local_commit_cap,
    )
    merged = pipe.run_available_now(spark, timeout_sec=args.timeout_sec)
    _emit(
        {
            "cmd": "universe-ingest",
            "root": args.root,
            "epochs_merged": merged,
            "group_version": group.current_version(),
        }
    )
    return 0


def cmd_universe_status(spark: SparkSession, args) -> int:
    universe, targets, group = _load_universe(spark, args.root)
    gm = group.current_manifest()
    _emit(
        {
            "cmd": "universe-status",
            "root": args.root,
            "group_version": group.current_version(),
            "tables": {
                n: {
                    "version": v,
                    "rows_upper_bound": sum(
                        f.rows for f in targets[n].manifest_at(v).files
                    ),
                }
                for n, v in group.pinned_versions().items()
            },
            "raw_versions": {
                n: t.current_version() for n, t in sorted(universe.items())
            },
            "watermarks": gm.get("watermarks", {}),
        }
    )
    return 0


def cmd_universe_maintain(spark: SparkSession, args) -> int:
    """Housekeeping across the whole universe layout, the pass a
    scheduler runs between ingest windows: expire old GROUP versions
    first (freeing the member-snapshot pins they hold), then run every
    member table's ``maintain()`` — bucket compaction, optional
    tombstone purge, snapshot expiry, orphan GC — each step manifest-
    or stats-pruned so a healthy universe is a near-no-op."""
    universe, targets, group = _load_universe(spark, args.root)
    expired_group = group.expire_snapshots(
        keep_last=args.keep_group_versions
    )
    tables = list(universe.values()) + list(targets.values())
    agg: dict[str, int] = {}
    for t in tables:
        rep = t.maintain(
            tombstone_horizon_seq=args.tombstone_horizon_seq,
            max_files_per_bucket=args.max_files_per_bucket,
            keep_snapshots=args.keep_snapshots,
            snapshot_age_sec=args.snapshot_age_sec,
            remove_orphan_files=not args.no_orphan_gc,
        )
        for k, v in rep.items():
            agg[k] = agg.get(k, 0) + int(v)
    _emit(
        {
            "cmd": "universe-maintain",
            "root": args.root,
            "tables_maintained": len(tables),
            "expired_group_versions": expired_group,
            **agg,
        }
    )
    return 0


def cmd_maintain(spark: SparkSession, args) -> int:
    table = _load(spark, args.root)
    recluster: dict = {}
    if getattr(args, "zorder", None) or getattr(args, "cluster_sort", None):
        from .lake import rewrite_clustered

        if args.zorder and args.cluster_sort:
            raise SystemExit("pass --zorder or --cluster-sort, not both")
        spec = args.zorder or args.cluster_sort
        cols = [c for c in spec.split(",") if c]
        m = rewrite_clustered(
            table, cols, strategy="zorder" if args.zorder else "sort"
        )
        recluster = {
            "reclustered": cols,
            "strategy": "zorder" if args.zorder else "sort",
            "recluster_version": m.version,
        }
    report = table.maintain(
        tombstone_horizon_seq=args.tombstone_horizon_seq,
        max_files_per_bucket=args.max_files_per_bucket,
        keep_snapshots=args.keep_snapshots,
        snapshot_age_sec=args.snapshot_age_sec,
        remove_orphan_files=not args.no_orphan_gc,
    )
    _emit(
        {
            "cmd": "maintain",
            "root": args.root,
            "version": table.current_version(),
            **recluster,
            **report,
        }
    )
    return 0


def cmd_rollback(spark: SparkSession, args) -> int:
    """Incident recovery: commit-forward rollback of a table (or a
    whole table GROUP, consistently) to an earlier snapshot, reverting
    data + watermarks so re-driving ingest replays the rolled-back
    span exactly once."""
    if args.group:
        from .lake import TableGroup

        g = TableGroup.load(spark, args.root)
        nm = g.rollback_to(args.version)
        _emit(
            {
                "cmd": "rollback",
                "root": args.root,
                "group": True,
                "rolled_back_to": args.version,
                "version": nm["version"],
                "tables": {
                    n: e["version"] for n, e in nm["tables"].items()
                },
            }
        )
        return 0
    table = _load(spark, args.root)
    nm = table.rollback_to(args.version)
    _emit(
        {
            "cmd": "rollback",
            "root": args.root,
            "group": False,
            "rolled_back_to": args.version,
            "version": nm.version,
            "watermarks": nm.watermarks,
        }
    )
    return 0


def cmd_follow(spark: SparkSession, args) -> int:
    """One poll of a checkpointed change-feed follower: apply every
    source commit since the last poll to the target, exactly once
    (checkpoint = the target's merge watermark). Run it on any cadence;
    `--create-target` bootstraps a mirror table on first use."""
    from .lake import ChangeFeedFollower, LakeTable

    source = _load(spark, args.source)
    if args.create_target and not LakeTable.exists(args.target):
        # exists() keys on _meta/CURRENT, so a first run that crashed
        # mid-create (bare _meta dir, no manifest) self-heals here
        target = ChangeFeedFollower.mirror_target(source, args.target)
    else:
        target = LakeTable.load(spark, args.target)
    f = ChangeFeedFollower(source, target, source_id=args.source_id or None)
    res = f.resync() if args.resync else f.poll()
    _emit(
        {
            "cmd": "follow",
            "resync": bool(args.resync),
            "source": args.source,
            "target": args.target,
            "caught_up": res.caught_up,
            "from_version": res.from_version,
            "to_version": res.to_version,
            "checkpoint": f.checkpoint(),
            "target_version": target.current_version(),
        }
    )
    return 0


def cmd_tag(spark: SparkSession, args) -> int:
    """Named immutable snapshots: ``tag list`` / ``tag set --name N
    [--version V]`` / ``tag delete --name N``. A tag is a retention
    root — the snapshot and its files survive expiry until deleted."""
    table = _load(spark, args.root)
    if args.action == "list":
        _emit({"cmd": "tag", "action": "list", "root": args.root,
               "tags": table.tags()})
        return 0
    if not args.name:
        raise SystemExit("tag set/delete requires --name")
    if args.action == "set":
        v = table.tag(args.name, version=args.version)
        _emit({"cmd": "tag", "action": "set", "root": args.root,
               "name": args.name, "version": v})
    else:
        table.untag(args.name)
        _emit({"cmd": "tag", "action": "delete", "root": args.root,
               "name": args.name})
    return 0


def cmd_branch(spark: SparkSession, args) -> int:
    """Write-audit-publish staging refs: ``branch create`` forks an
    isolated manifest chain (stage onto it with ``merge --root ...``
    pointing at the branch via --ref, or the library API), ``publish``
    fast-forwards main in ONE atomic commit (files, schema set, and
    exactly-once watermarks travel), ``drop`` GCs branch-only files."""
    table = _load(spark, args.root)
    if args.action == "list":
        _emit({"cmd": "branch", "action": "list", "root": args.root,
               "branches": table.branches()})
        return 0
    if not args.name:
        raise SystemExit(f"branch {args.action} requires --name")
    if args.action == "create":
        br = table.create_branch(args.name, version=args.version)
        _emit({"cmd": "branch", "action": "create", "root": args.root,
               "name": args.name,
               "fork_version": table.branch_fork_version(args.name),
               "head": br.current_version()})
    elif args.action == "publish":
        nm = table.publish_branch(args.name)
        _emit({"cmd": "branch", "action": "publish", "root": args.root,
               "name": args.name, "version": nm.version})
    else:  # drop
        removed = table.drop_branch(args.name)
        _emit({"cmd": "branch", "action": "drop", "root": args.root,
               "name": args.name, "files_removed": removed})
    return 0


def cmd_status(spark: SparkSession, args) -> int:
    table = _load(spark, args.root, ref=getattr(args, "ref", None))
    m = table.current_manifest()
    live = [f for f in m.files if not f.is_delta]
    deltas = [f for f in m.files if f.is_delta]
    _emit(
        {
            "cmd": "status",
            "root": args.root,
            "version": m.version,
            "snapshot_id": m.snapshot_id,
            "schema_version": m.current_schema_version,
            "keys": m.key_cols,
            "buckets": m.num_buckets,
            "base_files": len(live),
            "delta_files": len(deltas),
            "rows_upper_bound": sum(f.rows for f in m.files),
            "watermarks": m.watermarks,
            "properties": m.properties,
            "lineage_tail": (
                m.lineage[-args.lineage_tail:] if args.lineage_tail else []
            ),
        }
    )
    return 0


def cmd_clone(spark: SparkSession, args) -> int:
    """CREATE TABLE ... CLONE: fork at a snapshot. Shallow (default)
    is metadata-only — instant at any size, shared files pinned on the
    source and exempt from clone-side GC by construction."""
    table = _load(spark, args.root)
    clone = table.clone_to(
        args.dest, version=args.version, tag=args.tag,
        shallow=not args.deep,
    )
    m = clone.current_manifest()
    _emit(
        {
            "cmd": "clone",
            "root": args.root,
            "dest": args.dest,
            "mode": "deep" if args.deep else "shallow",
            "cloned_version": m.lineage[0]["batch_id"],
            "files": len(m.files),
            "rows_upper_bound": sum(f.rows for f in m.files),
        }
    )
    return 0


def cmd_properties(spark: SparkSession, args) -> int:
    """ALTER TABLE SET/UNSET TBLPROPERTIES — the operator's path to
    constraints (``constraints.not_null`` / ``constraints.check.*``),
    clustering, compaction thresholds, and retention knobs without
    writing Python."""
    table = _load(spark, args.root)
    props: dict = {}
    for kv in args.set or []:
        if "=" not in kv:
            raise SystemExit(f"--set expects key=value, got {kv!r}")
        k, v = kv.split("=", 1)
        props[k] = v
    for k in args.unset or []:
        props[k] = None
    m = table.set_properties(props)
    _emit(
        {
            "cmd": "properties",
            "root": args.root,
            "version": m.version,
            "properties": m.properties,
        }
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="encode_ingest_spark")
    p.add_argument(
        "--cores",
        type=int,
        default=None,
        help="local[N] width when NOT under spark-submit (default: "
        "SPARK_GRAFT_CPUS)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create", help="create an empty lake table")
    c.add_argument("--root", required=True)
    c.add_argument("--schema-ddl", default=REPO_FILE_DDL)
    c.add_argument("--keys", default=DEFAULT_KEYS)
    c.add_argument("--buckets", type=int, default=16)
    c.add_argument(
        "--mor-compact-threshold",
        type=int,
        default=8,
        help="auto-fold a bucket's MOR delta chain past this many files "
        "(0 = manual compaction only)",
    )
    c.set_defaults(fn=cmd_create)

    g = sub.add_parser("generate", help="stage a deterministic CDC backlog")
    g.add_argument("--out", required=True)
    g.add_argument("--n-keys", type=int, default=1000)
    g.add_argument("--events-per-key", type=int, default=3)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--n-repos", type=int, default=50)
    g.add_argument("--delete-pct", type=int, default=10)
    g.add_argument("--files", type=int, default=4)
    g.set_defaults(fn=cmd_generate)

    m = sub.add_parser("merge", help="apply one CDC batch file")
    m.add_argument("--root", required=True)
    m.add_argument("--batch", required=True, help="parquet path of the batch")
    m.add_argument("--source-id", default="cli")
    m.add_argument("--batch-id", type=int, required=True)
    m.add_argument("--mode", choices=["cow", "mor"], default="cow")
    m.add_argument(
        "--ref",
        default=None,
        help="stage onto this BRANCH instead of main (write-audit-"
        "publish: audit with status --ref, then branch publish)",
    )
    m.set_defaults(fn=cmd_merge)

    dl = sub.add_parser("delete", help="tombstone rows matching a predicate")
    dl.add_argument("--root", required=True)
    dl.add_argument("--where", required=True, help="SQL boolean predicate")
    dl.add_argument("--source-id", default="dml")
    dl.add_argument("--batch-id", type=int, default=None,
                    help="optional statement fence for retrying orchestrators")
    dl.add_argument("--mode", choices=["mor", "cow"], default="mor")
    dl.add_argument("--ref", default=None, help="apply on this branch (WAP)")
    dl.set_defaults(fn=cmd_delete)

    up = sub.add_parser("update", help="rewrite columns of rows matching a predicate")
    up.add_argument("--root", required=True)
    up.add_argument("--where", required=True, help="SQL boolean predicate")
    up.add_argument("--set", action="append", required=True, metavar="COL=EXPR",
                    help="assignment, repeatable; RHS sees the OLD row")
    up.add_argument("--source-id", default="dml")
    up.add_argument("--batch-id", type=int, default=None)
    up.add_argument("--mode", choices=["mor", "cow"], default="mor")
    up.add_argument("--ref", default=None, help="apply on this branch (WAP)")
    up.set_defaults(fn=cmd_update)

    sy = sub.add_parser(
        "sync", help="MERGE a staged parquet dataset into the table"
    )
    sy.add_argument("--root", required=True)
    sy.add_argument("--source", required=True, help="staged parquet path")
    sy.add_argument("--prune-missing", action="store_true",
                    help="soft-delete live rows absent from the source")
    sy.add_argument("--force-empty-source", action="store_true",
                    help="allow --prune-missing to wipe the table when the "
                         "source is empty")
    sy.add_argument("--source-id", default="sync")
    sy.add_argument("--batch-id", type=int, default=None,
                    help="optional statement fence for retrying orchestrators")
    sy.add_argument("--mode", choices=["mor", "cow"], default="mor")
    sy.add_argument("--ref", default=None, help="apply on this branch (WAP)")
    sy.set_defaults(fn=cmd_sync)

    i = sub.add_parser("ingest", help="drain an event directory into the table")
    i.add_argument("--root", required=True)
    i.add_argument("--events-dir", required=True)
    i.add_argument("--checkpoint", required=True)
    i.add_argument("--source-id", default="stream")
    i.add_argument("--max-files-per-trigger", type=int, default=None)
    i.add_argument("--merge-mode", choices=["cow", "mor"], default="cow")
    i.add_argument("--local-commit-cap", type=int, default=None)
    i.add_argument("--timeout-sec", type=int, default=600)
    i.set_defaults(fn=cmd_ingest)

    uc = sub.add_parser(
        "universe-create",
        help="create the full entity universe: raw CDC tables, derived "
        "output trees, and the atomic table group",
    )
    uc.add_argument("--root", required=True)
    uc.add_argument("--buckets", type=int, default=16)
    uc.set_defaults(fn=cmd_universe_create)

    ui = sub.add_parser(
        "universe-ingest",
        help="drain a multiplexed raw-entity changelog: per epoch, merge "
        "raw tables then land one transactional derived refresh",
    )
    ui.add_argument("--root", required=True)
    ui.add_argument("--events-dir", required=True)
    ui.add_argument("--checkpoint", required=True)
    ui.add_argument("--source-id", default="universe_stream")
    ui.add_argument("--max-files-per-trigger", type=int, default=None)
    ui.add_argument("--local-commit-cap", type=int, default=None)
    ui.add_argument("--timeout-sec", type=int, default=600)
    ui.set_defaults(fn=cmd_universe_ingest)

    us = sub.add_parser(
        "universe-status", help="group version + per-table state"
    )
    us.add_argument("--root", required=True)
    us.set_defaults(fn=cmd_universe_status)

    um = sub.add_parser(
        "universe-maintain",
        help="universe housekeeping: expire group versions (freeing "
        "member pins), then maintain() every raw + derived table",
    )
    um.add_argument("--root", required=True)
    um.add_argument("--keep-group-versions", type=int, default=None)
    um.add_argument("--keep-snapshots", type=int, default=None)
    um.add_argument("--snapshot-age-sec", type=float, default=None)
    um.add_argument("--tombstone-horizon-seq", type=int, default=None)
    um.add_argument("--max-files-per-bucket", type=int, default=None)
    um.add_argument("--no-orphan-gc", action="store_true")
    um.set_defaults(fn=cmd_universe_maintain)

    mt = sub.add_parser(
        "maintain",
        help="housekeeping pass: compact overgrown buckets, purge "
        "tombstones below a horizon, expire snapshots, GC orphans",
    )
    mt.add_argument("--root", required=True)
    mt.add_argument("--tombstone-horizon-seq", type=int, default=None)
    mt.add_argument("--max-files-per-bucket", type=int, default=None)
    mt.add_argument("--keep-snapshots", type=int, default=None)
    mt.add_argument("--snapshot-age-sec", type=float, default=None)
    mt.add_argument("--no-orphan-gc", action="store_true")
    mt.add_argument(
        "--zorder",
        default=None,
        metavar="COLS",
        help="re-cluster data files multi-dimensionally on the comma-"
        "separated columns (OPTIMIZE ZORDER BY analogue; persists as "
        "the table's write clustering, so future merges stay clustered)",
    )
    mt.add_argument(
        "--cluster-sort",
        default=None,
        metavar="COLS",
        help="re-cluster with a plain lexicographic within-bucket sort "
        "on the comma-separated columns",
    )
    mt.set_defaults(fn=cmd_maintain)

    cl = sub.add_parser(
        "clone",
        help="fork the table at a snapshot into a new table: shallow "
        "(metadata-only, source files pinned + never GC'd from the "
        "clone side) or --deep (copy files)",
    )
    cl.add_argument("--root", required=True)
    cl.add_argument("--dest", required=True)
    cl.add_argument("--version", type=int, default=None)
    cl.add_argument("--tag", default=None)
    cl.add_argument("--deep", action="store_true")
    cl.set_defaults(fn=cmd_clone)

    pr = sub.add_parser(
        "properties",
        help="ALTER TABLE SET/UNSET TBLPROPERTIES: constraints, "
        "clustering, compaction/retention knobs (metadata-only commit)",
    )
    pr.add_argument("--root", required=True)
    pr.add_argument(
        "--set", action="append", metavar="K=V",
        help="set a property (repeatable)",
    )
    pr.add_argument(
        "--unset", action="append", metavar="K",
        help="unset a property (repeatable)",
    )
    pr.set_defaults(fn=cmd_properties)

    rb = sub.add_parser(
        "rollback",
        help="commit-forward rollback of a table (or --group) to an "
        "earlier snapshot; data AND exactly-once watermarks revert, so "
        "re-driving ingest replays the span",
    )
    rb.add_argument("--root", required=True)
    rb.add_argument("--version", type=int, required=True)
    rb.add_argument(
        "--group",
        action="store_true",
        help="ROOT is a TableGroup: roll every member back to the "
        "target group version's consistent vector",
    )
    rb.set_defaults(fn=cmd_rollback)

    fo = sub.add_parser(
        "follow",
        help="one checkpointed poll of a table's change feed into a "
        "target table (exactly-once; checkpoint lives in the target's "
        "merge watermark)",
    )
    fo.add_argument("--source", required=True)
    fo.add_argument("--target", required=True)
    fo.add_argument(
        "--source-id",
        default=None,
        help="override the follower's watermark identity (default: "
        "follow:<abs source root>)",
    )
    fo.add_argument(
        "--create-target",
        action="store_true",
        help="create the target as an empty mirror of the source "
        "(schema/keys/buckets) if it does not exist yet",
    )
    fo.add_argument(
        "--resync",
        action="store_true",
        help="full re-mirror of the source's CURRENT snapshot (upserts "
        "+ deletes for vanished keys) instead of an incremental span — "
        "the recovery path when the checkpoint was expired by source "
        "snapshot retention",
    )
    fo.set_defaults(fn=cmd_follow)

    tg = sub.add_parser(
        "tag",
        help="named immutable snapshots (retention roots): "
        "set / delete / list",
    )
    tg.add_argument("action", choices=["set", "delete", "list"])
    tg.add_argument("--root", required=True)
    tg.add_argument("--name", default=None)
    tg.add_argument(
        "--version", type=int, default=None,
        help="snapshot to tag (default: CURRENT)",
    )
    tg.set_defaults(fn=cmd_tag)

    bs = sub.add_parser(
        "branch",
        help="write-audit-publish staging refs: create / publish / "
        "drop / list (stage with `merge --ref`, audit with "
        "`status --ref`)",
    )
    bs.add_argument("action", choices=["create", "publish", "drop", "list"])
    bs.add_argument("--root", required=True)
    bs.add_argument("--name", default=None)
    bs.add_argument(
        "--version", type=int, default=None,
        help="fork point for create (default: CURRENT)",
    )
    bs.set_defaults(fn=cmd_branch)

    s = sub.add_parser("status", help="print table state as one JSON line")
    s.add_argument("--root", required=True)
    s.add_argument("--lineage-tail", type=int, default=3)
    s.add_argument(
        "--ref", default=None,
        help="inspect this BRANCH's head instead of main",
    )
    s.set_defaults(fn=cmd_status)

    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    owns_session = spark is None
    if owns_session:
        spark = _spark(args)
    try:
        return args.fn(spark, args)
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
