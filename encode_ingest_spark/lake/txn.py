"""Cross-table transactional commits — a consistent snapshot over N
LakeTables.

The reference ingests ~15 linked entity tables whose FK integrity is
QC-checked as a set (reference: hack/check_for_missing_files.sh:16-47);
a consumer reading *file* at one version and *repo* at another can see a
dangling reference even though every per-table snapshot is internally
consistent. This module adds the missing primitive: a **TableGroup**
whose own versioned manifest pins one version per member table, swapped
atomically.

Design (and why not two-phase commit): member tables keep their normal
single-table commit protocol — every merge still commits its own
manifest + CURRENT pointer exactly as before (those remain correct,
lineage-carrying snapshots). Group consistency is layered ON TOP as a
pointer vector:

* ``_meta/g{N}.manifest.json`` under the group root lists
  ``{table_name: {root, version}}`` plus the fence
  ``{source_id: batch_id}`` watermarks.
* ``commit()`` writes the next group manifest (O_CREAT|O_EXCL — the
  same optimistic concurrency as LakeTable) and swaps ``_meta/CURRENT``
  via ``os.replace`` — ONE atomic rename covers all N tables.
* Readers go through ``group.read(name)``, which time-travels each
  member to its pinned version. A crash ANYWHERE between member merges
  — or between the last member merge and the group commit — leaves the
  group pointer on the previous vector: readers keep seeing the old,
  mutually-consistent set (all-or-nothing visibility, which is what a
  multi-table transaction means for readers).
* Exactly-once: the group manifest carries the shared ``batch_id``
  fence. A replayed batch re-runs the member merges (each fence-skips
  individually), then ``commit_refresh`` re-resolves each member's
  committed version for that batch and re-issues the group commit —
  which fence-skips if it already happened. Replay therefore converges
  both layers.

At 100 TB scale this is exactly the Iceberg/Nessie "multi-table
transaction via catalog-level atomic swap" shape: data and per-table
metadata are immutable; the only mutable thing is one pointer.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .table import CommitConflictError, LakeTable


class TableGroup:
    """A named set of LakeTables with atomic cross-table snapshots."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---------- paths / manifest IO ----------
    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.root, "_meta")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._meta_dir, f"g{version:012d}.manifest.json")

    def current_version(self) -> int:
        with open(os.path.join(self._meta_dir, "CURRENT")) as fh:
            return int(fh.read().strip())

    def manifest_at(self, version: int) -> dict[str, Any]:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def current_manifest(self) -> dict[str, Any]:
        return self.manifest_at(self.current_version())

    def _write_manifest(self, manifest: dict[str, Any]) -> None:
        manifest["committed_at"] = time.time()
        path = self._manifest_path(manifest["version"])
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflictError(
                f"group version {manifest['version']} already committed"
            ) from e
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        tmp = os.path.join(self._meta_dir, f".CURRENT.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(str(manifest["version"]))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(self._meta_dir, "CURRENT"))

    @property
    def _pin_name(self) -> str:
        """Stable per-group retention-pin identity in member tables."""
        import hashlib

        return "group-" + hashlib.md5(
            os.path.abspath(self.root).encode()
        ).hexdigest()[:12]

    def _pin_name_for(self, gversion: int) -> str:
        """Per-GROUP-VERSION pin name: pins are namespaced by the group
        version they protect, so concurrent committers never clobber a
        committed vector's pins with an uncommitted one, and the last
        ``keep_pinned`` group versions each hold their own retention
        roots (group time travel within that window survives member
        snapshot expiry)."""
        return f"{self._pin_name}.g{int(gversion):012d}"

    def keep_pinned(self) -> int:
        """How many recent group versions stay retention-protected in
        member tables (group property ``retention.keep_pinned``)."""
        props = self.current_manifest().get("properties", {})
        return max(1, int(props.get("retention.keep_pinned", 3)))

    def _pin_members(
        self, tables: dict[str, dict[str, Any]], gversion: int
    ) -> None:
        """Register a group version's vector as retention roots in each
        member: LakeTable.expire_snapshots keeps pinned versions (and
        their files) alive, so a member's aggressive snapshot expiry
        cannot break group reads at any protected group version."""
        name = self._pin_name_for(gversion)
        for entry in tables.values():
            try:
                LakeTable(self.spark, entry["root"]).pin_version(
                    name, int(entry["version"])
                )
            except OSError:  # pragma: no cover - best-effort pin
                pass

    def _gc_member_pins(
        self, tables: dict[str, dict[str, Any]], keep_from: int
    ) -> None:
        """Drop this group's per-version pins BELOW ``keep_from`` (plus
        any legacy un-versioned pin) from every member — run only after
        a successful commit, so superseded pins outlive every in-flight
        reader of the versions they protected."""
        prefix = self._pin_name + ".g"
        for entry in tables.values():
            try:
                t = LakeTable(self.spark, entry["root"])
                for name in list(t.pinned_versions()):
                    if name == self._pin_name:
                        t.unpin_version(name)  # pre-r4 single-pin scheme
                    elif name.startswith(prefix):
                        try:
                            n = int(name[len(prefix):])
                        except ValueError:
                            continue
                        if n < keep_from:
                            t.unpin_version(name)
            except OSError:  # pragma: no cover - best-effort GC
                pass

    # ---------- create / load ----------
    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        tables: dict[str, LakeTable],
        keep_pinned: int = 3,
    ) -> "TableGroup":
        """Create a group pinning each member at its CURRENT version.
        ``keep_pinned`` = how many recent group versions stay
        retention-protected in members (time travel within that window
        survives aggressive member snapshot expiry)."""
        g = TableGroup(spark, root)
        os.makedirs(g._meta_dir, exist_ok=False)
        vector = {
            name: {"root": t.root, "version": t.current_version()}
            for name, t in tables.items()
        }
        g._write_manifest(
            {
                "version": 0,
                "tables": vector,
                "watermarks": {},
                "properties": {"retention.keep_pinned": int(keep_pinned)},
            }
        )
        g._pin_members(vector, 0)
        return g

    @staticmethod
    def load(spark: SparkSession, root: str) -> "TableGroup":
        g = TableGroup(spark, root)
        g.current_manifest()  # raises if absent
        return g

    # ---------- read (the consistency surface) ----------
    def tables(self) -> dict[str, LakeTable]:
        m = self.current_manifest()
        return {
            name: LakeTable(self.spark, entry["root"])
            for name, entry in m["tables"].items()
        }

    def pinned_versions(self, version: int | None = None) -> dict[str, int]:
        m = self.manifest_at(
            version if version is not None else self.current_version()
        )
        return {name: entry["version"] for name, entry in m["tables"].items()}

    def read(self, name: str, version: int | None = None, **kwargs) -> DataFrame:
        """Scan one member AT THE GROUP-PINNED version — every
        ``read()`` against the same group version sees one mutually-
        consistent set, however many member commits are in flight."""
        m = self.manifest_at(
            version if version is not None else self.current_version()
        )
        entry = m["tables"][name]
        t = LakeTable(self.spark, entry["root"])
        return t.read(version=entry["version"], **kwargs)

    def last_batch(self, source_id: str) -> int:
        wm = self.current_manifest().get("watermarks", {}).get(source_id)
        return -1 if wm is None else int(wm.get("batch_id", -1))

    # ---------- commit ----------
    def watermark(self, source_id: str) -> dict[str, Any]:
        """The full watermark payload for a source (batch_id plus any
        extras a committer recorded, e.g. the refreshed raw-source
        version vector a streaming coordinator resumes from)."""
        return dict(
            self.current_manifest().get("watermarks", {}).get(source_id, {})
        )

    def commit(
        self,
        versions: dict[str, int],
        source_id: str = "default",
        batch_id: int | None = None,
        watermark_extra: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Atomically move the group to a new version vector (partial
        vectors allowed: unnamed members keep their pin). Fences on
        (source_id, batch_id) like a table merge; a replayed commit is a
        no-op returning the already-committed manifest.
        ``watermark_extra`` rides in the source's watermark entry —
        the per-entity streaming coordinator stores the refreshed raw
        version vector there so a restart resumes from the exact
        last-refreshed snapshot of every source."""
        m = self.current_manifest()
        if batch_id is not None:
            wm = m.get("watermarks", {}).get(source_id)
            if wm is not None and int(wm.get("batch_id", -1)) >= batch_id:
                # fence: already committed — but RE-PIN the committed
                # vector: a crash between a prior commit's manifest swap
                # and its pin write would otherwise leave the current
                # vector unpinned forever (the replay is the healer)
                self._pin_members(m["tables"], m["version"])
                return m
        tables = {k: dict(v) for k, v in m["tables"].items()}
        unknown = set(versions) - set(tables)
        if unknown:
            raise ValueError(f"not group members: {sorted(unknown)}")
        for name, v in versions.items():
            tables[name]["version"] = int(v)
        watermarks = dict(m.get("watermarks", {}))
        if batch_id is not None:
            watermarks[source_id] = {
                "batch_id": int(batch_id), **(watermark_extra or {})
            }
        nv = m["version"] + 1
        nm = {
            "version": nv,
            "tables": tables,
            "watermarks": watermarks,
            "parent_version": m["version"],
            "properties": m.get("properties", {}),
        }
        return self._finalize_group_swap(nm, tables)

    def _finalize_group_swap(
        self, nm: dict[str, Any], tables: dict[str, dict[str, Any]]
    ) -> dict[str, Any]:
        """The pin/swap choreography shared by ``commit`` and
        ``rollback_to`` — the ordering invariants live in ONE place.

        Pin BEFORE the group manifest swap: over-pinning (crash after
        pin, before swap) only retains an extra member snapshot until
        the next commit re-pins; under-pinning (the old order) left a
        committed vector unprotected against member snapshot expiry.
        Pins are namespaced by group version, so a losing concurrent
        committer can only have raced THIS version's pins — healed
        below from the winner's committed manifest."""
        nv = int(nm["version"])
        self._pin_members(tables, nv)
        try:
            self._write_manifest(nm)
        except CommitConflictError:
            # a concurrent winner committed nv first and our pin write
            # above may have overwritten its pins with our uncommitted
            # vector — re-pin the ACTUAL committed vector before
            # surfacing the conflict (the manifest is fsync'd before
            # CURRENT swaps, but guard a mid-write read anyway)
            try:
                self._pin_members(self.manifest_at(nv)["tables"], nv)
            except (OSError, ValueError, KeyError):  # pragma: no cover
                pass
            raise
        # winner self-healing: a LOSING concurrent committer's pin write
        # can land between our pin and our manifest swap (and the loser
        # may crash before its own conflict-healing re-pin above), which
        # would leave this committed vector's pins pointing at the
        # loser's uncommitted versions — aggressive member
        # expire_snapshots in that window could drop the committed
        # vector's files. Re-asserting the pins AFTER the swap closes
        # the window from the winner's side (pin writes are atomic
        # os.replace, so this is idempotent when nothing raced).
        self._pin_members(tables, nv)
        keep_pinned = max(
            1, int(nm["properties"].get("retention.keep_pinned", 3))
        )
        self._gc_member_pins(tables, keep_from=nv - keep_pinned + 1)
        return nm

    def rollback_to(self, version: int) -> dict[str, Any]:
        """Roll the GROUP back to an earlier consistent vector by
        committing a NEW group version (history stays monotone, like
        ``LakeTable.rollback_to``): each member rolls back to its
        pinned version in the target group manifest, then one group
        commit points at the new member versions and restores the
        TARGET's group watermarks — the cross-table exactly-once fences
        revert with the data, so re-driving the pipeline replays every
        epoch after the target and lands it exactly once. Incident
        recovery for the entity universe: a bad epoch committed
        group-atomically, so it rolls back group-atomically.

        The rollback window is the pin window
        (``retention.keep_pinned``): each protected group version pins
        its member snapshots against expiry, so rollback within the
        window never chases reclaimed files; older targets raise
        ``ValueError`` (from the group manifest or the member
        rollback). Member rollbacks are individually committed before
        the group swap — a CRASH between them leaves members with extra
        content-identical snapshots and the group still at the
        pre-rollback vector; re-running the rollback converges (member
        rollback of an already-reverted table is a no-op). A group-swap
        VERSION RACE self-heals: the swap retries on a fresh group
        version as long as every member still sits at the rolled-back
        vector (the conflicting commit was vector-neutral — a fence
        replay or pin race); if a live committer moved a member PAST
        the rollback, ``CommitConflictError`` is raised with the
        members-may-hold-rolled-back-state warning — stop the writers
        and re-run ``rollback_to`` to converge."""
        cur = self.current_manifest()
        if version == cur["version"]:
            return cur
        if version > cur["version"]:
            raise ValueError(
                f"cannot roll forward: target {version} is newer than "
                f"CURRENT group version {cur['version']}"
            )
        try:
            target = self.manifest_at(version)
        except OSError as e:
            raise ValueError(
                f"group version {version} of {self.root} is not "
                "loadable — expired by group snapshot retention?"
            ) from e
        gone = set(target["tables"]) - set(cur["tables"])
        if gone:
            raise ValueError(
                f"cannot roll back {self.root} to {version}: member(s) "
                f"{sorted(gone)} have left the group"
            )
        tables = {k: dict(v) for k, v in cur["tables"].items()}
        for name, entry in target["tables"].items():
            t = LakeTable(self.spark, tables[name]["root"])
            tables[name]["version"] = t.rollback_to(int(entry["version"])).version
        parent_v = cur["version"]
        watermarks = {
            k: dict(v) for k, v in target.get("watermarks", {}).items()
        }
        # the member rollbacks above are already committed; the group
        # swap below must not leave them dangling behind a transient
        # version race (a concurrent fence replay / status commit), so
        # retry the swap on a fresh group version as long as members
        # still sit at our rolled-back vector
        for _ in range(5):
            nm = {
                "version": parent_v + 1,
                "tables": tables,
                "watermarks": watermarks,
                "parent_version": parent_v,
                "properties": cur.get("properties", {}),
                "rollback_of": int(version),
            }
            try:
                return self._finalize_group_swap(nm, tables)
            except CommitConflictError:
                cur2 = self.current_manifest()
                moved = sorted(
                    name
                    for name, entry in tables.items()
                    if LakeTable(self.spark, entry["root"]).current_version()
                    != int(entry["version"])
                )
                if moved:
                    raise CommitConflictError(
                        f"group rollback of {self.root} to {version} lost "
                        "its swap race to a committer that advanced "
                        f"member(s) {moved} past the rollback — member "
                        "tables MAY now hold rolled-back data diverging "
                        "from the group vector; stop concurrent writers "
                        "and re-run rollback_to to converge"
                    )
                parent_v = cur2["version"]
        raise CommitConflictError(
            f"group rollback of {self.root} to {version} lost 5 "
            "consecutive swap races — member tables may hold rolled-back "
            "data; stop concurrent writers and re-run rollback_to"
        )

    @property
    def _history_archive_path(self) -> str:
        return os.path.join(self._meta_dir, "history.archive.jsonl")

    def expire_snapshots(self, keep_last: int | None = None) -> int:
        """Delete group manifests older than the last ``keep_last``
        (default: the ``retention.keep_pinned`` window) and GC the
        member pins of the expired group versions. Group time travel to
        expired versions stops working — same contract as the member
        tables' expire_snapshots — but each expired version's vector +
        watermarks are folded into an append-only history archive first
        (fsync-before-delete, deduped by version), so the cross-table
        commit history outlives retention like member lineage does."""
        if keep_last is None:
            keep_last = self.keep_pinned()
        keep_last = max(1, int(keep_last))
        versions = sorted(
            int(fn[1:].split(".")[0])
            for fn in os.listdir(self._meta_dir)
            if fn.endswith(".manifest.json")
        )
        if len(versions) <= keep_last:
            return 0
        keep = versions[-keep_last:]
        already: set[int] = set()
        if os.path.exists(self._history_archive_path):
            with open(self._history_archive_path) as fh:
                for line in fh:
                    try:
                        already.add(int(json.loads(line)["version"]))
                    except (ValueError, KeyError):
                        continue
        records = []
        for v in versions:
            if v in keep or v in already:
                continue
            m = self.manifest_at(v)
            records.append(
                {
                    "version": v,
                    "tables": {n: e["version"] for n, e in m["tables"].items()},
                    "watermarks": m.get("watermarks", {}),
                    "committed_at": m.get("committed_at"),
                }
            )
        if records:
            with open(self._history_archive_path, "a") as fh:
                for rec in records:
                    fh.write(json.dumps(rec) + "\n")
                fh.flush()
                os.fsync(fh.fileno())
        self._gc_member_pins(self.current_manifest()["tables"], keep[0])
        removed = 0
        for v in versions:
            if v not in keep:
                os.remove(self._manifest_path(v))
                removed += 1
        return removed

    def history(self) -> list[dict[str, Any]]:
        """The group's full commit history: archived (expired) versions
        plus the live manifests — (version, member-version vector,
        watermarks, committed_at), ordered by version."""
        out: dict[int, dict[str, Any]] = {}
        if os.path.exists(self._history_archive_path):
            with open(self._history_archive_path) as fh:
                for line in fh:
                    if line.strip():
                        rec = json.loads(line)
                        out[int(rec["version"])] = rec
        for fn in os.listdir(self._meta_dir):
            if fn.endswith(".manifest.json"):
                v = int(fn[1:].split(".")[0])
                m = self.manifest_at(v)
                out[v] = {
                    "version": v,
                    "tables": {n: e["version"] for n, e in m["tables"].items()},
                    "watermarks": m.get("watermarks", {}),
                    "committed_at": m.get("committed_at"),
                }
        return [out[v] for v in sorted(out)]

    @staticmethod
    def version_for_batch(
        table: LakeTable, source_id: str, batch_id: int
    ) -> int | None:
        """The member version whose lineage committed (source_id,
        batch_id) — the replay resolver for group commits when a
        member's merge fence-skipped. Delegates to the table's lazy
        newest-first lineage walk."""
        span = table.lineage_span_for(source_id, batch_id)
        return None if span is None else span[1]
