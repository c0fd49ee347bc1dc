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

    def _pin_members(self, tables: dict[str, dict[str, Any]]) -> None:
        """Register the group's CURRENT vector as retention roots in
        each member: LakeTable.expire_snapshots keeps pinned versions
        (and their files) alive, so a member's aggressive snapshot
        expiry cannot break group reads. Only the current vector is
        protected — time travel to OLD group versions is subject to
        member retention, like any other historical snapshot."""
        for entry in tables.values():
            try:
                LakeTable(self.spark, entry["root"]).pin_version(
                    self._pin_name, int(entry["version"])
                )
            except OSError:  # pragma: no cover - best-effort pin
                pass

    # ---------- create / load ----------
    @staticmethod
    def create(
        spark: SparkSession, root: str, tables: dict[str, LakeTable]
    ) -> "TableGroup":
        """Create a group pinning each member at its CURRENT version."""
        g = TableGroup(spark, root)
        os.makedirs(g._meta_dir, exist_ok=False)
        vector = {
            name: {"root": t.root, "version": t.current_version()}
            for name, t in tables.items()
        }
        g._write_manifest({"version": 0, "tables": vector, "watermarks": {}})
        g._pin_members(vector)
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
    def commit(
        self,
        versions: dict[str, int],
        source_id: str = "default",
        batch_id: int | None = None,
    ) -> dict[str, Any]:
        """Atomically move the group to a new version vector (partial
        vectors allowed: unnamed members keep their pin). Fences on
        (source_id, batch_id) like a table merge; a replayed commit is a
        no-op returning the already-committed manifest."""
        m = self.current_manifest()
        if batch_id is not None:
            wm = m.get("watermarks", {}).get(source_id)
            if wm is not None and int(wm.get("batch_id", -1)) >= batch_id:
                # fence: already committed — but RE-PIN the committed
                # vector: a crash between a prior commit's manifest swap
                # and its pin write would otherwise leave the current
                # vector unpinned forever (the replay is the healer)
                self._pin_members(m["tables"])
                return m
        tables = {k: dict(v) for k, v in m["tables"].items()}
        unknown = set(versions) - set(tables)
        if unknown:
            raise ValueError(f"not group members: {sorted(unknown)}")
        for name, v in versions.items():
            tables[name]["version"] = int(v)
        watermarks = dict(m.get("watermarks", {}))
        if batch_id is not None:
            watermarks[source_id] = {"batch_id": int(batch_id)}
        nm = {
            "version": m["version"] + 1,
            "tables": tables,
            "watermarks": watermarks,
            "parent_version": m["version"],
        }
        # pin BEFORE the group manifest swap: over-pinning (crash after
        # pin, before swap) only retains an extra member snapshot until
        # the next commit re-pins; under-pinning (the old order) left a
        # committed vector unprotected against member snapshot expiry
        self._pin_members(tables)
        self._write_manifest(nm)
        return nm

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
