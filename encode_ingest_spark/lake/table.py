"""LakeTable — a from-scratch snapshot-versioned parquet table format.

The reference ingests into the Terra Data Repository, whose per-table
incremental contract is: diff staged rows vs live state, soft-delete stale
IDs, append new rows, idempotently (reference:
orchestration/templates/ingest-processed-data.yaml:10-11,86-172). This
module provides the storage half of that contract as a first-class table
format, because no Iceberg/Delta jar ships in this environment — and the
design mirrors what those formats do at 100 TB scale:

* **Snapshot isolation / time travel** — every commit writes an immutable
  manifest ``_meta/v{N}.manifest.json`` listing the data files of that
  version; ``_meta/CURRENT`` is swapped atomically (``os.replace``). On a
  real deployment the pointer swap is a catalog/metastore CAS — the
  manifest layout is unchanged. Between periodic full checkpoints,
  manifests serialize as ``{removed_paths, added_files}`` DELTAS vs
  their parent (Iceberg's manifest-list role): commit metadata is
  O(changed buckets), so a seconds-cadence micro-batch stream over a
  10^4-bucket table writes KBs of metadata per commit, not MBs.
* **Optimistic concurrency** — a manifest file is created with
  ``O_CREAT|O_EXCL``; a concurrent writer racing to the same version loses
  and gets ``CommitConflictError`` (the reference serializes tables for the
  same reason, ingest-processed-data.yaml:18-19).
* **Bucket partitioning** — rows are hash-bucketed on the merge key
  (``pmod(hash(keys), num_buckets)``), so a CDC MERGE only rewrites the
  buckets its batch touches (partition-pruned copy-on-write). Untouched
  buckets are carried forward by reference — at 100 TB this is the
  difference between rewriting gigabytes and rewriting everything.
* **Schema evolution** — manifests carry a schema history; each data file
  records the schema version it was written under. Readers align old files
  to the current schema (missing column → null, widened type → cast), so
  evolution never rewrites data (see lake/evolution.py).
* **Exactly-once fencing** — the manifest stores per-source watermarks
  ``{source_id: {batch_id, offset_end}}``. A replayed batch whose id is ≤
  the watermark is skipped, which is the engine-side restatement of the
  reference's "Idempotent; will not re-ingest or re-delete rows if the
  state already matches" (ingest-processed-data.yaml:10-11).
* **Lineage** — each commit embeds a lineage record (source offset range,
  row counts, snapshot id, wall time), queryable as a DataFrame; the
  analogue of the reference's TDR ``datarepo_load_history``
  (hack/README.md:347).

All data movement is Spark DataFrames; the driver only touches manifest
JSON (KBs) and file renames — never row data.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .evolution import align_to_schema, merge_schemas

FORMAT_VERSION = 1
BUCKET_COL = "_pb"
DELETED_COL = "_deleted"
SEQ_COL = "_seq"
#: every Nth manifest is written FULL (complete file list); the ones in
#: between serialize as {removed_paths, added_files} deltas vs parent —
#: commit metadata is then O(changed buckets), not O(table buckets),
#: and resolving any version walks at most this many deltas.
MANIFEST_CHECKPOINT_EVERY = 32


class CommitConflictError(RuntimeError):
    """Another writer committed the same version first (optimistic CC)."""


def _sha1_hex(s: str) -> str:
    import hashlib

    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def _ts_to_epoch(ts) -> float:
    """Normalize a time-travel timestamp to epoch seconds. Accepts
    epoch int/float, ``datetime`` (naive = UTC — manifests stamp
    ``committed_at`` with ``time.time()``, which is UTC-epoch), or an
    ISO-8601 string (``'2026-08-20T12:00:00'`` / ``'... +00:00'``)."""
    if isinstance(ts, bool):
        raise TypeError("as_of timestamp must be epoch/datetime/ISO string")
    if isinstance(ts, (int, float)):
        return float(ts)
    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.timestamp()
    raise TypeError(
        f"as_of timestamp must be epoch/datetime/ISO string, got {type(ts)}"
    )


def _contains_map(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _orderable_col(col: F.Column, dt: T.DataType) -> F.Column:
    """Rewrite a column into an equality-comparable shape: MapType is
    not comparable in Spark, so maps become key-sorted entry arrays
    (recursively — a map value may itself contain maps). Value-equal
    maps produce identical arrays, so struct equality over the
    rewritten columns is exact change detection."""
    if isinstance(dt, T.MapType):
        entries = F.map_entries(col)
        if _contains_map(dt.valueType):
            entries = F.transform(
                entries,
                lambda e: F.struct(
                    e["key"].alias("key"),
                    _orderable_col(e["value"], dt.valueType).alias("value"),
                ),
            )
        return F.sort_array(entries)
    if isinstance(dt, T.ArrayType) and _contains_map(dt.elementType):
        return F.transform(col, lambda x: _orderable_col(x, dt.elementType))
    if isinstance(dt, T.StructType) and _contains_map(dt):
        return F.struct(
            *[
                _orderable_col(col[f.name], f.dataType).alias(f.name)
                for f in dt.fields
            ]
        )
    return col


@dataclass
class DataFile:
    path: str  # relative to table root
    bucket: int
    rows: int
    bytes: int
    schema_version: int
    is_delta: bool = False  # merge-on-read delta file (lake/merge.py mode="mor")
    #: rows minted by a DML statement (lake/dml.py) rather than a real
    #: CDC event. DML mints event_seq = current+1, so with a dense
    #: upstream sequence the NEXT legitimate event for a key can carry
    #: the same seq; this manifest-level flag (no file-format change)
    #: makes DML rows LOSE that tie at MOR resolution instead of
    #: nondeterministically shadowing the real update (ADVICE r5).
    dml: bool = False
    #: footer-derived column statistics, collected at write time for
    #: driver-side pruning (the Iceberg manifest-stats pattern):
    #: {"has_tombstones": bool, "min_seq": int, "max_seq": int}.
    #: None on files written before stats existed — readers must treat
    #: that as "could contain anything" (conservative).
    stats: dict[str, Any] | None = None

    def to_json(self) -> dict[str, Any]:
        return {
            "path": self.path,
            "bucket": self.bucket,
            "rows": self.rows,
            "bytes": self.bytes,
            "schema_version": self.schema_version,
            "is_delta": self.is_delta,
            "dml": self.dml,
            "stats": self.stats,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "DataFile":
        return DataFile(
            d["path"], d["bucket"], d["rows"], d["bytes"], d["schema_version"],
            d.get("is_delta", False), d.get("dml", False), d.get("stats"),
        )


@dataclass
class Manifest:
    version: int
    snapshot_id: int
    schemas: dict[int, str]  # schema_version -> StructType.json()
    current_schema_version: int
    key_cols: list[str]
    num_buckets: int
    files: list[DataFile] = field(default_factory=list)
    watermarks: dict[str, dict[str, int]] = field(default_factory=dict)
    lineage: list[dict[str, Any]] = field(default_factory=list)
    parent_version: int | None = None
    properties: dict[str, str] = field(default_factory=dict)
    committed_at: float = 0.0

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schemas[self.current_schema_version]))

    def to_json(self) -> dict[str, Any]:
        return {
            "format_version": FORMAT_VERSION,
            "version": self.version,
            "snapshot_id": self.snapshot_id,
            "schemas": {str(k): v for k, v in self.schemas.items()},
            "current_schema_version": self.current_schema_version,
            "key_cols": self.key_cols,
            "num_buckets": self.num_buckets,
            "files": [f.to_json() for f in self.files],
            "watermarks": self.watermarks,
            "lineage": self.lineage,
            "parent_version": self.parent_version,
            "properties": self.properties,
            "committed_at": self.committed_at,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Manifest":
        return Manifest(
            version=d["version"],
            snapshot_id=d["snapshot_id"],
            schemas={int(k): v for k, v in d["schemas"].items()},
            current_schema_version=d["current_schema_version"],
            key_cols=d["key_cols"],
            num_buckets=d["num_buckets"],
            files=[DataFile.from_json(f) for f in d["files"]],
            watermarks=d.get("watermarks", {}),
            lineage=d.get("lineage", []),
            parent_version=d.get("parent_version"),
            properties=d.get("properties", {}),
            committed_at=d.get("committed_at", 0.0),
        )


def _footer_stats(
    pf, value_cols: Iterable[str] = (), bloom_cols: Iterable[str] = ()
) -> dict[str, Any] | None:
    """Pruning statistics from a parquet FOOTER (KB of metadata, zero
    data pages read) — collected once at write time and stored in the
    manifest, the Iceberg manifest-stats pattern. Conservative: any
    missing/odd statistic degrades to "could contain anything".

    * ``has_tombstones`` — any row group whose ``_deleted`` max is true
      (or whose stats are absent)
    * ``min_seq`` / ``max_seq`` — across row groups; ``min_seq`` is
      forced to -1 when null seqs exist (they order as -1 everywhere
      else in the engine)
    * ``col_stats`` — {col: [min, max]} for ``value_cols`` (the table's
      write-clustering columns): with clustered files these are TIGHT
      ranges, enabling manifest-level FILE pruning for dirty-group
      predicates. Parquet's possibly-truncated string stats are still
      valid bounds (spec: min_value ≤ min, max_value ≥ max).
    """
    md = pf.metadata
    if md.num_row_groups == 0:
        return None
    # locate leaves by their parquet COLUMN PATH: row-group column
    # indices enumerate flattened leaves, which diverge from Arrow's
    # top-level field positions as soon as a struct/map column exists —
    # positional lookup would silently read a payload column's stats
    rg0 = md.row_group(0)
    del_i = seq_i = None
    val_idx: dict[str, int] = {}
    for j in range(rg0.num_columns):
        path = rg0.column(j).path_in_schema
        if path == DELETED_COL:
            del_i = j
        elif path == SEQ_COL:
            seq_i = j
        elif path in value_cols:
            val_idx[path] = j
    if del_i is None or seq_i is None:
        return None
    col_stats: dict[str, list] = {}
    for col, j in val_idx.items():
        lows, highs, ok = [], [], True
        for rg in range(md.num_row_groups):
            cs = md.row_group(rg).column(j).statistics
            if cs is None or not cs.has_min_max:
                ok = False
                break
            lows.append(cs.min)
            highs.append(cs.max)
        if ok and lows:
            try:
                lo, hi = min(lows), max(highs)
            except TypeError:  # mixed/unorderable stat types: skip col
                continue
            # manifest stats must survive json.dump: only plain scalars
            # qualify (timestamp/date/bytes/decimal stats would crash
            # every subsequent commit) — skipping just means no file
            # pruning on that column, never an error
            if all(
                isinstance(x, (int, float, str)) and not isinstance(x, bool)
                for x in (lo, hi)
            ):
                col_stats[col] = [lo, hi]
    has_tomb = False
    mins: list[int] = []
    maxs: list[int] = []
    any_null_seq = False
    seq_stats_ok = True
    for rg in range(md.num_row_groups):
        ds = md.row_group(rg).column(del_i).statistics
        if ds is None or not ds.has_min_max:
            has_tomb = True  # unknown → conservative
        elif bool(ds.max):
            has_tomb = True
        ss = md.row_group(rg).column(seq_i).statistics
        if ss is None or not ss.has_min_max:
            seq_stats_ok = False
        else:
            mins.append(int(ss.min))
            maxs.append(int(ss.max))
            if ss.null_count is None or ss.null_count > 0:
                any_null_seq = True
    min_seq = None
    max_seq = None
    if seq_stats_ok and mins:
        min_seq = -1 if any_null_seq else min(mins)
        max_seq = max(maxs)
    out: dict[str, Any] = {
        "has_tombstones": has_tomb, "min_seq": min_seq, "max_seq": max_seq,
    }
    if col_stats:
        out["col_stats"] = col_stats
    blooms: dict[str, Any] = {}
    top_level = set(pf.schema_arrow.names)
    for col in bloom_cols:
        # unlike col_stats this reads the column's DATA pages (just
        # written, page-cache warm) — the price of point-query pruning
        # on columns min/max cannot discriminate; opt-in per table via
        # write.bloom_filter_columns
        if col not in top_level:
            continue
        from .bloom import build_bloom

        bl = build_bloom(pf.read(columns=[col]).column(col).to_pylist())
        if bl is not None:
            blooms[col] = bl
    if blooms:
        out["blooms"] = blooms
    return out


def bucket_expr(key_cols: list[str], num_buckets: int) -> F.Column:
    """Deterministic bucket id: pmod(hash(keys), B).

    Same expression on the write path and the MERGE batch path, so a batch
    row always lands in the bucket holding its current table row — this is
    what makes partition-pruned merge correct.
    """
    return F.pmod(F.hash(*[F.col(c) for c in key_cols]), F.lit(num_buckets)).cast("int")


class LakeTable:
    """A bucket-partitioned, snapshot-versioned parquet table."""

    def __init__(self, spark: SparkSession, root: str, ref: str | None = None):
        self.spark = spark
        self.root = root
        #: named BRANCH this handle points at (None = the main ref).
        #: A branch shares the table's data directory but keeps its own
        #: manifest chain under _meta/branches/<ref> — the Iceberg
        #: branch model, used for write-audit-publish (create_branch /
        #: publish_branch / drop_branch on the main handle).
        self.ref = ref
        #: materialized-manifest cache (manifests are immutable once
        #: committed; delta resolution walks parents, so memoize).
        #: Bounded: a week-long micro-batch stream commits ~10^5
        #: versions — unbounded memoization of full file lists would be
        #: a driver memory leak. Eviction keeps the newest half; delta
        #: resolution depth stays ≤ MANIFEST_CHECKPOINT_EVERY from disk
        #: regardless of what is cached.
        self._manifest_cache: dict[int, Manifest] = {}
        #: guards _manifest_cache lookup + delta-resolve + LRU insert:
        #: the threaded refresh pools (universe wave-2, the streaming
        #: fan-in, merge_universe_batches) read the SAME table objects
        #: from 6 threads, and an unguarded eviction race can drop a
        #: parent mid delta-resolution (RLock: manifest_at recurses)
        self._cache_lock = threading.RLock()

    _MANIFEST_CACHE_MAX = 128

    def _cache_manifest(self, m: Manifest) -> None:
        """LRU insert (dicts preserve insertion order): recency — not
        version order — must decide eviction, because the ascending
        maintenance walks (expire, orphan scan) depend on each step's
        PARENT being the most recently touched entry."""
        with self._cache_lock:
            cache = self._manifest_cache
            cache.pop(m.version, None)
            cache[m.version] = m
            while len(cache) > self._MANIFEST_CACHE_MAX:
                del cache[next(iter(cache))]

    # ---------- paths ----------
    @property
    def _meta_dir(self) -> str:
        if self.ref is not None:
            return os.path.join(self.root, "_meta", "branches", self.ref)
        return os.path.join(self.root, "_meta")

    @property
    def _main_meta_dir(self) -> str:
        return os.path.join(self.root, "_meta")

    @property
    def _branches_dir(self) -> str:
        # always under the MAIN meta dir — branches don't nest
        return os.path.join(self._main_meta_dir, "branches")

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._meta_dir, f"v{version:012d}.manifest.json")

    # ---------- create / load ----------
    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_cols: list[str],
        num_buckets: int = 16,
        properties: dict[str, str] | None = None,
    ) -> "LakeTable":
        """Create an empty table (v0). Internal columns are appended:

        ``_seq``    long   — last-writer event sequence for the row's key
        ``_deleted`` bool  — tombstone flag; tombstones are retained so a
                             late, lower-seq update cannot resurrect a
                             deleted key (FIXTURES.md §2 delete scenario)
        """
        for c in (BUCKET_COL, DELETED_COL, SEQ_COL):
            if c in schema.fieldNames():
                raise ValueError(f"column name {c} is reserved")
        missing = [k for k in key_cols if k not in schema.fieldNames()]
        if missing:
            raise ValueError(f"key columns not in schema: {missing}")
        # normalize to nullable (parquet-level reality; also prevents
        # spurious schema-version churn when batches arrive with
        # nullable variants of the same columns)
        full = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in schema.fields]
            + [
                T.StructField(SEQ_COL, T.LongType(), True),
                T.StructField(DELETED_COL, T.BooleanType(), True),
            ]
        )
        table = LakeTable(spark, root)
        if LakeTable.exists(root):
            raise FileExistsError(f"table already exists at {root}")
        # exist_ok: a prior create that crashed between makedirs and the
        # v0 manifest write (no CURRENT yet) is re-creatable in place —
        # double-create still fails above, and a concurrent double
        # create loses on the v0 manifest swap (CommitConflictError)
        os.makedirs(table._meta_dir, exist_ok=True)
        os.makedirs(table._data_dir, exist_ok=True)
        manifest = Manifest(
            version=0,
            snapshot_id=0,
            schemas={1: json.dumps(full.jsonValue())},
            current_schema_version=1,
            key_cols=list(key_cols),
            num_buckets=num_buckets,
            properties=properties or {},
            committed_at=time.time(),
        )
        table._write_manifest(manifest)
        return table

    @staticmethod
    def load(spark: SparkSession, root: str) -> "LakeTable":
        t = LakeTable(spark, root)
        t.current_manifest()  # raises if absent
        return t

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.exists(os.path.join(root, "_meta", "CURRENT"))

    # ---------- manifest IO ----------
    def current_version(self) -> int:
        with open(os.path.join(self._meta_dir, "CURRENT")) as fh:
            return int(fh.read().strip())

    def current_manifest(self) -> Manifest:
        return self.manifest_at(self.current_version())

    def manifest_at(self, version: int) -> Manifest:
        """Load (and materialize) a manifest. Delta-form manifests store
        only the file-list CHANGE vs their parent — resolution walks the
        parent chain (bounded by MANIFEST_CHECKPOINT_EVERY) and is
        memoized; everything downstream always sees a full Manifest.

        Takes the cache lock around lookup + resolve + insert so a
        concurrent evictor cannot drop a parent mid-resolution (the
        resolve recursion re-enters through the RLock)."""
        with self._cache_lock:
            return self._manifest_at_locked(version)

    def _manifest_at_locked(self, version: int) -> Manifest:
        cached = self._manifest_cache.get(version)
        if cached is not None:
            self._cache_manifest(cached)  # refresh LRU recency
            return cached
        with open(self._manifest_path(version)) as fh:
            d = json.load(fh)
        delta = d.pop("delta", None)
        parent = (
            self.manifest_at(int(delta["of"])) if delta is not None else None
        )
        if parent is not None:
            # schemas / watermarks may also be delta-form (changed
            # entries only — the metadata leg of O(changed) commits in
            # EVERY dimension); pre-delta-form manifests carry the full
            # maps in the payload and skip this merge
            if "schemas" not in d:
                sch = {str(k): v for k, v in parent.schemas.items()}
                sch.update(delta.get("schemas", {}))
                d["schemas"] = sch
            if "watermarks" not in d:
                wms = {k: dict(v) for k, v in parent.watermarks.items()}
                for k in delta.get("removed_watermarks", []):
                    wms.pop(k, None)
                wms.update(delta.get("watermarks", {}))
                d["watermarks"] = wms
        m = Manifest.from_json({**d, "files": d.get("files", [])})
        if parent is not None:
            removed = set(delta["removed_paths"])
            m.files = [f for f in parent.files if f.path not in removed] + [
                DataFile.from_json(x) for x in delta["added_files"]
            ]
        self._cache_manifest(m)
        return m

    def _serialize_manifest(self, manifest: Manifest) -> dict[str, Any]:
        """Full or delta representation. Delta (removed_paths +
        added_files vs parent) is chosen when it is strictly smaller
        than the full list AND this version is not a checkpoint — data
        file entries are immutable and path-addressed (uuid names), so
        a path set-difference is an exact encoding of the change."""
        payload = manifest.to_json()
        if (
            manifest.parent_version is None
            or manifest.version % MANIFEST_CHECKPOINT_EVERY == 0
        ):
            return payload
        try:
            parent = self.manifest_at(manifest.parent_version)
        except (OSError, KeyError, ValueError):
            return payload
        parent_paths = {f.path for f in parent.files}
        new_paths = {f.path for f in manifest.files}
        removed = sorted(parent_paths - new_paths)
        added = [f for f in manifest.files if f.path not in parent_paths]
        if len(removed) + len(added) >= max(len(manifest.files), 1):
            return payload  # delta not smaller (e.g. rebucket): stay full
        if any(k not in manifest.schemas for k in parent.schemas):
            # the schema set SHRANK (rollback_to across an evolution
            # boundary) — the delta form below can only add/change
            # schema entries, not remove them, so resolving it would
            # resurrect the rolled-back schemas: stay full
            return payload
        payload = {
            k: v for k, v in payload.items()
            if k not in ("files", "schemas", "watermarks")
        }
        # schemas append-only; watermarks change one source per commit —
        # store only what differs from the parent (O(changed) metadata
        # at 200 sources / long schema histories, not O(table state))
        sch_delta = {
            str(k): v for k, v in manifest.schemas.items()
            if parent.schemas.get(k) != v
        }
        wm_delta = {
            s: wm for s, wm in manifest.watermarks.items()
            if parent.watermarks.get(s) != wm
        }
        wm_removed = sorted(
            s for s in parent.watermarks if s not in manifest.watermarks
        )
        payload["delta"] = {
            "of": manifest.parent_version,
            "removed_paths": removed,
            "added_files": [f.to_json() for f in added],
            "schemas": sch_delta,
            "watermarks": wm_delta,
        }
        if wm_removed:
            payload["delta"]["removed_watermarks"] = wm_removed
        return payload

    def _write_manifest(self, manifest: Manifest) -> None:
        """Commit protocol: O_EXCL manifest create (conflict detection),
        fsync, then atomic CURRENT pointer swap via os.replace."""
        manifest.committed_at = time.time()
        path = self._manifest_path(manifest.version)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflictError(
                f"version {manifest.version} already committed at {path}"
            ) from e
        with os.fdopen(fd, "w") as fh:
            json.dump(self._serialize_manifest(manifest), fh)
            fh.flush()
            os.fsync(fh.fileno())
        self._cache_manifest(manifest)
        tmp = os.path.join(self._meta_dir, f".CURRENT.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(str(manifest.version))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(self._meta_dir, "CURRENT"))

    # ---------- read ----------
    def read(
        self,
        version: int | None = None,
        buckets: Iterable[int] | None = None,
        include_tombstones: bool = False,
        include_internal: bool = False,
        file_value_ranges: dict[str, list] | None = None,
        tag: str | None = None,
        as_of=None,
    ) -> DataFrame:
        """Scan the table at a snapshot (default: current).

        ``tag`` reads at a NAMED snapshot (``tag()``; Iceberg tag
        semantics — an immutable, retention-protected ref), mutually
        exclusive with ``version``.

        ``as_of`` reads at the latest snapshot committed at or before
        the given timestamp (epoch seconds / ``datetime`` / ISO string)
        — Delta ``timestampAsOf`` / Iceberg ``as-of-timestamp``
        semantics via :meth:`version_as_of`; mutually exclusive with
        both ``version`` and ``tag``.

        ``buckets`` restricts the scan to the named hash buckets —
        manifest-level partition pruning: files for other buckets are never
        opened, the parquet scan list is built on the driver from KB-sized
        metadata. Old-schema files are aligned (null-fill / widen-cast) to
        the current schema before union.

        ``file_value_ranges`` = {col: [values]} prunes FILES whose
        manifest ``col_stats`` range cannot contain any of the values.
        An entry may also be a 2-tuple ``(lo, hi)`` meaning an INTERVAL:
        the file is kept when its range overlaps [lo, hi] — the
        wide-batch fallback shape (a 15k-value dirty set collapses to
        one interval; see entities/incremental.py) —
        manifest-level value pruning, tight when the table clusters with
        ``write.sort_within_buckets``. PRUNING ONLY, not a filter: kept
        files may still hold other values, so callers apply their own
        predicate/join on top (exactly parquet row-group pruning's
        contract, one level up). Stats-less files are kept. SAFETY under
        merge-on-read (VERDICT r3 directive 2, granularity by column
        class) — see below:

        * **KEY columns** prune per-FILE even in delta-holding buckets:
          a key's value is identical in every version of its rows, so
          dropping a file can only hide rows whose key value is out of
          the sought set — rows the caller's own predicate (the
          documented contract) excludes anyway. No stale state can
          surface: whichever of a key's versions survives carries the
          same key value.
        * **NON-KEY (mutable) columns** prune ALL-OR-NOTHING per
          bucket when the bucket holds deltas: last-writer-wins
          resolution runs across the bucket's files, and dropping only
          the file carrying a key's newest version would resurrect its
          stale base row. The bucket is skipped only when EVERY file's
          range (base AND delta, unioned driver-side from the manifest)
          excludes the sought values. Resurrection guard test-pinned.
        """
        if sum(x is not None for x in (version, tag, as_of)) > 1:
            raise ValueError("pass at most one of version, tag, as_of")
        if tag is not None:
            version = self._resolve_tag(tag)
        elif as_of is not None:
            version = self.version_as_of(as_of)
        m = self.manifest_at(version if version is not None else self.current_version())
        want = set(buckets) if buckets is not None else None
        files = [f for f in m.files if want is None or f.bucket in want]
        if file_value_ranges:
            key_cols = set(m.key_cols)

            from .bloom import bloom_may_contain

            def may_contain(f: DataFile, ranges: dict) -> bool:
                st = f.stats if isinstance(f.stats, dict) else None
                cs = (st or {}).get("col_stats") or {}
                blooms = (st or {}).get("blooms") or {}
                for col, values in ranges.items():
                    rng = cs.get(col)
                    if rng is not None:
                        lo, hi = rng
                        try:
                            ok = False
                            for v in values:
                                if isinstance(v, (tuple, list)):
                                    vlo, vhi = v
                                    if not (hi < vlo or lo > vhi):
                                        ok = True
                                        break
                                elif lo <= v <= hi:
                                    ok = True
                                    break
                            if not ok:
                                return False
                        except TypeError:
                            pass
                    bl = blooms.get(col)
                    # bloom: point probes only (intervals can't probe a
                    # membership sketch); kept iff SOME sought value may
                    # be present — prunes where min/max can't (high-
                    # cardinality unclustered columns)
                    if bl is not None and values and not any(
                        isinstance(v, (tuple, list)) for v in values
                    ):
                        if not any(bloom_may_contain(bl, v) for v in values):
                            return False
                return True

            key_rng = {c: v for c, v in file_value_ranges.items()
                       if c in key_cols}
            mut_rng = {c: v for c, v in file_value_ranges.items()
                       if c not in key_cols}
            by_bucket: dict[int, list[DataFile]] = {}
            for f in files:
                by_bucket.setdefault(f.bucket, []).append(f)
            kept: list[DataFile] = []
            for fs in by_bucket.values():
                has_delta = any(f.is_delta for f in fs)
                if mut_rng and has_delta:
                    # mutable-column condition: bucket-granular
                    if not any(may_contain(f, mut_rng) for f in fs):
                        continue
                    kept.extend(f for f in fs if may_contain(f, key_rng))
                else:
                    kept.extend(
                        f for f in fs
                        if may_contain(f, key_rng) and may_contain(f, mut_rng)
                    )
            files = kept
        target_schema = m.schema
        has_delta = any(f.is_delta for f in files)
        if not files:
            df = self.spark.createDataFrame([], target_schema)
        else:
            by_ver: dict[tuple[int, bool, bool], list[DataFile]] = {}
            for f in files:
                by_ver.setdefault(
                    (f.schema_version, f.is_delta, f.dml), []
                ).append(f)
            parts: list[DataFrame] = []
            for (sv, is_delta, is_dml), group in sorted(by_ver.items()):
                file_schema = T.StructType.fromJson(json.loads(m.schemas[sv]))
                paths = [os.path.join(self.root, f.path) for f in group]
                raw = self.spark.read.schema(file_schema).parquet(*paths)
                part = align_to_schema(raw, target_schema)
                if has_delta:
                    part = part.withColumn("_mor_delta", F.lit(1 if is_delta else 0))
                    # real CDC rows (1) beat DML-minted rows (0) on an
                    # exact (seq, delta) tie — see DataFile.dml
                    part = part.withColumn("_mor_pri", F.lit(0 if is_dml else 1))
                parts.append(part)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        if has_delta:
            # merge-on-read: base rows and delta rows coexist per key;
            # resolve last-writer-wins at scan time with ONE whole-row
            # max_by (tied rows can never blend column values) ordered by
            # (event_seq, delta-over-base, real-over-dml). An event_seq
            # tie between two real DELTA rows (replay) is contract-
            # identical content, so the arbitrary-but-atomic winner is
            # still deterministic state; a DML row deterministically
            # LOSES its tie to the next real event (DataFile.dml).
            non_key = [
                c for c in df.columns
                if c not in m.key_cols and c not in ("_mor_delta", "_mor_pri")
            ]
            order = F.struct(
                F.coalesce(F.col(SEQ_COL), F.lit(-1)).alias("s"),
                F.col("_mor_delta").alias("d"),
                F.col("_mor_pri").alias("p"),
            )
            df = (
                df.groupBy(*m.key_cols)
                .agg(F.max_by(F.struct(*non_key), order).alias("_w"))
                .select(*m.key_cols, "_w.*")
            )
        if not include_tombstones:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        if not include_internal:
            df = df.drop(SEQ_COL, DELETED_COL)
        return df

    def changed_buckets(
        self, from_version: int, to_version: int | None = None
    ) -> list[int] | None:
        """Buckets whose FILE SET differs between two snapshots — a
        driver-side manifest diff (KB of JSON, no Spark job). Data files
        are immutable and content-addressed by path, so an identical
        per-bucket file list ⇒ bit-identical rows at both versions ⇒ the
        bucket cannot contribute a changelog row. Returns None when the
        bucket layout itself changed between the versions (rebucket) —
        bucket ids are not comparable across layouts, callers must fall
        back to the full diff."""
        m_from = self.manifest_at(from_version)
        m_to = self.manifest_at(
            to_version if to_version is not None else self.current_version()
        )
        if m_from.num_buckets != m_to.num_buckets:
            return None
        by_bucket: dict[int, list[set[str]]] = {}
        for i, m in enumerate((m_from, m_to)):
            for f in m.files:
                by_bucket.setdefault(f.bucket, [set(), set()])[i].add(f.path)
        return sorted(b for b, (a, c) in by_bucket.items() if a != c)

    def read_changes(
        self,
        from_version: int,
        to_version: int | None = None,
        prune: bool = True,
        include_before: bool = False,
    ) -> DataFrame:
        """Changelog between two snapshots — the engine is a CDC *source*
        as well as a sink (Iceberg's changelog scan / Delta's
        table_changes analogue; the reference's staged-vs-live diff
        semantics, ingest-processed-data.yaml:86-116, read back out).

        Returns one row per key whose state differs between the two
        snapshots, with ``_change_type`` ∈ insert/update/delete, the NEW
        row payload (old payload for deletes), and ``_seq``. Both sides
        are MANIFEST-PRUNED scans: only buckets whose file lists differ
        between the two versions (``changed_buckets``) are read, so the
        per-micro-batch diff is proportional to the change set, not the
        table — at 10^10 rows this is the difference between reading a
        batch's worth of buckets and scanning two full snapshots.
        ``prune=False`` forces the full two-snapshot diff (benchmark /
        cross-check path). ``include_before=True`` adds a ``_before``
        struct column holding the OLD payload (null for inserts) — the
        Delta-CDF-preimage analogue, needed by consumers maintaining
        aggregates grouped on a MUTABLE column: an update that moves a
        row between groups dirties BOTH its old and new group."""
        m_to = self.manifest_at(
            to_version if to_version is not None else self.current_version()
        )
        if not self.manifest_at(from_version).files:
            # EMPTY-BASE fast path (bootstrap / first consumption):
            # every live row is an insert, so the full-outer diff join
            # degenerates to a plain snapshot scan — at bootstrap scale
            # that join (and any staged copy of its output) is the
            # dominant wasted work
            keys = m_to.key_cols
            data_cols = [
                f.name for f in m_to.schema.fields
                if f.name not in (SEQ_COL, DELETED_COL)
            ]
            payload_cols = [F.col(c) for c in data_cols if c not in keys]
            new = self.read(version=m_to.version, include_internal=True)
            sel = [
                *keys, F.lit("insert").alias("_change_type"),
                *payload_cols, F.col(SEQ_COL),
            ]
            if include_before:
                before_t = new.select(
                    F.struct(*payload_cols, F.col(SEQ_COL)).alias("_b")
                ).schema[0].dataType
                sel.append(F.lit(None).cast(before_t).alias("_before"))
            return new.select(*sel)
        buckets = self.changed_buckets(from_version, m_to.version) if prune else None
        # the older snapshot reads with ITS schema; align it to the newer
        # one (null-fill added columns, widen casts) so the struct diff is
        # well-typed across an evolution boundary — a row whose only
        # change is the arrival of a value in a new column classifies as
        # an update, exactly right
        old = align_to_schema(
            self.read(version=from_version, include_internal=True, buckets=buckets),
            m_to.schema,
        )
        new = self.read(version=m_to.version, include_internal=True, buckets=buckets)
        keys = m_to.key_cols
        data_cols = [
            f.name for f in m_to.schema.fields if f.name not in (SEQ_COL, DELETED_COL)
        ]
        # equality over structs requires every leaf to be comparable —
        # MAP columns are not (Spark forbids ordering/equality on maps).
        # Build a parallel COMPARISON struct where maps become
        # key-sorted entry arrays (deterministic, value-equal ⇒
        # array-equal); the payload struct keeps the original types.
        fields_by_name = {f.name: f for f in m_to.schema.fields}

        def _cmp_col(c: str) -> F.Column:
            return _orderable_col(F.col(c), fields_by_name[c].dataType)

        has_map = any(
            _contains_map(fields_by_name[c].dataType)
            for c in data_cols if c not in keys
        )
        payload_cols = [F.col(c) for c in data_cols if c not in keys]
        o_sel = [*keys, F.struct(*payload_cols, F.col(SEQ_COL)).alias("_old")]
        n_sel = [*keys, F.struct(*payload_cols, F.col(SEQ_COL)).alias("_new")]
        if has_map:
            cmp_cols = [
                _cmp_col(c).alias(c) for c in data_cols if c not in keys
            ]
            o_sel.append(
                F.struct(*cmp_cols, F.col(SEQ_COL)).alias("_oldc")
            )
            n_sel.append(
                F.struct(*cmp_cols, F.col(SEQ_COL)).alias("_newc")
            )
        o = old.select(*o_sel)
        nw = new.select(*n_sel)
        j = o.join(nw, keys, "full_outer")
        neq = (
            ~F.col("_newc").eqNullSafe(F.col("_oldc"))
            if has_map
            else ~F.col("_new").eqNullSafe(F.col("_old"))
        )
        change = (
            F.when(F.col("_old").isNull(), F.lit("insert"))
            .when(F.col("_new").isNull(), F.lit("delete"))
            .when(neq, F.lit("update"))
        )
        payload = F.coalesce(F.col("_new"), F.col("_old"))
        out = (
            j.withColumn("_change_type", change)
            .filter(F.col("_change_type").isNotNull())
        )
        extra = [F.col("_old").alias("_before")] if include_before else []
        return out.select(
            *keys, "_change_type", payload.alias("_p"), *extra
        ).select(*keys, "_change_type", "_p.*", *(["_before"] if include_before else []))

    def snapshots(self) -> list[Manifest]:
        out = []
        v = self.current_version()
        while v is not None:
            m = self.manifest_at(v)
            out.append(m)
            v = m.parent_version
        return list(reversed(out))

    def version_as_of(self, ts) -> int:
        """Latest RETAINED snapshot committed at or before ``ts`` —
        Delta's ``timestampAsOf`` / Iceberg's ``as-of-timestamp``
        resolution rule. ``ts`` accepts epoch seconds (int/float), a
        ``datetime`` (naive = UTC), or an ISO-8601 string.

        Raises ``ValueError`` when ``ts`` predates the oldest retained
        snapshot (its manifest may have been expired — the answer would
        silently be a NEWER state than asked for, so refuse instead)."""
        epoch = _ts_to_epoch(ts)
        best: Manifest | None = None
        oldest: Manifest | None = None
        for m in self.snapshots():
            if oldest is None or m.version < oldest.version:
                oldest = m
            if m.committed_at <= epoch and (
                best is None or m.version > best.version
            ):
                best = m
        if best is None:
            detail = (
                f"oldest retained snapshot v{oldest.version} was committed "
                f"at {oldest.committed_at:.3f}" if oldest is not None
                else "table has no snapshots"
            )
            raise ValueError(
                f"no snapshot of {self.root} exists at or before "
                f"{epoch:.3f} — {detail}; earlier history has been "
                "expired by snapshot retention"
            )
        return best.version

    def version_before(self, ts) -> int:
        """Latest RETAINED snapshot committed STRICTLY before ``ts`` —
        the change-feed start bound: "changes since time T" = changes
        committed strictly after this version, which INCLUDES a commit
        landing at exactly T (Delta CDF's startingTimestamp rule; the
        at-or-before :meth:`version_as_of` would exclude it). Raises
        ``ValueError`` when no retained snapshot predates ``ts`` — the
        span would start inside expired history and silently under-
        deliver."""
        epoch = _ts_to_epoch(ts)
        best: Manifest | None = None
        for m in self.snapshots():
            if m.committed_at < epoch and (
                best is None or m.version > best.version
            ):
                best = m
        if best is None:
            raise ValueError(
                f"no snapshot of {self.root} was committed before "
                f"{epoch:.3f} — the requested change span starts inside "
                "expired (or not-yet-written) history"
            )
        return best.version

    def _lineage_roots(self) -> list[int]:
        """Roots of every reachable manifest chain: CURRENT plus any
        pinned versions (retention pins survive expiry DISCONNECTED from
        the current chain once their parents are re-rooted away)."""
        roots = [self.current_version()]
        for v in sorted(set(self.pinned_versions().values()), reverse=True):
            if v not in roots:
                roots.append(v)
        return roots

    def lineage_span_for(
        self, source_id: str, batch_id: int
    ) -> tuple[int | None, int] | None:
        """(parent_version, version) of the snapshot whose lineage
        committed (source_id, batch_id) — the replay-recovery resolver.
        ``parent_version`` is None when the committing snapshot was
        re-rooted by expiry (its diff base is gone — the version is
        still resolvable, a changelog from before it is not).
        LAZY newest-first walk of the parent chain with the monotone
        early-stop (per source, lineage batch ids only decrease walking
        back), so the common fence-replay check costs O(1) manifest
        reads — never a full-chain materialization, which at ~10^5
        versions would be ~10^5 JSON loads per replayed epoch. Chains
        rooted at PINNED versions are walked too (a pin disconnected by
        expiry still resolves its batch). None if unreachable (expired)
        or the id predates this source."""
        want = int(batch_id)
        visited: set[int] = set()
        for root in self._lineage_roots():
            v: int | None = root
            while v is not None and v not in visited:
                visited.add(v)
                try:
                    m = self.manifest_at(v)
                except OSError:
                    break
                stop_chain = False
                for entry in m.lineage:
                    if entry.get("source_id") != source_id:
                        continue
                    found = int(entry.get("batch_id", -1))
                    if found == want:
                        return (m.parent_version, m.version)
                    if found < want:
                        stop_chain = True  # monotone: not further back
                        break
                if stop_chain:
                    break
                v = m.parent_version
        return None

    @property
    def _lineage_archive_path(self) -> str:
        return os.path.join(self._meta_dir, "lineage.archive.jsonl")

    def lineage_df(self) -> DataFrame:
        """All lineage records — live snapshots PLUS the archive of
        expired ones (FIXTURES.md §3 shape). ``expire_snapshots`` folds
        each expired manifest's lineage into an append-only JSONL
        archive before deleting it, so ingest history (source offset
        ranges, row counts, snapshot ids) outlives snapshot retention —
        the durable analogue of TDR's ``datarepo_load_history``."""
        records: list[dict[str, Any]] = []
        if os.path.exists(self._lineage_archive_path):
            with open(self._lineage_archive_path) as fh:
                for line in fh:
                    if line.strip():
                        records.append(json.loads(line))
        # walk CURRENT's chain plus any pinned chains (a pinned version
        # disconnected by expiry keeps its lineage reachable here)
        visited: set[int] = set()
        for root in self._lineage_roots():
            v: int | None = root
            while v is not None and v not in visited:
                visited.add(v)
                try:
                    m = self.manifest_at(v)
                except OSError:
                    break
                for entry in m.lineage:
                    records.append(
                        {**entry, "snapshot_id": m.snapshot_id,
                         "committed_at": m.committed_at}
                    )
                v = m.parent_version
        # a crash between archive-append and manifest deletion makes a
        # re-run re-archive the same entries — dedup on the natural key
        seen: set[tuple] = set()
        rows = []
        for e in records:
            key = (e.get("source_id", ""), int(e["batch_id"]), int(e["snapshot_id"]))
            if key in seen:
                continue
            seen.add(key)
            rows.append(
                (
                    int(e["batch_id"]),
                    e.get("source_id", ""),
                    int(e.get("source_offset_start", -1)),
                    int(e.get("source_offset_end", -1)),
                    {k: int(v) for k, v in e.get("row_counts", {}).items()},
                    int(e["snapshot_id"]),
                    float(e["committed_at"]),
                )
            )
        schema = (
            "batch_id long, source_id string, source_offset_start long, "
            "source_offset_end long, row_counts map<string,long>, "
            "snapshot_id long, committed_at double"
        )
        return self.spark.createDataFrame(rows, schema)

    # ---------- metadata inspection (Iceberg metadata-tables shape) ----------
    def files_df(self, version: int | None = None) -> DataFrame:
        """The snapshot's data files as a DataFrame — Iceberg's
        ``<table>.files`` metadata table: one row per live file with
        its bucket, size, row count, MOR form, and the manifest stats
        the planner prunes with (seq range, tombstone flag, per-column
        min/max, which columns carry Bloom filters). Driver-side KB of
        manifest JSON; no data files are opened."""
        m = self.manifest_at(
            version if version is not None else self.current_version()
        )
        rows = []
        for f in m.files:
            st = f.stats if isinstance(f.stats, dict) else {}
            cs = st.get("col_stats") or {}
            rows.append(
                (
                    f.path, f.bucket, f.rows, f.bytes, f.schema_version,
                    f.is_delta,
                    None if st.get("min_seq") is None else int(st["min_seq"]),
                    None if st.get("max_seq") is None else int(st["max_seq"]),
                    bool(st.get("has_tombstones", True)),
                    {c: [str(v[0]), str(v[1])] for c, v in cs.items()},
                    sorted((st.get("blooms") or {}).keys()),
                )
            )
        schema = (
            "path string, bucket int, rows long, bytes long, "
            "schema_version int, is_delta boolean, min_seq long, "
            "max_seq long, has_tombstones boolean, "
            "col_stats map<string,array<string>>, bloom_columns array<string>"
        )
        return self.spark.createDataFrame(rows, schema)

    def snapshots_df(self) -> DataFrame:
        """Retained snapshots as a DataFrame — Iceberg's
        ``<table>.snapshots`` / Delta's ``DESCRIBE HISTORY`` shape: one
        row per live version with commit time, exactly-once watermarks'
        span, file/row/byte totals, and layout (bucket count, schema
        version, key columns). Walks only RETAINED manifests (expired
        history lives in ``lineage_df``'s archive)."""
        rows = []
        for m in self.snapshots():
            rows.append(
                (
                    m.version, int(m.snapshot_id), float(m.committed_at),
                    m.parent_version, len(m.files),
                    sum(f.rows for f in m.files),
                    sum(f.bytes for f in m.files),
                    sum(1 for f in m.files if f.is_delta),
                    m.num_buckets, m.current_schema_version,
                    list(m.key_cols),
                    {
                        s: int(w.get("batch_id", -1))
                        for s, w in (m.watermarks or {}).items()
                    },
                )
            )
        schema = (
            "version int, snapshot_id long, committed_at double, "
            "parent_version int, n_files int, total_rows long, "
            "total_bytes long, n_delta_files int, num_buckets int, "
            "schema_version int, key_cols array<string>, "
            "watermarks map<string,long>"
        )
        return self.spark.createDataFrame(rows, schema)

    def refs_df(self) -> DataFrame:
        """Named refs as a DataFrame — Iceberg's ``<table>.refs``: the
        main head, every tag (immutable, retention-pinning), and every
        branch (WAP staging chain) with its head and fork point."""
        rows = [("main", "branch", self.current_version(), None)]
        for name, v in sorted(self.tags().items()):
            rows.append((name, "tag", v, None))
        for name, head in sorted(self.branches().items()):
            rows.append((name, "branch", head, self.branch_fork_version(name)))
        return self.spark.createDataFrame(
            rows, "name string, type string, version int, fork_version int"
        )

    # ---------- write ----------
    _token_cache: dict[int, list[int]] = {}

    def _bucket_token_expr(self, n: int) -> F.Column:
        """Map each bucket id to a precomputed token whose murmur3 hash
        lands in a DISTINCT shuffle partition — `repartition(n, token)`
        then routes exactly one bucket per task (one file per bucket, no
        collisions, no sampling pass). Token search is a single tiny
        driver-side scan of `range(64n)`, cached per bucket count."""
        tokens = LakeTable._token_cache.get(n)
        if tokens is None:
            cand = self.spark.range(0, 64 * n).select(
                F.col("id"), F.pmod(F.hash(F.col("id")), F.lit(n)).alias("p")
            )
            by_part = {r["p"]: r["min(id)"] for r in cand.groupBy("p").agg(F.min("id")).collect()}
            missing = [p for p in range(n) if p not in by_part]
            if missing:  # astronomically unlikely with 64n candidates
                raise RuntimeError(f"no hash token found for partitions {missing}")
            tokens = [int(by_part[p]) for p in range(n)]
            LakeTable._token_cache[n] = tokens
        # token values MUST stay LongType: murmur3(int x) != murmur3(long x),
        # and the token search above hashed longs (spark.range ids)
        pairs = []
        for b, tok in enumerate(tokens):
            pairs.append(F.lit(b))
            pairs.append(F.lit(tok).cast("long"))
        return F.element_at(F.create_map(*pairs), F.col(BUCKET_COL))

    def _stage_write(
        self,
        df: DataFrame,
        schema_version: int,
        num_buckets: int | None = None,
        is_delta: bool = False,
        dml: bool = False,
        pre_partitioned: bool = False,
    ) -> list[DataFile]:
        """Write df (which must carry BUCKET_COL) into a staging dir
        partitioned by bucket, then move files under data/. Returns the new
        DataFile entries. Move = same-filesystem rename (no data copy).

        ``pre_partitioned=True`` declares the caller already routed rows so
        each task holds whole bucket(s) — e.g. the merge path's
        repartition(B, keys), whose HashPartitioning IS bucket_expr — and
        skips the routing shuffle entirely."""
        stage = os.path.join(self.root, "_staging", uuid.uuid4().hex)
        os.makedirs(os.path.dirname(stage), exist_ok=True)
        marker = self._stage_marker(stage)
        m_cur = self.current_manifest()
        n_buckets = max(num_buckets or m_cur.num_buckets, 1)
        if not pre_partitioned:
            # Exact 1:1 bucket→task routing (see _bucket_tokens): avoids
            # both the balls-into-bins collisions of hash-repartition on a
            # low-cardinality int (some tasks get 3-4 buckets, others 0)
            # and the upstream RE-EXECUTION repartitionByRange's boundary
            # sampling would cost on an expensive child plan.
            df = df.repartition(n_buckets, self._bucket_token_expr(n_buckets))
        # optional file clustering: a LOCAL (no shuffle, partitioning-
        # preserving) sort by the named columns before write. With it,
        # parquet row-group min/max on those columns are tight ranges,
        # so a pushed `repo IN (...)` predicate (the dirty-group
        # incremental refresh) skips row groups instead of reading the
        # bucket — the key-composite bucketing spreads every repo across
        # all buckets, so WITHOUT clustering those stats span everything
        # and prune nothing. Also improves RLE/dict compression.
        from .cluster import load_boundaries, parse_cluster_spec, zorder_value

        ccols, is_zorder = parse_cluster_spec(m_cur.properties)
        sort_cols = [c for c in ccols if c in df.columns]
        bloom_prop = m_cur.properties.get("write.bloom_filter_columns", "")
        bloom_cols = [c for c in bloom_prop.split(",") if c and c in df.columns]
        if sort_cols:
            # BUCKET_COL leads so the dynamic-partition write's required
            # ordering (sort by partition cols) is already satisfied and
            # Spark does not insert its own (clustering-destroying) sort
            sort_exprs: list = list(sort_cols)
            if is_zorder:
                bnd, zbits = load_boundaries(m_cur.properties)
                if bnd and all(c in bnd for c in sort_cols):
                    # multi-dimensional clustering: one interleaved-rank
                    # LONG (lake/cluster.py) — col_stats still collect on
                    # the constituent columns, so pruning works on every
                    # z dimension
                    sort_exprs = [zorder_value(sort_cols, bnd, zbits)]
            df = df.sortWithinPartitions(BUCKET_COL, *sort_exprs)
        (
            df.write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(stage)
        )
        import pyarrow.parquet as pq

        new_files: list[DataFile] = []
        for bucket_dir in sorted(os.listdir(stage)):
            if not bucket_dir.startswith(f"{BUCKET_COL}="):
                continue
            bucket = int(bucket_dir.split("=", 1)[1])
            dest_dir = os.path.join(self._data_dir, f"{BUCKET_COL}={bucket}")
            os.makedirs(dest_dir, exist_ok=True)
            for fn in sorted(os.listdir(os.path.join(stage, bucket_dir))):
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(stage, bucket_dir, fn)
                pf = pq.ParquetFile(src)
                rows = pf.metadata.num_rows
                if rows == 0:
                    continue
                stats = _footer_stats(
                    pf, value_cols=sort_cols, bloom_cols=bloom_cols
                )
                dest_name = f"{uuid.uuid4().hex}.parquet"
                dest = os.path.join(dest_dir, dest_name)
                os.replace(src, dest)
                new_files.append(
                    DataFile(
                        path=os.path.relpath(dest, self.root),
                        bucket=bucket,
                        rows=rows,
                        bytes=os.path.getsize(dest),
                        schema_version=schema_version,
                        is_delta=is_delta,
                        dml=dml,
                        stats=stats,
                    )
                )
        shutil.rmtree(stage, ignore_errors=True)
        try:
            os.remove(marker)
        except OSError:
            pass
        return new_files

    def overwrite(self, df: DataFrame, dedup: bool = True) -> Manifest:
        """Replace full table contents (bootstrap/backfill path).

        ``dedup=True`` (default) enforces the table's one-row-per-key
        invariant at the door: duplicate keys collapse to the whole row
        with the highest ``_seq`` (deterministic max_by). Every merge
        path assumes the invariant — the union-agg path would self-heal
        a duplicate, but the broadcast path's map-side survivor filter
        would persist both rows forever and corrupt lineage counts.
        Pass ``dedup=False`` only when the input is provably unique
        (skips one shuffle on bootstrap)."""
        m = self.current_manifest()
        data_cols = [f.name for f in m.schema.fields if f.name not in (SEQ_COL, DELETED_COL)]
        prepared = df
        if SEQ_COL not in df.columns:
            prepared = prepared.withColumn(SEQ_COL, F.lit(0).cast("long"))
        if DELETED_COL not in df.columns:
            prepared = prepared.withColumn(DELETED_COL, F.lit(False))
        prepared = prepared.select(*data_cols, SEQ_COL, DELETED_COL)
        if dedup:
            non_key = [c for c in prepared.columns if c not in m.key_cols]
            prepared = (
                prepared.groupBy(*m.key_cols)
                .agg(
                    F.max_by(
                        F.struct(*non_key), F.coalesce(F.col(SEQ_COL), F.lit(-1))
                    ).alias("_w")
                )
                .select(*m.key_cols, "_w.*")
            )
        prepared = prepared.withColumn(
            BUCKET_COL, bucket_expr(m.key_cols, m.num_buckets)
        )
        new_files = self._stage_write(prepared, m.current_schema_version)
        nm = Manifest(
            version=m.version + 1,
            snapshot_id=m.snapshot_id + 1,
            schemas=m.schemas,
            current_schema_version=m.current_schema_version,
            key_cols=m.key_cols,
            num_buckets=m.num_buckets,
            files=new_files,
            watermarks=m.watermarks,
            lineage=[],
            parent_version=m.version,
            properties=m.properties,
        )
        self._write_manifest(nm)
        return nm

    def evolve_schema(self, incoming: T.StructType) -> Manifest:
        """Reconcile the table schema with an incoming batch schema:
        new columns are added (nullable), int→long / float→double widenings
        are applied; anything else raises. Metadata-only commit — no data
        files are rewritten (old files are aligned at read time)."""
        m = self.current_manifest()
        merged = merge_schemas(m.schema, incoming, protected=(SEQ_COL, DELETED_COL))
        if json.dumps(merged.jsonValue()) == m.schemas[m.current_schema_version]:
            return m  # no-op
        new_sv = max(m.schemas) + 1
        schemas = dict(m.schemas)
        schemas[new_sv] = json.dumps(merged.jsonValue())
        nm = Manifest(
            version=m.version + 1,
            snapshot_id=m.snapshot_id + 1,
            schemas=schemas,
            current_schema_version=new_sv,
            key_cols=m.key_cols,
            num_buckets=m.num_buckets,
            files=m.files,
            watermarks=m.watermarks,
            lineage=[],
            parent_version=m.version,
            properties=m.properties,
        )
        self._write_manifest(nm)
        return nm

    def clone_to(
        self,
        dest_root: str,
        version: int | None = None,
        tag: str | None = None,
        shallow: bool = True,
    ) -> "LakeTable":
        """``CREATE TABLE ... CLONE`` — fork this table's state at a
        snapshot into a NEW independent table at ``dest_root``.

        ``shallow=True`` (default, the dev/test fork): the clone's v0
        manifest references the source's data files via relative
        ``../`` paths — ZERO data copied, metadata-only, instant at any
        size. Two mechanisms close the sharp edge Delta documents
        (VACUUM on either side deleting shared files):

        * the source records a retention pin (unique per destination —
          ``clone.<name>.<hash of dest path>``, also recorded in the
          clone's ``clone.pin`` property for mechanical release) at the
          cloned version, PINNED BEFORE the manifest is read so a
          concurrent source expiry cannot race the clone into
          referencing deleted files; release with
          ``source.unpin_version(clone_props["clone.pin"])`` once the
          fork has compacted to fully-local files;
        * CLONE-side expiry never deletes a path outside its own root
          (guard in ``expire_snapshots``), so rewriting/compacting the
          clone can only reclaim the clone's OWN files.

        A shallow clone OF a shallow clone is refused while the
        intermediate still references its own source's files (the
        grandparent's retention would have no record of the grandchild)
        — deep-clone instead, or re-clone from the original; once the
        intermediate has compacted to local files, shallow re-cloning
        works. Main ref only (a WAP branch is short-lived staging whose
        drop would GC the pin with it).

        ``shallow=False`` copies the data files (deep clone) — no pin,
        no shared fate, cost proportional to data size; escaping
        ``../`` references of a shallow-clone source are normalized to
        clone-local paths during the copy.

        The clone carries the full schema set, key/bucket layout,
        properties, AND the exactly-once watermarks: re-driving the
        source's ingest against the clone fence-skips the already-
        cloned span and replays only what follows — the CDC-correct
        fork semantics (a clone without watermarks would re-ingest and
        double-apply). Branches/tags/pins of the source do NOT clone
        (refs are per-table); lineage starts with one ``clone`` record.
        """
        self._require_main("clone_to")
        if LakeTable.exists(dest_root):
            raise FileExistsError(f"clone destination {dest_root} already exists")
        src_abs_root = os.path.abspath(self.root)
        dest_abs_root = os.path.abspath(dest_root)
        if (
            dest_abs_root == src_abs_root
            or dest_abs_root.startswith(src_abs_root + os.sep)
            or src_abs_root.startswith(dest_abs_root + os.sep)
        ):
            # a nested clone's own files would be flagged (and deleted)
            # as the outer table's orphans by its maintain/GC disk scan
            raise ValueError(
                "clone destination must not nest inside the source "
                f"table root (or vice versa): {dest_root} vs {self.root}"
            )
        if tag is not None and version is not None:
            raise ValueError("pass either version or tag, not both")
        if tag is not None:
            version = self._resolve_tag(tag)
        v = version if version is not None else self.current_version()
        clone_name = os.path.basename(os.path.normpath(dest_root))
        pin_name = (
            "clone."
            + clone_name
            + "."
            + _sha1_hex(dest_abs_root)[:8]  # unique per DESTINATION —
            # basename-only keys would let a second clone named alike
            # silently replace this pin and expose the files to expiry
        )
        if shallow:
            # PIN FIRST, then load+verify: pinning after the manifest
            # read races a concurrent source expiry (the cloned
            # version's files could be deleted in the window); pinning
            # a version that turns out expired is cleaned up below
            self.pin_version(pin_name, v)
        try:
            m = self.manifest_at(v)
            missing = [
                f.path
                for f in m.files
                if not os.path.exists(os.path.join(src_abs_root, f.path))
            ]
            if missing:
                raise ValueError(
                    f"cannot clone {self.root} @ v{v}: {len(missing)} "
                    f"data file(s) already reclaimed by expiry "
                    f"(first: {missing[0]})"
                )
            escaping = [
                f.path
                for f in m.files
                if not os.path.abspath(
                    os.path.join(src_abs_root, f.path)
                ).startswith(src_abs_root + os.sep)
            ]
            if shallow and escaping:
                raise ValueError(
                    "shallow clone of a shallow clone: this table still "
                    f"references {len(escaping)} file(s) of ITS source "
                    f"(first: {escaping[0]}), whose retention would have "
                    "no record of the new clone — deep-clone instead, "
                    "re-clone from the original table, or compact this "
                    "table to local files first"
                )
        except BaseException:
            if shallow:
                self.unpin_version(pin_name)
            raise
        clone = LakeTable(self.spark, dest_root)
        os.makedirs(clone._meta_dir, exist_ok=True)
        os.makedirs(clone._data_dir, exist_ok=True)
        new_files: list[DataFile] = []
        for f in m.files:
            src_abs = os.path.join(src_abs_root, f.path)
            if shallow:
                path = os.path.relpath(src_abs, dest_abs_root)
            else:
                path = f.path
                if not os.path.abspath(
                    os.path.join(dest_abs_root, path)
                ).startswith(dest_abs_root + os.sep):
                    # deep clone of a shallow clone: normalize escaping
                    # ../ references to canonical clone-LOCAL paths so
                    # the copy lands inside the dest root and the deep
                    # clone is genuinely self-contained
                    path = os.path.join(
                        "data",
                        f"{BUCKET_COL}={f.bucket}",
                        os.path.basename(f.path),
                    )
                dest_abs = os.path.join(dest_abs_root, path)
                os.makedirs(os.path.dirname(dest_abs), exist_ok=True)
                shutil.copy2(src_abs, dest_abs)
            new_files.append(
                DataFile(
                    path=path,
                    bucket=f.bucket,
                    rows=f.rows,
                    bytes=f.bytes,
                    schema_version=f.schema_version,
                    is_delta=f.is_delta,
                    dml=f.dml,
                    stats=f.stats,
                )
            )
        props = dict(m.properties)
        if shallow:
            # discoverability: the clone records which pin protects it
            # and where — release is mechanical once the fork is local
            props["clone.pin"] = pin_name
            props["clone.source"] = src_abs_root
        else:
            # a deep clone holds no pin and has no shared fate: clone.*
            # properties inherited from a shallow-clone SOURCE would
            # name the pin still protecting that intermediate — running
            # the documented mechanical release against this copy would
            # unpin the intermediate and expose its shared files to
            # source expiry
            props.pop("clone.pin", None)
            props.pop("clone.source", None)
        nm = Manifest(
            version=0,
            snapshot_id=0,
            schemas=dict(m.schemas),
            current_schema_version=m.current_schema_version,
            key_cols=list(m.key_cols),
            num_buckets=m.num_buckets,
            files=new_files,
            watermarks={k: dict(w) for k, w in (m.watermarks or {}).items()},
            lineage=[
                {
                    "source_id": "clone",
                    "batch_id": v,
                    "rows": sum(f.rows for f in new_files),
                    "note": f"{'shallow' if shallow else 'deep'} clone of "
                    f"{self.root} @ v{v}",
                }
            ],
            parent_version=None,
            properties=props,
        )
        clone._write_manifest(nm)
        return clone

    def set_properties(self, props: dict[str, str | None]) -> Manifest:
        """``ALTER TABLE SET/UNSET TBLPROPERTIES`` — a metadata-only
        commit updating table properties (operational knobs AND the
        ``constraints.*`` contract keys; see lake/merge.py). A value of
        ``None`` UNSETs the key. No data files are touched; readers of
        older snapshots see the older properties. Raises
        ``CommitConflictError`` if a concurrent writer wins the version
        race — metadata-only, so simply re-examine and re-call."""
        m = self.current_manifest()
        merged = dict(m.properties)
        for k, v in props.items():
            if v is None:
                merged.pop(k, None)
            else:
                merged[k] = str(v)
        if merged == m.properties:
            return m  # no-op
        # constraint column names are validated at ALTER time so a typo
        # (or unstripped whitespace) fails HERE with the bad name, not
        # as an unresolved-column analysis error inside every later merge
        nn_val = merged.get("constraints.not_null")
        if nn_val is not None:
            known = {f.name for f in m.schema.fields}
            bad = [
                c.strip() for c in nn_val.split(",")
                if c.strip() and c.strip() not in known
            ]
            if bad:
                raise ValueError(
                    f"constraints.not_null names unknown column(s) {bad}; "
                    f"table columns: {sorted(known)}"
                )
        nm = Manifest(
            version=m.version + 1,
            snapshot_id=m.snapshot_id + 1,
            schemas=m.schemas,
            current_schema_version=m.current_schema_version,
            key_cols=m.key_cols,
            num_buckets=m.num_buckets,
            files=m.files,
            watermarks=m.watermarks,
            lineage=[],
            parent_version=m.version,
            properties=merged,
        )
        self._write_manifest(nm)
        return nm

    # ---------- maintenance ----------
    def orphan_files(self) -> list[str]:
        """Data files on disk not referenced by any manifest (e.g. written
        by a crashed merge before its commit). Safe to delete. Reasons
        over EVERY ref sharing the data directory — the main chain plus
        all live branches — so an unpublished branch's staged files are
        never GC'd out from under an audit.

        Note on chain-walk robustness (the except branch below): an
        expired-but-undeleted delta child of an already-deleted parent
        (crash mid-expire) still names the files it ADDED in its raw
        payload; inherited files are referenced by whichever surviving
        manifests carry them."""
        self._require_main("orphan_files")
        referenced = self._chain_referenced_paths()
        for name in self.branches():
            referenced |= LakeTable(
                self.spark, self.root, ref=name
            )._chain_referenced_paths()
        orphans = []
        for dirpath, _dirnames, filenames in os.walk(self._data_dir):
            for fn in filenames:
                p = os.path.normpath(os.path.join(dirpath, fn))
                if fn.endswith(".parquet") and p not in referenced:
                    orphans.append(p)
        return orphans

    def _stage_marker(self, path: str) -> str:
        """Liveness marker for a staging dir: ``<dir>.pid`` holds the
        writer's pid. ``remove_orphans`` never deletes a staging dir whose
        marker names a live process — a legitimately long-running merge
        (hours at 10^10 rows) cannot have its staged batch GC'd from
        under it. Written BESIDE the dir, not inside: Spark's
        mode('overwrite') clears the dir itself."""
        marker = path + ".pid"
        with open(marker, "w") as fh:
            fh.write(str(os.getpid()))
        return marker

    @staticmethod
    def _marker_pid_alive(marker: str) -> bool:
        try:
            pid = int(open(marker).read().strip())
            os.kill(pid, 0)
            return True
        except (OSError, ValueError) as e:
            # PermissionError ⇒ the pid exists but belongs to another
            # user — conservatively alive
            return isinstance(e, PermissionError)

    def remove_orphans(self, staging_older_than_sec: float = 86400.0) -> int:
        """Delete unreferenced data files AND abandoned staging dirs (a
        crash mid-merge can leave both: staged batch parquet under
        _staging/, written-but-uncommitted bucket files under data/).
        A staging dir is kept while EITHER its ``.pid`` liveness marker
        names a running process (a merge in flight, however long) OR it
        is younger than ``staging_older_than_sec`` (markerless legacy
        dirs; same retention contract as Iceberg's
        remove_orphan_files).

        Data-dir orphans get the SAME age guard: an in-flight merge
        moves its finished bucket files under data/ BEFORE the manifest
        commit, so a young unreferenced file may be a commit-in-progress,
        not garbage — deleting it would let the imminent commit
        reference a missing file. Only files older than the retention
        window are removed (Iceberg's remove_orphan_files makes the
        identical trade)."""
        cutoff = time.time() - staging_older_than_sec
        n = 0
        for p in self.orphan_files():
            try:
                if os.path.getmtime(p) < cutoff:
                    os.remove(p)
                    n += 1
            except OSError:
                continue
        staging = os.path.join(self.root, "_staging")
        if os.path.isdir(staging):
            for d in os.listdir(staging):
                path = os.path.join(staging, d)
                if d.endswith(".pid"):
                    # stale marker whose dir is already gone
                    if not os.path.isdir(path[:-4]) and not self._marker_pid_alive(path):
                        try:
                            os.remove(path)
                        except OSError:
                            pass
                    continue
                marker = path + ".pid"
                if os.path.exists(marker) and self._marker_pid_alive(marker):
                    continue
                try:
                    if os.path.getmtime(path) < cutoff:
                        shutil.rmtree(path, ignore_errors=True)
                        if os.path.exists(marker):
                            os.remove(marker)
                        n += 1
                except OSError:
                    continue
        return n

    @property
    def _pins_dir(self) -> str:
        return os.path.join(self._meta_dir, "pins")

    def pin_version(self, name: str, version: int) -> None:
        """Register ``version`` as a RETENTION ROOT under ``name`` (e.g.
        a TableGroup's consistent-snapshot pin): expire_snapshots keeps
        pinned versions and their data files alive regardless of
        keep_last. Re-pinning under the same name replaces the old pin
        (atomic)."""
        os.makedirs(self._pins_dir, exist_ok=True)
        tmp = os.path.join(self._pins_dir, f".{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(str(int(version)))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(self._pins_dir, f"{name}.pin"))

    def unpin_version(self, name: str) -> None:
        try:
            os.remove(os.path.join(self._pins_dir, f"{name}.pin"))
        except OSError:
            pass

    def pinned_versions(self) -> dict[str, int]:
        out: dict[str, int] = {}
        if os.path.isdir(self._pins_dir):
            for fn in os.listdir(self._pins_dir):
                if fn.endswith(".pin"):
                    try:
                        with open(os.path.join(self._pins_dir, fn)) as fh:
                            out[fn[:-4]] = int(fh.read().strip())
                    except (OSError, ValueError):
                        continue
        return out

    # ---------- tags (named immutable snapshot refs) ----------
    # Iceberg tag semantics: a tag names a snapshot, protects it (and
    # its data files) from expire_snapshots, and is readable by name
    # (read(tag=...)). Implemented over the pin mechanism — a tag IS a
    # retention root — under a reserved name prefix so group pins and
    # branch pins never collide with user tags.
    _TAG_PIN_PREFIX = "tag."

    @staticmethod
    def _check_ref_name(name: str, kind: str) -> None:
        if not name or not all(c.isalnum() or c in "-_." for c in name):
            raise ValueError(
                f"invalid {kind} name {name!r}: use letters, digits, "
                "'-', '_', '.'"
            )

    def tag(self, name: str, version: int | None = None) -> int:
        """Name a snapshot (default: CURRENT). The tagged version and
        its files survive ``expire_snapshots`` until ``untag``."""
        self._check_ref_name(name, "tag")
        v = int(version if version is not None else self.current_version())
        self.manifest_at(v)  # raises if the snapshot is not loadable
        self.pin_version(self._TAG_PIN_PREFIX + name, v)
        return v

    def untag(self, name: str) -> None:
        self.unpin_version(self._TAG_PIN_PREFIX + name)

    def tags(self) -> dict[str, int]:
        p = self._TAG_PIN_PREFIX
        return {
            k[len(p):]: v
            for k, v in self.pinned_versions().items()
            if k.startswith(p)
        }

    def _resolve_tag(self, name: str) -> int:
        v = self.tags().get(name)
        if v is None:
            raise ValueError(f"no tag {name!r} on {self.root}")
        return v

    # ---------- branches (write-audit-publish) ----------
    # The Iceberg branch / WAP pattern: stage commits on an isolated
    # named ref that SHARES the table's data directory but keeps its
    # own manifest chain; audit the branch head (read / read_changes
    # from the fork point); then publish — one atomic main commit that
    # adopts the branch head's files, schema set, and exactly-once
    # watermarks — or drop it, GC'ing the branch-only files. The fork
    # snapshot is pinned on main so retention can never reclaim shared
    # files while the branch lives.

    _BRANCH_PIN_PREFIX = "branch."

    def _require_main(self, op: str) -> None:
        if self.ref is not None:
            raise ValueError(
                f"{op} must run on the main ref, not branch {self.ref!r}"
            )

    def _branch_fork_path(self, name: str) -> str:
        return os.path.join(self._branches_dir, name, "FORK")

    def create_branch(
        self, name: str, version: int | None = None
    ) -> "LakeTable":
        """Fork a branch at ``version`` (default CURRENT) and return a
        handle to it — every table operation (merge_into, read,
        read_changes, rollback_to, compaction) works on the branch and
        is invisible to main readers until ``publish_branch``."""
        self._require_main("create_branch")
        self._check_ref_name(name, "branch")
        bdir = os.path.join(self._branches_dir, name)
        if os.path.exists(os.path.join(bdir, "CURRENT")):
            raise FileExistsError(f"branch {name!r} already exists")
        fork_v = int(
            version if version is not None else self.current_version()
        )
        fm = self.manifest_at(fork_v)  # raises if expired
        # pin the fork on MAIN: expire_snapshots must not reclaim the
        # shared files out from under the branch
        self.pin_version(self._BRANCH_PIN_PREFIX + name, fork_v)
        os.makedirs(bdir, exist_ok=True)
        br = LakeTable(self.spark, self.root, ref=name)
        base = Manifest(
            version=fork_v,
            snapshot_id=fm.snapshot_id,
            schemas=dict(fm.schemas),
            current_schema_version=fm.current_schema_version,
            key_cols=list(fm.key_cols),
            num_buckets=fm.num_buckets,
            files=list(fm.files),
            watermarks={k: dict(v) for k, v in fm.watermarks.items()},
            lineage=list(fm.lineage),
            parent_version=None,  # chain root → serialized FULL
            properties=dict(fm.properties),
        )
        br._write_manifest(base)
        tmp = self._branch_fork_path(name) + f".{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump({"of_version": fork_v, "created_at": time.time()}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._branch_fork_path(name))
        return br

    def branch(self, name: str) -> "LakeTable":
        """Open an existing branch."""
        self._check_ref_name(name, "branch")
        br = LakeTable(self.spark, self.root, ref=name)
        if not os.path.exists(os.path.join(br._meta_dir, "CURRENT")):
            raise ValueError(f"no branch {name!r} on {self.root}")
        return br

    def branches(self) -> dict[str, int]:
        """name → branch head version."""
        out: dict[str, int] = {}
        if os.path.isdir(self._branches_dir):
            for name in os.listdir(self._branches_dir):
                cur = os.path.join(self._branches_dir, name, "CURRENT")
                try:
                    with open(cur) as fh:
                        out[name] = int(fh.read().strip())
                except (OSError, ValueError):
                    continue
        return out

    def branch_fork_version(self, name: str) -> int:
        with open(self._branch_fork_path(name)) as fh:
            return int(json.load(fh)["of_version"])

    def publish_branch(self, name: str) -> Manifest:
        """Fast-forward main to the branch head — ONE atomic commit
        adopting the branch's files, schema set, watermarks (the
        exactly-once fences travel with the data, so a publish-then-
        replay of the staged batches fence-skips), and lineage.
        Requires main unmoved since the fork (the WAP contract: the
        staging pipeline is the only publisher); a moved main raises
        ``CommitConflictError`` — re-branch from CURRENT and replay
        the batches (their fences make that exactly-once), then
        publish again."""
        self._require_main("publish_branch")
        br = self.branch(name)
        head = br.current_manifest()
        fork_v = self.branch_fork_version(name)
        cur = self.current_manifest()
        if head.version == fork_v:
            return cur  # nothing staged — publish is a no-op
        if cur.version != fork_v:
            raise CommitConflictError(
                f"cannot publish branch {name!r}: main moved from the "
                f"fork point (v{fork_v} → v{cur.version}) — re-branch "
                "from CURRENT, replay the staged batches (exactly-once "
                "fences dedupe), and publish the new branch"
            )
        nm = Manifest(
            version=cur.version + 1,
            snapshot_id=max(head.snapshot_id, cur.snapshot_id + 1),
            schemas=dict(head.schemas),
            current_schema_version=head.current_schema_version,
            key_cols=list(head.key_cols),
            num_buckets=head.num_buckets,
            files=list(head.files),
            watermarks={k: dict(v) for k, v in head.watermarks.items()},
            lineage=list(head.lineage)
            + [
                {
                    "batch_id": int(head.version),
                    "source_id": f"publish:{name}",
                    "source_offset_start": int(fork_v),
                    "source_offset_end": int(head.version),
                    "row_counts": {},
                }
            ],
            parent_version=cur.version,
            properties=dict(head.properties),
        )
        self._write_manifest(nm)  # version race → CommitConflictError
        return nm

    def drop_branch(self, name: str, remove_files: bool = True) -> int:
        """Delete a branch and (by default) GC the data files only its
        chain referenced — files shared with main, other branches, or a
        prior publish are untouched. Returns the count removed."""
        self._require_main("drop_branch")
        br = self.branch(name)
        removed = 0
        if remove_files:
            mine = br._chain_referenced_paths()
            keep = self._chain_referenced_paths()
            for other in self.branches():
                if other != name:
                    keep |= LakeTable(
                        self.spark, self.root, ref=other
                    )._chain_referenced_paths()
            for p in sorted(mine - keep):
                try:
                    os.remove(p)
                    removed += 1
                except OSError:
                    pass
        import shutil as _shutil

        _shutil.rmtree(os.path.join(self._branches_dir, name), ignore_errors=True)
        self.unpin_version(self._BRANCH_PIN_PREFIX + name)
        return removed

    def _chain_referenced_paths(self) -> set[str]:
        """Every data-file path referenced by any manifest of THIS
        ref's chain (normalized absolute)."""
        referenced: set[str] = set()
        for v in self._all_versions():
            try:
                files = self.manifest_at(v).files
            except OSError:
                with open(self._manifest_path(v)) as fh:
                    raw = json.load(fh)
                files = [
                    DataFile.from_json(x)
                    for x in raw.get("delta", {}).get("added_files", [])
                ]
            for f in files:
                referenced.add(
                    os.path.normpath(os.path.join(self.root, f.path))
                )
        return referenced

    def expire_snapshots(
        self, keep_last: int = 1, older_than_sec: float | None = None
    ) -> int:
        """Drop manifests older than the last ``keep_last`` and delete data
        files only they referenced. Time travel to expired versions stops
        working (same contract as Iceberg's expire_snapshots). Lineage
        records of expired manifests are folded into the append-only
        archive FIRST (fsync'd before any manifest deletion), so ingest
        history survives retention. PINNED versions (``pin_version`` —
        e.g. a TableGroup's consistent snapshot) are retention roots:
        they, and the data files they reference, survive regardless of
        ``keep_last``; pinned delta-form manifests are materialized to
        full first so they stay loadable after their parents expire.

        ``older_than_sec`` adds Iceberg's age guard: a version expires
        only when it is BOTH beyond the last ``keep_last`` AND committed
        more than that many seconds ago — "expire snapshots older than
        T, retaining at least N" — so an aggressive keep_last cannot
        eat the time-travel window a reader SLA depends on.

        Main-ref only: a branch shares the data directory, and a
        branch-local expiry could delete files the main chain still
        references — branches are short-lived staging refs (WAP), drop
        or publish them instead of expiring inside them."""
        self._require_main("expire_snapshots")
        versions = self._all_versions()
        if len(versions) <= keep_last:
            return 0
        keep = set(versions[-keep_last:])
        if older_than_sec is not None:
            cutoff = time.time() - older_than_sec
            for v in versions:
                if v in keep:
                    continue
                # raw JSON read: committed_at is never behind delta
                # resolution, so this stays O(versions) metadata reads
                try:
                    with open(self._manifest_path(v)) as fh:
                        if float(json.load(fh).get("committed_at", 0.0)) > cutoff:
                            keep.add(v)
                except (OSError, ValueError):
                    continue  # unreadable manifest: let the normal path decide
        # pinned versions (TableGroup snapshots etc.) are retention
        # roots — the re-root loop below materializes any of them whose
        # parent chain is expiring
        keep |= {v for v in self.pinned_versions().values() if v in set(versions)}
        keep_files: set[str] = set()
        for v in sorted(keep):
            try:
                files = self.manifest_at(v).files
            except OSError:
                if v == versions[-1]:
                    raise  # CURRENT unresolvable = corruption, stop here
                # a crash-orphaned delta child (parent deleted by an
                # interrupted prior run) cannot be kept — nothing can
                # resolve it; let the deletion loop clear it
                keep.discard(v)
                continue
            for f in files:
                keep_files.add(f.path)
        # archive lineage from RAW manifest JSON: lineage/snapshot_id are
        # not behind delta resolution, so this works even for an expired
        # child whose parent a crashed prior run already deleted. Dedupe
        # against already-archived snapshot ids — a crash between the
        # archive fsync and the deletions must not double-write history
        # on the idempotent re-run.
        already: set[int] = set()
        if os.path.exists(self._lineage_archive_path):
            with open(self._lineage_archive_path) as fh:
                for line in fh:
                    try:
                        already.add(int(json.loads(line)["snapshot_id"]))
                    except (ValueError, KeyError):
                        continue
        archived = []
        for v in versions:
            if v in keep:
                continue
            with open(self._manifest_path(v)) as fh:
                raw = json.load(fh)
            if int(raw["snapshot_id"]) in already:
                continue
            for entry in raw.get("lineage", []):
                archived.append(
                    {**entry, "snapshot_id": raw["snapshot_id"],
                     "committed_at": raw.get("committed_at", 0.0)}
                )
        if archived:
            with open(self._lineage_archive_path, "a") as fh:
                for rec in archived:
                    fh.write(json.dumps(rec) + "\n")
                fh.flush()
                os.fsync(fh.fileno())
        # re-root every kept manifest whose parent is expiring, BEFORE
        # deleting anything it depends on: with delta-form manifests the
        # kept chain resolves through expired parents, so a crash after
        # the removals but before this rewrite would leave CURRENT (or a
        # pin) unloadable — a failure mode full-form manifests did not
        # have. With pins the kept set can be non-contiguous, so this is
        # a loop, not just the window's oldest. Each rewrite is ATOMIC
        # (temp file + os.replace over the original) and materializes
        # the FULL file list; a crash anywhere after it leaves the kept
        # manifests self-contained and the expired ones intact for an
        # idempotent re-run. (_write_manifest is unusable here — its
        # O_EXCL create-new semantics would force an unsafe delete.)
        for v in sorted(keep):
            om = self.manifest_at(v)
            if om.parent_version is not None and om.parent_version not in keep:
                om.parent_version = None
                path = self._manifest_path(v)
                tmp = os.path.join(self._meta_dir, f".reroot.{uuid.uuid4().hex}")
                with open(tmp, "w") as fh:
                    json.dump(om.to_json(), fh)
                    fh.flush()
                    os.fsync(fh.fileno())
                os.replace(tmp, path)
        removed = 0
        # delete NEWEST-FIRST: a delta-form manifest resolves through
        # its (earlier-version) parent, so children must go before
        # parents — a crash mid-loop then leaves every surviving
        # manifest still resolvable and the re-run idempotent. An
        # unresolvable child (legacy crash state from the old
        # oldest-first order) is handled by falling back to its raw
        # delta payload: the files IT added are deletion candidates;
        # inherited ones were the deleted parent's responsibility.
        for v in sorted((v for v in versions if v not in keep), reverse=True):
            try:
                files = self.manifest_at(v).files
            except OSError:
                with open(self._manifest_path(v)) as fh:
                    raw = json.load(fh)
                files = [
                    DataFile.from_json(x)
                    for x in raw.get("delta", {}).get("added_files", [])
                ]
            for f in files:
                if f.path not in keep_files:
                    p = os.path.join(self.root, f.path)
                    # NEVER delete outside the table root: a shallow
                    # clone references its source's data files via
                    # `../` paths — those belong to the SOURCE table's
                    # retention (held there by the clone's pin), and a
                    # clone-side expiry deleting them would corrupt the
                    # source (the Delta shallow-clone VACUUM hazard,
                    # closed by construction here)
                    if not os.path.abspath(p).startswith(
                        os.path.abspath(self.root) + os.sep
                    ):
                        continue
                    if os.path.exists(p):
                        os.remove(p)
                        removed += 1
            os.remove(self._manifest_path(v))
            with self._cache_lock:
                self._manifest_cache.pop(v, None)
        return removed

    def maintain(
        self,
        tombstone_horizon_seq: int | None = None,
        max_files_per_bucket: int | None = None,
        keep_snapshots: int | None = None,
        snapshot_age_sec: float | None = None,
        remove_orphan_files: bool = True,
    ) -> dict[str, int]:
        """One-call housekeeping — the maintenance pass an operator (or
        a scheduler) runs between ingest windows, each step manifest- or
        stats-pruned so a healthy table is a near-no-op:

        1. fold overgrown buckets (MOR deltas + broadcast file pairs)
           past ``max_files_per_bucket`` (default: table property
           "compact.max_files_per_bucket" or 8);
        2. purge tombstones below ``tombstone_horizon_seq`` (skipped
           when None — the horizon is the SOURCE's watermark contract,
           the engine cannot guess it);
        3. expire snapshots beyond ``keep_snapshots`` (skipped when
           None; lineage is archived first; ``snapshot_age_sec`` adds
           the expire-older-than age guard);
        4. GC unreferenced data files and dead staging dirs (age- and
           liveness-guarded).

        Returns per-step counts for observability. Main-ref only (the
        retention steps reason over the shared data directory);
        branches are short-lived — publish or drop them instead."""
        self._require_main("maintain")
        report: dict[str, int] = {}
        if max_files_per_bucket is None:
            max_files_per_bucket = int(
                self.current_manifest().properties.get(
                    "compact.max_files_per_bucket", 8
                )
                or 0
            )
        if max_files_per_bucket:
            overgrown = self.overgrown_buckets(max_files_per_bucket)
            if overgrown:
                self.compact_buckets(overgrown)
            report["compacted_buckets"] = len(overgrown)
        if tombstone_horizon_seq is not None:
            before = self.current_version()
            self.purge_tombstones(tombstone_horizon_seq)
            report["tombstone_purge_committed"] = int(
                self.current_version() != before
            )
        if keep_snapshots is not None:
            report["expired_data_files"] = self.expire_snapshots(
                keep_last=keep_snapshots, older_than_sec=snapshot_age_sec
            )
        if remove_orphan_files:
            report["orphans_removed"] = self.remove_orphans()
        return report

    def _all_versions(self) -> list[int]:
        out = []
        for fn in os.listdir(self._meta_dir):
            if fn.endswith(".manifest.json"):
                out.append(int(fn[1:].split(".")[0]))
        return sorted(out)

    def rebucket(self, new_num_buckets: int) -> "Manifest":
        """Change the bucket count — THE growth maintenance op for this
        format. Copy-on-write keeps at most one file per bucket, so the
        small-file compaction other formats need does not apply here;
        what must evolve instead is bucket granularity: at 10^10 rows a
        32-bucket layout means multi-TB rewrites per touched bucket, so
        operators double the bucket count as the table grows (same role
        as Iceberg's bucket-transform spec evolution). Full one-time
        rewrite, atomically committed; fences/lineage carry over."""
        m = self.current_manifest()
        if new_num_buckets == m.num_buckets:
            return m
        df = self.read(include_tombstones=True, include_internal=True).withColumn(
            BUCKET_COL, bucket_expr(m.key_cols, new_num_buckets)
        )
        nm = Manifest(
            version=m.version + 1,
            snapshot_id=m.snapshot_id + 1,
            schemas=m.schemas,
            current_schema_version=m.current_schema_version,
            key_cols=m.key_cols,
            num_buckets=new_num_buckets,
            files=[],
            watermarks=m.watermarks,
            lineage=[],
            parent_version=m.version,
            properties=m.properties,
        )
        # _stage_write consults current_manifest().num_buckets for
        # routing; write with an explicit override instead
        new_files = self._stage_write(df, m.current_schema_version, num_buckets=new_num_buckets)
        nm.files = new_files
        self._write_manifest(nm)
        return nm

    def maybe_rebucket(
        self,
        target_bucket_bytes: int | None = None,
        growth_factor: int = 2,
    ) -> "Manifest":
        """Auto bucket-count evolution: when the average bucket exceeds
        ``target_bucket_bytes`` (param or table property
        "rebucket.target_bucket_bytes"; 0/absent = manual-only), grow the
        bucket count by the smallest power of ``growth_factor`` that
        brings it back under target, via one atomic ``rebucket``. The
        operator-side answer to table growth: at 10^10 rows a stale
        bucket count means multi-GB rewrites per touched bucket, so
        maintenance doubles granularity as volume crosses thresholds
        (the same role as Iceberg bucket-transform spec evolution).
        Decision inputs are manifest stats only — no Spark job unless a
        rewrite actually runs."""
        import math

        m = self.current_manifest()
        target = target_bucket_bytes or int(
            m.properties.get("rebucket.target_bucket_bytes", 0) or 0
        )
        if not target:
            return m
        per_bucket = sum(f.bytes for f in m.files) / max(m.num_buckets, 1)
        if per_bucket <= target:
            return m
        steps = max(1, math.ceil(math.log(per_bucket / target, growth_factor)))
        return self.rebucket(m.num_buckets * growth_factor**steps)

    def compact_buckets(self, buckets: Iterable[int]) -> "Manifest":
        """Rewrite the named buckets as one fresh base file each —
        manifest-pruned: no other bucket is read or written. Folds MOR
        delta files (the read-path max_by performs the fold) AND collapses
        multi-file buckets (e.g. the broadcast merge's survivors+winners
        file pairs) back to O(1) files/bucket."""
        m = self.current_manifest()
        dirty = sorted(set(buckets))
        if not dirty:
            return m
        df = self.read(
            buckets=dirty, include_tombstones=True, include_internal=True
        ).withColumn(BUCKET_COL, bucket_expr(m.key_cols, m.num_buckets))
        new_files = self._stage_write(df, m.current_schema_version)
        keep = [f for f in m.files if f.bucket not in set(dirty)]
        nm = Manifest(
            version=m.version + 1,
            snapshot_id=m.snapshot_id + 1,
            schemas=m.schemas,
            current_schema_version=m.current_schema_version,
            key_cols=m.key_cols,
            num_buckets=m.num_buckets,
            files=keep + new_files,
            watermarks=m.watermarks,
            lineage=[],
            parent_version=m.version,
            properties=m.properties,
        )
        self._write_manifest(nm)
        return nm

    def compact_deltas(self, buckets: Iterable[int] | None = None) -> "Manifest":
        """Fold merge-on-read delta files into their buckets' base files.
        Only buckets holding deltas are rewritten (manifest-pruned);
        ``buckets`` narrows further — the per-bucket auto-compaction
        trigger passes exactly the buckets over threshold, so one hot
        bucket never forces a whole-table rewrite."""
        m = self.current_manifest()
        dirty = {f.bucket for f in m.files if f.is_delta}
        if buckets is not None:
            dirty &= set(buckets)
        return self.compact_buckets(dirty)

    def overgrown_buckets(self, max_files: int) -> list[int]:
        """Buckets whose file count exceeds ``max_files`` in the current
        manifest — driver-side metadata only. The file-growth bound for
        append-shaped write paths (MOR deltas, broadcast-merge pairs)."""
        m = self.current_manifest()
        counts: dict[int, int] = {}
        for f in m.files:
            counts[f.bucket] = counts.get(f.bucket, 0) + 1
        return sorted(b for b, c in counts.items() if c > max_files)

    def rollback_to(self, version: int) -> "Manifest":
        """Roll the table back to an earlier snapshot by committing a
        NEW version whose content equals the target's — Iceberg's
        ``rollback_to_snapshot`` semantics (history stays monotone and
        append-only; the bad versions remain inspectable until snapshot
        expiry reclaims them). Incident recovery for a CDC sink: a bad
        batch landed, roll back, replay.

        Everything data-shaped comes from the TARGET manifest: files,
        the schema set and current schema version (rollback undoes a
        schema evolution — the restored files were written under the
        old schema), key columns and bucket count (rollback undoes a
        ``rebucket``), and — the CDC-critical half — the WATERMARKS:
        the exactly-once fences revert with the data, so re-tailing the
        source replays every batch after the target and the fences
        admit them. Recovery is literally rollback + replay. Table
        PROPERTIES stay at their current values (operational knobs, not
        data). The commit records a lineage row
        (``source_id="rollback"``, ``batch_id=<target version>``) so
        ``lineage_df()`` shows the intervention.

        Raises ``ValueError`` if the target snapshot (or any data file
        it references) has been expired, and ``CommitConflictError`` if
        a concurrent writer wins the version race — re-examine state
        and re-call; rollback is rewrite-shaped, never auto-rebased."""
        cur = self.current_manifest()
        if version == cur.version:
            return cur
        if version > cur.version:
            raise ValueError(
                f"cannot roll forward: target {version} is newer than "
                f"CURRENT {cur.version}"
            )
        try:
            target = self.manifest_at(version)
        except OSError as e:
            raise ValueError(
                f"version {version} of {self.root} is not loadable — "
                "expired by snapshot retention? (expire_snapshots keeps "
                "only recent and pinned versions)"
            ) from e
        missing = [
            f.path
            for f in target.files
            if not os.path.exists(os.path.join(self.root, f.path))
        ]
        if missing:
            raise ValueError(
                f"cannot roll {self.root} back to {version}: "
                f"{len(missing)} data file(s) it references were "
                f"reclaimed by expiry (first: {missing[0]})"
            )
        nm = Manifest(
            version=cur.version + 1,
            snapshot_id=cur.snapshot_id + 1,
            schemas=dict(target.schemas),
            current_schema_version=target.current_schema_version,
            key_cols=list(target.key_cols),
            num_buckets=target.num_buckets,
            files=list(target.files),
            watermarks={k: dict(v) for k, v in target.watermarks.items()},
            lineage=[
                {
                    "batch_id": int(version),
                    "source_id": "rollback",
                    "source_offset_start": -1,
                    "source_offset_end": -1,
                    "row_counts": {},
                }
            ],
            parent_version=cur.version,
            properties=cur.properties,
        )
        self._write_manifest(nm)
        return nm

    @staticmethod
    def _utc_key_value(v: Any) -> Any:
        """Normalize a lookup key value for hashing/comparison: naive
        datetimes are DRIVER-LOCAL wall time → re-express in UTC.

        Driver-local (not session-timezone) because that is what
        PySpark's Row path hands back: ``TimestampType.fromInternal``
        converts instants with ``datetime.fromtimestamp`` (process
        timezone), so ``lookup(row_from_collect)`` round-trips exactly.
        ``astimezone`` on a naive value applies precisely that rule."""
        if isinstance(v, _dt.datetime):
            return v.astimezone(_dt.timezone.utc)
        return v

    def lookup(
        self, key: dict[str, Any], version: int | None = None,
        include_tombstone: bool = False, as_of=None,
    ) -> dict[str, Any] | None:
        """Driver-side POINT READ — zero Spark jobs.

        The Python Murmur3 twin (``lake/hashing.py``, bit-identical to
        ``bucket_expr``) names the ONE bucket that can hold the key;
        manifest ``col_stats`` prune that bucket's files where the key
        columns are clustered; the surviving files MOR-resolve in the
        same pyarrow kernel the DataSource reader uses. At 10^10 rows a
        lookup costs one bucket's pruned file set, not a cluster job —
        the ops tool for "what does the table say about THIS key right
        now / at version v / as of time T" (``as_of`` resolves via
        ``version_as_of``). Returns the resolved row as a dict
        (internal columns included), or None; ``include_tombstone``
        surfaces a deleted key's tombstone row instead of None.

        NAIVE datetime key values are interpreted as DRIVER-LOCAL wall
        time (PySpark's ``Row``/collect rule — ``fromInternal`` uses
        the process timezone) and normalized to UTC before hashing and
        comparison, so ``lookup(row_from_collect)`` finds the row on
        non-UTC drivers too."""
        from .datasource import _arrow_schema, _resolve_bucket
        from .hashing import bucket_of

        if as_of is not None:
            if version is not None:
                raise ValueError("pass either version or as_of, not both")
            version = self.version_as_of(as_of)
        m = self.manifest_at(
            version if version is not None else self.current_version()
        )
        missing = [k for k in m.key_cols if k not in key]
        if missing:
            raise ValueError(f"lookup needs every key column; missing {missing}")
        dtypes = [m.schema[k].dataType for k in m.key_cols]
        values = [self._utc_key_value(key[k]) for k in m.key_cols]
        bucket = bucket_of(values, dtypes, m.num_buckets)
        key_set = set(m.key_cols)
        files = []
        from .bloom import bloom_may_contain

        for f in m.files:
            if f.bucket != bucket:
                continue
            cs = ((f.stats or {}).get("col_stats") or {})
            blooms = ((f.stats or {}).get("blooms") or {})
            skip = False
            for k, v in zip(m.key_cols, values):
                rng = cs.get(k)
                if rng is not None and v is not None:
                    try:
                        if v < rng[0] or v > rng[1]:
                            skip = True  # key col: per-file safe prune
                            break
                    except TypeError:
                        pass
                if v is not None and not bloom_may_contain(blooms.get(k), v):
                    skip = True  # bloom says the key is definitely absent
                    break
            if not skip:
                files.append({"path": f.path, "is_delta": f.is_delta})
        if not files:
            return None
        pdf = _resolve_bucket(
            self.root, files, _arrow_schema(m.schema), m.key_cols,
            keep_tombstones=include_tombstone,
        )
        for k, v in zip(m.key_cols, values):
            pdf = pdf[pdf[k] == v] if v is not None else pdf[pdf[k].isna()]
        if not len(pdf):
            return None
        return {c: pdf.iloc[0][c] for c in pdf.columns}

    def purge_tombstones(self, min_seq: int) -> "Manifest":
        """GC tombstone rows whose seq is below ``min_seq`` — safe once
        the source guarantees no event below that horizon can still
        arrive (the streaming watermark contract).

        Two-level pruning: (1) the manifest's per-file footer stats name
        the CANDIDATE buckets driver-side — a file can hold an expired
        tombstone only if it has tombstones at all and its min seq is
        below the horizon (stats-less legacy files are conservative
        candidates); no Spark job runs when no file qualifies. (2) a
        scan of only the candidate buckets finds the exactly-dirty ones,
        which are then rewritten. At 10^10 rows with a moving watermark
        the steady state is "few recent buckets qualify", not a full
        table scan per purge."""
        m = self.current_manifest()
        cand: set[int] = set()
        for f in m.files:
            st = f.stats
            if not isinstance(st, dict):
                cand.add(f.bucket)  # pre-stats file: could hold anything
            elif st.get("has_tombstones") and (
                st.get("min_seq") is None or int(st["min_seq"]) < min_seq
            ):
                cand.add(f.bucket)
        if not cand:
            return m
        scoped = self.read(
            buckets=sorted(cand), include_tombstones=True, include_internal=True
        )
        expired = scoped.filter(
            F.col(DELETED_COL) & (F.coalesce(F.col(SEQ_COL), F.lit(-1)) < min_seq)
        ).withColumn(BUCKET_COL, bucket_expr(m.key_cols, m.num_buckets))
        dirty = sorted(r[0] for r in expired.select(BUCKET_COL).distinct().collect())
        if not dirty:
            return m
        kept_rows = self.read(
            buckets=dirty, include_tombstones=True, include_internal=True
        ).filter(
            ~(F.col(DELETED_COL) & (F.coalesce(F.col(SEQ_COL), F.lit(-1)) < min_seq))
        ).withColumn(BUCKET_COL, bucket_expr(m.key_cols, m.num_buckets))
        new_files = self._stage_write(kept_rows, m.current_schema_version)
        keep = [f for f in m.files if f.bucket not in set(dirty)]
        nm = Manifest(
            version=m.version + 1,
            snapshot_id=m.snapshot_id + 1,
            schemas=m.schemas,
            current_schema_version=m.current_schema_version,
            key_cols=m.key_cols,
            num_buckets=m.num_buckets,
            files=keep + new_files,
            watermarks=m.watermarks,
            lineage=[],
            parent_version=m.version,
            properties=m.properties,
        )
        self._write_manifest(nm)
        return nm
