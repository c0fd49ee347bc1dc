"""Spark-native DataSource adapters for the lake format (PySpark 4
Python DataSource API).

Two formats, registered via :func:`register_lake_sources`:

* ``lake`` — batch snapshot reads through the STANDARD reader API::

      spark.read.format("lake").option("version", 7).load(root)

  Time-travel (``version`` / ``tag`` / ``timestampAsOf`` — epoch
  seconds or ISO-8601, Delta's option name), branch refs (``branch``), and
  bucket-parallel scan: one input partition per hash bucket, each task
  resolving its bucket's merge-on-read state in pure pyarrow (no
  nested Spark job — DataSource readers cannot launch one). FILTER
  PUSHDOWN (``DataSourceReader.pushFilters``, Spark 4.1): key-column
  equality/IN conjuncts route to their hash bucket(s) via the Python
  Murmur3 twin (``lake/hashing.py``) — a point predicate scans ONE
  bucket, not all of them — and manifest ``col_stats`` prune files
  under the same key-vs-mutable safety rules as ``LakeTable.read``
  (mutable-column conditions prune whole buckets only, never single
  files of a delta-holding bucket, so merge-on-read resolution can
  never resurrect a stale base row). Pruning only: every filter is
  returned to Spark for row-level evaluation on the surviving files.
  Requires ``spark.sql.python.filterPushdown.enabled=true`` —
  :func:`register_lake_sources` sets it.

* ``lake_changes`` — the changelog as BOTH a streaming source and a
  batch read (the Delta CDF / Iceberg incremental-scan analogue,
  surfaced natively rather than only through this repo's batch-driven
  ``ChangeFeedFollower``)::

      spark.readStream.format("lake_changes")
           .option("startingVersion", 0).load(root)

      spark.read.format("lake_changes")                 # batch: the
           .option("startingVersion", 3)                # CDF
           .option("endingVersion", 7).load(root)       # table_changes
                                                        # shape

  Offsets ARE table versions — the same strictly-monotone integers the
  exactly-once merge fences use — so a checkpointed stream resumes from
  the precise snapshot it last consumed and replays deterministically
  (manifests and data files are immutable). Each micro-batch covers a
  version span ``(from, to]``; input partitions are the span's CHANGED
  BUCKETS (``LakeTable.changed_buckets`` — a driver-side manifest diff,
  KB of JSON), so per-batch work is proportional to the change set,
  not the table: the scale property that makes tailing a 10^10-row
  table viable. Within a partition the old/new bucket states are
  MOR-resolved and diffed columnar in pyarrow/pandas (Arrow batches in,
  Arrow batches out — never per-row Python over the hot columns).

Semantics match ``LakeTable.read_changes`` (parity test-pinned): one
row per key whose state differs across the span, ``_change_type`` ∈
insert/update/delete, the NEW payload (old for deletes), ``_seq``
carried for downstream ordering. Like Delta's streaming source, the
schema is PINNED when the stream starts: columns added later are
invisible until restart, and a span that crosses a REBUCKET boundary
(bucket ids not comparable across layouts) fails with an explicit
resync error instead of guessing.

Reference behavior covered: the staged-vs-live diff consumed as a
stream (ingest-processed-data.yaml:86-116) without re-deriving it per
poll, and the idempotent-resume contract (ingest lineage,
ingest-processed-data.yaml:10-11) expressed as Spark's own offset
checkpointing.
"""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass, field
from typing import Any, Iterator, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from .hashing import bucket_of
from .table import BUCKET_COL, DELETED_COL, SEQ_COL, DataFile, LakeTable

CHANGE_COL = "_change_type"
LAKE_FORMAT = "lake"
LAKE_CHANGES_FORMAT = "lake_changes"
#: transient column marking delta-vs-base provenance during resolution
_MOR_FLAG = "_mor_delta"
_MOR_PRI = "_mor_pri"  # real-over-dml tie-break, see DataFile.dml


def register_lake_sources(spark) -> None:
    """Register both formats on a SparkSession (idempotent).

    Also enables ``spark.sql.python.filterPushdown.enabled``: Spark 4.1
    HARD-FAILS any Python reader that implements ``pushFilters`` while
    the conf is false, and the ``lake`` reader's bucket/file pruning is
    a pushFilters implementation."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakeDataSource)
    spark.dataSource.register(LakeChangesDataSource)


# --------------------------------------------------------------------
# schema plumbing
# --------------------------------------------------------------------

def _arrow_schema(st: T.StructType) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(st)


def changelog_schema(table_schema: T.StructType, key_cols: list[str]) -> T.StructType:
    """The stream's output schema — same column order as
    ``LakeTable.read_changes``: keys, ``_change_type``, payload, ``_seq``."""
    by = {f.name: f for f in table_schema.fields}
    fields = [by[k] for k in key_cols]
    fields.append(T.StructField(CHANGE_COL, T.StringType(), False))
    fields.extend(
        f for f in table_schema.fields
        if f.name not in key_cols and f.name not in (SEQ_COL, DELETED_COL)
    )
    fields.append(T.StructField(SEQ_COL, T.LongType(), True))
    return T.StructType(fields)


def _read_schema_from_stream_schema(stream_schema: T.StructType) -> T.StructType:
    """Invert :func:`changelog_schema`: the file-read target schema
    (payload + internal cols) implied by the stream's pinned schema."""
    fields = [f for f in stream_schema.fields if f.name != CHANGE_COL]
    names = {f.name for f in fields}
    if SEQ_COL not in names:
        fields.append(T.StructField(SEQ_COL, T.LongType(), True))
    if DELETED_COL not in names:
        fields.append(T.StructField(DELETED_COL, T.BooleanType(), True))
    return T.StructType(fields)


# --------------------------------------------------------------------
# pyarrow kernels (run inside DataSource read tasks — no Spark access)
# --------------------------------------------------------------------

def _aligned(tbl: pa.Table, target: pa.Schema) -> pa.Table:
    """Project/cast a file's table to the target schema: null-fill
    columns the file predates, widen-cast evolved columns, drop columns
    newer than the pinned schema — the Arrow twin of
    ``lake.evolution.align_to_schema`` for top-level (added/widened
    column) evolution, which is the lake's evolution contract."""
    n = len(tbl)
    have = set(tbl.schema.names)
    cols = []
    for f in target:
        if f.name in have:
            c = tbl.column(f.name)
            if c.type != f.type:
                c = c.cast(f.type)
        else:
            c = pa.nulls(n, f.type)
        cols.append(c)
    return pa.Table.from_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols], schema=target)


def _resolve_bucket(
    root: str,
    files: list[dict],
    target: pa.Schema,
    key_cols: list[str],
    keep_tombstones: bool = False,
) -> pd.DataFrame:
    """One bucket's LIVE state at a snapshot: read its files, align to
    the target schema, last-writer-wins MOR resolution ordered by
    ``(coalesce(_seq,-1), delta-over-base)`` (the same whole-row rule as
    ``LakeTable.read``), drop tombstones (unless ``keep_tombstones`` —
    the point-lookup inspection path)."""
    if not files:
        return target.empty_table().to_pandas()
    any_delta = any(f["is_delta"] for f in files)
    parts = []
    for f in files:
        t = _aligned(pq.read_table(os.path.join(root, f["path"])), target)
        if any_delta:
            t = t.append_column(
                _MOR_FLAG,
                pa.array(np.full(len(t), 1 if f["is_delta"] else 0, dtype=np.int8)),
            )
            # real CDC rows (1) beat DML-minted rows (0) on an exact
            # (seq, delta) tie — same rule as LakeTable.read
            t = t.append_column(
                _MOR_PRI,
                pa.array(np.full(len(t), 0 if f.get("dml") else 1, dtype=np.int8)),
            )
        parts.append(t)
    pdf = pa.concat_tables(parts).to_pandas(use_threads=False)
    if any_delta:
        order = pdf[SEQ_COL].fillna(-1)
        pdf = (
            pdf.assign(_ord=order)
            .sort_values(["_ord", _MOR_FLAG, _MOR_PRI], kind="stable")
            .drop_duplicates(subset=key_cols, keep="last")
            .drop(columns=["_ord", _MOR_FLAG, _MOR_PRI])
        )
    if not keep_tombstones and DELETED_COL in pdf.columns:
        dead = pdf[DELETED_COL].astype(object).map(lambda v: bool(v) if v is not None and v == v else False)
        pdf = pdf[~dead.astype(bool)]
    return pdf.reset_index(drop=True)


def _canon(v: Any) -> Any:
    """Canonicalize a nested value for null-safe comparison: arrays and
    lists → tuples, dicts/maps → key-sorted tuples (the pandas twin of
    ``read_changes``' key-sorted ``map_entries`` comparison), NaN → a
    marker so NaN equals NaN (Spark's eqNullSafe ordering semantics)."""
    if isinstance(v, np.ndarray):
        return tuple(_canon(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, float) and v != v:
        return ("__nan__",)
    return v


def _col_eq(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Vectorized null-safe equality; object columns (nested types)
    compare canonicalized."""
    if a.dtype == object or b.dtype == object:
        ca = a.map(_canon, na_action=None)
        cb = b.map(_canon, na_action=None)
        eq = np.array([x == y for x, y in zip(ca, cb)], dtype=bool)
        both_null = np.array(
            [x is None and y is None for x, y in zip(ca, cb)], dtype=bool
        )
        return eq | both_null
    eq = (a == b).to_numpy(dtype=bool, na_value=False)
    both_null = (a.isna() & b.isna()).to_numpy(dtype=bool)
    return eq | both_null


def _to_arrow(pdf: pd.DataFrame, out: pa.Schema) -> pa.Table:
    arrays = []
    for f in out:
        s = pdf[f.name]
        if s.dtype == object:
            # normalize ndarray elements so arrow sees plain lists
            s = s.map(
                lambda v: v.tolist() if isinstance(v, np.ndarray) else v,
                na_action=None,
            )
        arrays.append(pa.array(s, type=f.type, from_pandas=True))
    return pa.Table.from_arrays(arrays, schema=out)


def _diff_bucket(
    old: pd.DataFrame,
    new: pd.DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    out: pa.Schema,
) -> pa.Table:
    """Per-key diff of two resolved bucket states → changelog rows
    matching ``read_changes``: comparison covers payload AND ``_seq``
    (a row rewritten at a new seq classifies update, exactly like the
    Spark path's struct comparison); payload = new row, old for deletes."""
    cmp_cols = payload_cols + [SEQ_COL]
    j = old.merge(
        new, on=key_cols, how="outer", suffixes=("_o", "_n"), indicator=True
    )
    merge_flag = j["_merge"].to_numpy()
    is_ins = merge_flag == "right_only"
    is_del = merge_flag == "left_only"
    eq = np.ones(len(j), dtype=bool)
    for c in cmp_cols:
        eq &= _col_eq(j[c + "_o"], j[c + "_n"])
    change = np.where(
        is_ins, "insert", np.where(is_del, "delete", np.where(~eq, "update", ""))
    )
    keep = change != ""
    data: dict[str, Any] = {k: j[k][keep] for k in key_cols}
    data[CHANGE_COL] = pd.Series(change[keep], index=j.index[keep])
    for c in cmp_cols:
        data[c] = j[c + "_n"].where(~pd.Series(is_del, index=j.index), j[c + "_o"])[keep]
    return _to_arrow(pd.DataFrame(data), out)


# --------------------------------------------------------------------
# partitions
# --------------------------------------------------------------------

@dataclass
class DiffTaskPartition(InputPartition):
    """One changelog task: a list of whole-bucket diff groups
    (``{"bucket", "old_files", "new_files"}``) — a bucket's diff is
    atomic (MOR resolution is bucket-wide), but SMALL buckets pack
    many-per-task so a trickle span over a wide table doesn't spawn
    thousands of micro-tasks."""

    root: str
    groups: list = field(default_factory=list)


@dataclass
class ScanTaskPartition(InputPartition):
    """One snapshot-scan task: a list of scan groups
    (``{"bucket", "files"}``). A delta-holding bucket is one atomic
    group (resolution is bucket-wide); a bucket with no deltas splits
    per FILE (its live files never share a key — COW rewrites are
    whole-bucket and one commit's files are key-disjoint — and
    resolution over such a group is a plain concat + tombstone drop),
    so scan parallelism is bounded by files, not buckets."""

    root: str
    groups: list = field(default_factory=list)


def _file_payload(f) -> dict:
    return {"path": f.path, "is_delta": f.is_delta}


#: floor cost per scan unit when bin-packing (Spark's
#: spark.sql.files.openCostInBytes default) — keeps a pack of
#: thousands of tiny units from collapsing into one task
_OPEN_COST_BYTES = 4 << 20


def _bin_pack(units: list[tuple[int, dict]], max_bytes: int | None) -> list[list[dict]]:
    """First-fit-decreasing pack of ``(bytes, group)`` units into bins
    of at most ``max_bytes`` (each unit costs at least
    ``_OPEN_COST_BYTES``; an oversized unit gets its own bin).
    ``max_bytes=None`` = no packing: one bin per unit (maximum
    parallelism — the default; packing is the operator's knob for
    wide-table trickle spans)."""
    if max_bytes is None:
        return [[g] for _, g in units]
    sized = sorted(
        ((max(b, _OPEN_COST_BYTES), g) for b, g in units),
        key=lambda x: -x[0],
    )
    bins: list[list[dict]] = []
    room: list[int] = []
    for b, g in sized:
        for i in range(len(bins)):
            if room[i] >= b:
                bins[i].append(g)
                room[i] -= b
                break
        else:
            bins.append([g])
            room.append(max_bytes - b)
    return bins


# --------------------------------------------------------------------
# filter-pushdown pruning (driver-side, manifest metadata only)
# --------------------------------------------------------------------

#: candidate-set size cap for key→bucket routing (cross product of the
#: key columns' IN lists); beyond it the hash cost stops being free
_BUCKET_ROUTE_CAP = 256


def _extract_constraints(filters, cols: set[str]) -> dict[str, dict]:
    """Per-column pruning constraints from AND-composed Spark filters.

    Returns {col: {"cands": set|None, "lo": (v, incl)|None,
    "hi": (v, incl)|None}} over TOP-LEVEL columns only. ``cands`` is the
    finite candidate set from EqualTo/In conjuncts (intersected; null
    candidates dropped — SQL equality/IN never matches null, so a
    pruned null can't be a match). Unknown filter shapes are simply not
    used for pruning — they stay Spark-side like everything else."""
    out: dict[str, dict] = {}

    def slot(col: str) -> dict:
        return out.setdefault(col, {"cands": None, "lo": None, "hi": None})

    for f in filters:
        attr = getattr(f, "attribute", None)
        if not isinstance(attr, tuple) or len(attr) != 1 or attr[0] not in cols:
            continue
        col = attr[0]
        if isinstance(f, EqualTo):
            try:
                vs = {f.value} if f.value is not None else set()
            except TypeError:
                continue  # unhashable literal (array-typed eq): no pruning
        elif isinstance(f, In):
            try:
                vs = {v for v in f.value if v is not None}
            except TypeError:
                continue
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            s = slot(col)
            incl = isinstance(f, GreaterThanOrEqual)
            if s["lo"] is None or _gt_safe(f.value, s["lo"][0]):
                s["lo"] = (f.value, incl)
            continue
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            s = slot(col)
            incl = isinstance(f, LessThanOrEqual)
            if s["hi"] is None or _gt_safe(s["hi"][0], f.value):
                s["hi"] = (f.value, incl)
            continue
        else:
            continue
        s = slot(col)
        s["cands"] = vs if s["cands"] is None else (s["cands"] & vs)
    return out


def _gt_safe(a, b) -> bool:
    try:
        return a > b
    except TypeError:
        return False


def _stats_may_match(
    col_stats: dict, constraints: dict[str, dict], blooms: dict | None = None
) -> bool:
    """Can a file whose manifest ``col_stats``/``blooms`` are given hold
    a row satisfying every constraint? Conservative: a column without
    stats (or with un-comparable stat/value types) never prunes. A
    Bloom filter prunes FINITE candidate sets (equality/IN) where
    min/max ranges cannot — high-cardinality unclustered columns."""
    from .bloom import bloom_may_contain

    for col, c in constraints.items():
        rng = col_stats.get(col)
        if rng is not None:
            lo, hi = rng
            try:
                if c["cands"] is not None:
                    if not any(lo <= v <= hi for v in c["cands"]):
                        return False
                if c["lo"] is not None:
                    v, incl = c["lo"]
                    if hi < v or (not incl and hi <= v):
                        return False
                if c["hi"] is not None:
                    v, incl = c["hi"]
                    if lo > v or (not incl and lo >= v):
                        return False
            except TypeError:
                pass  # e.g. str stats vs datetime value: range can't judge
        bl = (blooms or {}).get(col)
        if bl is not None and c["cands"]:
            if not any(bloom_may_contain(bl, v) for v in c["cands"]):
                return False
    return True


def _route_buckets(
    constraints: dict[str, dict],
    key_cols: list[str],
    key_dtypes: list[T.DataType],
    num_buckets: int,
) -> set[int] | None:
    """The only buckets that can hold a matching row, when every key
    column is pinned to a finite candidate set — ``None`` = no routing.
    Safe by the bucket invariant: a row's bucket is a pure function of
    its full key, so a row matching the key conjuncts lives in the
    bucket of one of the candidate combinations."""
    sets = []
    size = 1
    for k in key_cols:
        c = constraints.get(k)
        if c is None or c["cands"] is None:
            return None
        if not c["cands"]:
            return set()  # contradictory conjuncts: nothing can match
        size *= len(c["cands"])
        if size > _BUCKET_ROUTE_CAP:
            return None
        if any(
            isinstance(v, _dt.datetime) and v.tzinfo is None
            for v in c["cands"]
        ):
            # a NAIVE datetime literal's instant depends on the session
            # timezone, which this reader cannot see — hashing it under
            # any assumed zone could route to the wrong bucket and
            # wrongly prune matching rows. Skip routing (correctness
            # over pruning).
            return None
        sets.append(sorted(c["cands"], key=repr))
    import itertools

    buckets: set[int] = set()
    try:
        for combo in itertools.product(*sets):
            buckets.add(bucket_of(combo, key_dtypes, num_buckets))
    except Exception:
        return None  # un-hashable candidate type: skip routing
    return buckets


# --------------------------------------------------------------------
# batch snapshot source: spark.read.format("lake")
# --------------------------------------------------------------------

class LakeSnapshotReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("format('lake') requires .load(<table root>)")
        table = LakeTable(None, self.root, ref=options.get("branch"))
        tag = options.get("tag")
        version = options.get("version")
        # Spark lowercases DataSource option keys
        as_of = options.get("timestampasof")
        if sum(x is not None for x in (version, tag, as_of)) > 1:
            raise ValueError(
                "pass at most one of version, tag, timestampAsOf"
            )
        if tag is not None:
            v = table._resolve_tag(tag)
        elif version is not None:
            v = int(version)
        elif as_of is not None:
            v = table.version_as_of(_parse_ts_option(as_of))
        else:
            v = table.current_version()
        # pin the snapshot's file list at PLANNING time (consistent scan)
        m = table.manifest_at(v)
        self.key_cols = list(m.key_cols)
        self._key_dtypes = [m.schema[k].dataType for k in m.key_cols]
        self._num_buckets = m.num_buckets
        self.out_schema = schema
        self._read_schema = _read_schema_from_stream_schema(
            T.StructType([f for f in schema.fields])
        )
        self._files = [
            {
                "bucket": f.bucket,
                "payload": _file_payload(f),
                "col_stats": (
                    (f.stats or {}).get("col_stats") or {}
                    if isinstance(f.stats, dict) else {}
                ),
                "blooms": (
                    (f.stats or {}).get("blooms") or {}
                    if isinstance(f.stats, dict) else {}
                ),
                "is_delta": f.is_delta,
                "bytes": f.bytes,
            }
            for f in m.files
        ]
        self._pushdown = str(options.get("pushdown", "true")).lower() != "false"
        mpb = options.get("maxpartitionbytes")
        self._max_part_bytes = int(mpb) if mpb is not None else None

    def pushFilters(self, filters):
        """Prune buckets and files from the planned scan — see the
        module docstring for the safety argument. PRUNING ONLY: every
        filter is returned, so Spark still evaluates the full predicate
        row-level on whatever survives (mirrors parquet row-group
        pruning's contract, one level up)."""
        if self._pushdown and filters:
            cols = {f.name for f in self.out_schema.fields}
            cons = _extract_constraints(filters, cols)
            if cons:
                key_set = set(self.key_cols)
                key_cons = {c: v for c, v in cons.items() if c in key_set}
                mut_cons = {c: v for c, v in cons.items() if c not in key_set}
                buckets = _route_buckets(
                    cons, self.key_cols, self._key_dtypes, self._num_buckets
                )
                if buckets is not None:
                    self._files = [
                        f for f in self._files if f["bucket"] in buckets
                    ]
                by_bucket: dict[int, list] = {}
                for f in self._files:
                    by_bucket.setdefault(f["bucket"], []).append(f)
                kept: list[dict] = []
                for fs in by_bucket.values():
                    has_delta = any(f["is_delta"] for f in fs)
                    if mut_cons and has_delta:
                        # mutable-column conditions are bucket-granular
                        # under merge-on-read: dropping only the file
                        # carrying a key's newest version would
                        # resurrect its stale base row
                        if not any(
                            _stats_may_match(
                                f["col_stats"], mut_cons, f.get("blooms")
                            )
                            for f in fs
                        ):
                            continue
                        kept.extend(
                            f for f in fs
                            if _stats_may_match(
                                f["col_stats"], key_cons, f.get("blooms")
                            )
                        )
                    else:
                        kept.extend(
                            f for f in fs
                            if _stats_may_match(
                                f["col_stats"], key_cons, f.get("blooms")
                            )
                            and _stats_may_match(
                                f["col_stats"], mut_cons, f.get("blooms")
                            )
                        )
                self._files = kept
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        by_bucket: dict[int, list] = {}
        for f in self._files:
            by_bucket.setdefault(f["bucket"], []).append(f)
        units: list[tuple[int, dict]] = []
        for b, fs in sorted(by_bucket.items()):
            if any(f["is_delta"] for f in fs):
                # MOR resolution is bucket-wide: one atomic unit
                units.append((
                    sum(f["bytes"] for f in fs),
                    {"bucket": b, "files": [f["payload"] for f in fs]},
                ))
            else:
                # no deltas: files are key-disjoint, split per file
                units.extend(
                    (f["bytes"], {"bucket": b, "files": [f["payload"]]})
                    for f in fs
                )
        return [
            ScanTaskPartition(root=self.root, groups=g)
            for g in _bin_pack(units, self._max_part_bytes)
        ]

    def read(self, partition: ScanTaskPartition) -> Iterator[pa.RecordBatch]:
        if partition is None:  # empty scan: the planner maps zero
            return            # partitions to one None placeholder
        target = _arrow_schema(self._read_schema)
        out = _arrow_schema(self.out_schema)
        for g in partition.groups:
            pdf = _resolve_bucket(
                partition.root, g["files"], target, self.key_cols
            )
            yield from _to_arrow(pdf, out).to_batches()


# --------------------------------------------------------------------
# streaming sink: df.writeStream.format("lake")
# --------------------------------------------------------------------

@dataclass
class LakeSinkCommitMessage(WriterCommitMessage):
    """Per-task result: DataFile payloads for files already renamed
    into the data directory (live only once the driver commits a
    manifest referencing them; uncommitted ones are plain orphans)."""

    files: list = field(default_factory=list)
    rows: int = 0


class LakeStreamWriter(DataSourceStreamArrowWriter):
    """Native exactly-once streaming MERGE sink.

    Each executor task buckets its Arrow batches with the Python
    Murmur3 twin (``lake/hashing.py`` — bit-identical to
    ``bucket_expr``), writes one MOR delta parquet file per touched
    bucket (same staging-marker + rename protocol and the same
    ``_footer_stats`` as the Spark write path), and ships the DataFile
    payloads to the driver. ``commit(messages, batchId)`` lands ONE
    manifest commit: Spark's monotone micro-batch id is the
    exactly-once fence batch id, so a retried epoch fence-skips and
    GCs its replica files, and a lost version race rebases through the
    pure-append retry path (``merge._commit``). Deletes arrive as
    ``op='delete'`` (merge envelope) or ``_change_type='delete'``
    (the ``lake_changes`` source's shape — the two formats chain into
    a mirror pipeline with zero glue) and land as tombstone rows; the
    read path's last-writer-wins resolution needs no in-batch winners
    shuffle, so the sink is embarrassingly parallel.

    The sink never compacts: MOR delta chains are folded by the
    maintenance job (``compact_deltas`` / the CLI ``maintain`` verb),
    the Iceberg streaming-write + rewrite-service split.

    Identity: one sink lineage per (table, ``sourceId``); concurrent
    sinks on one table need distinct ``sourceId`` options or they
    would fence each other's batch ids.
    """

    def __init__(self, input_schema: T.StructType, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("format('lake') sink requires .start(<table root>) "
                             "or .option('path', ...)")
        self.ref = options.get("branch")
        self.source_id = options.get("sourceid", "lake_sink")
        table = LakeTable(None, self.root, ref=self.ref)
        m = table.current_manifest()
        self.key_cols = list(m.key_cols)
        self.num_buckets = m.num_buckets
        self.schema_version = m.current_schema_version
        self.file_st = m.schema  # data cols + _seq + _deleted
        from .cluster import parse_cluster_spec
        from .merge import table_constraints

        # zorder spec degrades to lexicographic constituent-column sort
        # here (Arrow sort_by; clustering is layout-only, and the sink's
        # micro-batch files are compaction-bound anyway) — col_stats
        # still collect per constituent column either way
        self.stat_cols, _ = parse_cluster_spec(m.properties)
        # constraint config rides to the executor tasks so the sink
        # enforces the same contract as the merge paths
        self.nn_cols, self.check_exprs = table_constraints(m)
        bloom_prop = m.properties.get("write.bloom_filter_columns", "")
        self.bloom_cols = [c for c in bloom_prop.split(",") if c]
        in_names = set(input_schema.fieldNames())
        missing = [k for k in self.key_cols if k not in in_names]
        if missing:
            raise ValueError(f"sink input lacks key columns {missing}")
        self.seq_src = next(
            (c for c in ("event_seq", SEQ_COL) if c in in_names), None
        )
        if self.seq_src is None:
            raise ValueError(
                "sink input needs an ordering column: event_seq (merge "
                "envelope) or _seq (lake_changes shape)"
            )
        self.op_src = next(
            (c for c in ("op", CHANGE_COL) if c in in_names), None
        )
        envelope = {self.seq_src, self.op_src, "event_ts", "op",
                    CHANGE_COL, "event_seq", SEQ_COL, DELETED_COL}
        table_cols = set(self.file_st.fieldNames())
        unknown = [
            c for c in input_schema.fieldNames()
            if c not in table_cols and c not in envelope
        ]
        if unknown:
            # fail at STREAM START, on the driver: the sink pins its
            # schema and never auto-evolves (a mid-stream executor
            # cannot run ALTER); evolve first, then start the stream
            raise ValueError(
                f"sink input columns {unknown} not in table schema; "
                "evolve the table first (merge_into(evolve=True) or "
                "evolve_schema), then restart the stream"
            )
        self.key_types = [
            self.file_st[k].dataType for k in self.key_cols
        ]

    def _table(self) -> LakeTable:
        return LakeTable(None, self.root, ref=self.ref)

    # ----- executor side -----
    def write(self, iterator: Iterator[pa.RecordBatch]) -> "LakeSinkCommitMessage":
        import uuid as _uuid

        from .hashing import bucket_of

        batches = list(iterator)
        if not batches or sum(len(b) for b in batches) == 0:
            return LakeSinkCommitMessage(files=[], rows=0)
        src = pa.Table.from_batches(batches)
        n = len(src)
        have = set(src.schema.names)
        # align to the file schema: payload from input (cast), absent
        # table columns null-filled, _seq from the envelope, _deleted
        # from the op/change-type column
        cols = []
        target = _arrow_schema(self.file_st)
        for f_spark, f_arrow in zip(self.file_st.fields, target):
            name = f_spark.name
            if name == SEQ_COL:
                c = src.column(self.seq_src).cast(pa.int64())
            elif name == DELETED_COL:
                if self.op_src is None:
                    c = pa.array(np.zeros(n, dtype=bool))
                else:
                    import pyarrow.compute as pc

                    ops = src.column(self.op_src).cast(pa.string())
                    c = pc.fill_null(pc.equal(ops, "delete"), False)
            elif name in have:
                c = src.column(name)
                if c.type != f_arrow.type:
                    c = c.cast(f_arrow.type)
            else:
                c = pa.nulls(n, f_arrow.type)
            cols.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
        aligned = pa.Table.from_arrays(cols, schema=target)
        if self.nn_cols or self.check_exprs:
            # enforce table constraints BEFORE any file is staged — the
            # same contract as merge_into/merge_local_delta (a raise
            # fails the epoch; abort() GCs nothing because nothing was
            # written). Arrow/DuckDB evaluation, executor-side.
            import pyarrow.compute as pc

            from .merge import ConstraintViolationError

            live_mask = pc.invert(
                pc.fill_null(aligned.column(DELETED_COL), False)
            )
            live_t = aligned.filter(live_mask)
            if len(live_t):
                for c in self.nn_cols:
                    n_bad = pc.sum(
                        pc.is_null(live_t.column(c))
                    ).as_py() or 0
                    if n_bad:
                        raise ConstraintViolationError(
                            f"sink batch violates not_null:{c} on "
                            f"{n_bad} row(s)"
                        )
                if self.check_exprs:
                    import duckdb

                    for name, expr in self.check_exprs.items():
                        try:
                            n_bad = duckdb.sql(
                                "SELECT count(*) FROM live_t WHERE NOT "
                                f"COALESCE(({expr}), TRUE)"
                            ).fetchone()[0]
                        except duckdb.Error as e:
                            raise ValueError(
                                f"CHECK constraint {name!r} ({expr!r}) "
                                "is not evaluable on the native sink "
                                f"path ({e}); drive this table through "
                                "merge_into instead"
                            ) from e
                        if n_bad:
                            raise ConstraintViolationError(
                                f"sink batch violates check:{name} "
                                f"({expr!r}) on {n_bad} row(s)"
                            )
        key_lists = [
            aligned.column(k).to_pylist() for k in self.key_cols
        ]
        buckets = np.fromiter(
            (
                bucket_of(vals, self.key_types, self.num_buckets)
                for vals in zip(*key_lists)
            ),
            dtype=np.int32,
            count=n,
        )
        table = self._table()
        stage = os.path.join(self.root, "_staging", f"sink_{_uuid.uuid4().hex}")
        os.makedirs(stage, exist_ok=True)
        marker = table._stage_marker(stage)
        files: list[dict] = []
        try:
            import pyarrow.compute as pc

            from .table import _footer_stats

            bucket_arr = pa.array(buckets)
            for b in sorted(set(buckets.tolist())):
                part = aligned.filter(pc.equal(bucket_arr, int(b)))
                if self.stat_cols:
                    # keep the table's clustering contract (tight
                    # col_stats) — same rule as the Spark write path
                    part = part.sort_by([(c, "ascending") for c in self.stat_cols])
                fname = f"{_uuid.uuid4().hex}.parquet"
                fpath = os.path.join(stage, fname)
                pq.write_table(part, fpath)
                dest_dir = os.path.join(table._data_dir, f"{BUCKET_COL}={int(b)}")
                os.makedirs(dest_dir, exist_ok=True)
                dest = os.path.join(dest_dir, fname)
                stats = _footer_stats(
                    pq.ParquetFile(fpath),
                    value_cols=self.stat_cols,
                    bloom_cols=self.bloom_cols,
                )
                os.replace(fpath, dest)
                files.append(
                    DataFile(
                        path=os.path.relpath(dest, self.root),
                        bucket=int(b),
                        rows=len(part),
                        bytes=os.path.getsize(dest),
                        schema_version=self.schema_version,
                        is_delta=True,
                        stats=stats,
                    ).to_json()
                )
        finally:
            import shutil as _shutil

            _shutil.rmtree(stage, ignore_errors=True)
            try:
                os.remove(marker)
            except OSError:
                pass
        return LakeSinkCommitMessage(files=files, rows=n)

    # ----- driver side -----
    def commit(self, messages, batchId: int) -> None:
        from .merge import _commit

        new_files = [
            DataFile.from_json(d)
            for msg in messages
            if msg is not None
            for d in msg.files
        ]
        table = self._table()
        m = table.current_manifest()

        def _gc_replicas() -> None:
            for f in new_files:
                try:
                    os.remove(os.path.join(self.root, f.path))
                except OSError:
                    pass

        if m.num_buckets != self.num_buckets or list(m.key_cols) != self.key_cols:
            # the epoch's files were bucketed under the layout current
            # at stream start; a rebucket()/key change between epochs
            # makes those bucket ids meaningless in the new manifest —
            # committing them would scatter keys across buckets with no
            # error (lookup/pushdown/MOR all route by bucket). Refuse
            # loudly; the stream must restart to pick up the layout.
            _gc_replicas()
            raise ValueError(
                f"lake sink on {self.root}: table layout changed mid-"
                f"stream (buckets {self.num_buckets}->{m.num_buckets}, "
                f"keys {self.key_cols}->{list(m.key_cols)}); restart "
                "the stream to re-pin the layout"
            )
        wm = m.watermarks.get(self.source_id)
        if wm is not None:
            fenced = int(wm.get("batch_id", -1))
            if fenced == int(batchId):
                # replayed epoch (restart re-ran the one uncommitted
                # batch): honor the exactly-once fence, GC the replicas
                _gc_replicas()
                return
            if fenced > int(batchId):
                # Spark batch ids are monotone PER CHECKPOINT, and a
                # restart replays at most the last batch — a strictly
                # older id means a FRESH checkpoint (ids reset to 0) or
                # a second sink sharing this sourceId. Silently fence-
                # skipping here would discard every epoch while the
                # stream reports healthy progress; fail loudly instead.
                _gc_replicas()
                raise ValueError(
                    f"lake sink on {self.root}: incoming batch "
                    f"{int(batchId)} is behind the committed watermark "
                    f"{fenced} for sourceId={self.source_id!r}. This "
                    "sink lineage already advanced past this batch id — "
                    "a reset checkpoint or a second sink sharing the "
                    "sourceId. Keep the original checkpointLocation, or "
                    "start the new lineage with a distinct "
                    ".option('sourceId', ...)"
                )
        if not new_files:
            return  # empty epoch: nothing to fence, no version noise
        rows = sum(msg.rows for msg in messages if msg is not None)
        _commit(
            table, m, m.files, new_files, int(batchId), self.source_id,
            None, {"appended": rows},
        )

    def abort(self, messages, batchId: int) -> None:
        for msg in messages:
            if msg is None:
                continue
            for d in msg.files:
                try:
                    os.remove(os.path.join(self.root, d["path"]))
                except OSError:
                    pass


class LakeDataSource(DataSource):
    """``spark.read.format("lake").load(root)`` — snapshot scan with
    time-travel (``version``/``tag``) and branch (``branch``) options."""

    @classmethod
    def name(cls) -> str:
        return LAKE_FORMAT

    def schema(self) -> T.StructType:
        root = self.options.get("path")
        if not root:
            raise ValueError("format('lake') requires .load(<table root>)")
        table = LakeTable(None, root, ref=self.options.get("branch"))
        version = self.options.get("version")
        tag = self.options.get("tag")
        as_of = self.options.get("timestampasof")
        if as_of is not None and (version is not None or tag is not None):
            raise ValueError(
                "pass at most one of version, tag, timestampAsOf"
            )
        if as_of is not None:
            # resolve the timestamp to a version ONCE and hand the
            # reader the version form — a commit landing between
            # schema() and reader() (possible when ts is in the future)
            # must not smear the scan off the schema's snapshot
            version = table.version_as_of(_parse_ts_option(as_of))
            self.options["version"] = str(version)
            del self.options["timestampasof"]
        if tag is not None:
            m = table.manifest_at(table._resolve_tag(tag))
        elif version is not None:
            m = table.manifest_at(int(version))
        else:
            m = table.current_manifest()
        keep = [
            f for f in m.schema.fields if f.name not in (SEQ_COL, DELETED_COL)
        ]
        if self.options.get("includeinternal", "false").lower() == "true":
            keep = [f for f in m.schema.fields if f.name != DELETED_COL]
        return T.StructType(keep)

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return LakeSnapshotReader(schema, dict(self.options))

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "format('lake') sink is append-shaped (CDC semantics come "
                "from op/_change_type, not output mode); use "
                "outputMode('append')"
            )
        return LakeStreamWriter(schema, dict(self.options))


# --------------------------------------------------------------------
# changelog source: spark.read[Stream].format("lake_changes")
# --------------------------------------------------------------------

def _plan_change_partitions(
    table: LakeTable,
    root: str,
    from_v: int,
    to_v: int,
    max_part_bytes: int | None = None,
) -> list[DiffTaskPartition]:
    """Plan a ``(from_v, to_v]`` changelog span: one diff group per
    CHANGED bucket (driver-side manifest diff, KB of JSON), each
    carrying the bucket's old/new file lists; groups pack into tasks
    per ``max_part_bytes`` (default: one task per bucket).
    ``from_v = -1`` (or an empty base manifest) is the bootstrap
    shape — the whole ``to_v`` snapshot as inserts. Shared by the
    streaming micro-batch planner and the batch CDF-style reader."""
    if to_v <= from_v:
        return []
    try:
        m_to = table.manifest_at(to_v)
        m_from = table.manifest_at(from_v) if from_v >= 0 else None
    except FileNotFoundError as e:
        raise ValueError(
            f"lake_changes span ({from_v}, {to_v}] on "
            f"{root} references an EXPIRED snapshot ({e}); the "
            "reader outlived the table's retention. Restart from a "
            "fresh checkpoint / a retained version "
            "(startingVersion=snapshot to re-bootstrap)."
        ) from e
    empty_base = m_from is None or not m_from.files
    old_by: dict[int, list] = {}
    new_by: dict[int, list] = {}
    size_by: dict[int, int] = {}
    if empty_base:
        # bootstrap: every live row at to_v is an insert
        want = {f.bucket for f in m_to.files}
    else:
        buckets = table.changed_buckets(from_v, to_v)
        if buckets is None:
            raise ValueError(
                f"lake_changes span ({from_v}, {to_v}] on {root} "
                "crosses a REBUCKET boundary — bucket ids are not "
                "comparable across layouts. Restart the reader from a "
                "fresh checkpoint / span at or after the rebucket version "
                "(startingVersion=<int> or snapshot)."
            )
        want = set(buckets)
        for f in m_from.files:
            if f.bucket in want:
                old_by.setdefault(f.bucket, []).append(_file_payload(f))
                size_by[f.bucket] = size_by.get(f.bucket, 0) + f.bytes
    for f in m_to.files:
        if f.bucket in want:
            new_by.setdefault(f.bucket, []).append(_file_payload(f))
            size_by[f.bucket] = size_by.get(f.bucket, 0) + f.bytes
    units = [
        (
            size_by.get(b, 0),
            {
                "bucket": b,
                "old_files": old_by.get(b, []),
                "new_files": new_by.get(b, []),
            },
        )
        for b in sorted(want)
    ]
    return [
        DiffTaskPartition(root=root, groups=g)
        for g in _bin_pack(units, max_part_bytes)
    ]


def _read_diff_partition(
    partition: DiffTaskPartition,
    read_st: T.StructType,
    out_schema: T.StructType,
    key_cols: list[str],
    payload_cols: list[str],
) -> Iterator[pa.RecordBatch]:
    """Execute one changelog task (no Spark access; pure pyarrow):
    MOR-resolve each group's old/new bucket states and diff them."""
    if partition is None:  # empty span: the planner maps zero
        return             # partitions to one None placeholder
    target = _arrow_schema(read_st)
    out = _arrow_schema(out_schema)
    for g in partition.groups:
        old = _resolve_bucket(partition.root, g["old_files"], target, key_cols)
        new = _resolve_bucket(partition.root, g["new_files"], target, key_cols)
        tbl = _diff_bucket(old, new, key_cols, payload_cols, out)
        yield from tbl.to_batches()


def _resolve_changes_start(
    table: LakeTable, options: dict, default: str
) -> int:
    """Resolve the change-span START from one of the mutually-exclusive
    option forms (keys lowercased by Spark):

    * ``startingversion`` — latest / earliest / snapshot / int
      (``latest`` is refused when ``default`` is batch-shaped);
    * ``startingtimestamp`` — changes committed AT or after ts
      (Delta CDF rule: ``version_before``, so a commit landing at
      exactly ts is delivered); pre-history raises;
    * ``startingtag`` — changes committed strictly after the TAGGED
      snapshot ("what changed since release X").
    """
    given = [
        k for k in ("startingversion", "startingtimestamp", "startingtag")
        if options.get(k) is not None
    ]
    if len(given) > 1:
        raise ValueError(
            f"pass at most one of startingVersion / startingTimestamp / "
            f"startingTag (got {given})"
        )
    st_ts = options.get("startingtimestamp")
    if st_ts is not None:
        return table.version_before(_parse_ts_option(st_ts))
    st_tag = options.get("startingtag")
    if st_tag is not None:
        return table._resolve_tag(st_tag)
    start = str(options.get("startingversion", default)).lower()
    if start == "latest":
        if default != "latest":
            raise ValueError(
                "startingVersion=latest is a STREAMING tail default; a "
                "batch lake_changes read needs an integer, 'earliest', "
                "or 'snapshot'"
            )
        return table.current_version()
    if start == "earliest":
        return min(table._all_versions())
    if start == "snapshot":
        return -1  # empty-base sentinel: full state as inserts
    return int(start)


def _parse_ts_option(raw) -> object:
    """A timestamp option value: epoch seconds as a string, or ISO-8601
    (``version_as_of`` parses the latter)."""
    try:
        return float(raw)
    except (TypeError, ValueError):
        return raw


def _init_changes_reader(reader, stream_schema: T.StructType, options: dict) -> LakeTable:
    """Shared constructor body of the stream/batch changelog readers:
    root/ref resolution, key + payload column derivation from the
    changelog schema, and the ``maxPartitionBytes`` option. Returns the
    (spark-less) table handle so each reader can parse its own span
    options against it."""
    reader.root = options.get("path")
    if not reader.root:
        raise ValueError("format('lake_changes') requires .load(<table root>)")
    reader.ref = options.get("branch")
    table = LakeTable(None, reader.root, ref=reader.ref)
    m = table.current_manifest()
    reader.key_cols = list(m.key_cols)
    reader.out_schema = stream_schema
    reader._read_st = _read_schema_from_stream_schema(stream_schema)
    reader.payload_cols = [
        f.name for f in stream_schema.fields
        if f.name not in reader.key_cols
        and f.name not in (CHANGE_COL, SEQ_COL, DELETED_COL)
    ]
    mpb = options.get("maxpartitionbytes")
    reader._max_part_bytes = int(mpb) if mpb is not None else None
    return table


class LakeChangesStreamReader(DataSourceStreamReader):
    """Offsets = table versions. ``startingVersion`` option:

    * ``"latest"`` (default) — only changes committed after the stream
      starts (the Kafka-tail default);
    * ``"earliest"`` — from the oldest RETAINED snapshot (incremental
      only; rows already live at that snapshot are not replayed);
    * ``"snapshot"`` — bootstrap: first batch emits the whole current
      table as inserts (Delta's initial-snapshot behavior), then tails;
    * an integer N — changes committed strictly after version N.

    ``startingTimestamp`` (mutually exclusive): changes committed
    strictly after the latest snapshot at or before the given time
    (epoch seconds or ISO-8601 — Delta CDF's option); older than
    retained history raises rather than silently replaying less.
    """

    def __init__(self, stream_schema: T.StructType, options: dict):
        table = _init_changes_reader(self, stream_schema, options)
        self._start = _resolve_changes_start(table, options, default="latest")
        mv = options.get("maxversionsperbatch")
        self.max_versions = int(mv) if mv is not None else None
        #: rate-limit position. Armed at CONSTRUCTION because Spark
        #: calls latestOffset() before initialOffset() (observed call
        #: order of PythonMicroBatchStream). After a checkpoint
        #: restart the reader cannot see the committed offset (the
        #: Python API passes none), so a capped stream ratchets
        #: forward by max_versions per trigger until it passes the
        #: checkpoint, planning no batches on the way — idle triggers,
        #: never wrong data; partitions() re-teaches the true span.
        self._last_seen: int | None = self._start
        self._dbg(f"init start={self._start} cap={self.max_versions}")

    def _table(self) -> LakeTable:
        return LakeTable(None, self.root, ref=self.ref)

    def _dbg(self, msg: str) -> None:
        """Ops trace hook: the reader lives in a detached runner
        process where print() is lost — set LAKE_DS_DEBUG_LOG to a file
        path to see offset/planning decisions when diagnosing a
        stream."""
        p = os.environ.get("LAKE_DS_DEBUG_LOG")
        if p:
            with open(p, "a") as fh:
                fh.write(f"[pid={os.getpid()}] {msg}\n")

    # ----- offsets -----
    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        cur = self._table().current_version()
        if self.max_versions is not None and self._last_seen is not None:
            cur = min(cur, self._last_seen + self.max_versions)
        self._last_seen = max(cur, self._last_seen if self._last_seen is not None else self._start)
        self._dbg(f"latestOffset -> {self._last_seen}")
        return {"version": self._last_seen}

    def commit(self, end: dict) -> None:  # nothing to release
        return

    # ----- planning -----
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from_v, to_v = int(start["version"]), int(end["version"])
        self._dbg(f"partitions({from_v},{to_v})")
        self._last_seen = max(self._last_seen or to_v, to_v)
        return _plan_change_partitions(
            self._table(), self.root, from_v, to_v, self._max_part_bytes
        )

    # ----- execution (no Spark access; pure pyarrow) -----
    def read(self, partition: DiffTaskPartition) -> Iterator[pa.RecordBatch]:
        yield from _read_diff_partition(
            partition, self._read_st, self.out_schema,
            self.key_cols, self.payload_cols,
        )


class LakeChangesBatchReader(DataSourceReader):
    """Batch changelog read — Delta's ``table_changes`` / Iceberg's
    incremental-scan shape through the standard reader API::

        spark.read.format("lake_changes")
             .option("startingVersion", 3)     # exclusive, like
             .option("endingVersion", 7)       # read_changes(3, 7]
             .load(root)

    ``startingVersion``: an integer (changes committed strictly after
    it — the same exclusive-start contract as ``read_changes`` and the
    streaming offsets), ``"earliest"`` (after the oldest RETAINED
    snapshot), or ``"snapshot"`` (the whole ``endingVersion`` state as
    inserts — the bootstrap shape). ``endingVersion`` defaults to the
    current version, resolved at PLANNING time so concurrent commits
    don't smear the scan. ``startingTimestamp`` / ``endingTimestamp``
    are the time-domain equivalents (epoch seconds or ISO-8601,
    resolved via ``version_as_of``), mutually exclusive with their
    version twins. Partitions are the span's changed buckets;
    rows/semantics are parity-pinned against ``read_changes``."""

    def __init__(self, stream_schema: T.StructType, options: dict):
        table = _init_changes_reader(self, stream_schema, options)
        cur = table.current_version()
        ends = [
            k for k in ("endingversion", "endingtimestamp", "endingtag")
            if options.get(k) is not None
        ]
        if len(ends) > 1:
            raise ValueError(
                f"pass at most one of endingVersion / endingTimestamp / "
                f"endingTag (got {ends})"
            )
        end = options.get("endingversion")
        end_ts = options.get("endingtimestamp")
        end_tag = options.get("endingtag")
        if end_ts is not None:
            self._end = table.version_as_of(_parse_ts_option(end_ts))
        elif end_tag is not None:
            self._end = table._resolve_tag(end_tag)
        else:
            self._end = int(end) if end is not None else cur
        if self._end > cur or self._end < 0:
            raise ValueError(
                f"lake_changes endingVersion={self._end} is outside the "
                f"table's history (current version {cur}) on {self.root}"
            )
        self._start = _resolve_changes_start(table, options, default="earliest")
        if self._start > self._end:
            # start==end is the legitimate empty span ("no changes
            # since v"); start PAST the end is a user error (wrong
            # table / typo'd version / a start bound resolving past the
            # ending bound) — silence would read as "no changes"
            raise ValueError(
                f"lake_changes span ({self._start}, {self._end}] is "
                f"inverted on {self.root} (current version {cur}); the "
                "start bound is exclusive and must be <= the end bound"
            )

    def partitions(self) -> Sequence[InputPartition]:
        table = LakeTable(None, self.root, ref=self.ref)
        return _plan_change_partitions(
            table, self.root, self._start, self._end, self._max_part_bytes
        )

    def read(self, partition: DiffTaskPartition) -> Iterator[pa.RecordBatch]:
        yield from _read_diff_partition(
            partition, self._read_st, self.out_schema,
            self.key_cols, self.payload_cols,
        )


class LakeChangesDataSource(DataSource):
    """``spark.readStream.format("lake_changes").load(root)`` — native
    Structured Streaming tail of a lake table's changelog; also
    readable as a BATCH span (``spark.read.format("lake_changes")``,
    see :class:`LakeChangesBatchReader`)."""

    @classmethod
    def name(cls) -> str:
        return LAKE_CHANGES_FORMAT

    def schema(self) -> T.StructType:
        root = self.options.get("path")
        if not root:
            raise ValueError("format('lake_changes') requires .load(<table root>)")
        table = LakeTable(None, root, ref=self.options.get("branch"))
        ev = self.options.get("endingversion")
        end_ts = self.options.get("endingtimestamp")
        end_tag = self.options.get("endingtag")
        if sum(x is not None for x in (ev, end_ts, end_tag)) > 1:
            raise ValueError(
                "pass at most one of endingVersion / endingTimestamp / "
                "endingTag"
            )
        if end_ts is not None:
            # resolve the time-domain bound to a version HERE and hand
            # the reader the version form — same once-only pinning as
            # the default-end stash below
            ev = table.version_as_of(_parse_ts_option(end_ts))
            self.options["endingversion"] = str(ev)
            del self.options["endingtimestamp"]
        elif end_tag is not None:
            ev = table._resolve_tag(end_tag)
            self.options["endingversion"] = str(ev)
            del self.options["endingtag"]
        if ev is not None and not 0 <= int(ev) <= table.current_version():
            raise ValueError(
                f"lake_changes endingVersion={int(ev)} is outside the "
                f"table's history (current version "
                f"{table.current_version()}) on {root}"
            )
        if ev is None:
            # resolve the default end ONCE and pin it into the options
            # the reader will receive — otherwise a commit landing
            # between schema() and reader() would smear the scan past
            # the version whose schema we are about to pin (streams
            # ignore endingversion, so the stash is batch-only in
            # effect)
            ev = table.current_version()
            self.options["endingversion"] = str(ev)
        # batch spans pin the END version's schema (read_changes
        # parity); streams pin the schema current at start
        m = table.manifest_at(int(ev))
        return changelog_schema(m.schema, m.key_cols)

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return LakeChangesBatchReader(schema, dict(self.options))

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return LakeChangesStreamReader(schema, dict(self.options))
