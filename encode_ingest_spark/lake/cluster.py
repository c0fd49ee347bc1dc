"""Multi-dimensional file clustering — the Delta ``OPTIMIZE ZORDER BY``
/ Iceberg sort-order analogue for the lake format.

Why it matters at 100 TB: hash bucketing routes a KEY point-lookup to
one bucket, and ``write.sort_within_buckets`` makes single-column range
predicates prunable (tight per-file ``col_stats``) — but a lexicographic
sort only clusters its LEADING column. A filter on the second sort
column still touches every file. Z-ordering interleaves the bits of
several columns' rank values so files end up tight in EVERY constituent
dimension at once: a predicate on any z-column prunes most files via
the same manifest ``col_stats`` machinery (nothing on the read path
changes — clustering is correctness-neutral layout).

Mechanics (all JVM-side, no UDFs):

* Each z-column's values map to a ``2^bits``-way rank via boundary
  literals (quantiles of a driver-side sample, frozen into the table
  property ``write.zorder.boundaries`` so FUTURE merges cluster
  consistently without re-sampling): ``rank = count(boundaries <= v)``
  expressed as ``F.size(F.filter(F.array(lits), b -> b <= col))`` —
  O(2^bits) comparisons per row inside whole-stage codegen.
* Ranks interleave bit-by-bit into one LONG z-value
  (``sum((rank_j >> i & 1) << (i*k + j))``), and the bucket write sorts
  by it (``sortWithinPartitions`` — local, shuffle-free, exactly like
  the plain clustering path).
* ``rewrite_clustered`` = set properties + compact the chosen buckets:
  compaction routes through ``_stage_write``, which already applies the
  table's clustering spec, so one code path serves the initial rewrite,
  later compactions, and every future merge.

Reference parity note: the reference has no storage-layout tier at all
(TDR owns storage); this exists for the 10^10-row lake the north rule
targets, mirroring public Delta/Iceberg behavior.
"""

from __future__ import annotations

import json
import re
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_RE = re.compile(r"^zorder\(([^)]*)\)$")
BOUNDARIES_PROP = "write.zorder.boundaries"
SORT_PROP = "write.sort_within_buckets"

#: driver-side sample rows per column for boundary estimation — the
#: boundaries are a layout heuristic, not a correctness surface, so a
#: bounded sample is plenty (Delta's OPTIMIZE samples similarly)
_SAMPLE_CAP = 20_000


def parse_cluster_spec(properties: dict) -> tuple[list[str], bool]:
    """(constituent columns, is_zorder) from the table's sort property.

    ``"c1,c2"``  → ([c1, c2], False) — lexicographic clustering.
    ``"zorder(c1,c2)"`` → ([c1, c2], True).
    """
    raw = (properties or {}).get(SORT_PROP, "") or ""
    m = ZORDER_RE.match(raw.strip())
    if m:
        cols = [c.strip() for c in m.group(1).split(",") if c.strip()]
        return cols, True
    return [c for c in raw.split(",") if c], False


def zorder_rank(col: Column, boundaries: list) -> Column:
    """Rank of ``col`` among frozen ``boundaries`` (count of boundaries
    <= value), as a codegen'd expression over an array literal. NULLs
    rank 0 (cluster together at the low end)."""
    lits = F.array(*[F.lit(b) for b in boundaries])
    n = F.size(F.filter(lits, lambda b: b <= col))
    return F.coalesce(F.greatest(n, F.lit(0)), F.lit(0)).cast("long")


def zorder_value(cols: list[str], boundaries: dict[str, list], bits: int) -> Column:
    """Interleave the per-column ranks into one LONG z-value. ``bits``
    is the rank width (boundaries hold ``2^bits - 1`` entries)."""
    k = len(cols)
    ranks = [zorder_rank(F.col(c), boundaries[c]) for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            z = z + F.shiftleft(
                F.shiftright(r, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return z


def zorder_value_py(row_get, cols: list[str], boundaries: dict[str, list], bits: int) -> int:
    """Pure-Python twin of :func:`zorder_value` for the driver-local
    delta path (``merge_local_delta`` sorts its micro-batch rows without
    a Spark job). Clustering is layout-only, so exact JVM parity is not
    a correctness requirement — but the twin uses the same
    count-of-boundaries-≤-value rule, diverging only on exotic string
    collation edge cases."""
    z = 0
    k = len(cols)
    for j, c in enumerate(cols):
        v = row_get(c)
        b = boundaries.get(c) or []
        try:
            # count-of-boundaries-≤-value, ORDER-INDEPENDENT — the exact
            # rule the Spark expression uses (so no per-row sort, and no
            # reliance on the frozen property's ordering)
            r = 0 if v is None else sum(1 for x in b if x <= v)
        except TypeError:
            r = 0
        for i in range(bits):
            z |= ((r >> i) & 1) << (i * k + j)
    return z


def _encode_bounds(b: dict[str, list]) -> dict:
    """Type-tagged JSON form of the boundary lists. date/timestamp/
    decimal boundaries are NOT JSON-native: the old ``default=str``
    freeze reloaded them as strings, so ``zorder_value_py`` hit
    TypeError comparing str to date and silently degraded every row to
    rank 0, and the Spark path leaned on implicit string-literal casts."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    enc: dict = {}
    for c, vals in b.items():
        if vals and isinstance(vals[0], _dt.datetime):
            enc[c] = {"t": "ts", "v": [v.isoformat() for v in vals]}
        elif vals and isinstance(vals[0], _dt.date):
            enc[c] = {"t": "date", "v": [v.isoformat() for v in vals]}
        elif vals and isinstance(vals[0], _Dec):
            enc[c] = {"t": "dec", "v": [str(v) for v in vals]}
        else:
            enc[c] = {"t": "raw", "v": list(vals)}
    return enc


def _decode_bounds(d: dict) -> dict[str, list]:
    import datetime as _dt
    from decimal import Decimal as _Dec

    out: dict[str, list] = {}
    for c, spec in d.items():
        if isinstance(spec, list):  # legacy untagged freeze
            out[c] = spec
            continue
        t, v = spec.get("t"), spec.get("v", [])
        if t == "ts":
            out[c] = [_dt.datetime.fromisoformat(x) for x in v]
        elif t == "date":
            out[c] = [_dt.date.fromisoformat(x) for x in v]
        elif t == "dec":
            out[c] = [_Dec(x) for x in v]
        else:
            out[c] = v
    return out


def load_boundaries(properties: dict) -> tuple[dict[str, list], int]:
    """(boundaries, bits) from the frozen table property; ({}, 0) when
    absent (zorder spec without boundaries degrades to lexicographic).
    Boundaries reload with their ORIGINAL types (see _encode_bounds)."""
    raw = (properties or {}).get(BOUNDARIES_PROP)
    if not raw:
        return {}, 0
    d = json.loads(raw)
    return _decode_bounds(d.get("boundaries", {})), int(d.get("bits", 4))


def compute_boundaries(
    df: DataFrame, cols: list[str], bits: int = 4,
    total_rows: int | None = None,
) -> dict[str, list]:
    """Estimate ``2^bits - 1`` quantile boundaries per column from a
    bounded deterministic sample — one small job per call (rewrite-time
    only; merges reuse the frozen property). Works for any orderable
    type (numeric, string, date): the sample sorts driver-side.
    ``total_rows`` sizes the sample fraction without a count() job —
    ``rewrite_clustered`` derives it from manifest file stats for
    free; callers without one pay the extra count."""
    n_bounds = (1 << bits) - 1
    out: dict[str, list] = {}
    total = df.count() if total_rows is None else total_rows
    frac = min(1.0, (_SAMPLE_CAP * 1.0) / max(total, 1))
    sample = df.select(*cols).sample(fraction=frac, seed=7).collect()
    for c in cols:
        vals = sorted(r[c] for r in sample if r[c] is not None)
        if not vals:
            out[c] = []
            continue
        bounds = []
        for q in range(1, n_bounds + 1):
            idx = min(len(vals) - 1, (q * len(vals)) // (n_bounds + 1))
            bounds.append(vals[idx])
        # dedupe while preserving order (low-cardinality columns)
        seen: list = []
        for b in bounds:
            if not seen or b != seen[-1]:
                seen.append(b)
        out[c] = seen
    return out


def rewrite_clustered(
    table,
    cols: list[str],
    strategy: str = "zorder",
    bits: int = 4,
    buckets: Iterable[int] | None = None,
):
    """Re-cluster the table's files — ``OPTIMIZE ... ZORDER BY`` /
    ``ALTER TABLE WRITE ORDERED BY``. Sets the clustering properties
    (so every FUTURE write clusters the same way), then rewrites the
    chosen ``buckets`` (default: all with data) through the standard
    compaction path. Rewrite cost is proportional to the buckets
    rewritten — pass a subset to re-cluster incrementally, exactly like
    Delta's per-partition OPTIMIZE.

    ``strategy="sort"``: lexicographic ``write.sort_within_buckets``.
    ``strategy="zorder"``: multi-dimensional; samples quantile
    boundaries (one small job) and freezes them into
    ``write.zorder.boundaries``.

    Returns the new manifest."""
    if strategy not in ("sort", "zorder"):
        raise ValueError(f"unknown strategy {strategy!r}")
    m = table.current_manifest()
    missing = [c for c in cols if c not in {f.name for f in m.schema.fields}]
    if missing:
        raise ValueError(f"cluster columns not in table schema: {missing}")
    if strategy == "sort":
        table.set_properties(
            {SORT_PROP: ",".join(cols), BOUNDARIES_PROP: None}
        )
    else:
        b = compute_boundaries(
            table.read(include_tombstones=True), cols, bits,
            total_rows=sum(f.rows for f in m.files),
        )
        table.set_properties(
            {
                SORT_PROP: f"zorder({','.join(cols)})",
                BOUNDARIES_PROP: json.dumps(
                    {"boundaries": _encode_bounds(b), "bits": bits},
                    default=str,
                ),
            }
        )
    m = table.current_manifest()
    todo = sorted(
        {f.bucket for f in m.files} if buckets is None else set(buckets)
    )
    return table.compact_buckets(todo)
