"""Per-file Bloom filters for manifest-level point-query pruning.

Min/max ``col_stats`` prune files only when values CLUSTER (the
``write.sort_within_buckets`` contract); on a high-cardinality column
with overlapping per-file ranges — exactly the shape of an id/hash
column — every file's ``[min, max]`` contains every probe and nothing
prunes. A per-file Bloom filter answers "could this file hold value v?"
regardless of clustering: the Iceberg puffin / Delta Bloom-index /
parquet-bloom idea, lifted one level up into the MANIFEST so the
planner prunes from KB of metadata without opening any file.

Opt-in per table via the ``write.bloom_filter_columns`` property
(comma-separated). Both construction (at write time, from the file's
actual values) and probing (driver-side planning, ``LakeTable.read``'s
``file_value_ranges``, ``LakeTable.lookup``, and the DataSource
``pushFilters`` path) run in pure Python — no Spark expression twin is
needed, so there is no cross-engine hash-parity risk. Membership is
conservative by construction: false positives only (a kept file may
lack the value — the caller's own predicate, the documented pruning
contract, filters it), NEVER false negatives, provided probe and build
encode values identically (``_bloom_bytes`` — type-tagged, with
integral floats folded onto ints so an int literal probing a double
column cannot miss).

Sizing: ~10 bits per distinct value rounded up to a power of two,
clamped to ``write.bloom_filter_max_bits`` (default 65536 = 8 KB raw
per file per column); k=7 probes ≈ 1% false-positive rate at the
target density. A column too dense for the cap (> max_bits/4 distinct
values) gets NO bloom rather than a useless one. Manifests are
delta-encoded, so a file's bloom is stored once, not per snapshot.
"""

from __future__ import annotations

import base64
import struct
from typing import Any, Iterable

from .hashing import _hash_bytes

_SEED1 = 42
_SEED2 = 0x9747B28C
_K = 7
DEFAULT_MAX_BITS = 1 << 16
_MIN_BITS = 1 << 11


def _bloom_bytes(v: Any) -> bytes | None:
    """Type-tagged canonical encoding; ``None`` = unsupported type
    (build skips the column, probe keeps the file). Integral floats
    fold onto the int encoding so cross-type equality probes (int
    literal vs double column and vice versa) stay false-negative-free."""
    if v is None:
        return None
    if isinstance(v, bool):
        return b"b1" if v else b"b0"
    if isinstance(v, int):
        return b"i" + str(v).encode()
    if isinstance(v, float):
        if v != v:  # NaN never equals anything; a probe can't ask for it
            return None
        if v.is_integer() and abs(v) < 2**63:
            return b"i" + str(int(v)).encode()
        return b"f" + struct.pack("<d", v)
    if isinstance(v, str):
        return b"s" + v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return b"y" + bytes(v)
    return None


def _positions(data: bytes, m: int, k: int = _K) -> list[int]:
    """k probe positions via Kirsch–Mitzenmacher double hashing over
    the engine's Murmur3 core (h2 forced odd: full-cycle stride for the
    power-of-two m)."""
    h1 = _hash_bytes(data, _SEED1)
    h2 = _hash_bytes(data, _SEED2) | 1
    return [((h1 + i * h2) & 0x7FFFFFFF) % m for i in range(k)]


def build_bloom(
    values: Iterable[Any], max_bits: int = DEFAULT_MAX_BITS
) -> dict[str, Any] | None:
    """Bloom over the distinct non-null values, as a JSON-safe dict
    ``{"m": bits, "k": probes, "b64": bitset}`` for manifest stats.
    Returns ``None`` (no bloom, no pruning — never an error) when the
    column holds an unsupported type, only nulls, or more distinct
    values than the bit budget can usefully filter."""
    enc: set[bytes] = set()
    for v in values:
        b = _bloom_bytes(v)
        if b is None:
            if v is not None:
                return None  # unsupported type anywhere: no bloom
            continue
        enc.add(b)
    if not enc:
        return None
    if len(enc) * 4 > max_bits:
        return None  # too dense: fp rate would make every probe "maybe"
    m = _MIN_BITS
    while m < len(enc) * 10 and m < max_bits:
        m <<= 1
    bits = bytearray(m // 8)
    for b in enc:
        for p in _positions(b, m):
            bits[p >> 3] |= 1 << (p & 7)
    return {"m": m, "k": _K, "b64": base64.b64encode(bytes(bits)).decode()}


def bloom_may_contain(bloom: dict[str, Any] | None, value: Any) -> bool:
    """Conservative membership: ``True`` = the file may hold the value
    (including every case we cannot judge: no bloom, null probe,
    unsupported probe type, malformed stats)."""
    if not bloom:
        return True
    b = _bloom_bytes(value)
    if b is None:
        return True
    try:
        m = int(bloom["m"])
        k = int(bloom.get("k", _K))  # probe with the WRITER's k
        bits = base64.b64decode(bloom["b64"])
        if m <= 0 or k <= 0 or len(bits) * 8 < m:
            return True
    except (KeyError, TypeError, ValueError):
        return True
    return all(bits[p >> 3] & (1 << (p & 7)) for p in _positions(b, m, k))
