"""Python twin of Spark's hash() — Murmur3_x86_32, seed 42.

The lake's bucket layout is ``pmod(hash(key_cols), num_buckets)``
(``table.bucket_expr``), evaluated by Catalyst on every write and merge
path. Components that run OUTSIDE a Spark job still need to place a row
in its bucket:

* the native streaming SINK (``lake/datasource.py``) writes per-bucket
  MOR delta files from executor-side Arrow batches, where no nested
  Spark expression can run;
* driver-side point lookups (``LakeTable.lookup_bucket``) turn a key
  into ONE bucket's file list without launching a job.

This module reimplements the exact algorithm from Spark's public source
(org.apache.spark.unsafe.hash.Murmur3_x86_32 and
sql.catalyst.expressions.HashExpression): per-column fold of the seed,
null values leave the running hash unchanged, strings/binary hash their
bytes with the UNSAFE tail rule (each trailing byte sign-extended and
given a FULL mix round — not vanilla murmur3's accumulate-then-mix),
floats/doubles hash their IEEE bits with -0.0 normalized, and the
result is a SIGNED 32-bit int. Parity with ``F.hash`` is pinned
exhaustively in tests/test_hashing.py — if Spark ever changed the
algorithm (it cannot; bucket layouts of every deployed table depend on
it) the test suite fails loudly.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterable

from pyspark.sql import types as T

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _hash_int(value: int, seed: int) -> int:
    return _fmix(_mix_h1(seed & _M32, _mix_k1(value & _M32)), 4)


def _hash_long(value: int, seed: int) -> int:
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & _M32, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
    return _fmix(h1, 8)


def _hash_bytes(data: bytes, seed: int) -> int:
    h1 = seed & _M32
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        k1 = int.from_bytes(data[i:i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(aligned, n):
        b = data[i]
        if b >= 0x80:  # Spark reads SIGNED bytes (sign-extended to int)
            b -= 0x100
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    return _fmix(h1, n)


_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _fold_value(value: Any, dtype: T.DataType, h: int) -> int:
    """One column's contribution: null leaves the running hash
    unchanged (Catalyst's rule), otherwise the typed hash seeded with
    the running value."""
    if value is None:
        return h
    if isinstance(dtype, T.StringType):
        return _hash_bytes(str(value).encode("utf-8"), h)
    if isinstance(dtype, T.BinaryType):
        return _hash_bytes(bytes(value), h)
    if isinstance(dtype, T.LongType):
        return _hash_long(int(value), h)
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        return _hash_int(int(value), h)
    if isinstance(dtype, T.BooleanType):
        return _hash_int(1 if value else 0, h)
    if isinstance(dtype, T.FloatType):
        import struct as _struct

        f = float(value)
        if f == 0.0:
            f = 0.0  # normalize -0.0
        bits = _struct.unpack("<i", _struct.pack("<f", f))[0]
        return _hash_int(bits, h)
    if isinstance(dtype, T.DoubleType):
        import struct as _struct

        d = float(value)
        if d == 0.0:
            d = 0.0
        bits = _struct.unpack("<q", _struct.pack("<d", d))[0]
        return _hash_long(bits, h)
    if isinstance(dtype, T.DateType):
        days = (value - _EPOCH_DATE).days if isinstance(value, _dt.date) else int(value)
        return _hash_int(days, h)
    if isinstance(dtype, T.TimestampType):
        if isinstance(value, _dt.datetime):
            # NAIVE datetimes are interpreted as UTC wall time. Rows
            # collected via PySpark hold DRIVER-LOCAL naive values
            # (TimestampType.fromInternal uses the process timezone),
            # so callers must localize before hashing —
            # LakeTable.lookup does (``_utc_key_value``).
            v = value if value.tzinfo else value.replace(tzinfo=_dt.timezone.utc)
            delta = v - _EPOCH_TS  # exact integer arithmetic, no float
            micros = (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds
        else:
            micros = int(value)
        return _hash_long(micros, h)
    raise TypeError(
        f"spark_hash: unsupported key column type {dtype.simpleString()} "
        "(lake key columns are scalar; extend _fold_value for new types)"
    )


def spark_hash(values: Iterable[Any], dtypes: Iterable[T.DataType], seed: int = 42) -> int:
    """Spark's ``F.hash(*cols)`` for one row — SIGNED int32."""
    h = seed & _M32
    for v, dt in zip(values, dtypes):
        h = _fold_value(v, dt, h)
    return h - 0x100000000 if h >= 0x80000000 else h


def bucket_of(values: Iterable[Any], dtypes: Iterable[T.DataType], num_buckets: int) -> int:
    """``pmod(hash(keys), num_buckets)`` — the lake's bucket id."""
    return spark_hash(values, dtypes) % num_buckets
