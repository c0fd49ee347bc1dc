"""Session-scoped memoization for static Column lists.

The incremental entity-universe refresh re-runs every dirty tree's
mapper each epoch. A mapper's projection list is built from dozens to
hundreds of ``pyspark.sql.functions`` calls, and in classic mode every
one of those is a py4j round trip — pure driver-side fixed cost that
repeats identically each epoch (profiled: ~3 s of a steady-state epoch
is plan construction). Columns bind by NAME, not by DataFrame, so a
built Column list is reusable against any input frame with those
columns; one list per session serves every epoch.

Keyed weakly on the active SparkSession so bench ladders that start
several sessions in one process never reuse a Column across JVM
gateways, and the cache dies with the session.

Thread-safety: dict ops are atomic under the GIL; concurrent first
calls may both build (identical) lists and one wins — benign. The
cached Column objects wrap immutable JVM expression trees, safe to
share across the refresh pool's threads.
"""

from __future__ import annotations

import weakref
from typing import Any, Callable, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")

_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def session_memo(key: Any, build: Callable[[], T]) -> T:
    """Return ``build()``, cached per active SparkSession under ``key``."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return build()
    memo = _CACHE.setdefault(spark, {})
    try:
        return memo[key]
    except KeyError:
        val = build()
        memo[key] = val
        return val
