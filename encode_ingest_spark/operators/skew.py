"""Skew handling — salted two-level aggregation and hot-key detection.

The north rule requires explicit skew handling for hot ``repo`` keys. The
reference's analogue is hand-tuned query splitting (the oversized
"annotation" key split into footprints vs non-footprints,
ExtractionPipelineBuilder.scala:147-166,195-211). Here it's systematic:

* ``hot_keys`` — a cheap sampled count sketch to find keys above a
  frequency threshold (one pass over a sample, never the full data).
* ``salted_agg`` — two-level aggregation: local aggregate per
  ``(key, salt)`` then final aggregate per ``key``. For algebraic
  aggregates (count/sum/min/max) this bounds any single reducer's input
  to ``rows(key)/salt_buckets`` — a hot repo with 30% of 10^10 rows
  becomes 30%/64 per reducer.

Note the merge/dedup path does NOT need salting: its shuffle key is the
full (repo, path, commit) tuple whose hash spreads hot repos naturally
(lake/merge.py §3). Salting applies to *repo-granular* rollups.
AQE's skew-join splitting (enabled in session.py) covers the join case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"

# (spark agg fn, merge fn) per algebraic aggregate
_MERGEABLE = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def hot_keys(
    df: DataFrame,
    key_cols: list[str],
    threshold: float = 0.05,
    sample_fraction: float = 0.01,
    seed: int = 42,
) -> list[tuple]:
    """Keys holding more than ``threshold`` of (sampled) rows. The sample
    aggregate is tiny; the result is a driver-side list suitable for a
    plan-time decision (salt or not) or a broadcast filter."""
    sampled = df.sample(fraction=sample_fraction, seed=seed)
    total = sampled.count()
    if total == 0:
        return []
    counts = (
        sampled.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > total * threshold)
        .collect()
    )
    return [tuple(r[c] for c in key_cols) for r in counts]


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 64,
) -> DataFrame:
    """Two-level skew-proof aggregation.

    ``aggs``: out_col -> (fn_name, in_col) with fn_name in
    count/sum/min/max. Example::

        salted_agg(events, ["repo"], {"n": ("count", "*"),
                                      "bytes": ("sum", "size")})

    Level 1 groups by (keys, salt) — the salt is a deterministic hash of
    the whole row's monotonic id substitute (spark_partition_id + a hash),
    spreading a hot key over ``salt_buckets`` reducers. Level 2 merges the
    ``salt_buckets`` partials per key. Both levels are hash aggregates
    with map-side combining.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"{name}: non-algebraic aggregate {fn!r} cannot be salted")
    salt = F.pmod(
        F.hash(F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(salt_buckets)
    )
    local_aggs = []
    for out, (fn, col) in aggs.items():
        agg_fn = _MERGEABLE[fn][0]
        src = F.lit(1) if col == "*" else F.col(col)
        local_aggs.append(agg_fn(src).alias(out))
    level1 = df.withColumn(_SALT, salt).groupBy(*key_cols, _SALT).agg(*local_aggs)
    final_aggs = [
        _MERGEABLE[fn][1](F.col(out)).alias(out) for out, (fn, _c) in aggs.items()
    ]
    return level1.groupBy(*key_cols).agg(*final_aggs)


def plain_agg(df: DataFrame, key_cols: list[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
    """Single-level counterpart of salted_agg (for equivalence tests and
    non-skewed keys)."""
    out = []
    for name, (fn, col) in aggs.items():
        agg_fn = _MERGEABLE[fn][0]
        src = F.lit(1) if col == "*" else F.col(col)
        out.append(agg_fn(src).alias(name))
    return df.groupBy(*key_cols).agg(*out)
