"""Aggregation operators — SURVEY.md §2.4 A1-A6 shapes.

The reference's aggregations are all groupByKey-collect shapes plus
global distinct-by-id; re-expressed as partial-agg-friendly Spark
aggregates. (A7, CDC dedup, lives in cdc/dedup.py; A4 audit summarization
in functions/audit.py.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_per_key(
    df: DataFrame, keys: list[str], value_cols: list[str], out_col: str, sort: bool = True
) -> DataFrame:
    """A1 — groupByKey-collect (TransformationPipelineBuilder.scala:
    138-141,226-242 etc.): one row per key with the member values as an
    array (struct-typed when several value columns)."""
    v = (
        F.collect_list(F.col(value_cols[0]))
        if len(value_cols) == 1
        else F.collect_list(F.struct(*[F.col(c) for c in value_cols]))
    )
    if sort:
        v = F.sort_array(v)
    return df.groupBy(*keys).agg(v.alias(out_col))


def regroup_concat(
    df: DataFrame,
    first_keys: list[str],
    second_keys: list[str],
    array_col: str,
    out_col: str,
) -> DataFrame:
    """A2 — group by a composite key concatenating arrays, then re-key by
    a prefix (pipeline-runs shape, TransformationPipelineBuilder.scala:
    554-569): flatten(collect_list(arr)) at each level."""
    level1 = df.groupBy(*first_keys).agg(
        F.flatten(F.collect_list(F.col(array_col))).alias(out_col)
    )
    return level1.groupBy(*second_keys).agg(
        F.array_distinct(F.flatten(F.collect_list(F.col(out_col)))).alias(out_col)
    )


def distinct_by(df: DataFrame, keys: list[str], prefer_min: str | None = None) -> DataFrame:
    """A3 — distinctBy(@id) (ExtractionPipelineBuilder.scala:90-91).

    ``dropDuplicates(keys)`` keeps an arbitrary row per key — fine for the
    reference's use (identical duplicates from overlapping queries). With
    ``prefer_min`` the winner is deterministic (min of that column) via a
    min_by aggregate — still one partial-agg'd shuffle, no window sort.
    """
    if prefer_min is None:
        return df.dropDuplicates(keys)
    others = [c for c in df.columns if c not in keys]
    return df.groupBy(*keys).agg(
        *[F.min_by(F.col(c), F.col(prefer_min)).alias(c) for c in others]
    )


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """U1/U2 — n-way union (TransformationPipelineBuilder.scala:105-125),
    name-aligned, missing columns null-filled."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def count_gate(df: DataFrame) -> bool:
    """A6 — count-gated branching (ingest-processed-data.yaml:115-116):
    cheap emptiness probe (LIMIT 1 scan, not a full count)."""
    return not df.isEmpty()
