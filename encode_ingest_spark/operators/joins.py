"""Join operator library — SURVEY.md §2.3 J1-J16 shapes, Spark-first.

The reference's joins are all equi-joins on string entity IDs, frequently
against a *grouped* right side (Scio ``groupByKey`` then
``leftOuterJoin``). In Spark the idiomatic equivalent is a pre-aggregated
``collect_list`` side joined left — Catalyst plans the small sides as
broadcast joins automatically (AQE), and the helpers below make the
broadcast explicit where the reference did (side inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_grouped(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    agg_cols: list[str],
    out_col: str,
    how: str = "left",
    sort: bool = True,
    broadcast_right: bool = False,
) -> DataFrame:
    """J2/J12-style: left ⟕ (right grouped by key → collect_list(struct)).

    Reference shape: keyBy + groupByKey + leftOuterJoin
    (TransformationPipelineBuilder.scala:184-203,226-242). Aggregating the
    right side FIRST (partial-agg'd groupBy) and then joining beats
    joining row-level and re-grouping: the shuffle carries one row per
    right key instead of one per right row.

    Single agg column → array<value>; several → array<struct>.
    ``sort=True`` canonicalizes array order (the reference's outputs are
    set-like; deterministic order makes results comparable).
    """
    if len(agg_cols) == 1:
        collected = F.collect_list(F.col(agg_cols[0]))
    else:
        collected = F.collect_list(F.struct(*[F.col(c) for c in agg_cols]))
    if sort:
        collected = F.sort_array(collected)
    grouped = right.groupBy(F.col(right_key).alias("_jg_key")).agg(collected.alias(out_col))
    if broadcast_right:
        grouped = F.broadcast(grouped)
    joined = left.join(grouped, left[left_key] == grouped["_jg_key"], how)
    return joined.drop("_jg_key").withColumn(out_col, F.coalesce(F.col(out_col), F.array()))


def broadcast_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_array: str,
    right_array: str,
    how: str = "inner",
) -> DataFrame:
    """J14 — broadcast nested-loop join with an array-overlap predicate.

    Reference: the file→library linkage scans, per file, the full library
    list (a side input) keeping libraries whose biosample list intersects
    the file's origin_batches (TransformationPipelineBuilder.scala:131,
    382-401; predicate FileTransformations.scala:66-85). The right side is
    small by contract → explicit ``F.broadcast`` so the only viable plan
    is BroadcastNestedLoopJoin; without the hint Catalyst would fall back
    to a cartesian at cluster scale.
    """
    return left.join(
        F.broadcast(right), F.arrays_overlap(left[left_array], right[right_array]), how
    )


def anti_join_missing_fks(
    child: DataFrame,
    fk_array_col: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """J15/U6 — referential-integrity check: explode a repeated FK column
    and anti-join the parent to find orphans.

    Reference: hack/check_for_missing_files.sh:16-27 — BigQuery
    ``id NOT IN (SELECT file_id FROM file)`` over unnested link arrays.
    left_anti keeps the build side (parent keys) as the hash side; at
    scale, distinct-ing the exploded FKs before the join shrinks the probe.
    """
    fks = child.select(F.explode(F.col(fk_array_col)).alias("fk")).distinct()
    return fks.join(parent, fks["fk"] == parent[parent_key], "left_anti")


def staged_vs_live_diff(
    staged: DataFrame,
    live: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """J16/S7 — the reference's per-table diff step re-expressed
    relationally: returns (new_rows, stale_keys).

    Reference: ingest-processed-data.yaml:86-116 — per PK, compare staged
    batch vs ingested table; emit new-rows (to append) and old-ids (to
    soft-delete). ``new_rows``: staged rows whose key is absent from live
    OR whose compared payload differs. ``stale_keys``: live keys whose
    payload is superseded (changed) or gone from staged.

    This is the batch formulation; the streaming engine folds the same
    semantics into merge_into (lake/merge.py) where the diff and the
    apply are one shuffle.
    """
    cmp_cols = compare_cols or [c for c in staged.columns if c not in keys]
    s_fp = staged.withColumn("_fp", F.sha2(F.to_json(F.struct(*[F.col(c) for c in cmp_cols])), 256))
    l_fp = live.withColumn("_fp", F.sha2(F.to_json(F.struct(*[F.col(c) for c in cmp_cols])), 256))
    l_keys = l_fp.select(*keys, F.col("_fp").alias("_live_fp"))
    joined = s_fp.join(l_keys, keys, "left")
    new_rows = joined.filter(
        F.col("_live_fp").isNull() | (F.col("_fp") != F.col("_live_fp"))
    ).drop("_fp", "_live_fp")
    s_keys = s_fp.select(*keys, F.col("_fp").alias("_staged_fp"))
    stale = (
        l_fp.join(s_keys, keys, "left")
        .filter(F.col("_staged_fp").isNull() | (F.col("_fp") != F.col("_staged_fp")))
        .select(*keys)
    )
    return new_rows, stale
