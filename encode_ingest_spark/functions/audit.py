"""A4 — audit summarization (SURVEY.md §2.4 A4), Spark-native.

Reference: CommonTransformations.scala:74-102 — ENCODE objects carry an
``audit`` object grouping audit records by severity:
``map<severity, array<struct<category: string, level: long>>>``. The
summary is (1) the color label of the max level present
(40→yellow, 50→orange, 60→red, else white; absent audit → null color) and
(2) the distinct, sorted category labels.

Implemented with higher-order functions only (``flatten``/``map_values``/
``aggregate``/``array_distinct``/``array_sort``) — per-row, no explode, no
shuffle, fully codegen'd. An explode→groupBy formulation would shuffle
every audit record at 100 TB; this stays inside the row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .scalars import audit_color


def _all_audits(audit_map: Column) -> Column:
    """Flatten map<severity, array<struct>> → array<struct>."""
    return F.flatten(F.map_values(audit_map))


def audit_max_level(audit_map: Column | str) -> Column:
    c = F.col(audit_map) if isinstance(audit_map, str) else audit_map
    return F.aggregate(
        _all_audits(c),
        F.lit(0).cast("long"),
        lambda acc, x: F.greatest(acc, x["level"]),
    )


def audit_level_color(audit_map: Column | str) -> Column:
    """Color of the max level; null when the object has no audit at all
    (the reference returns None, CommonTransformations.scala:80)."""
    c = F.col(audit_map) if isinstance(audit_map, str) else audit_map
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        audit_color(audit_max_level(c))
    )


def audit_labels(audit_map: Column | str) -> Column:
    """Distinct sorted categories; empty array when no audit
    (CommonTransformations.scala:80, List.empty)."""
    c = F.col(audit_map) if isinstance(audit_map, str) else audit_map
    labels = F.array_sort(
        F.array_distinct(F.transform(_all_audits(c), lambda x: x["category"]))
    )
    return F.coalesce(labels, F.array().cast("array<string>"))
