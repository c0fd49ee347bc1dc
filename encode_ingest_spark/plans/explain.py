"""Plan-shape assertions — make the optimizer's behavior a tested
invariant, not a hope.

The reference has no optimizer (SURVEY.md §4); everything Catalyst gives
us for free (pushdown, pruning, broadcast selection) is only "free" if
the plans we build don't defeat it. These helpers read the formatted
physical plan so tests can pin:

* filters reaching the parquet scan (``PushedFilters``)
* column pruning (``ReadSchema`` width)
* broadcast vs shuffle join selection
* shuffle (Exchange) counts — the currency of 100 TB jobs
* absence of cartesian products
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan (AQE may later
    coalesce partitions but the exchange boundary count is plan-time)."""
    return len(re.findall(r"\bExchange\b", plan_string(df, "simple")))


def pushed_filters(df: DataFrame) -> list[str]:
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_string(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def assert_pushed_filters(df: DataFrame, expect_any: list[str]) -> None:
    got = pushed_filters(df)
    for want in expect_any:
        if not any(want in g for g in got):
            raise AssertionError(f"filter {want!r} not pushed to scan; pushed={got}")


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    n = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan_string(df, "simple")))
    if n < expect:
        raise AssertionError(f"expected ≥{expect} broadcast joins, plan has {n}")


def assert_no_cartesian(df: DataFrame) -> None:
    if "CartesianProduct" in plan_string(df, "simple"):
        raise AssertionError("plan contains CartesianProduct")


def assert_single_shuffle(df: DataFrame) -> None:
    n = count_shuffles(df)
    if n > 1:
        raise AssertionError(f"expected ≤1 shuffle, plan has {n}")
