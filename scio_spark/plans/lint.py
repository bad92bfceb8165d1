"""Plan inspection & lint — the Spark-side analog of scio's chained-GBK lint
(util/ArtisanJoin.scala:49-67 warns when join inputs are already grouped).

Catalyst makes most scio lints obsolete (exchange reuse, partial agg), so the
useful checks invert: they *assert efficiency properties* of a plan —
shuffle counts, broadcast usage, scan pushdown — for tests and CI
(SURVEY §7 step 5: "EXPLAIN asserts in tests").
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan (pre-AQE estimate)."""
    return executed_plan(df).count("Exchange hashpartitioning") + executed_plan(
        df
    ).count("Exchange rangepartitioning")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in executed_plan(df)


def scan_pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every file scan in the plan — assert that
    predicates reached the parquet reader."""
    plan = executed_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — assert column pruning happened."""
    plan = executed_plan(df)
    return re.findall(r"ReadSchema: ([^\n]*)", plan)


def assert_no_shuffle(df: DataFrame, msg: str = ""):
    n = count_shuffles(df)
    assert n == 0, f"expected shuffle-free plan, found {n} exchanges. {msg}\n{executed_plan(df)}"


def assert_broadcast(df: DataFrame):
    assert has_broadcast_join(df), f"expected broadcast join:\n{executed_plan(df)}"


def assert_pushdown(df: DataFrame, fragment: str):
    pushed = scan_pushed_filters(df)
    assert any(fragment in p for p in pushed), (
        f"filter '{fragment}' not pushed to scan; pushed={pushed}"
    )
