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


def find_all_pairs_joins(
    df: DataFrame, max_side_bytes: int = 32 << 20
) -> list[str]:
    """Size-aware all-pairs lint (r5 verdict item #8; the chained-GBK-lint
    analog, ArtisanJoin.scala:49-67, inverted for Spark): walk the executed
    plan for ``BroadcastNestedLoopJoin`` / ``CartesianProduct`` nodes and
    flag those whose BOTH sides' Catalyst size estimates exceed
    ``max_side_bytes`` — a 1-row scalar join (corpus total, threshold
    broadcast) is fine; two non-trivial sides in an all-pairs operator is
    the O(n·m) shape that breaks at 100 TB (the exact hazard r5 flagged in
    fuzzy_join's short stratum before its length-band rewrite).

    Side sizes come from each physical child's ``logicalLink`` statistics;
    a child with no logical link is treated as over-threshold (unknown =
    suspicious). Returns human-readable findings (empty = clean); pure
    driver-side plan inspection, no job runs."""

    def side_size(child) -> int | None:
        link = child.logicalLink()
        if not link.isDefined():
            return None
        # py4j maps scala BigInt to a Python int on some paths and leaves
        # a JavaObject on others — str() round-trip covers both
        return int(str(link.get().stats().sizeInBytes()))

    findings: list[str] = []
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        ch = node.children()
        kids = [ch.apply(i) for i in range(ch.length())]
        if not kids:
            # wrapper nodes hide their subtree behind an accessor instead
            # of children(): AdaptiveSparkPlanExec.inputPlan(), the
            # QueryStageExec family's plan()
            for accessor in ("inputPlan", "plan"):
                try:
                    kids = [getattr(node, accessor)()]
                    break
                except Exception:  # noqa: BLE001 (py4j: no such method)
                    continue
        if node.nodeName() in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            sizes = [side_size(k) for k in kids]
            if all(s is None or s > max_side_bytes for s in sizes):
                shown = [("?" if s is None else s) for s in sizes]
                findings.append(
                    f"{node.nodeName()}: both side size estimates {shown} "
                    f"exceed {max_side_bytes} bytes — O(n*m) at scale; use "
                    "an equi-join (length bands, buckets) or broadcast a "
                    "genuinely small side"
                )
        stack.extend(kids)
    return findings


def assert_no_unbounded_all_pairs(df: DataFrame, max_side_bytes: int = 32 << 20):
    bad = find_all_pairs_joins(df, max_side_bytes)
    assert not bad, f"unbounded all-pairs join(s): {bad}\n{executed_plan(df)}"


def lint_report(df: DataFrame, max_shuffles: int = 6) -> list[str]:
    """Scale-anti-pattern warnings for a plan — the user-facing analog of
    scio's chained-GBK lint (ArtisanJoin.scala:49-67), inverted for Spark:
    instead of warning about API misuse Catalyst already fixes, flag the
    physical-plan shapes that break at 100 TB. Returns human-readable
    warnings (empty list = clean); purely driver-side plan inspection, no
    job runs.

    Checks:
    - cartesian product (``CartesianProduct``) — O(n·m) without a bound;
    - ``BroadcastNestedLoopJoin`` — fine for a tiny side, quadratic
      otherwise, so it's surfaced for review;
    - row-at-a-time Python UDF in the plan (``BatchEvalPython``) — the
      ~10-100× slow path vs Arrow-batched ``ArrowEvalPython``/mapInPandas;
    - a file scan with a filter above it but NO pushed filters — pushdown
      was defeated (e.g. a UDF or a cast in the predicate);
    - more than ``max_shuffles`` exchanges — usually a missed broadcast,
      a re-partitioning chain, or an unstaged expression tree;
    - ``Exchange SinglePartition`` under an aggregation with grouping
      columns absent — a global funnel stage.
    """
    plan = executed_plan(df)
    warnings: list[str] = []
    if "CartesianProduct" in plan:
        warnings.append(
            "CartesianProduct: unbounded O(n*m) join — add an equi-condition "
            "or broadcast the small side explicitly"
        )
    if "BroadcastNestedLoopJoin" in plan:
        warnings.append(
            "BroadcastNestedLoopJoin: verify the broadcast side is tiny "
            "(non-equi or cross joins scan it once per row batch)"
        )
    if "BatchEvalPython" in plan:
        warnings.append(
            "BatchEvalPython: row-at-a-time Python UDF in the plan — prefer "
            "built-in Column expressions or an Arrow-batched pandas UDF"
        )
    # scans that kept a Filter above them but pushed nothing down
    for m in re.finditer(r"PushedFilters: \[\]", plan):
        ctx = plan[: m.start()]
        if "Filter " in ctx:
            warnings.append(
                "file scan with empty PushedFilters below a Filter — the "
                "predicate didn't reach the reader (UDF/cast in predicate?)"
            )
            break
    n = count_shuffles(df)
    if n > max_shuffles:
        warnings.append(
            f"{n} shuffle exchanges (> {max_shuffles}): look for a missed "
            "broadcast hint, redundant repartitioning, or a join chain that "
            "could reuse one partitioning"
        )
    return warnings
