"""Assertion matchers for DataFrames/SCollections — the reference's
SCollectionMatchers analog (scio-test testing/SCollectionMatchers.scala:
182-330: containInAnyOrder, containSingleValue, beEmpty, haveSize, satisfy;
PipelineSpec style).

Designed for pytest: plain functions that raise AssertionError with a diff,
order-insensitive by default (distributed results have no order)."""

from __future__ import annotations

from typing import Any, Callable, Iterable


def _rows(df) -> list[tuple]:
    df = df.df if hasattr(df, "df") else df
    return [tuple(r) for r in df.collect()]


def _canon(rows: Iterable) -> list:
    out = []
    for r in rows:
        out.append(tuple(r) if isinstance(r, (list, tuple)) else (r,))
    return sorted(out, key=repr)


def assert_contains_in_any_order(df, expected: Iterable):
    """containInAnyOrder (:182 family) — exact multiset equality."""
    got, want = _canon(_rows(df)), _canon(expected)
    assert got == want, f"contents differ\n  got:  {got}\n  want: {want}"


def assert_contains(df, element):
    got = _canon(_rows(df))
    want = _canon([element])[0]
    assert want in got, f"{want} not found in {got}"


def assert_single_value(df, expected):
    """containSingleValue — exactly one row, equal to expected."""
    got = _rows(df)
    assert len(got) == 1, f"expected a single row, got {len(got)}: {got}"
    want = _canon([expected])[0]
    assert _canon(got)[0] == want, f"single value {got[0]} != {want}"


def assert_empty(df):
    """beEmpty."""
    got = _rows(df)
    assert got == [], f"expected empty, got {len(got)} rows: {got[:5]}"


def assert_size(df, n: int):
    """haveSize."""
    count = (df.df if hasattr(df, "df") else df).count()
    assert count == n, f"expected {n} rows, got {count}"


def assert_satisfy(df, predicate: Callable[[list], bool], description: str = ""):
    """satisfy — arbitrary predicate over the materialized rows."""
    got = _rows(df)
    assert predicate(got), f"satisfy({description or predicate.__name__}) failed on {got[:10]}"


def assert_for_all(df, predicate: Callable[[tuple], bool], description: str = ""):
    """forAll — predicate holds for every row."""
    bad = [r for r in _rows(df) if not predicate(r)]
    assert not bad, f"forAll({description}) violated by {bad[:10]}"


def assert_exists(df, predicate: Callable[[tuple], bool], description: str = ""):
    """exist — at least one row satisfies the predicate."""
    got = _rows(df)
    assert any(predicate(r) for r in got), f"exists({description}) found no match in {got[:10]}"


def assert_approx_equal(df, expected: Iterable, tol: float = 1e-6):
    """ApproximationAssertions analog: numeric rows equal within tolerance."""
    got, want = _canon(_rows(df)), _canon(expected)
    assert len(got) == len(want), f"row counts differ: {len(got)} vs {len(want)}"

    def close(a: Any, b: Any) -> bool:
        if isinstance(a, float) and isinstance(b, float):
            return abs(a - b) <= tol * max(1.0, abs(b))
        if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
            return all(close(x, y) for x, y in zip(a, b))
        return a == b

    mism = [(a, b) for a, b in zip(got, want) if not close(a, b)]
    assert not mism, f"approx mismatch (tol={tol}): {mism[:5]}"
