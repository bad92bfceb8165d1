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


# ------------------------------------------------- windowed pane matchers
# SCollectionMatchers.scala:249-330 — inWindow:258, inOnTimePane:249,
# inEarlyPane:304, inLatePane:290, inFinalPane:276. Ours operate over the
# pane records produced by streaming.core.late_firing_panes /
# early_firing_panes-style harnesses (or label_panes rows collected):
# dicts {"timing", "pane_index", "row"} where row carries window_start,
# keys and aggregates. `expected` entries are field-subset dicts — an
# expected matches a firing iff every listed field equals the row's value.


def _pane_matches(row, expected: dict) -> bool:
    try:
        return all(row[k] == v for k, v in expected.items())
    except (KeyError, ValueError):
        return False


def _fmt_row(r):
    """Render a firing row with its VALUES in failure messages (dict rows
    iterate as keys-only under tuple())."""
    if hasattr(r, "asDict"):
        r = r.asDict()
    if isinstance(r, dict):
        return dict(sorted(r.items(), key=lambda kv: str(kv[0])))
    return r


def _panes_in(panes, window_start, timing=None):
    out = []
    for p in panes:
        row = p["row"] if isinstance(p, dict) else p
        if row["window_start"] != window_start:
            continue
        if timing is not None and p["timing"] != timing:
            continue
        out.append((p["timing"], p["pane_index"], row))
    return out


def _assert_pane_set(firings, expected, what):
    rows = [r for _, _, r in firings]
    unmatched = list(range(len(rows)))
    for e in expected:
        hit = next((i for i in unmatched if _pane_matches(rows[i], e)), None)
        assert hit is not None, (
            f"{what}: no firing matches {e}; firings={[_fmt_row(r) for r in rows]}"
        )
        unmatched.remove(hit)
    assert not unmatched, (
        f"{what}: {len(unmatched)} unexpected firing(s): "
        f"{[_fmt_row(rows[i]) for i in unmatched]}"
    )


def assert_in_window(panes, window_start, expected: list):
    """inWindow (SCollectionMatchers.scala:258): each expected field-subset
    dict matches at least one firing (any timing) in the window."""
    firings = _panes_in(panes, window_start)
    for e in expected:
        assert any(_pane_matches(r, e) for _, _, r in firings), (
            f"inWindow({window_start}): nothing matches {e}; "
            f"firings={[_fmt_row(r) for _, _, r in firings]}"
        )


def assert_in_on_time_pane(panes, window_start, expected: list):
    """inOnTimePane (:249): the window's ON_TIME firings match ``expected``
    exactly (bijectively)."""
    _assert_pane_set(
        _panes_in(panes, window_start, "ON_TIME"), expected,
        f"inOnTimePane({window_start})",
    )


def assert_in_early_pane(panes, window_start, expected: list):
    """inEarlyPane (:304): the window's EARLY firings match exactly."""
    _assert_pane_set(
        _panes_in(panes, window_start, "EARLY"), expected,
        f"inEarlyPane({window_start})",
    )


def assert_in_late_pane(panes, window_start, expected: list):
    """inLatePane (:290): the window's LATE firings match exactly."""
    _assert_pane_set(
        _panes_in(panes, window_start, "LATE"), expected,
        f"inLatePane({window_start})",
    )


def assert_in_final_pane(panes, window_start, key_cols, expected: list):
    """inFinalPane (:276): per key, the HIGHEST-pane_index firing in the
    window is that key's final pane; the set of final panes matches
    ``expected`` exactly."""
    firings = _panes_in(panes, window_start)
    best = {}
    for t, idx, r in firings:
        k = tuple(r[c] for c in key_cols)
        if k not in best or idx > best[k][1]:
            best[k] = (t, idx, r)
    _assert_pane_set(
        list(best.values()), expected, f"inFinalPane({window_start})"
    )
