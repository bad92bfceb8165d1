"""Funnel + cohort retention (functions/journeys.py): hand-computed
fixtures pin the strict-ordering funnel semantics and the epoch-grid
cohort arithmetic."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from scio_spark.functions.journeys import (
    cohort_retention,
    funnel_counts,
    funnel_steps,
)


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes view -> click -> buy in order
        ("u1", _ts(1), "view"),
        ("u1", _ts(2), "click"),
        ("u1", _ts(3), "buy"),
        # u2 clicks BEFORE viewing: click must not count; later click does
        ("u2", _ts(1), "click"),
        ("u2", _ts(2), "view"),
        ("u2", _ts(4), "click"),
        # u3 views only
        ("u3", _ts(5), "view"),
        # u4 buys before click: funnel breaks at buy
        ("u4", _ts(1), "view"),
        ("u4", _ts(2), "buy"),
        ("u4", _ts(3), "click"),
        # u5 never views
        ("u5", _ts(1), "click"),
        ("u5", _ts(2), "buy"),
    ]
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string"
    ).repartition(4)


def STEPS():
    return [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click"),
        ("buy", F.col("event_type") == "buy"),
    ]


def test_funnel_strict_ordering(events):
    got = {
        r.user_id: (r.ts_view, r.ts_click, r.ts_buy)
        for r in funnel_steps(events, STEPS()).collect()
    }
    assert set(got) == {"u1", "u2", "u3", "u4"}  # u5 never entered
    assert got["u1"] == (_ts(1), _ts(2), _ts(3))
    # u2's pre-view click ignored; the day-4 click counts; no buy
    assert got["u2"] == (_ts(2), _ts(4), None)
    assert got["u3"] == (_ts(5), None, None)
    # u4's buy precedes the click -> buy stage unreached
    assert got["u4"] == (_ts(1), _ts(3), None)


def test_funnel_counts(events):
    got = {
        r.step: (r.step_index, r.n_users)
        for r in funnel_counts(events, STEPS()).collect()
    }
    assert got == {"view": (1, 4), "click": (2, 3), "buy": (3, 1)}


def test_cohort_retention_epoch_grid(spark):
    # week grid: 2024-01-01 is epoch-week 2817 (1704067200 / 604800 = 2817.9 ->
    # floor 2817); use explicit offsets instead of magic numbers
    rows = [
        ("a", datetime(2024, 1, 1)),   # cohort week W
        ("a", datetime(2024, 1, 10)),  # W+1
        ("a", datetime(2024, 1, 20)),  # W+2 (18 days later crosses 2 grid lines)
        ("b", datetime(2024, 1, 2)),   # cohort W, active W only
        ("c", datetime(2024, 1, 10)),  # cohort W+1
        ("c", datetime(2024, 1, 11)),  # same period -> one distinct
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {
        (r.cohort_period, r.period_offset): r.n_users
        for r in cohort_retention(df, period_seconds=604800).collect()
    }
    w = 1704067200 // 604800
    assert out[(w, 0)] == 2           # a, b
    assert out[(w, 1)] == 1           # a
    assert out[(w + 1, 0)] == 1       # c
    # a's Jan-20 event: offset = floor(epoch/P) difference from Jan-1 cohort
    jan20_off = (1705708800 // 604800) - w
    assert out[(w, jan20_off)] == 1


def test_funnel_rejects_empty_steps(events):
    with pytest.raises(ValueError):
        funnel_steps(events, [])


def test_funnel_rejects_duplicate_names(events):
    with pytest.raises(ValueError):
        funnel_steps(
            events,
            [("x", F.col("event_type") == "view"), ("x", F.col("event_type") == "click")],
        )


def test_funnel_rejects_non_identifier_names(events):
    with pytest.raises(ValueError):
        funnel_steps(events, [("bad name", F.col("event_type") == "view")])
