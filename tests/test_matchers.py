"""The matcher DSL itself (SCollectionMatchers parity, SURVEY §5.2)."""

import pytest

from scio_spark import testing as M


@pytest.fixture()
def small(sc):
    return sc.parallelize([("a", 1), ("b", 2)], schema=["k", "v"])


def test_contains_in_any_order(small):
    M.assert_contains_in_any_order(small, [("b", 2), ("a", 1)])
    with pytest.raises(AssertionError, match="contents differ"):
        M.assert_contains_in_any_order(small, [("a", 1)])


def test_contains_and_single_value(sc, small):
    M.assert_contains(small, ("a", 1))
    one = sc.parallelize([42])
    M.assert_single_value(one, 42)
    with pytest.raises(AssertionError):
        M.assert_single_value(small, ("a", 1))


def test_empty_and_size(sc, small):
    M.assert_empty(small.filter("v > 99"))
    M.assert_size(small, 2)
    with pytest.raises(AssertionError, match="expected empty"):
        M.assert_empty(small)


def test_satisfy_forall_exists(small):
    M.assert_satisfy(small, lambda rows: len(rows) == 2, "two rows")
    M.assert_for_all(small, lambda r: r[1] > 0, "positive v")
    M.assert_exists(small, lambda r: r[0] == "b", "has key b")
    with pytest.raises(AssertionError, match="forAll"):
        M.assert_for_all(small, lambda r: r[1] > 1, "v > 1")


def test_approx_equal(sc):
    c = sc.parallelize([1.0000001, 2.0])
    M.assert_approx_equal(c, [1.0, 2.0], tol=1e-5)
    with pytest.raises(AssertionError):
        M.assert_approx_equal(c, [1.1, 2.0], tol=1e-5)


def test_windowed_pane_matchers(spark):
    """SCollectionMatchers windowed assertions (inWindow/inOnTimePane/
    inEarlyPane/inLatePane/inFinalPane, SCollectionMatchers.scala:249-330)
    over the LeaderBoard early/on-time/late scripted scenario."""
    import datetime as dt

    from pyspark.sql import functions as F

    from scio_spark.streaming.core import StreamFixture, late_firing_panes
    from scio_spark.testing import (
        assert_in_early_pane,
        assert_in_final_pane,
        assert_in_late_pane,
        assert_in_on_time_pane,
        assert_in_window,
    )

    def ts(minute):
        return dt.datetime(2024, 1, 1, 10, minute)

    f = StreamFixture(spark, "user string, team string, score int, event_time timestamp")
    try:
        f.add_batch([("u1", "red", 1, ts(1))])
        f.add_batch([("u1", "red", 1, ts(5)), ("u1", "red", 1, ts(12))])
        f.add_batch([("u1", "red", 1, ts(2))])  # late, admitted
        panes = late_firing_panes(
            f.stream(), "event_time", "10 minutes", "30 minutes",
            ["team"], [F.count(F.lit(1)).alias("n")],
        )
        w = ts(0)
        assert_in_window(panes, w, [{"team": "red", "n": 1}, {"team": "red", "n": 3}])
        assert_in_early_pane(panes, w, [{"team": "red", "n": 1}])
        assert_in_on_time_pane(panes, w, [{"team": "red", "n": 2}])
        assert_in_late_pane(panes, w, [{"team": "red", "n": 3}])
        assert_in_final_pane(panes, w, ["team"], [{"team": "red", "n": 3}])
        # negative: a wrong expectation must raise with a readable message
        import pytest

        with pytest.raises(AssertionError, match="inOnTimePane"):
            assert_in_on_time_pane(panes, w, [{"team": "red", "n": 99}])
        with pytest.raises(AssertionError, match="unexpected firing"):
            assert_in_late_pane(panes, w, [])
    finally:
        f.close()
