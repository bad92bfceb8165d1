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
