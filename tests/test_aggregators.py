"""Python-monoid Aggregator ergonomics (Algebird analog, SURVEY hard-parts)
and the as-of join operator."""

import pytest
from pyspark.sql import functions as F

from scio_spark.functions.aggregators import (
    Aggregator,
    aggregate_by_key_pandas,
    aggregate_rdd,
    set_union_aggregator,
    top_k_aggregator,
)
from scio_spark.operators.joins import asof_join
from tests.conftest import rows


def test_aggregate_rdd_custom_monoid(spark):
    df = spark.createDataFrame([(x,) for x in [3, 1, 4, 1, 5, 9, 2, 6]], ["v"])
    # min-max monoid
    agg = Aggregator(
        prepare=lambda r: (r["v"], r["v"]),
        merge=lambda a, b: (min(a[0], b[0]), max(a[1], b[1])),
        present=lambda acc: {"min": acc[0], "max": acc[1]},
    )
    assert aggregate_rdd(df, agg) == {"min": 1, "max": 9}


def test_aggregate_by_key_pandas_set_union(sc):
    keyed = sc.parallelize(
        [("a", 1), ("a", 2), ("a", 1), ("b", 9)], schema=["k", "v"]
    ).key_by("k")
    out = aggregate_by_key_pandas(
        keyed, set_union_aggregator("v"), "k string, distinct_values array<long>"
    )
    got = {r["k"]: r["distinct_values"] for r in out.collect()}
    assert got == {"a": [1, 2], "b": [9]}


def test_top_k_aggregator(spark):
    df = spark.createDataFrame([(x,) for x in range(100)], ["v"])
    agg = top_k_aggregator(3, key=lambda r: r["v"])
    res = aggregate_rdd(df, agg)
    assert [r["v"] for r in res["top"]] == [99, 98, 97]


# ------------------------------------------------------------------- as-of


def test_asof_join_basic(spark):
    import datetime as dt

    def t(d):
        return dt.datetime(2024, 1, d)

    left = spark.createDataFrame(
        [(1, "k1", t(5)), (2, "k1", t(10)), (3, "k1", t(2)), (4, "k2", t(5))],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [("k1", t(3), "r1"), ("k1", t(7), "r2"), ("k3", t(1), "rX")],
        ["k", "rts", "rv"],
    )
    out = asof_join(left, right, "k", "ts", "rts", ["rv"])
    got = {r["id"]: (r["rv"], r["matched_ts"].day) for r in out.collect()}
    # id 1 (t5): latest right ≤ t5 is t3 → r1; id 2 (t10): t7 → r2
    assert got == {1: ("r1", 3), 2: ("r2", 7)}
    # id 3 (t2, before any right row) and id 4 (k2, no right) dropped (inner)
    left_out = asof_join(left, right, "k", "ts", "rts", ["rv"], how="left")
    assert left_out.count() == 4
    unmatched = {r["id"] for r in left_out.collect() if r["rv"] is None}
    assert unmatched == {3, 4}


def test_asof_join_equality_matches(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 5)
    left = spark.createDataFrame([(1, "k", t)], ["id", "k", "ts"])
    right = spark.createDataFrame([("k", t, "same-instant")], ["k", "rts", "rv"])
    out = asof_join(left, right, "k", "ts", "rts", ["rv"])
    assert out.collect()[0]["rv"] == "same-instant"  # ts >= rts includes equal
