"""Interval join tests (operators/range_join.py): parity with the naive
cross-join, exactly-once matching, and the no-nested-loop plan property
that is the operator's reason to exist."""

import random

import pytest
from pyspark.sql import functions as F

from scio_spark.operators.range_join import interval_join


@pytest.fixture(scope="module")
def rand_data(spark):
    rng = random.Random(17)
    pts = [(i, rng.uniform(0, 1000)) for i in range(400)]
    ivs = []
    for j in range(120):
        s = rng.uniform(0, 1000)
        ivs.append((j, s, s + rng.uniform(0, 40)))
    return (
        spark.createDataFrame(pts, "p_id long, x double"),
        spark.createDataFrame(ivs, "i_id long, lo double, hi double"),
    )


def naive(points, intervals):
    return points.crossJoin(intervals).filter(
        (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
    )


@pytest.mark.parametrize("width", [1.0, 7.5, 40.0, 300.0])
def test_parity_with_cross_join_any_width(rand_data, width):
    points, intervals = rand_data
    fast = interval_join(points, intervals, "x", "lo", "hi", width)
    slow = naive(points, intervals)
    a = sorted((r.p_id, r.i_id) for r in fast.collect())
    b = sorted((r.p_id, r.i_id) for r in slow.collect())
    assert a == b and len(a) > 0


def test_each_pair_exactly_once(rand_data):
    points, intervals = rand_data
    out = interval_join(points, intervals, "x", "lo", "hi", 10.0)
    pairs = [(r.p_id, r.i_id) for r in out.collect()]
    assert len(pairs) == len(set(pairs))


def test_no_nested_loop_in_plan(rand_data):
    points, intervals = rand_data
    plan = (
        interval_join(points, intervals, "x", "lo", "hi", 10.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # vs: the naive formulation IS a nested loop
    nplan = naive(points, intervals)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in nplan or "CartesianProduct" in nplan


def test_timestamp_columns(spark):
    pts = spark.createDataFrame(
        [(1, "2024-01-01 10:15:00"), (2, "2024-01-01 11:59:59"), (3, "2024-01-02 00:00:00")],
        "p_id long, ts string",
    ).select("p_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    ivs = spark.createDataFrame(
        [(10, "2024-01-01 10:00:00", "2024-01-01 12:00:00")],
        "i_id long, s string, e string",
    ).select(
        "i_id",
        F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"),
    )
    out = interval_join(pts, ivs, "ts", "s", "e", bucket_width=3600)
    assert sorted(r.p_id for r in out.collect()) == [1, 2]


def test_inclusive_bounds_and_inverted_interval(spark):
    pts = spark.createDataFrame([(1, 5.0), (2, 10.0)], "p_id long, x double")
    ivs = spark.createDataFrame(
        [(1, 5.0, 10.0), (2, 10.0, 5.0)], "i_id long, lo double, hi double"
    )
    out = interval_join(pts, ivs, "x", "lo", "hi", 2.0).collect()
    assert sorted((r.p_id, r.i_id) for r in out) == [(1, 1), (2, 1)]


def test_bad_width_rejected(spark, rand_data):
    points, intervals = rand_data
    with pytest.raises(ValueError, match="positive"):
        interval_join(points, intervals, "x", "lo", "hi", 0)
