"""Core SCollection ops — mirrors the reference's per-operator unit specs
(scio-core/src/test/.../values/SCollectionTest.scala; PipelineSpec style:
small in-memory fixtures, order-insensitive assertions)."""

from pyspark.sql import functions as F

from tests.conftest import rows


def test_parallelize_scalars(sc):
    c = sc.parallelize([1, 2, 3])
    assert rows(c.df) == [(1,), (2,), (3,)]


def test_map_filter(sc):
    c = sc.parallelize([1, 2, 3, 4])
    out = c.filter("value % 2 = 0").map(doubled="value * 2")
    assert rows(out.df) == [(4,), (8,)]


def test_flat_map_wordcount(sc):
    # the WordCount golden test (scio-examples WordCountTest.scala:28-35)
    c = sc.parallelize(["a b c d e", "a b a b", ""])
    counts = (
        c.flat_map(F.split(F.col("value"), r"\s+"), alias="word")
        .filter("word != ''")
        .map("word")
        .count_by_value()
    )
    got = dict((r[0], r[1]) for r in counts.df.collect())
    assert got == {"a": 3, "b": 3, "c": 1, "d": 1, "e": 1}


def test_union_intersection_subtract(sc):
    a = sc.parallelize([1, 1, 2, 3])
    b = sc.parallelize([1, 2, 4])
    assert rows(a.union(b).df) == [(1,), (1,), (1,), (2,), (2,), (3,), (4,)]
    assert rows(a.intersection(b).df) == [(1,), (2,)]
    # reference subtract = anti-join: ALL occurrences of matched elements go
    assert rows(a.subtract(b).df) == [(3,)]
    assert rows(a.except_all(b).df) == [(1,), (3,)]


def test_distinct_by(sc):
    c = sc.parallelize([("a", 1), ("a", 2), ("b", 3)], schema=["k", "v"])
    assert len(rows(c.distinct_by("k").df)) == 2


def test_top_and_take(sc):
    c = sc.parallelize([5, 1, 9, 3])
    assert rows(c.top(2, "value")) == [(5,), (9,)]
    assert c.take(3).count() == 3


def test_stats(sc):
    c = sc.parallelize([1.0, 2.0, 3.0, 4.0])
    r = c.stats().df.collect()[0]
    assert r["count"] == 4 and r["mean"] == 2.5
    assert r["min"] == 1.0 and r["max"] == 4.0
    assert abs(r["variance"] - 1.25) < 1e-9


def test_histogram_uniform(sc):
    c = sc.parallelize([0.5, 1.5, 1.6, 2.5, 3.0])
    got = dict(
        (r[0], r[1]) for r in c.histogram("value", [0.0, 1.0, 2.0, 3.0]).df.collect()
    )
    assert got == {1: 1, 2: 2, 3: 2}  # 3.0 lands in the last bucket


def test_partition_by_pred(sc):
    c = sc.parallelize([1, 2, 3, 4, 5])
    even, odd = c.partition_by_pred("value % 2 = 0")
    assert rows(even.df) == [(2,), (4,)]
    assert rows(odd.df) == [(1,), (3,), (5,)]


def test_random_split_disjoint_and_complete(sc):
    c = sc.parallelize(list(range(100)))
    a, b = c.random_split([0.5, 0.5], seed=7)
    na, nb = a.count(), b.count()
    assert na + nb == 100
    assert rows(a.intersection(b).df) == []


def test_sample_fraction(sc):
    c = sc.parallelize(list(range(1000)))
    n = c.sample(0.1, seed=42).count()
    assert 50 < n < 200


def test_batch(sc):
    c = sc.parallelize(list(range(10)))
    batches = c.batch(3).df.collect()
    sizes = sorted(len(b["batch"]) for b in batches)
    assert sum(sizes) == 10
    assert max(sizes) <= 3


def test_quantiles_exact(sc):
    c = sc.parallelize([float(x) for x in range(1, 101)])
    q = c.quantiles_exact("value", [0.5]).df.collect()[0]["quantiles"]
    assert abs(q[0] - 50.5) < 1e-9


def test_hash_filter_broadcast_semi(sc):
    """hashFilter: keep elements present in a small side collection —
    broadcast LEFT SEMI, no shuffle."""
    big = sc.parallelize([(i, f"v{i}") for i in range(100)], schema=["id", "v"])
    side = sc.parallelize([(3,), (7,), (7,), (999,)], schema=["id"])
    got = sorted(r["id"] for r in big.hash_filter(side, on="id").collect())
    assert got == [3, 7]
    plan = (
        big.hash_filter(side, on="id")
        .df._jdf.queryExecution().executedPlan().toString()
    )
    # the PROBE side never shuffles: the only exchange in the plan is the
    # tiny side's pre-broadcast distinct (bounded by |side|)
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    probe_subtree = plan.split("BroadcastHashJoin")[1].split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in probe_subtree


def test_side_input_set(sc):
    from scio_spark.operators.enrich import side_input_set

    s = side_input_set(sc.parallelize([(1,), (2,), (2,)], schema=["k"]).df)
    assert s.value == {1, 2}
