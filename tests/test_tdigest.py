"""t-digest tests (functions/tdigest.py): accuracy vs exact quantiles,
merge-vs-whole equivalence, serialization, and the distributed build."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from scio_spark.functions.tdigest import TDigest, tdigest_by_key, tdigest_sketch


def exact_q(values, q):
    return float(np.quantile(np.asarray(values), q))


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal"])
def test_accuracy_against_exact(dist):
    rng = np.random.RandomState(7)
    x = {
        "uniform": rng.uniform(0, 100, 50_000),
        "normal": rng.normal(50, 10, 50_000),
        "lognormal": rng.lognormal(1, 1, 50_000),
    }[dist]
    td = TDigest(200).add(x)
    span = exact_q(x, 0.99) - exact_q(x, 0.01)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        assert abs(td.quantile(q) - exact_q(x, q)) < 0.02 * span, (dist, q)
    # extremes are exact by construction
    assert td.quantile(0.0) == x.min() and td.quantile(1.0) == x.max()


def test_bounded_size():
    x = np.random.RandomState(1).uniform(0, 1, 200_000)
    td = TDigest(100).add(x)
    assert len(td.means) < 300  # ~2-3x delta worst case
    assert td.count == 200_000


def test_merge_equivalent_to_whole():
    rng = np.random.RandomState(3)
    a, b, c = (rng.normal(0, 1, 20_000) for _ in range(3))
    whole = TDigest(200).add(np.concatenate([a, b, c]))
    merged = TDigest(200).add(a).merge(TDigest(200).add(b)).merge(TDigest(200).add(c))
    allv = np.concatenate([a, b, c])
    span = exact_q(allv, 0.99) - exact_q(allv, 0.01)
    for q in (0.05, 0.5, 0.95):
        assert abs(merged.quantile(q) - whole.quantile(q)) < 0.02 * span
        assert abs(merged.quantile(q) - exact_q(allv, q)) < 0.02 * span
    assert merged.count == whole.count == 60_000


def test_serialization_roundtrip():
    x = np.random.RandomState(5).uniform(-10, 10, 5000)
    td = TDigest(150).add(x)
    back = TDigest.from_bytes(td.to_bytes())
    assert back.count == td.count and back.delta == td.delta
    for q in (0.1, 0.5, 0.9):
        assert back.quantile(q) == td.quantile(q)
    with pytest.raises(ValueError, match="TDigest"):
        TDigest.from_bytes(b"nope" + bytes(40))


def test_weighted_add():
    td = TDigest(100).add([1.0, 2.0, 3.0], weights=[1, 98, 1])
    assert abs(td.quantile(0.5) - 2.0) < 0.1


def test_distributed_sketch_matches_local(spark):
    random.seed(11)
    vals = [random.gauss(100, 15) for _ in range(40_000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(16)
    td = tdigest_sketch(df, "x")
    span = exact_q(vals, 0.99) - exact_q(vals, 0.01)
    for q in (0.05, 0.5, 0.95):
        assert abs(td.quantile(q) - exact_q(vals, q)) < 0.02 * span
    assert td.count == 40_000


def test_by_key_artifacts(spark):
    rows = [("a", float(i)) for i in range(1000)] + [
        ("b", float(1000 + i)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k string, x double")
    out = {r.k: r for r in tdigest_by_key(df, "k", "x").collect()}
    assert out["a"].n == 1000 and out["b"].n == 1000
    ta = TDigest.from_bytes(bytes(out["a"].sketch))
    tb = TDigest.from_bytes(bytes(out["b"].sketch))
    assert abs(ta.quantile(0.5) - 499.5) < 15
    assert abs(tb.quantile(0.5) - 1499.5) < 15
    # cross-day story: the two keyed digests merge into the global one
    merged = ta.merge(tb)
    assert abs(merged.quantile(0.5) - 999.5) < 30


def test_nulls_dropped_and_empty_raises(spark):
    df = spark.createDataFrame([(None,), (1.0,), (None,)], "x double")
    td = tdigest_sketch(df, "x")
    assert td.count == 1
    empty = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="no non-null"):
        tdigest_sketch(empty, "x")


def test_quantile_buckets(spark):
    from scio_spark.functions.tdigest import quantile_buckets

    df = spark.range(10_000).selectExpr("id", "CAST(id AS DOUBLE) AS x")
    out = quantile_buckets(df, "x", 4)
    sizes = {r.bucket: r.n for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {0, 1, 2, 3}
    for b, n in sizes.items():
        assert abs(n - 2500) < 150, (b, n)  # ~equal mass within digest error
    # monotone: bucket never decreases with x
    rows = out.orderBy("x").select("bucket").collect()
    vals = [r.bucket for r in rows]
    assert vals == sorted(vals)
