"""Approximation-bound assertions — the reference's ApproximationAssertions
pattern (scio-test testing/ApproximationAssertions.scala, used by the HLL
suites): approximate operators must land within their advertised error of
the exact answer."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def big_df(spark):
    # 20k rows, 5k distinct keys, skewed values
    return spark.range(20000).select(
        (F.col("id") % 5000).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_approx_count_distinct_within_rsd(big_df):
    exact = big_df.select("k").distinct().count()
    for rsd in (0.05, 0.02):
        approx = big_df.agg(F.approx_count_distinct("k", rsd)).collect()[0][0]
        # 4σ bound on the advertised relative standard deviation
        assert abs(approx - exact) <= 4 * rsd * exact, (rsd, approx, exact)


def test_percentile_approx_within_accuracy(big_df):
    exact = [r[0] for r in big_df.selectExpr("percentile(v, 0.5)").collect()]
    approx = big_df.agg(
        F.percentile_approx("v", 0.5, 10000).alias("p")
    ).collect()[0]["p"]
    # accuracy=10000 → rank error ≤ n/10000 = 2 ranks; values step by 1
    assert abs(approx - exact[0]) <= 2.0


def test_hll_sketch_merge_matches_union_estimate(big_df):
    """Mergeability: union of per-shard sketches ≈ sketch of the union."""
    from scio_spark.functions import sketches as K

    merged = K.approx_distinct_via_merge(
        big_df.withColumn("shard", F.col("k") % 7), "shard", "k"
    ).collect()[0]["n_distinct"]
    exact = big_df.select("k").distinct().count()
    assert abs(merged - exact) <= 0.05 * exact


def test_lsh_ann_recall_bound(spark):
    """Hyperplane-LSH recall@1 on clustered vectors stays above a floor at
    a permissive bit width (statistical, fixed seed via md5 hyperplanes)."""
    import math
    import random

    from scio_spark.functions.similarity import cosine_topk, cosine_topk_lsh

    random.seed(5)
    data = []
    for i in range(80):
        center = [1.0 if j == (i % 4) * 4 else 0.0 for j in range(16)]
        v = [c + random.gauss(0, 0.2) for c in center]
        n = math.sqrt(sum(x * x for x in v))
        data.append((i, [x / n for x in v]))
    df = spark.createDataFrame(data, ["vec_id", "embedding"])
    qs = df.filter("vec_id < 10")
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, qs, k=1, score_decimals=None).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_lsh(df, qs, k=1, bits=2, dim=16).collect()
    }
    assert len(brute & approx) >= 0.6 * len(brute)


def test_approx_count_distinct_by_key_within_rsd(spark):
    """Per-key HLL++ stays within its advertised rsd for every key — the
    reason this op is bounds-tested, never oracle-hash-matched (memory:
    151 vs 150 even at tiny cardinality)."""
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    data = [(f"k{i % 4}", f"v{i % (50 * (1 + i % 4))}") for i in range(5000)]
    kv = sc.parallelize(data, schema=["key", "val"]).key_by("key")
    exact = {
        r["key"]: r["n"]
        for r in kv.df.groupBy("key").agg(
            F.countDistinct("val").alias("n")
        ).collect()
    }
    approx = {
        r["key"]: r["approx_distinct"]
        for r in kv.count_approx_distinct_by_key("val", rsd=0.05).df.collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 4 * 0.05 * n), (k, approx[k], n)
