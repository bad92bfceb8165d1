"""Vector-semigroup aggregations (scio-extra Breeze.scala parity)."""

from scio_spark.functions.vectors import mean_vectors_by_key, sum_vectors_by_key


def test_sum_vectors_by_key(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (0, [4.0, 5.0, 6.0]), (1, [1.5, 0.0, -1.0])],
        "k int, v array<double>",
    )
    out = {
        r["k"]: (r["vec_sum"], r["n_vectors"])
        for r in sum_vectors_by_key(df, "v", ["k"]).collect()
    }
    assert out[0] == ([5.0, 7.0, 9.0], 2)
    assert out[1] == ([1.5, 0.0, -1.0], 1)


def test_sum_vectors_global_and_mean(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (0, [4.0, 5.0, 6.0]), (1, [1.5, 0.0, -1.0])],
        "k int, v array<double>",
    )
    g = sum_vectors_by_key(df, "v").collect()
    assert g[0]["vec_sum"] == [6.5, 7.0, 8.0] and g[0]["n_vectors"] == 3
    m = {r["k"]: r["vec_mean"] for r in mean_vectors_by_key(df, "v", ["k"]).collect()}
    assert m[0] == [2.5, 3.5, 4.5]


def test_sum_vectors_partial_aggregated(spark):
    """The per-(key,pos) sum must partial-aggregate (HashAggregate partial
    before the exchange) — the property that keeps shuffle bytes at
    |keys| x dim instead of |rows| x dim."""
    df = spark.createDataFrame(
        [(i % 4, [float(i), 1.0]) for i in range(100)], "k int, v array<double>"
    )
    plan = (
        sum_vectors_by_key(df, "v", ["k"])
        .df if hasattr(sum_vectors_by_key(df, "v", ["k"]), "df")
        else sum_vectors_by_key(df, "v", ["k"])
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan and "SortAggregate" not in plan
