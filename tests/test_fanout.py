"""fan_out_scan: fires only on provably-narrow file scans (r15-opt)."""

import glob
import os

from scio_spark.fanout import fan_out_scan


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_narrow_parquet_scan_fans_out_to_width(spark, tmp_path):
    p = str(tmp_path / "narrow")
    spark.range(100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = fan_out_scan(df)
    width = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == width
    assert "Exchange RoundRobinPartitioning" in _plan(out)
    # row set unchanged
    assert sorted(r.id for r in out.collect()) == list(range(100))


def test_many_file_input_is_left_alone(spark, tmp_path):
    width = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "wide")
    spark.range(width * 8).repartition(width).write.parquet(p)
    n_files = len(glob.glob(os.path.join(p, "*.parquet")))
    assert n_files >= max(1, width // 2)
    df = spark.read.parquet(p)
    out = fan_out_scan(df)
    assert out is df  # no-op: no exchange added at scale-like layouts


def test_in_memory_input_is_left_alone(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    assert fan_out_scan(df) is df


def test_pushdown_survives_the_fan_out(spark, tmp_path):
    p = str(tmp_path / "pushdown")
    spark.range(100).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS k", "id * 2 AS v"
    ).coalesce(1).write.parquet(p)
    df = fan_out_scan(spark.read.parquet(p))
    plan = _plan(df.filter("k = '1'").select("id"))
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,1)]" in plan
    assert "struct<id:bigint,k:string>" in plan  # pruned to used columns
