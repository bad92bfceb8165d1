"""Plan-efficiency asserts (SURVEY §7 step 5: EXPLAIN asserts in tests).

These pin the *physical* properties the 100 TB design depends on: broadcast
joins stay broadcast, parquet predicates reach the scan, bucketed (SMB)
layouts join and aggregate without exchanges."""

import pytest
from pyspark.sql import functions as F

from scio_spark.operators import smb
from scio_spark.plans import lint

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def no_broadcast(spark):
    """Force SMJ paths so bucketing (not broadcast) explains shuffle-freedom."""
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_filter_pushed_to_parquet_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        F.col("l_partkey") == 7
    ).select("l_partkey", "l_quantity")
    assert any("l_partkey" in p for p in lint.scan_pushed_filters(df))
    # column pruning: scan must not read all 11 lineitem columns
    schemas = lint.scan_read_schemas(df)
    assert schemas and all("l_extendedprice" not in s for s in schemas)


def test_broadcast_join_no_shuffle_on_big_side(spark):
    big = spark.read.parquet(f"{SF}/lineitem.parquet")
    small = spark.read.parquet(f"{SF}/part.parquet")
    joined = big.join(F.broadcast(small), big.l_partkey == small.p_partkey)
    assert lint.has_broadcast_join(joined)
    assert lint.count_shuffles(joined) == 0


def test_smb_join_is_shuffle_free(spark, no_broadcast):
    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "custkey", F.col("o_custkey")
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet").withColumn(
        "custkey", F.col("c_custkey")
    )
    smb.save_sorted_bucket(orders, "t_smb_orders", "custkey", 4)
    smb.save_sorted_bucket(cust, "t_smb_cust", "custkey", 4)
    joined = smb.sort_merge_join(spark, "t_smb_orders", "t_smb_cust", "custkey")
    assert lint.has_sort_merge_join(joined)
    lint.assert_no_shuffle(joined, "bucketed SMB join")
    # correctness too
    assert joined.count() == orders.count()


def test_smb_group_by_key_is_shuffle_free(spark, no_broadcast):
    agg = smb.sort_merge_group_by_key(
        spark, "t_smb_orders", "custkey", F.count(F.lit(1)).alias("n")
    )
    lint.assert_no_shuffle(agg, "bucketed groupBy")


def test_smb_cogroup_and_bucket_metadata(spark, no_broadcast):
    assert smb.bucket_count(spark, "t_smb_orders") == 4
    cg = smb.sort_merge_cogroup(spark, "t_smb_orders", "t_smb_cust", "custkey")
    lint.assert_no_shuffle(cg, "bucketed cogroup")
    row = cg.filter(F.size("values_1") > 0).limit(1).collect()[0]
    assert isinstance(row["values_1"], list)


def test_smb_transform_preserves_bucketing(spark, no_broadcast):
    smb.sort_merge_transform(
        spark,
        "t_smb_orders",
        "t_smb_orders_x",
        lambda df: df.withColumn("big", F.col("o_totalprice") > 100000),
        "custkey",
    )
    assert smb.bucket_count(spark, "t_smb_orders_x") == 4
    joined = smb.sort_merge_join(spark, "t_smb_orders_x", "t_smb_cust", "custkey")
    lint.assert_no_shuffle(joined, "transform kept bucket layout")


def test_smb_divisible_bucket_counts_join_shuffle_free(spark, no_broadcast):
    """scio's power-of-2 bucket compat (Sort-Merge-Bucket.md:30-33):
    4-bucket ⋈ 8-bucket joins without exchanges when
    coalesceBucketsInJoin is on (the 8-bucket side coalesces to 4)."""
    part = spark.read.parquet(f"{SF}/part.parquet").withColumn(
        "pk", F.col("p_partkey")
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").withColumn(
        "pk", F.col("l_partkey")
    )
    smb.save_sorted_bucket(part, "t_smb_part4", "pk", 4)
    smb.save_sorted_bucket(li, "t_smb_li8", "pk", 8)
    joined = smb.sort_merge_join(spark, "t_smb_li8", "t_smb_part4", "pk")
    lint.assert_no_shuffle(joined, "divisible bucket counts (8 vs 4)")
    assert joined.count() > 0


def test_sparse_join_reduces_before_shuffle(spark):
    """sparse_join must semi-join-reduce the big side before the shuffle
    join (the whole point of the operator). With rhs_num_keys UNSTATED the
    keyset size is unknown, so the broadcast is AQE's runtime decision,
    not a static hint (r10 broadcast policy — an unstated keyset could be
    corpus-sized): the semi-join is structural in the initial plan, and
    the executed adaptive plan must show AQE picked a broadcast for this
    small keyset. With rhs_num_keys STATED ≤ the exact-keyset max, the
    broadcast is static."""
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    li = sc.parquet_file(f"{SF}/lineitem.parquet").key_by(partkey="l_partkey")
    rare = (
        sc.parquet_file(f"{SF}/part.parquet")
        .filter("p_size = 1")
        .key_by(partkey="p_partkey")
    )
    # this test exercises AQE's runtime broadcast pick — pin the confs the
    # module-scoped no_broadcast fixture may have toggled for SMB tests
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        out = li.sparse_join(rare, how="inner")
        assert "LeftSemi" in lint.executed_plan(out.df)
        assert out.df.count() > 0  # materialize → AQE finalizes the plan
        final = lint.executed_plan(out.df)
        assert "BroadcastHashJoin" in final and "LeftSemi" in final
        # stated bounded keyset → static broadcast, no execution needed
        stated = li.sparse_join(rare, how="inner", rhs_num_keys=100)
        plan = lint.executed_plan(stated.df)
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_batch_is_shuffle_free(spark):
    """batch() must chunk within partitions — zero exchanges (the docstring's
    claim, now structural): the plan is scan → MapInPandas, nothing else."""
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    batched = sc.parquet_file(f"{SF}/orders.parquet").batch(100)
    lint.assert_no_shuffle(batched.df, "batch() is partition-local")
    assert "MapInPandas" in lint.executed_plan(batched.df)


def test_dynamic_destinations_read_prunes_partitions(spark, tmp_path):
    """A filter on the partitionBy column of a dynamic-destinations layout
    must become a PartitionFilter (directory pruning) — at 100 TB the read
    touches only matching partitions' files, never the full dataset."""
    from scio_spark.sources.formats import save_dynamic

    df = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    out = str(tmp_path / "dyn")
    save_dynamic(df, out, ["o_orderpriority"])
    back = spark.read.parquet(out).filter(F.col("o_orderpriority") == "2-HIGH")
    plan = lint.executed_plan(back)
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_lint_report_flags_antipatterns(spark):
    """lint_report: clean plans return no warnings; cartesian products and
    row-at-a-time Python UDFs are flagged."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udf

    from scio_spark.plans.lint import lint_report

    a = spark.range(100).withColumnRenamed("id", "k")
    b = spark.range(100).withColumnRenamed("id", "k2")

    clean = a.join(b, a.k == b.k2).groupBy("k").count()
    assert lint_report(clean) == []

    cart = a.crossJoin(b)
    assert any("NestedLoop" in w or "Cartesian" in w for w in lint_report(cart))

    slow = a.withColumn("u", udf(lambda x: x + 1, "long")(F.col("k")))
    assert any("BatchEvalPython" in w for w in lint_report(slow))
