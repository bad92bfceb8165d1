"""MERGE INTO / DELETE for plain-parquet tables (operators/merge.py)."""

import glob
import os

from pyspark.sql import functions as F

from scio_spark.operators.merge import delete_where, merge_into


def base_df(spark):
    # 100 rows over 4 partitions (bucket = id % 4)
    return spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).alias("bucket"),
        F.lit("v0").alias("val"),
    )


def rows(spark, path):
    return {
        (r.id, r.bucket, r.val) for r in spark.read.parquet(path).collect()
    }


def test_merge_updates_and_inserts_partitioned(spark, tmp_path):
    t = str(tmp_path / "t")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    # update ids 0,4 (bucket 0) and insert 200 (bucket 0), 201 (bucket 1)
    src = spark.createDataFrame(
        [(0, 0, "v1"), (4, 0, "v1"), (200, 0, "new"), (201, 1, "new")],
        "id long, bucket long, val string",
    )
    merge_into(t, src, keys=["id"], partition_col="bucket")
    got = rows(spark, t)
    assert (0, 0, "v1") in got and (4, 0, "v1") in got
    assert (0, 0, "v0") not in got
    assert (200, 0, "new") in got and (201, 1, "new") in got
    # untouched rows of other partitions intact
    assert (2, 2, "v0") in got and (3, 3, "v0") in got
    assert len(got) == 102


def test_merge_prunes_untouched_partitions(spark, tmp_path):
    """Files of partitions the source doesn't touch must be byte-identical
    after the merge (proof the rewrite is pruned, not global)."""
    t = str(tmp_path / "t")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{t}/bucket=2/*.parquet")
        + glob.glob(f"{t}/bucket=3/*.parquet")
    }
    src = spark.createDataFrame([(0, 0, "v1")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"], partition_col="bucket")
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{t}/bucket=2/*.parquet")
        + glob.glob(f"{t}/bucket=3/*.parquet")
    }
    assert before == after  # same files, same mtimes — never rewritten


def test_merge_creates_table_when_absent(spark, tmp_path):
    t = str(tmp_path / "fresh")
    src = spark.createDataFrame([(1, 0, "a")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"], partition_col="bucket")
    assert rows(spark, t) == {(1, 0, "a")}


def test_merge_unpartitioned_full_rewrite(spark, tmp_path):
    t = str(tmp_path / "flat")
    base_df(spark).drop("bucket").withColumn("bucket", F.lit(0)).write.parquet(t)
    src = spark.createDataFrame([(0, 0, "v1"), (500, 0, "new")],
                                "id long, bucket long, val string")
    merge_into(t, src, keys=["id"])
    got = rows(spark, t)
    assert (0, 0, "v1") in got and (500, 0, "new") in got and len(got) == 101


def test_merge_idempotent_rerun(spark, tmp_path):
    t = str(tmp_path / "t")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    src = spark.createDataFrame([(0, 0, "v1")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"], partition_col="bucket")
    first = rows(spark, t)
    merge_into(t, src, keys=["id"], partition_col="bucket")  # retry
    assert rows(spark, t) == first


def test_delete_where_partitioned(spark, tmp_path):
    t = str(tmp_path / "t")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    delete_where(spark, t, "id < 8", partition_col="bucket")
    got = rows(spark, t)
    assert all(i >= 8 for i, _, _ in got)
    assert len(got) == 92


def test_delete_removes_emptied_partition(spark, tmp_path):
    t = str(tmp_path / "t")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    delete_where(spark, t, "bucket = 1", partition_col="bucket")
    assert not glob.glob(f"{t}/bucket=1")
    got = rows(spark, t)
    assert len(got) == 75 and all(b != 1 for _, b, _ in got)


def test_merge_rejects_null_partition_values(spark, tmp_path):
    """ADVICE r5: NULL partition values can't be pruned with isin (NULL
    never matches) and would silently drop the target's null-partition
    rows — the pruned path must refuse them loudly."""
    import pytest

    t = str(tmp_path / "t")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    src = spark.createDataFrame(
        [(0, None, "v1")], "id long, bucket long, val string"
    )
    with pytest.raises(ValueError, match="NULL"):
        merge_into(t, src, keys=["id"], partition_col="bucket")
    # target untouched
    assert (0, 0, "v0") in rows(spark, t)


def test_delete_removes_emptied_partition_with_escaped_value(spark, tmp_path):
    """ADVICE r5: a fully-deleted partition whose value needs directory
    escaping (here ':' -> %3A) must actually be removed from disk, not
    left to resurface its rows."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a:b", "x"), (2, "a:b", "y"), (3, "plain", "z")],
        "id long, part string, val string",
    )
    df.write.partitionBy("part").parquet(t)
    assert os.path.isdir(f"{t}/part=a%3Ab")
    delete_where(spark, t, "part = 'a:b'", partition_col="part")
    assert not os.path.isdir(f"{t}/part=a%3Ab")
    got = {(r.id, r.part, r.val) for r in spark.read.parquet(t).collect()}
    assert got == {(3, "plain", "z")}


def test_unpartitioned_swap_never_leaves_target_missing(spark, tmp_path):
    """ADVICE r5: the whole-table swap renames the old table aside before
    renaming tmp into place — after a successful merge neither tmp nor the
    __old copy remain, and the target is live."""
    t = str(tmp_path / "t")
    base_df(spark).write.parquet(t)
    src = spark.createDataFrame([(0, 0, "v1")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"])
    assert (0, 0, "v1") in rows(spark, t)
    assert not os.path.exists(t + "__merge_tmp")
    assert not os.path.exists(t + "__old")


def test_merge_retry_after_mid_swap_crash_restores_history(spark, tmp_path):
    """ADVICE r6: a crash between _swap_table's rename-aside and
    rename-into-place leaves the target absent with target__old intact.
    A retried merge_into must restore the aside copy first — NOT treat
    the table as new and write source-only rows."""
    import shutil

    t = str(tmp_path / "t")
    base_df(spark).write.parquet(t)
    # simulate the crash window: target renamed aside, tmp never landed
    shutil.move(t, t + "__old")
    assert not os.path.exists(t)
    src = spark.createDataFrame([(0, 0, "v1")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"])
    got = rows(spark, t)
    assert (0, 0, "v1") in got
    assert (99, 3, "v0") in got  # history survived the retry
    assert len(got) == 100
    assert not os.path.exists(t + "__old")


def test_delete_retry_after_mid_swap_crash_restores_history(spark, tmp_path):
    import shutil

    t = str(tmp_path / "t")
    base_df(spark).write.parquet(t)
    shutil.move(t, t + "__old")
    delete_where(spark, t, "id < 10")
    got = rows(spark, t)
    assert len(got) == 90 and (50, 2, "v0") in got


def test_partitioned_merge_retry_after_mid_swap_crash(spark, tmp_path):
    """Partition-level crash window: rename-aside left bucket=0 absent with
    bucket=0__old intact. A retried partitioned merge must restore it
    before reading, not rebuild the partition from source alone."""
    import shutil

    t = str(tmp_path / "t")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    shutil.move(f"{t}/bucket=0", f"{t}/bucket=0__old")
    src = spark.createDataFrame([(0, 0, "v1")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"], partition_col="bucket")
    got = rows(spark, t)
    assert (0, 0, "v1") in got and (4, 0, "v0") in got  # history back
    assert len(got) == 100
    assert not os.path.isdir(f"{t}/bucket=0__old")


def test_partitioned_merge_cleans_stale_aside_with_live_sibling(spark, tmp_path):
    """The post-replace pre-cleanup crash: bucket=1__old beside a live
    bucket=1 — the live data is newer; the aside must be dropped, not
    restored over it."""
    import shutil

    t = str(tmp_path / "t")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    shutil.copytree(f"{t}/bucket=1", f"{t}/bucket=1__old")
    src = spark.createDataFrame([(1, 1, "v1")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"], partition_col="bucket")
    got = rows(spark, t)
    assert (1, 1, "v1") in got and len(got) == 100
    assert not os.path.isdir(f"{t}/bucket=1__old")


def test_snapshot_diff_statuses(spark):
    from scio_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id int, txt string, v int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, "", 40), (5, "e", 50)],
        "id int, txt string, v int",
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, "id").collect()}
    # id 4: NULL -> '' must count as changed (null-tagged hash)
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "changed",
        5: "added",
    }


def test_snapshot_diff_subset_columns(spark):
    from scio_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1)], "id int, txt string, seen int")
    new = spark.createDataFrame([(1, "a", 2)], "id int, txt string, seen int")
    all_cols = {r.id: r.status for r in snapshot_diff(old, new, "id").collect()}
    only_txt = {
        r.id: r.status
        for r in snapshot_diff(old, new, "id", compare_cols=["txt"]).collect()
    }
    assert all_cols == {1: "changed"}
    assert only_txt == {1: "unchanged"}


def test_compact_parquet_shrinks_files_preserves_content(spark, tmp_path):
    import glob

    from scio_spark.operators.merge import compact_parquet

    p = str(tmp_path / "frag")
    df = spark.range(0, 5000).withColumn("v", F.col("id") * 2)
    # fragment: 50 tiny files
    df.repartition(50).write.mode("overwrite").parquet(p)
    before = len(glob.glob(f"{p}/part-*"))
    assert before == 50
    before_sum = spark.read.parquet(p).agg(F.sum("v")).collect()[0][0]

    n = compact_parquet(spark, p, target_file_bytes=10 * 1024 * 1024)
    after_files = glob.glob(f"{p}/part-*")
    assert len(after_files) < before
    assert len(after_files) == n
    after = spark.read.parquet(p)
    assert after.count() == 5000
    assert after.agg(F.sum("v")).collect()[0][0] == before_sum
    # no leftover staging dirs
    import os
    assert not os.path.exists(p + "__compact")
    assert not os.path.exists(p + "__old")


def test_compact_parquet_sorted_layout(spark, tmp_path):
    from scio_spark.operators.merge import compact_parquet

    p = str(tmp_path / "frag2")
    spark.range(0, 1000).withColumn("k", (F.col("id") * 37) % 100).repartition(
        20
    ).write.mode("overwrite").parquet(p)
    compact_parquet(spark, p, target_file_bytes=1 << 30, sort_by=["k"])
    # single output file, globally sorted within it
    vals = [r.k for r in spark.read.parquet(p).collect()]
    assert vals == sorted(vals)


def test_snapshot_diff_separator_in_value_not_aliased(spark):
    """The content hash is length-prefixed: a value CONTAINING the \\x1f
    separator must not shift content across column boundaries —
    ('x\\x1fv123:y', 'z') vs ('x', 'y\\x1fv123:z') are CHANGED, not
    'unchanged'."""
    from scio_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "x\x1fv1:y", "z")], "id int, a string, b string"
    )
    new = spark.createDataFrame(
        [(1, "x", "y\x1fv1:z")], "id int, a string, b string"
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, "id").collect()}
    assert got == {1: "changed"}


def test_snapshot_diff_empty_vs_null_distinguished(spark):
    from scio_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "")], "id int, a string")
    new = spark.createDataFrame([(1, None)], "id int, a string")
    got = {r.id: r.status for r in snapshot_diff(old, new, "id").collect()}
    assert got == {1: "changed"}


def test_compact_parquet_self_heals_crashed_swap(spark, tmp_path):
    """A crash between rename-aside and rename-into-place leaves the
    target ABSENT with target__old intact; the next compaction must
    recover it instead of failing on the missing path. A leftover __old
    WITH a live target (post-replace crash) is dropped."""
    from scio_spark.operators.merge import compact_parquet

    t = str(tmp_path / "t")
    base_df(spark).repartition(8).write.parquet(t)
    want = rows(spark, t)
    # simulate the mid-swap crash: target renamed aside, never replaced
    os.rename(t, t + "__old")
    n = compact_parquet(spark, t, target_file_bytes=1 << 30)
    assert n == 1
    assert rows(spark, t) == want
    assert not os.path.exists(t + "__old")
    # post-replace crash leftover: live target + stale aside -> aside dies
    os.makedirs(t + "__old")
    compact_parquet(spark, t, target_file_bytes=1 << 30)
    assert rows(spark, t) == want
    assert not os.path.exists(t + "__old")
