"""MERGE INTO / DELETE for plain-parquet tables (operators/merge.py)."""

import glob
import os

from pyspark.sql import functions as F

from scio_spark.operators.merge import _OLD_SUFFIX as OLD
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
    aside copy remain, and the target is live."""
    t = str(tmp_path / "t")
    base_df(spark).write.parquet(t)
    src = spark.createDataFrame([(0, 0, "v1")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"])
    assert (0, 0, "v1") in rows(spark, t)
    assert not os.path.exists(t + "__merge_tmp")
    assert not os.path.exists(t + OLD)


def test_merge_retry_after_mid_swap_crash_restores_history(spark, tmp_path):
    """ADVICE r6: a crash between _swap_table's rename-aside and
    rename-into-place leaves the target absent with the aside copy intact.
    A retried merge_into must restore the aside copy first — NOT treat
    the table as new and write source-only rows."""
    import shutil

    t = str(tmp_path / "t")
    base_df(spark).write.parquet(t)
    # simulate the crash window: target renamed aside, tmp never landed
    shutil.move(t, t + OLD)
    assert not os.path.exists(t)
    src = spark.createDataFrame([(0, 0, "v1")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"])
    got = rows(spark, t)
    assert (0, 0, "v1") in got
    assert (99, 3, "v0") in got  # history survived the retry
    assert len(got) == 100
    assert not os.path.exists(t + OLD)


def test_delete_retry_after_mid_swap_crash_restores_history(spark, tmp_path):
    import shutil

    t = str(tmp_path / "t")
    base_df(spark).write.parquet(t)
    shutil.move(t, t + OLD)
    delete_where(spark, t, "id < 10")
    got = rows(spark, t)
    assert len(got) == 90 and (50, 2, "v0") in got


def test_partitioned_merge_retry_after_mid_swap_crash(spark, tmp_path):
    """Partition-level crash window: rename-aside left bucket=0 absent with
    bucket=0's aside copy intact. A retried partitioned merge must restore it
    before reading, not rebuild the partition from source alone."""
    import shutil

    t = str(tmp_path / "t")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    shutil.move(f"{t}/bucket=0", f"{t}/bucket=0{OLD}")
    src = spark.createDataFrame([(0, 0, "v1")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"], partition_col="bucket")
    got = rows(spark, t)
    assert (0, 0, "v1") in got and (4, 0, "v0") in got  # history back
    assert len(got) == 100
    assert not os.path.isdir(f"{t}/bucket=0{OLD}")


def test_partitioned_merge_cleans_stale_aside_with_live_sibling(spark, tmp_path):
    """The post-replace pre-cleanup crash: a bucket=1 aside copy beside a live
    bucket=1 — the live data is newer; the aside must be dropped, not
    restored over it."""
    import shutil

    t = str(tmp_path / "t")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    shutil.copytree(f"{t}/bucket=1", f"{t}/bucket=1{OLD}")
    src = spark.createDataFrame([(1, 1, "v1")], "id long, bucket long, val string")
    merge_into(t, src, keys=["id"], partition_col="bucket")
    got = rows(spark, t)
    assert (1, 1, "v1") in got and len(got) == 100
    assert not os.path.isdir(f"{t}/bucket=1{OLD}")


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
    assert not os.path.exists(p + OLD)


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
    target ABSENT with the aside copy intact; the next compaction must
    recover it instead of failing on the missing path. A leftover aside
    WITH a live target (post-replace crash) is dropped."""
    from scio_spark.operators.merge import compact_parquet

    t = str(tmp_path / "t")
    base_df(spark).repartition(8).write.parquet(t)
    want = rows(spark, t)
    # simulate the mid-swap crash: target renamed aside, never replaced
    os.rename(t, t + OLD)
    n = compact_parquet(spark, t, target_file_bytes=1 << 30)
    assert n == 1
    assert rows(spark, t) == want
    assert not os.path.exists(t + OLD)
    # post-replace crash leftover: live target + stale aside -> aside dies
    os.makedirs(t + OLD)
    compact_parquet(spark, t, target_file_bytes=1 << 30)
    assert rows(spark, t) == want
    assert not os.path.exists(t + OLD)


def test_delete_where_keeps_null_predicate_rows_both_paths(spark, tmp_path):
    """SQL DELETE removes only rows where the predicate is TRUE; a row
    where it evaluates to NULL must SURVIVE — in both the whole-table and
    the partition-pruned paths (a NOT(pred) filter would silently delete
    it, and only in some partitions)."""
    for part_col in (None, "bucket"):
        t = str(tmp_path / f"nullpred_{part_col}")
        df = spark.createDataFrame(
            [(1, 5, 0), (2, None, 0), (3, 50, 1), (4, None, 1)],
            "id int, score int, bucket int",
        )
        df.write.partitionBy("bucket").parquet(t)
        delete_where(spark, t, "score < 10", partition_col=part_col)
        kept = sorted(r.id for r in spark.read.parquet(t).collect())
        assert kept == [2, 3, 4], f"partition_col={part_col}: kept {kept}"


def test_compact_parquet_preserves_partition_layout(spark, tmp_path):
    """Compacting a hive-partitioned table must keep the col=value
    directory structure (a flat rewrite breaks the pruned merge/delete
    paths that glob on it) — and a pruned delete must still work after."""
    import os

    from scio_spark.operators.merge import compact_parquet

    t = str(tmp_path / "partcompact")
    spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(300)], "id int, bucket int, v int"
    ).repartition(10).write.partitionBy("bucket").parquet(t)
    compact_parquet(spark, t, target_file_bytes=1 << 30)
    dirs = {d for d in os.listdir(t) if d.startswith("bucket=")}
    assert dirs == {"bucket=0", "bucket=1", "bucket=2"}
    assert spark.read.parquet(t).count() == 300
    delete_where(spark, t, "bucket = 1", partition_col="bucket")
    assert sorted(
        r.bucket for r in spark.read.parquet(t).select("bucket").distinct().collect()
    ) == [0, 2]


def test_boolean_partition_full_delete_removes_directory(spark, tmp_path):
    """Spark writes boolean partition dirs as 'flag=true'; the cleanup of
    a fully-deleted partition must derive the SAME name (Python str()
    would produce 'flag=True' and leave the dead directory to resurface
    its rows)."""
    import os

    t = str(tmp_path / "boolpart")
    spark.createDataFrame(
        [(1, True), (2, True), (3, False)], "id int, flag boolean"
    ).write.partitionBy("flag").parquet(t)
    delete_where(spark, t, "flag = true", partition_col="flag")
    assert not os.path.isdir(f"{t}/flag=true")
    assert sorted(r.id for r in spark.read.parquet(t).collect()) == [3]


def test_float_partition_values_rejected_actionably(spark, tmp_path):
    import pytest

    from scio_spark.operators.merge import _escape_part_value

    with pytest.raises(ValueError, match="float partition"):
        _escape_part_value(1e-7)


def test_recover_swap_ignores_partition_value_ending_in_old(spark, tmp_path):
    """A REAL partition whose value literally ends in '__old' must not be
    mistaken for a crashed swap's aside copy and deleted — the aside
    suffix contains a raw '%', which Spark always escapes in partition
    values, so no collision is possible."""
    import os

    from scio_spark.operators.merge import _recover_swap

    t = str(tmp_path / "oldval")
    spark.createDataFrame(
        [(1, "a"), (2, "a__old")], "id int, v string"
    ).write.partitionBy("v").parquet(t)
    assert os.path.isdir(f"{t}/v=a__old")
    _recover_swap(spark, t)
    assert os.path.isdir(f"{t}/v=a__old"), "real partition destroyed"
    assert sorted(r.id for r in spark.read.parquet(t).collect()) == [1, 2]


def test_semi_join_prune_above_isin_max(spark, tmp_path, monkeypatch):
    """Above _ISIN_PRUNE_MAX affected partitions the prune switches from a
    literal isin to a broadcast left-semi join (constant plan size); the
    two branches must be result-identical AND both must leave untouched
    partitions' files byte-identical."""
    import scio_spark.operators.merge as M

    monkeypatch.setattr(M, "_ISIN_PRUNE_MAX", 2)
    t = str(tmp_path / "semiprune")
    base_df(spark).write.partitionBy("bucket").parquet(t)
    before = {
        f: os.path.getmtime(f) for f in glob.glob(f"{t}/bucket=3/*.parquet")
    }
    # 3 affected partitions > patched max of 2 -> semi-join branch
    src = spark.createDataFrame(
        [(0, 0, "v1"), (1, 1, "v1"), (2, 2, "v1"), (300, 0, "new")],
        "id long, bucket long, val string",
    )
    merge_into(t, src, keys=["id"], partition_col="bucket")
    got = rows(spark, t)
    assert (0, 0, "v1") in got and (1, 1, "v1") in got and (2, 2, "v1") in got
    assert (300, 0, "new") in got and (0, 0, "v0") not in got
    assert (3, 3, "v0") in got and len(got) == 101
    after = {
        f: os.path.getmtime(f) for f in glob.glob(f"{t}/bucket=3/*.parquet")
    }
    assert before == after, "untouched partition rewritten by semi-join branch"
    # delete_where takes the same branch
    delete_where(spark, t, "id < 2", partition_col="bucket")
    got = rows(spark, t)
    assert (0, 0, "v1") not in got and (1, 1, "v1") not in got
    assert (2, 2, "v1") in got and len(got) == 99


def test_compact_splits_large_partition_to_multiple_files(spark, tmp_path):
    """A partition whose bytes exceed target_file_bytes must come out of
    compact_parquet as >1 file (the per-partition salt), not one oversized
    file; small partitions still collapse to one file each."""
    from scio_spark.operators.merge import compact_parquet

    t = str(tmp_path / "saltsplit")
    spark.createDataFrame(
        [(i, 0 if i < 5000 else 1, "x" * 100) for i in range(5100)],
        "id long, bucket int, pad string",
    ).repartition(8).write.partitionBy("bucket").parquet(t)
    big = sum(
        os.path.getsize(f) for f in glob.glob(f"{t}/bucket=0/*.parquet")
    )
    small = sum(
        os.path.getsize(f) for f in glob.glob(f"{t}/bucket=1/*.parquet")
    )
    target = big // 3  # bucket=0 wants >=3 splits
    n = compact_parquet(spark, t, target_file_bytes=target)
    files0 = glob.glob(f"{t}/bucket=0/*.parquet")
    files1 = glob.glob(f"{t}/bucket=1/*.parquet")
    assert len(files0) > 1, "large partition collapsed to one file"
    # small partition gets at most its own byte-derived split count (hash
    # collisions may merge salt groups, never split them)
    assert len(files1) <= max(1, -(-small // target))
    assert n >= 4
    df = spark.read.parquet(t)
    assert df.count() == 5100
    assert df.filter("bucket = 0").count() == 5000


def test_compact_rejects_nested_partition_layout(spark, tmp_path):
    import pytest

    from scio_spark.operators.merge import compact_parquet

    t = str(tmp_path / "nested")
    spark.createDataFrame(
        [(1, 0, 0), (2, 0, 1), (3, 1, 0)], "id int, a int, b int"
    ).write.partitionBy("a", "b").parquet(t)
    with pytest.raises(ValueError, match="single-level"):
        compact_parquet(spark, t, target_file_bytes=1 << 30)


def test_legacy_old_restore_requires_crash_evidence(spark, tmp_path):
    """A bare '<target>__old' sibling is restored ONLY alongside a tmp dir
    proving a crashed swap; without one it could be an unrelated user
    directory and must be left untouched."""
    import shutil

    import pytest as _pytest

    t = str(tmp_path / "legacy")
    base_df(spark).write.parquet(t)
    # unrelated sibling, no tmp evidence -> NOT claimed as the table,
    # but the operator is warned (it might be a hand-cleaned crash)
    os.rename(t, t + "__old")
    src = spark.createDataFrame([(7, 0, "a")], "id long, bucket long, val string")
    with _pytest.warns(UserWarning, match="NOT restoring"):
        merge_into(t, src, keys=["id"])
    assert rows(spark, t) == {(7, 0, "a")}, "unrelated __old dir was claimed"
    assert os.path.isdir(t + "__old"), "unrelated __old dir was consumed"
    shutil.rmtree(t)
    shutil.rmtree(t + "__old")
    # crashed pre-upgrade swap: __old aside AND a __merge_tmp sibling
    base_df(spark).write.parquet(t)
    os.rename(t, t + "__old")
    spark.createDataFrame(
        [(999, 0, "tmp")], "id long, bucket long, val string"
    ).write.parquet(t + "__merge_tmp")
    merge_into(t, src, keys=["id"])
    got = rows(spark, t)
    assert (7, 0, "a") in got and (1, 1, "v0") in got, "history dropped"
    assert (7, 3, "v0") not in got  # key 7 upserted, not duplicated
    assert len(got) == 100
    assert not os.path.isdir(t + "__old")


def test_unescape_part_dirname_roundtrips_escape():
    """_unescape_part_dirname must invert _escape_part_value for every
    directory-renderable value (property: unescape(escape(s)) == s)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from scio_spark.operators.merge import (
        _escape_part_value,
        _unescape_part_dirname,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=0, max_size=40))
    def prop(s):
        assert _unescape_part_dirname(_escape_part_value(s)) == s

    prop()
    assert _unescape_part_dirname(_escape_part_value(None)) is None
    for v in ("a=b", "x/y", "100%", "a__old", "", "%", "%2", "%ZZ", "café"):
        assert _unescape_part_dirname(_escape_part_value(v)) == v


def test_compact_matches_type_normalized_partition_dirs(spark, tmp_path):
    """Partition dirs written from string '01' are read back as int 1 by
    Spark's partition-type inference; the split-map join must match on the
    TYPED value (cast dir-string to the inferred type), else the partition
    silently collapses to one file regardless of size."""
    from scio_spark.operators.merge import compact_parquet

    t = str(tmp_path / "typednorm")
    spark.createDataFrame(
        [(i, "01" if i < 4000 else "02", "y" * 120) for i in range(4100)],
        "id long, part string, pad string",
    ).repartition(8).write.partitionBy("part").parquet(t)
    # inference reads the dirs back as int
    assert dict(spark.read.parquet(t).dtypes)["part"] in ("int", "bigint")
    bigdir = [d for d in os.listdir(t) if d.startswith("part=")]
    big = sum(
        os.path.getsize(f)
        for d in bigdir
        for f in glob.glob(f"{t}/{d}/*.parquet")
        if "=1" in d or "=01" in d
    )
    n = compact_parquet(spark, t, target_file_bytes=max(1, big // 3))
    bigfiles = glob.glob(f"{t}/part=1/*.parquet") + glob.glob(
        f"{t}/part=01/*.parquet"
    )
    assert len(bigfiles) > 1, "type-normalized partition missed the split map"
    assert spark.read.parquet(t).count() == 4100


def test_compact_dedups_colliding_typed_partition_dirs(spark, tmp_path):
    """Mixed-writer layouts can hold BOTH part=01 and part=1 on disk; type
    inference reads both as int 1, so the split map must aggregate by the
    TYPED value before the left join — two rows with the same __part_val
    would duplicate every row of that partition in the rewrite."""
    from scio_spark.operators.merge import compact_parquet

    t = str(tmp_path / "collide")
    spark.createDataFrame(
        [(i, "01" if i % 2 == 0 else "1") for i in range(100)]
        + [(i, "2") for i in range(100, 120)],
        "id long, part string",
    ).write.partitionBy("part").parquet(t)
    assert os.path.isdir(f"{t}/part=01") and os.path.isdir(f"{t}/part=1")
    assert dict(spark.read.parquet(t).dtypes)["part"] in ("int", "bigint")
    compact_parquet(spark, t, target_file_bytes=1 << 30)
    df = spark.read.parquet(t)
    assert df.count() == 120, "colliding dirs duplicated partition rows"
    assert df.filter("part = 1").count() == 100
    assert df.filter("part = 2").count() == 20


def test_compact_tolerates_map_columns(spark, tmp_path):
    """xxhash64 rejects MapType; the compaction salt must skip such
    columns instead of failing analysis on a previously-compactable
    table."""
    from scio_spark.operators.merge import compact_parquet

    t = str(tmp_path / "mapcol")
    spark.createDataFrame(
        [(i, i % 2, {"k": str(i)}) for i in range(50)],
        "id long, bucket int, attrs map<string,string>",
    ).write.partitionBy("bucket").parquet(t)
    compact_parquet(spark, t, target_file_bytes=1 << 30)
    df = spark.read.parquet(t)
    assert df.count() == 50
    assert df.filter("attrs['k'] = '7'").count() == 1


def test_compact_partition_column_only_table_still_splits(spark, tmp_path):
    """Degenerate salt case: a table with no HASHABLE non-partition
    columns (Spark forbids partitioning on every column, so map-only data
    columns are the realizable case) falls back to an input-split-derived
    salt, so a huge partition read as several splits still produces >1
    file instead of silently collapsing."""
    from scio_spark.operators.merge import compact_parquet

    t = str(tmp_path / "partonly")
    spark.range(20000).select(
        (F.col("id") % 2).alias("bucket"),
        F.create_map(F.lit("v"), F.col("id").cast("string")).alias("attrs"),
    ).repartition(16).write.partitionBy("bucket").parquet(t)
    big = sum(os.path.getsize(f) for f in glob.glob(f"{t}/bucket=0/*.parquet"))
    conf = spark.conf
    old_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    old_open = conf.get("spark.sql.files.openCostInBytes")
    try:
        # force one read split per input file so the fallback salt varies
        conf.set("spark.sql.files.maxPartitionBytes", "1024")
        conf.set("spark.sql.files.openCostInBytes", "0")
        compact_parquet(spark, t, target_file_bytes=max(1, big // 4))
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        conf.set("spark.sql.files.openCostInBytes", old_open)
    assert len(glob.glob(f"{t}/bucket=0/*.parquet")) > 1
    df = spark.read.parquet(t)
    assert df.count() == 20000
    assert df.filter("bucket = 0").count() == 10000
