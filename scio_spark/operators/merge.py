"""MERGE INTO / DELETE for plain-parquet tables, partition-pruned.

Beyond-reference table-maintenance primitive. The reference leaves table
upserts to the warehouse (BigQuery MERGE) or a table format; on a plain
parquet lake the idiomatic mechanics are the ones
``streaming.core.maintain_rollup`` uses for its continuous aggregate —
this module generalizes them into a batch API:

1. find the partitions the source touches (small distinct collect),
2. read ONLY those partitions of the target (``isin`` on the partition
   column → static directory pruning; table history is never re-scanned),
3. anti-join out the matched keys, union the source rows,
4. write the merged partitions to a sibling temp dir (fully distributed,
   one file per partition directory via repartition(part_col)),
5. swap each partition directory in with Hadoop-FS renames — idempotent
   under retry, atomic per partition.

Without a partition column the operation degrades to a documented full
rewrite (still distributed and atomic-by-rename) — correct, but at 100 TB
partition your tables. With a table format available (Delta/Iceberg) the
same call maps to a real MERGE; this is the format-less fallback with the
same pruning property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath, hpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _swap_partitions(spark: SparkSession, tmp: str, target: str, part_col: str):
    jvm, tmp_path, fs = _fs(spark, tmp)
    HPath = jvm.org.apache.hadoop.fs.Path
    tgt = HPath(target)
    if not fs.exists(tmp_path):
        return  # nothing produced (e.g. delete emptied every partition)
    if not fs.exists(tgt):
        fs.mkdirs(tgt)
    for st in fs.listStatus(tmp_path):
        name = st.getPath().getName()
        if not name.startswith(part_col + "="):
            continue
        dest = HPath(tgt, name)
        if fs.exists(dest):
            fs.delete(dest, True)
        fs.rename(st.getPath(), dest)
    fs.delete(tmp_path, True)


def merge_into(
    target_path: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
) -> None:
    """Upsert ``source`` into the parquet table at ``target_path``: target
    rows whose key matches a source row are replaced, unmatched source
    rows are inserted, everything else is untouched. With
    ``partition_col`` (a source/target column), only the partitions the
    source touches are read and rewritten. Source must contain every
    target column; the source's own rows win on key collisions inside the
    source (keep the latest upstream).

    Pruned-merge contract (the same one every partition-pruned MERGE
    carries): ``partition_col`` must be a stable function of the key — a
    key that "moves" partitions between target and source would leave its
    old row untouched in an unread partition. Partition values should be
    primitive ints/dates/simple strings (directory names use Spark's
    partition encoding)."""
    spark = source.sparkSession
    jvm, tgt_path, fs = _fs(spark, target_path)
    HPath = jvm.org.apache.hadoop.fs.Path

    if partition_col is None:
        exists = fs.exists(tgt_path)
        if exists:
            target = spark.read.parquet(target_path)
            keep = target.join(source.select(*keys).distinct(), keys, "left_anti")
            merged = source.unionByName(keep.select(*source.columns))
        else:
            merged = source
        tmp = target_path.rstrip("/") + "__merge_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if fs.exists(tgt_path):
            fs.delete(tgt_path, True)
        fs.rename(HPath(tmp), tgt_path)
        return

    affected = [
        r[partition_col]
        for r in source.select(partition_col).distinct().collect()
    ]
    if not affected:
        return
    table_exists = bool(fs.globStatus(HPath(target_path, partition_col + "=*")))
    merged = source
    if table_exists:
        existing = spark.read.parquet(target_path).filter(
            F.col(partition_col).isin(affected)
        )
        keep = existing.join(source.select(*keys).distinct(), keys, "left_anti")
        merged = source.unionByName(keep.select(*source.columns))
    tmp = target_path.rstrip("/") + "__merge_tmp"
    tmp_hp = HPath(tmp)
    if fs.exists(tmp_hp):
        fs.delete(tmp_hp, True)
    (
        merged.repartition(partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    _swap_partitions(spark, tmp, target_path, partition_col)


def delete_where(
    spark: SparkSession,
    target_path: str,
    predicate: str,
    partition_col: str | None = None,
) -> None:
    """Delete rows matching ``predicate`` from the parquet table. With
    ``partition_col``, only partitions that contain matching rows are
    rewritten (found with one pruned aggregate); others are untouched."""
    jvm, tgt_path, fs = _fs(spark, target_path)
    HPath = jvm.org.apache.hadoop.fs.Path
    target = spark.read.parquet(target_path)
    if partition_col is None:
        remaining = target.filter(f"NOT ({predicate})")
        tmp = target_path.rstrip("/") + "__delete_tmp"
        remaining.write.mode("overwrite").parquet(tmp)
        fs.delete(tgt_path, True)
        fs.rename(HPath(tmp), tgt_path)
        return
    affected = [
        r[partition_col]
        for r in target.filter(predicate).select(partition_col).distinct().collect()
    ]
    if not affected:
        return
    remaining = target.filter(F.col(partition_col).isin(affected)).filter(
        f"NOT ({predicate})"
    )
    tmp = target_path.rstrip("/") + "__delete_tmp"
    tmp_hp = HPath(tmp)
    if fs.exists(tmp_hp):
        fs.delete(tmp_hp, True)
    (
        remaining.repartition(partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    # a partition whose every row matched produces no tmp dir — it must be
    # DELETED from the target, not left stale; handle both cases
    jvm2, tmp_path2, fs2 = _fs(spark, tmp)
    produced = {
        st.getPath().getName()
        for st in fs2.listStatus(tmp_path2)
        if st.getPath().getName().startswith(partition_col + "=")
    } if fs2.exists(tmp_path2) else set()
    for v in affected:
        name = f"{partition_col}={v}"
        if name not in produced:
            dead = HPath(tgt_path, name)
            if fs.exists(dead):
                fs.delete(dead, True)
    _swap_partitions(spark, tmp, target_path, partition_col)
