"""Arrow IPC IO tests (sources/arrow_ipc.py). pyarrow owns the wire
format; these pin the Spark-side distribution, schema stability under
all-null partitions, compression options, and external readability (a
plain pyarrow reader — the ecosystem's entry point — consumes the
files)."""

import glob

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from scio_spark.sources.arrow_ipc import read_arrow_ipc, save_as_arrow_ipc


def sample(spark, n=1000):
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 0.25).alias("score"),
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("maybe"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
    )


@pytest.mark.parametrize("compression", ["zstd", "lz4", None])
def test_roundtrip(spark, tmp_path, compression):
    df = sample(spark)
    d = str(tmp_path / f"ipc_{compression}")
    manifest = save_as_arrow_ipc(df, d, compression=compression)
    assert sum(m.n_records for m in manifest) == 1000
    back = read_arrow_ipc(spark, d)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_external_pyarrow_reader(spark, tmp_path):
    d = str(tmp_path / "ipc_ext")
    save_as_arrow_ipc(sample(spark, 100), d)
    total = 0
    for f in glob.glob(f"{d}/*.arrow"):
        with pa.ipc.open_file(f) as rdr:
            t = rdr.read_all()
            total += t.num_rows
            assert t.schema.names == ["id", "name", "score", "maybe", "arr"]
    assert total == 100


def test_all_null_partition_keeps_declared_type(spark, tmp_path):
    """Schema comes from the DataFrame, not per-batch pandas inference —
    a partition whose column is entirely null still writes long."""
    df = spark.range(50).select(
        F.col("id"), F.lit(None).cast("long").alias("always_null")
    ).repartition(4)
    d = str(tmp_path / "ipc_nulls")
    save_as_arrow_ipc(df, d)
    back = read_arrow_ipc(spark, d)
    assert dict(back.dtypes)["always_null"] == "bigint"
    assert back.filter("always_null IS NOT NULL").count() == 0


def test_overwrite_replaces(spark, tmp_path):
    d = str(tmp_path / "ow")
    save_as_arrow_ipc(sample(spark, 100), d)
    save_as_arrow_ipc(sample(spark, 7), d)
    assert read_arrow_ipc(spark, d).count() == 7


def test_missing_dir_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_arrow_ipc(spark, str(tmp_path / "nope"))


def test_shard_names_deterministic_for_retries(spark, tmp_path):
    """Filenames derive from the partition id so a retried/speculative
    task replaces its shard instead of duplicating it (same protocol as
    save_as_webdataset)."""
    import os

    df = sample(spark, 300).repartition(3)
    d = str(tmp_path / "ipc_retry")
    save_as_arrow_ipc(df, d, compression=None)
    first = sorted(os.path.basename(p) for p in glob.glob(f"{d}/*.arrow"))
    assert first == [f"part-{i:05d}.arrow" for i in range(3)]
    save_as_arrow_ipc(df, d, compression=None)  # the "retry"
    second = sorted(os.path.basename(p) for p in glob.glob(f"{d}/*.arrow"))
    assert first == second
    assert read_arrow_ipc(spark, d).count() == 300
    assert not glob.glob(f"{d}/*.tmp.*")
