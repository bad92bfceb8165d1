"""Z-order layout tests (functions/layout.py).

The load-bearing test measures the property Z-ordering exists for: after
writing, per-file parquet min/max footers must let a point predicate on
EITHER clustered column skip most files — which a linear sort can only
deliver for its leading column.
"""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from scio_spark.functions.layout import with_z_value, z_value, zorder_by


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(z_value([F.col("a"), F.col("b")], bits=3).alias("z")).head().z
    # bit b of col j → position b*2+j:
    # a=101: bits 0,2 → positions 0,4 ; b=011: bits 0,1 → positions 1,3
    assert z == (1 << 0) | (1 << 4) | (1 << 1) | (1 << 3)


def test_z_value_locality(spark):
    """Nearby points in 2-D get nearby z-values more often than distant
    ones (sanity, not a formal property)."""
    df = spark.range(0, 64).select(
        (F.col("id") % 8).alias("x"), (F.col("id") / 8).cast("long").alias("y")
    )
    rows = df.select("x", "y", z_value([F.col("x"), F.col("y")], 3).alias("z")).collect()
    zmap = {(r.x, r.y): r.z for r in rows}
    assert zmap[(0, 0)] == 0
    assert zmap[(7, 7)] == 63
    # unit steps move z by a bounded amount at even positions
    assert abs(zmap[(2, 2)] - zmap[(3, 2)]) == 1


def test_constant_and_null_columns_degrade_gracefully(spark):
    df = spark.range(10).select(
        F.col("id"), F.lit(5).alias("c"), F.lit(None).cast("long").alias("n")
    )
    out = with_z_value(df, ["id", "c", "n"], bits=4)
    assert out.count() == 10  # no crash; constant/null cols contribute 0


def test_overflow_guard(spark):
    df = spark.range(4).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError, match="overflow"):
        with_z_value(df, ["a", "b"], bits=32)


def _file_skip_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of parquet files whose [min,max] of ``col`` does not
    intersect [lo, hi] — files a reader skips via footer stats alone."""
    files = glob.glob(f"{path}/*.parquet")
    assert files
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins and (hi < min(mins) or lo > max(maxs)):
            skipped += 1
    return skipped / len(files)


def test_zorder_prunes_on_both_dims(spark, tmp_path):
    """The headline property: z-ordered files skip on BOTH columns; a
    linear sort on x skips on x but nearly never on y."""
    n = 200_000
    # non-negative uniform values so the probe point 0 is a CORNER of the
    # 2-D space (a mid-range probe intersects the central z-bands of half
    # the files and the measurement stops discriminating)
    df = spark.range(n).select(
        F.pmod(F.hash("id"), F.lit(10_000)).alias("x"),
        F.pmod(F.hash(F.col("id") + 1), F.lit(10_000)).alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_by(df, ["x", "y"], n_partitions=16).write.parquet(zpath)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)

    # a 1% band predicate: every file holds ~12.5k uniform rows, so a
    # whole-range file almost surely intersects the band — the linear
    # sort's y stats skip ~nothing, while clustered layouts skip most
    z_skip_x = _file_skip_fraction(zpath, "x", 0, 99)
    z_skip_y = _file_skip_fraction(zpath, "y", 0, 99)
    l_skip_x = _file_skip_fraction(lpath, "x", 0, 99)
    l_skip_y = _file_skip_fraction(lpath, "y", 0, 99)
    # linear: excellent on leading dim, useless on the other
    assert l_skip_x > 0.8
    assert l_skip_y < 0.2
    # z-order: substantial skipping on BOTH dims
    assert z_skip_x > 0.5
    assert z_skip_y > 0.5


def test_zorder_preserves_rows(spark, tmp_path):
    df = spark.range(5000).select(
        F.col("id"), (F.col("id") * 7 % 100).alias("x"), (F.col("id") % 31).alias("y")
    )
    p = str(tmp_path / "zp")
    zorder_by(df, ["x", "y"], n_partitions=4).write.parquet(p)
    back = spark.read.parquet(p)
    assert back.count() == 5000
    assert back.agg(F.sum("id")).head()[0] == df.agg(F.sum("id")).head()[0]
    assert "_z" not in back.columns


def test_temporal_columns_bucketize(spark, tmp_path):
    """DATE/TIMESTAMP cluster columns work via epoch normalization (found
    by the analytics example: a date column used to fail the bounds cast)."""
    df = spark.range(1000).selectExpr(
        "id",
        "date_add(DATE '2024-01-01', CAST(id % 365 AS INT)) AS d",
        "timestamp_seconds(1700000000 + id * 60) AS ts",
    )
    out = with_z_value(df, ["d", "ts"], bits=8)
    assert out.count() == 1000
    zs = [r["_z"] for r in out.select("_z").distinct().collect()]
    assert len(zs) > 100  # real spread, not a constant
