"""Interval (range) join: points ⋈ intervals without a cross product.

Beyond-reference join family member (the reference's join suite stops at
equi/hash/sparse/skew/SMB/as-of). Spark's optimizer turns a bare
``p.ts BETWEEN i.start AND i.end`` join into BroadcastNestedLoopJoin or a
cartesian product — O(n·m) and the single most common scale-killer in
event/session enrichment. The standard fix (what Databricks' range-join
hint does under the hood) is bucket quantization, built here from plain
operators:

1. pick a bucket width w (≈ median interval length; the knob),
2. each interval explodes into the buckets it overlaps
   (``sequence(floor(start/w), floor(end/w))`` — fan-out =
   interval_len/w + 1, bounded by construction),
3. each point maps to ONE bucket (``floor(ts/w)``),
4. equi-join on the bucket key (shuffle or broadcast, Catalyst's choice),
5. re-check the exact predicate to discard false bucket pairs.

Cost: |intervals|·(len/w + 1) + |points| shuffled rows and an equi-join —
versus |points|·|intervals| compared pairs for the nested loop. Every
matched pair appears exactly once: a point lives in exactly one bucket,
and an overlapping interval covers that bucket exactly once.

Left/outer variants are caller-side compositions on their point id
(``inner ∪ (points left_anti matched_ids)``) — an id the caller owns is
the only correct identity for duplicate point rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _numify(df: DataFrame, c: str):
    """Timestamp columns bucketize via micros-resolution epoch seconds;
    numerics as-is."""
    dt = dict(df.dtypes)[c]
    col = F.col(c)
    if dt.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp")) / 1_000_000.0
    return col.cast("double")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float | int,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point <= end`` (inclusive both ends). Columns from both
    sides are kept — disambiguate names beforehand. ``bucket_width`` is in
    the column's units (seconds for timestamps); pick ≈ the median
    interval length (larger → fewer exploded rows, more false pairs to
    re-check; smaller → the reverse)."""
    if not bucket_width or bucket_width <= 0:
        raise ValueError("interval_join: bucket_width must be positive")
    w = float(bucket_width)
    pb = points.withColumn("__bkt", F.floor(_numify(points, point_col) / F.lit(w)))
    iv = (
        intervals.withColumn(
            "__b0", F.floor(_numify(intervals, start_col) / F.lit(w))
        )
        .withColumn("__b1", F.floor(_numify(intervals, end_col) / F.lit(w)))
        .filter(F.col("__b1") >= F.col("__b0"))  # drops inverted intervals
    )
    iv_exp = iv.withColumn(
        "__bkt", F.explode(F.sequence(F.col("__b0"), F.col("__b1")))
    ).drop("__b0", "__b1")
    cond = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    return pb.join(iv_exp, "__bkt", "inner").filter(cond).drop("__bkt")
