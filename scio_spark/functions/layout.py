"""Data-layout clustering: Z-order (Morton) multi-dimensional sort.

Beyond-reference scale operator. At 100 TB the dominant read cost is scan
pruning: a table linearly sorted on one column prunes only on that column;
interleaving the bits of several columns (the Z-order curve, as in
Delta/Iceberg OPTIMIZE ZORDER BY) gives every listed column partial
locality, so parquet min/max statistics narrow for all of them at once and
point/range predicates skip most files and row groups on any dimension.

Everything here is native Catalyst expressions — bucketization via
``width_bucket``, bit interleave via shift/or folds — followed by a
range-repartition+sort write: no UDFs, one shuffle.

Bucketization is equi-width over the observed [min, max] (one cheap agg
job); heavily skewed columns would prefer equi-depth (approxQuantile
boundaries) — noted here, same z-value machinery either way.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each (already-bucketized, 0-based)
    column into one long: bit b of column j lands at position
    b*len(cols)+j. Static expression tree of bits×cols shift/or terms —
    whole-stage-codegen friendly, no Python in the hot path."""
    ncols = len(bucket_cols)
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ncols + j)
        for b in range(bits)
        for j, c in enumerate(bucket_cols)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms, F.lit(0).cast("long"))


def with_z_value(
    df: DataFrame, cols: list[str], bits: int = 12, out_col: str = "_z"
) -> DataFrame:
    """Append the z-value column: each input column is equi-width
    bucketized into 2^bits buckets over its observed min/max (a single
    small agg job supplies the bounds), then bit-interleaved."""
    if not cols:
        raise ValueError("with_z_value: need at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"z-value overflow: {bits} bits x {len(cols)} cols > 63")

    def numeric(c: str):
        """Temporal columns bucketize via their epoch numbers (date → days,
        timestamp → seconds); everything else casts to double."""
        dt = dict(df.dtypes)[c]
        if dt == "date":
            return F.unix_date(F.col(c)).cast("double")
        if dt.startswith("timestamp"):
            return (F.unix_micros(F.col(c).cast("timestamp")) / 1_000_000.0)
        return F.col(c).cast("double")

    bounds = df.agg(
        *[F.min(numeric(c)).alias(f"mn_{c}") for c in cols],
        *[F.max(numeric(c)).alias(f"mx_{c}") for c in cols],
    ).head()
    n = 1 << bits
    buckets = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None or mn == mx:
            buckets.append(F.lit(0).cast("long"))
            continue
        b = F.width_bucket(numeric(c), F.lit(mn), F.lit(mx), F.lit(n))
        # width_bucket is 1-based and returns n+1 at the upper bound;
        # clamp into [0, n-1]
        buckets.append(F.least(F.greatest(b - 1, F.lit(0)), F.lit(n - 1)).cast("long"))
    return df.withColumn(out_col, z_value(buckets, bits))


def zorder_by(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = 12
) -> DataFrame:
    """Cluster rows along the Z-curve of ``cols``: range-repartition on the
    z-value (contiguous curve segments per output file) and sort within
    partitions. Write the result with ``.write.parquet`` — every output
    file then covers a small hyper-rectangle of the listed columns, so
    min/max pruning works on all of them (tests measure the skip rate
    against a linear sort from the parquet footers)."""
    z = with_z_value(df, cols, bits)
    return (
        z.repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
