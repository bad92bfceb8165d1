"""Global running aggregates (prefix scan) without a single-partition window.

The naive Spark spelling of ``SUM(x) OVER (ORDER BY k)`` — a ``Window.orderBy``
with no ``partitionBy`` — collapses the whole dataset into ONE task, which is
the canonical 100 TB scale-killer. This module implements the classic
two-phase distributed scan instead:

1. derive a monotone range-bucket id 0..n-1 for the leading order key from
   sampled approximate quantile boundaries (a one-column pruned probe scan);
2. compute the running aggregate *locally* per bucket — a window
   partitioned by the bucket column, whose own hash exchange is the ONLY
   full-data shuffle in the plan (spelling this with repartitionByRange +
   ``spark_partition_id()`` shuffles the data twice: Catalyst cannot prove
   the pid layout satisfies the window distribution and adds a second
   exchange — measured 2x slower; kept only as the fallback for
   non-numeric leading keys);
3. aggregate one total per bucket (map-side partial, #buckets rows moved),
   prefix-combine those totals, and broadcast-join the per-bucket *offset*
   back.

Every phase is parallel except the prefix over partition totals, which is
O(#partitions) rows. This is the textbook Blelloch scan lowered onto Spark's
physical operators.

Reference parity: the scio reference reaches cumulative semantics through
Beam stateful DoFns over ordered streams
(scio-core/src/main/scala/com/spotify/scio/values/SCollection.scala batch* /
timestamped families); in batch Spark the scan above is the idiomatic
equivalent. ``pack_chunks`` (functions/training.py) builds on it for
concat-and-chunk sequence packing.

Exactness: for ``sum`` over floating columns, stage through DECIMAL first
(see the repo's oracle recipes) — decimal addition is associative, so the
two-phase combine is bit-identical to the sequential scan.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__scan_pid"
_LOCAL = "__scan_local"
_OFF = "__scan_off"
_TOT = "__scan_tot"

def _ADD(local, off):
    # local is NULL when a bucket's whole prefix is NULL-valued: SQL's
    # running SUM there is the carried offset (NULL + anything would
    # poison it); a NULL offset is the first bucket — degrade to local
    return F.when(local.isNull(), off).otherwise(local + F.coalesce(off, F.lit(0)))

#: agg name -> (aggregate fn, merge fn over partition totals,
#:              combine(local, offset) -> Column). count's totals merge with
#:              SUM (a count of counts would be #partitions, not #rows).
#:              least/greatest skip NULLs, so a missing offset (first
#:              partition) degrades to the local running value.
_AGGS = {
    "sum": (lambda c: F.sum(c), F.sum, _ADD),
    "count": (lambda c: F.count(c if c is not None else F.lit(1)), F.sum, _ADD),
    "min": (lambda c: F.min(c), F.min, F.least),
    "max": (lambda c: F.max(c), F.max, F.greatest),
}


def _cols(order_by) -> list:
    if isinstance(order_by, (str, Column)):
        order_by = [order_by]
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


_BUCKETABLE = ("tinyint", "smallint", "int", "bigint", "float", "double",
               "decimal", "timestamp")


def _bucket_expr(df: DataFrame, key: Column, n: int, key_type: str = "") -> Column | None:
    """A monotone bucket id 0..n-1 for the leading order key, from sampled
    approximate quantile boundaries — any monotone bucketing is CORRECT
    (the totals prefix absorbs imbalance); the quantiles only buy balance.
    The probe scans ONE column (pruned parquet read), far cheaper than the
    extra full-row exchange it replaces. Returns None when the key's type
    can't be bucketed numerically (caller falls back to repartitionByRange).

    Equal key values always land in the same bucket (strict ``>`` against
    each boundary), which is what makes the bucketing monotone w.r.t. the
    full composite order. NULL keys get bucket -1 — Spark orders NULLS
    FIRST, so they prefix-combine as the earliest bucket."""
    # TIMESTAMP_NTZ has no direct double cast — hop through TIMESTAMP
    knum = key.cast("timestamp") if key_type.startswith("timestamp") else key
    probe = df.select(knum.cast("double").alias("__scan_key")).filter(
        F.col("__scan_key").isNotNull()
    )
    qs = [i / n for i in range(1, n)]
    try:
        bounds = probe.approxQuantile("__scan_key", qs, max(0.001, 0.25 / n))
    except Exception:
        return None
    uniq = sorted(set(bounds))
    if not uniq:
        return None
    k = knum.cast("double")
    bucket = _searchsorted(k, uniq)
    return F.when(key.isNull(), F.lit(-1)).otherwise(bucket)


def _searchsorted(k: Column, bounds: list[float]) -> Column:
    """``#bounds strictly below k`` as a CONSTANT-NODE-COUNT expression.

    The naive chained spelling ``sum((k > b) for b in bounds)`` builds one
    comparison NODE per boundary — fine at 200 partitions, codegen bloat
    at 10k. Here the boundaries live in array LITERALS (one plan node each
    regardless of length) behind a two-level lookup: a uniform outer grid
    locates the cell (one fixed arithmetic expression — the width_bucket
    shape), ``element_at`` fetches that cell's precomputed prefix count
    plus its (typically tiny) boundary sublist, and one ``aggregate``
    lambda resolves the residual comparisons. Per-row work is
    O(B/cells + 1) on average and the plan holds ~6 nodes + 2 literals at
    ANY partition count. Grid math is IEEE-double on both driver and
    executors, so cell assignment of a boundary equals cell assignment of
    a key with the same value — no boundary is ever skipped or counted
    twice."""
    lo, hi = bounds[0], bounds[-1]
    if hi == lo:
        return (k > F.lit(lo)).cast("int")
    n_cells = min(1024, len(bounds))
    step = (hi - lo) / n_cells

    def cell_of(b: float) -> int:
        return min(n_cells - 1, max(0, int(math.floor((b - lo) / step))))

    sublists: list[list[float]] = [[] for _ in range(n_cells)]
    for b in bounds:
        sublists[cell_of(b)].append(b)
    base, acc = [], 0
    for c in range(n_cells):
        base.append(acc)
        acc += len(sublists[c])

    # clamp the RATIO in double space BEFORE floor/cast: boundaries are
    # sampled quantiles, so an outlier key can sit arbitrarily far outside
    # [lo, hi] and floor((k-lo)/step) would overflow the int cast (ANSI:
    # CAST_OVERFLOW crash; non-ANSI: wrapped bits → non-monotone bucket).
    # Clamped-then-floored equals floored-then-clamped for every in-range
    # boundary, so driver cell_of and executor cells still agree; NaN keys
    # clamp to the last cell (Spark orders NaN greatest — consistent with
    # `k > b` counting every boundary below a NaN).
    cell = F.floor(
        F.least(
            F.lit(float(n_cells - 1)),
            F.greatest(F.lit(0.0), (k - F.lit(lo)) / F.lit(step)),
        )
    ).cast("int")
    prefix = F.element_at(
        F.lit(base).cast("array<int>"), cell + F.lit(1)
    )
    sub = F.element_at(
        F.lit(sublists).cast("array<array<double>>"), cell + F.lit(1)
    )
    residual = F.aggregate(
        sub, F.lit(0), lambda a, b: a + (k > b).cast("int")
    )
    return prefix + residual


def running_agg(
    df: DataFrame,
    order_by: str | Column | Sequence,
    value: str | Column | None = None,
    agg: str = "sum",
    out_col: str = "running",
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Running ``agg`` of ``value`` over the total order ``order_by``,
    distributed (no single-partition window anywhere in the plan).

    ``order_by`` must be a total order (add a unique tiebreak column) —
    ties that straddle a range-partition boundary would otherwise make the
    prefix non-deterministic. ``inclusive=False`` gives the *exclusive*
    prefix (the running value BEFORE each row; identity element for the
    first row: 0 for sum/count, NULL for min/max).

    Equivalent SQL (what the oracle replays)::

        AGG(value) OVER (ORDER BY order_by
                         ROWS BETWEEN UNBOUNDED PRECEDING AND {0|1 PRECEDING})
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    agg_fn, merge_fn, combine = _AGGS[agg]
    order = _cols(order_by)
    val = None if value is None else (F.col(value) if isinstance(value, str) else value)
    if val is None and agg != "count":
        raise ValueError(f"agg={agg!r} requires a value column")

    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # Preferred path: derive a monotone range-bucket column for the leading
    # order key from sampled quantile boundaries, and let the WINDOW's own
    # hash exchange on it be the only full-data shuffle. (The naive
    # repartitionByRange + partitionBy(spark_partition_id()) spelling
    # shuffles the data TWICE — Catalyst can't prove the pid layout
    # satisfies the window's distribution and inserts a second exchange.)
    bucket = None
    try:
        key_type = df.select(order[0].alias("__scan_key")).schema[0].dataType.simpleString()
    except Exception:
        key_type = ""
    if n > 1 and key_type.startswith(_BUCKETABLE):
        bucket = _bucket_expr(df, order[0], n, key_type)
    if bucket is not None:
        d = df.withColumn(_PID, bucket)
    else:
        # fallback (non-numeric leading key): physical range layout + pid
        d = (
            df.repartitionByRange(n, *order)
            .sortWithinPartitions(*order)
            .withColumn(_PID, F.spark_partition_id())
        )

    hi = 0 if inclusive else -1
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = agg_fn(val).over(w_local)
    if not inclusive and agg in ("sum", "count"):
        local = F.coalesce(local, F.lit(0))

    # One row per partition; the prefix over them is O(#partitions) and the
    # single-partition window below sees only those rows, never the data.
    totals = d.groupBy(_PID).agg(agg_fn(val).alias(_TOT))
    w_off = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        _PID, merge_fn(F.col(_TOT)).over(w_off).alias(_OFF)
    )

    out = (
        d.withColumn(_LOCAL, local)
        .join(F.broadcast(offsets), _PID, "left")
        .withColumn(out_col, combine(F.col(_LOCAL), F.col(_OFF)))
        .drop(_PID, _LOCAL, _OFF)
    )
    return out


def row_numbers(
    df: DataFrame,
    order_by: str | Column | Sequence,
    out_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ``ROW_NUMBER() OVER (ORDER BY order_by)`` (1-based) —
    the scan specialization with ``count`` and a unit value. Unlike
    ``zipWithIndex`` it stays in the DataFrame world and unlike a bare
    ``Window.orderBy`` it never funnels the data through one task."""
    return running_agg(
        df,
        order_by,
        value=None,
        agg="count",
        out_col=out_col,
        inclusive=True,
        num_partitions=num_partitions,
    )


def ntile(
    df: DataFrame,
    k: int,
    order_by: str | Column | Sequence,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ``NTILE(k) OVER (ORDER BY order_by)``: equal-frequency
    buckets 1..k over a total order — exactly SQL NTILE semantics: with
    ``q = n div k, r = n mod k``, the FIRST ``r`` buckets get ``q+1`` rows
    (front-loaded, not evenly spread — the naive ``floor((pos-1)*k/n)``
    alternates big/small buckets and diverges whenever ``r`` > 0). pos
    comes from the two-phase scan, so no single-partition window; the row
    count joins in as a 1-row broadcast scalar (the lint-sanctioned BNLJ
    shape)."""
    if k < 1:
        raise ValueError(f"ntile: k must be >= 1, got {k}")
    pos = "__scan_pos"
    n_col = "__scan_n"
    d = row_numbers(df, order_by, out_col=pos, num_partitions=num_partitions)
    total = df.groupBy().agg(F.count(F.lit(1)).alias(n_col))
    return (
        d.join(F.broadcast(total))
        # integer `div`, not `/`: double division drifts past 2^53 rows*k
        .withColumn(
            out_col,
            F.expr(
                f"""CASE
                  WHEN {pos} <= ({n_col} % {int(k)}) * ({n_col} div {int(k)} + 1)
                  THEN ({pos} - 1) div ({n_col} div {int(k)} + 1) + 1
                  ELSE ({n_col} % {int(k)})
                       + ({pos} - ({n_col} % {int(k)}) * ({n_col} div {int(k)} + 1) - 1)
                         div ({n_col} div {int(k)})
                       + 1
                END"""
            ).cast("long"),
        )
        .drop(pos, n_col)
    )
