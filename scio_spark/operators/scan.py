"""Global running aggregates (prefix scan) without a single-partition window.

The naive Spark spelling of ``SUM(x) OVER (ORDER BY k)`` — a ``Window.orderBy``
with no ``partitionBy`` — collapses the whole dataset into ONE task, which is
the canonical 100 TB scale-killer. This module implements the classic
two-phase distributed scan instead:

1. range-partition on the order key (``repartitionByRange`` — Spark's
   sampled range exchange, the same machinery ``orderBy`` uses) and sort
   within partitions, so partition *i* holds a contiguous, ordered slice;
2. compute the running aggregate *locally* per partition (a window
   partitioned by ``spark_partition_id()`` — parallel, no extra shuffle);
3. aggregate one total per partition (a few hundred rows), prefix-combine
   those totals on the driver-sized side, and broadcast-join the per-partition
   *offset* back.

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

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__scan_pid"
_LOCAL = "__scan_local"
_OFF = "__scan_off"
_TOT = "__scan_tot"

_ADD = lambda local, off: local + F.coalesce(off, F.lit(0))  # noqa: E731

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
