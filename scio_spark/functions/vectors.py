"""Vector-semigroup aggregations — element-wise vector sum/mean by key.

Reference: scio-extra Breeze.scala (Semigroup[DenseVector]/[DenseMatrix]
instances so ``vectors.sum`` / ``.sumByKey`` work through Algebird's
semigroup machinery). The Spark-first shape is NOT a Python monoid fold:
the vector is exploded to (pos, value) rows, summed per (key, pos) with a
plain partial-aggregated SUM (map-side combine — shuffle bytes scale with
|keys| × dim, not |rows| × dim), and re-assembled ordered by position.
Everything stays in whole-stage codegen; no Python in the hot path.

Exactness: float addition is order-sensitive, so ``sum_vectors_by_key``
stages each component through DECIMAL(28,8) before the SUM (decimal
addition is associative — partition order cannot change the result; the
oracle-exactness recipe used by every decimal-staged aggregate in this
repo). The assembled output is DOUBLE.

At 100 TB: dim-64 embeddings explode 64×, but the partial aggregation
collapses each partition to |local keys| × dim rows before the exchange —
the same cost shape as scio's Semigroup sumOption over a Beam bundle.
For driver-sized results (global centroid) the final array is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sum_vectors_by_key(
    df: DataFrame,
    vec_col: str,
    key_cols: list[str] | None = None,
    scale: int = 8,
) -> DataFrame:
    """Element-wise vector sum per key (scio-extra Breeze.scala semigroup →
    ``sumByKey``; ``key_cols=None`` = global sum, Breeze's ``.sum``).
    Returns key cols + ``vec_sum array<double>`` and ``n_vectors``.
    Ragged inputs are rejected implicitly: differing lengths produce
    different position sets and would change the output dimension — callers
    wanting validation can assert ``size()`` beforehand."""
    keys = list(key_cols or [])
    # widen float32 → double BEFORE the decimal stage: a float-to-decimal
    # cast may round the float's SHORTEST decimal rendering (DuckDB does),
    # while double-to-decimal rounds the exact binary value — going
    # through double on both engines makes the staging identical
    pos = df.select(
        *keys, F.posexplode(F.col(vec_col)).alias("__pos", "__v")
    ).withColumn(
        "__v", F.col("__v").cast("double").cast(f"decimal(28,{scale})")
    )
    per_pos = pos.groupBy(*keys, "__pos").agg(F.sum("__v").alias("__s"))
    counts = df.groupBy(*keys) if keys else df.groupBy()
    n = counts.agg(F.count(F.lit(1)).alias("n_vectors"))
    assembled = (
        per_pos.groupBy(*keys)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__s"))
                ),
                lambda s: s["__s"].cast("double"),
            ).alias("vec_sum")
        )
    )
    if keys:
        return assembled.join(n, keys)
    return assembled.crossJoin(F.broadcast(n))


def mean_vectors_by_key(
    df: DataFrame,
    vec_col: str,
    key_cols: list[str] | None = None,
    scale: int = 8,
) -> DataFrame:
    """Element-wise vector mean per key (centroid computation — the
    embedding-pipeline use of Breeze's semigroup sum). Division happens
    once per (key, position) on the decimal sums, so the result is as
    deterministic as the staged sum."""
    summed = sum_vectors_by_key(df, vec_col, key_cols, scale)
    return summed.select(
        *(key_cols or []),
        F.transform(
            "vec_sum", lambda x: x / F.col("n_vectors")
        ).alias("vec_mean"),
        "n_vectors",
    )
