"""PairSCollection — keyed ops (*ByKey) and the join suite entry points.

Scio model: any ``SCollection[(K, V)]`` gains keyed ops via implicit conversion
(PairSCollectionFunctions.scala:58). Our model: a DataFrame plus a designated
list of key columns; value columns are the rest. This keeps keys as real
columns so Catalyst sees them (pushdown, exchange reuse, AQE), instead of
opaque tuples behind a Coder.

Join flavors (PairHashSCollectionFunctions / PairSkewedSCollectionFunctions /
sparse* in PairSCollectionFunctions) are implemented in operators/joins.py;
this class forwards with self as the LHS.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.expr(c)


class PairSCollection:
    def __init__(self, df: DataFrame, key_cols: Sequence[str], context=None):
        self.df = df
        self.key_cols = list(key_cols)
        self.context = context

    # -------------------------------------------------------------- plumbing

    @property
    def value_cols(self) -> list[str]:
        return [c for c in self.df.columns if c not in self.key_cols]

    def _wrap(self, df: DataFrame) -> "PairSCollection":
        return PairSCollection(df, self.key_cols, self.context)

    def _check_join_keys(self, other: "PairSCollection"):
        missing = [c for c in self.key_cols if c not in other.df.columns]
        if missing:
            raise ValueError(
                f"join keys {missing} not present on the right side "
                f"(right columns: {other.df.columns}); key both sides with "
                f"matching names, e.g. .key_by({self.key_cols[0]!r}=...)"
            )

    def _uncollide(self, other: "PairSCollection", suffixes=("_1", "_2")):
        """Rename colliding value columns on both sides (scio returns tuples,
        so collisions can't happen there; we suffix instead)."""
        clash = set(self.value_cols) & set(other.value_cols)
        left, right = self.df, other.df
        for c in clash:
            left = left.withColumnRenamed(c, c + suffixes[0])
            right = right.withColumnRenamed(c, c + suffixes[1])
        return left, right

    def to_scollection(self):
        from scio_spark.collection import SCollection

        return SCollection(self.df, self.context)

    def unkey(self):
        return self.to_scollection()

    # ------------------------------------------------------- keyed projections

    def keys(self):
        """PairSCollectionFunctions.scala:994."""
        from scio_spark.collection import SCollection

        return SCollection(self.df.select(*self.key_cols), self.context)

    def values(self):
        """PairSCollectionFunctions.scala:1146."""
        from scio_spark.collection import SCollection

        return SCollection(self.df.select(*self.value_cols), self.context)

    def map_values(self, **named) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1010 ``mapValues`` — value columns
        replaced by named expressions."""
        cols = [F.col(k) for k in self.key_cols] + [
            _col(e).alias(name) for name, e in named.items()
        ]
        return self._wrap(self.df.select(*cols))

    def map_keys(self, **named) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1002 ``mapKeys``."""
        cols = [_col(e).alias(name) for name, e in named.items()] + [
            F.col(v) for v in self.value_cols
        ]
        return PairSCollection(self.df.select(*cols), list(named), self.context)

    def flat_map_values(self, expr, alias: str = "value") -> "PairSCollection":
        """PairSCollectionFunctions.scala:751 — explode array-valued expr,
        keys preserved."""
        return self._wrap(
            self.df.select(*self.key_cols, F.explode(_col(expr)).alias(alias))
        )

    def flatten_values(self, col: str = "value") -> "PairSCollection":
        """PairSCollectionFunctions.scala:1152 — (K, Iterable[V]) → (K, V)."""
        return self.flat_map_values(F.col(col), alias=col)

    def filter_values(self, pred) -> "PairSCollection":
        """PairSCollectionFunctions.scala:743."""
        return self._wrap(self.df.filter(pred if isinstance(pred, Column) else F.expr(pred)))

    def swap(self) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1127 — values become keys."""
        return PairSCollection(self.df, self.value_cols, self.context)

    # -------------------------------------------------------- aggregations

    def _gb(self):
        return self.df.groupBy(*self.key_cols)

    def agg_by_key(self, *exprs, **named) -> "PairSCollection":
        cols = [_col(e) for e in exprs] + [_col(e).alias(k) for k, e in named.items()]
        return self._wrap(self._gb().agg(*cols))

    def count_by_key(self) -> "PairSCollection":
        """PairSCollectionFunctions.scala:708."""
        return self._wrap(self._gb().agg(F.count(F.lit(1)).alias("count")))

    def sum_by_key(self, *cols) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1048 — partial agg (combiner lifting)
        is automatic in Catalyst."""
        cols = list(cols) or self.value_cols
        return self._wrap(self._gb().agg(*[F.sum(c).alias(c) for c in cols]))

    def mean_by_key(self, col: str) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1062."""
        return self._wrap(self._gb().agg(F.avg(col).alias("mean")))

    def min_by_key(self, col: str) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1020."""
        return self._wrap(self._gb().agg(F.min(col).alias("min")))

    def max_by_key(self, col: str) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1030."""
        return self._wrap(self._gb().agg(F.max(col).alias("max")))

    def latest_by_key(self, ts_col: str, *value_cols) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1040 ``latestByKey`` → max_by."""
        vals = list(value_cols) or [c for c in self.value_cols if c != ts_col]
        return self._wrap(self._gb().agg(*[F.max_by(v, ts_col).alias(v) for v in vals]))

    def reduce_by_key(self, **named) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1073 — associative reduce = agg expr."""
        return self.agg_by_key(**named)

    def aggregate_by_key(self, *exprs, **named) -> "PairSCollection":
        """PairSCollectionFunctions.scala:575-605 (Algebird Aggregator) — any
        composition of built-in aggregate expressions; Python monoids go via
        applyInPandas (slow path)."""
        return self.agg_by_key(*exprs, **named)

    def combine_by_key_pandas(self, fn: Callable, schema) -> "PairSCollection":
        """SCollection.scala:540 ``combine`` generic fallback: per-key pandas
        group map (Arrow-batched)."""
        return self._wrap(self._gb().applyInPandas(fn, schema))

    def count_approx_distinct_by_key(self, col: str, rsd: float = 0.05) -> "PairSCollection":
        """PairSCollectionFunctions.scala:662 — HLL++ per key."""
        return self._wrap(
            self._gb().agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))
        )

    def approx_quantiles_by_key(self, col: str, quantiles, accuracy: int = 10000) -> "PairSCollection":
        """PairSCollectionFunctions.scala:620."""
        return self._wrap(
            self._gb().agg(
                F.percentile_approx(col, list(quantiles), accuracy).alias("quantiles")
            )
        )

    def group_by_key(self) -> "PairSCollection":
        """PairSCollectionFunctions.scala:790 ``groupByKey`` — values into an
        array. Discouraged at scale, exactly as scio discourages it
        (chained-GBK lint, ArtisanJoin.scala:49-67): prefer reduce/agg."""
        vals = self.value_cols
        v = F.struct(*vals) if len(vals) > 1 else F.col(vals[0])
        return self._wrap(self._gb().agg(F.collect_list(v).alias("values")))

    def group_map(self, expr, alias: str = "mapped") -> "PairSCollection":
        """SCollection.scala:716 ``groupMap`` — per-key list of a mapped
        expression (GBK + element map in one agg)."""
        return self._wrap(self._gb().agg(F.collect_list(_col(expr)).alias(alias)))

    def fold_by_key(self, **named) -> "PairSCollection":
        """PairSCollectionFunctions.scala:763 ``foldByKey`` — associative agg
        exprs per key (zero handled by the agg function's identity)."""
        return self.agg_by_key(**named)

    combine_by_key = fold_by_key
    """SCollection.scala:641 ``combineByKey`` — Catalyst partial agg performs
    createCombiner/mergeValue/mergeCombiners automatically for agg exprs;
    opaque Python combiners go via :meth:`combine_by_key_pandas`."""

    def group_map_reduce(self, merge_expr: str) -> "PairSCollection":
        """SCollection.scala:738 ``groupMapReduce`` — reduce per key via expr."""
        return self.agg_by_key(reduced=merge_expr)

    def batch_by_key(self, max_size: int) -> "PairSCollection":
        """PairSCollectionFunctions.scala:816 ``batchByKey`` — arrays of ≤n per
        key via slice over collect_list."""
        vals = self.value_cols
        v = F.struct(*vals) if len(vals) > 1 else F.col(vals[0])
        grouped = self._gb().agg(F.collect_list(v).alias("__all"))
        n_batches = F.ceil(F.size("__all") / F.lit(max_size)).cast("int")
        return self._wrap(
            grouped.select(
                *self.key_cols,
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), n_batches - 1),
                        lambda i: F.slice(F.col("__all"), i * max_size + 1, max_size),
                    )
                ).alias("batch"),
            )
        )

    def top_by_key(
        self, n: int, order_by, ascending: bool = False, skew_safe: bool = False
    ) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1138 ``topByKey``.

        Default: ranked window — single shuffle on key; AQE handles
        moderately skewed key groups, but ONE task sorts every row of a
        hot key.

        ``skew_safe=True``: two-phase top-n with scio Top.perKey's cost
        shape (map-side heap truncation). Phase 1 ranks within
        (input-partition id, key) — the exchange hashes on (pid, key), so
        a hot key's rows spread evenly over reducers and each sort is
        bounded by one input partition's share; only the per-(pid, key)
        top-n survive. Phase 2 re-ranks the ≤ n×P survivors per key — a
        tiny second shuffle. Use when a key can hold a macroscopic
        fraction of the data; the extra exchange is wasted work on
        uniform keys, hence not the default."""
        c = _col(order_by)
        oc = c.asc() if ascending else c.desc()
        if not skew_safe:
            w = Window.partitionBy(*self.key_cols).orderBy(oc)
            return self._wrap(
                self.df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= n)
                .drop("__rn")
            )
        w1 = Window.partitionBy(F.col("__pid"), *self.key_cols).orderBy(oc)
        local = (
            self.df.withColumn("__pid", F.spark_partition_id())
            .withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= n)
            .drop("__pid", "__rn")
        )
        w2 = Window.partitionBy(*self.key_cols).orderBy(oc)
        return self._wrap(
            local.withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") <= n)
            .drop("__rn")
        )

    def hash_partition_by_key(self, n: int) -> "PairSCollection":
        """PairSCollectionFunctions.scala ``hashPartitionByKey`` — physical
        repartition clustering rows by key hash (co-locates each key's
        rows; the manual pre-shuffle scio uses before key-local work)."""
        return self._wrap(
            self.df.repartition(n, *[F.col(c) for c in self.key_cols])
        )

    def distinct_by_key(self) -> "PairSCollection":
        """PairSCollectionFunctions.scala:719 — one representative per key."""
        return self._wrap(self.df.dropDuplicates(self.key_cols))

    def sort_values(self, *secondary_cols, ascending: bool = True) -> "PairSCollection":
        """Secondary sort within key groups (scio-extra sorter
        SCollectionSyntax.scala:57 ``sortValues``; scio-smb secondary keys
        BucketMetadata.java:76-79): repartition by key, sort within
        partitions by (key, secondary) — Beam needs an external sorter;
        Spark's shuffle sorts with spill natively."""
        cols = [F.col(c) for c in self.key_cols] + [
            (F.col(c).asc() if ascending else F.col(c).desc()) for c in secondary_cols
        ]
        return self._wrap(
            self.df.repartition(*[F.col(c) for c in self.key_cols]).sortWithinPartitions(*cols)
        )

    def grouped_sorted_values(self, *secondary_cols) -> "PairSCollection":
        """(K, values sorted by secondary) — sorted-group iteration without
        an external sorter: collect_list of (secondary, value) structs then
        array_sort (per-key state must fit an executor, as in scio's
        sortValues(memoryMB))."""
        vals = [c for c in self.value_cols if c not in secondary_cols]
        s = F.struct(*[F.col(c) for c in secondary_cols], *[F.col(c) for c in vals])
        return self._wrap(
            self._gb().agg(F.array_sort(F.collect_list(s)).alias("values"))
        )

    def salted_agg_by_key(self, n_salt: int, partial: dict, final: dict) -> "PairSCollection":
        """withHotKeyFanout (PairSCollectionFunctions.scala:95,
        SCollectionWithHotKeyFanout.scala:45-70): two-level aggregation for
        extreme key skew — pre-aggregate on (key, salt), then merge per key.

        Catalyst's partial aggregation already gives two-level combining for
        simple aggs; this explicit variant exists for the case scio built it
        for: a handful of keys so hot that even their *partial* groups
        overwhelm one reducer (e.g. collect_list/percentile state). ``partial``
        maps column name → agg expr over rows; ``final`` maps output name →
        agg expr over the partial columns.

        Example::

            pair.salted_agg_by_key(
                64,
                partial={"s": "SUM(v)", "c": "COUNT(*)"},
                final={"total": "SUM(s)", "n": "SUM(c)"},
            )
        """
        salted = self.df.withColumn(
            "__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salt))
        )
        level1 = salted.groupBy(*self.key_cols, "__salt").agg(
            *[F.expr(e).alias(name) for name, e in partial.items()]
        )
        level2 = level1.groupBy(*self.key_cols).agg(
            *[F.expr(e).alias(name) for name, e in final.items()]
        )
        return self._wrap(level2)

    # ------------------------------------------------------------- sampling

    def sample_by_key(self, fractions: dict, seed: int = 42, col: str | None = None) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1104 ``sampleByKey`` (stratified)."""
        key = col or self.key_cols[0]
        return self._wrap(self.df.sampleBy(key, fractions, seed))

    def sample_exact_by_key(self, n: int, seed: int = 42) -> "PairSCollection":
        """PairSCollectionFunctions.scala:1082 per-key reservoir ``sample(n)``:
        exactly min(n, group size) rows per key, uniformly. One shuffle on
        key (ranked window over a seeded hash order — deterministic for a
        fixed seed, unlike a true streaming reservoir, and equally uniform)."""
        order = F.xxhash64(*[F.col(c) for c in self.df.columns], F.lit(seed))
        w = Window.partitionBy(*self.key_cols).orderBy(order)
        return self._wrap(
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn")
        )

    # ----------------------------------------------------------- join suite

    def join(self, other: "PairSCollection", how: str = "inner", suffixes=("_1", "_2")) -> "PairSCollection":
        """PairSCollectionFunctions.scala:207/216/225/198 (inner/left/right/
        full). Catalyst picks broadcast/sort-merge/shuffled-hash; AQE may
        re-plan at runtime. Per-key cartesian of duplicate keys matches scio's
        ArtisanJoin emission loops (ArtisanJoin.scala:97-115)."""
        self._check_join_keys(other)
        left, right = self._uncollide(other, suffixes)
        joined = left.join(right, on=self.key_cols, how=how)
        return self._wrap(joined)

    def left_outer_join(self, other, **kw) -> "PairSCollection":
        return self.join(other, "left", **kw)

    def right_outer_join(self, other, **kw) -> "PairSCollection":
        return self.join(other, "right", **kw)

    def full_outer_join(self, other, **kw) -> "PairSCollection":
        return self.join(other, "full", **kw)

    def hash_join(self, other, how: str = "inner", suffixes=("_1", "_2")) -> "PairSCollection":
        """PairHashSCollectionFunctions.scala:41-143 hash*Join — RHS is small:
        explicit broadcast, no shuffle on the LHS."""
        self._check_join_keys(other)
        left, right = self._uncollide(other, suffixes)
        return self._wrap(left.join(F.broadcast(right), on=self.key_cols, how=how))

    def hash_lookup(self, other: "PairSCollection") -> "PairSCollection":
        """SCollection.scala:1014 ``hashLookup`` — all matching RHS values per
        LHS row, as an array (broadcast)."""
        vals = other.value_cols
        v = F.struct(*vals) if len(vals) > 1 else F.col(vals[0])
        rhs = other._gb().agg(F.collect_list(v).alias("matches"))
        return self._wrap(self.df.join(F.broadcast(rhs), on=self.key_cols, how="left"))

    def intersect_by_key(self, other: "PairSCollection") -> "PairSCollection":
        """PairSCollectionFunctions.scala:897 — left_semi."""
        return self._wrap(
            self.df.join(other.df.select(*other.key_cols).distinct(), self.key_cols, "left_semi")
        )

    def subtract_by_key(self, other: "PairSCollection") -> "PairSCollection":
        """PairSCollectionFunctions.scala:1115 — left_anti."""
        return self._wrap(
            self.df.join(other.df.select(*other.key_cols).distinct(), self.key_cols, "left_anti")
        )

    def hash_intersect_by_key(self, other: "PairSCollection") -> "PairSCollection":
        """PairHashSCollectionFunctions.scala:183 — broadcast left_semi."""
        return self._wrap(
            self.df.join(
                F.broadcast(other.df.select(*other.key_cols).distinct()),
                self.key_cols,
                "left_semi",
            )
        )

    def hash_subtract_by_key(self, other: "PairSCollection") -> "PairSCollection":
        """PairHashSCollectionFunctions.scala:210 — broadcast left_anti."""
        return self._wrap(
            self.df.join(
                F.broadcast(other.df.select(*other.key_cols).distinct()),
                self.key_cols,
                "left_anti",
            )
        )

    def cogroup(self, *others: "PairSCollection", suffixes=None) -> "PairSCollection":
        """PairSCollectionFunctions.scala:116 ``cogroup``/``groupWith`` —
        per-side collect_list then full-outer join on key; accepts 1..N
        other sides (N-way = MultiJoin.cogroup)."""
        from scio_spark.operators.joins import cogroup

        return cogroup(self, *others, suffixes=suffixes)

    def sparse_join(self, other, rhs_num_keys: int | None = None, how: str = "inner", fpp: float = 0.01, suffixes=("_1", "_2")) -> "PairSCollection":
        """PairSCollectionFunctions.scala:291+ sparse*Join — exact-keyset
        semi-join when broadcast-sized; Bloom prefilter sized by
        ``rhs_num_keys``/``fpp`` above the broadcast threshold."""
        from scio_spark.operators.joins import sparse_join

        return sparse_join(
            self, other, how=how, fpp=fpp, rhs_num_keys=rhs_num_keys,
            suffixes=suffixes,
        )

    def skewed_join(self, other, how: str = "inner", hot_key_threshold: int = 9000, sample_fraction: float | None = None, suffixes=("_1", "_2")) -> "PairSCollection":
        """PairSkewedSCollectionFunctions.scala:186+ — CMS hot/chill split; we
        rely on AQE skew-join plus an explicit hot-key split fallback.
        ``sample_fraction`` = the :600-612 sampled-detection knob."""
        from scio_spark.operators.joins import skewed_join

        return skewed_join(self, other, how=how, hot_key_threshold=hot_key_threshold, sample_fraction=sample_fraction, suffixes=suffixes)

    def cross(self, tiny) -> "PairSCollection":
        """SCollection.scala:999 ``cross`` — cartesian with broadcast tiny side."""
        tiny_df = tiny.df if hasattr(tiny, "df") else tiny
        return self._wrap(self.df.crossJoin(F.broadcast(tiny_df)))

    # --------------------------------------------------------------- output

    def collect(self):
        return self.df.collect()

    def cache(self) -> "PairSCollection":
        return self._wrap(self.df.cache())
