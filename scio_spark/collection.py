"""SCollection — the distributed collection (SCollection.scala:121 analog).

Element model: a DataFrame. Single-value collections use one ``value`` column
(scio ``SCollection[T]`` of primitives); record collections are multi-column
(scio case classes → StructType). Keyed ops live on :class:`PairSCollection`
(pair.py), reached via :meth:`key_by` — mirroring scio's implicit
``makePairSCollectionFunctions`` (SCollection.scala:82-92).

Fast path vs slow path: every transformation accepts Column expressions /
SQL strings so the plan stays inside Catalyst + whole-stage codegen. Python
callables are accepted where scio takes lambdas, but route through (Arrow)
UDFs and are the documented slow path — exactly the inverse of scio, where
*every* op is a JVM lambda in a DoFn (util/Functions.scala).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.expr(c) if isinstance(c, str) else F.lit(c)


class SCollection:
    """Fluent wrapper over a DataFrame with scio's operator names.

    ``.df`` is always available — the abstraction is deliberately leaky so
    users can drop to raw DataFrame/SQL at any point (scio similarly exposes
    ``applyTransform``, SCollection.scala:178-191).
    """

    def __init__(self, df: DataFrame, context=None):
        self.df = df
        self.context = context

    # -------------------------------------------------------------- plumbing

    def _wrap(self, df: DataFrame) -> "SCollection":
        return SCollection(df, self.context)

    @property
    def spark(self):
        return self.df.sparkSession

    def to_df(self) -> DataFrame:
        return self.df

    def with_name(self, name: str) -> "SCollection":
        """SCollection.scala:256 ``withName`` — names become plan hints only."""
        return self._wrap(self.df.hint("scio_name_" + name) if False else self.df)

    def transform(self, fn: Callable[["SCollection"], "SCollection"]) -> "SCollection":
        """SCollection.scala:270 ``transform`` — named composite = plain function."""
        return fn(self)

    # ---------------------------------------------------------- element-wise

    def map(self, *exprs, **named) -> "SCollection":
        """SCollection.scala:769 ``map``.

        ``map(expr, ...)`` projects expressions (fast path). ``map(fn,
        schema=...)`` with a callable routes through mapInPandas (slow path).
        Named kwargs become aliased columns: ``map(total="a+b")``.
        """
        if len(exprs) == 1 and callable(exprs[0]) and not isinstance(exprs[0], Column):
            fn = exprs[0]
            schema = named.pop("schema")
            return self.map_partitions(fn, schema)
        cols = [_col(e) for e in exprs]
        cols += [_col(e).alias(k) for k, e in named.items()]
        return self._wrap(self.df.select(*cols))

    select = map

    def map_values_expr(self, expr) -> "SCollection":
        """Replace the ``value`` column via an expression of ``value``."""
        return self._wrap(self.df.withColumn("value", _col(expr)))

    def map_partitions(self, fn: Callable, schema) -> "SCollection":
        """Arrow-batched per-partition map (mapInPandas) — the sanctioned slow
        path for opaque Python logic (scio ``map`` with a closure)."""
        return self._wrap(self.df.mapInPandas(fn, schema))

    def with_column(self, name: str, expr) -> "SCollection":
        return self._wrap(self.df.withColumn(name, _col(expr)))

    def filter(self, pred) -> "SCollection":
        """SCollection.scala:643."""
        return self._wrap(self.df.filter(pred if isinstance(pred, (Column, str)) else _col(pred)))

    def filter_not(self, pred) -> "SCollection":
        """SCollection.scala:650."""
        p = pred if isinstance(pred, Column) else F.expr(pred)
        return self._wrap(self.df.filter(~p))

    def collect_pf(self, pred, *exprs, **named) -> "SCollection":
        """SCollection.scala:520 ``collect`` (partial function) = filter+map."""
        return self.filter(pred).map(*exprs, **named)

    def flat_map(self, expr, alias: str = "value") -> "SCollection":
        """SCollection.scala:657 — explode an array-valued expression; other
        columns are preserved."""
        return self._wrap(self.df.withColumn(alias, F.explode(_col(expr))))

    def flat_map_outer(self, expr, alias: str = "value") -> "SCollection":
        """flatMap keeping empty-producing rows as nulls (explode_outer)."""
        return self._wrap(self.df.withColumn(alias, F.explode_outer(_col(expr))))

    def flatten(self, column: str = "value") -> "SCollection":
        """SCollection.scala:665 — SCollection[Iterable[U]] → SCollection[U]."""
        return self._wrap(self.df.select(F.explode(F.col(column)).alias(column)))

    def key_by(self, *key_cols, **key_exprs):
        """SCollection.scala:762 ``keyBy`` → PairSCollection keyed on columns
        (strings) or named expressions (``key_by(k="upper(name)")``)."""
        from scio_spark.pair import PairSCollection

        df = self.df
        keys = list(key_cols)
        for name, e in key_exprs.items():
            df = df.withColumn(name, _col(e))
            keys.append(name)
        return PairSCollection(df, keys, self.context)

    def debug(self, n: int = 20) -> "SCollection":
        """SCollection.scala:1037 — print passthrough."""
        self.df.show(n, truncate=False)
        return self

    # -------------------------------------------------------------- set ops

    def union(self, other: "SCollection") -> "SCollection":
        """SCollection.scala:300 ``++`` / ``union`` — keeps duplicates."""
        return self._wrap(self.df.unionByName(other.df))

    def intersection(self, other: "SCollection") -> "SCollection":
        """SCollection.scala:322 — dedups (scio's does too, :318-320)."""
        return self._wrap(self.df.intersect(other.df))

    def subtract(self, other: "SCollection") -> "SCollection":
        """SCollection.scala:967 — reference semantics are an anti-join
        (map((_,())).subtractByKey(that).keys): EVERY occurrence of a
        matched element is removed ([1,1,2]−[1] = [2]). Implemented as a
        left_anti join against the other side's distinct rows."""
        return self._wrap(
            self.df.join(other.df.distinct(), on=self.df.columns, how="left_anti")
        )

    def except_all(self, other: "SCollection") -> "SCollection":
        """Multiset difference (Spark exceptAll: [1,1,2]−[1] = [1,2]) —
        NOT the reference ``subtract``; provided as the per-occurrence
        variant for users who want bag semantics."""
        return self._wrap(self.df.exceptAll(other.df))

    def distinct(self) -> "SCollection":
        """SCollection.scala:615."""
        return self._wrap(self.df.distinct())

    def distinct_by(self, *cols) -> "SCollection":
        """SCollection.scala:628 ``distinctBy`` — one representative per key."""
        return self._wrap(self.df.dropDuplicates(list(cols)))

    # --------------------------------------------------------- aggregations

    def agg(self, *exprs, **named) -> "SCollection":
        cols = [_col(e) for e in exprs] + [_col(e).alias(k) for k, e in named.items()]
        return self._wrap(self.df.agg(*cols))

    def count(self) -> int:
        """SCollection.scala:560 — action."""
        return self.df.count()

    def count_lazy(self) -> "SCollection":
        return self._wrap(self.df.agg(F.count(F.lit(1)).alias("count")))

    def count_by_value(self, *cols) -> "SCollection":
        """SCollection.scala:606 ``countByValue``."""
        cols = list(cols) or self.df.columns
        return self._wrap(self.df.groupBy(*cols).agg(F.count(F.lit(1)).alias("count")))

    def count_approx_distinct(self, col: str = "value", rsd: float = 0.05) -> "SCollection":
        """SCollection.scala:570 ``countApproxDistinct`` → HLL++
        (approx_count_distinct); exact for low cardinality (sparse mode)."""
        return self._wrap(
            self.df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))
        )

    def sum(self, col: str = "value") -> "SCollection":
        """SCollection.scala:806 ``sum`` (Semigroup) — numeric fast path."""
        return self._wrap(self.df.agg(F.sum(col).alias("sum")))

    def mean(self, col: str = "value") -> "SCollection":
        """SCollection.scala:820."""
        return self._wrap(self.df.agg(F.avg(col).alias("mean")))

    def min(self, col: str = "value") -> "SCollection":
        """SCollection.scala:778."""
        return self._wrap(self.df.agg(F.min(col).alias("min")))

    def max(self, col: str = "value") -> "SCollection":
        """SCollection.scala:788."""
        return self._wrap(self.df.agg(F.max(col).alias("max")))

    def latest(self, ts_col: str, *value_cols) -> "SCollection":
        """SCollection.scala:797 ``latest`` — value at max event timestamp via
        ``max_by`` (no shuffle beyond the single agg)."""
        vals = list(value_cols) or [c for c in self.df.columns if c != ts_col]
        return self._wrap(
            self.df.agg(*[F.max_by(v, ts_col).alias(v) for v in vals])
        )

    def reduce(self, merge_expr: Callable[[Column, Column], Column], col: str = "value") -> "SCollection":
        """SCollection.scala:909 ``reduce`` — associative merge via F.reduce
        over collect_list is NOT scalable; use F.aggregate on grouped arrays
        only for small groups. Global numeric reduce → built-in agg."""
        return self._wrap(
            self.df.agg(
                F.reduce(
                    F.collect_list(col), F.lit(None).cast(self.df.schema[col].dataType),
                    lambda acc, x: F.when(acc.isNull(), x).otherwise(merge_expr(acc, x)),
                ).alias("reduced")
            )
        )

    def aggregate(self, *agg_cols, **named) -> "SCollection":
        """SCollection.scala:416 ``aggregate`` — Catalyst always lifts partial
        aggregation (Beam combiner lifting, free here)."""
        return self.agg(*agg_cols, **named)

    def stats(self, col: str = "value") -> "SCollection":
        """DoubleSCollectionFunctions.scala:29 ``stats`` — one-pass
        count/mean/min/max/variance/stdev (StatCounter.scala:48-139 analog,
        a single partial-aggregated pass in Spark)."""
        c = F.col(col)
        return self._wrap(
            self.df.agg(
                F.count(c).alias("count"),
                F.avg(c).alias("mean"),
                F.min(c).alias("min"),
                F.max(c).alias("max"),
                F.var_pop(c).alias("variance"),
                F.stddev_pop(c).alias("stdev"),
                F.sum(c).alias("sum"),
            )
        )

    def histogram(self, col: str, buckets: Sequence[float]) -> "SCollection":
        """DoubleSCollectionFunctions.scala:67-206 ``histogram`` with explicit
        bucket boundaries → width_bucket + groupBy (scio: custom combine of
        Array[Long]; here: partial-agg'd groupBy, no custom code)."""
        lo, hi, n = float(buckets[0]), float(buckets[-1]), len(buckets) - 1
        uniform = all(
            abs((buckets[i + 1] - buckets[i]) - (hi - lo) / n) < 1e-9 for i in range(n)
        )
        c = F.col(col)
        if uniform:
            b = F.when(c == hi, F.lit(n)).otherwise(
                F.width_bucket(c, F.lit(lo), F.lit(hi), F.lit(n))
            )
        else:
            b = F.lit(None)
            for i in range(n, 0, -1):
                b = F.when(
                    (c >= F.lit(float(buckets[i - 1]))) & (c < F.lit(float(buckets[i]))),
                    F.lit(i),
                ).otherwise(b)
            b = F.when(c == hi, F.lit(n)).otherwise(b)
        return self._wrap(
            self.df.withColumn("bucket", b)
            .filter(F.col("bucket").isNotNull() & (F.col("bucket") >= 1) & (F.col("bucket") <= n))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("count"))
        )

    def quantiles_approx(self, col: str, quantiles: Sequence[float], accuracy: int = 10000) -> "SCollection":
        """SCollection.scala:834 ``quantilesApprox`` → percentile_approx."""
        return self._wrap(
            self.df.agg(
                F.percentile_approx(col, list(quantiles), accuracy).alias("quantiles")
            )
        )

    def quantiles_exact(self, col: str, quantiles: Sequence[float]) -> "SCollection":
        """Exact percentile (continuous interpolation) — matches DuckDB
        quantile_cont; use when oracle-exactness matters more than memory."""
        qs = ", ".join(str(q) for q in quantiles)
        return self._wrap(
            self.df.agg(F.expr(f"percentile({col}, array({qs}))").alias("quantiles"))
        )

    # ------------------------------------------------------------- ordering

    def top(self, n: int, order_by, ascending: bool = False) -> "SCollection":
        """SCollection.scala:985 ``top`` — orderBy+limit; Spark plans a
        TakeOrderedAndProject (per-partition heap + driver merge), same as
        Beam's Top.of combine. No full sort at scale."""
        c = _col(order_by)
        return self._wrap(self.df.orderBy(c.asc() if ascending else c.desc()).limit(n))

    def take(self, n: int) -> "SCollection":
        """SCollection.scala:976 — Sample.any ≈ limit (LimitPushDown)."""
        return self._wrap(self.df.limit(n))

    # ------------------------------------------------- sampling / splitting

    def sample(self, fraction: float, with_replacement: bool = False, seed: int | None = None) -> "SCollection":
        """SCollection.scala:947 — Bernoulli/Poisson per-partition samplers
        (util/random/RandomSampler.scala) → df.sample."""
        return self._wrap(self.df.sample(with_replacement, fraction, seed))

    def sample_n(self, n: int, seed: int | None = None):
        """SCollection.scala:922 reservoir sample of exactly n (driver-visible,
        like scio's iterator-of-one-sample)."""
        return self.df.rdd.takeSample(False, n, seed if seed is not None else 42)

    def sample_weighted(
        self, n: int, weight_expr, seed: int = 42, id_col: str | None = None
    ) -> "SCollection":
        """SCollection.scala:926 weighted reservoir sample of exactly n —
        A-Res (Efraimidis–Spirakis): each row gets priority u^(1/w) with
        u ~ U(0,1); the global top-n by priority is a weighted reservoir
        sample without replacement. Spark plans TakeOrderedAndProject
        (per-partition heaps + driver merge of n rows) — no full sort, no
        driver materialization beyond the sample itself.

        ``id_col=None`` draws u with ``F.rand(seed)`` — seeded but
        partition-order dependent (a repartition changes the sample).
        Passing a unique ``id_col`` derives u from a seeded md5 of the id
        instead: the sample is then ROW-STABLE (same rows regardless of
        partitioning/engine — the hash_split convention) and replays
        exactly in SQL, at identical distribution (u is uniform on the
        48-bit grid)."""
        w = _col(weight_expr).cast("double")
        if id_col is None:
            u = F.rand(seed)
        else:
            u = F.expr(
                f"(CAST(conv(substring(md5(concat('{seed}', '|', "
                f"CAST({id_col} AS STRING))), 1, 12), 16, 10) AS DOUBLE)"
                " + 0.5) / 281474976710656.0"
            )
        pr = F.pow(u, F.lit(1.0) / w)
        return self._wrap(
            self.df.withColumn("__pr", pr).orderBy(F.desc("__pr")).limit(n).drop("__pr")
        )

    def sample_byte_sized(
        self, max_bytes: int, col: str = "value", seed: int = 42, margin: int = 4
    ) -> "SCollection":
        """SCollection.scala:930 byte-sized reservoir: a uniform random
        sample whose summed byte size stays ≤ max_bytes.

        Two stages, both bounded: (1) TakeOrdered the top
        ``margin · max_bytes / avg_row_bytes`` rows by random priority — a
        candidate set a few times larger than the sample can possibly be;
        (2) running byte total in priority order over the (small) candidate
        set, keep while ≤ max_bytes. Only candidates — never the corpus —
        pass through a single-partition window."""
        from pyspark.sql import Window

        size = F.octet_length(F.col(col))
        avg = self.df.agg(F.avg(size.cast("double")).alias("a")).collect()[0]["a"]
        n_cand = int(max(64, margin * max_bytes / max(avg or 1.0, 1.0)))
        cand = self.df.withColumn("__pr", F.rand(seed)).orderBy(F.desc("__pr")).limit(n_cand)
        w = Window.orderBy(F.desc("__pr")).rowsBetween(Window.unboundedPreceding, 0)
        return self._wrap(
            cand.withColumn("__cum", F.sum(size).over(w))
            .filter(F.col("__cum") <= max_bytes)
            .drop("__pr", "__cum")
        )

    def random_split(self, weights: Sequence[float], seed: int | None = None):
        """SCollection.scala:849 ``randomSplit``. NB Spark recomputes lineage
        per branch — cache the parent first (Beam's multi-output is one pass;
        documented gap, SURVEY §4.4.3)."""
        cached = self.df.cache()
        return [self._wrap(d) for d in cached.randomSplit(list(weights), seed)]

    def partition_by_pred(self, pred):
        """SCollection.scala:366 ``partition(pred)`` → (pass, fail); single
        cached scan + two filters."""
        cached = self.df.cache()
        p = pred if isinstance(pred, Column) else F.expr(pred)
        return self._wrap(cached.filter(p)), self._wrap(cached.filter(~p))

    def partition_n(self, n: int, expr):
        """SCollection.scala:341 ``partition(numPartitions, f)`` — N filters
        off one cached scan."""
        cached = self.df.cache()
        part = F.pmod(_col(expr), F.lit(n))
        return [self._wrap(cached.filter(part == i)) for i in range(n)]

    def hash_filter(self, other: "SCollection", on=None) -> "SCollection":
        """SCollection.scala ``hashFilter(sideInput)`` — keep elements whose
        value appears in the (small) side collection: a broadcast LEFT SEMI
        join, the set-membership sibling of ``hash_lookup``. ``on`` names
        the matching column(s); default = all of the side's columns."""
        cols = [on] if isinstance(on, str) else list(on or other.df.columns)
        return self._wrap(
            self.df.join(
                F.broadcast(other.df.select(*cols).distinct()), cols, "left_semi"
            )
        )

    def hash_partition(self, n: int) -> "SCollection":
        """SCollection.scala:398 — physical repartition by row hash."""
        return self._wrap(self.df.repartition(n))

    # ------------------------------------------------------------- batching

    def batch(self, max_size: int, id_col: str | None = None) -> "SCollection":
        """SCollection.scala:460 ``batch`` — group elements into arrays of
        ≤max_size. Default path is a partition-local mapInPandas chunker:
        genuinely ZERO shuffle (batches never span partitions — the same
        per-bundle semantics as the reference BatchDoFn; at most one
        under-full batch per partition). With ``id_col``, buckets by
        id/max_size instead — deterministic global batch membership, at the
        cost of one hash exchange on the synthetic bucket id."""
        if id_col is not None:
            bucket = (F.col(id_col) / F.lit(max_size)).cast("long")
            others = self.df.columns
            return self._wrap(
                self.df.withColumn("__batch", bucket)
                .groupBy("__batch")
                .agg(F.collect_list(F.struct(*others)).alias("batch"))
                .drop("__batch")
            )
        import pandas as pd
        from pyspark.sql.types import ArrayType, StructField, StructType

        row_type = StructType(list(self.df.schema.fields))
        out_schema = StructType([StructField("batch", ArrayType(row_type))])

        def gen(batches):
            cur: list = []
            for pdf in batches:
                recs = cur + pdf.to_dict("records")
                n_full = len(recs) // max_size
                out = [
                    recs[i * max_size : (i + 1) * max_size] for i in range(n_full)
                ]
                cur = recs[n_full * max_size :]
                if out:
                    yield pd.DataFrame({"batch": out})
            if cur:
                yield pd.DataFrame({"batch": [cur]})

        return self._wrap(self.df.mapInPandas(gen, out_schema))

    def batch_weighted(self, max_weight: float, weight_expr) -> "SCollection":
        """SCollection.scala:505 ``batchWeighted`` (and :484 byteSized with a
        byte-length weight): greedily group rows into arrays whose summed
        weight stays ≤ max_weight, per partition, no shuffle.

        Greedy semantics match the reference BatchDoFn: a batch closes when
        the next row would push it past max_weight; a single row heavier
        than max_weight forms its own batch. (A cumsum/ceil bucketing is NOT
        greedy — with weights [4,5,5] and max 8 it puts 10 in one batch —
        so this runs as a mapInPandas scan that carries the open batch
        across Arrow batches within the partition.)"""
        import pandas as pd
        from pyspark.sql.types import ArrayType, StructField, StructType

        others = list(self.df.columns)
        row_type = StructType(list(self.df.schema.fields))
        out_schema = StructType([StructField("batch", ArrayType(row_type))])
        src = self.df.withColumn("__w", _col(weight_expr).cast("double"))

        def gen(batches):
            cur: list = []
            cur_w = 0.0
            for pdf in batches:
                out = []
                for rec in pdf.to_dict("records"):
                    w = rec.pop("__w")
                    if cur and cur_w + w > max_weight:
                        out.append(cur)
                        cur, cur_w = [], 0.0
                    cur.append({k: rec[k] for k in others})
                    cur_w += w
                if out:
                    yield pd.DataFrame({"batch": out})
            if cur:
                yield pd.DataFrame({"batch": [cur]})

        return self._wrap(src.mapInPandas(gen, out_schema))

    def batch_byte_sized(self, max_bytes: int, col: str = "value") -> "SCollection":
        """SCollection.scala:484 ``batchByteSized`` — batch_weighted with the
        column's byte length as the weight (octet_length: characters ≠ bytes
        for non-ASCII text)."""
        return self.batch_weighted(max_bytes, F.octet_length(F.col(col)))

    def fold(self, zero, merge_expr: str, col: str = "value") -> "SCollection":
        """SCollection.scala:674 ``fold(zero)(op)`` — associative fold via an
        aggregate expression with an explicit zero (cast to the column type:
        Spark requires the accumulator type to match the merge output)."""
        dt = self.df.schema[col].dataType.simpleString()
        return self._wrap(
            self.df.agg(
                F.expr(
                    f"aggregate(collect_list({col}), CAST({zero!r} AS {dt}), "
                    f"(acc, x) -> {merge_expr})"
                ).alias("folded")
            )
        )

    # ------------------------------------------------------------------- IO

    def save_as_text_file(self, path: str, io_id: str | None = None):
        """SCollection.scala:1629."""
        self._write(io_id or f"text:{path}", lambda df: df.write.mode("overwrite").text(path))

    def save_as_parquet(self, path: str, io_id: str | None = None, partition_by: Sequence[str] = ()):  # noqa: E501
        w = lambda df: (
            df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
            if partition_by
            else df.write.mode("overwrite").parquet(path)
        )
        self._write(io_id or f"parquet:{path}", w)

    def save_as_json_file(self, path: str, io_id: str | None = None):
        self._write(io_id or f"json:{path}", lambda df: df.write.mode("overwrite").json(path))

    def save_as_orc_file(self, path: str, io_id: str | None = None):
        """Columnar ORC sink (Spark-native writer)."""
        self._write(io_id or f"orc:{path}", lambda df: df.write.mode("overwrite").orc(path))

    def save_as_csv_file(self, path: str, io_id: str | None = None, header: bool = True):
        self._write(
            io_id or f"csv:{path}",
            lambda df: df.write.mode("overwrite").option("header", header).csv(path),
        )

    def save_as_xml_file(self, path: str, row_tag: str = "row", io_id: str | None = None):
        """XML sink (Spark 4 native spark-xml writer)."""
        self._write(
            io_id or f"xml:{path}",
            lambda df: df.write.mode("overwrite")
            .option("rowTag", row_tag)
            .format("xml")
            .save(path),
        )

    def save_as_jdbc(
        self,
        url: str,
        table: str,
        io_id: str | None = None,
        mode: str = "overwrite",
        num_partitions: int | None = None,
        **properties,
    ) -> None:
        """saveAsJdbc (scio-jdbc JdbcIO write analog). ``num_partitions``
        bounds the number of concurrent connections (coalesce before the
        write); embedded drivers (Derby in tests) want 1."""

        def w(df):
            d = df.coalesce(num_partitions) if num_partitions else df
            d.write.jdbc(url, table, mode=mode, properties=dict(properties))

        self._write(io_id or f"jdbc:{table}", w)

    def save_as_avro_file(self, path: str, io_id: str | None = None, codec: str = "deflate"):
        """saveAsAvroFile (scio-avro AvroIO.scala): spark-avro writer when
        the jar exists, else the repo's pure-Python object-container codec
        (sources/avro.py, JVM-interop-tested)."""

        def w(df):
            try:
                df.write.mode("overwrite").format("avro").save(path)
            except Exception as e:  # noqa: BLE001
                if "Failed to find data source" not in str(e):
                    raise
                from .sources.avro import save_as_avro

                save_as_avro(df, path, codec=codec)

        self._write(io_id or f"avro:{path}", w)

    def save_as_tf_example_file(self, path: str, io_id: str | None = None):
        """saveAsTfExampleFile (scio-tensorflow TFExampleIO.scala): rows →
        tf.Example protobufs in CRC-framed TFRecords (sources/proto.py)."""
        from .sources.proto import save_as_tf_example

        self._write(
            io_id or f"tfexample:{path}", lambda df: save_as_tf_example(df, path)
        )

    def save_as_webdataset(
        self, path: str, key_col: str, ext_cols: dict, io_id: str | None = None
    ):
        """WebDataset tar shards for multimodal samples (sources/webdataset.py)."""
        from .sources.webdataset import save_as_webdataset as _w

        self._write(
            io_id or f"webdataset:{path}",
            lambda df: _w(df, path, key_col, ext_cols),
        )

    def save_as_arrow_file(
        self, path: str, io_id: str | None = None, compression: str | None = "zstd"
    ):
        """Arrow IPC / Feather v2 shards (sources/arrow_ipc.py) — the
        zero-copy interchange for Python training stacks."""
        from .sources.arrow_ipc import save_as_arrow_ipc

        self._write(
            io_id or f"arrow:{path}",
            lambda df: save_as_arrow_ipc(df, path, compression=compression),
        )

    def save_as_custom_output(self, io_id: str, writer) -> None:
        """saveAsCustomOutput (SCollection.scala:1740): arbitrary writer fn,
        captured under JobTest like every named sink."""
        self._write(io_id, writer)

    def materialize(self, name: str) -> "SCollection":
        """SCollection.scala:1600 — cache + temp view, tapped on the context."""
        if self.context is not None:
            return self._wrap(self.context.materialize(name, self.df))
        return self._wrap(self.df.cache())

    def _write(self, io_id: str, writer):
        if self.context is not None:
            self.context.write_or_capture(self.df, io_id, writer)
        else:
            writer(self.df)

    # -------------------------------------------------------------- actions

    def collect(self):
        return self.df.collect()

    def to_pandas(self):
        return self.df.toPandas()

    def cache(self) -> "SCollection":
        return self._wrap(self.df.cache())

    def explain(self, mode: str = "formatted"):
        self.df.explain(mode)
        return self
