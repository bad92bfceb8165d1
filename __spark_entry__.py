"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H-Q1-style pricing summary) through the
scio_spark library on sf0.001.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2; the driver cross-checks each against DuckDB at sf0.01.

Determinism conventions (so order-insensitive value hashes match):
- money/double sums go through CAST(... AS DECIMAL(18,4)) then back to double
  (decimal addition is associative; raw double sums are partition-order
  dependent in BOTH engines);
- every computed column is aliased identically in Spark and SQL;
- top-k queries carry a total order (explicit tie-breaker column);
- the Spark session is pinned to UTC (scio_spark.context.DEFAULT_CONFS).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the driver may import this file by path from any cwd — make the sibling
# scio_spark package importable regardless
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scio_spark import ScioContext
from scio_spark.operators import joins as J

SF_SMOKE = "/root/testdata/sf0.001"


def _ctx(spark: SparkSession) -> ScioContext:
    import os

    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return ScioContext(spark)


def _t(sc: ScioContext, sf_dir: str, name: str):
    coll = sc.parquet_file(f"{sf_dir}/{name}.parquet", io_id=f"table:{name}")
    if name == "events" and dict(coll.df.dtypes).get("ts") == "bigint":
        # nanos-as-long → micros timestamp (integer DIV: exact above 2^53)
        coll = coll.with_column("ts", F.expr("TIMESTAMP_MICROS(ts DIV 1000)"))
    return coll


def _dsum(expr: str, alias: str, scale: int = 4) -> str:
    """Deterministic double sum: decimal-accumulate, present as double."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def _asset_base(spark: SparkSession, n: int) -> DataFrame:
    """Synthetic media-asset id table for the codec queries, partitioned
    by FIXTURE SIZE, not scheduling width (r15-opt, guide §4): at the
    default ``spark.range(n)`` split every task carries 1-2 rows, so a
    multi-stage codec pipeline pays a per-task Python worker round-trip
    per ~single asset — measured 1.75 s → 0.55 s for audio_resample at
    n=32 just by packing ≥4 assets per task. ``min(width, n // 4)``
    stays scale-adaptive: it never exceeds the scheduler's width (the
    driver's lower-core runs get fewer, equally-full tasks) and never
    slices a fixed-size fixture thinner than the round-trip amortizes."""
    width = spark.sparkContext.defaultParallelism
    parts = max(1, min(width, n // 4))
    return spark.range(0, n, 1, parts).select(F.col("id").alias("asset_id"))


# --------------------------------------------------------------------- queries


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 family: filter → keyed multi-agg (SCollection.aggregate_by_key,
    SURVEY §2.2). Exercises: filter, key_by, agg_by_key with partial agg."""
    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem")
    out = (
        li.filter("l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'")
        .key_by("l_returnflag", "l_linestatus")
        .agg_by_key(
            F.sum("l_quantity").alias("sum_qty"),
            # Money sums are EXACT decimal arithmetic (each 2-decimal
            # factor round-trips double->decimal identically on every
            # engine), then convert decimal->STRING->DOUBLE for output:
            # the driver gate cannot hash decimal columns (r6/r7 lesson,
            # pinned in test_contract_schema), and DuckDB's direct
            # wide-decimal->double cast double-rounds above 2^53 (a
            # last-ulp sf1 hash mismatch) — string parsing is correctly
            # rounded on both engines, so the doubles agree bit-exactly.
            F.expr(
                "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))"
                " AS STRING) AS DOUBLE)"
            ).alias("sum_base_price"),
            F.expr(
                "CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
                " * CAST(1 - l_discount AS DECIMAL(8,2)) AS DECIMAL(18,4)))"
                " AS STRING) AS DOUBLE)"
            ).alias("sum_disc_price"),
            F.expr(
                "CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
                " * CAST(1 - l_discount AS DECIMAL(8,2))"
                " * CAST(1 + l_tax AS DECIMAL(8,2)) AS DECIMAL(18,6)))"
                " AS STRING) AS DOUBLE)"
            ).alias("sum_charge"),
            F.expr("SUM(l_quantity) / COUNT(*)").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out.df


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) * CAST(1 + l_tax AS DECIMAL(8,2)) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 family via MultiJoin (util/MultiJoin.scala analog): 3-way
    equi-join chain + keyed agg + global top-k with total order."""
    sc = _ctx(spark)
    cust = (
        _t(sc, sf_dir, "customer")
        .filter("c_mktsegment = 'BUILDING'")
        .key_by(custkey="c_custkey")
    )
    orders = _t(sc, sf_dir, "orders").key_by(custkey="o_custkey")
    co = cust.join(orders, "inner")
    li = _t(sc, sf_dir, "lineitem").key_by(orderkey="l_orderkey")
    col = co.to_scollection().key_by(orderkey="o_orderkey").join(li, "inner")
    out = (
        col.to_scollection()
        .key_by("orderkey")
        .agg_by_key(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"
            ).alias("revenue"),
        )
        .to_scollection()
    )
    return out.df.orderBy(F.desc("revenue"), F.asc("orderkey")).limit(10)


ORACLE_TOP_ORDERS = """
SELECT o_orderkey AS orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
"""


def q_count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countByKey (PairSCollectionFunctions.scala:708)."""
    sc = _ctx(spark)
    return (
        _t(sc, sf_dir, "orders")
        .key_by("o_orderpriority")
        .count_by_key()
        .df
    )


ORACLE_COUNT_BY_KEY = """
SELECT o_orderpriority, COUNT(*) AS count FROM orders GROUP BY o_orderpriority
"""


def q_count_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countByValue (SCollection.scala:606)."""
    sc = _ctx(spark)
    return (
        _t(sc, sf_dir, "lineitem")
        .map("l_returnflag", "l_linestatus")
        .count_by_value()
        .df
    )


ORACLE_COUNT_BY_VALUE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS count
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashJoin — broadcast (PairHashSCollectionFunctions.scala:41); no
    shuffle of the big side."""
    sc = _ctx(spark)
    nation = _t(sc, sf_dir, "nation").key_by(regionkey="n_regionkey")
    region = _t(sc, sf_dir, "region").key_by(regionkey="r_regionkey")
    return nation.hash_join(region).df.select("regionkey", "n_name", "r_name")


ORACLE_HASH_JOIN = """
SELECT n_regionkey AS regionkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_top_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topByKey (PairSCollectionFunctions.scala:1138): top-3 orders per
    customer, ranked window with total order."""
    sc = _ctx(spark)
    return (
        _t(sc, sf_dir, "orders")
        .key_by("o_custkey")
        .top_by_key(3, F.struct(F.col("o_totalprice"), F.col("o_orderkey")))
        .df.select("o_custkey", "o_orderkey", "o_totalprice")
    )


ORACLE_TOP_BY_KEY = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct (SCollection.scala:615)."""
    sc = _ctx(spark)
    return _t(sc, sf_dir, "lineitem").map("l_returnflag", "l_linestatus").distinct().df


ORACLE_DISTINCT = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_sum_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sumByKey + countByKey fused (PairSCollectionFunctions.scala:1048)."""
    sc = _ctx(spark)
    return (
        _t(sc, sf_dir, "lineitem")
        .key_by("l_partkey")
        .agg_by_key(
            F.sum("l_quantity").alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .df
    )


ORACLE_SUM_BY_KEY = """
SELECT l_partkey, SUM(l_quantity) AS total_qty, COUNT(*) AS n_items
FROM lineitem GROUP BY l_partkey
"""


def q_subtract_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """subtractByKey (PairSCollectionFunctions.scala:1115) → left_anti."""
    sc = _ctx(spark)
    cust = _t(sc, sf_dir, "customer").key_by(custkey="c_custkey")
    big = (
        _t(sc, sf_dir, "orders")
        .filter("o_totalprice > 400000")
        .key_by(custkey="o_custkey")
    )
    return cust.subtract_by_key(big).df.select("custkey", "c_name")


ORACLE_SUBTRACT_BY_KEY = """
SELECT c_custkey AS custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def q_intersect_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersectByKey (PairSCollectionFunctions.scala:897) → left_semi."""
    sc = _ctx(spark)
    cust = _t(sc, sf_dir, "customer").key_by(custkey="c_custkey")
    big = (
        _t(sc, sf_dir, "orders")
        .filter("o_totalprice > 400000")
        .key_by(custkey="o_custkey")
    )
    return cust.intersect_by_key(big).df.select("custkey", "c_name", "c_mktsegment")


ORACLE_INTERSECT_BY_KEY = """
SELECT c_custkey AS custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats one-pass (DoubleSCollectionFunctions.scala:29; StatCounter
    analog). Variance via exact integral sums so both engines agree bit-for-
    bit (l_quantity is integral)."""
    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem")
    return li.agg(
        F.count("l_quantity").alias("count"),
        F.min("l_quantity").alias("min"),
        F.max("l_quantity").alias("max"),
        F.sum("l_quantity").alias("sum"),
        F.expr("SUM(l_quantity) / COUNT(l_quantity)").alias("mean"),
        F.expr(
            "SUM(l_quantity * l_quantity) / COUNT(l_quantity)"
            " - (SUM(l_quantity) / COUNT(l_quantity)) * (SUM(l_quantity) / COUNT(l_quantity))"
        ).alias("variance"),
    ).df


ORACLE_STATS = """
SELECT COUNT(l_quantity) AS count,
       MIN(l_quantity) AS min,
       MAX(l_quantity) AS max,
       SUM(l_quantity) AS sum,
       SUM(l_quantity) / COUNT(l_quantity) AS mean,
       SUM(l_quantity * l_quantity) / COUNT(l_quantity)
         - (SUM(l_quantity) / COUNT(l_quantity)) * (SUM(l_quantity) / COUNT(l_quantity)) AS variance
FROM lineitem
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countApproxDistinct (SCollection.scala:570) → HLL++; exact at low
    cardinality, oracled against exact COUNT(DISTINCT)."""
    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_returnflag", 0.05).alias("n_flags"),
        F.approx_count_distinct("l_linestatus", 0.05).alias("n_status"),
    ).df


ORACLE_APPROX_DISTINCT = """
SELECT COUNT(DISTINCT l_returnflag) AS n_flags,
       COUNT(DISTINCT l_linestatus) AS n_status
FROM lineitem
"""


def q_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """latestByKey (PairSCollectionFunctions.scala:1040) → max_by on event
    time ((user_id, ts) is unique in the fixture, so deterministic)."""
    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events")
    return (
        ev.key_by("user_id")
        .agg_by_key(
            F.expr("MAX_BY(event_type, ts)").alias("last_event_type"),
            F.max("ts").alias("last_ts"),
        )
        .df
    )


ORACLE_LATEST_BY_KEY = """
SELECT user_id,
       ARG_MAX(event_type, ts) AS last_event_type,
       MAX(ts) AS last_ts
FROM events GROUP BY user_id
"""


def q_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup (PairSCollectionFunctions.scala:116): group sizes per side —
    materialized as counts (arrays hash unstably across engines)."""
    sc = _ctx(spark)
    orders = _t(sc, sf_dir, "orders").map("o_custkey", "o_orderkey").key_by(custkey="o_custkey")
    cust = _t(sc, sf_dir, "customer").map("c_custkey", "c_name").key_by(custkey="c_custkey")
    cg = J.cogroup(cust, orders)
    return cg.df.select(
        "custkey",
        F.size("values_1").alias("n_cust"),
        F.size("values_2").alias("n_orders"),
    )


ORACLE_COGROUP = """
WITH c AS (SELECT c_custkey AS custkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     o AS (SELECT o_custkey AS custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1)
SELECT COALESCE(c.custkey, o.custkey) AS custkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_orders, 0) AS n_orders
FROM c FULL OUTER JOIN o ON c.custkey = o.custkey
"""


def q_cogroup_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiJoin.cogroup (util/MultiJoin.scala:34-530): 3-way cogroup on
    custkey — customers × orders × events — materialized as per-side group
    sizes (arrays hash unstably across engines)."""
    sc = _ctx(spark)
    cust = _t(sc, sf_dir, "customer").map("c_custkey", "c_name").key_by(custkey="c_custkey")
    orders = _t(sc, sf_dir, "orders").map("o_custkey", "o_orderkey").key_by(custkey="o_custkey")
    ev = _t(sc, sf_dir, "events").map("user_id", "event_id").key_by(custkey="user_id")
    cg = J.multi_join([cust, orders, ev], how="cogroup")
    return cg.df.select(
        "custkey",
        F.size("values_1").alias("n_cust"),
        F.size("values_2").alias("n_orders"),
        F.size("values_3").alias("n_events"),
    )


ORACLE_COGROUP_3WAY = """
WITH c AS (SELECT c_custkey AS custkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     o AS (SELECT o_custkey AS custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1),
     e AS (SELECT user_id AS custkey, COUNT(*) AS n_events FROM events GROUP BY 1)
SELECT k.custkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(n_events, 0) AS n_events
FROM (SELECT custkey FROM c UNION SELECT custkey FROM o UNION SELECT custkey FROM e) k
LEFT JOIN c USING (custkey) LEFT JOIN o USING (custkey) LEFT JOIN e USING (custkey)
"""


def q_sparse_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparseJoin (PairSCollectionFunctions.scala:291): RHS keyset ≪ LHS —
    broadcast-keyset semi-join reduction before the shuffle join."""
    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem").key_by(partkey="l_partkey")
    rare_parts = (
        _t(sc, sf_dir, "part")
        .filter("p_size = 1")
        .key_by(partkey="p_partkey")
    )
    out = li.sparse_join(rare_parts, how="inner")
    return (
        out.to_scollection()
        .key_by("partkey")
        .agg_by_key(
            F.sum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .df
    )


ORACLE_SPARSE_JOIN = """
SELECT l_partkey AS partkey, SUM(l_quantity) AS qty, COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size = 1
GROUP BY l_partkey
"""


def q_sparse_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparseJoin, BLOOM regime (PairSCollectionFunctions.scala:394-437 —
    per-partition Bloom filters sized by rhsNumKeys): rhs_num_keys above
    the exact-keyset threshold forces the functions/bloom.py build+probe
    path (JVM-hashed positions, broadcast bitmap, Arrow probe). The left
    flavor exercises BOTH halves — the Bloom hit-side prefilter (false
    positives surface as null-RHS rows through the left join) and the
    definite-non-member miss passthrough — and the result is exactly a
    plain left join, so the oracle needs no Bloom at all."""
    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem").key_by(partkey="l_partkey")
    rare_parts = (
        _t(sc, sf_dir, "part")
        .filter("p_size = 1")
        .key_by(partkey="p_partkey")
    )
    out = li.sparse_join(rare_parts, how="left", rhs_num_keys=5_000_000)
    return (
        out.df.groupBy(F.col("p_partkey").isNotNull().alias("matched"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("qty"),
        )
    )


ORACLE_SPARSE_JOIN_BLOOM = """
SELECT p.p_partkey IS NOT NULL AS matched, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem
LEFT JOIN (SELECT p_partkey FROM part WHERE p_size = 1) p
  ON l_partkey = p.p_partkey
GROUP BY 1
"""


def q_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiJoin 3-way (util/MultiJoin.scala:538): revenue per nation."""
    sc = _ctx(spark)
    cust = _t(sc, sf_dir, "customer").map("c_custkey", "c_nationkey").key_by(custkey="c_custkey")
    orders = _t(sc, sf_dir, "orders").map("o_orderkey", custkey="o_custkey").key_by("custkey")
    co = J.multi_join([cust, orders], how="inner")
    n = _t(sc, sf_dir, "nation").key_by(nationkey="n_nationkey")
    con = co.to_scollection().key_by(nationkey="c_nationkey").hash_join(n)
    return (
        con.to_scollection()
        .key_by("n_name")
        .agg_by_key(F.count(F.lit(1)).alias("n_orders"))
        .df
    )


ORACLE_MULTI_JOIN = """
SELECT n_name, COUNT(*) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_union_distinct_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union (SCollection.scala:300) + distinctBy (:628): one representative
    account row per nationkey across customers and suppliers, deterministic
    representative via min acctbal/key ordering."""
    sc = _ctx(spark)
    c = _t(sc, sf_dir, "customer").map(nationkey="c_nationkey", acctbal="c_acctbal")
    s = _t(sc, sf_dir, "supplier").map(nationkey="s_nationkey", acctbal="s_acctbal")
    u = c.union(s)
    return (
        u.key_by("nationkey")
        .agg_by_key(F.min("acctbal").alias("min_acctbal"), F.count(F.lit(1)).alias("n"))
        .df
    )


ORACLE_UNION = """
WITH u AS (
  SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT s_nationkey, s_acctbal FROM supplier
)
SELECT nationkey, MIN(acctbal) AS min_acctbal, COUNT(*) AS n FROM u GROUP BY nationkey
"""


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram (DoubleSCollectionFunctions.scala:67) — 10 uniform buckets
    over o_totalprice."""
    sc = _ctx(spark)
    return (
        _t(sc, sf_dir, "orders")
        .histogram("o_totalprice", [0.0 + i * 60000.0 for i in range(11)])
        .df
    )


ORACLE_HISTOGRAM = """
SELECT bucket, COUNT(*) AS count FROM (
  SELECT CASE WHEN o_totalprice = 600000.0 THEN 10
              ELSE 1 + CAST(FLOOR(o_totalprice / 60000.0) AS INT) END AS bucket
  FROM orders
  WHERE o_totalprice >= 0.0 AND o_totalprice <= 600000.0
) GROUP BY bucket
"""


# ----------------------------------------------- LLM-pipeline extensions


def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality components (scio_spark.functions.text) —
    single JVM-side pass over documents, no UDFs."""
    from scio_spark.fanout import fan_out_scan
    from scio_spark.functions import text as T

    sc = _ctx(spark)
    # r15-opt: fan the narrow scan to width (0.31-0.34 -> 0.27 s warm).
    d = fan_out_scan(_t(sc, sf_dir, "documents").df)
    return d.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.char_count("text").alias("n_chars_m"),
        T.mean_word_len("text").alias("mean_wlen"),
        T.punct_ratio("text").alias("punct_ratio"),
    )


ORACLE_TEXT_FEATURES = r"""
WITH f AS (
  SELECT doc_id, text,
    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))
      AS n_tokens
  FROM documents
)
SELECT doc_id,
  n_tokens,
  len(text) AS n_chars_m,
  CASE WHEN n_tokens = 0 THEN 0.0
       ELSE len(regexp_replace(trim(text), '\s+', '', 'g')) / n_tokens
  END AS mean_wlen,
  CASE WHEN len(text) = 0 THEN 0.0
       ELSE len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) / len(text) END AS punct_ratio
FROM f
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (functions/text.py with_quality_score —
    staged so shared components are computed once)."""
    from scio_spark.functions import text as T

    from scio_spark.fanout import fan_out_scan

    sc = _ctx(spark)
    # r15-opt: fan the narrow scan to width for the per-row quality
    # expressions (0.59-0.66 -> 0.37-0.53 s warm at sf0.1).
    d = fan_out_scan(_t(sc, sf_dir, "documents").df)
    return T.with_quality_score(d, "text").select("doc_id", "quality")


# the same arithmetic, spelled out for DuckDB (n>0 for every fixture doc)
ORACLE_TEXT_QUALITY = r"""
WITH f AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))
      AS n,
    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        t -> list_contains(['the','a','of','and','to','in','is','it'], lower(t)))) AS sw,
    len(regexp_replace(trim(text), '\s+', '', 'g')) AS chars_nospace,
    CASE WHEN len(text) = 0 THEN 0.0
         ELSE len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) / len(text) END AS pr
  FROM documents
)
SELECT doc_id,
  least(n / 200.0, 1.0) * 0.25
  + least((CASE WHEN n = 0 THEN 0.0 ELSE sw / n END) / 0.4, 1.0) * 0.35
  + (CASE WHEN (CASE WHEN n = 0 THEN 0.0 ELSE chars_nospace / n END) >= 3.0
           AND (CASE WHEN n = 0 THEN 0.0 ELSE chars_nospace / n END) <= 10.0
      THEN 1.0 ELSE 0.4 END) * 0.25
  + (1.0 - least(pr * 4.0, 1.0)) * 0.15 AS quality
FROM f
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword argmax + CJK check) per doc — staged
    so the per-language hit counts are computed once."""
    from scio_spark.functions import text as T

    from scio_spark.fanout import fan_out_scan

    sc = _ctx(spark)
    # r15-opt: stopword-hit counting is per-row expression work; fan the
    # narrow scan to width (0.88-1.05 -> 0.44-0.50 s warm at sf0.1).
    d = fan_out_scan(_t(sc, sf_dir, "documents").df)
    return T.with_lang_id(d, "text").select("doc_id", "lang_pred")


def _sw_hits(lang_list: str) -> str:
    return (
        r"len(list_filter(regexp_split_to_array(trim(text), '\s+'), "
        f"t -> list_contains([{lang_list}], lower(t))))"
    )


_HITS = {
    "en": _sw_hits("'the','a','of','and','to','in','is','it'"),
    "de": _sw_hits("'der','die','das','und','ist','nicht','ein','zu'"),
    "fr": _sw_hits("'le','la','et','les','des','un','une','est'"),
    "es": _sw_hits("'el','los','las','y','es','un','una','que'"),
}

ORACLE_LANG_ID = rf"""
WITH h AS (
  SELECT doc_id,
    {_HITS['en']} AS en, {_HITS['de']} AS de, {_HITS['fr']} AS fr, {_HITS['es']} AS es,
    len(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 AS has_cjk
  FROM documents
)
SELECT doc_id,
  CASE WHEN has_cjk THEN 'zh'
       WHEN en + de + fr + es = 0 THEN 'und'
       WHEN en >= de AND en >= fr AND en >= es THEN 'en'
       WHEN de >= fr AND de >= es THEN 'de'
       WHEN fr >= es THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM h
"""


def q_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-sort fingerprint (functions/text.py) as a fuzzy-exact dedup key:
    groups by fingerprint, keeps min doc_id."""
    from scio_spark.functions import text as T

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").df
    return (
        d.select("doc_id", T.fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


ORACLE_FINGERPRINT = r"""
SELECT md5(array_to_string(list_sort(list_distinct(list_filter(
         regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> ''))), ' '))
         AS fp,
       COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups (functions/dedup.py exact_dedup_groups)."""
    from scio_spark.functions import dedup as D

    sc = _ctx(spark)
    return D.exact_dedup_groups(_t(sc, sf_dir, "documents").df)


ORACLE_DEDUP_EXACT = r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
       COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


_SHINGLE_CTE = """
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, s FROM toks,
  UNNEST(list_transform(generate_series(1, len(w) - 2),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) u(s)),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
pairs AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
jac AS (SELECT id_1, id_2, inter / (ca.n + cb.n - inter) AS jaccard
        FROM pairs JOIN cnt ca ON ca.doc_id = id_1 JOIN cnt cb ON cb.doc_id = id_2)
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-Jaccard near-dup pairs ≥ 0.8 via shingle inverted-index
    join (functions/dedup.py ngram_jaccard_dedup)."""
    from scio_spark.functions import dedup as D

    sc = _ctx(spark)
    return D.ngram_jaccard_dedup(_t(sc, sf_dir, "documents").df, min_jaccard=0.8)


ORACLE_NGRAM_JACCARD = f"""
WITH {_SHINGLE_CTE}
SELECT id_1, id_2, jaccard FROM jac WHERE jaccard >= 0.8
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (functions/dedup.py ngram_contamination):
    docs with doc_id % 29 == 0 play the eval set; flag all other docs
    sharing ≥1 distinct 3-gram with it, with the overlap count."""
    from scio_spark.functions.dedup import ngram_contamination

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    tr = docs.filter(F.col("doc_id") % 29 != 0)
    return ngram_contamination(tr, ev)


ORACLE_DECONTAMINATE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, s FROM toks,
  UNNEST(list_transform(generate_series(1, len(w) - 2),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) u(s)),
ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 29 = 0),
tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 29 <> 0)
SELECT tr.doc_id, COUNT(DISTINCT tr.s) AS n_overlapping
FROM tr JOIN ev ON tr.s = ev.s
GROUP BY tr.doc_id
"""


def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-fraction report (dedup.py contamination_fraction —
    the GPT-3 appendix-C dirty-document metric): docs with doc_id % 37
    == 0 play the eval set; every other doc is scored by the share of its
    distinct 5-grams found in the eval corpus. Per source: scored docs,
    docs over the 10% dirty threshold, and the exact hit/shingle integer
    sums (engine-exact; frac itself is a single double division, so the
    threshold compare is bit-identical in both engines)."""
    from scio_spark.functions.dedup import contamination_fraction

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df
    ev = docs.filter(F.col("doc_id") % 37 == 0)
    tr = docs.filter(F.col("doc_id") % 37 != 0)
    scored = contamination_fraction(tr, ev, n=5)
    return scored.join(docs.select("doc_id", "source"), "doc_id").groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs_scored"),
        F.sum(F.when(F.col("frac") > 0.10, 1).otherwise(0))
        .cast("long")
        .alias("n_dirty"),
        F.sum("n_hit").cast("long").alias("sum_hits"),
        F.sum("n_shingles").cast("long").alias("sum_shingles"),
    )


ORACLE_CONTAMINATION_REPORT = """
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w
              FROM documents),
sh AS (SELECT DISTINCT doc_id, source, s FROM toks,
  UNNEST(list_transform(generate_series(1, len(w) - 4),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
              || ' ' || w[i+4])) u(s)),
ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 37 = 0),
tr AS (SELECT doc_id, source, s FROM sh WHERE doc_id % 37 <> 0),
per AS (
  SELECT tr.doc_id, tr.source,
         COUNT(*) AS n_shingles,
         SUM(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM tr LEFT JOIN ev ON tr.s = ev.s
  GROUP BY tr.doc_id, tr.source
)
SELECT source, COUNT(*) AS n_docs_scored,
       CAST(SUM(CASE WHEN n_hit / CAST(n_shingles AS DOUBLE) > 1e-1
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dirty,
       CAST(SUM(n_hit) AS BIGINT) AS sum_hits,
       CAST(SUM(n_shingles) AS BIGINT) AS sum_shingles
FROM per GROUP BY source
"""


def q_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data mixing (functions/training.py mixture_sample):
    three pseudo-sources (doc_id mod 3) retained at 1.0/0.5/0.25 via
    per-source seeded md5 unit hashes; per-source doc counts + token sums."""
    from scio_spark.functions.text import token_count
    from scio_spark.functions.training import mixture_sample

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df
    mixed = mixture_sample(
        {
            "web": (docs.filter(F.col("doc_id") % 3 == 0), 1.0),
            "books": (docs.filter(F.col("doc_id") % 3 == 1), 0.5),
            "code": (docs.filter(F.col("doc_id") % 3 == 2), 0.25),
        }
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text").cast("long")).alias("n_tokens"),
    )


ORACLE_DATA_MIXTURE = """
WITH src AS (
  SELECT doc_id, text,
         CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'books'
                         ELSE 'code' END AS source,
         CASE doc_id % 3 WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 ELSE 0.25 END AS frac
  FROM documents),
kept AS (
  SELECT * FROM src
  WHERE ('0x' || substring(md5('42:' || source || ':' ||
                               CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          / 4294967296.0 < frac)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM kept GROUP BY source
"""


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus profile (functions/text.py corpus_stats): doc count,
    token totals, exact p50/p99 doc length, exact vocabulary size."""
    from scio_spark.functions.text import corpus_stats

    sc = _ctx(spark)
    return corpus_stats(_t(sc, sf_dir, "documents").df)


ORACLE_CORPUS_STATS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
core AS (
  SELECT COUNT(*) AS total_docs,
         CAST(SUM(len(w)) AS BIGINT) AS total_tokens,
         quantile_cont(len(w), 0.5) AS p50_tokens,
         quantile_cont(len(w), 0.99) AS p99_tokens
  FROM t),
v AS (SELECT COUNT(DISTINCT u.word) AS vocab_size
      FROM t, UNNEST(w) u(word))
SELECT core.*, v.vocab_size FROM core, v
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (functions/text.py
    repetition_signals): distinct-word ratio, top-word fraction, duplicate
    bigram fraction per document — exact integer-ratio arithmetic, so the
    DuckDB replay matches bit-for-bit."""
    from scio_spark.functions.text import repetition_signals

    from scio_spark.fanout import fan_out_scan

    sc = _ctx(spark)
    # r15-opt: per-row n-gram repetition expressions are the expensive
    # pre-shuffle stage; fan a narrow scan to width (no-op at scale).
    # Measured 1.4-1.8 -> 1.2-1.3 s warm at sf0.1.
    return repetition_signals(fan_out_scan(_t(sc, sf_dir, "documents").df))


ORACLE_TEXT_REPETITION = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
base AS (
  SELECT doc_id, len(w) AS n_tokens,
         len(list_distinct(w)) * 1.0 / len(w) AS distinct_word_ratio,
         CASE WHEN len(w) >= 2 THEN
           1.0 - len(list_distinct(list_transform(
                     generate_series(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1]))) * 1.0 / (len(w) - 1)
         ELSE 0.0 END AS dup_bigram_fraction,
         w
  FROM t),
wc AS (SELECT doc_id, u.word, COUNT(*) AS c
       FROM t, UNNEST(w) u(word) GROUP BY 1, 2),
top AS (SELECT doc_id, MAX(c) AS topc FROM wc GROUP BY 1)
SELECT b.doc_id, b.n_tokens, b.distinct_word_ratio,
       top.topc * 1.0 / b.n_tokens AS top_word_fraction,
       b.dup_bigram_fraction
FROM base b JOIN top USING (doc_id)
"""


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split
    (functions/training.py hash_split): md5-derived unit hash per doc_id,
    80/10/10 boundaries — row-stable across runs/repartitions and
    replayable bit-for-bit in DuckDB."""
    from scio_spark.functions.training import hash_split

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df
    return (
        hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_TRAIN_SPLIT = """
WITH u AS (
  SELECT doc_id,
         ('0x' || substring(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
)
SELECT CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n
FROM u GROUP BY 1
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group clustering: transitive closure of the MinHash-LSH
    ≥0.8 pair set via iterative min-label propagation (functions/dedup.py
    connected_components) — every clustered doc labeled with its
    component's min doc_id. This is the production composition: LSH
    banding generates candidates at measured e≈0.8 (SCALING.md r13),
    where the exact inverted-index pair generator is Θ(Σ f_shingle²) —
    quadratic on a saturated-shingle corpus like this synthetic one
    (that exact path remains its own contract row,
    dedup_ngram_jaccard)."""
    from scio_spark.functions import dedup as D

    sc = _ctx(spark)
    pairs = D.minhash_lsh_dedup(
        _t(sc, sf_dir, "documents").df, min_jaccard=0.8
    )
    comps = D.connected_components(pairs)
    out = comps.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("comp")
    )
    handles = getattr(comps, "_scio_cached", None) or []
    handles = list(handles) if isinstance(handles, (list, tuple)) else [handles]
    ph = getattr(pairs, "_scio_cached", None)
    if ph is not None:
        handles.append(ph)
    if handles:
        out._scio_cached = handles
    return out


def _minhash_cte_block(k: int = 16, bands: int = 4) -> str:
    """The shared MinHash-LSH CTE chain (shingles → jac → sig → banded →
    cands), WITHOUT the leading ``WITH`` or a final SELECT, so every
    oracle that needs the banded-candidate pair set composes it directly
    instead of slicing rendered SQL."""
    rpb = k // bands
    # 48-bit md5-slice BIGINT minhashes (dedup.minhash_signature) — the
    # engine-portable integer recipe, two hash functions sliced per md5
    # (hex chars 1-12 / 13-24); band bucket = md5 of the '|'-joined
    # decimal renderings
    mins = ", ".join(
        f"MIN(CAST(('0x' || substr(md5('{i // 2}|' || s),"
        f" {1 + 12 * (i % 2)}, 12)) AS BIGINT)) AS mh{i}"
        for i in range(k)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({cc}) AS bucket FROM sig".format(
            b=b,
            cc=" || '|' || ".join(f"mh{b * rpb + r}" for r in range(rpb)),
        )
        for b in range(bands)
    )
    return f"""{_SHINGLE_CTE},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
banded AS ({band_selects}),
cands AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"""


def _minhash_oracle(k: int = 16, bands: int = 4, thr: float = 0.8) -> str:
    return f"""
WITH {_minhash_cte_block(k, bands)}
SELECT j.id_1, j.id_2, j.jaccard
FROM jac j JOIN cands c ON j.id_1 = c.id_1 AND j.id_2 = c.id_2
WHERE j.jaccard >= {thr}
"""


# clusters over the SAME banded-candidate pair set _minhash_oracle pins
# (16 hashes / 4 bands, jaccard verified >= 0.8), transitively closed.
_MINHASH_ORACLE_CTES = _minhash_cte_block(16, 4)

ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_MINHASH_ORACLE_CTES},
dup_pairs AS (
  SELECT j.id_1, j.id_2 FROM jac j
  JOIN cands c ON j.id_1 = c.id_1 AND j.id_2 = c.id_2
  WHERE j.jaccard >= 0.8
),
-- MATERIALIZED: the reach recursion scans edges once per closure round;
-- un-materialized, every round would re-derive the whole minhash chain
-- (the pack_greedy sf1 lesson)
edges AS MATERIALIZED (SELECT id_1 AS a, id_2 AS b FROM dup_pairs
          UNION SELECT id_2, id_1 FROM dup_pairs),
reach(a, b) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM edges)
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, MIN(b) AS comp FROM reach GROUP BY a
"""


def _incremental_minhash_oracle(k: int = 16, bands: int = 4, mod: int = 5) -> str:
    """Bucket-sharing pairs where ≥1 side is in the NEW batch (doc_id %
    mod = 0) — banding per doc is independent of which set a doc is
    signed in, so the staged-index path equals this whole-corpus SQL."""
    rpb = k // bands
    mins = ", ".join(
        f"MIN(CAST(('0x' || substr(md5('{i // 2}|' || s),"
        f" {1 + 12 * (i % 2)}, 12)) AS BIGINT)) AS mh{i}"
        for i in range(k)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({cc}) AS bucket FROM sig".format(
            b=b,
            cc=" || '|' || ".join(f"mh{b * rpb + r}" for r in range(rpb)),
        )
        for b in range(bands)
    )
    return f"""
WITH {_SHINGLE_CTE},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
banded AS ({band_selects})
SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE a.doc_id % {mod} = 0 OR b.doc_id % {mod} = 0
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup (functions/dedup.py stage_minhash_index +
    incremental_lsh_candidates): the corpus (doc_id % 5 != 0) is staged
    ONCE as a (band,bucket)-bucketed index table; the daily batch
    (doc_id % 5 = 0) bands itself and joins the index co-located —
    O(batch) per ingestion, the corpus is never re-hashed. Candidates =
    bucket-sharing pairs with ≥1 new side; the oracle recomputes them
    from the whole corpus in SQL (per-doc signatures are set-independent,
    so equality proves the staged path loses nothing)."""
    from scio_spark.functions import dedup as D

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df
    index = D.stage_minhash_index(
        docs.filter("doc_id % 5 != 0"), "mh_index", k=8, buckets=16
    )
    return D.incremental_lsh_candidates(
        docs.filter("doc_id % 5 = 0"), index, k=8
    )


ORACLE_INCREMENTAL_DEDUP = _incremental_minhash_oracle(k=8)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands) candidates, exact-Jaccard-verified ≥ 0.8
    (functions/dedup.py minhash_lsh_dedup)."""
    from scio_spark.functions import dedup as D

    sc = _ctx(spark)
    return D.minhash_lsh_dedup(
        _t(sc, sf_dir, "documents").df, k=16, bands=4, min_jaccard=0.8
    )


def _simhash_oracle(max_hamming: int = 3, bits: int = 16) -> str:
    hexs = "0123456789abcdef"
    n_hex = (bits + 3) // 4
    v = " + ".join(
        f"(instr('{hexs}', substring(md5(t), {i + 1}, 1)) - 1) * {16 ** (n_hex - 1 - i)}"
        for i in range(n_hex)
    )
    bit_sums = ", ".join(
        f"SUM(2 * (CAST(FLOOR(v / POW(2, {kk})) AS BIGINT) % 2) - 1) AS b{kk}"
        for kk in range(bits)
    )
    sh_expr = " + ".join(
        f"(CASE WHEN b{kk} >= 0 THEN 1 ELSE 0 END) * {2 ** kk}" for kk in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t FROM documents)
),
v AS (SELECT doc_id, {v} AS v FROM toks),
sums AS (SELECT doc_id, {bit_sums} FROM v GROUP BY doc_id),
sh AS (SELECT doc_id, {sh_expr} AS simhash FROM sums)
SELECT a.doc_id AS id_1, b.doc_id AS id_2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-48 near-dup pairs, Hamming ≤ 3 — the realistic wide-signature
    configuration. Signature width is the scale dial: 12-bit band buckets
    (4096 per band) where 32-bit signatures left only 256 — at 50k docs
    the 8-bit bands were saturating (e≈1.5 measured sf0.1→sf1, and ~1.6k
    ACCIDENTAL hamming≤3 collisions — the output itself was going
    quadratic; 48-bit keeps expected random collisions ≪1; SCALING.md
    r13). Spark side uses exact banded candidates (pigeonhole); oracle
    is the full pairwise check — equality proves the banding loses
    nothing."""
    from scio_spark.functions import dedup as D

    sc = _ctx(spark)
    return D.simhash_dedup(
        _t(sc, sf_dir, "documents").df, max_hamming=3, bits=48
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 for a 10% query sample vs the full corpus
    (functions/similarity.py cosine_topk — the ANN correctness baseline)."""
    from scio_spark.functions import similarity as S

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df
    qs = emb.filter("vec_id % 10 = 0")
    return S.cosine_topk(emb, qs, k=3)


ORACLE_EMBEDDING_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 10 = 0),
s AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_reduce(
             list_transform(generate_series(1, len(c.embedding)),
                            i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)),
             (acc, x) -> acc + x), 5) AS score
  FROM embeddings c, q WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s
) WHERE rank <= 3
"""


# --------------------------------------------------- windowing / sketches / smb


def q_window_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed/tumbling windows (SCollection.scala:1229 withFixedWindows) —
    1h windows × event_type."""
    from scio_spark.operators import windows as W

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    return W.fixed_window_agg(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").alias("total"),
        ],
    ).select("window_start", "event_type", "n", "total")


ORACLE_WINDOW_FIXED = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events GROUP BY 1, 2
"""


def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (:1240) — 1h size / 30m slide (every event in exactly
    2 windows)."""
    from scio_spark.operators import windows as W

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    slid = W.with_sliding_windows(ev, "ts", "1 hour", "30 minutes")
    return (
        slid.groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_WINDOW_SLIDING = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events
)
SELECT window_start, COUNT(*) AS n FROM assigned GROUP BY 1
"""


def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (:1258) — 30min gap per user (session_window in batch;
    oracle = gaps-and-islands)."""
    from scio_spark.operators import windows as W

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    return W.session_agg(
        ev, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n_events")]
    ).select("user_id", "session_start", "n_events")


ORACLE_WINDOW_SESSION = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes' OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), islands AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM islands GROUP BY user_id, sid
"""


def q_window_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar windows (:1275 windowByMonths) — monthly order revenue."""
    from scio_spark.operators import windows as W

    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders").df
    return (
        W.with_calendar_window(o, "o_orderdate", "month")
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
                "revenue"
            ),
        )
    )


ORACLE_WINDOW_CALENDAR = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS window_start,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY 1
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollupAndCount (scio-extra rollup SCollectionSyntax.scala:47) →
    native ROLLUP over (region, nation) with distinct-customer counts."""
    from scio_spark.functions import sketches as K

    sc = _ctx(spark)
    c = _t(sc, sf_dir, "customer").df
    n = _t(sc, sf_dir, "nation").df
    r = _t(sc, sf_dir, "region").df
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return K.rollup_agg(
        joined,
        ["r_name", "n_name"],
        [
            F.count(F.lit(1)).alias("n_cust"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        ],
    )


ORACLE_ROLLUP = """
SELECT r_name, n_name, COUNT(*) AS n_cust,
       COUNT(DISTINCT c_mktsegment) AS n_segments
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderpriority, orderstatus)."""
    from scio_spark.functions import sketches as K

    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders").df
    return K.cube_agg(
        o,
        ["o_orderpriority", "o_orderstatus"],
        [
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
                "revenue"
            ),
        ],
    )


ORACLE_CUBE = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (scio-extra zetasketch sumHll analog): per-type
    user sketches → union → estimate; exact at this cardinality (coupon
    mode), oracled against COUNT(DISTINCT)."""
    from scio_spark.functions import sketches as K

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    return K.approx_distinct_via_merge(ev, "event_type", "user_id")


ORACLE_HLL_MERGE = "SELECT COUNT(DISTINCT user_id) AS n_distinct FROM events"


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key detection (PairSkewedSCollectionFunctions.scala:26-55 CMS
    hot-key path, exact-count variant)."""
    from scio_spark.functions import sketches as K

    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem").df
    n = li.count()
    return K.heavy_hitters(li, "l_suppkey", threshold=int(n / 150))


def _heavy_oracle() -> str:
    return """
WITH c AS (SELECT l_suppkey, COUNT(*) AS freq FROM lineitem GROUP BY 1),
     t AS (SELECT CAST(COUNT(*) / 150 AS BIGINT) AS thr FROM lineitem)
SELECT l_suppkey, freq FROM c, t WHERE freq > thr
"""


def q_smb_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMB: write orders+customer bucketed/sorted by custkey, then a
    shuffle-free sort-merge join + agg (scio-smb sortMergeJoin analog;
    plan shape verified in tests/test_plans.py)."""
    from scio_spark.operators import smb

    sc = _ctx(spark)
    orders = _t(sc, sf_dir, "orders").df.withColumn("custkey", F.col("o_custkey"))
    cust = _t(sc, sf_dir, "customer").df.withColumn("custkey", F.col("c_custkey"))
    smb.save_sorted_bucket(orders, "smb_orders", "custkey", 8)
    smb.save_sorted_bucket(cust, "smb_customer", "custkey", 8)
    joined = smb.sort_merge_join(spark, "smb_orders", "smb_customer", "custkey")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
                "revenue"
            ),
        )
    )


ORACLE_SMB_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_skewed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skewedJoin (PairSkewedSCollectionFunctions.scala:186): explicit
    hot/chill split — hot keys broadcast-joined, rest shuffle-joined;
    result must equal a plain join (oracle)."""
    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem").map("l_orderkey", "l_quantity", suppkey="l_suppkey").key_by("suppkey")
    sup = _t(sc, sf_dir, "supplier").map("s_name", suppkey="s_suppkey").key_by("suppkey")
    out = li.skewed_join(sup, hot_key_threshold=400)
    return (
        out.to_scollection()
        .key_by("s_name")
        .agg_by_key(
            F.sum("l_quantity").alias("qty"), F.count(F.lit(1)).alias("n")
        )
        .df
    )


ORACLE_SKEWED_JOIN = """
SELECT s_name, SUM(l_quantity) AS qty, COUNT(*) AS n
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


def q_sparse_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparseLookup (PairSCollectionFunctions.scala:438): join RHS values
    into LHS as arrays after semi-join reduction; materialized as counts."""
    from scio_spark.operators.joins import sparse_lookup

    sc = _ctx(spark)
    cust = (
        _t(sc, sf_dir, "customer")
        .filter("c_acctbal > 9000")
        .map("c_name", custkey="c_custkey")
        .key_by("custkey")
    )
    orders = _t(sc, sf_dir, "orders").map("o_orderkey", custkey="o_custkey").key_by("custkey")
    out = sparse_lookup(cust, orders)
    return out.df.select(
        "custkey", "c_name", F.size("matches").alias("n_orders")
    )


ORACLE_SPARSE_LOOKUP = """
SELECT c_custkey AS custkey, c_name,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
FROM customer WHERE c_acctbal > 9000
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (rollupAndCount generalization): {(priority,status),
    (priority), ()} in one pass."""
    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders").df
    o.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
"""


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantilesApprox (SCollection.scala:834) — exact-percentile variant for
    oracle parity (continuous interpolation matches quantile_cont)."""
    sc = _ctx(spark)
    return (
        _t(sc, sf_dir, "orders")
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
        )
        .df
    )


ORACLE_QUANTILES = """
SELECT quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75
FROM orders
"""


def q_flat_map_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap (SCollection.scala:657) = explode: tokenize documents, top 20
    tokens with total order."""
    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents")
    return (
        d.flat_map(F.split(F.col("text"), " "), alias="token")
        .map("token")
        .count_by_value()
        .df.orderBy(F.desc("count"), F.asc("token"))
        .limit(20)
    )


ORACLE_FLAT_MAP = """
SELECT token, COUNT(*) AS count
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY count DESC, token ASC LIMIT 20
"""


def q_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cross (SCollection.scala:999): cartesian with broadcast tiny side."""
    sc = _ctx(spark)
    nation = _t(sc, sf_dir, "nation").key_by("n_nationkey")
    region = _t(sc, sf_dir, "region").map("r_name")
    return nation.cross(region).df.select("n_name", "r_name")


ORACLE_CROSS = "SELECT n_name, r_name FROM nation CROSS JOIN region"


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 family: 6-way join (customer⋈orders⋈lineitem⋈supplier⋈nation
    ⋈region) with the local-supplier predicate (c_nationkey = s_nationkey),
    region filter pushed to the scan, dims broadcast."""
    sc = _ctx(spark)
    cust = _t(sc, sf_dir, "customer").df
    orders = _t(sc, sf_dir, "orders").df
    li = _t(sc, sf_dir, "lineitem").df
    sup = _t(sc, sf_dir, "supplier").df
    nat = _t(sc, sf_dir, "nation").df
    reg = _t(sc, sf_dir, "region").df.filter("r_name = 'ASIA'")
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_LOCAL_SUPPLIER = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.py asof_join): each event matched to the
    user's latest order at-or-before the event time — single window pass, one
    shuffle on key. Right side pre-deduped per (key, ts) for determinism."""
    from scio_spark.operators.joins import asof_join

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df.select("event_id", "user_id", "ts")
    orders = (
        _t(sc, sf_dir, "orders")
        .df.groupBy(
            F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("ots")
        )
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    out = asof_join(ev, orders, "user_id", "ts", "ots", ["last_orderkey"])
    return out.select(
        "event_id", "user_id", F.col("matched_ts").alias("last_order_date"), "last_orderkey"
    )


ORACLE_ASOF_JOIN = """
WITH r AS (
  SELECT o_custkey AS user_id, o_orderdate AS ots, MAX(o_orderkey) AS last_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, r.ots AS last_order_date, r.last_orderkey
FROM events e ASOF JOIN r ON e.user_id = r.user_id AND e.ts >= r.ots
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON props column → typed field, keyed
    agg (events.props is a JSON object)."""
    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            # BIGINT both sides: DuckDB SUM(INT) yields HUGEINT (int128),
            # which hash-mismatches Spark's BIGINT in the driver's
            # type-tagged value hash (CORRECTNESS_r01 json_extract).
            F.sum("k").cast("long").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_JSON_EXTRACT = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def q_streaming_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming end-to-end: readStream over the events parquet,
    watermark + tumbling window count, update-mode memory sink driven to
    completion (streaming/core.py). Single-batch input ⇒ output equals the
    batch aggregation, so the DuckDB oracle applies."""
    from scio_spark.streaming.core import (
        ensure_event_time, run_to_memory, windowed_stream_agg,
    )

    sc = _ctx(spark)
    batch = _t(sc, sf_dir, "events").df
    # file-stream source needs a directory: scope sf_dir to the events file
    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("TIMESTAMP_MICROS(ts DIV 1000)"))
    stream = ensure_event_time(stream, "ts")
    res = windowed_stream_agg(
        stream, "ts", "1 hour", "1 hour", ["event_type"],
        [F.count(F.lit(1)).alias("n")],
    ).select(
        # the watermark path runs on LTZ (ensure_event_time); surface the
        # window bound as TIMESTAMP_NTZ to match the NTZ source + oracle
        # (value-preserving under the pinned UTC session tz)
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n",
    )
    # 8 state stores: sized to fixture state volume (capacity knob, see
    # streaming.core.state_partitions; scales UP with stream volume)
    return run_to_memory(res, output_mode="update", num_state_partitions=8)


ORACLE_STREAMING_WINDOW = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_element_count_panes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-count trigger — ``Repeatedly.forever(
    AfterPane.elementCountAtLeast(25))`` with ACCUMULATING panes
    (reference: scio WindowedSCollection.scala:31-38 trigger surface;
    previously a fully-documented gap, §4.4.1): a custom stateful
    operator (streaming/core.py element_count_panes over
    applyInPandasWithState) fires a pane at every 25th event per user
    carrying the running spend total. Values pre-scaled to integer cents
    so sums are engine-exact; single-batch input with in-batch (ts,
    event_id) ordering makes each pane's (seen, total) deterministic and
    SQL-replayable as a cumulative window at rn % 25 = 0."""
    from scio_spark.streaming.core import element_count_panes, run_to_memory

    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("TIMESTAMP_MICROS(ts DIV 1000)"))
    stream = stream.withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    panes = element_count_panes(
        stream, ["user_id"], "cents", 25, ["ts", "event_id"]
    )
    return run_to_memory(panes, output_mode="update", num_state_partitions=8)


ORACLE_ELEMENT_COUNT_PANES = """
WITH e AS (
  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS v, ts, event_id
  FROM events
),
r AS (
  SELECT user_id, v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM e
)
SELECT user_id, CAST(rn // 25 - 1 AS BIGINT) AS pane_index,
       rn AS seen, CAST(cum AS BIGINT) AS total
FROM r WHERE rn % 25 = 0
"""


def q_quantiles_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approxQuantilesByKey (PairSCollectionFunctions.scala:620) — exact
    percentile per key for oracle parity."""
    sc = _ctx(spark)
    return (
        _t(sc, sf_dir, "orders")
        .key_by("o_orderpriority")
        .agg_by_key(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .df
    )


ORACLE_QUANTILES_BY_KEY = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90
FROM orders GROUP BY o_orderpriority
"""


def q_sorted_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort within key groups (sortValues): first-3 order dates per
    customer in date order, emitted flat for hashing."""
    sc = _ctx(spark)
    g = (
        _t(sc, sf_dir, "orders")
        .map("o_custkey", "o_orderdate", "o_orderkey")
        .key_by("o_custkey")
        .grouped_sorted_values("o_orderdate", "o_orderkey")
    )
    first3 = g.df.select(
        "o_custkey", F.posexplode(F.slice("values", 1, 3)).alias("pos", "v")
    )
    return first3.select(
        "o_custkey",
        (F.col("pos") + 1).alias("rnk"),
        F.col("v.o_orderdate").alias("o_orderdate"),
        F.col("v.o_orderkey").alias("o_orderkey"),
    )


ORACLE_SORTED_GROUPS = """
SELECT o_custkey, rnk, o_orderdate, o_orderkey FROM (
  SELECT o_custkey, o_orderdate, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withHotKeyFanout analog (salted_agg_by_key): two-level salted
    aggregation must equal the plain aggregation (oracle)."""
    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem")
    return (
        li.key_by("l_returnflag")
        .salted_agg_by_key(
            16,
            partial={"s": "SUM(l_quantity)", "c": "COUNT(*)"},
            final={"total_qty": "SUM(s)", "n": "SUM(c)"},
        )
        .df
    )


ORACLE_SALTED_AGG = """
SELECT l_returnflag, SUM(l_quantity) AS total_qty, COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ 0.4 (similarity.embedding_dedup_pairs)
    — the 5th dedup family."""
    from scio_spark.functions.similarity import embedding_dedup_pairs

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df
    return embedding_dedup_pairs(emb, threshold=0.4)


ORACLE_DEDUP_EMBEDDING = """
WITH pairs AS (
  SELECT a.vec_id AS id_1, b.vec_id AS id_2,
         ROUND(list_reduce(
             list_transform(generate_series(1, len(a.embedding)),
                            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
             (acc, x) -> acc + x), 5) AS score
  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
)
SELECT id_1, id_2, score FROM pairs WHERE score >= 0.4
"""


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via banded hyperplane LSH + exact rescore
    (similarity.embedding_dedup_pairs_lsh) — the sub-quadratic 100 TB path
    for the 5th dedup family (the exact O(n²) anchor is its own contract
    row, dedup_embedding). 16 bands × 8 bits: candidate rate ≈7% of all
    pairs on this corpus vs 100% for the exact operator, and precision is
    exact because candidates are rescored with the deterministic
    sequential-fold dot. The md5-derived ±1 hyperplanes are replayed
    bit-for-bit by the oracle (same family as ann_lsh), so the banded
    candidate construction itself is value-checked, not just the rescore.
    8-bit bands are sized for the contract corpus (10³–10⁴ rows); at
    larger n, band_bits grows ≈log2(n/bucket) to hold the random-collision
    candidate volume — see the scale rule on embedding_dedup_pairs_lsh.
    Reference analog: Voyager-style candidate probing,
    scio-extra/src/main/scala/com/spotify/scio/extra/voyager/syntax/SCollectionSyntax.scala:47-215."""
    from scio_spark.functions.similarity import embedding_dedup_pairs_lsh

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df
    return embedding_dedup_pairs_lsh(emb, threshold=0.4, bands=16, band_bits=8)


def _embedding_lsh_oracle(
    bands: int = 16, band_bits: int = 8, thr: float = 0.4, extra_pred: str = ""
) -> str:
    """DuckDB replay of the md5 hyperplane family of
    embedding_dedup_pairs_lsh / band_signatures: plane i (= band·band_bits
    + k), dim j → sign = +1 iff hex char 4 of md5(f"{i}:{j}") is odd; band
    sig = Σ bit_k·2^k; candidates = pairs sharing ≥1 (band, sig) (plus
    ``extra_pred`` — e.g. the ≥1-new-side restriction of the incremental
    path); score = ordered-fold dot, rounded then filtered. A composable
    renderer so the one-shot and incremental oracles share one template
    instead of string-slicing rendered SQL."""
    return f"""
WITH sig AS (
  SELECT e.vec_id, b.band,
    list_reduce(list_transform(generate_series(0, {band_bits - 1}), k ->
      CASE WHEN list_reduce(list_transform(generate_series(1, 64), j ->
             CAST(e.embedding[j] AS DOUBLE) *
             (CASE WHEN (instr('0123456789abcdef',
                 substr(md5(CAST(b.band * {band_bits} + k AS VARCHAR) || ':' || CAST(j - 1 AS VARCHAR)), 4, 1)) - 1) % 2 = 1
              THEN 1.0 ELSE -1.0 END)),
           (acc, x) -> acc + x) >= 0
      THEN CAST(POW(2, k) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
      (acc, x) -> acc + x) AS sig
  FROM embeddings e CROSS JOIN (SELECT UNNEST(generate_series(0, {bands - 1})) AS band) b
),
cands AS (
  SELECT DISTINCT a.vec_id AS id_1, b.vec_id AS id_2
  FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
  WHERE a.vec_id < b.vec_id{extra_pred}
),
scored AS (
  SELECT c.id_1, c.id_2,
         ROUND(list_reduce(
             list_transform(generate_series(1, len(ea.embedding)),
                            i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)),
             (acc, x) -> acc + x), 5) AS score
  FROM cands c
  JOIN embeddings ea ON ea.vec_id = c.id_1
  JOIN embeddings eb ON eb.vec_id = c.id_2
)
SELECT id_1, id_2, score FROM scored WHERE score >= {thr}
"""


ORACLE_DEDUP_EMBEDDING_LSH = _embedding_lsh_oracle()


def q_incremental_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding dedup (similarity.stage_embedding_lsh_index +
    incremental_embedding_dedup): the corpus (vec_id % 5 != 0) is staged
    ONCE as a (band, sig)-bucketed signature index; the daily batch
    (vec_id % 5 = 0) signs itself and joins the index co-located — O(batch)
    per ingestion, the corpus is never re-signed. Verified pairs (exact
    fold-rescore ≥ 0.4) with ≥1 new side; the oracle recomputes them from
    the whole corpus, which equals the staged path because banding is
    per-row (pinned by the full-rebuild equivalence test). The vector
    analog of the incremental_dedup contract row."""
    from scio_spark.functions.similarity import (
        incremental_embedding_dedup,
        stage_embedding_lsh_index,
    )

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df
    new = emb.filter("vec_id % 5 = 0")
    corpus = emb.filter("vec_id % 5 != 0")
    # 16 buckets: the contract-scale index is ~10⁴-10⁵ signature rows, so
    # 64 bucket files would be write-overhead, not parallelism (the
    # operator default stays 64 for real corpora)
    idx = stage_embedding_lsh_index(corpus, "emb_lsh_index_contract", buckets=16)
    return incremental_embedding_dedup(new, idx, emb, threshold=0.4)


ORACLE_INCREMENTAL_EMBEDDING = _embedding_lsh_oracle(
    extra_pred=" AND (a.vec_id % 5 = 0 OR b.vec_id % 5 = 0)"
)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via hyperplane LSH buckets (similarity.cosine_topk_lsh).
    Oracle-checked: the hyperplanes are deterministic md5-derived ±1
    literals, so DuckDB recomputes the SAME 4-bit signatures and the
    same-bucket top-3 is exactly reproducible (scores exact-fold, rounded
    before ranking). Recall vs brute force pinned in tests/test_llm_ops.py."""
    from scio_spark.functions.similarity import cosine_topk_lsh

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df
    # Bounded query WORKLOAD against a growing corpus (the production
    # shape): with both sides growing, fixed-bit LSH candidates are
    # Θ(n_q·n_c/2^bits) — measured e≈1.5 at sf0.1→sf1 before the bound.
    qs = emb.filter("vec_id % 10 = 0 AND vec_id < 2000")
    return cosine_topk_lsh(emb, qs, k=3, bits=4, score_decimals=5)


# DuckDB replays the md5 hyperplane family of similarity.hyperplane_signature:
# sign_ij = +1 iff int(md5(f"{i}:{j}")[:4], 16) is odd — the parity of hex
# char 4 — and the projection is the same sequential left-fold dot product.
ORACLE_ANN_LSH = """
WITH sig AS (
  SELECT vec_id, embedding,
    list_reduce(list_transform(generate_series(0, 3), i ->
      CASE WHEN list_reduce(list_transform(generate_series(1, 64), j ->
             CAST(embedding[j] AS DOUBLE) *
             (CASE WHEN (instr('0123456789abcdef',
                 substr(md5(CAST(i AS VARCHAR) || ':' || CAST(j - 1 AS VARCHAR)), 4, 1)) - 1) % 2 = 1
              THEN 1.0 ELSE -1.0 END)),
           (acc, x) -> acc + x) >= 0
      THEN CAST(POW(2, i) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
      (acc, x) -> acc + x) AS bucket
  FROM embeddings
),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_reduce(
             list_transform(generate_series(1, len(c.embedding)),
                            i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
             (acc, x) -> acc + x), 5) AS score
  FROM sig q JOIN sig c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
  WHERE q.vec_id % 10 = 0 AND q.vec_id < 2000
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s
) WHERE rank <= 3
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF k-means ANN (functions/ivf.py), run with n_probe = n_clusters so
    every inverted list is searched: exercises the full pipeline (KMeans
    train → broadcast-GEMM assignment → probe routing → list semi-join →
    exact-fold re-rank) while the output equals exact top-3 — oracle-checked.
    The approximate regime (n_probe < n_clusters) is recall-pinned in
    tests/test_ann_simhash64.py."""
    from scio_spark.functions.ivf import cosine_topk_ivf

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df
    qs = emb.filter("vec_id % 10 = 0")
    return cosine_topk_ivf(
        emb, qs, k=3, n_clusters=8, n_probe=8, sample_fraction=0.5,
        score_decimals=5,
        # probing every list makes the result exact regardless of centroid
        # quality — train cheap (2 local Lloyd iterations on the bounded
        # collected sample, the faiss-style default)
        max_iter=2,
    )


def q_ann_ivf_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance (ivf.append_ivf_index — the ANN
    sibling of incremental_dedup / incremental_embedding_dedup): vectors
    with vec_id < 300 are the staged historical index (built once,
    centroid-partitioned parquet, frozen quantizer), the rest arrive as
    today's batch and are APPENDED with one O(batch) assignment pass —
    existing index files are never rewritten (pinned in
    tests/test_ann_streamed.py). Search runs in the exact regime
    (n_probe = n_clusters probes every list), so the result over the
    appended index equals brute-force top-3 over the full table and the
    oracle is plain SQL."""
    import tempfile

    from scio_spark.functions.ivf import (
        append_ivf_index,
        build_ivf_index,
        search_ivf_index,
    )

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df.select("vec_id", "embedding")
    path = tempfile.mkdtemp(prefix="scio_spark_ivfidx_") + "/idx"
    build_ivf_index(
        emb.filter("vec_id < 300"), path, n_clusters=8, max_iter=2
    )
    append_ivf_index(spark, path, emb.filter("vec_id >= 300"))
    qs = emb.filter("vec_id % 10 = 1")
    return search_ivf_index(
        spark, path, qs, k=3, n_probe=8, score_decimals=5
    )


ORACLE_ANN_IVF_APPENDED = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % 10 = 1),
s AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_reduce(
             list_transform(generate_series(1, len(c.embedding)),
                            i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)),
             (acc, x) -> acc + x), 5) AS score
  FROM embeddings c, q WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s
) WHERE rank <= 3
"""


def q_ann_ivf_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed-queries IVF ANN (ivf.cosine_topk_ivf_streamed): the same
    training/probing parameters as q_ann_ivf, but the query workload stays
    a DataFrame end to end — probe routing is a distributed mapInPandas
    against broadcast centroids and candidates come from a
    centroid-cogrouped GEMM, so nothing query-sized touches the driver
    (the corpus-scale deployment shape; parity with the collected path is
    pinned in tests/test_ann_streamed.py). n_probe = n_clusters makes the
    output exact top-3, so it shares the exact oracle."""
    from scio_spark.functions.ivf import cosine_topk_ivf_streamed

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df
    qs = emb.filter("vec_id % 10 = 0")
    return cosine_topk_ivf_streamed(
        emb, qs, k=3, n_clusters=8, n_probe=8, sample_fraction=0.5,
        score_decimals=5, max_iter=2,
    )


def q_ann_hnsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW graph ANN (functions/hnsw.py, pure numpy — Voyager parity,
    scio-extra voyager SCollectionSyntax.scala:47-215), run in the
    exhaustive regime: ef = corpus size makes the beam visit every node
    (layer-0 connectivity is repaired at build), and exact_rescore moves
    scoring/ranking JVM-side (sequential-fold dot, round-before-rank) —
    so the output equals exact top-3 and is value-oracled while the real
    graph build + beam walk is exercised end to end (the same
    exact-regime pattern as q_ann_ivf's n_probe = n_clusters). The
    approximate regime (ef=64) is recall-pinned in tests/test_hnsw.py.

    The corpus is pinned to a BOUNDED reference set (vec_id < 2000 —
    the whole table at the driver-gate SFs): an HNSW index is a
    side input by contract, and the exhaustive-exact regime walks
    O(corpus) nodes per query, so the query's cost must not grow with
    the table (corpus-scale ANN is the IVF/LSH paths, which do scale
    in the bench)."""
    from scio_spark.functions.similarity import cosine_topk_hnsw

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df.filter("vec_id < 2000")
    qs = emb.filter("vec_id % 10 = 3")
    # ef_construction=32: in the exhaustive regime the beam visits every
    # reachable node and connectivity is repaired at build, so the output
    # is exact top-3 INDEPENDENT of graph quality — build effort buys
    # nothing here (3x build-time cut, identical rows; the user-facing
    # ef=64 approximate regime keeps the 200 default and its recall pins)
    return cosine_topk_hnsw(
        emb, qs, k=3, ef_construction=32, ef_search=None,
        exact_rescore=True, score_decimals=5,
    )


ORACLE_ANN_HNSW = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % 10 = 3 AND vec_id < 2000),
s AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_reduce(
             list_transform(generate_series(1, len(c.embedding)),
                            i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)),
             (acc, x) -> acc + x), 5) AS score
  FROM embeddings c, q WHERE c.vec_id != q.query_id AND c.vec_id < 2000
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s
) WHERE rank <= 3
"""


def q_ann_hnsw_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded HNSW ANN (similarity.cosine_topk_hnsw_sharded — VERDICT r14
    ask #7): removes cosine_topk_hnsw's side-input bound by building one
    HNSW sub-graph per corpus shard INSIDE a cogrouped task (corpus sharded
    on pmod(xxhash64(id), n_shards), queries replicated to every shard) and
    merging per-shard top-k. Run in the exhaustive + exact_rescore regime
    (per-shard beam = shard size), where the per-shard-top-k union provably
    contains the global top-k — so the output equals exact top-3 and is
    value-oracled while the real shard-build + beam walk + merge is
    exercised end to end (same exact-regime pattern as q_ann_hnsw).
    Parity at several shard counts and the approximate-regime recall are
    pinned in tests/test_hnsw.py. The corpus cap here bounds QUERY-side
    work only (exhaustive beams are O(corpus) per query by design); the
    operator itself has no side-input bound."""
    from scio_spark.functions.similarity import cosine_topk_hnsw_sharded

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df.filter("vec_id < 2000")
    qs = emb.filter("vec_id % 10 = 7")
    return cosine_topk_hnsw_sharded(
        emb, qs, k=3, ef_construction=32, ef_search=None,
        exact_rescore=True, score_decimals=5, n_shards=3,
    )


ORACLE_ANN_HNSW_SHARDED = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % 10 = 7 AND vec_id < 2000),
s AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_reduce(
             list_transform(generate_series(1, len(c.embedding)),
                            i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)),
             (acc, x) -> acc + x), 5) AS score
  FROM embeddings c, q WHERE c.vec_id != q.query_id AND c.vec_id < 2000
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s
) WHERE rank <= 3
"""


def q_ann_pq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted PQ index lifecycle (pq.build_pq_index / append_pq_index /
    search_pq_index — the compressed sibling of q_ann_ivf_appended,
    completing the index-maintenance family): vectors with vec_id < 300
    are the staged index (codebooks trained once, frozen quantizer,
    (id, pq_code, vector) parquet in the FAISS IndexRefineFlat layout),
    the rest append as today's batch with one O(batch) encode pass.
    Search scans only the column-pruned m-byte codes for ADC candidates
    (16 B/row vs 264 B of raw float32 at dim 64 — pinned in
    tests/test_pq.py) and exact-rescores against the index's vector
    column. Run exhaustive (k·oversample ≥ index rows), so the result
    equals brute-force top-3 and the oracle is plain SQL; production
    oversample recall is pinned in tests/test_pq.py. The vec_id < 2000
    cap bounds the exhaustive fixture, not the operator."""
    import tempfile

    from scio_spark.functions.pq import (
        append_pq_index,
        build_pq_index,
        search_pq_index,
    )

    sc = _ctx(spark)
    emb = (
        _t(sc, sf_dir, "embeddings").df
        .select("vec_id", "embedding").filter("vec_id < 2000")
    )
    path = tempfile.mkdtemp(prefix="scio_spark_pqidx_") + "/idx"
    build_pq_index(
        emb.filter("vec_id < 300"), path, m=8, n_codes=16, iters=4
    )
    append_pq_index(spark, path, emb.filter("vec_id >= 300"))
    qs = emb.filter("vec_id % 40 = 2")
    return search_pq_index(
        spark, path, qs, k=3, oversample=700, score_decimals=5
    )


ORACLE_ANN_PQ_INDEX = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % 40 = 2 AND vec_id < 2000),
s AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_reduce(
             list_transform(generate_series(1, len(c.embedding)),
                            i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)),
             (acc, x) -> acc + x), 5) AS score
  FROM embeddings c, q WHERE c.vec_id != q.query_id AND c.vec_id < 2000
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s
) WHERE rank <= 3
"""


def q_ann_ivfpq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVF-PQ index lifecycle (pq.build_ivfpq_index /
    append_ivfpq_index / search_ivfpq_index — the full FAISS composition
    persisted: coarse centroids + PQ codebooks as frozen training
    artifacts, (id, pq_code, vector) parquet PARTITIONED BY centroid):
    vec_id < 300 is the staged index, the rest appends with one O(batch)
    assign+encode pass. Search multiplies both prunings — probing touches
    only n_probe partition directories AND the ADC scan reads only the
    m-byte code column (both pinned by plan tests in tests/test_pq.py).
    Run exhaustive (n_probe = n_clusters, k·oversample ≥ largest list) so
    the result equals brute-force top-3 and the oracle is plain SQL;
    the index is built in RESIDUAL mode (codes quantize x − centroid —
    exhaustive exactness is mode-independent, so the driver row covers
    the deeper path). Production-parameter recall and the streamed
    (salted cogroup) parity are pinned in tests/test_pq.py."""
    import tempfile

    from scio_spark.functions.pq import (
        append_ivfpq_index,
        build_ivfpq_index,
        search_ivfpq_index,
    )

    sc = _ctx(spark)
    emb = (
        _t(sc, sf_dir, "embeddings").df
        .select("vec_id", "embedding").filter("vec_id < 2000")
    )
    path = tempfile.mkdtemp(prefix="scio_spark_ivfpqidx_") + "/idx"
    build_ivfpq_index(
        emb.filter("vec_id < 300"), path, n_clusters=8, m=8, n_codes=16,
        iters=4, max_iter=2, residual=True,
    )
    append_ivfpq_index(spark, path, emb.filter("vec_id >= 300"))
    qs = emb.filter("vec_id % 40 = 3")
    return search_ivfpq_index(
        spark, path, qs, k=3, n_probe=8, oversample=700, score_decimals=5
    )


ORACLE_ANN_IVFPQ_INDEX = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % 40 = 3 AND vec_id < 2000),
s AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_reduce(
             list_transform(generate_series(1, len(c.embedding)),
                            i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)),
             (acc, x) -> acc + x), 5) AS score
  FROM embeddings c, q WHERE c.vec_id != q.query_id AND c.vec_id < 2000
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s
) WHERE rank <= 3
"""


MULTIMODAL_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "examples", "fixtures", "multimodal_assets.parquet",
)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end on the deterministic binary fixture,
    now read from a committed single-file parquet so DuckDB can read the SAME
    bytes: content stats (JVM sha2/length) + stubbed image decode
    (mapInPandas fake decoder = sha256-derived features, reproduced in the
    oracle SQL from the identical hex preimage)."""
    from scio_spark.functions import multimodal as M

    M.write_asset_fixture(MULTIMODAL_FIXTURE, n=64)
    assets = spark.read.parquet(MULTIMODAL_FIXTURE)
    stats = M.content_stats(assets)
    feats = M.decode_image_features(assets.filter("modality = 'image'"))
    return (
        stats.select(
            "asset_id", "modality", F.col("n_bytes").cast("long").alias("n_bytes"),
            "digest",
        )
        .join(feats.select("asset_id", "width", "height", "decoder"), "asset_id", "left")
        .orderBy("asset_id")
    )


ORACLE_MULTIMODAL_FEATURES = f"""
WITH assets AS (
  SELECT * FROM read_parquet('{MULTIMODAL_FIXTURE}')
), feats AS (
  SELECT asset_id,
         64 + ('0x' || substr(sha256(CAST(content AS VARCHAR)), 1, 2))::INT AS width,
         64 + ('0x' || substr(sha256(CAST(content AS VARCHAR)), 3, 2))::INT AS height,
         'fake' AS decoder
  FROM assets WHERE modality = 'image'
)
SELECT a.asset_id, a.modality,
       octet_length(a.content)::BIGINT AS n_bytes,
       sha256(CAST(a.content AS VARCHAR)) AS digest,
       f.width, f.height, f.decoder
FROM assets a LEFT JOIN feats f USING (asset_id)
"""


def q_window_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowByWeeks (SCollection.scala:1275-1300) — ISO-week order counts
    (both engines truncate weeks to Monday)."""
    from scio_spark.operators import windows as W

    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders").df
    return (
        W.with_calendar_window(o, "o_orderdate", "week")
        .groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_WINDOW_WEEKLY = """
SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS window_start,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


def q_global_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top(n) (SCollection.scala:985) — TakeOrderedAndProject plan (per-
    partition heap + driver merge, Beam Top.of analog); total order via
    orderkey tiebreak."""
    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders")
    return o.top(
        10, F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    ).df.select("o_orderkey", "o_custkey", "o_totalprice")


ORACLE_GLOBAL_TOP = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10
"""


def q_distinct_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-key distinct count (countDistinct — the exact sibling of
    countApproxDistinctByKey, which is HLL and deliberately NOT oracled)."""
    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_DISTINCT_BY_KEY = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 family: HAVING-filtered aggregation (orders whose total
    quantity exceeds a threshold) semi-joined back to customers — exercises
    filter-on-aggregate + a two-level join pipeline."""
    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem")
    big_orders = (
        li.key_by(orderkey="l_orderkey")
        .agg_by_key(F.sum("l_quantity").alias("total_qty"))
        .filter_values("total_qty > 250")
    )
    orders = _t(sc, sf_dir, "orders").key_by(orderkey="o_orderkey")
    cust = _t(sc, sf_dir, "customer").key_by(custkey="c_custkey")
    oj = orders.join(big_orders, "inner")
    out = oj.to_scollection().key_by(custkey="o_custkey").join(cust, "inner")
    return out.df.select(
        "custkey",
        F.col("c_name").alias("c_name"),
        "orderkey",
        F.col("o_totalprice").alias("o_totalprice"),
        "total_qty",
    )


ORACLE_LARGE_ORDERS = """
SELECT c_custkey AS custkey, c_name, o_orderkey AS orderkey, o_totalprice,
       big.total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_stateful_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming (applyInPandasWithState running counter,
    streaming/state.py) driven to completion; single-batch input ⇒ the
    running total equals the exact per-key count (oracle-checkable)."""
    from scio_spark.streaming.core import run_to_memory
    from scio_spark.streaming.state import running_counter

    _ctx(spark)
    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    counted = running_counter(
        stream.groupBy("event_type"),
        output_schema="key string, total bigint",
    )
    # 8 stores re-A/B'd cold r16 (VERDICT item 7): 8 -> cold {1.26, 1.46,
    # 1.70}, 4 -> {1.30, 1.35, 1.36}, 16 -> {1.42, 1.50, 1.71}; 8 and 4
    # tie inside noise, 16 loses — keep 8 (capacity headroom over 4).
    return run_to_memory(counted, output_mode="update", num_state_partitions=8)


ORACLE_STATEFUL_STREAM = """
SELECT event_type AS key, COUNT(*) AS total FROM events GROUP BY event_type
"""


def q_allowed_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """allowedLateness / guaranteed late-data DROP (WindowOptions,
    WindowedSCollection.scala:31-38 → streaming/core.py): a scripted
    three-batch stream — hour-0 events with even event_id arrive on time,
    hour-3 events advance the watermark past hour-0's window end, then the
    ODD-id hour-0 events replay guaranteed-late (two watermark advances
    after their window closed, state already evicted). Append mode emits
    the finalized hour-0 window WITHOUT the late rows; the oracle counts
    only the even-id stratum, so any failure to drop hash-mismatches."""
    from scio_spark.streaming.core import (
        StreamFixture,
        run_to_memory,
        windowed_stream_agg,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    def hour(h):
        return ev.filter(
            f"ts >= TIMESTAMP '2024-01-01 0{h}:00:00'"
            f" AND ts < TIMESTAMP '2024-01-01 0{h + 1}:00:00'"
        )

    def recs(df):  # scripted fixtures are hour-slices — driver-sized
        return [(r["event_id"], r["ts"], r["event_type"]) for r in df.collect()]

    f = StreamFixture(spark, "event_id long, ts timestamp, event_type string")
    try:
        f.add_batch(recs(hour(0).filter("event_id % 2 = 0")))
        f.add_batch(recs(hour(3)))  # watermark past hour-0's end
        f.add_batch(recs(hour(5)))  # hour-0 window emitted + state evicted
        # two watermark advances after its window — the drop is GUARANTEED
        # (while state is alive it is best-effort; see test_streaming)
        f.add_batch(recs(hour(0).filter("event_id % 2 = 1")))
        res = windowed_stream_agg(
            f.stream(), "ts", "1 hour", "30 minutes", ["event_type"],
            [F.count(F.lit(1)).alias("n")],
        ).select(
            F.col("window_start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
        )
        # 4 state stores: fixture-sized state (A/B: 4.2 s vs 4.8 s at 16,
        # maintenance-bound) — a capacity knob, raise with real cardinality
        return run_to_memory(res, output_mode="append", num_state_partitions=4)
    finally:
        f.close()


ORACLE_ALLOWED_LATENESS = """
SELECT TIMESTAMP '2024-01-01 00:00:00' AS window_start, event_type,
       COUNT(*) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
  AND ts <  TIMESTAMP '2024-01-01 01:00:00'
  AND event_id % 2 = 0
GROUP BY event_type
UNION ALL
SELECT TIMESTAMP '2024-01-01 03:00:00', event_type, COUNT(*)
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 03:00:00'
  AND ts <  TIMESTAMP '2024-01-01 04:00:00'
GROUP BY event_type
"""


def q_refreshing_side_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refreshing side input (scio RefreshingSideInputExample.scala — a
    Guava Supplier re-polled per bundle; streaming/core.py
    refreshing_side_input re-reads the side path per micro-batch inside
    foreachBatch — a naive stream-static join snapshots the side's file
    index at plan time and never refreshes). Scripted two-batch stream of
    customer slices: batch 1 enriches against side v1 (nations of regions
    0-2), the side table is atomically republished as v2 (regions 2-4)
    between batches, batch 2 must see v2. Each batch's sink keeps only a
    per-batch group count (driver sees group counts, never rows); any
    staleness — batch 2 served v1, or a plan-time snapshot error — shifts
    counts between phases and hash-mismatches the oracle."""
    from scio_spark.streaming.core import StreamFixture, refreshing_side_input

    side_path = _rt_path(sf_dir, "refresh_side")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )

    def publish(regions: str, phase: str) -> None:
        nation.filter(f"n_regionkey IN {regions}").select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.lit(phase).alias("phase"),
        ).repartition(1).write.mode("overwrite").parquet(side_path)

    def recs(pred: str):  # ~1% customer slice — scripted fixture size
        return [
            (r["c_custkey"], r["c_nationkey"])
            for r in cust.filter(pred).collect()
        ]

    agg_rows: list[tuple[str, int]] = []

    def sink(df: DataFrame, _bid: int) -> None:
        agg_rows.extend(
            (r["phase"], r["n"])
            for r in df.groupBy(
                F.coalesce(F.col("phase"), F.lit("none")).alias("phase")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    publish("(0, 1, 2)", "v1")
    f = StreamFixture(spark, "c_custkey long, c_nationkey int")
    f.add_batch(recs("c_custkey % 100 = 0"))
    q = refreshing_side_input(f.stream(), side_path, "c_nationkey", sink)
    try:
        q.processAllAvailable()  # batch 1 joined v1
        publish("(2, 3, 4)", "v2")  # atomic republish between batches
        f.add_batch(recs("c_custkey % 100 = 1"))
        q.processAllAvailable()  # batch 2 must join v2
    finally:
        q.stop()
        f.close()
    return (
        spark.createDataFrame(agg_rows, "phase string, n long")
        .groupBy("phase")
        .agg(F.sum("n").cast("long").alias("n_customers"))
    )


ORACLE_REFRESHING_SIDE_INPUT = """
WITH e1 AS (
  SELECT COALESCE(s.phase, 'none') AS phase
  FROM (SELECT c_nationkey FROM customer WHERE c_custkey % 100 = 0) b
  LEFT JOIN (SELECT n_nationkey, 'v1' AS phase FROM nation
             WHERE n_regionkey IN (0, 1, 2)) s
    ON b.c_nationkey = s.n_nationkey),
e2 AS (
  SELECT COALESCE(s.phase, 'none') AS phase
  FROM (SELECT c_nationkey FROM customer WHERE c_custkey % 100 = 1) b
  LEFT JOIN (SELECT n_nationkey, 'v2' AS phase FROM nation
             WHERE n_regionkey IN (2, 3, 4)) s
    ON b.c_nationkey = s.n_nationkey)
SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (SELECT phase FROM e1 UNION ALL SELECT phase FROM e2)
GROUP BY phase
"""


def q_processing_time_panes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated AfterProcessingTime.pastFirstElementInPane().plusDelayOf(d)
    trigger (scio LeaderBoard.scala:110-121 user-score exemplar;
    streaming/core.py processing_time_panes) — panes fire at WALL-CLOCK
    cadence via processing-time state timeouts, delivered in DATA-LESS
    micro-batches; previously the documented §4.4.1 residual. Scripted for
    determinism: ONE staged micro-batch (a 2% customer slice keyed by
    mktsegment, integer nationkey values), pane delay 1 s — every key
    fires exactly its pane 0 with the full per-key sum, in a batch that
    carries no data (the stream is drained well before the deadline). Any
    per-micro-batch firing, double firing, or missed data-less-batch
    delivery changes pane_index/row-count and hash-mismatches the oracle.
    Multi-batch pane collapse, DISCARDING mode, and wall-clock eviction
    are wall-clock-racy under load and stay pytest-pinned
    (tests/test_streaming.py)."""
    import time

    from scio_spark.streaming.core import (
        StreamFixture,
        processing_time_panes,
        state_partitions,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        "c_custkey % 50 = 0"
    )
    batch = [(r["c_mktsegment"], r["c_nationkey"]) for r in cust.collect()]
    n_keys = len({seg for seg, _ in batch})  # 5 at sf>=0.01, fewer at 0.001
    f = StreamFixture(spark, "segment string, v int")
    f.add_batch(batch)
    # pane delay is pure latency here (ONE staged batch: the deadline
    # arms at its processing time; no second batch can split the pane) —
    # r15-opt: 1000 → 400 ms, > one 300 ms trigger (soaked 3x stable)
    panes = processing_time_panes(
        f.stream(), ["segment"], "v", delay_ms=400
    )
    rows: list = []

    def cap(df: DataFrame, _bid: int) -> None:
        rows.extend(
            (r["segment"], r["pane_index"], r["pane_value"], r["total_so_far"])
            for r in df.collect()
        )

    # 4 state stores: fixture-sized state (see allowed_lateness A/B)
    with state_partitions(spark, 4):
        q = (
            panes.writeStream.outputMode("update")
            .foreachBatch(cap)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len({r[0] for r in rows}) < n_keys:
            time.sleep(0.05)
    finally:
        q.stop()
        f.close()
    return spark.createDataFrame(
        rows,
        "segment string, pane_index long, pane_value long, total_so_far long",
    )


ORACLE_PROCESSING_TIME_PANES = """
SELECT c_mktsegment AS segment, CAST(0 AS BIGINT) AS pane_index,
       CAST(SUM(c_nationkey) AS BIGINT) AS pane_value,
       CAST(SUM(c_nationkey) AS BIGINT) AS total_so_far
FROM customer WHERE c_custkey % 50 = 0
GROUP BY c_mktsegment
"""


def q_watermark_panes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AfterWatermark.pastEndOfWindow().withLateFirings(
    AfterProcessingTime.pastFirstElementInPane().plusDelayOf(d)) — the
    full LeaderBoard team-score trigger (LeaderBoard.scala:111-170;
    streaming/core.py watermark_panes), with every §4.4.1 bound removed:
    the ON_TIME pane is delivered in a DATA-LESS micro-batch (no
    data-carrying batch needed at the crossing) and the LATE pane fires
    on a WALL-CLOCK delay, not the batch cadence. Scripted: hour-0
    even-id events arrive on time keyed by event_type (1-hour windows,
    6-hour lateness); an hour-3 batch advances the on-time watermark past
    hour-0's end — each even-stratum type's ON_TIME pane then fires with
    no new data; the odd-id hour-0 rows replay late-but-admissible
    (delayed watermark ≈ 21:59 prior day) and their LATE panes fire 1 s
    later with the ACCUMULATED total. Types seen only in the odd stratum
    first fire after the crossing, so their first pane is the (late-
    armed) ON_TIME value — the oracle derives both pane sets exactly from
    the two strata; any missed data-less delivery, double firing, stale
    accumulation, or dropped admissible row changes rows/values and
    hash-mismatches."""
    import time

    from scio_spark.streaming.core import (
        StreamFixture,
        state_partitions,
        watermark_panes,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )

    def hour(h, par=None):
        df = ev.filter(
            f"ts >= TIMESTAMP '2024-01-01 0{h}:00:00'"
            f" AND ts < TIMESTAMP '2024-01-01 0{h + 1}:00:00'"
        )
        return df if par is None else df.filter(f"event_id % 2 = {par}")

    def recs(df):  # hour-slice fixtures — driver-sized
        return [(r["event_type"], r["ts"], 1) for r in df.collect()]

    even, odd = recs(hour(0, 0)), recs(hour(0, 1))
    even_types, odd_types = {r[0] for r in even}, {r[0] for r in odd}
    # every type fires ON_TIME once (even-stratum at the crossing,
    # odd-only via its late-armed first pane); types in BOTH strata add
    # a LATE pane
    expected = {(t, "ON_TIME") for t in even_types | odd_types} | {
        (t, "LATE") for t in even_types & odd_types
    }
    f = StreamFixture(spark, "event_type string, ts timestamp, one int")
    f.add_batch(even)
    # late delay is latency, not a race margin: the deadline arms at the
    # processing time of the (single) late batch, so the pane can never
    # fire early or split — shrinking it only trims wall time (r15-opt:
    # 1000 → 400 ms, > one 300 ms trigger so the firing lands on the
    # next sweep; soaked 3x stable)
    panes = watermark_panes(
        f.stream(), "ts", "1 hour", "6 hours", ["event_type"], "one",
        late_delay_ms=400,
    )
    rows: list = []

    def cap(df: DataFrame, _bid: int) -> None:
        rows.extend(
            (r["event_type"], r["timing"], r["pane_index"], r["pane_value"],
             r["total_so_far"])
            for r in df.collect()
        )

    def wait(pred, deadline_s=90.0) -> None:
        end = time.time() + deadline_s
        while time.time() < end and not pred():
            time.sleep(0.05)

    # 2 state stores: fixture-sized state; the sweeps re-invoke every
    # armed key each trigger, so per-batch store overhead dominates wall
    # time here (A/B: 7.8 s at 4, 6.3 s at 2, 6.0 s at 1 on sf0.1)
    with state_partitions(spark, 2):
        q = (
            panes.writeStream.outputMode("update")
            .foreachBatch(cap)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
    try:
        f.add_batch(recs(hour(3)))  # on-time watermark → ~03:59 > 01:00
        wait(lambda: even_types <= {t for t, tm, *_ in rows if tm == "ON_TIME"})
        f.add_batch(odd)  # late-but-admissible replay
        wait(lambda: {(t, tm) for t, tm, *_ in rows} >= expected)
    finally:
        q.stop()
        f.close()
    return spark.createDataFrame(
        rows,
        "event_type string, timing string, pane_index long, "
        "pane_value long, total_so_far long",
    )


ORACLE_WATERMARK_PANES = """
WITH h0 AS (
  SELECT event_type, event_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-01 01:00:00'),
e AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM h0 WHERE event_id % 2 = 0 GROUP BY event_type),
o AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM h0 WHERE event_id % 2 = 1 GROUP BY event_type)
SELECT COALESCE(e.event_type, o.event_type) AS event_type,
       'ON_TIME' AS timing,
       CAST(0 AS BIGINT) AS pane_index,
       COALESCE(e.n, o.n) AS pane_value,
       COALESCE(e.n, o.n) AS total_so_far
FROM e FULL OUTER JOIN o ON e.event_type = o.event_type
UNION ALL
SELECT e.event_type, 'LATE', CAST(1 AS BIGINT), e.n + o.n, e.n + o.n
FROM e JOIN o ON e.event_type = o.event_type
"""


def q_pipe_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pipe (SCollectionPipeSyntax.scala:45): documents' text through an
    identity subprocess (`cat`) — per-partition process lifecycle, output
    lines re-collected; identity makes it oracle-checkable."""
    from scio_spark.operators.enrich import pipe

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").map(value="text")
    return pipe(d.df, "cat")


ORACLE_PIPE = "SELECT text AS value FROM documents"


def q_mean_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """meanByKey (PairSCollectionFunctions.scala:1062). l_quantity values are
    integral doubles (< 2^53), so the double sum inside avg is exact and the
    division deterministic in both engines."""
    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem").map("l_returnflag", "l_quantity").key_by("l_returnflag")
    return li.mean_by_key("l_quantity").df


ORACLE_MEAN_BY_KEY = """
SELECT l_returnflag, SUM(l_quantity) / COUNT(*) AS mean
FROM lineitem GROUP BY l_returnflag
"""


def q_reduce_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reduceByKey (PairSCollectionFunctions.scala:1073) with an associative
    max reduce."""
    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders").map("o_custkey", "o_totalprice").key_by("o_custkey")
    return o.reduce_by_key(max_price="MAX(o_totalprice)").df


ORACLE_REDUCE_BY_KEY = """
SELECT o_custkey, MAX(o_totalprice) AS max_price FROM orders GROUP BY o_custkey
"""


def q_fold_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fold(zero)(op) (SCollection.scala:674): global fold with an explicit
    non-identity zero over an associative+commutative merge (BIGINT sum, so
    collect_list order cannot matter)."""
    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders").map(value="o_orderkey")
    return o.fold(7, "acc + x").df


ORACLE_FOLD_GLOBAL = """
SELECT 7 + CAST(SUM(o_orderkey) AS BIGINT) AS folded FROM orders
"""


def q_group_map_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupMapReduce (SCollection.scala:738): per-nation max account
    balance via the reduce-expression path."""
    sc = _ctx(spark)
    c = _t(sc, sf_dir, "customer").map("c_nationkey", "c_acctbal").key_by("c_nationkey")
    return c.group_map_reduce("MAX(c_acctbal)").df


ORACLE_GROUP_MAP_REDUCE = """
SELECT c_nationkey, MAX(c_acctbal) AS reduced FROM customer GROUP BY c_nationkey
"""


def q_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersection (SCollection.scala:322, dedups like scio :318-320):
    brands that appear both on large parts and in SM BOX containers."""
    sc = _ctx(spark)
    a = _t(sc, sf_dir, "part").filter("p_size > 25").map(brand="p_brand")
    b = _t(sc, sf_dir, "part").filter("p_size < 5").map(brand="p_brand")
    return a.intersection(b).df


ORACLE_INTERSECTION = """
SELECT p_brand AS brand FROM part WHERE p_size > 25
INTERSECT
SELECT p_brand AS brand FROM part WHERE p_size < 5
"""


def q_subtract_els(spark: SparkSession, sf_dir: str) -> DataFrame:
    """subtract (SCollection.scala:967, anti-join semantics): high-balance
    customers who placed no big order."""
    sc = _ctx(spark)
    rich = (
        _t(sc, sf_dir, "customer")
        .filter("c_acctbal > 9000")
        .map(custkey="c_custkey")
        .distinct()
    )
    big = (
        _t(sc, sf_dir, "orders")
        .filter("o_totalprice > 300000")
        .map(custkey="o_custkey")
    )
    return rich.subtract(big).df


ORACLE_SUBTRACT_ELS = """
SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
"""


def q_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partition(pred) (SCollection.scala:366): one cached scan, two
    branches, materialized as per-branch counts."""
    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders").map("o_orderkey", "o_totalprice")
    hi, lo = o.partition_by_pred("o_totalprice > 200000")
    spark_df = hi.agg(F.count(F.lit(1)).alias("n")).df.withColumn(
        "side", F.lit("pass")
    ).unionByName(
        lo.agg(F.count(F.lit(1)).alias("n")).df.withColumn("side", F.lit("fail"))
    )
    return spark_df.select("side", "n")


ORACLE_PARTITION_COUNTS = """
SELECT 'pass' AS side, COUNT(*) AS n FROM orders WHERE o_totalprice > 200000
UNION ALL
SELECT 'fail' AS side, COUNT(*) AS n FROM orders WHERE NOT (o_totalprice > 200000)
"""


def q_hash_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashLookup (SCollection.scala:1014): matches arrayed per LHS row —
    materialized as match counts (array order is engine-dependent)."""
    sc = _ctx(spark)
    n = _t(sc, sf_dir, "nation").map("n_nationkey", "n_name").key_by(nationkey="n_nationkey")
    s = _t(sc, sf_dir, "supplier").map("s_nationkey", "s_suppkey").key_by(nationkey="s_nationkey")
    looked = n.hash_lookup(s)
    return looked.df.select(
        "nationkey", "n_name",
        F.size(F.coalesce(F.col("matches"), F.array())).alias("n_suppliers"),
    )


ORACLE_HASH_LOOKUP = """
SELECT n_nationkey AS nationkey, n_name,
       CAST((SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS INT)
         AS n_suppliers
FROM nation n
"""


def q_batch_by_key_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """batchByKey (PairSCollectionFunctions.scala:816) — batch membership is
    order-dependent, but the number of ≤100-element batches per key is not."""
    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders").map("o_custkey", "o_orderkey").key_by("o_custkey")
    batched = o.batch_by_key(100)
    return (
        batched.df.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_batches"))
    )


ORACLE_BATCH_BY_KEY = """
SELECT o_custkey, CAST(CEIL(COUNT(*) / 100.0) AS BIGINT) AS n_batches
FROM orders GROUP BY o_custkey
"""


def q_safe_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """safeFlatMap error channel (SCollectionSafeSyntax.scala:46): a fn that
    fails on short docs — ok rows carry the token count, failures divert to
    the error side; the ok channel is oracle-checkable."""
    from scio_spark.operators.enrich import safe_map_partitions

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").map("doc_id", "text")

    def tokens_or_fail(rec):
        toks = rec["text"].split(" ")
        if len(toks) < 5:
            raise ValueError("too short")
        return {"doc_id": rec["doc_id"], "n_tokens": len(toks)}

    ok, _errors = safe_map_partitions(d.df, tokens_or_fail, "doc_id long, n_tokens long")
    return ok


ORACLE_SAFE_MAP = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
WHERE len(string_split(text, ' ')) >= 5
"""


def q_async_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Async batched lookup (ScalaAsyncBatchLookupDoFn analog) with a pure
    deterministic "service": uppercase the nation name."""
    from scio_spark.operators.enrich import async_lookup

    sc = _ctx(spark)
    n = _t(sc, sf_dir, "nation").map("n_nationkey", "n_name").df

    async def svc(chunk):
        return [
            {"n_nationkey": r["n_nationkey"], "upper_name": r["n_name"].upper()}
            for r in chunk
        ]

    return async_lookup(n, svc, "n_nationkey long, upper_name string")


ORACLE_ASYNC_LOOKUP = """
SELECT n_nationkey, UPPER(n_name) AS upper_name FROM nation
"""


def q_custom_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withWindowFn custom window assignment (SCollection.scala:1191,
    operators/windows.with_window_fn): 90-minute windows anchored at a
    15-minute offset — a WindowFn no built-in helper produces — then a
    windowed count per event_type."""
    from scio_spark.operators.windows import with_window_fn

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    assigned = with_window_fn(
        ev,
        # timestamp_seconds() returns session-tz TIMESTAMP; events.ts is
        # TIMESTAMP_NTZ (parquet without the UTC-adjust flag), so cast the
        # bounds to TIMESTAMP_NTZ to match F.window()'s type-preserving
        # behavior (and the DuckDB oracle's plain TIMESTAMP). Session tz is
        # pinned UTC, so the cast is value-preserving.
        "array(named_struct("
        "  'start', CAST(timestamp_seconds(CAST(FLOOR((unix_timestamp(ts) - 900) / 5400) AS BIGINT) * 5400 + 900) AS TIMESTAMP_NTZ),"
        "  'end',   CAST(timestamp_seconds(CAST(FLOOR((unix_timestamp(ts) - 900) / 5400) AS BIGINT) * 5400 + 6300) AS TIMESTAMP_NTZ)"
        "))",
    )
    return assigned.groupBy("window_start", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


ORACLE_CUSTOM_WINDOW = """
SELECT CAST(to_timestamp(CAST(FLOOR((epoch(ts) - 900) / 5400) AS BIGINT) * 5400 + 900)
            AS TIMESTAMP) AS window_start,
       event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSION windows (the GameStats.scala:120 sessions exemplar):
    readStream → watermark(0s) → session_window(30 min gap) per user, APPEND
    mode (Spark requires append for streaming session aggs) driven to
    completion. Append emits exactly the sessions the watermark finalized —
    those whose end (last event + gap) ≤ max event time — so the oracle is
    the gaps-and-islands query restricted to finalized sessions: the
    Beam-default-trigger DISCARDING-final-pane semantics, oracle-pinned."""
    from scio_spark.streaming.core import ensure_event_time, run_to_memory

    sc = _ctx(spark)
    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("TIMESTAMP_MICROS(ts DIV 1000)"))
    stream = ensure_event_time(stream, "ts")
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("session"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            # LTZ→NTZ: the watermark path runs on LTZ; the source + oracle
            # are NTZ (value-preserving under the pinned UTC session tz)
            F.col("session.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
        )
    )
    return run_to_memory(agg, output_mode="append", num_state_partitions=8)


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming bounded-state dedup (streaming/core.py stream_dedup):
    readStream over events → watermark + dropDuplicatesWithinWatermark on
    (user_id, event_type), counted per event_type after run-to-completion.
    The full fixture replays inside one watermark horizon, so the result
    equals batch DISTINCT — the DuckDB oracle."""
    from scio_spark.streaming.core import run_to_memory, stream_dedup

    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    deduped = stream_dedup(
        stream, ["user_id", "event_type"], ts_col="ts", within="10 days"
    )
    out = run_to_memory(
        deduped.select("user_id", "event_type"),
        output_mode="append",
        num_state_partitions=8,
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique_users")
    )


ORACLE_STREAMING_DEDUP = """
SELECT event_type, COUNT(*) AS n_unique_users
FROM (SELECT DISTINCT user_id, event_type FROM events)
GROUP BY event_type
"""


ORACLE_STREAMING_SESSION = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes' OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), islands AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), sess AS (
  SELECT user_id, MIN(ts) AS session_start,
         MAX(ts) + INTERVAL '30 minutes' AS session_end,
         COUNT(*) AS n_events
  FROM islands GROUP BY user_id, sid
)
SELECT user_id, session_start, n_events FROM sess
WHERE session_end <= (SELECT MAX(ts) FROM events)
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (functions/text.scrub_pii + pii_counts) — the pass
    every web corpus runs first. Deterministic synthetic PII (email / phone
    / IPv4 / SSN derived from doc_id) is appended to each document in BOTH
    engines, then counted and masked: a real regex-parity check of the
    RE2-compatible pattern set, chained global replaces."""
    from scio_spark.fanout import fan_out_scan
    from scio_spark.functions import text as T

    sc = _ctx(spark)
    # r15-opt: chained global regex replaces are per-row heavy; fan the
    # narrow scan to width (0.63-0.66 -> 0.30-0.40 s warm at sf0.1).
    d = fan_out_scan(_t(sc, sf_dir, "documents").df)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call 555-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ssn 123-45-6789"),
    )
    return d.select(
        "doc_id",
        *T.pii_counts(aug),
        T.scrub_pii(aug).alias("scrubbed"),
    )


ORACLE_PII_SCRUB = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com call 555-123-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.7 ssn 123-45-6789' AS t
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
    AS n_email,
  len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
  len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
      '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS scrubbed
FROM aug
"""


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (functions/text.chunk_text) — the
    RAG-indexing / context-packing primitive: 32-token windows advancing by
    24 (8-token overlap), all JVM expressions, explode inside the scan
    stage (no shuffle)."""
    from scio_spark.functions import text as T

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").df
    return T.chunk_text(d, chunk_tokens=32, overlap=8)


ORACLE_TEXT_CHUNKS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')
           AS t
  FROM documents
), nn AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       CAST(s / 24 AS INT) AS chunk_id,
       len(list_slice(t, CAST(s AS INT) + 1, CAST(s AS INT) + 32)) AS n_tokens,
       array_to_string(list_slice(t, CAST(s AS INT) + 1, CAST(s AS INT) + 32), ' ')
         AS chunk
FROM nn, UNNEST(range(0, CAST(n AS BIGINT), 24)) AS u(s)
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-n stratified sampling (pair.sample_exact_by_key,
    PairSCollectionFunctions.scala:1082) — corpus balancing: exactly
    min(7, stratum size) docs per source, uniform under the seeded-hash
    ranked window. The sampled membership is seed-dependent, so the oracle
    pins the CONTRACT: per-source output counts."""
    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").key_by("source")
    return (
        d.sample_exact_by_key(7)
        .df.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


ORACLE_STRATIFIED_SAMPLE = """
SELECT source, LEAST(7, COUNT(*)) AS n_sampled
FROM documents GROUP BY source
"""


def q_hash_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashIntersectByKey (PairHashSCollectionFunctions.scala:183 —
    broadcast left_semi): customers whose nation has a high-balance
    supplier, counted per nation."""
    sc = _ctx(spark)
    c = _t(sc, sf_dir, "customer").key_by("c_nationkey")
    s = _t(sc, sf_dir, "supplier").df.filter("s_acctbal > 5000")
    rich = sc.custom_input("rich_suppliers", s).key_by(
        c_nationkey="s_nationkey"
    )
    return (
        c.hash_intersect_by_key(rich)
        .df.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ORACLE_HASH_INTERSECT = """
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer
WHERE c_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
GROUP BY c_nationkey
"""


def q_hash_subtract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashSubtractByKey (PairHashSCollectionFunctions.scala:210 —
    broadcast left_anti): customers whose nation has NO high-balance
    supplier, counted per nation."""
    sc = _ctx(spark)
    c = _t(sc, sf_dir, "customer").key_by("c_nationkey")
    s = _t(sc, sf_dir, "supplier").df.filter("s_acctbal > 5000")
    rich = sc.custom_input("rich_suppliers", s).key_by(
        c_nationkey="s_nationkey"
    )
    return (
        c.hash_subtract_by_key(rich)
        .df.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ORACLE_HASH_SUBTRACT = """
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer
WHERE c_nationkey NOT IN
      (SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
GROUP BY c_nationkey
"""


def q_group_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupByKey (PairSCollectionFunctions.scala:790) — values into an
    array per key, sorted (collect_list order is partition-dependent) and
    joined to one scalar string: the driver's pandas canonicalizer cannot
    hash list cells (r6 red row), so the grouped array is projected to
    '|'-joined text in BOTH engines."""
    sc = _ctx(spark)
    n = _t(sc, sf_dir, "nation").key_by("n_regionkey")
    grouped = sc.custom_input(
        "nation_names", n.df.select("n_regionkey", "n_name")
    ).key_by("n_regionkey").group_by_key()
    return grouped.df.select(
        "n_regionkey",
        F.array_join(F.array_sort("values"), "|").alias("names"),
    )


ORACLE_GROUP_BY_KEY = """
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), '|') AS names
FROM nation GROUP BY n_regionkey
"""


def q_combine_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """combine / combineByKey generic fallback (SCollection.scala:540 →
    pair.combine_by_key_pandas): per-key Arrow-batched pandas group map.
    Combiner computes order-insensitive exact stats (count + max)."""
    import pandas as pd

    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders").key_by("o_orderpriority")

    def combiner(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "n_orders": [len(pdf)],
                "max_price": [float(pdf["o_totalprice"].max())],
            }
        )

    return o.combine_by_key_pandas(
        combiner, "o_orderpriority string, n_orders long, max_price double"
    ).df


ORACLE_COMBINE_PANDAS = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_orderpriority
"""


def q_pane_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withPaneInfo batch mode (SCollection.scala:1307): bounded pipelines
    fire one final pane per window — ON_TIME, index 0, first and last —
    attached to a fixed-window aggregate."""
    from scio_spark.operators import windows as W

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    agg = W.fixed_window_agg(
        ev, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n")]
    ).select("window_start", "event_type", "n")
    return W.with_pane_info(agg)


ORACLE_PANE_INFO = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n,
       'ON_TIME' AS pane_timing, CAST(0 AS BIGINT) AS pane_index,
       TRUE AS pane_is_first, TRUE AS pane_is_last
FROM events GROUP BY 1, 2
"""


def q_keyed_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapValues/mapKeys/flatMapValues/filterValues/swap family
    (PairSCollectionFunctions.scala:743-1152) composed in one pipeline:
    nation keyed by name → mapKeys(lower) → flatMapValues(2 copies) →
    filterValues → mapValues(region offset) → swap, counted per new key."""
    sc = _ctx(spark)
    n = _t(sc, sf_dir, "nation").key_by("n_name")
    out = (
        n.map_keys(kname="lower(n_name)")
        .flat_map_values(F.expr("array(n_regionkey, n_regionkey + 10)"), "rk")
        .filter_values("rk < 13")
        .map_values(rk2="rk * 2")
        .swap()
    )
    return out.df.groupBy("rk2").agg(F.count(F.lit(1)).alias("n"))


ORACLE_KEYED_VARIANTS = """
WITH fl AS (
  SELECT lower(n_name) AS kname, u.rk
  FROM nation, UNNEST([n_regionkey, n_regionkey + 10]) AS u(rk)
)
SELECT rk * 2 AS rk2, COUNT(*) AS n FROM fl WHERE rk < 13 GROUP BY 1
"""


def q_map_with_resource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapWithResource (SCollectionWithResourceSyntax.scala:37-64): a
    per-task resource (here a deterministic code table) applied to Arrow
    batches; rows map through the resource exactly once."""
    from scio_spark.operators.enrich import map_with_resource

    sc = _ctx(spark)
    r = _t(sc, sf_dir, "region").df.select("r_regionkey", "r_name")

    def make_table():
        return {i: f"zone_{i % 3}" for i in range(64)}

    def apply(table, pdf):
        pdf = pdf.copy()
        pdf["zone"] = [table[int(k)] for k in pdf["r_regionkey"]]
        return pdf[["r_regionkey", "r_name", "zone"]]

    return map_with_resource(
        r, make_table, apply, "r_regionkey long, r_name string, zone string"
    )


ORACLE_MAP_WITH_RESOURCE = """
SELECT r_regionkey, r_name,
       'zone_' || CAST(r_regionkey % 3 AS VARCHAR) AS zone
FROM region
"""


def q_hash_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashFilter (SCollection hashFilter — the set-membership sibling of
    PairHashSCollectionFunctions.scala:183-226): keep customers whose
    nation appears in a broadcast-small side set (nations of regions 1-2),
    then count + decimal-staged balance sum per kept nation. The plan is a
    BroadcastHashJoin LeftSemi — no shuffle of the big side."""
    sc = _ctx(spark)
    c = _t(sc, sf_dir, "customer")
    side = sc.custom_input(
        "filter_nations",
        _t(sc, sf_dir, "nation")
        .df.filter("n_regionkey IN (1, 2)")
        .select(F.col("n_nationkey").alias("c_nationkey")),
    )
    return (
        c.hash_filter(side, on="c_nationkey")
        .df.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_bal"),
        )
    )


ORACLE_HASH_FILTER = """
SELECT c_nationkey, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer
WHERE c_nationkey IN
      (SELECT n_nationkey FROM nation WHERE n_regionkey IN (1, 2))
GROUP BY c_nationkey
"""


def q_map_with_parallelism(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapWithParallelism (SCollectionParallelismSyntax.scala:43-71,
    util/ParallelLimitedFn.scala): Arrow batches through a bounded
    per-task thread pool (4 workers) — the blocking-I/O concurrency cap.
    The fn is a deterministic enrich so the oracle replays in SQL."""
    from scio_spark.operators.enrich import map_with_parallelism

    sc = _ctx(spark)
    s = _t(sc, sf_dir, "supplier").df.select(
        "s_suppkey", "s_name", "s_nationkey"
    )

    def enrich(pdf):
        pdf = pdf.copy()
        pdf["tag"] = (
            pdf["s_name"].str.upper() + "#" + pdf["s_nationkey"].astype(str)
        )
        return pdf[["s_suppkey", "tag"]]

    return map_with_parallelism(
        s, enrich, "s_suppkey long, tag string", max_parallelism=4
    )


ORACLE_MAP_WITH_PARALLELISM = """
SELECT s_suppkey,
       upper(s_name) || '#' || CAST(s_nationkey AS VARCHAR) AS tag
FROM supplier
"""


def q_side_input_multimap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """asMultiMapSideInput + SCollectionWithSideInput (SideInput.scala:123,
    SCollectionWithSideInput.scala): regions enriched from a broadcast
    key→values multimap of their nations — the side-input form of a
    small-dim join; no shuffle, the multimap rides the broadcast."""
    from scio_spark.operators import enrich as E

    sc = _ctx(spark)
    bc = E.side_input_multimap(
        _t(sc, sf_dir, "nation").df, "n_regionkey", "n_name"
    )
    r = _t(sc, sf_dir, "region").df.select("r_regionkey", "r_name")

    def fn(pdf, side):
        pdf = pdf.copy()
        pdf["nations"] = [
            "|".join(sorted(side.get(int(k), []))) for k in pdf["r_regionkey"]
        ]
        return pdf

    return E.with_side_input(
        r, bc, fn, "r_regionkey long, r_name string, nations string"
    )


ORACLE_SIDE_INPUT_MULTIMAP = """
SELECT r_regionkey, r_name,
       array_to_string(list_sort(list(n_name)), '|') AS nations
FROM region JOIN nation ON n_regionkey = r_regionkey
GROUP BY r_regionkey, r_name
"""


def q_dist_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DistCache (values/DistCache.scala:1-100): a driver-written lookup
    file shipped to every worker via SparkContext.addFile; each task opens
    the worker-LOCAL copy (SparkFiles.get) inside the Arrow batch fn —
    no broadcast variable, no shuffle."""
    import os

    from scio_spark.operators.enrich import dist_cache

    sc = _ctx(spark)
    d = _rt_path(sf_dir, "dist_cache")
    os.makedirs(d, exist_ok=True)
    sf = os.path.basename(sf_dir.rstrip("/")) or "sf"
    # per-sf basename: SparkFiles resolves by basename and a session may
    # see several scale factors
    fpath = os.path.join(d, f"grades_{sf}.txt")
    with open(fpath, "w") as f:
        for i in range(32):
            f.write(f"{i}:grade_{i % 2}\n")
    get = dist_cache(spark, fpath)
    n = _t(sc, sf_dir, "nation").df.select("n_nationkey", "n_name")

    def gen(batches):
        with open(get()) as f:
            table = dict(line.strip().split(":") for line in f)
        for pdf in batches:
            pdf = pdf.copy()
            pdf["grade"] = [table[str(int(k))] for k in pdf["n_nationkey"]]
            yield pdf

    return n.mapInPandas(gen, "n_nationkey long, n_name string, grade string")


ORACLE_DIST_CACHE = """
SELECT n_nationkey, n_name,
       'grade_' || CAST(n_nationkey % 2 AS VARCHAR) AS grade
FROM nation
"""


def q_aggregate_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregateByKey with an Algebird-style MonoidAggregator
    (SCollection.scala:416-440, PairSCollectionFunctions.scala:575-605 →
    functions/aggregators.py): a genuinely opaque Python monoid —
    set-union of market segments per nation — prepared/merged per Arrow
    key group, presented as a sorted '|'-joined scalar."""
    from scio_spark.functions.aggregators import (
        Aggregator,
        aggregate_by_key_pandas,
    )

    sc = _ctx(spark)
    c = (
        _t(sc, sf_dir, "customer")
        .map("c_nationkey", "c_mktsegment")
        .key_by("c_nationkey")
    )
    agg = Aggregator(
        prepare=lambda r: {r["c_mktsegment"]},
        merge=lambda a, b: a | b,
        present=lambda acc: {"segments": "|".join(sorted(acc))},
        zero=set(),
    )
    return aggregate_by_key_pandas(c, agg, "c_nationkey int, segments string")


ORACLE_AGGREGATE_BY_KEY = """
SELECT c_nationkey,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments
FROM customer GROUP BY c_nationkey
"""


def q_aggregate_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate(Aggregator) (SCollection.scala:416 →
    aggregators.aggregate_rdd): treeAggregate with map-side partial
    combining of a Python monoid — max by (length, name), a total order
    so the result is unique. The scalar result is re-wrapped as a 1-row
    DataFrame for the gate."""
    from scio_spark.functions.aggregators import Aggregator, aggregate_rdd

    sc = _ctx(spark)
    n = _t(sc, sf_dir, "nation").df.select("n_name")
    agg = Aggregator(
        prepare=lambda r: (len(r["n_name"]), r["n_name"]),
        merge=max,
        present=lambda acc: {"longest": acc[1], "name_len": acc[0]},
        zero=None,
    )
    out = aggregate_rdd(n, agg)
    return spark.createDataFrame(
        [(out["longest"], out["name_len"])], "longest string, name_len long"
    )


ORACLE_AGGREGATE_GLOBAL = """
SELECT n_name AS longest, length(n_name) AS name_len
FROM nation
ORDER BY length(n_name) DESC, n_name DESC LIMIT 1
"""


def q_side_outputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SideOutput / SCollectionWithSideOutput (values/SideOutput.scala:1-89
    → enrich.side_outputs): ONE cached pass over orders fanned into three
    tagged outputs by priority class (SURVEY §4.4.3's documented
    one-cached-scan cost for Beam's multi-output ParDo); per-tag counts
    re-unioned for the gate."""
    from scio_spark.operators.enrich import side_outputs

    sc = _ctx(spark)
    o = _t(sc, sf_dir, "orders").df
    outs = side_outputs(
        o,
        {
            "urgent": "o_orderpriority IN ('1-URGENT', '2-HIGH')",
            "normal": "o_orderpriority = '3-MEDIUM'",
            "low": "o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')",
        },
    )
    parts = [
        outs[tag].agg(
            F.lit(tag).alias("tag"), F.count(F.lit(1)).alias("n_orders")
        )
        for tag in ["urgent", "normal", "low"]
    ]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


ORACLE_SIDE_OUTPUTS = """
SELECT 'urgent' AS tag, COUNT(*) AS n_orders FROM orders
 WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
UNION ALL
SELECT 'normal', COUNT(*) FROM orders WHERE o_orderpriority = '3-MEDIUM'
UNION ALL
SELECT 'low', COUNT(*) FROM orders
 WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
"""


def q_map_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapFile (SCollectionFileDownloadSyntax.scala:43,66 →
    enrich.map_file): a DataFrame of file:// URIs downloaded to
    worker-local temp files per Arrow batch; fn reads each local copy.
    Files are derived deterministically from region names so the oracle
    replays in SQL."""
    import os

    from scio_spark.operators.enrich import map_file

    d = _rt_path(sf_dir, "map_file")
    os.makedirs(d, exist_ok=True)
    sc = _ctx(spark)
    regions = _t(sc, sf_dir, "region").df.select("r_regionkey", "r_name")
    uris = []
    for r in regions.collect():  # 5 rows — driver-sized by construction
        p = os.path.join(d, f"region_{r['r_regionkey']}.txt")
        with open(p, "w") as f:
            f.write(r["r_name"].lower() + "\n")
        uris.append((int(r["r_regionkey"]), "file://" + p))
    files = spark.createDataFrame(uris, "r_regionkey long, uri string")

    def fn(local_path):
        with open(local_path) as f:
            content = f.read().strip()
        return {"content": content, "n_chars": len(content)}

    return map_file(
        files,
        "uri",
        fn,
        "r_regionkey long, content string, n_chars long",
        keep_cols=["r_regionkey"],
    )


ORACLE_MAP_FILE = """
SELECT r_regionkey, lower(r_name) AS content,
       length(r_name) AS n_chars
FROM region
"""


def q_vector_sum_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-semigroup sumByKey (scio-extra Breeze.scala DenseVector
    Semigroup → functions/vectors.sum_vectors_by_key): element-wise
    per-label embedding sums, decimal-staged per component so the float
    addition order cannot change the result. The assembled array is
    re-exploded to scalar rows for the gate (the canonicalizer cannot
    hash array cells)."""
    from scio_spark.functions.vectors import sum_vectors_by_key

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sum_vectors_by_key(emb.select("label", "embedding"), "embedding", ["label"])
    return out.select(
        "label",
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.posexplode("vec_sum").alias("pos", "comp"),
    )


ORACLE_VECTOR_SUM = """
WITH comps AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(28,8)) AS v
  FROM embeddings
),
sums AS (
  SELECT label, pos, CAST(SUM(v) AS DOUBLE) AS comp
  FROM comps GROUP BY label, pos
),
n AS (SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label)
SELECT s.label, n.n_vectors, s.pos, s.comp
FROM sums s JOIN n ON s.label = n.label
"""


# -------------------------------------------------- IO round-trip oracles
# Each query writes a deterministic subset through a scio_spark sink, reads
# it back through the matching source, and aggregates/projets — while the
# oracle computes the same result straight from the original parquet. A
# value-hash match therefore proves the WRITE→READ path is lossless, not
# just that the code runs (upgrades SURVEY §2.6 rows from pytest-only to
# oracle-checked).


def _rt_path(sf_dir: str, name: str) -> str:
    import os

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return f"/tmp/scio_spark_rt/{sf}/{name}"


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source round-trip (Spark-native columnar format beside
    parquet; pushdown/pruning automatic like parquet_file). Aggregate is
    decimal-staged so the sum is partition-order independent in both
    engines."""
    path = _rt_path(sf_dir, "orc")
    sc = _ctx(spark)
    sub = (
        _t(sc, sf_dir, "orders")
        .df.filter("o_orderkey % 8 = 0")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    sc.custom_input("orc_rt_in", sub).save_as_orc_file(path)
    back = sc.orc_file(path).df
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )


ORACLE_ORC_ROUNDTRIP = """
SELECT o_orderstatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders WHERE o_orderkey % 8 = 0 GROUP BY o_orderstatus
"""


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source round-trip (scio-extra CsvIO.scala:26-54;
    SCollection.saveAsCsvFile). Doubles survive because Spark writes
    shortest-round-trip representations; the aggregate is decimal-staged so
    the sum is partition-order independent in both engines."""
    path = _rt_path(sf_dir, "csv")
    sc = _ctx(spark)
    sub = (
        _t(sc, sf_dir, "lineitem")
        .df.filter("l_orderkey % 10 = 0")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )
    sc.custom_input("csv_rt_in", sub).save_as_csv_file(path)
    back = sc.csv_file(
        path,
        schema="l_orderkey long, l_linenumber int, l_quantity double, l_returnflag string",
    ).df
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_qty"),
    )


ORACLE_CSV_ROUNDTRIP = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem WHERE l_orderkey % 10 = 0 GROUP BY l_returnflag
"""


def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+source round-trip (scio-extra JsonIO.scala:32;
    SCollection.saveAsJsonFile) with an explicit read schema (no inference
    drift)."""
    path = _rt_path(sf_dir, "json")
    sc = _ctx(spark)
    sub = (
        _t(sc, sf_dir, "orders")
        .df.filter("o_orderkey % 8 = 0")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    sc.custom_input("json_rt_in", sub).save_as_json_file(path)
    back = sc.json_file(
        path, schema="o_orderkey long, o_orderpriority string, o_totalprice double"
    ).df
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_total"),
    )


ORACLE_JSON_ROUNDTRIP = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
FROM orders WHERE o_orderkey % 8 = 0 GROUP BY o_orderpriority
"""


def q_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text sink+source round-trip (ScioContext.scala:810 textFile /
    SCollection.scala:1629 saveAsTextFile): rows serialized to delimited
    lines, parsed back field-exact."""
    path = _rt_path(sf_dir, "text")
    sc = _ctx(spark)
    n = _t(sc, sf_dir, "nation").df
    lines = n.select(
        F.concat_ws(
            "|",
            F.col("n_nationkey").cast("string"),
            F.col("n_regionkey").cast("string"),
            F.col("n_name"),
        ).alias("value")
    )
    sc.custom_input("text_rt_in", lines).save_as_text_file(path)
    back = sc.text_file(path).df
    p = F.split(F.col("value"), r"\|")
    return back.select(
        p.getItem(0).cast("int").alias("n_nationkey"),
        p.getItem(1).cast("int").alias("n_regionkey"),
        p.getItem(2).alias("n_name"),
    )


ORACLE_TEXT_ROUNDTRIP = """
SELECT n_nationkey, n_regionkey, n_name FROM nation
"""


def q_tfrecord_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TFRecord codec round-trip (scio-tensorflow TFRecordIO.scala /
    TFRecordCodec.scala): UTF-8 document payloads framed with masked
    CRC-32C, written one file per partition, decoded back with checksum
    verification. Per-record byte length + sha256 prove payload fidelity."""
    from scio_spark.sources import formats as Fmt

    path = _rt_path(sf_dir, "tfrecord")
    sc = _ctx(spark)
    d = (
        _t(sc, sf_dir, "documents")
        .df.filter("doc_id % 5 = 0")
        .select(F.encode("text", "UTF-8").alias("payload"))
    )
    Fmt.save_as_tfrecord(d, "payload", path)
    back = Fmt.read_tfrecord(spark, path)
    return back.select(
        F.length("record").cast("long").alias("n_bytes"),
        F.sha2(F.col("record"), 256).alias("sha"),
    )


ORACLE_TFRECORD_ROUNDTRIP = """
SELECT CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha
FROM documents WHERE doc_id % 5 = 0
"""


def q_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed binary sink+source round-trip (scio-core io/BinaryIO.scala:
    header ⧺ [u32-LE length][payload]* ⧺ footer, executor-side writes):
    decoded records compared string-exact against the source column."""
    from scio_spark.sources import formats as Fmt

    path = _rt_path(sf_dir, "binary")
    sc = _ctx(spark)
    part = (
        _t(sc, sf_dir, "part")
        .df.filter("p_partkey % 4 = 0")
        .select(F.encode("p_name", "UTF-8").alias("payload"))
    )
    Fmt.save_as_binary_file(part, "payload", path, header=b"SCIO", footer=b"END")
    back = Fmt.read_binary_file(spark, path, header=b"SCIO", footer=b"END")
    return back.select(F.decode("record", "UTF-8").alias("record_text"))


ORACLE_BINARY_ROUNDTRIP = """
SELECT p_name AS record_text FROM part WHERE p_partkey % 4 = 0
"""


def q_object_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-file round-trip (scio-avro ObjectFileIO analog: pickled
    payloads in a binary parquet column, formats.object_file_df): the
    opaque column is unpickled back and must equal the original values."""
    import pickle

    from scio_spark.sources import formats as Fmt

    path = _rt_path(sf_dir, "object")
    sc = _ctx(spark)
    n = _t(sc, sf_dir, "nation").df.select("n_nationkey", "n_name")
    Fmt.object_file_df(n, ["n_name"], path)
    back = spark.read.parquet(path)
    unpickle = F.udf(lambda b: pickle.loads(bytes(b)), "string")
    return back.select(
        "n_nationkey", unpickle(F.col("n_name")).alias("n_name")
    )


ORACLE_OBJECT_ROUNDTRIP = """
SELECT n_nationkey, n_name FROM nation
"""


def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC sink+source round-trip (scio-jdbc jdbcSelect / saveAsJdbc)
    through the embedded Derby driver Spark bundles — the test-env stand-in
    for a networked warehouse URL (same code path; a cluster deployment
    swaps the URL and raises num_partitions for parallel reads with
    partitionColumn bounds)."""
    import os

    # per-process DB directory: embedded Derby takes an exclusive JVM boot
    # lock on the directory, so two concurrent sessions (e.g. the oracle
    # gate and a plan audit) sharing one path would fail spuriously.
    # The dir can't be removed after this query (the JDBC read is lazy —
    # the driver collects later), so bound runtime-dir growth by sweeping
    # siblings left by processes that are no longer alive.
    import shutil

    path = _rt_path(sf_dir, f"derby_{os.getpid()}")
    parent = os.path.dirname(path)
    if os.path.isdir(parent):
        for name in os.listdir(parent):
            if not name.startswith("derby_"):
                continue
            try:
                pid = int(name[len("derby_"):])
            except ValueError:
                continue
            if pid == os.getpid():
                continue
            try:
                os.kill(pid, 0)  # raises if the owning process is gone
            except ProcessLookupError:
                shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
            except PermissionError:
                pass  # pid alive under another uid — leave its DB alone
    url = f"jdbc:derby:{path};create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    sc = _ctx(spark)
    sup = (
        _t(sc, sf_dir, "supplier")
        .df.filter("s_suppkey % 3 = 0")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
    )
    sc.custom_input("jdbc_rt_in", sup).save_as_jdbc(
        url, "supplier_rt", num_partitions=1, driver=drv
    )
    back = sc.jdbc(url, "supplier_rt", driver=drv).df
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("s_acctbal").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_bal"),
    )


ORACLE_JDBC_ROUNDTRIP = """
SELECT s_nationkey, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
FROM supplier WHERE s_suppkey % 3 = 0 GROUP BY s_nationkey
"""


def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink+source round-trip (Spark 4 native spark-xml; bonus IO over
    the reference's JSON-only semi-structured story). Explicit read schema
    pins the original column types against XML's infer-everything-as-long."""
    path = _rt_path(sf_dir, "xml")
    sc = _ctx(spark)
    c = (
        _t(sc, sf_dir, "customer")
        .df.filter("c_custkey % 6 = 0")
        .select("c_custkey", "c_nationkey", "c_mktsegment")
    )
    sc.custom_input("xml_rt_in", c).save_as_xml_file(path)
    back = sc.xml_file(
        path, schema="c_custkey long, c_nationkey int, c_mktsegment string"
    ).df
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("c_nationkey").alias("sum_nation"),
    )


ORACLE_XML_ROUNDTRIP = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(c_nationkey) AS BIGINT) AS sum_nation
FROM customer WHERE c_custkey % 6 = 0 GROUP BY c_mktsegment
"""


def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro sink+source round-trip (scio-avro AvroIO.scala avroFile /
    saveAsAvroFile — the reference's most-used IO module). Uses the repo's
    pure-Python object-container codec (sources/avro.py; deflate blocks,
    logical types), which tests/test_avro.py proves wire-compatible with
    the JVM Avro library in both directions. The read goes through
    ScioContext.avro_file (spark-avro fast path when the jar exists, native
    codec fallback here). o_orderdate exercises the timestamp logical-type
    path end-to-end; the o_totalprice sum is decimal-staged."""
    from scio_spark.sources.avro import save_as_avro

    path = _rt_path(sf_dir, "avro")
    sc = _ctx(spark)
    sub = (
        _t(sc, sf_dir, "orders")
        .df.filter("o_orderkey % 12 = 0")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )
    save_as_avro(sub, path)
    back = sc.avro_file(path).df
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_total"),
        F.max("o_orderdate").alias("max_date"),
    )


ORACLE_AVRO_ROUNDTRIP = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total,
       MAX(o_orderdate) AS max_date
FROM orders WHERE o_orderkey % 12 = 0 GROUP BY o_orderstatus
"""


def q_tfexample_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf.Example TFRecord sink+source round-trip (scio-tensorflow
    TFExampleIO.scala saveAsTfExampleFile / tfRecordExampleFile — the
    training-data export format). Rows become tf.Example protobufs via the
    pure-Python wire codec (sources/proto.py, spec-golden-byte tested)
    inside CRC32C-framed TFRecord files; the read decodes them back through
    a feature spec, as TF readers do. Long/string/array<long> columns only:
    FloatList is float32 on the wire (feature.proto), so doubles would
    narrow — pinned separately in tests/test_proto.py."""
    from scio_spark.functions.text import token_count
    from scio_spark.sources.proto import read_tf_example, save_as_tf_example

    path = _rt_path(sf_dir, "tfexample")
    sc = _ctx(spark)
    d = (
        _t(sc, sf_dir, "documents")
        .df.filter("doc_id % 7 = 0")
        .select(
            "doc_id",
            "source",
            F.length("text").cast("long").alias("n_chars"),
            token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
    )
    save_as_tf_example(d, path)
    back = read_tf_example(
        spark, path, "doc_id long, source string, n_chars long, n_tokens long"
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


ORACLE_TFEXAMPLE_ROUNDTRIP = r"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(text)) AS BIGINT) AS sum_chars,
       CAST(SUM(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                x -> x <> ''))) AS BIGINT) AS sum_tokens
FROM documents WHERE doc_id % 7 = 0 GROUP BY source
"""


def q_protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protobuf-file sink+source round-trip (scio-avro ProtobufIO.scala
    protobufFile / saveAsProtobufFile). Matches scio's on-disk layout:
    message bytes wrapped in Avro object-container records (sources/avro.py
    carries the container; sources/proto.py the wire format). The field
    spec plays the role of the message descriptor."""
    from scio_spark.sources.proto import read_protobuf_file, save_as_protobuf_file

    path = _rt_path(sf_dir, "protobuf")
    spec = {
        1: ("p_partkey", "int64", False),
        2: ("p_brand", "string", False),
        3: ("p_retailprice", "double", False),
    }
    sc = _ctx(spark)
    p = (
        _t(sc, sf_dir, "part")
        .df.filter("p_partkey % 5 = 0")
        .select("p_partkey", "p_brand", "p_retailprice")
    )
    save_as_protobuf_file(p, path, spec)
    back = read_protobuf_file(
        spark, path, spec, "p_partkey long, p_brand string, p_retailprice double"
    )
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p_retailprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )


ORACLE_PROTOBUF_ROUNDTRIP = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM part WHERE p_partkey % 5 = 0 GROUP BY p_brand
"""


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2022 ExactSubstr at n-gram
    resolution; functions/substr_dedup.py): duplicated 10-token spans are
    marked everywhere except their corpus-first occurrence, overlapping
    hits merged into maximal spans; per-source accounting of affected docs
    and duplicated tokens. Oracle replays the identical semantics in SQL
    (positional grams → first-occurrence window → islands interval merge).
    Scale path: min(struct) first-occurrence agg instead of a per-gram sort
    (hot boilerplate grams stay mergeable); the oracle-facing mode shuffles
    exact gram text, hash_grams=True (parity-tested) ships 64-bit
    fingerprints instead."""
    from scio_spark.functions.substr_dedup import mark_duplicate_spans

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").df.select("doc_id", "source", "text")
    marked = mark_duplicate_spans(d, n=10)
    affected = marked.filter(F.col("n_dup_tokens") > 0).join(
        d.select("doc_id", "source"), "doc_id"
    )
    return affected.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_affected"),
        F.sum("n_dup_tokens").alias("sum_dup_tokens"),
    )


ORACLE_SUBSTRING_DEDUP = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source,
         unnest(generate_series(1, len(t) - 9)) - 1 AS pos,
         unnest(list_transform(generate_series(1, len(t) - 9),
                i -> array_to_string(list_slice(t, i, i + 9), chr(31)))) AS gram
  FROM toks WHERE len(t) >= 10
),
occ AS (
  SELECT doc_id, source, pos,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY gram) AS cnt
  FROM grams
),
dup AS (
  SELECT doc_id, source, pos, pos + 9 AS e FROM occ WHERE cnt >= 2 AND rn > 1
),
isl AS (
  SELECT doc_id, source, pos, e,
         CASE WHEN pos > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
              THEN 1 ELSE 0 END AS brk
  FROM dup
),
isl2 AS (
  SELECT doc_id, source, pos, e,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, source, island, MIN(pos) AS s, MAX(e) AS e
  FROM isl2 GROUP BY doc_id, source, island
),
per_doc AS (
  SELECT doc_id, source, SUM(e - s + 1) AS nd FROM spans GROUP BY doc_id, source
)
SELECT source, COUNT(*) AS n_docs_affected,
       CAST(SUM(nd) AS BIGINT) AS sum_dup_tokens
FROM per_doc GROUP BY source
"""


def q_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped sessionization (operators/windows.py capped_sessions — the
    production variant F.session_window lacks: gap sessions SPLIT at a max
    duration so an always-active key cannot form one infinite session):
    events per user at gap=30 min, cap=1 h, rolled up to sessions-per-
    user-bucket. Tie-safe by construction (equal timestamps always land in
    the same session regardless of sort order), so the two-pass window
    semantics replay exactly in DuckDB."""
    from scio_spark.operators.windows import capped_sessions

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df.select("user_id", "ts")
    s = capped_sessions(ev, "ts", 1800, 3600, "user_id")
    return (
        s.select((F.col("user_id") % 25).alias("ub"), "user_id", "session_id")
        .groupBy("ub")
        .agg(
            F.countDistinct("user_id", "session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


ORACLE_CAPPED_SESSIONS = """
WITH e AS (
  SELECT user_id, epoch(ts) AS sec FROM events
),
g AS (
  SELECT user_id, sec,
         CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)
),
gs AS (
  SELECT user_id, sec,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY sec
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS gsess
  FROM g
),
sess AS (
  SELECT user_id, sec, gsess,
         MIN(sec) OVER (PARTITION BY user_id, gsess) AS start
  FROM gs
),
labeled AS (
  SELECT user_id,
         'g' || gsess || '.' || CAST(FLOOR((sec - start) / 3600) AS BIGINT)
           AS session_id
  FROM sess
)
SELECT user_id % 25 AS ub,
       COUNT(DISTINCT (user_id, session_id)) AS n_sessions,
       COUNT(*) AS n_events
FROM labeled GROUP BY 1
"""


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (functions/privacy.py — the quasi-identifier
    guard completing the scrub_pii privacy tier): events bucketed into
    (user_id % 400, event_type) combinations, audited at k=5. One
    partial-agg'd groupBy; the report row is fully SQL-replayable."""
    from scio_spark.functions.privacy import k_anonymity_report

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df.select(
        (F.col("user_id") % 400).alias("ub"), "event_type"
    )
    return k_anonymity_report(ev, ["ub", "event_type"], k=5)


ORACLE_K_ANONYMITY = """
WITH g AS (
  SELECT user_id % 400 AS ub, event_type, COUNT(*) AS gsize
  FROM events GROUP BY 1, 2
)
SELECT CAST(SUM(gsize) AS BIGINT) AS n_rows,
       COUNT(*) AS n_groups,
       CAST(MIN(gsize) AS BIGINT) AS min_group_size,
       CAST(SUM(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS BIGINT)
         AS n_rows_below_k,
       CAST(SUM(CASE WHEN gsize < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups_below_k,
       MIN(gsize) >= 5 AS is_k_anonymous
FROM g
"""


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy join (operators/fuzzy_join.py — Gravano-style
    q-gram count filter + exact levenshtein re-check; the naive BETWEEN
    formulation is a cross product): two disjoint part-name strata joined
    at distance ≤ 6, reported as a distance histogram.

    Runs in the DEDUP-BEFORE-JOIN shape — the scale-correct pattern for
    a fuzzy join over a low-cardinality string column: part names are a
    small closed vocabulary repeated ~n/|vocab| times, so joining raw
    rows makes the PAIR SET itself quadratic in n (every copy of
    'red bolt' pairs with every copy of 'old bolt' — no candidate
    structure can beat the output size). Instead: count per distinct
    name (one linear agg per side), fuzzy-join the distinct names
    (constant-size problem at any sf), and weight the histogram by
    cnt_l*cnt_r. Identical result to the naive pair count (the oracle
    IS the naive cross join), measured e~=0.1 at sf0.1->sf1 vs e~=1.9
    for the raw-pairs spelling (SCALING.md r13)."""
    from scio_spark.operators.fuzzy_join import fuzzy_join

    sc = _ctx(spark)
    part = _t(sc, sf_dir, "part").df
    ldist = (
        part.filter("p_partkey % 20 = 0")
        .groupBy(F.col("p_name").alias("l_text"))
        .agg(F.count(F.lit(1)).alias("__lw"))
        .withColumn("l_id", F.col("l_text"))
    )
    rdist = (
        part.filter("p_partkey % 20 = 10")
        .groupBy(F.col("p_name").alias("r_text"))
        .agg(F.count(F.lit(1)).alias("__rw"))
        .withColumn("r_id", F.col("r_text"))
    )
    pairs = fuzzy_join(
        ldist.select("l_id", "l_text"), rdist.select("r_id", "r_text"),
        max_dist=6,
    )
    return (
        pairs.join(F.broadcast(ldist.select("l_id", "__lw")), "l_id")
        .join(F.broadcast(rdist.select("r_id", "__rw")), "r_id")
        .groupBy("distance")
        .agg(F.sum(F.col("__lw") * F.col("__rw")).alias("n_pairs"))
    )


ORACLE_FUZZY_JOIN = """
SELECT levenshtein(l.p_name, r.p_name) AS distance, COUNT(*) AS n_pairs
FROM (SELECT * FROM part WHERE p_partkey % 20 = 0) l,
     (SELECT * FROM part WHERE p_partkey % 20 = 10) r
WHERE levenshtein(l.p_name, r.p_name) <= 6
GROUP BY 1
"""


def q_arrow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC (Feather v2) sink+source round-trip
    (sources/arrow_ipc.py — the zero-copy interchange format Python
    training stacks read natively; pyarrow owns the wire bytes, the module
    owns the one-file-per-task distribution). zstd buffer compression;
    customer subset re-aggregated against the parquet truth."""
    from scio_spark.sources.arrow_ipc import read_arrow_ipc, save_as_arrow_ipc

    path = _rt_path(sf_dir, "arrow_ipc")
    sc = _ctx(spark)
    sub = (
        _t(sc, sf_dir, "customer")
        .df.filter("c_custkey % 4 = 0")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    save_as_arrow_ipc(sub, path)
    back = read_arrow_ipc(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_bal"),
    )


ORACLE_ARROW_ROUNDTRIP = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
FROM customer WHERE c_custkey % 4 = 0 GROUP BY c_mktsegment
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-quantized interval join (operators/range_join.py — the
    range-join-hint pattern from plain operators): clicks joined to
    ±30-minute windows around sampled purchase events BY TIME ALONE, then
    clicks-per-window. A bare BETWEEN join plans as a nested loop
    (asserted in tests); this plans as an equi-join on the bucket key with
    an exact re-check — same result, O(n+m) shuffle. Oracle = the naive
    BETWEEN join in DuckDB."""
    from scio_spark.operators.range_join import interval_join

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    clicks = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    wins = (
        ev.filter("event_type = 'purchase' AND event_id % 97 = 0")
        .select(
            F.col("event_id").alias("win_id"),
            (F.col("ts") - F.expr("INTERVAL 30 minutes")).alias("win_start"),
            (F.col("ts") + F.expr("INTERVAL 30 minutes")).alias("win_end"),
        )
    )
    joined = interval_join(
        clicks, wins, "c_ts", "win_start", "win_end", bucket_width=1800
    )
    return joined.groupBy("win_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.countDistinct("click_id").alias("n_distinct_clicks"),
    )


ORACLE_INTERVAL_JOIN = """
WITH wins AS (
  SELECT event_id AS win_id,
         ts - INTERVAL 30 MINUTE AS win_start,
         ts + INTERVAL 30 MINUTE AS win_end
  FROM events WHERE event_type = 'purchase' AND event_id % 97 = 0
)
SELECT w.win_id, COUNT(*) AS n_clicks,
       COUNT(DISTINCT c.event_id) AS n_distinct_clicks
FROM events c JOIN wins w
  ON c.ts >= w.win_start AND c.ts <= w.win_end
WHERE c.event_type = 'click'
GROUP BY w.win_id
"""


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM scoring (text.bigram_model/bigram_logprob —
    the CCNet-style upgrade over lm_score's unigram): per doc,
    bits-per-token of p = 0.75·p(w2|w1) + 0.25·p_uni(w2) over adjacent
    pairs. 0.75/0.25 are binary-exact so both engines interpolate
    identically; −log2 is DECIMAL(28,6)-quantized pre-sum (the lm_score
    determinism recipe). Output thinned to doc_id % 3 = 0 to keep the
    compare set bounded."""
    from scio_spark.functions.text import bigram_logprob

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").df.select("doc_id", "text")
    return bigram_logprob(d).filter("doc_id % 3 = 0")


ORACLE_BIGRAM_LM = """
WITH tok AS (
  -- parallel unnests zip in DuckDB: (position, token) pairs
  SELECT doc_id,
         unnest(generate_series(1, len(w))) AS i,
         unnest(w) AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t
),
pairs AS (
  SELECT a.doc_id, a.token AS w1, b.token AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
big AS (SELECT w1, w2, COUNT(*) AS cnt12 FROM pairs GROUP BY 1, 2),
lft AS (SELECT w1, COUNT(*) AS cnt1 FROM pairs GROUP BY 1),
bm AS (SELECT w1, w2, cnt12 / cnt1 AS p_bi FROM big JOIN lft USING (w1)),
ucnt AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1),
utot AS (SELECT SUM(cnt) AS t FROM ucnt),
um AS (SELECT token, cnt / t AS p_uni FROM ucnt, utot)
SELECT doc_id, COUNT(*) AS n_scored,
       CAST(CAST(SUM(CAST(-log2(0.75 * COALESCE(p_bi, 0.0) + 0.25 * p_uni)
                          AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS DOUBLE)
         AS bits_per_token
FROM pairs LEFT JOIN bm USING (w1, w2) JOIN um ON pairs.w2 = um.token
WHERE doc_id % 3 = 0
GROUP BY doc_id
"""


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned MERGE INTO on a plain-parquet table
    (operators/merge.py — the table-format-less upsert primitive, same
    mechanics as maintain_rollup's continuous upsert): target = orders
    partitioned by o_orderstatus; the source updates every 100th order's
    price and inserts new orders into a brand-new partition. Only touched
    partitions are rewritten (pinned byte-identical in
    tests/test_merge.py); the oracle reconstructs the merged state in SQL
    (source ∪ unmatched target) and must agree value-exact."""
    import shutil

    from scio_spark.operators.merge import merge_into

    path = _rt_path(sf_dir, "merge_target")
    shutil.rmtree(path, ignore_errors=True)
    sc = _ctx(spark)
    orders = _t(sc, sf_dir, "orders").df.select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.write.partitionBy("o_orderstatus").parquet(path)
    updates = orders.filter("o_orderkey % 100 = 0").withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.0
    )
    inserts = orders.filter("o_orderkey % 250 = 0").select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        F.lit("X").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    merge_into(
        path,
        updates.unionByName(inserts),
        keys=["o_orderkey"],
        partition_col="o_orderstatus",
    )
    merged = spark.read.parquet(path)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_total"),
    )


ORACLE_MERGE_UPSERT = """
WITH src AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT -o_orderkey, 'X', 1.0 FROM orders WHERE o_orderkey % 250 = 0
),
keep AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
),
merged AS (SELECT * FROM src UNION ALL SELECT * FROM keep)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
FROM merged GROUP BY o_orderstatus
"""


def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, value-checked (functions/codecs.py): solid-fill
    PPM assets are generated deterministically from asset_id arithmetic
    (dims/fill are pure functions of the id), encoded to actual P6 bytes
    executor-side, then decoded back by the real parser and feature-
    extracted. DuckDB cannot decode PPM — it doesn't have to: the oracle
    computes the expected width/height/mean analytically from the same
    arithmetic over range(n), so any decode defect (stride, header,
    channel order) breaks the value hash. Closes the 'multimodal decode is
    take-my-word-for-it' gap for the uncompressed tier."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.codecs import encode_ppm, image_features

    base = _asset_base(spark, 64)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                h = 8 + (int(aid) % 5) * 4
                w = 16 + (int(aid) % 7) * 2
                fill = int(aid) % 256
                img = np.full((h, w, 3), fill, dtype=np.uint8)
                rows.append({"asset_id": int(aid), "content": encode_ppm(img)})
            yield pd.DataFrame(rows)

    assets = base.mapInPandas(gen, "asset_id long, content binary")
    return image_features(assets).select(
        "asset_id", "width", "height", "channels", "mean_intensity", "std_intensity"
    )


ORACLE_IMAGE_DECODE = """
SELECT i AS asset_id,
       CAST(16 + (i % 7) * 2 AS INT) AS width,
       CAST(8 + (i % 5) * 4 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(i % 256 AS DOUBLE) AS mean_intensity,
       CAST(0.0 AS DOUBLE) AS std_intensity
FROM range(0, 64) t(i)
"""


def q_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode, value-checked (functions/codecs.py — the one
    COMPRESSED image format whose compression is stdlib zlib, so it gets
    a real codec instead of an import gate): deterministic GRADIENT
    assets (pixel v(y,x,c) = (y*31+x*7+c*85+id) % 256) are encoded
    executor-side with the full scanline-filter cycle (None/Sub/Up/
    Average/Paeth — every decode filter path runs per asset), zlib-
    compressed, decoded back, and reduced to integer stats including a
    POSITION-WEIGHTED digest — unlike a mean, any stride/transpose/
    channel-order defect permutes pixel positions and breaks the digest.
    DuckDB replays the same pixel arithmetic over a bounded range cross
    product; all sums are exact integer math in both engines."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.codecs import decode_png, encode_png

    base = _asset_base(spark, 48)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                h = 5 + i % 4 * 3
                w = 7 + i % 5 * 2
                y = np.arange(h)[:, None, None]
                x = np.arange(w)[None, :, None]
                c = np.arange(3)[None, None, :]
                img = ((y * 31 + x * 7 + c * 85 + i) % 256).astype(np.uint8)
                arr = decode_png(encode_png(img, filter_cycle=(0, 1, 2, 3, 4)))
                hh, ww, cc = arr.shape
                v = arr.astype(np.int64)
                wgt = (
                    np.arange(hh)[:, None, None] * ww * 3
                    + np.arange(ww)[None, :, None] * 3
                    + np.arange(cc)[None, None, :]
                    + 1
                )
                rows.append(
                    {
                        "asset_id": i, "width": ww, "height": hh,
                        "channels": cc, "pix_sum": int(v.sum()),
                        "pos_digest": int((v * wgt).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, width int, height int, channels int, "
        "pix_sum long, pos_digest long",
    )


ORACLE_PNG_DECODE = """
WITH a AS (SELECT i AS asset_id, 5 + (i % 4) * 3 AS h, 7 + (i % 5) * 2 AS w
           FROM range(0, 48) t(i)),
px AS (
  SELECT a.asset_id, a.h, a.w, ry.y, rx.x, rc.c,
         (ry.y*31 + rx.x*7 + rc.c*85 + a.asset_id) % 256 AS v
  FROM a, range(0, 17) ry(y), range(0, 15) rx(x), range(0, 3) rc(c)
  WHERE ry.y < a.h AND rx.x < a.w)
SELECT asset_id, CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(SUM(v) AS BIGINT) AS pix_sum,
       CAST(SUM(v * (y*w*3 + x*3 + c + 1)) AS BIGINT) AS pos_digest
FROM px GROUP BY asset_id
"""


def q_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, value-checked (functions/jpeg.py —
    pure-Python T.81 Huffman+DCT codec): flat-fill RGB assets from
    asset_id arithmetic are JPEG-encoded at q90 executor-side and decoded
    back. A flat block is DC-only, and at q90 the quantization error is
    ≤ Q00/16 = 3/16 < 0.5, so the lossy roundtrip lands EXACTLY on the
    input fills (empirically verified for all 48 fills; worst rounding
    margin 0.10 — 14 orders above float error). The oracle just replays
    the fill arithmetic: any defect in marker framing, Huffman tables,
    DC prediction, dequantization, IDCT, or the YCbCr inverse shifts a
    value and breaks the hash."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.jpeg import decode_jpeg, encode_jpeg

    base = _asset_base(spark, 48)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                r, g, b = (i * 37) % 256, (i * 59 + 11) % 256, (i * 83 + 29) % 256
                img = np.dstack(
                    [np.full((16, 16), v, np.uint8) for v in (r, g, b)]
                )
                out = decode_jpeg(encode_jpeg(img, 90))
                hh, ww, cc = out.shape
                rows.append(
                    {
                        "asset_id": i, "width": ww, "height": hh,
                        "channels": cc,
                        "uniform": bool((out == out[0, 0]).all()),
                        "r": int(out[0, 0, 0]), "g": int(out[0, 0, 1]),
                        "b": int(out[0, 0, 2]),
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, width int, height int, channels int, "
        "uniform boolean, r int, g int, b int",
    )


ORACLE_JPEG_DECODE = """
SELECT i AS asset_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(3 AS INT) AS channels, TRUE AS uniform,
       CAST((i * 37) % 256 AS INT) AS r,
       CAST((i * 59 + 11) % 256 AS INT) AS g,
       CAST((i * 83 + 29) % 256 AS INT) AS b
FROM range(0, 48) t(i)
"""


def q_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG decode (SOF2; T.81 Annex G spectral
    selection + successive approximation — functions/jpeg.py). Two
    value-checked layers per asset: (a) a flat fill encoded with
    encode_jpeg_progressive at q90 decodes EXACTLY back to the fill
    (DC-only blocks; quantization error < 0.5, same argument as
    jpeg_decode), so DC first/refine scans, band headers, and the
    multi-scan coefficient accumulation are hash-pinned; (b) an
    id-derived gradient must decode pixel-identically through the
    progressive and baseline streams of the SAME image — any defect in
    AC band scans, EOBRUN, or refinement correction bits flips
    prog_eq_base. The oracle replays the fill arithmetic and expects
    prog_eq_base = TRUE."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    base = _asset_base(spark, 40)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                r, g, b = (i * 41) % 256, (i * 67 + 13) % 256, (i * 89 + 31) % 256
                img = np.dstack(
                    [np.full((16, 16), v, np.uint8) for v in (r, g, b)]
                )
                out = decode_jpeg(encode_jpeg_progressive(img, 90))
                y, x = np.mgrid[0:16, 0:24]
                grad = np.dstack(
                    [
                        (y * (3 + i % 5) + x * (2 + i % 7) + i) % 256,
                        (x * 5 + i * 3) % 256,
                        (y * 7 + i * 11) % 256,
                    ]
                ).astype(np.uint8)
                q = (50, 85, 95)[i % 3]
                eq = bool(
                    (
                        decode_jpeg(encode_jpeg_progressive(grad, q))
                        == decode_jpeg(encode_jpeg(grad, q))
                    ).all()
                )
                rows.append(
                    {
                        "asset_id": i,
                        "width": int(out.shape[1]),
                        "height": int(out.shape[0]),
                        "uniform": bool((out == out[0, 0]).all()),
                        "r": int(out[0, 0, 0]),
                        "g": int(out[0, 0, 1]),
                        "b": int(out[0, 0, 2]),
                        "prog_eq_base": eq,
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, width int, height int, uniform boolean, "
        "r int, g int, b int, prog_eq_base boolean",
    )


ORACLE_JPEG_PROGRESSIVE = """
SELECT i AS asset_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       TRUE AS uniform,
       CAST((i * 41) % 256 AS INT) AS r,
       CAST((i * 67 + 13) % 256 AS INT) AS g,
       CAST((i * 89 + 31) % 256 AS INT) AS b,
       TRUE AS prog_eq_base
FROM range(0, 40) t(i)
"""


def q_jpeg12_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 12-bit extended-sequential JPEG (SOF1, Pq=1 16-bit DQT —
    functions/jpeg.py encode_jpeg12/decode_jpeg): per asset a flat
    12-bit gray fill v = (i * 997 + 13) % 4096 is encoded at q95
    (unscaled Annex K tables keep the DC quantization error below the
    rounding margin, so the lossy roundtrip lands EXACTLY on the fill)
    and decoded back to uint16. The oracle replays the fill arithmetic;
    any defect in the 16-bit DQT parse, the widened Huffman categories,
    the 2048 level shift, or the uint16 clamp shifts a value and breaks
    the hash."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.jpeg import decode_jpeg, encode_jpeg12

    base = _asset_base(spark, 40)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                v = (i * 997 + 13) % 4096
                img = np.full((16, 16), v, np.uint16)
                out = decode_jpeg(encode_jpeg12(img, 95))
                rows.append(
                    {
                        "asset_id": i,
                        "width": int(out.shape[1]),
                        "height": int(out.shape[0]),
                        "is_uint16": out.dtype == np.uint16,
                        "uniform": bool((out == out[0, 0]).all()),
                        "value": int(out[0, 0]),
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, width int, height int, is_uint16 boolean, "
        "uniform boolean, value int",
    )


ORACLE_JPEG12_DECODE = """
SELECT i AS asset_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       TRUE AS is_uint16, TRUE AS uniform,
       CAST((i * 997 + 13) % 4096 AS INT) AS value
FROM range(0, 40) t(i)
"""


def q_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode, value-checked (functions/codecs.py — pure-Python
    LZW with variable-width codes): per asset, a small id-derived palette
    and an index pattern idx(y,x) = (y*w + x + id) % k are GIF-encoded
    (real LZW, table clears included) and decoded back; the output is
    the same integer pix_sum + position-weighted digest pair as
    png_decode, so palette mapping, LZW width bumps, and row order are
    all value-hash-checked. DuckDB replays the palette and index
    arithmetic over a bounded range cross product."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.codecs import decode_gif, encode_gif

    base = _asset_base(spark, 40)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                k = 4 + i % 5
                h = 6 + (i % 3) * 2
                w = 9
                pal = np.stack(
                    [
                        np.array(
                            [
                                (i * 13 + j * 29) % 256,
                                (i * 7 + j * 41) % 256,
                                (i * 3 + j * 53) % 256,
                            ],
                            np.uint8,
                        )
                        for j in range(k)
                    ]
                )
                y = np.arange(h)[:, None]
                x = np.arange(w)[None, :]
                idx = (y * w + x + i) % k
                arr = decode_gif(encode_gif(pal[idx]))
                hh, ww, cc = arr.shape
                v = arr.astype(np.int64)
                wgt = (
                    np.arange(hh)[:, None, None] * ww * 3
                    + np.arange(ww)[None, :, None] * 3
                    + np.arange(cc)[None, None, :]
                    + 1
                )
                rows.append(
                    {
                        "asset_id": i, "width": ww, "height": hh,
                        "pix_sum": int(v.sum()),
                        "pos_digest": int((v * wgt).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, width int, height int, pix_sum long, pos_digest long",
    )


ORACLE_GIF_DECODE = """
WITH a AS (SELECT i AS asset_id, 4 + i % 5 AS k, 6 + (i % 3) * 2 AS h
           FROM range(0, 40) t(i)),
px AS (
  SELECT a.asset_id, a.h, ry.y, rx.x, rc.c,
         (ry.y * 9 + rx.x + a.asset_id) % a.k AS j
  FROM a, range(0, 10) ry(y), range(0, 9) rx(x), range(0, 3) rc(c)
  WHERE ry.y < a.h),
pv AS (
  SELECT asset_id, h, y, x, c,
         CASE c
           WHEN 0 THEN (asset_id * 13 + j * 29) % 256
           WHEN 1 THEN (asset_id * 7 + j * 41) % 256
           ELSE (asset_id * 3 + j * 53) % 256
         END AS v
  FROM px)
SELECT asset_id, CAST(9 AS INT) AS width, CAST(MAX(h) AS INT) AS height,
       CAST(SUM(v) AS BIGINT) AS pix_sum,
       CAST(SUM(v * (y*9*3 + x*3 + c + 1)) AS BIGINT) AS pos_digest
FROM pv GROUP BY asset_id
"""


def q_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode + frame sampling, value-checked (functions/
    codecs.py encode_avi/decode_avi/sample_video_frames — uncompressed
    RIFF-AVI with DIB frames, the video member of the uncompressed-
    workhorse tier beside PPM/WAV): per asset, flat frames whose fill is
    a pure function of (asset_id, frame_idx) are packed into an AVI at
    an id-derived fps, sampled every 500 ms with the REAL decoder, and
    each sampled frame's PPM payload is decoded back to its fill. The
    oracle replays the sampling arithmetic (step = fps div 2) and fill
    formula over a range cross product — frame misalignment, fps
    parsing, row order, or BGR/RGB swaps all shift values."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.codecs import (
        decode_ppm,
        encode_avi,
        sample_video_frames,
    )

    base = _asset_base(spark, 40)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                fps = 5 + i % 3
                nf = 8 + (i % 5) * 2
                h = 8 + (i % 2) * 4
                frames = np.stack(
                    [
                        np.full((h, 12, 3), (i * 31 + f * 7) % 256, np.uint8)
                        for f in range(nf)
                    ]
                )
                rows.append(
                    {"asset_id": i, "content": encode_avi(frames, fps=fps)}
                )
            yield pd.DataFrame(rows)

    assets = base.mapInPandas(gen, "asset_id long, content binary")
    sampled = sample_video_frames(assets, every_ms=500)

    def feat(batches):
        for pdf in batches:
            rows = []
            for aid, fi, ts, blob in zip(
                pdf["asset_id"], pdf["frame_idx"], pdf["ts_ms"], pdf["content"]
            ):
                arr = decode_ppm(bytes(blob))
                rows.append(
                    {
                        "asset_id": int(aid), "frame_idx": int(fi),
                        "ts_ms": int(ts), "height": arr.shape[0],
                        "width": arr.shape[1], "fill": int(arr[0, 0, 0]),
                        "uniform": bool((arr == arr[0, 0, 0]).all()),
                    }
                )
            yield pd.DataFrame(rows)

    return sampled.mapInPandas(
        feat,
        "asset_id long, frame_idx int, ts_ms long, height int, width int, "
        "fill int, uniform boolean",
    )


ORACLE_VIDEO_DECODE = """
WITH a AS (
  SELECT i AS asset_id, 5 + i % 3 AS fps, 8 + (i % 5) * 2 AS nf,
         8 + (i % 2) * 4 AS h
  FROM range(0, 40) t(i)),
fr AS (
  SELECT a.asset_id, a.fps, a.h, f.f
  FROM a, range(0, 16) f(f)
  WHERE f.f < a.nf AND f.f % GREATEST(1, a.fps // 2) = 0)
SELECT asset_id, CAST(f AS INT) AS frame_idx,
       CAST(f * 1000 // fps AS BIGINT) AS ts_ms,
       CAST(h AS INT) AS height, CAST(12 AS INT) AS width,
       CAST((asset_id * 31 + f * 7) % 256 AS INT) AS fill,
       TRUE AS uniform
FROM fr
"""


def q_video_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-video decode, value-checked: Motion-JPEG AVI
    (functions/codecs.py encode_avi(codec='MJPG') — per-frame baseline
    JPEGs in '00dc' chunks — composed with the functions/jpeg.py T.81
    codec). Per asset, 16x16 flat RGB frames whose fills reuse
    jpeg_decode's 48 margin-verified q90 triples (j = (id*31 + f*7) % 48
    → the (j*37, j*59+11, j*83+29) % 256 channels; flat blocks are
    DC-only so quantization error ≤ 3/16 < 0.5 and the lossy roundtrip
    is EXACT) are MJPG-packed at an id-derived fps and sampled every
    500 ms by the STREAMING chunk walk (only sampled frames decode).
    The oracle replays the sampling grid and fill arithmetic — container
    framing, per-frame JPEG decode, fps parsing, and the sampling step
    are all value-hash-checked."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.codecs import (
        decode_ppm,
        encode_avi,
        sample_video_frames,
    )

    base = _asset_base(spark, 36)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                fps = 4 + i % 3
                nf = 6 + (i % 4) * 2
                frames = []
                for f in range(nf):
                    j = (i * 31 + f * 7) % 48
                    r, g, b = (
                        (j * 37) % 256, (j * 59 + 11) % 256, (j * 83 + 29) % 256,
                    )
                    frames.append(
                        np.dstack(
                            [np.full((16, 16), v, np.uint8) for v in (r, g, b)]
                        )
                    )
                rows.append(
                    {
                        "asset_id": i,
                        "content": encode_avi(
                            np.stack(frames), fps=fps, codec="MJPG", quality=90
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    assets = base.mapInPandas(gen, "asset_id long, content binary")
    sampled = sample_video_frames(assets, every_ms=500)

    def feat(batches):
        for pdf in batches:
            rows = []
            for aid, fi, ts, blob in zip(
                pdf["asset_id"], pdf["frame_idx"], pdf["ts_ms"], pdf["content"]
            ):
                arr = decode_ppm(bytes(blob))
                rows.append(
                    {
                        "asset_id": int(aid), "frame_idx": int(fi),
                        "ts_ms": int(ts), "width": arr.shape[1],
                        "height": arr.shape[0],
                        "uniform": bool((arr == arr[0, 0]).all()),
                        "r": int(arr[0, 0, 0]), "g": int(arr[0, 0, 1]),
                        "b": int(arr[0, 0, 2]),
                    }
                )
            yield pd.DataFrame(rows)

    return sampled.mapInPandas(
        feat,
        "asset_id long, frame_idx int, ts_ms long, width int, height int, "
        "uniform boolean, r int, g int, b int",
    )


ORACLE_VIDEO_MJPEG = """
WITH a AS (
  SELECT i AS asset_id, 4 + i % 3 AS fps, 6 + (i % 4) * 2 AS nf
  FROM range(0, 36) t(i)),
fr AS (
  SELECT a.asset_id, a.fps, f.f,
         (a.asset_id * 31 + f.f * 7) % 48 AS j
  FROM a, range(0, 12) f(f)
  WHERE f.f < a.nf AND f.f % GREATEST(1, a.fps * 500 // 1000) = 0)
SELECT asset_id, CAST(f AS INT) AS frame_idx,
       CAST(f * 1000 // fps AS BIGINT) AS ts_ms,
       CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       TRUE AS uniform,
       CAST((j * 37) % 256 AS INT) AS r,
       CAST((j * 59 + 11) % 256 AS INT) AS g,
       CAST((j * 83 + 29) % 256 AS INT) AS b
FROM fr
"""


def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, value-checked (functions/codecs.py): square-wave
    WAV-PCM assets generated from asset_id arithmetic (amplitude A,
    frame count, 8 kHz), written through the stdlib wave writer and parsed
    back by the hand-built RIFF decoder. A ±A square wave has rms exactly
    A and peak exactly A, and duration is frames/8 ms — all analytically
    computable by the oracle over range(n), so the decode path (chunk
    walk, sample width, channel reshape) is value-hash-checked without
    DuckDB ever touching a WAV byte."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.codecs import audio_features, encode_wav

    base = _asset_base(spark, 48)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                a = 1000 + (int(aid) % 7) * 100
                frames = 4000 + (int(aid) % 5) * 400
                wave = np.empty(frames, dtype=np.int16)
                wave[0::2] = a
                wave[1::2] = -a
                rows.append(
                    {"asset_id": int(aid), "content": encode_wav(wave, 8000)}
                )
            yield pd.DataFrame(rows)

    assets = base.mapInPandas(gen, "asset_id long, content binary")
    return audio_features(assets).select(
        "asset_id", "sample_rate", "channels", "n_frames", "duration_ms",
        "rms", "peak",
    )


ORACLE_AUDIO_DECODE = """
SELECT i AS asset_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS channels,
       CAST(4000 + (i % 5) * 400 AS BIGINT) AS n_frames,
       CAST((4000 + (i % 5) * 400) / 8 AS BIGINT) AS duration_ms,
       CAST(1000 + (i % 7) * 100 AS DOUBLE) AS rms,
       CAST(1000 + (i % 7) * 100 AS INT) AS peak
FROM range(0, 48) t(i)
"""


def q_audio_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL G.711 companded audio (functions/audio.py — vectorized CCITT
    μ-law/A-law, pinned bit-exact against CPython's audioop in tests),
    value-checked end-to-end THROUGH the WAV container: per asset, 200
    non-negative samples x_j = (i*31 + j*17) % 8000 are μ-law (even
    assets) or A-law (odd) encoded into fmt-7/6 RIFF bytes executor-side
    and decoded back by decode_wav_ex; output is the sum and a
    position-weighted digest of the decoded int16 samples. The oracle
    RE-DERIVES the companding curves in SQL (segment CASE + bit ops) —
    an independent reimplementation of the spec, so any defect in the
    segment search, mantissa math, bias, or the RIFF fmt-6/7 framing
    breaks the value hash."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.audio import encode_wav_g711
    from scio_spark.functions.codecs import decode_wav_ex

    base = _asset_base(spark, 64)
    j = np.arange(200, dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                x = ((i * 31 + j * 17) % 8000).astype(np.int16)
                law = "ulaw" if i % 2 == 0 else "alaw"
                sr, arr, codec = decode_wav_ex(encode_wav_g711(x, 8000, law))
                s = arr[:, 0].astype(np.int64)
                rows.append(
                    {
                        "asset_id": i, "codec": codec,
                        "sample_rate": sr, "n_samples": int(s.size),
                        "sample_sum": int(s.sum()),
                        "digest": int((s * (j + 1)).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, codec string, sample_rate int, n_samples int, "
        "sample_sum long, digest long",
    )


ORACLE_AUDIO_G711 = """
WITH s AS (
  SELECT i, j, (i * 31 + j * 17) % 8000 AS x
  FROM range(0, 64) t(i) CROSS JOIN range(0, 200) u(j)
),
enc AS (
  SELECT i, j,
         CASE WHEN i % 2 = 0 THEN LEAST(x >> 2, 8159) + 33
              ELSE x >> 3 END AS v
  FROM s
),
seg AS (
  SELECT i, j, v,
         CASE WHEN i % 2 = 0 THEN
           CASE WHEN v <= 63 THEN 0 WHEN v <= 127 THEN 1
                WHEN v <= 255 THEN 2 WHEN v <= 511 THEN 3
                WHEN v <= 1023 THEN 4 WHEN v <= 2047 THEN 5
                WHEN v <= 4095 THEN 6 ELSE 7 END
         ELSE
           CASE WHEN v <= 31 THEN 0 WHEN v <= 63 THEN 1
                WHEN v <= 127 THEN 2 WHEN v <= 255 THEN 3
                WHEN v <= 511 THEN 4 WHEN v <= 1023 THEN 5
                WHEN v <= 2047 THEN 6 ELSE 7 END
         END AS e
  FROM enc
),
val AS (
  SELECT i, j,
         CASE WHEN i % 2 = 0 THEN
           (((((v >> (e + 1)) & 15) << 3) + 132) << e) - 132
         ELSE
           CASE WHEN e = 0
                THEN (((v >> 1) & 15) << 4) + 8
                ELSE ((((v >> e) & 15) << 4) + 264) << (e - 1) END
         END AS d
  FROM seg
)
SELECT i AS asset_id,
       CASE WHEN i % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS codec,
       CAST(8000 AS INT) AS sample_rate,
       CAST(200 AS INT) AS n_samples,
       CAST(SUM(d) AS BIGINT) AS sample_sum,
       CAST(SUM(d * (j + 1)) AS BIGINT) AS digest
FROM val GROUP BY i
"""


def q_audio_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMA/DVI ADPCM WAV (format tag 0x11; functions/audio.py — block
    headers + 4-bit adaptive codes, nibble core pinned bit-exact vs
    audioop in tests), VALUE-EXACT end to end: per asset (stereo when
    i%4==3) samples x(ch, j) = ((i*53 + t*t) % 4001) - 2000 with
    t = j + 7*ch fill EXACTLY 2/3/4 full 505-sample blocks, go through
    encode_wav_adpcm → RIFF → decode_wav_ex, and come back as a
    position-weighted digest. The oracle RE-DERIVES the whole
    encode-decode recurrence in SQL: because the encoder tracks the
    decoder's reconstruction, the roundtrip output is a single
    recurrence in (predictor, step index) with block-start resets
    (predictor := first sample, step index := 0 — the vectorized
    encoder seeds every block's header independently) — expressed as a
    DuckDB recursive CTE over the literal 89-entry step table. Any defect in the quantizer, the reconstruction, the index
    walk, the block framing, or the stereo nibble interleave breaks the
    value hash."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.audio import encode_wav_adpcm
    from scio_spark.functions.codecs import decode_wav_ex

    base = _asset_base(spark, 48)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                n = 505 * (2 + i % 3)
                j = np.arange(n, dtype=np.int64)
                stereo = i % 4 == 3
                chans = [(((i * 53 + j * j) % 4001) - 2000)]
                if stereo:
                    t = j + 7
                    chans.append(((i * 53 + t * t) % 4001) - 2000)
                x = np.stack(chans, axis=1).astype(np.int16)
                x = x[:, 0] if not stereo else x
                sr, arr, codec = decode_wav_ex(encode_wav_adpcm(x, 8000))
                s = arr.astype(np.int64)
                w = (j + 1)[:, None] * (np.arange(s.shape[1]) * 2 + 1)
                rows.append(
                    {
                        "asset_id": i, "codec": codec, "sample_rate": sr,
                        "channels": int(s.shape[1]),
                        "n_frames": int(s.shape[0]),
                        "sample_sum": int(s.sum()),
                        "digest": int((s * w).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, codec string, sample_rate int, channels int, "
        "n_frames long, sample_sum long, digest long",
    )


# The IMA step table as a SQL literal (ISO/IMA spec data — deliberately
# transcribed here rather than imported from functions/audio.py, so the
# oracle does not share the implementation's table object).
_IMA_STEP_SQL = ",".join(
    f"({k},{v})"
    for k, v in enumerate(
        [
            7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
            34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
            143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
            449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
            1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
            3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
            9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
            22385, 24623, 27086, 29794, 32767,
        ]
    )
)

ORACLE_AUDIO_ADPCM = f"""
WITH RECURSIVE
steptab(si, sv) AS (VALUES {_IMA_STEP_SQL}),
lanes AS (
  SELECT i, ch FROM range(0, 48) t(i) CROSS JOIN range(0, 2) c(ch)
  WHERE ch = 0 OR i % 4 = 3
),
s AS (
  SELECT l.i, l.ch, j,
         ((l.i * 53 + (j + 7 * l.ch) * (j + 7 * l.ch)) % 4001) - 2000 AS x
  FROM lanes l CROSS JOIN range(0, 2020) u(j)
  WHERE j < 505 * (2 + l.i % 3)
),
rec(i, ch, j, pred, sidx) AS (
  SELECT i, ch, 0, x, 0 FROM s WHERE j = 0
  UNION ALL
  SELECT s.i, s.ch, s.j,
    CASE WHEN s.j % 505 = 0 THEN s.x ELSE
      GREATEST(-32768, LEAST(32767,
        r.pred + CASE WHEN s.x - r.pred < 0 THEN -1 ELSE 1 END * (
          (st.sv >> 3)
          + CASE WHEN (CASE WHEN ABS(s.x - r.pred) >= st.sv
                       THEN ABS(s.x - r.pred) - st.sv
                       ELSE ABS(s.x - r.pred) END) >= (st.sv >> 1)
                 THEN st.sv >> 1 ELSE 0 END
          + CASE WHEN (
              (CASE WHEN ABS(s.x - r.pred) >= st.sv
                    THEN ABS(s.x - r.pred) - st.sv
                    ELSE ABS(s.x - r.pred) END)
              - (CASE WHEN (CASE WHEN ABS(s.x - r.pred) >= st.sv
                            THEN ABS(s.x - r.pred) - st.sv
                            ELSE ABS(s.x - r.pred) END) >= (st.sv >> 1)
                      THEN st.sv >> 1 ELSE 0 END)
            ) >= (st.sv >> 2) THEN st.sv >> 2 ELSE 0 END
          + CASE WHEN ABS(s.x - r.pred) >= st.sv THEN st.sv ELSE 0 END
        )))
    END,
    CASE WHEN s.j % 505 = 0 THEN 0 ELSE
      GREATEST(0, LEAST(88, r.sidx +
        CASE (CASE WHEN ABS(s.x - r.pred) >= st.sv THEN 4 ELSE 0 END
            + CASE WHEN (CASE WHEN ABS(s.x - r.pred) >= st.sv
                         THEN ABS(s.x - r.pred) - st.sv
                         ELSE ABS(s.x - r.pred) END) >= (st.sv >> 1)
                   THEN 2 ELSE 0 END
            + CASE WHEN (
                (CASE WHEN ABS(s.x - r.pred) >= st.sv
                      THEN ABS(s.x - r.pred) - st.sv
                      ELSE ABS(s.x - r.pred) END)
                - (CASE WHEN (CASE WHEN ABS(s.x - r.pred) >= st.sv
                              THEN ABS(s.x - r.pred) - st.sv
                              ELSE ABS(s.x - r.pred) END) >= (st.sv >> 1)
                        THEN st.sv >> 1 ELSE 0 END)
              ) >= (st.sv >> 2) THEN 1 ELSE 0 END)
          WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1 WHEN 3 THEN -1
          WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6 ELSE 8 END))
    END
  FROM rec r
  JOIN s ON s.i = r.i AND s.ch = r.ch AND s.j = r.j + 1
  JOIN steptab st ON st.si = r.sidx
)
SELECT i AS asset_id, 'ima_adpcm' AS codec,
       CAST(8000 AS INT) AS sample_rate,
       CAST(CASE WHEN i % 4 = 3 THEN 2 ELSE 1 END AS INT) AS channels,
       CAST(505 * (2 + i % 3) AS BIGINT) AS n_frames,
       CAST(SUM(pred) AS BIGINT) AS sample_sum,
       CAST(SUM(pred * (j + 1) * (ch * 2 + 1)) AS BIGINT) AS digest
FROM rec GROUP BY i
"""


def q_audio_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC lossless audio (functions/flac.py — pure-Python frame
    algebra: FIXED/CONSTANT/VERBATIM subframes, Rice residuals, CRC-8/16,
    STREAMINFO MD5). FLAC is LOSSLESS, so the oracle is exact: per asset
    the samples x_j = ((i*53 + j*j) % 4001) - 2000 (deliberately
    nonlinear so FIXED predictors leave real residuals) are FLAC-encoded
    executor-side, decoded back, and digested as sum + position-weighted
    sum; compression must also beat raw PCM (compressed=TRUE) so the
    encoder can't cheat with VERBATIM-only streams. The SQL replays the
    sample arithmetic directly — any defect in Rice coding, predictor
    integration, framing, or CRC handling breaks the hash. Multi-frame:
    n=1500 at blocksize 512 → 3 frames per asset."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.flac import decode_flac, encode_flac

    base = _asset_base(spark, 48)
    j = np.arange(1500, dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                x = (((i * 53 + j * j) % 4001) - 2000).astype(np.int16)
                blob = encode_flac(x, 16000, blocksize=512)
                sr, back = decode_flac(blob)
                s = back[:, 0].astype(np.int64)
                rows.append(
                    {
                        "asset_id": i, "sample_rate": sr,
                        "n_samples": int(s.size),
                        "sample_sum": int(s.sum()),
                        "digest": int((s * (j + 1)).sum()),
                        "compressed": bool(len(blob) < x.size * 2),
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, sample_rate int, n_samples int, sample_sum long, "
        "digest long, compressed boolean",
    )


ORACLE_AUDIO_FLAC = """
WITH s AS (
  SELECT i, j, ((i * 53 + j * j) % 4001) - 2000 AS x
  FROM range(0, 48) t(i) CROSS JOIN range(0, 1500) u(j)
)
SELECT i AS asset_id,
       CAST(16000 AS INT) AS sample_rate,
       CAST(1500 AS INT) AS n_samples,
       CAST(SUM(x) AS BIGINT) AS sample_sum,
       CAST(SUM(x * (j + 1)) AS BIGINT) AS digest,
       TRUE AS compressed
FROM s GROUP BY i
"""


def q_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode (functions/tiff.py — TIFF 6.0 strip layout,
    pure Python): per asset an id-derived gradient pix(y,x) =
    (y*(3+i%5) + x*7 + i) % 256 (gray for even assets, RGB with
    per-channel offsets for odd) is encoded with the compression the
    asset id selects — none / PackBits / LZW / LZW+predictor — split
    into 4-row strips, and decoded back to an integer sum + position-
    weighted digest. The oracle replays the pixel arithmetic: a wrong
    IFD walk, strip split, LZW width bump, predictor integration, or
    byte order breaks the value hash."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.tiff import decode_tiff, encode_tiff

    base = _asset_base(spark, 40)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                h, w = 10 + (i % 3) * 2, 13
                y, x = np.mgrid[0:h, 0:w]
                g = (y * (3 + i % 5) + x * 7 + i) % 256
                if i % 2:
                    img = np.dstack(
                        [g, (g + 85) % 256, (g + 170) % 256]
                    ).astype(np.uint8)
                else:
                    img = g.astype(np.uint8)
                comp = ("none", "packbits", "lzw", "lzw")[i % 4]
                blob = encode_tiff(
                    img, compression=comp, rows_per_strip=4,
                    predictor=(i % 4 == 3),
                )
                out = decode_tiff(blob).astype(np.int64)
                flat = out.reshape(-1)
                rows.append(
                    {
                        "asset_id": i,
                        "width": int(out.shape[1]),
                        "height": int(out.shape[0]),
                        "channels": 3 if i % 2 else 1,
                        "pix_sum": int(flat.sum()),
                        "digest": int(
                            (flat * (np.arange(flat.size) + 1)).sum()
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, width int, height int, channels int, "
        "pix_sum long, digest long",
    )


ORACLE_TIFF_DECODE = """
WITH px AS (
  SELECT i, y, x, c,
         CASE WHEN i % 2 = 1
              THEN (y * (3 + i % 5) + x * 7 + i + c * 85) % 256
              ELSE (y * (3 + i % 5) + x * 7 + i) % 256 END AS v,
         (y * 13 + x) * (CASE WHEN i % 2 = 1 THEN 3 ELSE 1 END) + c + 1
           AS pos
  FROM range(0, 40) t(i)
  CROSS JOIN range(0, 14) ty(y)
  CROSS JOIN range(0, 13) tx(x)
  CROSS JOIN range(0, 3) tc(c)
  WHERE y < 10 + (i % 3) * 2 AND (c = 0 OR i % 2 = 1)
)
SELECT i AS asset_id,
       CAST(13 AS INT) AS width,
       CAST(10 + (i % 3) * 2 AS INT) AS height,
       CAST(CASE WHEN i % 2 = 1 THEN 3 ELSE 1 END AS INT) AS channels,
       CAST(SUM(v) AS BIGINT) AS pix_sum,
       CAST(SUM(v * pos) AS BIGINT) AS digest
FROM px GROUP BY i
"""


def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio corpus normalization (functions/audio.py resample_linear +
    resample_audio): per asset an arithmetic signal x_j = ((i*37 +
    j*11) % 3000) - 1500 at 8 kHz is PCM-encoded, resampled THROUGH the
    Spark surface (decode → linear interpolation on the center-aligned
    grid → PCM16 WAV re-encode) to 16 kHz (even assets) or 6 kHz (odd),
    decoded back, and digested. The oracle RE-DERIVES the interpolation
    in SQL — source position arithmetic, neighbor clamp, fractional
    blend, floor(+0.5) rounding — so a wrong grid convention or an
    off-by-one at the edges breaks the value hash."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.audio import resample_audio
    from scio_spark.functions.codecs import decode_wav_ex, encode_wav

    base = _asset_base(spark, 32)
    n = 400

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                j = np.arange(n, dtype=np.int64)
                x = (((i * 37 + j * 11) % 3000) - 1500).astype(np.int16)
                rows.append({"asset_id": i, "content": encode_wav(x, 8000)})
            yield pd.DataFrame(rows)

    assets = base.mapInPandas(gen, "asset_id long, content binary")

    def post(batches):
        for pdf in batches:
            rows = []
            for aid, blob, sr in zip(
                pdf["asset_id"], pdf["content"], pdf["sample_rate"]
            ):
                _, arr, _ = decode_wav_ex(bytes(blob))
                s = arr[:, 0].astype(np.int64)
                k = np.arange(s.size, dtype=np.int64)
                rows.append(
                    {
                        "asset_id": int(aid), "sample_rate": int(sr),
                        "n_samples": int(s.size),
                        "digest": int((s * (k + 1)).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    even = resample_audio(assets.filter("asset_id % 2 = 0"), 16000)
    odd = resample_audio(assets.filter("asset_id % 2 = 1"), 6000)
    return even.unionByName(odd).mapInPandas(
        post, "asset_id long, sample_rate int, n_samples int, digest long"
    )


ORACLE_AUDIO_RESAMPLE = """
WITH p AS (
  SELECT i, CASE WHEN i % 2 = 0 THEN 800 ELSE 300 END AS m
  FROM range(0, 32) t(i)
),
grid AS (
  SELECT p.i, p.m, k,
         (k + 0.5) * 400 / p.m - 0.5 AS pos
  FROM p CROSS JOIN range(0, 800) u(k)
  WHERE k < p.m
),
interp AS (
  SELECT i, m, k,
         GREATEST(0, LEAST(399, CAST(FLOOR(pos) AS BIGINT))) AS i0,
         LEAST(GREATEST(0, LEAST(399, CAST(FLOOR(pos) AS BIGINT))) + 1, 399) AS i1,
         GREATEST(0.0, LEAST(1.0,
           pos - GREATEST(0, LEAST(399, CAST(FLOOR(pos) AS BIGINT))))) AS frac
  FROM grid
),
vals AS (
  SELECT i, m, k,
         FLOOR(
           (((i * 37 + i0 * 11) % 3000) - 1500) * (1.0 - frac)
           + (((i * 37 + i1 * 11) % 3000) - 1500) * frac + 0.5
         ) AS v
  FROM interp
)
SELECT i AS asset_id,
       CAST(CASE WHEN i % 2 = 0 THEN 16000 ELSE 6000 END AS INT)
         AS sample_rate,
       CAST(m AS INT) AS n_samples,
       CAST(SUM(v * (k + 1)) AS BIGINT) AS digest
FROM vals GROUP BY i, m
"""


def q_video_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video metadata probe (codecs.video_features — AVI header/chunk
    walk, NO pixel decode, the video analog of the MP3 probe): per
    asset an AVI with id-derived geometry/fps/frame-count (DIB or MJPG,
    audio track on every third asset) is assembled executor-side and
    probed back. The oracle replays the arithmetic — wrong chunk walk,
    fps math, or stream detection breaks the hash."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.codecs import encode_avi, video_features

    base = _asset_base(spark, 40)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                nf = 2 + i % 4
                w = 8 * (1 + i % 3)
                fps = 5 + i % 6
                frames = np.full((nf, 8, w, 3), (i * 31) % 256, np.uint8)
                audio = (
                    np.zeros(200 + i, np.int16) if i % 3 == 0 else None
                )
                rows.append(
                    {
                        "asset_id": i,
                        "content": encode_avi(
                            frames,
                            fps=fps,
                            codec="MJPG" if i % 2 else "DIB",
                            audio=audio,
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    assets = base.mapInPandas(gen, "asset_id long, content binary")
    return video_features(assets).select(
        "asset_id", "width", "height", "fps", "n_frames", "duration_ms",
        "codec", "has_audio",
    )


ORACLE_VIDEO_PROBE = """
SELECT i AS asset_id,
       CAST(8 * (1 + i % 3) AS INT) AS width,
       CAST(8 AS INT) AS height,
       CAST(5 + i % 6 AS INT) AS fps,
       CAST(2 + i % 4 AS INT) AS n_frames,
       CAST(((2 + i % 4) * 1000) // (5 + i % 6) AS BIGINT) AS duration_ms,
       CASE WHEN i % 2 = 1 THEN 'MJPG' ELSE 'DIB' END AS codec,
       i % 3 = 0 AS has_audio
FROM range(0, 40) t(i)
"""


def q_avi_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVI audio-track extraction (codecs.extract_avi_audio): PCM16
    samples x_j = ((i*29 + j*13) % 5000) - 2500 ride an A/V AVI as
    interleaved '01wb' chunks next to MJPG video and come back EXACTLY
    (PCM is lossless through the WAVEFORMATEX reuse). The oracle
    replays the sample arithmetic; a wrong stream number, chunk order,
    or fmt hand-off breaks the digest."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.codecs import encode_avi, extract_avi_audio

    base = _asset_base(spark, 32)

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                n = 600 + 100 * (i % 4)
                j = np.arange(n, dtype=np.int64)
                x = (((i * 29 + j * 13) % 5000) - 2500).astype(np.int16)
                frames = np.full((3, 8, 8, 3), (i * 7) % 256, np.uint8)
                blob = encode_avi(
                    frames, fps=10, codec="MJPG", audio=x, audio_rate=8000
                )
                sr, arr, codec = extract_avi_audio(blob)
                s = arr[:, 0].astype(np.int64)
                rows.append(
                    {
                        "asset_id": i, "sample_rate": sr, "codec": codec,
                        "n_samples": int(s.size),
                        "digest": int((s * (j + 1)).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, sample_rate int, codec string, n_samples int, "
        "digest long",
    )


ORACLE_AVI_AUDIO = """
WITH s AS (
  SELECT i, j, ((i * 29 + j * 13) % 5000) - 2500 AS x
  FROM range(0, 32) t(i) CROSS JOIN range(0, 900) u(j)
  WHERE j < 600 + 100 * (i % 4)
)
SELECT i AS asset_id, CAST(8000 AS INT) AS sample_rate,
       'pcm16' AS codec,
       CAST(600 + 100 * (i % 4) AS INT) AS n_samples,
       CAST(SUM(x * (j + 1)) AS BIGINT) AS digest
FROM s GROUP BY i
"""


def q_audio_mp3_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 metadata probe (functions/audio.py probe_mp3 — ISO 11172-3
    frame-header walk; sample decode needs a polyphase filterbank and
    stays import-gated): per asset a synthetic MPEG-1 Layer III
    elementary stream with an id-derived (bitrate index, sample-rate
    index, frame count) is assembled executor-side from the spec's
    frame-length arithmetic and probed back. The oracle RE-DERIVES the
    ISO bitrate/sample-rate tables and the samples-per-frame duration
    math in SQL — a wrong table entry, a bad sync walk, or an
    off-by-one in the ID3v2 skip (odd assets get a tag prefix) breaks
    the value hash."""
    import struct as _struct

    import pandas as pd

    from scio_spark.functions.audio import probe_mp3

    base = _asset_base(spark, 60)
    kbps_tab = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    rate_tab = [44100, 48000, 32000]

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                bridx = 1 + i % 14
                sridx = i % 3
                nf = 20 + i % 11
                kbps, rate = kbps_tab[bridx], rate_tab[sridx]
                h = (
                    (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
                    | (bridx << 12) | (sridx << 10) | (3 << 6)
                )
                flen = 144 * kbps * 1000 // rate
                blob = (_struct.pack(">I", h) + bytes(flen - 4)) * nf
                if i % 2:  # half the assets carry an ID3v2 tag to skip
                    blob = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 11]) + bytes(11) + blob
                p = probe_mp3(blob)
                rows.append(
                    {
                        "asset_id": i,
                        "sample_rate": p["sample_rate"],
                        "bitrate_kbps": p["bitrate_kbps"],
                        "n_frames": p["n_frames"],
                        "duration_ms": p["duration_ms"],
                        "channels": p["channels"],
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "asset_id long, sample_rate int, bitrate_kbps int, n_frames int, "
        "duration_ms long, channels int",
    )


ORACLE_AUDIO_MP3_PROBE = """
WITH p AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS rate,
         CASE 1 + i % 14
           WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56
           WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
           WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
           WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END AS kbps,
         20 + i % 11 AS nf
  FROM range(0, 60) t(i)
)
SELECT i AS asset_id,
       CAST(rate AS INT) AS sample_rate,
       CAST(kbps AS INT) AS bitrate_kbps,
       CAST(nf AS INT) AS n_frames,
       CAST((nf * 1152 * 1000) // rate AS BIGINT) AS duration_ms,
       CAST(1 AS INT) AS channels
FROM p
"""


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout clustering (beyond-reference scale operator;
    functions/layout.py): events clustered along the Morton curve of
    (user_id, hour-of-ts) and rewritten, so parquet min/max footers prune
    point/range predicates on BOTH columns (measured vs a linear sort in
    tests/test_layout.py). The oracle pins losslessness: the clustered
    table must aggregate identically to the source."""
    import shutil

    from scio_spark.functions.layout import zorder_by

    path = _rt_path(sf_dir, "zorder_events")
    shutil.rmtree(path, ignore_errors=True)
    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df.withColumn(
        "hour", F.date_trunc("hour", "ts")
    )
    zorder_by(ev, ["user_id", "hour"], n_partitions=8).write.parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("user_id") % 1000).alias("checksum"),
    )


ORACLE_ZORDER_LAYOUT = """
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(user_id % 1000) AS BIGINT) AS checksum
FROM events GROUP BY event_type
"""


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance selection (Xie et al. 2023; functions/dsir.py):
    choose the 100 non-English documents whose hashed-unigram token
    distribution is most English-like — log-importance under two add-1
    smoothed bucket models (target = lang='en', raw = the rest), token
    log-ratios DECIMAL(28,6)-staged before the per-doc sum so partition
    order and libm ulps cannot move the ranking, deterministic top-k with
    id tie-break. Models are ≤8192-row broadcasts; scoring is one
    explode + broadcast join + one shuffle on doc_id."""
    from scio_spark.functions.dsir import dsir_select

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").df
    raw = d.filter("lang <> 'en'").select("doc_id", "lang", "text")
    target = d.filter("lang = 'en'").select("text")
    sel = dsir_select(raw, target, k=100, buckets=8192, mode="topk")
    return sel.join(raw.select("doc_id", "lang"), "doc_id").groupBy(
        "lang"
    ).agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )


ORACLE_DSIR_SELECT = r"""
WITH raw AS (
  SELECT doc_id, lang, text FROM documents WHERE lang <> 'en'
),
ttok AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                x -> x <> '')) AS token
  FROM documents WHERE lang = 'en'
),
tb AS (
  SELECT CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) % 8192 AS bucket
  FROM ttok
),
tcnt AS (SELECT bucket, COUNT(*) AS cnt FROM tb GROUP BY bucket),
tn AS (SELECT SUM(cnt) AS n FROM tcnt),
rtok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                x -> x <> '')) AS token
  FROM raw
),
rb AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) % 8192 AS bucket
  FROM rtok
),
rcnt AS (SELECT bucket, COUNT(*) AS cnt FROM rb GROUP BY bucket),
rn AS (SELECT SUM(cnt) AS n FROM rcnt),
ratio AS (
  SELECT COALESCE(t.bucket, r.bucket) AS bucket,
         CAST(COALESCE(LOG2((t.cnt + 1) / CAST(tn.n + 8192 AS DOUBLE)),
                       LOG2(1.0 / (tn.n + 8192)))
            - COALESCE(LOG2((r.cnt + 1) / CAST(rn.n + 8192 AS DOUBLE)),
                       LOG2(1.0 / (rn.n + 8192)))
           AS DECIMAL(28,6)) AS lr
  FROM tcnt t FULL OUTER JOIN rcnt r ON t.bucket = r.bucket
  CROSS JOIN tn CROSS JOIN rn
),
w AS (
  SELECT rb.doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(lr) AS DECIMAL(28,6)) AS log_w
  FROM rb JOIN ratio USING (bucket) GROUP BY rb.doc_id
),
sel AS (
  SELECT doc_id, n_tokens FROM w ORDER BY log_w DESC, doc_id LIMIT 100
)
SELECT lang, COUNT(*) AS n_selected,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM sel JOIN raw USING (doc_id) GROUP BY lang
"""


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing local fingerprints (Schleimer et al. 2003, the MOSS
    algorithm; functions/text.py winnow_fingerprints — beyond-reference
    member of the fingerprint/dedup family beside the token-sort md5 and
    rolling-hash keys): k=5 token grams, windows of w=4 hashes, rightmost
    minimum per window. Guarantees any shared >= 8-token run between two
    docs shares a fingerprint at ~2/(w+1) density. Per source: selected
    fingerprints, distinct hashes, position checksum, and how many
    selected fingerprints are shared with another document anywhere in
    the corpus. Entirely integer math over engine-portable md5-prefix
    hashes, so the whole pipeline replays exactly in SQL."""
    from scio_spark.functions.text import winnow_fingerprints

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").df.select("doc_id", "source", "text")
    # the fingerprint table feeds BOTH the shared-count aggregation and the
    # probe join (a diamond) — persist so the scan+explode runs once, not
    # twice (partial-agg vs probe exchanges differ, so ReuseExchange can't)
    fps = winnow_fingerprints(d, "doc_id", "text", k=5, w=4).persist()
    shared = fps.groupBy("fp").agg(F.countDistinct("doc_id").alias("nd"))
    enriched = fps.join(d.select("doc_id", "source"), "doc_id").join(
        shared, "fp"
    )
    return enriched.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.countDistinct("fp").alias("n_distinct_fps"),
        F.sum("pos").cast("long").alias("pos_checksum"),
        F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_shared_fps"),
    )


ORACLE_WINNOW_FINGERPRINTS = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
),
hs AS (
  SELECT doc_id, source,
         list_transform(generate_series(1, len(t) - 4),
           i -> CAST(('0x' || substr(md5(
                  array_to_string(list_slice(t, i, i + 4), chr(31))), 1, 12))
                AS BIGINT)) AS h
  FROM toks WHERE len(t) >= 8
),
f AS (
  SELECT doc_id, source,
         e - (list_min(list_transform(generate_series(0, 3),
               r -> h[e - r] * 4 + r)) % 4) AS pos,
         list_min(list_transform(generate_series(0, 3),
               r -> h[e - r] * 4 + r)) // 4 AS fp
  FROM hs, UNNEST(generate_series(4, len(h))) AS u(e)
),
d AS (SELECT DISTINCT doc_id, source, pos, fp FROM f),
sh AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM d GROUP BY fp)
SELECT source, COUNT(*) AS n_fps,
       COUNT(DISTINCT fp) AS n_distinct_fps,
       CAST(SUM(pos) AS BIGINT) AS pos_checksum,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_fps
FROM d JOIN sh USING (fp) GROUP BY source
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup — cluster-scoped semantic dedup over the embeddings table
    (Abbas et al. 2023; functions/semdedup.py; beyond-reference member of
    the dedup family beside MinHash/SimHash/embedding-LSH): assign every
    vector to its nearest of 8 deterministic centroids (the 8 smallest
    vec_ids — the oracle mode; production trains ivf k-means), then mark
    items having a smaller-id neighbor at cosine >= 0.45 WITHIN their
    cluster only — O(Σ cluster²) instead of O(n²). Decision margins on
    this corpus (nearest-centroid >= 4e-4, |cos-eps| >= 5e-4) sit many
    orders above float64 round-off, so the numpy-GEMM path replays
    exactly in DuckDB's list_cosine_similarity."""
    from scio_spark.functions.semdedup import (
        semantic_dedup,
        semantic_dedup_stats,
    )

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df.select("vec_id", "embedding")
    cents = [
        list(r.embedding) for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    marked = semantic_dedup(
        emb, "vec_id", "embedding", centroids=cents, eps=0.45
    )
    return semantic_dedup_stats(marked)


ORACLE_SEMANTIC_DEDUP = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
c2 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid) - 1 AS INTEGER) AS centroid,
         cv
  FROM c0
),
asg AS (
  SELECT vec_id, v, centroid,
         ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY list_cosine_similarity(v, cv) DESC, centroid) AS rk
  FROM e CROSS JOIN c2
),
a AS (SELECT vec_id, v, centroid FROM asg WHERE rk = 1),
d AS (
  SELECT a1.vec_id, a1.centroid,
         COALESCE(MAX(CASE WHEN list_cosine_similarity(a1.v, a2.v) >= 0.45
                           THEN 1 ELSE 0 END), 0) AS is_dup
  FROM a a1 LEFT JOIN a a2
    ON a1.centroid = a2.centroid AND a2.vec_id < a1.vec_id
  GROUP BY a1.vec_id, a1.centroid
)
SELECT centroid, COUNT(*) AS n_items,
       CAST(SUM(is_dup) AS BIGINT) AS n_dups,
       CAST(SUM(CASE WHEN is_dup = 1 THEN vec_id ELSE 0 END) AS BIGINT)
         AS dup_id_sum
FROM d GROUP BY centroid
"""


def q_discarding_panes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCARDING-mode windowed panes — ``discardingFiredPanes()`` with
    allowedLateness (scio streaming/package.scala:31-35; previously a
    documented §4.4.1 gap): streaming/core.py discarding_panes keys
    applyInPandasWithState by (event_type, hour window), each micro-batch
    emits only its delta, and event-time timeouts evict state once the
    watermark passes window end — Beam's exact bounded-state story.
    Values pre-scaled to integer cents so pane sums are engine-exact;
    single-batch input ⇒ one pane per (key, window) equal to the batch
    aggregation, so the DuckDB oracle applies. Multi-batch delta
    semantics are pinned in tests/test_streaming.py."""
    from scio_spark.streaming.core import (
        discarding_panes,
        ensure_event_time,
        run_to_memory,
    )

    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("TIMESTAMP_MICROS(ts DIV 1000)"))
    stream = ensure_event_time(stream, "ts").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    panes = discarding_panes(
        stream, "ts", "1 hour", "1 hour", ["event_type"], "cents"
    )
    out = panes.select(
        "event_type",
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "pane_index",
        "pane_value",
    )
    # min(width, 16) state stores (r16 re-adjudication of the r15-opt
    # width setting, which the driver measured 0.75×): fresh-session
    # interleaved A/B at 32 cores — 16 stores cold {6.02, 6.41, 6.54} s
    # vs 32 stores {5.42, 9.30, 15.84} (comparable best case,
    # catastrophic tail: per-store maintenance keeps growing with store
    # count while the ~3.6k (type, window) groups' Python work saturates
    # by 16 tasks) vs 8 stores {8.05, 8.27, 10.39}. Still scale-adaptive
    # downward (an 8-core run gets 8 stores, matching its scheduling
    # width); 16 is a capacity cap, not a local-mode constant — it goes
    # UP on a real cluster with state volume (~1 GB/store).
    return run_to_memory(
        out,
        output_mode="update",
        num_state_partitions=min(spark.sparkContext.defaultParallelism, 16),
    )


ORACLE_DISCARDING_PANES = """
SELECT event_type,
       time_bucket(INTERVAL '1 hour', ts) AS window_start,
       CAST(0 AS BIGINT) AS pane_index,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS pane_value
FROM events GROUP BY 1, 2
"""


def q_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup (functions/semdedup.py stage_semantic_index /
    incremental_semantic_dedup — the embedding sibling of the MinHash and
    ExactSubstr incremental indexes): vectors with vec_id < 400 are the
    staged historical corpus (centroid-partitioned index, frozen
    centroids), the rest arrive as today's batch and are marked reading
    ONLY the pruned cluster partitions. Because index ids precede batch
    ids, the batch marks equal a full rebuild's marks restricted to the
    batch (pinned in tests), so the oracle is the semantic_dedup SQL
    filtered to batch ids."""
    import tempfile

    from scio_spark.functions.semdedup import (
        incremental_semantic_dedup,
        semantic_dedup_stats,
        stage_semantic_index,
    )

    sc = _ctx(spark)
    emb = _t(sc, sf_dir, "embeddings").df.select("vec_id", "embedding")
    cents = [
        list(r.embedding) for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    hist = emb.filter("vec_id < 400")
    batch = emb.filter("vec_id >= 400")
    path = tempfile.mkdtemp(prefix="scio_spark_semidx_")
    stage_semantic_index(hist, "vec_id", "embedding", cents, path)
    marked = incremental_semantic_dedup(
        batch, path, "vec_id", "embedding", eps=0.45, append=False
    )
    return semantic_dedup_stats(marked)


ORACLE_SEMANTIC_DEDUP_INCREMENTAL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
c2 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid) - 1 AS INTEGER) AS centroid,
         cv
  FROM c0
),
asg AS (
  SELECT vec_id, v, centroid,
         ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY list_cosine_similarity(v, cv) DESC, centroid) AS rk
  FROM e CROSS JOIN c2
),
a AS (SELECT vec_id, v, centroid FROM asg WHERE rk = 1),
d AS (
  SELECT a1.vec_id, a1.centroid,
         COALESCE(MAX(CASE WHEN list_cosine_similarity(a1.v, a2.v) >= 0.45
                           THEN 1 ELSE 0 END), 0) AS is_dup
  FROM a a1 LEFT JOIN a a2
    ON a1.centroid = a2.centroid AND a2.vec_id < a1.vec_id
  WHERE a1.vec_id >= 400
  GROUP BY a1.vec_id, a1.centroid
)
SELECT centroid, COUNT(*) AS n_items,
       CAST(SUM(is_dup) AS BIGINT) AS n_dups,
       CAST(SUM(CASE WHEN is_dup = 1 THEN vec_id ELSE 0 END) AS BIGINT)
         AS dup_id_sum
FROM d GROUP BY centroid
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sample of exactly n (SCollection.scala:926;
    collection.py sample_weighted) in its row-stable mode: A-Res
    priorities u^(1/w) with u from a seeded md5 of the order key —
    deterministic under any partitioning and SQL-replayable (boundary
    gap at rank 200 is ~1e-9, six orders above cross-libm pow error).
    200 orders sampled proportional to o_totalprice; per-status counts +
    key/price checksums. Plan: TakeOrderedAndProject — per-partition
    heaps, no global sort."""
    sc = _ctx(spark)
    sampled = (
        _t(sc, sf_dir, "orders")
        .sample_weighted(200, "o_totalprice", seed=42, id_col="o_orderkey")
        .df
    )
    return sampled.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("o_orderkey").cast("long").alias("key_checksum"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )


ORACLE_WEIGHTED_SAMPLE = """
WITH pr AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         POWER((CAST(('0x' || substr(md5('42' || '|' ||
                     CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT)
                + 0.5) / 281474976710656.0,
               1.0 / CAST(o_totalprice AS DOUBLE)) AS p
  FROM orders
),
sel AS (SELECT * FROM pr ORDER BY p DESC LIMIT 200)
SELECT o_orderstatus, COUNT(*) AS n_sampled,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM sel GROUP BY o_orderstatus
"""


def q_quantiles_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable t-digest quantile sketch end-to-end (reference shape:
    scio's quantilesApprox / Algebird QTree monoid, SCollection.scala:834,
    as a storable+mergeable artifact — the sumHll pattern of
    scio-extra/.../hll/zetasketch; functions/tdigest.py). Pipeline: exact
    (value,count) histogram of l_quantity (one partial-agg'd shuffle) →
    per-partition WEIGHTED partial digests → driver merge → serialization
    round-trip (to_bytes/from_bytes pins the artifact codec) → quantile
    reads. Oracle-exactness argument: 50 distinct values each holding
    ≥1.8% mass, so under the k1 scale function (k-span ≤ 1 merges only
    below ~1.57% combined mass at delta=200) NO two distinct centroids
    ever merge — the digest is a lossless weighted histogram and its
    half-weight interpolation replays bit-exactly in SQL (same IEEE
    double operation order). At 100 TB only |partitions| ~3 KB sketch
    rows cross to the driver."""
    from scio_spark.functions.tdigest import TDigest, tdigest_sketch

    sc = _ctx(spark)
    hist = (
        _t(sc, sf_dir, "lineitem")
        .df.groupBy(F.col("l_quantity").cast("double").alias("v"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    td = tdigest_sketch(hist, "v", delta=200, weight_col="w")
    td = TDigest.from_bytes(td.to_bytes())  # pin the artifact codec
    row = tuple(
        [int(td.count)]
        + [td.quantile(q) for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)]
    )
    return spark.createDataFrame(
        [row],
        "n long, p10 double, p25 double, p50 double, "
        "p75 double, p90 double, p99 double",
    )


ORACLE_QUANTILES_TDIGEST = """
WITH hist AS (
  SELECT CAST(l_quantity AS DOUBLE) AS v, CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(w) AS n FROM hist),
cen AS (
  SELECT v, w,
         COALESCE(SUM(w) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + w / 2
           AS c
  FROM hist
),
cen2 AS (
  SELECT v, c,
         COALESCE(LAG(v) OVER (ORDER BY v), MIN(v) OVER ()) AS lo_x,
         COALESCE(LAG(c) OVER (ORDER BY v), 0) AS lo_c
  FROM cen
),
qs AS (
  SELECT * FROM (VALUES (10, 1e-1), (25, 2.5e-1), (50, 5e-1),
                        (75, 7.5e-1), (90, 9e-1), (99, 9.9e-1)) AS t(p, q)
),
hit AS (
  SELECT qs.p,
         lo_x + (qs.q * tot.n - lo_c) / (c - lo_c) * (v - lo_x) AS est,
         ROW_NUMBER() OVER (PARTITION BY qs.p ORDER BY v) AS rn
  FROM qs CROSS JOIN tot CROSS JOIN cen2
  WHERE qs.q * tot.n < c
)
SELECT CAST(tot.n AS BIGINT) AS n,
       MAX(CASE WHEN p = 10 THEN est END) AS p10,
       MAX(CASE WHEN p = 25 THEN est END) AS p25,
       MAX(CASE WHEN p = 50 THEN est END) AS p50,
       MAX(CASE WHEN p = 75 THEN est END) AS p75,
       MAX(CASE WHEN p = 90 THEN est END) AS p90,
       MAX(CASE WHEN p = 99 THEN est END) AS p99
FROM hit CROSS JOIN tot WHERE rn = 1 GROUP BY tot.n
"""


def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable BPE tokenizer end-to-end (beyond-reference text-analysis
    operator; functions/bpe.py): merges trained from the distributed word
    histogram (only the top-5k (word,count) rows reach the driver), then
    Arrow-batched subword encoding over all documents. The oracle-checked
    invariant is losslessness at corpus scale: re-joining each document's
    tokens and stripping end-of-word markers must reproduce the
    whitespace-normalized text, so sum(len(rebuilt)) per source equals the
    SQL-computable normalized length (any dropped/corrupted token breaks
    the hash). Segmentation itself is pinned to the published algorithm's
    worked example in tests/test_bpe.py."""
    from scio_spark.functions.bpe import END, bpe_tokenize, train_bpe

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").df.select("doc_id", "source", "text")
    merges = train_bpe(d, "text", n_merges=200, max_words=5000)
    toks = d.select(
        "source", bpe_tokenize(F.col("text"), merges).alias("toks")
    )
    rebuilt = toks.select(
        "source",
        F.expr(f"rtrim(replace(array_join(toks, ''), '{END}', ' '))").alias(
            "rebuilt"
        ),
    )
    return rebuilt.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("rebuilt")).alias("sum_rebuilt_chars"),
    )


ORACLE_BPE_SEGMENT = r"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(array_to_string(
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> ''), ' '))) AS BIGINT) AS sum_rebuilt_chars
FROM documents GROUP BY source
"""


def q_webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar-shard sink+source round-trip (beyond-reference
    multimodal training-data IO; sources/webdataset.py): documents become
    {doc_id}.txt/{doc_id}.cls members in per-task tar shards — the format
    the torch/webdataset loaders stream — then read back key-grouped and
    re-aggregated. Tar bytes come from stdlib tarfile; this query pins the
    distributed write→group→read path against the parquet truth."""
    from scio_spark.sources.webdataset import read_webdataset, save_as_webdataset

    path = _rt_path(sf_dir, "webdataset")
    sc = _ctx(spark)
    d = (
        _t(sc, sf_dir, "documents")
        .df.filter("doc_id % 9 = 0")
        .select(F.col("doc_id").cast("string").alias("key"), "text", "source")
    )
    save_as_webdataset(d, path, "key", {"text": "txt", "source": "cls"})
    back = read_webdataset(
        spark, path, {"text": "txt", "source": "cls"}, text_cols={"text", "source"}
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
    )


ORACLE_WEBDATASET_ROUNDTRIP = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(text)) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 9 = 0 GROUP BY source
"""


def q_streaming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time range condition (SURVEY
    §2.5; the Structured Streaming form of joining two windowed
    collections): clicks joined to the purchases that follow within 30
    minutes per user, both sides watermarked (state bounded by the
    interval). Single-batch input ⇒ the append-mode result equals the
    batch join, so the DuckDB oracle applies."""
    from scio_spark.streaming.core import ensure_event_time, run_to_memory

    def src():
        s = (
            spark.readStream.schema(
                spark.read.parquet(f"{sf_dir}/events.parquet").schema
            )
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        if dict(s.dtypes).get("ts") == "bigint":
            s = s.withColumn("ts", F.expr("TIMESTAMP_MICROS(ts DIV 1000)"))
        return ensure_event_time(s, "ts")

    clicks = (
        src()
        .filter("event_type = 'click'")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        src()
        .filter("event_type = 'purchase'")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 minutes")),
        "inner",
    )
    # 4 state stores (vs the session's 32) ~3x faster at this volume:
    # per-store maintenance dominates when state is small (A/B: 2.7 s at 4,
    # 3.0 at 8, 5.2 at 16 warm; re-A/B'd cold r16: 4 -> {3.99, 4.30, 4.60},
    # 2 -> {4.32, 4.33, 4.37}, 8 -> {4.80, 5.00, 5.69} — 4 and 2 tie, 8
    # loses, keep 4). Capacity knob — goes UP on a real cluster
    # (state_bytes / ~1 GB per store).
    pairs = run_to_memory(joined, output_mode="append", num_state_partitions=4)
    return pairs.groupBy(F.col("c_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


ORACLE_STREAMING_JOIN = """
SELECT c.user_id, COUNT(*) AS n_pairs
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
GROUP BY c.user_id
"""


def q_continuous_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained rollup table (streaming/core.maintain_rollup
    — the hypertable/continuous-aggregate pattern) driven across TWO
    micro-batches split mid-hour, so the boundary window is emitted in
    batch 1 and UPDATED in batch 2: the foreachBatch partition-swap upsert
    must merge, not overwrite. Final table == full batch aggregation, so
    the streaming_window oracle applies."""
    import shutil

    from scio_spark.streaming.core import ensure_event_time, maintain_rollup

    stage = _rt_path(sf_dir, "rollup_stage")
    table = _rt_path(sf_dir, "rollup_table")
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(table, ignore_errors=True)
    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    split = F.lit("2024-01-16 00:30:00").cast(dict(ev.dtypes)["ts"])
    # One staging pass instead of two filtered repartition(1) writes
    # (r16, VERDICT r15 item 6): a single scan + partitionBy("__b") write
    # lands one file per batch dir; the dirs are then renamed to the
    # batch_* names (no `=` — keeps the file stream clear of partition
    # inference) and the second batch's file mtime is bumped so
    # FileStreamSource's timestamp ordering processes batch 0 first —
    # the mid-hour boundary row MUST arrive before the update batch or
    # the watermark from batch 1 could drop batch 0's rows.
    import glob as _glob
    import os as _os
    import time as _time

    (
        ev.withColumn(
            "__b", F.when(F.col("ts") < split, 0).otherwise(1)
        )
        .repartition(2, "__b")
        .write.partitionBy("__b")
        .parquet(stage)
    )
    _os.rename(f"{stage}/__b=0", f"{stage}/batch_00000")
    _os.rename(f"{stage}/__b=1", f"{stage}/batch_00001")
    late = _time.time() + 60
    for f in _glob.glob(f"{stage}/batch_00001/*"):
        _os.utime(f, (late, late))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/batch_*")
    )
    stream = ensure_event_time(stream, "ts")
    q = maintain_rollup(
        stream, table, "ts", "1 hour", "1 hour",
        ["event_type"], [F.count(F.lit(1)).alias("n")],
        num_state_partitions=4,  # capacity knob (A/B: 3.4 s vs 3.7 at 8)
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(table)
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        F.col("n").cast("long").alias("n"),
    )


def q_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline — the flagship composition a training-
    data team actually runs, value-checked as ONE query: quality filter
    (with_quality_score ≥ 0.5) → exact dedup (min-id survivor per
    normalized-text group) → per-source corpus accounting (docs, tokens,
    decimal-staged quality mass). Every stage is an operator that is also
    individually oracle-checked (text_quality, dedup_exact, text_features);
    this pins that they COMPOSE correctly: the dedup runs on the filtered
    set, the accounting on the survivors."""
    from scio_spark.functions import dedup as D
    from scio_spark.functions import text as T

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").df
    q = T.with_quality_score(d, "text").filter(F.col("quality") >= 0.5)
    surv = D.exact_dedup(q, id_col="doc_id", text_col="text")
    return surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).alias("sum_tokens"),
        F.sum(F.col("quality").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_quality"),
    )


ORACLE_CURATION_E2E = r"""
WITH f AS (
  SELECT doc_id, source, text,
    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))
      AS n,
    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        t -> list_contains(['the','a','of','and','to','in','is','it'], lower(t)))) AS sw,
    len(regexp_replace(trim(text), '\s+', '', 'g')) AS chars_nospace,
    CASE WHEN len(text) = 0 THEN 0.0
         ELSE len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) / len(text) END AS pr
  FROM documents
), scored AS (
  SELECT doc_id, source, text, n,
    least(n / 200.0, 1.0) * 0.25
    + least((CASE WHEN n = 0 THEN 0.0 ELSE sw / n END) / 0.4, 1.0) * 0.35
    + (CASE WHEN (CASE WHEN n = 0 THEN 0.0 ELSE chars_nospace / n END) >= 3.0
             AND (CASE WHEN n = 0 THEN 0.0 ELSE chars_nospace / n END) <= 10.0
        THEN 1.0 ELSE 0.4 END) * 0.25
    + (1.0 - least(pr * 4.0, 1.0)) * 0.15 AS quality
  FROM f
), q AS (
  SELECT * FROM scored WHERE quality >= 0.5
), keepers AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h,
         MIN(doc_id) AS doc_id
  FROM q GROUP BY 1
), surv AS (
  SELECT q.* FROM q
  JOIN keepers k
    ON k.doc_id = q.doc_id
   AND k.h = md5(regexp_replace(lower(trim(q.text)), '\s+', ' ', 'g'))
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS sum_tokens,
       CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) AS sum_quality
FROM surv GROUP BY source
"""


def q_files_with_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readFilesWithPath provenance (FileSCollectionFunctions.scala /
    SCollection.scala:1372-1503 readFiles family): documents written to
    per-source text files (dynamic destinations layout), read back with
    input_file_name() provenance, source recovered FROM THE PATH and
    counted — value-exact against the original table's source column."""
    path = _rt_path(sf_dir, "bysource")
    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").df.select(
        F.col("text").alias("value"), "source"
    )
    d.write.mode("overwrite").partitionBy("source").text(path)
    back = sc.text_files_with_path(f"{path}/*/").df
    return (
        back.select(
            F.regexp_extract("path", r"source=([^/]+)/", 1).alias("source")
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


ORACLE_FILES_WITH_PATH = """
SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
"""


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style line-level dedup (functions/dedup.dedup_lines):
    sentence-units occurring in >5 distinct documents are cross-document
    boilerplate and get dropped; survivors reassemble in original order.
    The boilerplate set is broadcast anti-joined — the exploded corpus
    never shuffles on line content."""
    from scio_spark.functions.dedup import dedup_lines

    sc = _ctx(spark)
    d = _t(sc, sf_dir, "documents").df
    return dedup_lines(d, max_doc_freq=5)


ORACLE_DEDUP_LINES = """
WITH ls AS (
  SELECT doc_id, string_split(text, '. ') AS l FROM documents
), lines AS (
  SELECT doc_id, CAST(i AS INT) AS pos, l[CAST(i AS INT) + 1] AS line
  FROM ls, UNNEST(range(len(l))) AS u(i)
), boiler AS (
  SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) > 5
), kept AS (
  SELECT * FROM lines WHERE line NOT IN (SELECT line FROM boiler)
), agg AS (
  SELECT doc_id, string_agg(line, '. ' ORDER BY pos) AS text_clean,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.text_clean, '') AS text_clean,
       COALESCE(a.n_kept, 0) AS n_kept,
       len(string_split(d.text, '. ')) - COALESCE(a.n_kept, 0) AS n_removed
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_dynamic_destinations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic destinations round-trip (scio-core io/dynamic/: per-record
    output path from record fields → Spark-native partitionBy, hive-style
    layout). The read-back filter on the partition column is satisfied by
    directory pruning — no data files outside the matching partitions are
    touched."""
    from scio_spark.sources import formats as Fmt

    path = _rt_path(sf_dir, "dynamic")
    sc = _ctx(spark)
    sub = (
        _t(sc, sf_dir, "orders")
        .df.filter("o_orderkey % 16 = 0")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )
    Fmt.save_dynamic(sub, path, ["o_orderpriority"])
    back = spark.read.parquet(path).filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_total"),
    )


ORACLE_DYNAMIC_DESTINATIONS = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
FROM orders
WHERE o_orderkey % 16 = 0 AND o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
"""


def q_kv_store_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent-KV-store probe join — the Sparkey side-input pattern
    (scio-extra sparkey PairLargeHashSCollectionFunctions.scala:48-255):
    supplier becomes a sharded disk KV artifact (distributed sqlite-shard
    build, joins.build_kv_store), then a lineitem slice probes it via
    DistCache-shipped shards with NO shuffle on the probe side
    (joins.kv_store_join). Aggregated per supplier so the oracle is a plain
    SQL join."""
    from scio_spark.operators.joins import build_kv_store, kv_store_join

    sc = _ctx(spark)
    sup = (
        _t(sc, sf_dir, "supplier")
        .df.select(F.col("s_suppkey").alias("suppkey"), "s_name")
    )
    store = build_kv_store(sup, "suppkey", n_shards=4)
    probe = (
        _t(sc, sf_dir, "lineitem")
        .df.filter("l_quantity >= 48")
        .select(F.col("l_suppkey").alias("suppkey"), "l_quantity", "l_extendedprice")
    )
    joined = kv_store_join(probe, store, how="inner")
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").alias("qty"),
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("revenue"),
    )


ORACLE_KV_STORE_JOIN = """
SELECT s_name, COUNT(*) AS n_items, SUM(l_quantity) AS qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE l_quantity >= 48
GROUP BY s_name
"""


def q_smb_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortMergeTransform (smb/SortMergeTransform.scala:41-171): read a
    bucketed table, apply a bucketing-preserving transform (filter +
    derived column), rewrite with the SAME bucket spec (picked up from the
    catalog via smb.bucket_count), then aggregate the rewritten table on
    its bucket key — the groupBy needs no exchange (bucketed scan)."""
    from scio_spark.operators import smb

    sc = _ctx(spark)
    orders = _t(sc, sf_dir, "orders").df.withColumn(
        "custkey", F.col("o_custkey")
    )
    smb.save_sorted_bucket(orders, "smbt_in", "custkey", 8)
    smb.sort_merge_transform(
        spark,
        "smbt_in",
        "smbt_out",
        lambda df: df.filter("o_totalprice > 150000").withColumn(
            "o_year", F.year("o_orderdate")
        ),
        "custkey",
    )
    assert smb.bucket_count(spark, "smbt_out") == 8
    return (
        spark.table("smbt_out")
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("revenue"),
        )
    )


ORACLE_SMB_TRANSFORM = """
SELECT EXTRACT(year FROM o_orderdate) AS o_year, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_totalprice > 150000
GROUP BY 1
"""


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy (functions/text.py unigram_logprob —
    CCNet-style quality signal, Wenzek et al. 2020): train token
    probabilities over the corpus (one shuffle, vocabulary-sized output,
    broadcast back), score every document's bits-per-token. Per-token
    −log2 p is quantized to DECIMAL(28,6) pre-sum so the value is
    partition-order independent and engine-exact."""
    from scio_spark.functions.text import unigram_logprob

    sc = _ctx(spark)
    return unigram_logprob(_t(sc, sf_dir, "documents").df)


ORACLE_LM_SCORE = """
WITH tok AS (SELECT doc_id, u.token
             FROM (SELECT doc_id, string_split(text, ' ') w FROM documents) t,
                  UNNEST(w) u(token)),
counts AS (SELECT token, COUNT(*) cnt FROM tok GROUP BY 1),
total AS (SELECT SUM(cnt) t FROM counts),
model AS (SELECT token, cnt / t AS p FROM counts, total)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(CAST(SUM(CAST(-log2(p) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
            AS DOUBLE) AS bits_per_token
FROM tok JOIN model USING (token)
GROUP BY doc_id
"""


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 characteristic terms per document (functions/text.py
    tfidf_topk): tf·ln(N/df) quantized to DECIMAL(28,6) BEFORE ranking so
    the (score DESC, token ASC) order is total and engine-independent."""
    from scio_spark.functions.text import tfidf_topk

    sc = _ctx(spark)
    return tfidf_topk(_t(sc, sf_dir, "documents").df, k=3)


ORACLE_TFIDF_KEYWORDS = """
WITH tok AS (SELECT doc_id, u.token
             FROM (SELECT doc_id, string_split(text, ' ') w FROM documents) t,
                  UNNEST(w) u(token)),
tf AS (SELECT doc_id, token, COUNT(*) tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, COUNT(*) df_t FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) n FROM documents),
scored AS (SELECT doc_id, token, CAST(tf * ln(n / df_t) AS DECIMAL(28,6)) sq
           FROM tf JOIN dfreq USING (token), nd),
ranked AS (SELECT doc_id, token, sq,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY sq DESC, token ASC) rank
           FROM scored)
SELECT doc_id, token, CAST(sq AS DOUBLE) AS score, rank
FROM ranked WHERE rank <= 3
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate contamination matrix (functions/dedup.py
    cross_source_overlap): distinct (token-sort-fingerprint, source) pairs,
    self-joined on the fingerprint — how many shared documents every
    unordered source pair has before mixing."""
    from scio_spark.functions.dedup import cross_source_overlap

    sc = _ctx(spark)
    return cross_source_overlap(_t(sc, sf_dir, "documents").df)


ORACLE_SOURCE_OVERLAP = """
WITH hs AS (
  SELECT DISTINCT
    md5(list_aggregate(list_sort(list_distinct(
          string_split(trim(lower(text)), ' '))), 'string_agg', ' ')) AS h,
    source
  FROM documents)
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
FROM hs a JOIN hs b USING (h)
WHERE a.source < b.source
GROUP BY 1, 2
"""


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue over the ship log (one-month lineitem slice):
    running sum of discounted price in (shipdate, orderkey, linenumber)
    order. Distributed two-phase scan (operators/scan.py running_agg) —
    range exchange + partition-local window + broadcast of #partition
    prefix offsets; NO single-partition window touches the data. Decimal
    staging makes the two-phase combine bit-exact (associative adds)."""
    from scio_spark.operators.scan import running_agg

    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem").df
    d = li.filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-03-01")
    ).withColumn(
        "rev",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"),
    )
    out = running_agg(
        d,
        ["l_shipdate", "l_orderkey", "l_linenumber"],
        "rev",
        agg="sum",
        out_col="running_rev",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("running_rev").cast("double").alias("running_rev"),
    )


ORACLE_RUNNING_TOTAL = """
SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_rev
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1995-03-01'
"""


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (functions/training.py
    pack_chunks): documents concatenated in doc_id order into one token
    stream split at a 512-token budget; each doc assigned to the chunk
    where it starts (floor(tokens_before/512)). The exclusive prefix sum
    is the distributed scan, so the layout computation holds at corpus
    scale. Returns per-chunk composition stats."""
    from scio_spark.functions.training import pack_chunks

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df.select("doc_id", "text")
    packed = pack_chunks(docs, token_budget=512)
    return packed.groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tokens").alias("chunk_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


ORACLE_PACK_CHUNKS = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '')) AS tok
  FROM documents),
c AS (
  SELECT doc_id, tok,
         COALESCE(SUM(tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS tokens_before
  FROM t)
SELECT CAST(FLOOR(tokens_before / 512) AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS chunk_tokens,
       MIN(doc_id) AS first_doc
FROM c
GROUP BY 1
"""


def q_shuffle_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training_shuffle permutation materialized as positions
    (functions/training.py shuffle_positions): 1-based rank under the
    seeded engine-portable md5-slice hash order, computed with the
    distributed scan's row_numbers — not a single-partition ROW_NUMBER.
    Verifies both the shuffle's determinism and the scan's count mode."""
    from scio_spark.functions.training import shuffle_positions

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df.select("doc_id")
    return shuffle_positions(docs, "doc_id", seed=7).select("doc_id", "pos")


ORACLE_SHUFFLE_POSITIONS = """
SELECT doc_id,
       ROW_NUMBER() OVER (
         ORDER BY CAST(('0x' || substring(md5('7|' || CAST(doc_id AS VARCHAR)),
                                          1, 12)) AS BIGINT),
                  doc_id) AS pos
FROM documents
"""


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency length bucketing (functions/training.py
    length_buckets): NTILE(8) by token-count rank via the distributed
    ntile (scan row_numbers + 1-row scalar count broadcast) — the
    batching-efficiency layout that keeps padding waste flat. Per-bucket
    composition stats; replays as SQL NTILE."""
    from scio_spark.functions.training import length_buckets

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df.select("doc_id", "text")
    out = length_buckets(docs, 8)
    return out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("__tokens").alias("min_tokens"),
        F.max("__tokens").alias("max_tokens"),
        F.sum("__tokens").alias("bucket_tokens"),
    )


ORACLE_LENGTH_BUCKETS = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '')) AS tok
  FROM documents),
b AS (
  SELECT doc_id, tok,
         NTILE(8) OVER (ORDER BY tok, doc_id) AS bucket
  FROM t)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(tok) AS BIGINT) AS min_tokens,
       CAST(MAX(tok) AS BIGINT) AS max_tokens,
       CAST(SUM(tok) AS BIGINT) AS bucket_tokens
FROM b
GROUP BY 1
"""


def q_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard write + read-back
    (functions/training.py write_training_shards, hash='md5'): shard
    membership is pmod of the engine-portable md5-slice hash, one exchange
    total (the repartition IS the layout), partitionBy(shard) on disk.
    Verifies membership + per-shard composition replay bit-for-bit."""
    from scio_spark.functions.training import write_training_shards

    path = _rt_path(sf_dir, "shards")
    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df.select("doc_id", "n_chars")
    write_training_shards(
        docs, path, n_shards=8, id_col="doc_id", seed=11, hash="md5"
    )
    back = spark.read.parquet(path)
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.sum("n_chars").alias("sum_chars"),
    )


ORACLE_SHARD_LAYOUT = """
WITH s AS (
  SELECT doc_id, n_chars,
         CAST(CAST(('0x' || substring(md5('11|' || CAST(doc_id AS VARCHAR)),
                                      1, 12)) AS BIGINT) % 8 AS INT) AS shard
  FROM documents)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM s
GROUP BY 1
"""


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-source cap (functions/training.py cap_per_key): at most 40
    docs per source, survivors chosen by seeded portable-hash rank — the
    web-corpus guard against a few hosts swamping the mixture. Row-stable:
    replays as ROW_NUMBER over the md5-slice hash."""
    from scio_spark.functions.training import cap_per_key

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df.select("doc_id", "source", "n_chars")
    capped = cap_per_key(docs, "source", 40, "doc_id", seed=5)
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
    )


ORACLE_SOURCE_CAP = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substring(md5('5|' || CAST(doc_id AS VARCHAR)),
                                            1, 12)) AS BIGINT), doc_id) AS rk
  FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc
FROM r
WHERE rk <= 40
GROUP BY 1
"""


def q_token_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token quota (functions/training.py token_quota_per_key):
    walk each source's docs in seeded-hash order, keep while the exclusive
    running token sum stays under 2000 — "sample ~N tokens per domain".
    One partitioned window; the first doc of a source always survives."""
    from scio_spark.functions.training import token_quota_per_key

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df.select("doc_id", "source", "text")
    kept = token_quota_per_key(docs, "source", 2000, "doc_id", seed=3)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tokens").alias("sum_tokens"),
    )


ORACLE_TOKEN_QUOTA = """
WITH t AS (
  SELECT doc_id, source,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '')) AS tok
  FROM documents),
c AS (
  SELECT doc_id, source, tok,
         COALESCE(SUM(tok) OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substring(md5('3|' || CAST(doc_id AS VARCHAR)),
                                            1, 12)) AS BIGINT), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS taken
  FROM t)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS sum_tokens
FROM c
WHERE taken < 2000
GROUP BY 1
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (operators/merge.py snapshot_diff): yesterday's
    documents vs a deterministic "today" (1-in-17 removed, 1-in-13 edited,
    1-in-29 re-crawled under new ids) — one full-outer join on the id with
    md5 content equality; the audit step between MERGE runs and the input
    to incremental recomputes."""
    from scio_spark.operators.merge import snapshot_diff

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df.select("doc_id", "text")
    new = docs.filter("doc_id % 17 != 0").withColumn(
        "text",
        F.when(F.expr("doc_id % 13 = 0"), F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")),
    ).unionByName(
        docs.filter("doc_id % 29 = 0").select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    diff = snapshot_diff(docs, new, "doc_id", compare_cols=["text"])
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


ORACLE_SNAPSHOT_DIFF = """
WITH n AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 29 = 0),
j AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text = n.text THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM documents o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(doc_id) AS min_id,
       MAX(doc_id) AS max_id
FROM j
GROUP BY 1
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase (functions/journeys.py
    funnel_counts): per-user earliest strictly-increasing completion times
    via k-1 keyed joins against the shrinking per-user stage table (never
    a ts-self-join of the log), then one stack() report row per stage."""
    from scio_spark.functions.journeys import funnel_counts

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    steps = [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click"),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    return funnel_counts(ev, steps)


ORACLE_FUNNEL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
SELECT 'view' AS step, CAST(1 AS INT) AS step_index,
       CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 'click', CAST(2 AS INT), CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 'purchase', CAST(3 AS INT), CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (functions/journeys.py cohort_retention):
    cohort = epoch-week of each user's first event, offset = activity week
    − cohort week, n_users = distinct actives. Integer epoch-grid buckets
    (no calendar truncation) — exact and engine-portable; two partial-agg'd
    keyed aggregations."""
    from scio_spark.functions.journeys import cohort_retention

    sc = _ctx(spark)
    return cohort_retention(_t(sc, sf_dir, "events").df)


ORACLE_COHORT_RETENTION = """
WITH f AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1),
a AS (
  SELECT e.user_id,
         CAST(FLOOR(epoch(f.first_ts) / 604800) AS BIGINT) AS cohort_period,
         CAST(FLOOR(epoch(e.ts) / 604800)
              - FLOOR(epoch(f.first_ts) / 604800) AS BIGINT) AS period_offset
  FROM events e JOIN f ON e.user_id = f.user_id)
SELECT cohort_period, period_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM a
GROUP BY 1, 2
"""


def q_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AutoComplete parity (scio-examples/.../complete/AutoComplete.scala →
    functions/text.py autocomplete_topk): corpus term counts → bounded
    prefix explode (1..4 chars) → top-3 terms per prefix by (count DESC,
    term ASC). Prefix fan-out scales with vocabulary, not corpus."""
    from scio_spark.functions.text import autocomplete_topk

    sc = _ctx(spark)
    docs = _t(sc, sf_dir, "documents").df
    return autocomplete_topk(docs, "text", k=3, min_prefix=1, max_prefix=4)


ORACLE_AUTOCOMPLETE = """
WITH terms AS (
  SELECT u.term, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents,
       UNNEST(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                          x -> x <> '')) u(term)
  GROUP BY 1),
pref AS (
  SELECT term, n, substring(term, 1, p.len) AS prefix
  FROM terms,
       UNNEST(range(1, LEAST(length(term), 4) + 1)) p(len)),
ranked AS (
  SELECT prefix, term, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY prefix
                                 ORDER BY n DESC, term ASC) AS INT) AS rank
  FROM pref)
SELECT prefix, term, n, rank FROM ranked WHERE rank <= 3
"""


def q_top_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TopWikipediaSessions parity (scio-examples/.../complete/
    TopWikipediaSessions.scala): 30-min-gap sessionization per user
    (operators/windows.py session_agg), then the top-3 longest sessions
    per calendar month of session start, ties broken by (user, start)."""
    from pyspark.sql import Window

    from scio_spark.operators import windows as W

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    sess = W.session_agg(
        ev, "ts", "30 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("n_events")],
    ).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        "n_events",
    )
    month = F.date_trunc("month", F.col("session_start")).cast("timestamp_ntz")
    w = Window.partitionBy("month").orderBy(
        F.desc("n_events"), F.asc("user_id"), F.asc("session_start")
    )
    return (
        sess.withColumn("month", month)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("month", "rank", "user_id", "session_start", "n_events")
    )


ORACLE_TOP_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes' OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
islands AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked),
sess AS (
  SELECT user_id, MIN(ts) AS session_start,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM islands GROUP BY user_id, sid),
ranked AS (
  SELECT CAST(date_trunc('month', session_start) AS TIMESTAMP) AS month,
         CAST(ROW_NUMBER() OVER (PARTITION BY date_trunc('month', session_start)
                                 ORDER BY n_events DESC, user_id ASC,
                                          session_start ASC) AS INT) AS rank,
         user_id, session_start, n_events
  FROM sess)
SELECT month, rank, user_id, session_start, n_events
FROM ranked WHERE rank <= 3
"""


def q_traffic_max_lane_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrafficMaxLaneFlow parity (scio-examples/src/main/scala/com/spotify/
    scio/examples/complete/TrafficMaxLaneFlow.scala: sliding windows over
    sensor readings, then per (window, station) keep the single reading
    with the maximum lane flow). Analog over events: 1h/30m sliding
    windows x station (event_type); argmax by (value DESC, event_id DESC)
    via a struct max — a partial-aggregable single-shuffle plan (explode
    x2 -> map-side max/count -> one exchange), no ROW_NUMBER sort."""
    from scio_spark.operators import windows as W

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df.filter(F.col("value").isNotNull())
    slid = W.with_sliding_windows(ev, "ts", "1 hour", "30 minutes")
    return (
        slid.groupBy("window_start", F.col("event_type").alias("station"))
        .agg(
            F.max(F.struct(F.col("value"), F.col("event_id"))).alias("__b"),
            F.count(F.lit(1)).alias("n_readings"),
        )
        .select(
            "window_start",
            "station",
            F.col("__b.value").alias("max_flow"),
            F.col("__b.event_id").alias("event_id"),
            "n_readings",
        )
    )


ORACLE_TRAFFIC_MAX_LANE_FLOW = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
         event_type AS station, event_id, value
  FROM events WHERE value IS NOT NULL
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
         event_type, event_id, value
  FROM events WHERE value IS NOT NULL),
ranked AS (
  SELECT window_start, station, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY window_start, station
                            ORDER BY value DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY window_start, station) AS n_readings
  FROM assigned)
SELECT window_start, station, CAST(value AS DOUBLE) AS max_flow, event_id,
       CAST(n_readings AS BIGINT) AS n_readings
FROM ranked WHERE rn = 1
"""


def q_traffic_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrafficRoutes parity (scio-examples/src/main/scala/com/spotify/scio/
    examples/complete/TrafficRoutes.scala: per (sliding window, route)
    average speed plus a slowdown flag — true when some station in the
    route has consecutive readings with decreasing speed). Analog over
    events: route = event_type, station = user_id; the consecutive-pair
    LAG runs per (window, route, station) — the same grouping Beam's
    GroupByKey induces, one exchange — then one partial-aggregable
    group. avg_speed = decimal-staged sum cast double / count (both
    engines do the identical IEEE double division)."""
    from pyspark.sql import Window

    from scio_spark.operators import windows as W

    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    slid = W.with_sliding_windows(ev, "ts", "1 hour", "30 minutes")
    pair = Window.partitionBy("window_start", "event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    slid = slid.withColumn("__slow", F.col("value") < F.lag("value").over(pair))
    return (
        slid.groupBy("window_start", F.col("event_type").alias("route"))
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_speed"),
            F.coalesce(F.bool_or("__slow"), F.lit(False)).alias("slowdown"),
        )
    )


ORACLE_TRAFFIC_ROUTES = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
         event_type, user_id, ts, event_id, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
         event_type, user_id, ts, event_id, value
  FROM events),
lagged AS (
  SELECT window_start, event_type AS route, value,
         value < LAG(value) OVER (PARTITION BY window_start, event_type,
                                  user_id ORDER BY ts, event_id) AS slow
  FROM assigned)
SELECT window_start, route,
       CAST(COUNT(*) AS BIGINT) AS n_readings,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_speed,
       COALESCE(BOOL_OR(slow), FALSE) AS slowdown
FROM lagged GROUP BY 1, 2
"""


def q_spam_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GameStats spam-detection parity (scio-examples/.../complete/game/
    GameStats.scala CalculateSpammyUsers): users whose total score exceeds
    mean + 2.5·stddev_pop of per-user totals. Per-user sums are
    decimal-staged (order-independent); the threshold compare is double
    with empirically verified margin ≥6.4 vs ~1e-10 float error (the
    recipes' float-decision rule). Mean/stddev join in as a 1-row
    broadcast scalar."""
    sc = _ctx(spark)
    ev = _t(sc, sf_dir, "events").df
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(28,6)")).alias("s")
    )
    stats = per_user.agg(
        F.avg(F.col("s").cast("double")).alias("m"),
        F.stddev_pop(F.col("s").cast("double")).alias("sd"),
    )
    flagged = per_user.join(F.broadcast(stats)).select(
        "user_id",
        "s",
        (F.col("s").cast("double") > F.col("m") + 2.5 * F.col("sd")).alias(
            "is_spammy"
        ),
    )
    return flagged.groupBy("is_spammy").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("s").cast("double").alias("total_value"),
    )


ORACLE_SPAM_USERS = """
WITH per_user AS (
  SELECT user_id, SUM(CAST(value AS DECIMAL(28,6))) AS s
  FROM events GROUP BY 1),
st AS (
  SELECT AVG(CAST(s AS DOUBLE)) AS m, STDDEV_POP(CAST(s AS DOUBLE)) AS sd
  FROM per_user)
SELECT CAST(s AS DOUBLE) > m + 2.5 * sd AS is_spammy,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(s) AS DOUBLE) AS total_value
FROM per_user, st
GROUP BY 1
"""


def q_data_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (functions/checks.py run_checks): TPC-H lineitem
    validity rules — quantity/discount/tax ranges, shipdate present — in
    ONE conditional-sum aggregate pass, plus (orderkey, linenumber)
    uniqueness via one partial-agg'd groupBy. NULL predicate = violation
    (a rule you cannot evaluate is not satisfied)."""
    from scio_spark.functions.checks import run_checks

    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem").df
    return run_checks(
        li,
        row_rules={
            "qty_range": (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
            "discount_range": (F.col("l_discount") >= 0)
            & (F.col("l_discount") <= 0.1),
            "tax_nonneg": F.col("l_tax") >= 0,
            "shipdate_present": F.col("l_shipdate").isNotNull(),
        },
        unique_keys=[["l_orderkey", "l_linenumber"]],
    )


ORACLE_DATA_CHECKS = """
WITH r AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN COALESCE(l_quantity >= 1 AND l_quantity <= 50,
                                     FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v_qty,
         CAST(SUM(CASE WHEN COALESCE(l_discount >= 0 AND l_discount <= 1e-1,
                                     FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v_disc,
         CAST(SUM(CASE WHEN COALESCE(l_tax >= 0, FALSE) THEN 0 ELSE 1 END)
              AS BIGINT) AS v_tax,
         CAST(SUM(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END)
              AS BIGINT) AS v_ship
  FROM lineitem),
u AS (
  SELECT CAST(SUM(c - 1) AS BIGINT) AS v, CAST(SUM(c) AS BIGINT) AS n
  FROM (SELECT COUNT(*) AS c FROM lineitem
        GROUP BY l_orderkey, l_linenumber))
SELECT 'qty_range' AS check, 'row_rule' AS kind, v_qty AS n_violations,
       n AS n_rows, v_qty = 0 AS passed FROM r
UNION ALL
SELECT 'discount_range', 'row_rule', v_disc, n, v_disc = 0 FROM r
UNION ALL
SELECT 'tax_nonneg', 'row_rule', v_tax, n, v_tax = 0 FROM r
UNION ALL
SELECT 'shipdate_present', 'row_rule', v_ship, n, v_ship = 0 FROM r
UNION ALL
SELECT 'unique(l_orderkey,l_linenumber)', 'uniqueness', v, n, v = 0 FROM u
"""


def q_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job metrics via observations (metrics.py Metrics — the ScioResult
    counter/distribution surface on df.observe): counters and a
    distribution evaluated DURING the job's own action (no extra pass),
    fetched after completion and returned as the metrics report table.
    Distribution mean stays exact here because the observed sum/count are
    integers (the report carries sum+count; mean = sum/count in both
    engines)."""
    from scio_spark.metrics import Metrics

    sc = _ctx(spark)
    li = _t(sc, sf_dir, "lineitem").df
    m = Metrics()
    d = m.count(li, "n_rows")
    d = m.count(d, "high_qty", F.col("l_quantity") > 40)
    d = m.distribution(d, "linenumber", F.col("l_linenumber"))
    d.select("l_orderkey").write.mode("overwrite").parquet(
        _rt_path(sf_dir, "metrics_sink")
    )
    dist = m.get("linenumber")
    rows = [
        ("n_rows", int(m.get("n_rows"))),
        ("high_qty", int(m.get("high_qty"))),
        ("linenumber_min", int(dist["min"])),
        ("linenumber_max", int(dist["max"])),
        ("linenumber_count", int(dist["count"])),
        ("linenumber_sum", int(dist["sum"])),
    ]
    return spark.createDataFrame(rows, "metric string, value long")


ORACLE_METRICS = """
SELECT 'n_rows' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM lineitem
UNION ALL
SELECT 'high_qty', CAST(SUM(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END)
                        AS BIGINT) FROM lineitem
UNION ALL
SELECT 'linenumber_min', CAST(MIN(l_linenumber) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'linenumber_max', CAST(MAX(l_linenumber) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'linenumber_count', CAST(COUNT(l_linenumber) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'linenumber_sum', CAST(SUM(l_linenumber) AS BIGINT) FROM lineitem
"""


def q_compact_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (operators/merge.py compact_parquet): a
    40-file fragmented copy of orders is rewritten to byte-targeted file
    count and atomically swapped (rename-aside, crash-recoverable). The
    query proves content preservation — the read-back aggregate must
    equal the oracle's aggregate over the pristine source."""
    from scio_spark.operators.merge import compact_parquet

    path = _rt_path(sf_dir, "compact")
    sc = _ctx(spark)
    src = _t(sc, sf_dir, "orders").df.filter("o_orderkey % 4 = 0").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    src.repartition(40).write.mode("overwrite").parquet(path)
    compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


ORACLE_COMPACT_TABLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderkey % 4 = 0
GROUP BY 1
"""


def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/FineWeb-style quality filter funnel: the per-rule rejection
    report a curation run publishes before dropping documents —
    functions/checks.py run_checks composed over functions/text.py signals
    (token bounds, mean word length 3-10, punctuation ratio, ≥2
    stopwords), ALL in one aggregate pass. Ratio thresholds are single
    divisions of the same integers in both engines, so the boundary
    comparisons replay exactly."""
    from scio_spark.fanout import fan_out_scan
    from scio_spark.functions.checks import run_checks
    from scio_spark.functions.text import punct_ratio, token_count

    sc = _ctx(spark)
    # r15-opt: fan the narrow scan to width for the per-rule signal
    # expressions (0.63-0.77 -> 0.52-0.58 s warm at sf0.1).
    docs = fan_out_scan(_t(sc, sf_dir, "documents").df)
    d = (
        docs.withColumn("__tok", token_count("text"))
        .withColumn(
            "__chars", F.length(F.regexp_replace(F.trim("text"), r"\s+", ""))
        )
        .withColumn("__pr", punct_ratio("text"))
        .withColumn(
            "__sw",
            F.size(
                F.filter(
                    F.split(F.trim("text"), r"\s+"),
                    lambda t: F.lower(t).isin(
                        "the", "a", "of", "and", "to", "in", "is", "it"
                    ),
                )
            ),
        )
    )
    wl = F.col("__chars") / F.col("__tok")
    return run_checks(
        d,
        row_rules={
            "min_tokens": F.col("__tok") >= 20,
            "max_tokens": F.col("__tok") <= 2000,
            "word_length": (wl >= 3.0) & (wl <= 10.0),
            "punct": F.col("__pr") <= 0.2,
            "stopwords": F.col("__sw") >= 2,
        },
    )


ORACLE_QUALITY_FUNNEL = """
WITH f AS (
  SELECT
    len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))
      AS tok,
    len(regexp_replace(trim(text), '\\s+', '', 'g')) AS chars_nospace,
    CASE WHEN len(text) = 0 THEN 0.0
         ELSE len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) / len(text)
    END AS pr,
    len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
        t -> list_contains(['the','a','of','and','to','in','is','it'],
                           lower(t)))) AS sw
  FROM documents),
r AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN COALESCE(tok >= 20, FALSE) THEN 0 ELSE 1 END)
         AS BIGINT) AS v_min,
    CAST(SUM(CASE WHEN COALESCE(tok <= 2000, FALSE) THEN 0 ELSE 1 END)
         AS BIGINT) AS v_max,
    CAST(SUM(CASE WHEN COALESCE(
                 CASE WHEN tok = 0 THEN NULL
                      ELSE chars_nospace / tok END >= 3.0
                 AND CASE WHEN tok = 0 THEN NULL
                          ELSE chars_nospace / tok END <= 10.0, FALSE)
             THEN 0 ELSE 1 END) AS BIGINT) AS v_wl,
    CAST(SUM(CASE WHEN COALESCE(pr <= 2e-1, FALSE) THEN 0 ELSE 1 END)
         AS BIGINT) AS v_pr,
    CAST(SUM(CASE WHEN COALESCE(sw >= 2, FALSE) THEN 0 ELSE 1 END)
         AS BIGINT) AS v_sw
  FROM f)
SELECT 'min_tokens' AS check, 'row_rule' AS kind, v_min AS n_violations,
       n AS n_rows, v_min = 0 AS passed FROM r
UNION ALL SELECT 'max_tokens', 'row_rule', v_max, n, v_max = 0 FROM r
UNION ALL SELECT 'word_length', 'row_rule', v_wl, n, v_wl = 0 FROM r
UNION ALL SELECT 'punct', 'row_rule', v_pr, n, v_pr = 0 FROM r
UNION ALL SELECT 'stopwords', 'row_rule', v_sw, n, v_sw = 0 FROM r
"""


def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (functions/training.py pack_sequences —
    the BatchDoFn/batchWeighted shape: close a pack when the next doc
    would overflow 512 tokens; an oversized doc packs alone). Packing is
    partition-local, so the query pins a deterministic layout
    (1 partition, doc_id order); the oracle replays the EXACT greedy walk
    with a pack-jump recursive CTE over the token cumsum — one recursion
    step per PACK (≈ total_tokens/512), not per doc."""
    from scio_spark.functions.training import pack_sequences

    sc = _ctx(spark)
    docs = (
        _t(sc, sf_dir, "documents").df.select("doc_id", "text")
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )
    packed = pack_sequences(docs, token_budget=512)
    return packed.select(
        F.element_at("doc_ids", 1).alias("first_doc"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").alias("total_tokens"),
    )


ORACLE_PACK_GREEDY = """
WITH RECURSIVE t AS MATERIALIZED (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS tok,
         SUM(CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT))
           OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents),
packs(pack_id, start_cum, end_cum) AS (
  SELECT 0, CAST(0 AS HUGEINT), CAST(0 AS HUGEINT)
  UNION ALL
  SELECT p.pack_id + 1, p.end_cum,
         COALESCE((SELECT MAX(cum) FROM t
                   WHERE cum <= p.end_cum + 512 AND cum > p.end_cum),
                  (SELECT MIN(cum) FROM t WHERE cum > p.end_cum))
  FROM packs p
  WHERE EXISTS (SELECT 1 FROM t WHERE cum > p.end_cum)),
assigned AS (
  SELECT t.doc_id, t.tok, p.pack_id
  FROM t JOIN packs p
    ON t.cum > p.start_cum AND t.cum <= p.end_cum
  WHERE p.pack_id > 0)
SELECT MIN(doc_id) AS first_doc,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS total_tokens
FROM assigned
GROUP BY pack_id
"""


# ------------------------------------------------------------------ contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All contract queries — count asserted against oracle_sql() in
    tests/test_contract_schema.py. ORDER IS DELIBERATE: the driver's
    correctness gate records rows for exactly the first 50 entries, so
    the dict rotates which queries sit in that window (policy + per-round
    membership: COVERAGE.md, regenerable via tools/coverage_map.py).
    Round-15 window, in order:

    1. ann_ivf_streamed + incremental_embedding_dedup — added late in r14
       (locally value-exact at sf0.01 AND sf1 since then) but never
       driver-rowed; they head this window per the standing "every query
       earns driver evidence" contract;
    2. the 37 r11-stale queries (latest driver row = r11), standing
       order (contamination_report ... heavy_hitters);
    3. the 11 oldest r12-window rows to fill the 50
       (hll_merge ... salted_agg).

    Post-window: the four queries ADDED this round (ann_hnsw_sharded,
    ann_ivf_appended, ann_pq_index, ann_ivfpq_index — locally value-exact, heading the r16 rotation for
    their first driver rows; the coverage_map ratchet enforces that), then
    the remaining 39 r12-window queries (r16 rotation candidates, standing
    order), then the 50 r13-window queries, then the 50 r14-window queries
    (freshest driver evidence, last). After this round no pre-existing
    query's latest driver row predates r12. tools/check_oracle.py still value-checks ALL queries
    every round, and tools/coverage_map.py now FAILS (exit 1) if a query
    exists for two full rounds without a driver row (freshness ratchet,
    VERDICT r14 ask #5)."""
    return {
        # -- r15 driver window (first 50) ----------------------------------
        # (a) the two queries added post-window in r14 — first driver rows
        "ann_ivf_streamed": q_ann_ivf_streamed,
        "incremental_embedding_dedup": q_incremental_embedding_dedup,
        # (b) the 37 r11-stale queries, standing order
        "contamination_report": q_contamination_report,
        "semantic_dedup_incremental": q_semantic_dedup_incremental,
        "weighted_sample": q_weighted_sample,
        "stateful_stream": q_stateful_stream,
        "dedup_simhash": q_dedup_simhash,
        "data_mixture": q_data_mixture,
        "pricing_summary": q_pricing_summary,
        "streaming_dedup": q_streaming_dedup,
        "ann_lsh": q_ann_lsh,
        "png_decode": q_png_decode,
        "jpeg_decode": q_jpeg_decode,
        "gif_decode": q_gif_decode,
        "video_decode": q_video_decode,
        "group_by_key": q_group_by_key,
        "map_with_parallelism": q_map_with_parallelism,
        "side_input_multimap": q_side_input_multimap,
        "dist_cache": q_dist_cache,
        "asof_join": q_asof_join,
        "async_lookup": q_async_lookup,
        "batch_by_key_sizes": q_batch_by_key_sizes,
        "cogroup": q_cogroup,
        "cogroup_3way": q_cogroup_3way,
        "corpus_stats": q_corpus_stats,
        "decontaminate": q_decontaminate,
        "dedup_embedding": q_dedup_embedding,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "distinct_by_key": q_distinct_by_key,
        "embedding_topk": q_embedding_topk,
        "fingerprint_dedup": q_fingerprint_dedup,
        "fold_global": q_fold_global,
        "global_top": q_global_top,
        "group_map_reduce": q_group_map_reduce,
        "hash_join": q_hash_join,
        "hash_lookup": q_hash_lookup,
        "heavy_hitters": q_heavy_hitters,
        # (c) the 11 oldest r12-window rows, filling the 50
        "hll_merge": q_hll_merge,
        "intersection": q_intersection,
        "json_extract": q_json_extract,
        "large_orders": q_large_orders,
        "mean_by_key": q_mean_by_key,
        "multi_join": q_multi_join,
        "partition_counts": q_partition_counts,
        "pipe_identity": q_pipe_identity,
        "reduce_by_key": q_reduce_by_key,
        "safe_map": q_safe_map,
        "salted_agg": q_salted_agg,
        # ---- end of the 50-row driver window (gate cuts at entry 50) ------
        # NEW post-window this round (locally value-checked; heads the r16
        # rotation for its first driver row — the ratchet in
        # tools/coverage_map.py enforces that)
        "ann_hnsw_sharded": q_ann_hnsw_sharded,
        "ann_ivf_appended": q_ann_ivf_appended,
        "ann_pq_index": q_ann_pq_index,
        "ann_ivfpq_index": q_ann_ivfpq_index,
        # r12-window remainder — r16 rotation candidates, standing order
        "skewed_join": q_skewed_join,
        "smb_join": q_smb_join,
        "sparse_join": q_sparse_join,
        "subtract_els": q_subtract_els,
        "text_repetition": q_text_repetition,
        "train_split": q_train_split,
        "top_by_key": q_top_by_key,
        "window_fixed": q_window_fixed,
        "window_session": q_window_session,
        "rollup": q_rollup,
        "stats": q_stats,
        "lang_id": q_lang_id,
        "aggregate_by_key": q_aggregate_by_key,
        "aggregate_global": q_aggregate_global,
        "hash_filter": q_hash_filter,
        "refreshing_side_input": q_refreshing_side_input,
        "processing_time_panes": q_processing_time_panes,
        "watermark_panes": q_watermark_panes,
        "side_outputs": q_side_outputs,
        "map_file": q_map_file,
        "allowed_lateness": q_allowed_lateness,
        "vector_sum_by_key": q_vector_sum_by_key,
        "running_total": q_running_total,
        "pack_chunks": q_pack_chunks,
        "shuffle_positions": q_shuffle_positions,
        "length_buckets": q_length_buckets,
        "shard_layout": q_shard_layout,
        "source_cap": q_source_cap,
        "token_quota": q_token_quota,
        "snapshot_diff": q_snapshot_diff,
        "funnel": q_funnel,
        "tiff_decode": q_tiff_decode,
        "video_mjpeg": q_video_mjpeg,
        "jpeg_progressive": q_jpeg_progressive,
        "jpeg12_decode": q_jpeg12_decode,
        "audio_g711": q_audio_g711,
        "audio_adpcm": q_audio_adpcm,
        "audio_flac": q_audio_flac,
        "audio_mp3_probe": q_audio_mp3_probe,
        # the 50 r13-window queries
        "video_probe": q_video_probe,
        "avi_audio": q_avi_audio,
        "audio_resample": q_audio_resample,
        "ann_hnsw": q_ann_hnsw,
        "cohort_retention": q_cohort_retention,
        "autocomplete": q_autocomplete,
        "top_sessions": q_top_sessions,
        "spam_users": q_spam_users,
        "data_checks": q_data_checks,
        "incremental_dedup": q_incremental_dedup,
        "metrics": q_metrics,
        "quality_funnel": q_quality_funnel,
        "pack_greedy": q_pack_greedy,
        "quantiles": q_quantiles,
        "quantiles_by_key": q_quantiles_by_key,
        "sorted_groups": q_sorted_groups,
        "streaming_window": q_streaming_window,
        "streaming_session": q_streaming_session,
        "streaming_join": q_streaming_join,
        "dedup_clusters": q_dedup_clusters,
        "ann_ivf": q_ann_ivf,
        "kv_store_join": q_kv_store_join,
        "smb_transform": q_smb_transform,
        "lm_score": q_lm_score,
        "tfidf_keywords": q_tfidf_keywords,
        "source_overlap": q_source_overlap,
        "cube": q_cube,
        "grouping_sets": q_grouping_sets,
        "top_orders": q_top_orders,
        "intersect_by_key": q_intersect_by_key,
        "approx_distinct": q_approx_distinct,
        "latest_by_key": q_latest_by_key,
        "local_supplier_volume": q_local_supplier_volume,
        "window_sliding": q_window_sliding,
        "window_calendar": q_window_calendar,
        "stratified_sample": q_stratified_sample,
        "traffic_max_lane_flow": q_traffic_max_lane_flow,
        "traffic_routes": q_traffic_routes,
        "pii_scrub": q_pii_scrub,
        "text_chunks": q_text_chunks,
        "csv_roundtrip": q_csv_roundtrip,
        "union_agg": q_union_distinct_by,
        "text_features": q_text_features,
        "text_quality": q_text_quality,
        "sparse_lookup": q_sparse_lookup,
        "custom_window": q_custom_window,
        "multimodal_features": q_multimodal_features,
        "window_weekly": q_window_weekly,
        "json_roundtrip": q_json_roundtrip,
        "text_roundtrip": q_text_roundtrip,
        # the 50 r14-window queries — freshest driver evidence, last
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "tfrecord_roundtrip": q_tfrecord_roundtrip,
        "binary_roundtrip": q_binary_roundtrip,
        "object_roundtrip": q_object_roundtrip,
        "dynamic_destinations": q_dynamic_destinations,
        "jdbc_roundtrip": q_jdbc_roundtrip,
        "xml_roundtrip": q_xml_roundtrip,
        "protobuf_roundtrip": q_protobuf_roundtrip,
        "compact_table": q_compact_table,
        "substring_dedup": q_substring_dedup,
        "merge_upsert": q_merge_upsert,
        "sparse_join_bloom": q_sparse_join_bloom,
        "webdataset_roundtrip": q_webdataset_roundtrip,
        "bpe_segment": q_bpe_segment,
        "zorder_layout": q_zorder_layout,
        "image_decode": q_image_decode,
        "audio_decode": q_audio_decode,
        "bigram_lm": q_bigram_lm,
        "interval_join": q_interval_join,
        "arrow_roundtrip": q_arrow_roundtrip,
        "fuzzy_join": q_fuzzy_join,
        "k_anonymity": q_k_anonymity,
        "capped_sessions": q_capped_sessions,
        "dedup_lines": q_dedup_lines,
        "files_with_path": q_files_with_path,
        "curation_e2e": q_curation_e2e,
        "continuous_rollup": q_continuous_rollup,
        "hash_intersect": q_hash_intersect,
        "hash_subtract": q_hash_subtract,
        "combine_pandas": q_combine_pandas,
        "pane_info": q_pane_info,
        "keyed_variants": q_keyed_variants,
        "map_with_resource": q_map_with_resource,
        "count_by_key": q_count_by_key,
        "count_by_value": q_count_by_value,
        "distinct": q_distinct,
        "sum_by_key": q_sum_by_key,
        "histogram": q_histogram,
        "flat_map": q_flat_map_tokens,
        "cross": q_cross,
        "subtract_by_key": q_subtract_by_key,
        "tfexample_roundtrip": q_tfexample_roundtrip,
        "avro_roundtrip": q_avro_roundtrip,
        "quantiles_tdigest": q_quantiles_tdigest,
        "element_count_panes": q_element_count_panes,
        "semantic_dedup": q_semantic_dedup,
        "winnow_fingerprints": q_winnow_fingerprints,
        "dsir_select": q_dsir_select,
        "orc_roundtrip": q_orc_roundtrip,
        "discarding_panes": q_discarding_panes,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": ORACLE_PRICING,
        "top_orders": ORACLE_TOP_ORDERS,
        "count_by_key": ORACLE_COUNT_BY_KEY,
        "count_by_value": ORACLE_COUNT_BY_VALUE,
        "hash_join": ORACLE_HASH_JOIN,
        "top_by_key": ORACLE_TOP_BY_KEY,
        "distinct": ORACLE_DISTINCT,
        "sum_by_key": ORACLE_SUM_BY_KEY,
        "subtract_by_key": ORACLE_SUBTRACT_BY_KEY,
        "intersect_by_key": ORACLE_INTERSECT_BY_KEY,
        "stats": ORACLE_STATS,
        "approx_distinct": ORACLE_APPROX_DISTINCT,
        "latest_by_key": ORACLE_LATEST_BY_KEY,
        "cogroup": ORACLE_COGROUP,
        "sparse_join": ORACLE_SPARSE_JOIN,
        "sparse_join_bloom": ORACLE_SPARSE_JOIN_BLOOM,
        "multi_join": ORACLE_MULTI_JOIN,
        "union_agg": ORACLE_UNION,
        "histogram": ORACLE_HISTOGRAM,
        "text_features": ORACLE_TEXT_FEATURES,
        "text_quality": ORACLE_TEXT_QUALITY,
        "lang_id": ORACLE_LANG_ID,
        "fingerprint_dedup": ORACLE_FINGERPRINT,
        "dedup_exact": ORACLE_DEDUP_EXACT,
        "dedup_ngram_jaccard": ORACLE_NGRAM_JACCARD,
        "dedup_minhash_lsh": _minhash_oracle(16, 4, 0.8),
        "dedup_simhash": _simhash_oracle(3, bits=48),
        "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
        "train_split": ORACLE_TRAIN_SPLIT,
        "decontaminate": ORACLE_DECONTAMINATE,
        "text_repetition": ORACLE_TEXT_REPETITION,
        "corpus_stats": ORACLE_CORPUS_STATS,
        "data_mixture": ORACLE_DATA_MIXTURE,
        "embedding_topk": ORACLE_EMBEDDING_TOPK,
        "traffic_max_lane_flow": ORACLE_TRAFFIC_MAX_LANE_FLOW,
        "traffic_routes": ORACLE_TRAFFIC_ROUTES,
        "window_fixed": ORACLE_WINDOW_FIXED,
        "window_sliding": ORACLE_WINDOW_SLIDING,
        "window_session": ORACLE_WINDOW_SESSION,
        "window_calendar": ORACLE_WINDOW_CALENDAR,
        "rollup": ORACLE_ROLLUP,
        "cube": ORACLE_CUBE,
        "hll_merge": ORACLE_HLL_MERGE,
        "heavy_hitters": _heavy_oracle(),
        "smb_join": ORACLE_SMB_JOIN,
        "kv_store_join": ORACLE_KV_STORE_JOIN,
        "smb_transform": ORACLE_SMB_TRANSFORM,
        "lm_score": ORACLE_LM_SCORE,
        "tfidf_keywords": ORACLE_TFIDF_KEYWORDS,
        "source_overlap": ORACLE_SOURCE_OVERLAP,
        "running_total": ORACLE_RUNNING_TOTAL,
        "pack_chunks": ORACLE_PACK_CHUNKS,
        "shuffle_positions": ORACLE_SHUFFLE_POSITIONS,
        "length_buckets": ORACLE_LENGTH_BUCKETS,
        "shard_layout": ORACLE_SHARD_LAYOUT,
        "source_cap": ORACLE_SOURCE_CAP,
        "token_quota": ORACLE_TOKEN_QUOTA,
        "snapshot_diff": ORACLE_SNAPSHOT_DIFF,
        "funnel": ORACLE_FUNNEL,
        "cohort_retention": ORACLE_COHORT_RETENTION,
        "autocomplete": ORACLE_AUTOCOMPLETE,
        "top_sessions": ORACLE_TOP_SESSIONS,
        "spam_users": ORACLE_SPAM_USERS,
        "data_checks": ORACLE_DATA_CHECKS,
        "incremental_dedup": ORACLE_INCREMENTAL_DEDUP,
        "metrics": ORACLE_METRICS,
        "compact_table": ORACLE_COMPACT_TABLE,
        "quality_funnel": ORACLE_QUALITY_FUNNEL,
        "pack_greedy": ORACLE_PACK_GREEDY,
        "streaming_window": ORACLE_STREAMING_WINDOW,
        "streaming_dedup": ORACLE_STREAMING_DEDUP,
        "skewed_join": ORACLE_SKEWED_JOIN,
        "sparse_lookup": ORACLE_SPARSE_LOOKUP,
        "grouping_sets": ORACLE_GROUPING_SETS,
        "quantiles": ORACLE_QUANTILES,
        "flat_map": ORACLE_FLAT_MAP,
        "cross": ORACLE_CROSS,
        "asof_join": ORACLE_ASOF_JOIN,
        "json_extract": ORACLE_JSON_EXTRACT,
        "local_supplier_volume": ORACLE_LOCAL_SUPPLIER,
        "salted_agg": ORACLE_SALTED_AGG,
        "quantiles_by_key": ORACLE_QUANTILES_BY_KEY,
        "sorted_groups": ORACLE_SORTED_GROUPS,
        "dedup_embedding": ORACLE_DEDUP_EMBEDDING,
        "dedup_embedding_lsh": ORACLE_DEDUP_EMBEDDING_LSH,
        "incremental_embedding_dedup": ORACLE_INCREMENTAL_EMBEDDING,
        "stateful_stream": ORACLE_STATEFUL_STREAM,
        "pipe_identity": ORACLE_PIPE,
        "large_orders": ORACLE_LARGE_ORDERS,
        "window_weekly": ORACLE_WINDOW_WEEKLY,
        "global_top": ORACLE_GLOBAL_TOP,
        "distinct_by_key": ORACLE_DISTINCT_BY_KEY,
        "cogroup_3way": ORACLE_COGROUP_3WAY,
        "mean_by_key": ORACLE_MEAN_BY_KEY,
        "reduce_by_key": ORACLE_REDUCE_BY_KEY,
        "fold_global": ORACLE_FOLD_GLOBAL,
        "group_map_reduce": ORACLE_GROUP_MAP_REDUCE,
        "intersection": ORACLE_INTERSECTION,
        "subtract_els": ORACLE_SUBTRACT_ELS,
        "partition_counts": ORACLE_PARTITION_COUNTS,
        "hash_lookup": ORACLE_HASH_LOOKUP,
        "batch_by_key_sizes": ORACLE_BATCH_BY_KEY,
        "safe_map": ORACLE_SAFE_MAP,
        "async_lookup": ORACLE_ASYNC_LOOKUP,
        "custom_window": ORACLE_CUSTOM_WINDOW,
        "multimodal_features": ORACLE_MULTIMODAL_FEATURES,
        "pii_scrub": ORACLE_PII_SCRUB,
        "text_chunks": ORACLE_TEXT_CHUNKS,
        "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
        "hash_intersect": ORACLE_HASH_INTERSECT,
        "hash_subtract": ORACLE_HASH_SUBTRACT,
        "group_by_key": ORACLE_GROUP_BY_KEY,
        "combine_pandas": ORACLE_COMBINE_PANDAS,
        "pane_info": ORACLE_PANE_INFO,
        "keyed_variants": ORACLE_KEYED_VARIANTS,
        "map_with_resource": ORACLE_MAP_WITH_RESOURCE,
        "hash_filter": ORACLE_HASH_FILTER,
        "aggregate_by_key": ORACLE_AGGREGATE_BY_KEY,
        "aggregate_global": ORACLE_AGGREGATE_GLOBAL,
        "side_outputs": ORACLE_SIDE_OUTPUTS,
        "map_file": ORACLE_MAP_FILE,
        "allowed_lateness": ORACLE_ALLOWED_LATENESS,
        "refreshing_side_input": ORACLE_REFRESHING_SIDE_INPUT,
        "processing_time_panes": ORACLE_PROCESSING_TIME_PANES,
        "watermark_panes": ORACLE_WATERMARK_PANES,
        "vector_sum_by_key": ORACLE_VECTOR_SUM,
        "map_with_parallelism": ORACLE_MAP_WITH_PARALLELISM,
        "side_input_multimap": ORACLE_SIDE_INPUT_MULTIMAP,
        "dist_cache": ORACLE_DIST_CACHE,
        "streaming_session": ORACLE_STREAMING_SESSION,
        "csv_roundtrip": ORACLE_CSV_ROUNDTRIP,
        "json_roundtrip": ORACLE_JSON_ROUNDTRIP,
        "text_roundtrip": ORACLE_TEXT_ROUNDTRIP,
        "tfrecord_roundtrip": ORACLE_TFRECORD_ROUNDTRIP,
        "binary_roundtrip": ORACLE_BINARY_ROUNDTRIP,
        "object_roundtrip": ORACLE_OBJECT_ROUNDTRIP,
        "dynamic_destinations": ORACLE_DYNAMIC_DESTINATIONS,
        "jdbc_roundtrip": ORACLE_JDBC_ROUNDTRIP,
        "xml_roundtrip": ORACLE_XML_ROUNDTRIP,
        "avro_roundtrip": ORACLE_AVRO_ROUNDTRIP,
        "tfexample_roundtrip": ORACLE_TFEXAMPLE_ROUNDTRIP,
        "protobuf_roundtrip": ORACLE_PROTOBUF_ROUNDTRIP,
        "webdataset_roundtrip": ORACLE_WEBDATASET_ROUNDTRIP,
        "bpe_segment": ORACLE_BPE_SEGMENT,
        "substring_dedup": ORACLE_SUBSTRING_DEDUP,
        "zorder_layout": ORACLE_ZORDER_LAYOUT,
        "quantiles_tdigest": ORACLE_QUANTILES_TDIGEST,
        "element_count_panes": ORACLE_ELEMENT_COUNT_PANES,
        "semantic_dedup": ORACLE_SEMANTIC_DEDUP,
        "winnow_fingerprints": ORACLE_WINNOW_FINGERPRINTS,
        "dsir_select": ORACLE_DSIR_SELECT,
        "orc_roundtrip": ORACLE_ORC_ROUNDTRIP,
        "discarding_panes": ORACLE_DISCARDING_PANES,
        "contamination_report": ORACLE_CONTAMINATION_REPORT,
        "semantic_dedup_incremental": ORACLE_SEMANTIC_DEDUP_INCREMENTAL,
        "weighted_sample": ORACLE_WEIGHTED_SAMPLE,
        "image_decode": ORACLE_IMAGE_DECODE,
        "png_decode": ORACLE_PNG_DECODE,
        "jpeg_decode": ORACLE_JPEG_DECODE,
        "jpeg_progressive": ORACLE_JPEG_PROGRESSIVE,
        "jpeg12_decode": ORACLE_JPEG12_DECODE,
        "audio_g711": ORACLE_AUDIO_G711,
        "audio_adpcm": ORACLE_AUDIO_ADPCM,
        "audio_flac": ORACLE_AUDIO_FLAC,
        "audio_mp3_probe": ORACLE_AUDIO_MP3_PROBE,
        "tiff_decode": ORACLE_TIFF_DECODE,
        "video_probe": ORACLE_VIDEO_PROBE,
        "avi_audio": ORACLE_AVI_AUDIO,
        "audio_resample": ORACLE_AUDIO_RESAMPLE,
        "gif_decode": ORACLE_GIF_DECODE,
        "video_decode": ORACLE_VIDEO_DECODE,
        "video_mjpeg": ORACLE_VIDEO_MJPEG,
        "audio_decode": ORACLE_AUDIO_DECODE,
        "merge_upsert": ORACLE_MERGE_UPSERT,
        "bigram_lm": ORACLE_BIGRAM_LM,
        "interval_join": ORACLE_INTERVAL_JOIN,
        "arrow_roundtrip": ORACLE_ARROW_ROUNDTRIP,
        "fuzzy_join": ORACLE_FUZZY_JOIN,
        "k_anonymity": ORACLE_K_ANONYMITY,
        "capped_sessions": ORACLE_CAPPED_SESSIONS,
        "streaming_join": ORACLE_STREAMING_JOIN,
        "dedup_lines": ORACLE_DEDUP_LINES,
        "files_with_path": ORACLE_FILES_WITH_PATH,
        "curation_e2e": ORACLE_CURATION_E2E,
        # two-micro-batch incremental build of the same hourly rollup
        "continuous_rollup": ORACLE_STREAMING_WINDOW,
        "ann_lsh": ORACLE_ANN_LSH,
        "ann_hnsw": ORACLE_ANN_HNSW,
        "ann_hnsw_sharded": ORACLE_ANN_HNSW_SHARDED,
        "ann_pq_index": ORACLE_ANN_PQ_INDEX,
        "ann_ivfpq_index": ORACLE_ANN_IVFPQ_INDEX,
        "ann_ivf_appended": ORACLE_ANN_IVF_APPENDED,
        # ann_ivf probes every inverted list (n_probe = n_clusters), so its
        # output is the exact top-3 — same oracle as the brute-force baseline
        "ann_ivf": ORACLE_EMBEDDING_TOPK,
        "ann_ivf_streamed": ORACLE_EMBEDDING_TOPK,
    }
