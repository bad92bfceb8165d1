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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scio_spark import ScioContext
from scio_spark.operators import joins as J

SF_SMOKE = "/root/testdata/sf0.001"


def _ctx(spark: SparkSession) -> ScioContext:
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
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
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("sum_base_price"),
            F.expr(
                "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"
            ).alias("sum_disc_price"),
            F.expr(
                "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE)"
            ).alias("sum_charge"),
            F.expr("SUM(l_quantity) / COUNT(*)").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out.df


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
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
        F.approx_count_distinct("l_returnflag", 0.01).alias("n_flags"),
        F.approx_count_distinct("l_linestatus", 0.01).alias("n_status"),
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


# ------------------------------------------------------------------ contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "top_orders": q_top_orders,
        "count_by_key": q_count_by_key,
        "count_by_value": q_count_by_value,
        "hash_join": q_hash_join,
        "top_by_key": q_top_by_key,
        "distinct": q_distinct,
        "sum_by_key": q_sum_by_key,
        "subtract_by_key": q_subtract_by_key,
        "intersect_by_key": q_intersect_by_key,
        "stats": q_stats,
        "approx_distinct": q_approx_distinct,
        "latest_by_key": q_latest_by_key,
        "cogroup": q_cogroup,
        "sparse_join": q_sparse_join,
        "multi_join": q_multi_join,
        "union_agg": q_union_distinct_by,
        "histogram": q_histogram,
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
        "multi_join": ORACLE_MULTI_JOIN,
        "union_agg": ORACLE_UNION,
        "histogram": ORACLE_HISTOGRAM,
    }
