"""Analytics-side pipeline: dimensional enrichment → multi-level rollup →
ranked windows → incremental table maintenance → multi-dim layout.

The OLAP counterpart to examples/dedup_pipeline.py: the shapes a
reporting/serving team runs daily over a fact table, each stage an
operator that is also individually oracle-checked in the contract suite.
Run: python examples/analytics_rollup.py [sf_dir] [out_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scio_spark import ScioContext  # noqa: E402
from scio_spark.functions.layout import zorder_by  # noqa: E402
from scio_spark.functions.sketches import rollup_agg  # noqa: E402
from scio_spark.functions.tdigest import tdigest_sketch  # noqa: E402
from scio_spark.operators.merge import merge_into  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/analytics_rollup"
    ctx = ScioContext()
    ctx.spark.sparkContext.setLogLevel("ERROR")
    spark = ctx.spark

    orders = ctx.parquet_file(f"{sf_dir}/orders.parquet").df
    customer = ctx.parquet_file(f"{sf_dir}/customer.parquet").df
    nation = ctx.parquet_file(f"{sf_dir}/nation.parquet").df

    # 1. dimensional enrichment: two broadcast joins — the fact side never
    # shuffles (Catalyst broadcasts the dims under the 64 MB threshold)
    enriched = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "o_orderkey", "o_totalprice", "o_orderstatus",
            F.to_date("o_orderdate").alias("order_date"),
            F.col("n_name").alias("nation"),
            "c_mktsegment",
        )
    )

    # 2. multi-level rollup (nation → segment → grand total) in ONE pass —
    # Catalyst's Expand node, partial-aggregated
    cube = rollup_agg(
        enriched,
        ["nation", "c_mktsegment"],
        [
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("revenue"),
        ],
    )
    cube.write.mode("overwrite").parquet(f"{out}/rollup")

    # 3. top-3 orders per nation (ranked window, total order)
    from pyspark.sql import Window

    w = Window.partitionBy("nation").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    top3 = (
        enriched.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3")
        .select("nation", "rank", "o_orderkey", "o_totalprice")
    )
    top3.write.mode("overwrite").parquet(f"{out}/top3")

    # 4. incremental maintenance: a corrections batch upserts into the
    # serving table rewriting ONLY the touched status partitions
    serving = f"{out}/serving"
    enriched.write.mode("overwrite").partitionBy("o_orderstatus").parquet(serving)
    corrections = enriched.filter("o_orderkey % 500 = 0").withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    merge_into(serving, corrections, keys=["o_orderkey"], partition_col="o_orderstatus")

    # 5. layout for 2-D pruning: the archive clustered on (nation-ish key,
    # date) so both predicates skip files via parquet min/max stats
    zorder_by(
        enriched.withColumn("nk", F.crc32("nation") % 1000),
        ["nk", "order_date"],
        n_partitions=4,
    ).write.mode("overwrite").parquet(f"{out}/archive")

    # 6. a mergeable revenue quantile artifact for tomorrow's batch
    td = tdigest_sketch(enriched, "o_totalprice")
    with open(f"{out}/revenue_tdigest.bin", "wb") as f:
        f.write(td.to_bytes())

    n = spark.read.parquet(serving).count()
    print(
        f"rollup rows: {cube.count()}, top3 rows: {top3.count()}, "
        f"serving rows after merge: {n}, revenue p50≈{td.quantile(0.5):.2f}, "
        f"p99≈{td.quantile(0.99):.2f}; outputs under {out}"
    )


if __name__ == "__main__":
    main()
