"""Mixture + batching-layout pipeline: dominant-source cap → per-source
token quota → deterministic weighted mixture → global shuffle positions →
concat-and-chunk packing → equal-frequency length buckets → cumulative
token accounting.

The layout half of training-data curation (examples/dedup_pipeline.py is
the cleaning half): everything here is a pure function of (seed, ids) —
re-running reproduces the same corpus layout bit-for-bit — and every
global-order computation runs through the distributed prefix scan
(operators/scan.py), never a single-partition window.
Run: python examples/mixture_layout.py [sf_dir] [out_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scio_spark import ScioContext  # noqa: E402
from scio_spark.functions.training import (  # noqa: E402
    cap_per_key,
    length_buckets,
    mixture_sample,
    pack_chunks,
    shuffle_positions,
    token_quota_per_key,
)
from scio_spark.operators.scan import running_agg  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mixture_layout"
    ctx = ScioContext()
    ctx.spark.sparkContext.setLogLevel("ERROR")

    docs = ctx.parquet_file(f"{sf_dir}/documents.parquet").df

    # 1. dominant-source guard: no source contributes more than 60 docs
    capped = cap_per_key(docs, "source", 60, "doc_id", seed=7)

    # 2. token-denominated quota per source (~5k tokens each)
    quota = token_quota_per_key(capped, "source", 5000, "doc_id", seed=7)

    # 3. weighted mixture: upweight the en slice, downsample the rest
    en = quota.filter(F.col("lang") == "en").drop("__tokens")
    rest = quota.filter(F.col("lang") != "en").drop("__tokens")
    mixed = mixture_sample(
        {"en": (en.drop("source"), 1.0), "other": (rest.drop("source"), 0.5)},
        seed=7,
    )

    # 4. reproducible global shuffle, materialized as positions
    placed = shuffle_positions(mixed, "doc_id", seed=11)

    # 5. concat-and-chunk packing at a 256-token budget, in shuffle order
    chunks = pack_chunks(placed, 256, id_col="pos")
    n_chunks = chunks.agg(F.countDistinct("chunk_id")).collect()[0][0]

    # 6. equal-frequency length buckets for padding-flat batch assembly
    buckets = length_buckets(mixed, 4)
    buckets.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__tokens").alias("lo"),
        F.max("__tokens").alias("hi"),
    ).orderBy("bucket").show()

    # 7. cumulative token accounting over the shuffled order (two-phase
    # scan — the 100 TB-safe running total)
    ledger = running_agg(
        placed.withColumn("__tokens", F.col("n_chars").cast("long")),
        "pos",
        "__tokens",
        out_col="cum_tokens",
    )
    ledger.select("doc_id", "pos", "cum_tokens").orderBy(F.desc("pos")).limit(
        5
    ).show()

    chunks.select("doc_id", "chunk_id").write.mode("overwrite").parquet(
        f"{out}/chunks"
    )
    print(
        f"mixture_layout: {docs.count()} docs -> {mixed.count()} mixed -> "
        f"{n_chunks} chunks"
    )


if __name__ == "__main__":
    main()
