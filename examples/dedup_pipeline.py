"""Training-data curation pipeline: quality-filter → exact dedup →
MinHash-LSH near-dup removal → curated parquet.

The canonical LLM-data flow this engine is built for (BASELINE.json north
star). Run: python examples/dedup_pipeline.py [sf_dir] [out_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scio_spark import ScioContext  # noqa: E402
from scio_spark.functions import dedup as D  # noqa: E402
from scio_spark.functions import text as T  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_docs"
    ctx = ScioContext()
    ctx.spark.sparkContext.setLogLevel("ERROR")

    docs = ctx.parquet_file(f"{sf_dir}/documents.parquet").df
    n0 = docs.count()

    # 1. quality gate (pure expressions, one scan)
    scored = docs.withColumn("quality", T.quality_score("text")).withColumn(
        "lang_pred", T.lang_id("text")
    )
    kept = scored.filter("quality >= 0.3")
    n1 = kept.count()

    # 2. exact dedup on normalized text (keep min doc_id)
    exact = D.exact_dedup(kept)
    n2 = exact.count()

    # 3. near-dup removal: MinHash-LSH pairs ≥ 0.8 Jaccard → drop the larger
    # id; max_doc_freq caps boilerplate-shingle fan-out (the web-scale knob —
    # verification still scores full shingle sets, so values are unchanged)
    pairs = D.minhash_lsh_dedup(exact, min_jaccard=0.8, max_doc_freq=100_000)
    drop = pairs.select(F.col("id_2").alias("doc_id")).distinct()
    curated = exact.join(drop, "doc_id", "left_anti")
    n3 = curated.count()

    curated.write.mode("overwrite").parquet(out)
    print(
        f"{n0} docs → quality {n1} → exact-dedup {n2} → near-dedup {n3}; "
        f"written to {out}"
    )


if __name__ == "__main__":
    main()
