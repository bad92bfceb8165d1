"""Target-domain selection pipeline: winnowing plagiarism screen →
SemDeDup semantic near-dup removal → DSIR importance selection toward a
small target corpus → quantile-bucket curriculum labels.

The round-6 curation stack end-to-end: pick raw documents that LOOK like
a high-quality target domain, after stripping exact-passage reuse
(winnowing fingerprints, the MOSS algorithm) and embedding-space
near-duplicates (SemDeDup), then bucket the survivors by length deciles
off a t-digest (no global sort) for curriculum ordering.

Run: python examples/target_domain_selection.py [sf_dir] [out_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scio_spark import ScioContext  # noqa: E402
from scio_spark.functions.dsir import dsir_select  # noqa: E402
from scio_spark.functions.semdedup import (  # noqa: E402
    semantic_dedup,
    semantic_dedup_stats,
)
from scio_spark.functions.tdigest import quantile_buckets  # noqa: E402
from scio_spark.functions.text import winnow_fingerprints  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/selected_docs"
    ctx = ScioContext()
    ctx.spark.sparkContext.setLogLevel("ERROR")

    docs = ctx.parquet_file(f"{sf_dir}/documents.parquet").df
    emb = ctx.parquet_file(f"{sf_dir}/embeddings.parquet").df

    # 1. winnowing screen: drop docs that share >= 3 local fingerprints
    # with an earlier doc (passage-level reuse the token-sort key misses)
    fps = winnow_fingerprints(docs, "doc_id", "text", k=5, w=4)
    reused = (
        fps.alias("a")
        .join(fps.alias("b"), "fp")
        .filter("a.doc_id > b.doc_id")
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.countDistinct("fp").alias("n_shared"))
        .filter("n_shared >= 3")
        .select("doc_id")
    )
    clean = docs.join(reused, "doc_id", "left_anti")
    print(f"winnowing screen: {docs.count()} -> {clean.count()} docs")

    # 2. SemDeDup over the embedding table (vec_id keys align with docs
    # in this fixture's id space modulo size)
    marked = semantic_dedup(
        emb.select("vec_id", "embedding"),
        "vec_id",
        "embedding",
        n_clusters=8,
        eps=0.45,
    )
    stats = semantic_dedup_stats(marked).orderBy("centroid")
    print("semantic near-dup clusters:")
    for r in stats.collect():
        print(f"  cluster {r.centroid}: {r.n_items} items, {r.n_dups} dups")

    # 3. DSIR: select the 150 most target-like survivors (target domain =
    # the English slice; raw pool = everything else)
    raw = clean.filter("lang <> 'en'").select("doc_id", "lang", "text")
    target = clean.filter("lang = 'en'").select("text")
    picked = dsir_select(raw, target, k=150, buckets=8192, mode="gumbel")
    print(f"DSIR selected {picked.count()} docs toward the 'en' domain")

    # 4. curriculum labels: length deciles via the t-digest (sketch pass +
    # broadcast thresholds — no global sort at any corpus size)
    selected = picked.join(clean, "doc_id").withColumn(
        "len", F.length("text").cast("double")
    )
    final = quantile_buckets(selected, "len", n_buckets=10, out_col="decile")
    final.select("doc_id", "lang", "n_tokens", "decile").write.mode(
        "overwrite"
    ).parquet(out)
    print(f"wrote {final.count()} curriculum-labeled docs to {out}")


if __name__ == "__main__":
    main()
