"""Training-data curation pipeline: PII scrub → quality-filter → exact
dedup → substring-level boilerplate strip → near-dup clustering (canonical
survivor per duplicate group) → train/val split → eval-set decontamination
→ BPE token accounting → sequence packing → deterministic training shards
(+ tf.Example and WebDataset exports, and a RAG chunk index on the side).

The canonical LLM-data flow this engine is built for (BASELINE.json north
star). Run: python examples/dedup_pipeline.py [sf_dir] [out_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scio_spark import ScioContext  # noqa: E402
from scio_spark.functions import dedup as D  # noqa: E402
from scio_spark.functions import substr_dedup as S  # noqa: E402
from scio_spark.functions import text as T  # noqa: E402
from scio_spark.functions.bpe import bpe_token_count, train_bpe  # noqa: E402
from scio_spark.sources import proto as P  # noqa: E402
from scio_spark.sources import webdataset as W  # noqa: E402
from scio_spark.functions.training import (  # noqa: E402
    hash_split,
    pack_sequences,
    training_shuffle,
    write_training_shards,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_docs"
    ctx = ScioContext()
    ctx.spark.sparkContext.setLogLevel("ERROR")

    docs = ctx.parquet_file(f"{sf_dir}/documents.parquet").df
    n0 = docs.count()

    # 0. PII redaction FIRST — nothing downstream (dedup hashes, shards,
    # chunk indexes) should ever see raw emails/phones/IPs. Pure chained
    # regexp_replace: fuses into the same scan as step 1.
    docs = docs.withColumn("text", T.scrub_pii("text"))

    # 1. quality gate (pure expressions, one scan)
    scored = docs.withColumn("quality", T.quality_score("text")).withColumn(
        "lang_pred", T.lang_id("text")
    )
    kept = scored.filter("quality >= 0.3")
    n1 = kept.count()

    # 2. exact dedup on normalized text (keep min doc_id)
    exact = D.exact_dedup(kept)
    n2 = exact.count()

    # 2b. substring-level boilerplate strip: duplicated 20-token spans are
    # removed everywhere but their corpus-first occurrence (ExactSubstr at
    # n-gram resolution; hash_grams ships 64-bit fingerprints through the
    # shuffle — the web-scale mode)
    exact = S.strip_duplicate_spans(
        exact, n=20, hash_grams=True
    ).drop("n_dup_tokens")

    # 3. near-dup removal, done right: MinHash-LSH pairs ≥ 0.8 Jaccard →
    # transitive closure into duplicate groups (connected_components) →
    # keep one canonical doc per group (min id). Pairwise "drop id_2" is
    # not closure-aware; clustering is. max_doc_freq caps boilerplate-
    # shingle fan-out (the web-scale knob — verification still scores full
    # shingle sets, so jaccard values are unchanged).
    pairs = D.minhash_lsh_dedup(exact, min_jaccard=0.8, max_doc_freq=100_000)
    labeled = D.dedup_clusters(exact, pairs)
    curated = labeled.filter(F.col("doc_id") == F.col("comp")).drop("comp")
    n3 = curated.count()

    # 4. deterministic train/val split — pure function of doc_id, so the
    # assignment never flips when the corpus is refreshed
    split = hash_split(curated, {"train": 0.98, "val": 0.02}, "doc_id")
    train = split.filter("split = 'train'").drop("split")
    val = split.filter("split = 'val'").drop("split")

    # 5. decontaminate: drop training docs sharing ≥2 distinct 3-grams with
    # the val set (GPT-3-style n-gram overlap check)
    dirty = D.ngram_contamination(train, val, min_overlap=2).select("doc_id")
    clean = train.join(dirty, "doc_id", "left_anti")
    n4 = clean.count()

    # 6. shuffle deterministically, pack documents into context windows
    # (greedy token-budget packing, partition-local — zero shuffle), and
    # write the reproducible shard layout for the trainer (one exchange)
    packed = pack_sequences(
        training_shuffle(clean.select("doc_id", "text"), "doc_id", seed=7),
        token_budget=2048,
    )
    n5 = packed.count()
    write_training_shards(clean, f"{out}/train", 8, "doc_id", seed=7)
    packed.write.mode("overwrite").parquet(f"{out}/packed")
    val.write.mode("overwrite").parquet(f"{out}/val")

    # 6b. tokenizer-accurate budget accounting: train a BPE on the clean
    # corpus (word-histogram training — the corpus never reaches the
    # driver) and record exact subword counts beside the whitespace
    # estimate the packer used
    merges = train_bpe(clean, "text", n_merges=500, max_words=20_000)
    token_stats = clean.select(
        F.sum(bpe_token_count(F.col("text"), merges)).alias("bpe_tokens"),
        F.sum(T.token_count(F.col("text"))).alias("ws_tokens"),
    ).head()

    # 6c. trainer-facing exports: tf.Example TFRecords (the TF ingest
    # format) and a WebDataset tar layout (the torch streaming format) —
    # both one file per task, schema-stable
    P.save_as_tf_example(
        clean.select("doc_id", "source", "text"), f"{out}/tfexample"
    )
    W.save_as_webdataset(
        clean.select(F.col("doc_id").cast("string").alias("key"), "text", "source"),
        f"{out}/webdataset",
        "key",
        {"text": "txt", "source": "cls"},
    )

    # 7. side artifact: RAG chunk index over the curated corpus
    # (sliding 64-token windows, exchange-free)
    T.chunk_text(clean, chunk_tokens=64, overlap=16).write.mode(
        "overwrite"
    ).parquet(f"{out}/chunks")

    print(
        f"{n0} docs → quality {n1} → exact-dedup {n2} → cluster-dedup {n3} "
        f"→ decontaminated {n4} → {n5} packed sequences "
        f"({token_stats.bpe_tokens} BPE tokens vs {token_stats.ws_tokens} "
        f"whitespace); shards at {out}/train, packed at {out}/packed, "
        f"val at {out}/val, tf.Example at {out}/tfexample, WebDataset at "
        f"{out}/webdataset, chunk index at {out}/chunks"
    )


if __name__ == "__main__":
    main()
