"""Similarity search over embedding columns (array<float>).

Reference analog: scio's ANN side inputs — Annoy (scio-extra annoy/package.scala)
and Voyager/HNSW (scio-extra voyager/syntax/SCollectionSyntax.scala:47-215) —
broadcast an index and look up per element. Spark-first re-expression:

- **brute-force cosine top-k** (the correctness baseline): query-set ⋈ corpus
  with a JVM-side `aggregate(zip_with(...))` dot product. For a broadcast-sized
  query set this is a single corpus scan — no shuffle of the corpus — and
  whole-stage-codegen'd (no Python).
- **LSH-bucketed top-k** (the scale path): random-hyperplane signs bucket both
  sides; only same-bucket pairs are scored. Hyperplanes are derived
  deterministically from md5 so plans are reproducible. With b-bit signatures
  the corpus scan fans out b× less than brute force at equal recall targets.
- an HNSW/Voyager-style broadcast index would slot in as mapInPandas over a
  broadcast artifact (import-gated; hnswlib not in this image — see
  multimodal.py for the gating pattern).

Embeddings in the fixture are L2-normalized, so cosine == dot product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    """Sequential left-fold dot product in double — deterministic and
    identical to the DuckDB oracle's ordered SUM."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int | None = 5,
) -> DataFrame:
    """Exact top-k by cosine for each query vector (vectors pre-normalized ⇒
    dot product): (query_id, neighbor_id, score, rank).

    Plan shape: broadcast(queries) ⋈ corpus (no corpus shuffle), then a
    top-k window partitioned by query — AQE sizes the single shuffle."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", _dot(F.col("__qv"), F.col("__cv")))
    )
    if score_decimals is not None:
        scored = scored.withColumn("score", F.round("score", score_decimals))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_dedup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int | None = 5,
) -> DataFrame:
    """Embedding-cosine near-dup detection: all pairs (id_1 < id_2) with
    cosine ≥ threshold — the 5th dedup family (exact/MinHash/SimHash/
    n-gram/embedding). Brute-force all-pairs here (the correctness
    baseline); the scale path buckets with hyperplane_signature or IVF
    centroids first, so only same-bucket pairs are scored."""
    a = corpus.select(F.col(id_col).alias("id_1"), F.col(vec_col).alias("__a"))
    b = corpus.select(F.col(id_col).alias("id_2"), F.col(vec_col).alias("__b"))
    scored = (
        a.crossJoin(b)
        .filter(F.col("id_1") < F.col("id_2"))
        .withColumn("score", _dot(F.col("__a"), F.col("__b")))
    )
    if score_decimals is not None:
        scored = scored.withColumn("score", F.round("score", score_decimals))
    return scored.filter(F.col("score") >= threshold).select("id_1", "id_2", "score")


def hyperplane_signature(df: DataFrame, id_col: str, vec_col: str, bits: int = 8, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH signature: bit_i = sign(v · h_i), with h_i[j]
    = ±1 derived from md5(f"{i}:{j}") parity — deterministic, no RNG state.

    Computed as a single JVM expression per bit (no shuffle)."""
    import hashlib

    sig_bits = []
    for i in range(bits):
        # ±1 pattern for hyperplane i, baked into the plan as literals
        signs = [
            1.0 if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:4], 16) % 2 else -1.0
            for j in range(dim)
        ]
        arr = F.array(*[F.lit(s) for s in signs])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig_bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** i))
    sig = sig_bits[0]
    for b in sig_bits[1:]:
        sig = sig + b
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only same-bucket pairs. Recall is tunable via
    ``bits`` (fewer bits → bigger buckets → higher recall & cost). Tested
    against brute force for recall, not oracle-matched (approximate)."""
    csig = hyperplane_signature(corpus, id_col, vec_col, bits, dim).withColumnRenamed(
        id_col, "neighbor_id"
    )
    qsig = hyperplane_signature(queries, id_col, vec_col, bits, dim).withColumnRenamed(
        id_col, "query_id"
    )
    scored = (
        csig.join(F.broadcast(qsig.withColumnRenamed(vec_col, "__qv")), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", _dot(F.col("__qv"), F.col(vec_col)))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
