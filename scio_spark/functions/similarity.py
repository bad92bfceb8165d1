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
    import numpy as np
    import pandas as pd

    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))

    # Stage 1 — GEMM candidates: per corpus Arrow batch, block × queriesᵀ;
    # keep per-query top-(k+4) with a 1e-6 margin (GEMM-vs-fold error is
    # ~1e-14, so the exact top-k cannot be outside the candidate set).
    def gen(batches):
        ids, mat = bc.value
        for pdf in batches:
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            b_ids = pdf[id_col].to_numpy()
            sims = mat @ block.T  # queries × block
            out_q, out_n = [], []
            kk = min(k + 4, sims.shape[1])
            for qi in range(sims.shape[0]):
                row = sims[qi]
                idx = (
                    np.argpartition(-row, kk - 1)[:kk]
                    if kk < len(row)
                    else np.arange(len(row))
                )
                keep = idx[b_ids[idx] != ids[qi]]
                out_q.extend([ids[qi]] * len(keep))
                out_n.extend(b_ids[keep])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    cands = corpus.select(id_col, vec_col).mapInPandas(
        gen, "query_id long, neighbor_id long"
    )
    # Stage 2 — exact sequential-fold rescore of candidates only, then the
    # global per-query top-k (candidates from every corpus block compete).
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
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
    n-gram/embedding).

    Two stages so the heavy lifting is BLAS, not per-pair expression
    evaluation:
    1. candidate generation — broadcast the (ids, matrix) block, numpy GEMM
       per Arrow batch (block × corpusᵀ), keep pairs ≥ threshold − 1e-6.
       GEMM-vs-fold float error is ~1e-14, so the margin cannot drop a true
       pair. At 100 TB the broadcast block becomes a loop over corpus blocks
       (block-matrix product), same code shape.
    2. exact rescoring — the deterministic sequential fold, only for the
       (few) candidates, so emitted scores are bit-identical to the oracle.
    """
    import numpy as np
    import pandas as pd

    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    bc = corpus.sparkSession.sparkContext.broadcast((ids, mat))
    margin = threshold - 1e-6

    def gen(batches):
        c_ids, c_mat = bc.value
        for pdf in batches:
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            b_ids = pdf[id_col].to_numpy()
            sims = block @ c_mat.T
            bi, cj = np.where(sims >= margin)
            keep = b_ids[bi] < c_ids[cj]
            yield pd.DataFrame(
                {"id_1": b_ids[bi][keep], "id_2": c_ids[cj][keep]}
            )

    cands = corpus.select(id_col, vec_col).mapInPandas(gen, "id_1 long, id_2 long")
    a = corpus.select(F.col(id_col).alias("id_1"), F.col(vec_col).alias("__a"))
    b = corpus.select(F.col(id_col).alias("id_2"), F.col(vec_col).alias("__b"))
    scored = (
        cands.join(a, "id_1")
        .join(b, "id_2")
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
