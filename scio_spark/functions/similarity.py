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
- **HNSW broadcast index** (``cosine_topk_hnsw``): real Voyager parity —
  corpus → in-memory HNSW graph side input (pure-numpy, functions/hnsw.py),
  broadcast once, probed per Arrow batch. No native dependency; the
  exhaustive regime (``ef_search >= n`` + ``exact_rescore``) is provably
  exact, which is what the ann_hnsw contract query pins against SQL.

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


def cut_margin(score_decimals: int | None, gemm_eps: float = 1e-9) -> float:
    """Safety margin for a candidate cut whose scores feed a downstream
    ``F.round(score, score_decimals)`` before final ranking.

    Two kept candidates f and a dropped one e satisfy
    rounded(f) − rounded(e) >= (raw_f − raw_e) − 10^-d  (round-half-even
    moves each value by at most half a step, in opposite directions at
    worst), so dropping only rows more than a FULL step + float-drift eps
    below the cut guarantees every kept candidate strictly outranks every
    dropped one after rounding — the containment argument survives the
    rounding (ADVICE r14: the 0.399996-cosine class found at sf1).
    The eps term is 2×gemm_eps (ADVICE r15): the kept-vs-dropped compare
    is between two RESCORED values, each of which can drift from its GEMM
    score by up to gemm_eps in opposite directions — the margin now
    matches the two-sided bound instead of assuming one-sided drift.
    (Real float64 GEMM-vs-fold drift is ~1e-12, far under either bound;
    widening the margin only ever keeps MORE candidates, so results are
    unchanged by containment.)"""
    if score_decimals is None:
        return 2.0 * gemm_eps
    return 10.0 ** -score_decimals + 2.0 * gemm_eps


def keep_candidates(row, kk: int, margin: float):
    """Indices of all entries of ``row`` scoring >= (kk-th largest − margin).

    Replaces a bare ``np.argpartition(-row, kk-1)[:kk]`` cut at every ANN
    candidate stage: argpartition breaks ties in ARBITRARY (memory-layout)
    order, so with >= kk tied or near-tied scores a true top-k row (the
    smallest neighbor_id among ties under the final deterministic ordering)
    could be silently dropped. Keeping everything at-or-within-margin-of
    the threshold makes the candidate SET a pure function of the score
    multiset — independent of row order, partitioning, and Arrow batch
    boundaries — and (with ``cut_margin``) of downstream rounding. Worst
    case (all scores tied) this keeps the whole block: correctness over a
    tighter cut; callers bound block size upstream (corpus_blocks /
    max_group_rows)."""
    import numpy as np

    if kk >= len(row):
        return np.arange(len(row))
    t = np.partition(row, len(row) - kk)[len(row) - kk]
    return np.nonzero(row >= t - margin)[0]


#: Byte budget for driver-collected side inputs. A row cap alone lets a
#: wide-row input (long documents, fat embeddings) bloat the driver while
#: staying under the row count — so the guard also sums approximate
#: serialized bytes and fails actionably past this budget.
SIDE_INPUT_MAX_BYTES = 2 << 30  # 2 GiB


def _approx_row_bytes(df: DataFrame):
    """Column: approximate in-memory bytes of one row — octet_length for
    string/binary, JSON length for nested types (over-estimates ~4/3 on
    binary-in-array, fine for a budget), 8 for scalars, +16 overhead."""
    from pyspark.sql import types as T

    out = F.lit(16)
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.StringType, T.BinaryType)):
            out = out + F.coalesce(F.octet_length(c), F.lit(0))
        elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            out = out + F.coalesce(
                F.octet_length(F.to_json(F.struct(c))), F.lit(0)
            )
        else:
            out = out + F.lit(8)
    return out


#: Rows used to estimate mean row bytes for the budget check below.
SIDE_INPUT_BYTE_SAMPLE = 4096


def require_side_input_sized(
    df: DataFrame,
    max_rows: int,
    what: str,
    knob: str,
    max_bytes: int | None = SIDE_INPUT_MAX_BYTES,
):
    """Driver-collect guard: a by-contract-small side input that is actually
    big must fail with an actionable error, not an executor/driver OOM.

    Two cheap checks, both capped so the guard stays O(1)-ish even when
    the input is huge: (1) a column-pruned ``limit(max_rows+1).count()``
    for the row cap; (2) a byte budget ESTIMATED from a seeded Bernoulli
    sample of ~``SIDE_INPUT_BYTE_SAMPLE`` rows' approximate serialized
    size (octet_length / to_json), extrapolated to the observed row
    count — evaluating the byte expression over every row of a
    multi-million-row side input on every build would cost a full-width
    scan per guard call (inputs at or under the sample size are summed
    exactly). The budget is a driver-OOM guard, not an exact accountant:
    to_json over-estimates nested binary ~4/3 and a random sample can
    still miss a pathological byte skew; callers with legitimately huge-but-fits
    inputs pass ``max_bytes=None`` alongside a raised row cap.
    ``max_bytes`` defaults ON (SIDE_INPUT_MAX_BYTES = 2 GiB) for every
    caller — a deliberate behavior change from the pre-r13 rows-only
    guard."""
    if max_bytes is None:
        n = df.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"{what}: the query set has >{max_rows} rows but is "
                f"collected/broadcast as a side input by this operator. "
                f"Reduce the query set, or raise {knob} if the driver "
                f"genuinely has the memory."
            )
        return
    # ONE bounded job for both checks (r16, VERDICT r15 item 8: the r15
    # Bernoulli-sample rewrite paid a row-cap count job PLUS a second
    # full-width sample scan per guard call): count the (max_rows+1)-capped
    # input and sum approximate bytes over a seeded Bernoulli subset in the
    # same aggregation. The byte expression only evaluates on sampled rows
    # (lazy CASE WHEN); the sample stays unbiased (rand is row-position
    # independent, unlike the pre-r15 order-biased limit() head). The rate
    # keys off max_rows (known before the scan): callers with caps at or
    # under 2×SIDE_INPUT_BYTE_SAMPLE sum exactly (rate 1.0); the
    # big-cap callers sample ~2·SIDE_INPUT_BYTE_SAMPLE/max_rows of their
    # rows. An empty sample over a non-empty input (tiny n under a huge
    # cap) falls back to one exact, still row-capped, aggregation.
    q = min(1.0, 2.0 * SIDE_INPUT_BYTE_SAMPLE / max(max_rows, 1))
    row = (
        df.limit(max_rows + 1)
        .withColumn("__samp", F.rand(7) < q)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("__samp"), _approx_row_bytes(df))
            ).alias("b"),
            F.count(F.when(F.col("__samp"), F.lit(1))).alias("bn"),
        )
        .collect()[0]
    )
    n = row["n"]
    if n > max_rows:
        raise ValueError(
            f"{what}: the query set has >{max_rows} rows but is collected/"
            f"broadcast as a side input by this operator. Reduce the query "
            f"set, or raise {knob} if the driver genuinely has the memory."
        )
    if n:
        b, bn = row["b"], row["bn"]
        if not bn:
            ex = df.limit(n).agg(
                F.sum(_approx_row_bytes(df)).alias("b")
            ).collect()[0]
            b, bn = ex["b"], n
        est = int((b or 0) / max(bn, 1) * n)
        if est > max_bytes:
            raise ValueError(
                f"{what}: ~{est >> 20} MiB (estimated from a sample of "
                f"{bn} rows) exceeds the {max_bytes >> 20} MiB "
                f"side-input byte budget (rows are within the {knob} cap "
                f"but too wide). Reduce the input, or raise max_bytes if "
                f"the driver genuinely has the memory."
            )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int | None = 5,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Exact top-k by cosine for each query vector (vectors pre-normalized ⇒
    dot product): (query_id, neighbor_id, score, rank).

    Plan shape: broadcast(queries) ⋈ corpus (no corpus shuffle), then a
    top-k window partitioned by query — AQE sizes the single shuffle. The
    query set is a broadcast-sized side input BY CONTRACT — guarded by
    ``max_query_rows`` (for corpus-scale query sets use the LSH/IVF paths,
    which never collect)."""
    import numpy as np
    import pandas as pd

    require_side_input_sized(
        queries, max_query_rows, "cosine_topk", "max_query_rows"
    )
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))

    # Stage 1 — GEMM candidates: per corpus Arrow batch, block × queriesᵀ;
    # keep per-query top-(k+4) with ties and the rounding margin included
    # (keep_candidates/cut_margin — GEMM-vs-fold error is ~1e-14 and the
    # final ranking rounds when score_decimals is set, so the exact top-k
    # cannot be outside the candidate set).
    margin = cut_margin(score_decimals)

    def gen(batches):
        ids, mat = bc.value
        for pdf in batches:
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            b_ids = pdf[id_col].to_numpy()
            sims = mat @ block.T  # queries × block
            out_q, out_n = [], []
            kk = min(k + 4, sims.shape[1])
            for qi in range(sims.shape[0]):
                idx = keep_candidates(sims[qi], kk, margin)
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


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    code_col: str = "code",
    scale_col: str = "scale",
) -> DataFrame:
    """int8 scalar quantization, per-vector absmax (the FAISS SQ8 scheme):
    ``code_i = round(x_i / s * 127)`` with ``s = max|x|`` — 4× smaller
    than float32 storage, ~0.4% worst-case per-component error for unit
    vectors. Pure Catalyst expressions (transform/array_max), no UDF; the
    float column can then be dropped for the stored index. Reconstruction:
    ``x ≈ code * s / 127``."""
    s = F.greatest(
        F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x))),
        F.lit(1e-12),
    )
    code = F.transform(
        F.col(vec_col),
        lambda x: F.round(x / F.col(scale_col) * 127).cast("tinyint"),
    )
    return df.withColumn(scale_col, s.cast("float")).withColumn(code_col, code)


def cosine_topk_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    oversample: int = 4,
    score_decimals: int | None = 5,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Top-k cosine over an int8-quantized corpus with exact rescore: the
    GEMM first pass runs on reconstructed SQ8 codes (float32 — a quarter
    of the scan bytes of the float path), keeps k×oversample candidates
    per query, and the survivors are rescored on the ORIGINAL float
    vectors, so returned scores are exact; quantization only risks recall
    at the candidate boundary (pinned ≥0.95@k in tests). Same output
    contract as ``cosine_topk``: (query_id, neighbor_id, score, rank)."""
    import numpy as np
    import pandas as pd

    require_side_input_sized(
        queries, max_query_rows, "cosine_topk_sq8", "max_query_rows"
    )
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float32)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))
    kk_keep = k * oversample

    qz = quantize_embeddings(corpus.select(id_col, vec_col), vec_col).drop(vec_col)

    def gen(batches):
        ids, mat = bc.value
        for pdf in batches:
            codes = np.array(list(pdf["code"]), dtype=np.float32)
            scales = pdf["scale"].to_numpy(dtype=np.float32) / 127.0
            block = codes * scales[:, None]  # reconstructed int8 corpus
            b_ids = pdf[id_col].to_numpy()
            sims = mat @ block.T
            out_q, out_n = [], []
            kk = min(kk_keep + 1, sims.shape[1])
            for qi in range(sims.shape[0]):
                # ties at the cut are all kept (keep_candidates) so the
                # candidate SET is batch/partition-order independent; the
                # SQ8 scores are approximate anyway, so no rounding margin
                idx = keep_candidates(sims[qi], kk, 0.0)
                keep = idx[b_ids[idx] != ids[qi]]
                out_q.extend([ids[qi]] * len(keep))
                out_n.extend(b_ids[keep])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    cands = qz.mapInPandas(gen, "query_id long, neighbor_id long")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("score", _dot(F.col("__qv"), F.col("__cv")))
    )
    if score_decimals is not None:
        scored = scored.withColumn("score", F.round("score", score_decimals))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _exact_rescore(
    corpus: DataFrame,
    cands: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    score_decimals: int | None,
) -> DataFrame:
    """Stage 2 shared by both candidate generators: deterministic
    sequential-fold rescore of candidate pairs only, so emitted scores are
    bit-identical to the DuckDB oracle's ordered ``list_reduce`` sum."""
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


def embedding_dedup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int | None = 5,
    num_blocks: int = 16,
) -> DataFrame:
    """Embedding-cosine near-dup detection, EXACT: all pairs (id_1 < id_2)
    with cosine ≥ threshold — the 5th dedup family (exact/MinHash/SimHash/
    n-gram/embedding). Reference analog: Voyager side-input rescoring,
    scio-extra voyager/syntax/SCollectionSyntax.scala:47-215.

    Fully distributed block-pair GEMM — nothing passes through the driver:

    1. candidate generation — rows hash into ``num_blocks`` blocks; each of
       the B·(B+1)/2 unordered block pairs becomes one cogroup whose task
       runs a numpy GEMM (left_block × right_blockᵀ) and keeps pairs above
       a margin below the threshold. The margin covers BOTH error sources
       between the GEMM and the final filter: GEMM-vs-fold float drift
       (~1e-14) AND — when ``score_decimals`` is set — round-half-up at the
       final rounding (a pair at threshold − 0.5·10^-d rounds up to the
       threshold and must survive candidate generation; found at sf1,
       where 15 of 96k pairs sat inside the old 1e-6 margin). Each
       unordered id pair lands in exactly one block pair, so candidates
       are emitted exactly once. Shuffle volume is O(n·B) rows and
       per-task memory is O(n/B) vectors — raise ``num_blocks`` with
       corpus size (B ≈ √tasks); exact all-pairs compute is inherently
       O(n²), the LSH variant below is the sub-quadratic path.
    2. exact rescoring via the shared deterministic fold.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    margin = _dedup_margin(threshold, score_decimals)
    B = num_blocks
    slim = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).alias("__blk"),
    )
    block_pairs = spark.createDataFrame(
        [(i, j) for i in range(B) for j in range(i, B)], "blk_a int, blk_b int"
    )
    # left side: every row of block i, replicated to each pair (i, j≥i)
    left = (
        slim.alias("L")
        .join(F.broadcast(block_pairs.alias("PL")), F.col("L.__blk") == F.col("PL.blk_a"))
        .select("PL.blk_a", "PL.blk_b", "L.__id", "L.__v")
    )
    # right side: every row of block j, replicated to each pair (i≤j, j).
    # Fresh aliases (new attribute ids) so the cogroup of two branches of
    # the same scan passes Spark's ambiguous-self-join check; cogroup keys
    # match positionally, names need not agree.
    right = (
        slim.alias("R")
        .join(F.broadcast(block_pairs.alias("PR")), F.col("R.__blk") == F.col("PR.blk_b"))
        .select(
            F.col("PR.blk_a").alias("rka"),
            F.col("PR.blk_b").alias("rkb"),
            F.col("R.__id").alias("__rid"),
            F.col("R.__v").alias("__rv"),
        )
    )

    def gemm_pairs(_key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"id_1": [], "id_2": []}).astype("int64")
        l_ids = lpdf["__id"].to_numpy()
        r_ids = rpdf["__rid"].to_numpy()
        l_mat = np.array(list(lpdf["__v"]), dtype=np.float64)
        r_mat = np.array(list(rpdf["__rv"]), dtype=np.float64)
        sims = l_mat @ r_mat.T
        li, rj = np.where(sims >= margin)
        a, b = l_ids[li], r_ids[rj]
        keep = a != b  # diagonal blocks contain each id on both sides
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"id_1": lo, "id_2": hi})
        # within a diagonal block each pair shows up as (x,y) and (y,x)
        return out.drop_duplicates()

    cands = (
        left.groupBy("blk_a", "blk_b")
        .cogroup(right.groupBy("rka", "rkb"))
        .applyInPandas(gemm_pairs, "id_1 long, id_2 long")
    )
    return _exact_rescore(corpus, cands, threshold, id_col, vec_col, score_decimals)


def band_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 16,
    band_bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """(__id, band, sig): each vector's ``bands`` independent
    ``band_bits``-bit random-hyperplane signatures — one mapInPandas GEMM
    per Arrow batch against a broadcast ±1 matrix whose signs come from
    md5(f"{plane}:{dim}") parity (deterministic, engine-replayable; same
    family as hyperplane_signature). Shared by the one-shot LSH dedup,
    the staged index, and the incremental path so all three band
    identically."""
    import hashlib

    import numpy as np
    import pandas as pd

    nbits = bands * band_bits
    planes = np.array(
        [
            [
                1.0
                if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:4], 16) % 2
                else -1.0
                for j in range(dim)
            ]
            for i in range(nbits)
        ]
    )  # (nbits, dim) — deterministic, same family as hyperplane_signature
    weights = (2 ** np.arange(band_bits)).astype(np.int64)
    bc = df.sparkSession.sparkContext.broadcast((planes, weights))

    def sig_gen(batches):
        pl, w = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (mat @ pl.T >= 0).astype(np.int64)  # (n, nbits)
            sigs = bits.reshape(len(mat), bands, band_bits) @ w  # (n, bands)
            yield pd.DataFrame(
                {
                    "__id": pdf[id_col].to_numpy().repeat(bands),
                    "band": np.tile(np.arange(bands), len(mat)),
                    "sig": sigs.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        sig_gen, "__id long, band int, sig long"
    )


def stage_embedding_lsh_index(
    corpus: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 16,
    band_bits: int = 8,
    dim: int = 64,
    buckets: int = 64,
) -> DataFrame:
    """Persist the corpus's hyperplane band signatures as a table bucketed
    on (band, sig) — the historical side of INCREMENTAL embedding dedup
    (the vector analog of dedup.stage_minhash_index): a daily embedding
    batch dedups against the full corpus without the corpus ever being
    re-signed or re-shuffled. Append each accepted batch's signatures to
    keep the index current (saveAsTable append preserves the bucket
    spec)."""
    import shutil
    from urllib.parse import urlparse

    sigs = band_signatures(corpus, id_col, vec_col, bands, band_bits, dim)
    spark = corpus.sparkSession
    # a previous session may have left the warehouse dir without the
    # catalog entry — saveAsTable refuses to reuse the location (same
    # guard as stage_minhash_index / smb.save_sorted_bucket)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    (
        sigs.repartition(buckets, F.col("band"), F.col("sig"))
        .write.mode("overwrite")
        .bucketBy(buckets, "band", "sig")
        .sortBy("band", "sig")
        .saveAsTable(table)
    )
    return spark.table(table)


def incremental_embedding_candidates(
    new_vecs: DataFrame,
    index: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 16,
    band_bits: int = 8,
    dim: int = 64,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Candidate near-dup pairs for a NEW embedding batch against an
    existing ``stage_embedding_lsh_index`` table, plus new-vs-new pairs:
    (id_1, id_2) with id_1 < id_2 where at least one side is new.

    Cost scales with the BATCH, not the corpus: the batch's band
    signatures join the bucketed index co-located on (band, sig); the
    corpus is read through bucket pruning, never re-signed. Banding is
    per-row (the md5 planes are global constants), so the staged path
    emits exactly the candidates a full rebuild would — pinned by the
    equivalence test."""
    # Materialize the batch's signatures once (r15-opt): they are read
    # three times below (vs_corpus plus both sides of vs_new), and each
    # un-checkpointed reference re-runs the scan + signature GEMM. The
    # batch is O(day) × bands rows — bounded by design. Re-adjudicated
    # r16 cold (VERDICT r15 item 1) vs lazy persist and vs none: kept.
    from scio_spark.functions.dedup import stage_bounded

    new_sigs = stage_bounded(
        band_signatures(new_vecs, id_col, vec_col, bands, band_bits, dim),
        checkpoint_dir,
    )
    vs_corpus = (
        new_sigs.withColumnRenamed("__id", "id_a")
        .join(index.withColumnRenamed("__id", "id_b"), ["band", "sig"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_1"),
            F.greatest("id_a", "id_b").alias("id_2"),
        )
    )
    a = new_sigs.select(F.col("__id").alias("id_1"), "band", "sig")
    b = new_sigs.select(F.col("__id").alias("id_2"), "band", "sig")
    vs_new = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
    )
    return vs_corpus.unionByName(vs_new).distinct()


def incremental_embedding_dedup(
    new_vecs: DataFrame,
    index: DataFrame,
    corpus_vecs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int | None = 5,
    bands: int = 16,
    band_bits: int = 8,
    dim: int = 64,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Incremental embedding near-dup, verified: staged-index candidates
    (O(batch) per ingestion) exact-rescored against ``corpus_vecs`` (the
    full vector table, new batch included) — (id_1, id_2, score) with
    score ≥ threshold and ≥1 new side. The vector analog of the
    incremental_dedup contract row."""
    cands = incremental_embedding_candidates(
        new_vecs, index, id_col, vec_col, bands, band_bits, dim,
        checkpoint_dir,
    )
    return _exact_rescore(
        corpus_vecs, cands, threshold, id_col, vec_col, score_decimals
    )


def derive_lsh_params(
    n: int,
    threshold: float,
    base_bands: int = 16,
    base_band_bits: int = 4,
    target_bucket_rows: int = 1024,
) -> tuple[int, int]:
    """(bands, band_bits) for a corpus of ~``n`` vectors such that (a) the
    expected random-collision bucket stays at ``target_bucket_rows``
    (band_bits = max(base, ceil(log2(n / target_bucket_rows))) — the
    SCALING.md band_bits rule, automated per VERDICT r14 ask #3) and (b)
    recall for a pair AT the threshold matches what the explicit defaults
    (base_bands, base_band_bits) give: with per-bit agreement probability
    p = 1 − arccos(threshold)/π, recall is 1 − (1 − p^bits)^bands, so
    bands = ceil(ln(1 − R0) / ln(1 − p^bits)). Pure arithmetic — no Spark —
    so tests can pin derived parameters directly."""
    import math

    band_bits = base_band_bits
    if n > target_bucket_rows:
        band_bits = max(
            base_band_bits, math.ceil(math.log2(n / target_bucket_rows))
        )
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    r0 = 1.0 - (1.0 - p**base_band_bits) ** base_bands
    miss = 1.0 - p**band_bits
    if band_bits == base_band_bits or r0 >= 1.0 or miss <= 0.0 or miss >= 1.0:
        return base_bands, band_bits
    bands = max(base_bands, math.ceil(math.log(1.0 - r0) / math.log(miss)))
    return bands, band_bits


def embedding_dedup_pairs_lsh(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int | None = 5,
    bands: int = 16,
    band_bits: int | None = 4,
    dim: int = 64,
    target_bucket_rows: int = 1024,
    max_bucket_rows: int = 200_000,
) -> DataFrame:
    """Embedding near-dup, sub-quadratic (the 100 TB path): banded
    random-hyperplane LSH candidates + exact rescore.

    Each vector gets ``bands`` independent ``band_bits``-bit hyperplane
    signatures (one mapInPandas GEMM against a broadcast ±1 matrix — no
    giant codegen literals); a pair is a candidate iff it agrees on at least
    one whole band (per-(band, sig) bucket GEMM with the margin cut —
    see _bucket_gemm_candidates — then distinct). Recall for a pair
    at cosine c is 1 − (1 − (1−θ/π)^band_bits)^bands with θ = arccos(c) —
    tune bands up / band_bits down for lower thresholds. Candidates are then
    exact-rescored, so precision is exact; only recall is approximate
    (pinned by a test against the exact operator).

    Scale rule: an UNRELATED pair collides on a band with probability
    ~2^-band_bits, so the random-collision candidate volume is
    Θ(bands · n² / 2^band_bits) — at fixed band_bits that is still
    quadratic with a small constant. Grow band_bits ≈ log2(n / B) to hold
    the expected bucket size at B (e.g. 8 bits for 10⁴–10⁵ rows, 20+ bits
    at 10⁸ — recall lost to narrower bands is bought back with more
    bands); true near-dup recall depends only on (bands, band_bits), not
    n, so the tuning trades a constant recall factor for the asymptote.

    ``band_bits=None`` automates that rule (the 100 TB-safe default per
    VERDICT r14 ask #3): one ``approx_count_distinct`` pass estimates the
    corpus size, then derive_lsh_params picks band_bits to hold the
    expected collision bucket at ``target_bucket_rows`` and scales bands
    up to hold the explicit-defaults recall at the operator threshold.
    Signatures stay md5-derived, so derived plans remain engine-replayable
    (explicit params win — the contract row is unchanged)."""
    # One cheap column-pruned cardinality pass either way (r16): the
    # derived-params path already needed it, and the explicit-params path
    # now uses it to size the bucket-GEMM's packed shuffle groups.
    n_est = corpus.agg(
        F.approx_count_distinct(F.col(id_col)).alias("n")
    ).collect()[0]["n"]
    if band_bits is None:
        bands, band_bits = derive_lsh_params(
            n_est, threshold, bands, 4, target_bucket_rows
        )
    sigs = band_signatures(corpus, id_col, vec_col, bands, band_bits, dim)
    cands = _bucket_gemm_candidates(
        sigs.join(
            corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")),
            "__id",
        ),
        _dedup_margin(threshold, score_decimals),
        max_bucket_rows,
        expected_rows=n_est * bands,
    ).distinct()
    return _exact_rescore(corpus, cands, threshold, id_col, vec_col, score_decimals)


def _dedup_margin(threshold: float, score_decimals: int | None) -> float:
    """Candidate-keep floor shared by the exact block-pair GEMM and the
    LSH bucket GEMM: anything whose true fold score can pass the final
    ``score >= threshold`` filter — including round-half-up when
    ``score_decimals`` is set (the sf1 class fixed in r14) plus
    GEMM-vs-fold float drift — must survive candidate generation."""
    if score_decimals is not None:
        return threshold - 0.5 * 10.0 ** -score_decimals - 1e-9
    return threshold - 1e-6


#: Target signature rows per packed shuffle group in
#: _bucket_gemm_candidates — big enough to amortize the per-group
#: pandas/Arrow round-trip over hundreds of buckets, small enough that a
#: pack (~target · (dim·8 + 24) bytes ≈ 2 MB at dim 64) is a footnote in
#: task memory.
_BUCKET_GROUP_TARGET_ROWS = 4096


def _bucket_gemm_candidates(
    sigs_with_vecs: DataFrame,
    margin: float,
    max_bucket_rows: int,
    expected_rows: int | None = None,
) -> DataFrame:
    """(id_1 < id_2) near-dup candidates from banded LSH collision
    buckets, cut by a per-bucket numpy GEMM instead of materializing the
    full collision set: one task per (band, sig) bucket computes the
    bucket's upper-triangle cosine block and keeps only pairs at or above
    ``margin`` (see _dedup_margin). The random-collision volume
    Θ(bands·n²/2^band_bits) therefore never exists as shuffled candidate
    ROWS — only as flops inside tasks — and the deterministic fold
    rescore downstream touches survivors alone (~the true near-dup count),
    not every banded collision; that interpreted fold over all collisions
    was the measured sf1 hotspot of the LSH path (e≈1.1, SCALING.md r15).

    Per-task memory is Θ(bucket_rows · dim) with the GEMM slab chunked to
    ~4M entries; a bucket past ``max_bucket_rows`` fails actionably
    (grow band_bits / lower target_bucket_rows — the derive_lsh_params
    rule) instead of OOMing the executor.

    Shuffle-group packing (r16, VERDICT r15 item 5): grouping the shuffle
    by (band, sig) directly costs one pandas round-trip PER COLLISION
    BUCKET — bands · 2^band_bits groups (4096 at the contract parameters)
    at ~1 ms of per-group Arrow/pandas machinery each, which was ~3 s of
    the query's ~3.9 s warm total while every bucket's GEMM is
    microseconds. The shuffle now groups by a hash of (band, sig) into
    ``_BUCKET_GROUP_TARGET_ROWS``-sized packs (sized from the caller's
    ``expected_rows`` hint — data-derived, never the local core count
    alone) and the per-bucket loop runs INSIDE the pandas call via a
    vectorized groupby. Same buckets, same GEMMs, same pairs, same
    per-bucket cap; expected per-task memory is
    Θ(target_rows · dim + hot-bucket tail), the tail still bounded by
    ``max_bucket_rows``."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame({"id_1": pd.Series(dtype="int64"),
                          "id_2": pd.Series(dtype="int64")})

    def one_bucket(band, sig, ids, mat):
        n = len(ids)
        if n > max_bucket_rows:
            raise ValueError(
                f"_bucket_gemm_candidates: collision bucket (band={band}, "
                f"sig={sig}) has {n} rows > max_bucket_rows="
                f"{max_bucket_rows}; increase band_bits (or lower "
                "target_bucket_rows with band_bits=None) so buckets stay "
                "task-sized, or raise max_bucket_rows deliberately."
            )
        chunk = max(1, 4_194_304 // n)
        out = []
        for s in range(0, n, chunk):
            sims = mat[s : s + chunk] @ mat.T
            li, rj = np.where(sims >= margin)
            li = li + s
            keep = li < rj  # ids are distinct within a bucket
            a, b = ids[li[keep]], ids[rj[keep]]
            out.append(
                pd.DataFrame({"id_1": np.minimum(a, b), "id_2": np.maximum(a, b)})
            )
        return out

    def pack_pairs(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return empty
        out = []
        for (band, sig), grp in pdf.groupby(["band", "sig"], sort=False):
            if len(grp) < 2:
                continue
            out.extend(
                one_bucket(
                    band, sig,
                    grp["__id"].to_numpy(),
                    np.array(list(grp["__v"]), dtype=np.float64),
                )
            )
        return pd.concat(out, ignore_index=True) if out else empty

    # Pack count derives from the DATA (rows per group ≈ the target,
    # via the caller's expected_rows hint — corpus_rows × bands, one
    # column-pruned agg the caller already needs), never from the local
    # core count alone: a 100 TB signature table still gets
    # rows/target groups — wide, bounded tasks — while the toy fixture
    # collapses 4096 groups to ~a task per core.
    n_groups = max(
        sigs_with_vecs.sparkSession.sparkContext.defaultParallelism,
        -(-(expected_rows or 0) // _BUCKET_GROUP_TARGET_ROWS),
    )
    packed = sigs_with_vecs.withColumn(
        "__grp",
        F.pmod(F.xxhash64(F.col("band"), F.col("sig")), F.lit(n_groups)).cast("int"),
    )
    return packed.groupBy("__grp").applyInPandas(
        pack_pairs, "id_1 long, id_2 long"
    )


def hyperplane_signature(df: DataFrame, id_col: str, vec_col: str, bits: int = 8, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH signature: bit_i = sign(v · h_i), with h_i[j]
    = ±1 derived from md5(f"{i}:{j}") parity — deterministic, no RNG state.

    Computed as a single JVM expression per bit (no shuffle)."""
    import hashlib

    if bits == 0:  # degenerate: one global bucket (exact brute force)
        return df.select(
            F.col(id_col), F.col(vec_col), F.lit(0).alias("bucket")
        )

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
    score_decimals: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only same-bucket pairs. Recall is tunable via
    ``bits`` (fewer bits → bigger buckets → higher recall & cost; bits=0 is
    one bucket = exact brute force, which makes the output oracle-matchable).
    Scores from the deterministic fold, rounded before ranking when
    ``score_decimals`` is set."""
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
    if score_decimals is not None:
        scored = scored.withColumn("score", F.round("score", score_decimals))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_topk_hnsw(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    ef_construction: int = 200,
    ef_search: int | None = 64,
    max_corpus_rows: int = 200_000,
    score_decimals: int | None = 5,
    exact_rescore: bool = False,
) -> DataFrame:
    """Voyager/HNSW ANN parity (scio-extra voyager/syntax/
    SCollectionSyntax.scala:47-215 ``asVoyagerSideInput`` → per-element
    lookup): the corpus becomes an in-memory HNSW graph SIDE INPUT
    (pure-numpy, functions/hnsw.py — no native dependency) — built once,
    broadcast to every executor — and queries probe it per Arrow batch.
    Same output contract as cosine_topk: (query_id, neighbor_id, score,
    rank), self-matches dropped.

    Like scio's Annoy/Voyager side inputs, the CORPUS is side-input-sized
    BY CONTRACT (an HNSW graph is a single in-memory artifact); guarded by
    ``max_corpus_rows`` (build is a Python insert loop, ~10-20k vectors/s
    — corpus-scale similarity belongs to the LSH/IVF paths, which never
    collect). Vectors are pre-normalized ⇒ cosine = dot product.

    ``ef_search=None`` means exhaustive (ef = corpus size): the beam
    visits every node (hnsw.py guarantees layer-0 connectivity), so the
    candidate set provably contains the exact top-k. With
    ``exact_rescore=True`` the Python side emits only candidate PAIRS and
    the scoring/ranking runs JVM-side with the deterministic sequential
    fold + round-before-rank — exactly reproducible in the DuckDB oracle
    (the exact-regime-for-the-oracle pattern of q_ann_ivf). Recall of the
    approximate regime is pinned in tests/test_hnsw.py."""
    import pickle

    import numpy as np
    import pandas as pd

    from scio_spark.functions.hnsw import build_hnsw, search_hnsw

    require_side_input_sized(
        corpus, max_corpus_rows, "cosine_topk_hnsw", "max_corpus_rows"
    )
    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    index = build_hnsw(mat, m=m, ef_construction=ef_construction)
    ef = index.n if ef_search is None else max(ef_search, k + 2)
    bc = corpus.sparkSession.sparkContext.broadcast(
        pickle.dumps((ids, index))
    )

    def gen(batches):
        c_ids, idx = pickle.loads(bc.value)
        id_of = {int(v): j for j, v in enumerate(c_ids)}
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for q_id, vec in zip(pdf[id_col], pdf[vec_col]):
                q_id = int(q_id)
                self_row = id_of.get(q_id, -1)
                # k+1 then drop the self-match of a corpus-resident query
                found = search_hnsw(
                    idx, np.asarray(vec, np.float64), min(k + 1, idx.n), ef
                )
                rank = 0
                for s, row in found:
                    if row == self_row:
                        continue
                    rank += 1
                    if rank > k:
                        break
                    out.append((q_id, int(c_ids[row]), s, rank))
            yield pd.DataFrame(
                out, columns=["query_id", "neighbor_id", "score", "rank"]
            )

    margin = cut_margin(score_decimals)

    def gen_pairs(batches):
        c_ids, idx = pickle.loads(bc.value)
        id_of = {int(v): j for j, v in enumerate(c_ids)}
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for q_id, vec in zip(pdf[id_col], pdf[vec_col]):
                q_id = int(q_id)
                self_row = id_of.get(q_id, -1)
                found = search_hnsw(
                    idx, np.asarray(vec, np.float64), ef, ef
                )
                # Candidate cut before the JVM rescore (guide §2.3 —
                # decide with small rows): only rows that can still rank
                # top-k after round(score, score_decimals) survive.
                # keep_candidates + cut_margin keep every row within a
                # full rounding step (+ float drift) of the k-th beam
                # score, so the rescored top-k is IDENTICAL to rescoring
                # the whole beam — previously the exhaustive regime
                # emitted the entire corpus per query (|queries|·n pairs)
                # into the fold-dot + window rank.
                sims = np.fromiter((s for s, _ in found), np.float64, len(found))
                rows = np.fromiter((r for _, r in found), np.int64, len(found))
                nonself = rows != self_row
                sims, rows = sims[nonself], rows[nonself]
                out.extend(
                    (q_id, int(c_ids[r]))
                    for r in rows[keep_candidates(sims, k, margin)]
                )
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id"])

    qsel = queries.select(id_col, vec_col)
    if not exact_rescore:
        out = qsel.mapInPandas(
            gen, "query_id long, neighbor_id long, score double, rank int"
        )
        if score_decimals is not None:
            out = out.withColumn("score", F.round("score", score_decimals))
        return out

    cands = qsel.mapInPandas(gen_pairs, "query_id long, neighbor_id long")
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
    )
    cv = F.broadcast(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
    )
    scored = (
        cands.join(qv, "query_id")
        .join(cv, "neighbor_id")
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


def cosine_topk_hnsw_sharded(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    ef_construction: int = 200,
    ef_search: int | None = 64,
    n_shards: int = 4,
    score_decimals: int | None = 5,
    exact_rescore: bool = False,
    max_group_rows: int = 2_000_000,
) -> DataFrame:
    """cosine_topk_hnsw without the side-input bound (VERDICT r14 ask #7,
    parity-PLUS — scio's Voyager is also side-input-bound): the corpus is
    sharded by ``pmod(xxhash64(id), n_shards)``, queries are replicated to
    every shard, and ONE cogrouped task per shard builds that shard's
    HNSW sub-graph (a Python insert loop over only n/n_shards vectors —
    the build parallelizes across shards instead of serializing on the
    driver) and probes its replicated query block. Nothing corpus- or
    query-sized touches the driver or a broadcast.

    Merge argument: each query's true global top-k rows are each top-k
    WITHIN their own shard, so the union of per-shard top-k candidates
    contains the global top-k — in the exhaustive regime
    (``ef_search=None`` ⇒ per-shard beam = shard size, layer-0
    connectivity guaranteed by hnsw._repair_connectivity) the output is
    provably exact, and with ``exact_rescore=True`` scoring/ranking runs
    JVM-side with the deterministic fold + round-before-rank (the oracle
    regime; parity with cosine_topk pinned in tests/test_hnsw.py). In the
    approximate regime recall equals the per-shard HNSW recall — shards
    only SHRINK each graph, which helps beam recall at fixed ef.

    Per-task memory is Θ(n/n_shards + |queries|): size n_shards to the
    corpus (the semdedup k ~ √n discipline) and keep the query workload
    bounded per run; both group sides fail actionably past
    ``max_group_rows``. Query replication costs n_shards× shuffle volume
    of the query set — the price of removing the broadcast; for
    corpus-scale query sets prefer the IVF/LSH routes, which shuffle
    queries once."""
    import numpy as np
    import pandas as pd

    from scio_spark.functions.hnsw import build_hnsw, search_hnsw

    S = max(1, n_shards)
    cshard = corpus.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")
    ).withColumn("__shard", F.pmod(F.xxhash64(F.col("__cid")), F.lit(S)).cast("int"))
    qshard = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__shard", F.explode(F.array(*[F.lit(i) for i in range(S)])))

    def probe(_key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "query_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        }
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame(cols)
        if len(cpdf) > max_group_rows:
            raise ValueError(
                f"cosine_topk_hnsw_sharded: shard "
                f"{int(cpdf['__shard'].iloc[0])} has {len(cpdf)} corpus "
                f"rows > max_group_rows={max_group_rows}; increase "
                f"n_shards (per-task shard is ~n/n_shards rows) or raise "
                f"the cap explicitly"
            )
        if len(qpdf) > max_group_rows:
            raise ValueError(
                f"cosine_topk_hnsw_sharded: {len(qpdf)} queries replicated "
                f"to shard {int(qpdf['__shard'].iloc[0])} > "
                f"max_group_rows={max_group_rows}; shard the query "
                f"workload across runs (queries replicate to EVERY shard "
                f"here) or use the IVF/LSH routes, or raise the cap"
            )
        c_ids = cpdf["__cid"].to_numpy()
        mat = np.array(list(cpdf["__cv"]), dtype=np.float64)
        index = build_hnsw(mat, m=m, ef_construction=ef_construction)
        ef = index.n if ef_search is None else max(ef_search, k + 2)
        id_of = {int(v): j for j, v in enumerate(c_ids)}
        margin = cut_margin(score_decimals)
        out = []
        for q_id, vec in zip(qpdf["query_id"], qpdf["__qv"]):
            q_id = int(q_id)
            self_row = id_of.get(q_id, -1)
            # exact_rescore: cut the beam to the score-safe per-shard
            # top-k before the JVM rescore (guide §2.3) — every row
            # within cut_margin of the shard's k-th beam score survives,
            # so the rescored global rank is identical to emitting the
            # whole beam (per-shard containment: k kept rows strictly
            # outrank any dropped row even after rounding). The
            # approximate regime keeps per-shard top-k directly.
            n_keep = ef if exact_rescore else min(k + 1, index.n)
            found = search_hnsw(index, np.asarray(vec, np.float64), n_keep, ef)
            if exact_rescore:
                sims = np.fromiter((s for s, _ in found), np.float64, len(found))
                rows = np.fromiter((r for _, r in found), np.int64, len(found))
                nonself = rows != self_row
                sims, rows = sims[nonself], rows[nonself]
                kp = keep_candidates(sims, k, margin)
                out.extend(
                    (q_id, int(c_ids[r]), float(s))
                    for s, r in zip(sims[kp], rows[kp])
                )
                continue
            kept = 0
            for s, row in found:
                if row == self_row:
                    continue
                kept += 1
                if kept > k:
                    break
                out.append((q_id, int(c_ids[row]), float(s)))
        return pd.DataFrame(out, columns=list(cols)) if out else pd.DataFrame(cols)

    cands = (
        qshard.groupBy("__shard")
        .cogroup(cshard.groupBy("__shard"))
        .applyInPandas(probe, "query_id long, neighbor_id long, score double")
    )
    if exact_rescore:
        qv = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
        cv = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
        scored = (
            cands.drop("score")
            .join(qv, "query_id")
            .join(cv, "neighbor_id")
            .withColumn("score", _dot(F.col("__qv"), F.col("__cv")))
        )
    else:
        scored = cands
    if score_decimals is not None:
        scored = scored.withColumn("score", F.round("score", score_decimals))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
