"""Product quantization (PQ) — compressed ANN codes with ADC scoring.

Completes the ANN storage ladder (similarity.py brute/LSH/SQ8, ivf.py
coarse lists): product quantization (Jégou, Douze, Schmid, "Product
quantization for nearest neighbor search", public) splits each vector
into ``m`` subspaces and learns a 256-entry k-means codebook per
subspace, so a d-dim float32 vector stores as m BYTES (e.g. 128-dim ×
4 B → 16 B at m=16 — 32× smaller than float32, vs SQ8's 4×). Search uses
asymmetric distance computation (ADC): per query, precompute an
m×256 table of query-subvector · codeword dot products; a corpus code's
approximate score is then m table lookups — no float reconstruction.

Spark shape:
- **train**: codebooks fit on a BOUNDED collected sample per the IVF
  quantizer convention (k-means on 256 centroids × m subspaces is
  sample-sized work; codebooks are m×256×(d/m) floats — a broadcast);
- **encode**: Arrow-batched numpy over mapInPandas — per batch, one GEMM
  per subspace against the broadcast codebook, argmax → uint8 codes
  (binary column, m bytes/vector);
- **search**: per corpus batch, scores = sum of table[sub, code] lookups
  (numpy fancy indexing — vectorized, no Python loop per row); top
  k×oversample candidates per query rescored EXACTLY on the float
  vectors, so returned scores are exact and quantization only affects
  candidate recall (pinned in tests).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import keep_candidates, require_side_input_sized


def _kmeans_np(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Plain Lloyd k-means (numpy) for codebook training: deterministic
    seeded init from data points, empty clusters re-seeded from the
    farthest points."""
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    if len(cent) < k:  # tiny sample: pad with jittered repeats
        pad = cent[rng.choice(len(cent), k - len(cent))]
        cent = np.vstack([cent, pad + rng.normal(0, 1e-6, pad.shape)])
    xsq = (x**2).sum(1)
    for _ in range(iters):
        # argmin ||x−c||² == argmax (x·c − ||c||²/2): O(n·k) memory, not n·k·d
        scores = x @ cent.T - 0.5 * (cent**2).sum(1)
        assign = scores.argmax(1)
        d2_min = xsq - 2.0 * scores.max(1)  # for empty-cluster reseeding
        for j in range(k):
            mask = assign == j
            if mask.any():
                cent[j] = x[mask].mean(0)
            else:
                cent[j] = x[d2_min.argmax()]
    return cent


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    iters: int = 10,
    seed: int = 7,
    train_rows_cap: int = 50_000,
) -> np.ndarray:
    """Fit m per-subspace codebooks on a bounded sample. Returns an array
    of shape (m, n_codes, d/m). d must divide by m."""
    sample = corpus.select(vec_col).limit(train_rows_cap).collect()
    x = np.array([r[0] for r in sample], dtype=np.float32)
    return _fit_codebooks(x, m, n_codes, iters, seed)


def _fit_codebooks(
    x: np.ndarray, m: int, n_codes: int, iters: int, seed: int
) -> np.ndarray:
    """Per-subspace k-means over a training matrix (raw vectors for plain
    PQ, residuals for IVFPQ residual mode)."""
    d = x.shape[1]
    if d % m:
        raise ValueError(f"pq: dim {d} not divisible by m={m}")
    sub = d // m
    books = np.empty((m, n_codes, sub), dtype=np.float32)
    for j in range(m):
        books[j] = _kmeans_np(
            x[:, j * sub : (j + 1) * sub].astype(np.float64), n_codes, iters, seed + j
        ).astype(np.float32)
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """(id, pq_code binary): m bytes per vector — the stored index."""
    import pandas as pd

    m, n_codes, sub = codebooks.shape
    bc = corpus.sparkSession.sparkContext.broadcast(codebooks)

    def gen(batches):
        books = bc.value
        for pdf in batches:
            x = np.array(list(pdf[vec_col]), dtype=np.float32)
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                # argmin ||xs - c||² == argmax (xs·c − ||c||²/2)
                scores = xs @ books[j].T - 0.5 * (books[j] ** 2).sum(1)
                codes[:, j] = scores.argmax(1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], code_col: [c.tobytes() for c in codes]}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, {code_col} binary"
    )


def _rank_exact(
    cands: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    score_decimals: int | None,
    id_col: str,
    vec_col: str,
    broadcast_q: bool = False,
) -> DataFrame:
    """Shared final stage of every PQ path: exact deterministic-fold
    rescore of (query_id, neighbor_id) candidates against the float
    ``vectors`` table, round-before-rank, top-k per query with the
    (score desc, neighbor_id asc) tie-break — so returned scores are
    bit-identical to the DuckDB oracle regardless of which candidate
    generator (ADC broadcast-queries, streamed, IVF-PQ, stored index)
    produced them."""
    from .similarity import _dot

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    if broadcast_q:
        q = F.broadcast(q)
    c = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        cands.join(q, "query_id")
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


def _gemm_cut(
    cands: DataFrame,
    vectors: DataFrame,
    q_ids: np.ndarray,
    q_mat64: np.ndarray,
    k: int,
    margin: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-score candidate cut between the ADC stage and the JVM fold
    rescore (r16, VERDICT r15 item 3). ADC scores are quantized (their
    error vs the exact dot is unbounded), so the exhaustive-oracle regime
    (k·oversample ≥ index rows) keeps EVERY candidate at the ADC cut —
    |queries| × |index| pairs then flow into the sequential-fold rescore
    + window, interpreted expression work that runs on however few tasks
    the index scan produced. This stage attaches the index's float
    vectors to the candidates (one broadcast hash join — the index side
    is the by-construction-bounded broadcast), scores them with an EXACT
    float64 GEMM per Arrow batch, and keeps per (batch × query) the
    top-(k+4) WITH ties and the rounding margin
    (similarity.keep_candidates / cut_margin — the same containment
    argument as the HNSW exact-rescore cut: GEMM-vs-fold drift is covered
    by cut_margin's two-sided eps and the margin includes a full rounding
    step, so the final rounded ranking cannot prefer a dropped candidate;
    the global top-k per query is contained in every batch-local
    top-(k+ties) union). Volume into the fold rescore drops from
    |queries| × |index| to ~|queries| × (k + ties)."""
    import pandas as pd

    from .similarity import keep_candidates as _keep

    bc = vectors.sparkSession.sparkContext.broadcast((q_ids, q_mat64))
    withvec = cands.join(
        F.broadcast(
            vectors.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
            )
        ),
        "neighbor_id",
    )

    def gen(batches):
        ids, mat = bc.value
        pos = {int(q): i for i, q in enumerate(ids)}
        for pdf in batches:
            if pdf.empty:
                continue
            out_q, out_n = [], []
            for qid, grp in pdf.groupby("query_id"):
                qv = mat[pos[int(qid)]]
                block = np.array(list(grp["__cv"]), dtype=np.float64)
                sims = block @ qv
                kk = min(k + 4, len(sims))
                sel = _keep(sims, kk, margin)
                out_q.extend([int(qid)] * len(sel))
                out_n.extend(grp["neighbor_id"].to_numpy()[sel])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    return withvec.mapInPandas(gen, "query_id long, neighbor_id long")


def _adc_candidates(
    coded: DataFrame,
    q_ids: np.ndarray,
    tables: np.ndarray,
    kk_keep: int,
    id_col: str,
    code_col: str = "pq_code",
) -> DataFrame:
    """ADC candidate scan for the broadcast-queries regime, over any
    (id, pq_code) DataFrame — freshly encoded or read back from a stored
    index (where the scan is column-pruned to m+8 bytes/row). Keeps ties
    at the k·oversample cut (similarity.keep_candidates) so the candidate
    SET is partition/batch-order independent."""
    import pandas as pd

    m = tables.shape[1]
    bc = coded.sparkSession.sparkContext.broadcast((q_ids, tables))

    def gen(batches):
        ids, tabs = bc.value
        for pdf in batches:
            codes = np.frombuffer(
                b"".join(pdf[code_col]), dtype=np.uint8
            ).reshape(len(pdf), m)
            b_ids = pdf[id_col].to_numpy()
            # scores[q, row] = Σ_j tabs[q, j, codes[row, j]]
            sims = tabs[:, np.arange(m)[None, :], codes].sum(-1)
            out_q, out_n = [], []
            kk = min(kk_keep + 1, sims.shape[1])
            for qi in range(sims.shape[0]):
                idx = keep_candidates(sims[qi], kk, 0.0)
                keep = idx[b_ids[idx] != ids[qi]]
                out_q.extend([ids[qi]] * len(keep))
                out_n.extend(b_ids[keep])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    return coded.mapInPandas(gen, "query_id long, neighbor_id long")


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    oversample: int = 8,
    score_decimals: int | None = 5,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Top-k cosine via PQ/ADC candidates + exact float rescore. Output
    contract matches cosine_topk: (query_id, neighbor_id, score, rank)
    with EXACT scores; the m-byte codes only gate candidate recall."""
    require_side_input_sized(queries, max_query_rows, "cosine_topk_pq", "max_query_rows")
    m, n_codes, sub = codebooks.shape
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float32)
    # ADC tables: per query and subspace, dot products against every codeword
    tables = np.einsum("qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), codebooks)
    coded = pq_encode(corpus, codebooks, vec_col, id_col)
    cands = _adc_candidates(coded, q_ids, tables, k * oversample, id_col)
    return _rank_exact(
        cands, corpus, queries, k, score_decimals, id_col, vec_col, broadcast_q=True
    )


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    oversample: int = 8,
    seed: int = 42,
    score_decimals: int | None = 5,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """IVF-PQ — the full FAISS-style composition: coarse k-means routing
    (only the ``n_probe`` nearest inverted lists per query are touched,
    from ivf.py) with PQ/ADC scoring inside each probed list (m-byte codes,
    table lookups — from this module) and an exact float rescore of the
    surviving candidates. Corpus work per query drops by ~n_probe/n_clusters
    AND each scored vector costs m byte-lookups instead of d multiplies —
    the two savings are independent and multiply. Output contract matches
    cosine_topk (exact scores on survivors)."""
    import pandas as pd

    from .ivf import _centroids, assign_centroid

    require_side_input_sized(
        queries, max_query_rows, "cosine_topk_ivfpq", "max_query_rows"
    )
    m, n_codes, sub = codebooks.shape
    cents = _centroids(corpus, vec_col, n_clusters, seed, 1.0)
    inv = assign_centroid(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        cents,
    )
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([list(r[1]) for r in qrows], dtype=np.float32)
    tables = np.einsum("qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), codebooks)
    cmat = np.array(cents, dtype=np.float32)
    p = min(n_probe, len(cents))
    order = np.argsort(-(q_mat @ cmat.T), axis=1, kind="stable")[:, :p]
    packed: dict[int, tuple] = {}
    for c in np.unique(order):
        rows = np.nonzero((order == c).any(axis=1))[0]
        packed[int(c)] = (q_ids[rows], tables[rows])
    bc = corpus.sparkSession.sparkContext.broadcast((packed, codebooks))
    kk_keep = k * oversample

    def gen(batches):
        tbl, books = bc.value
        for pdf in batches:
            for cen, grp in pdf.groupby("centroid"):
                hit = tbl.get(int(cen))
                if hit is None:
                    continue
                ids, tabs = hit
                x = np.array(list(grp["__cv"]), dtype=np.float32)
                codes = np.empty((len(x), m), dtype=np.uint8)
                for j in range(m):
                    xs = x[:, j * sub : (j + 1) * sub]
                    s = xs @ books[j].T - 0.5 * (books[j] ** 2).sum(1)
                    codes[:, j] = s.argmax(1)
                b_ids = grp["neighbor_id"].to_numpy()
                sims = tabs[:, np.arange(m)[None, :], codes].sum(-1)
                out_q, out_n = [], []
                kk = min(kk_keep + 1, sims.shape[1])
                for qi in range(sims.shape[0]):
                    # keep ties at the cut (similarity.keep_candidates) so the
                    # ADC candidate SET is partition/batch-order independent
                    idx = keep_candidates(sims[qi], kk, 0.0)
                    keep = idx[b_ids[idx] != ids[qi]]
                    out_q.extend([ids[qi]] * len(keep))
                    out_n.extend(b_ids[keep])
                if out_q:
                    yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    cands = inv.mapInPandas(gen, "query_id long, neighbor_id long").distinct()
    return _rank_exact(
        cands, corpus, queries, k, score_decimals, id_col, vec_col, broadcast_q=True
    )


def cosine_topk_pq_streamed(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    oversample: int = 8,
    score_decimals: int | None = 5,
    max_index_rows: int = 50_000_000,
) -> DataFrame:
    """cosine_topk_pq for CORPUS-SCALE query workloads: queries stay a
    DataFrame end to end. The side-input roles invert — the PQ CODES are
    the broadcast (m bytes/vector, e.g. 64-dim float32 → 8 B at m=8, a
    32× shrink, guarded by the row+byte budget), and each query Arrow
    batch builds its own ADC tables in-task and scans the broadcast code
    matrix with numpy fancy indexing. Candidates then get the exact
    distributed fold-rescore; queries never pass through the driver.
    This is the FAISS deployment shape: the compressed index is the
    replicated artifact, the query stream is the data. For an index too
    big even as codes, compose IVF routing instead
    (ivf.cosine_topk_ivf_streamed / cosine_topk_ivfpq_streamed)."""
    import pandas as pd

    m, n_codes, sub = codebooks.shape
    coded = pq_encode(corpus, codebooks, vec_col, id_col)
    require_side_input_sized(
        coded, max_index_rows, "cosine_topk_pq_streamed", "max_index_rows"
    )
    rows = coded.collect()
    b_ids = np.array([r[0] for r in rows], dtype=np.int64)
    codes = np.frombuffer(b"".join(r[1] for r in rows), dtype=np.uint8).reshape(
        len(rows), m
    )
    bc = corpus.sparkSession.sparkContext.broadcast((b_ids, codes, codebooks))
    kk_keep = k * oversample

    def gen(batches):
        ids, cds, books = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q_ids = pdf["query_id"].to_numpy()
            q_mat = np.array(list(pdf["__qv"]), dtype=np.float32)
            tabs = np.einsum(
                "qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), books
            )
            sims = tabs[:, np.arange(m)[None, :], cds].sum(-1)
            out_q, out_n = [], []
            kk = min(kk_keep + 1, sims.shape[1])
            for qi in range(sims.shape[0]):
                # keep ties at the cut (similarity.keep_candidates) so the
                # ADC candidate SET is partition/batch-order independent
                idx = keep_candidates(sims[qi], kk, 0.0)
                keep = idx[ids[idx] != q_ids[qi]]
                out_q.extend([q_ids[qi]] * len(keep))
                out_n.extend(ids[keep])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    q_in = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    cands = q_in.mapInPandas(gen, "query_id long, neighbor_id long")
    return _rank_exact(cands, corpus, queries, k, score_decimals, id_col, vec_col)


def _cogroup_adc_candidates(
    probes: DataFrame,
    inv: DataFrame,
    books: np.ndarray,
    kk_keep: int,
    corpus_blocks: int,
    max_group_rows: int,
    what: str,
    coded: bool = False,
) -> DataFrame:
    """Salted centroid-cogrouped ADC candidate stage for streamed-queries
    IVF-PQ, shared by cosine_topk_ivfpq_streamed (corpus arrives as float
    vectors in ``__cv``, PQ-encoded in-task) and
    search_ivfpq_index(streamed=True) (corpus arrives as stored m-byte
    ``pq_code`` — the column-pruned index scan; ``coded=True``). Per-task
    memory is bounded per the r14 scale seam: the corpus side is salted
    to (centroid, pmod(xxhash64(neighbor_id), corpus_blocks)) — one task
    holds at most Θ(n/(n_clusters·corpus_blocks)) corpus rows — and both
    group sides fail actionably past ``max_group_rows``. Per-block ADC
    keep lists can only ADD candidates vs the unsalted per-list cut, so
    recall is monotone in corpus_blocks and the exhaustive regime is
    unchanged."""
    import pandas as pd

    m, n_codes, sub = books.shape
    bc = probes.sparkSession.sparkContext.broadcast(books)

    def adc(_key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame({"query_id": [], "neighbor_id": []}).astype("int64")
        if len(cpdf) > max_group_rows:
            raise ValueError(
                f"{what}: inverted-list block for "
                f"centroid {int(cpdf['centroid'].iloc[0])} has {len(cpdf)} "
                f"rows > max_group_rows={max_group_rows}; increase "
                f"corpus_blocks (per-task corpus block is "
                f"~n/(n_clusters*corpus_blocks) rows) or n_clusters, or "
                f"raise the cap explicitly"
            )
        if len(qpdf) > max_group_rows:
            raise ValueError(
                f"{what}: {len(qpdf)} queries routed "
                f"to centroid {int(qpdf['centroid'].iloc[0])} > "
                f"max_group_rows={max_group_rows}; increase n_clusters "
                f"(expected per-centroid query volume is "
                f"~queries*n_probe/n_clusters; size k ~ sqrt(n)) or raise "
                f"the cap explicitly"
            )
        bks = bc.value
        q_ids = qpdf["query_id"].to_numpy()
        q_mat = np.array(list(qpdf["__qv"]), dtype=np.float32)
        tabs = np.einsum("qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), bks)
        if coded:
            codes = np.frombuffer(
                b"".join(cpdf["pq_code"]), dtype=np.uint8
            ).reshape(len(cpdf), m)
        else:
            x = np.array(list(cpdf["__cv"]), dtype=np.float32)
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                s = xs @ bks[j].T - 0.5 * (bks[j] ** 2).sum(1)
                codes[:, j] = s.argmax(1)
        b_ids = cpdf["neighbor_id"].to_numpy()
        sims = tabs[:, np.arange(m)[None, :], codes].sum(-1)
        out_q, out_n = [], []
        kk = min(kk_keep + 1, sims.shape[1])
        for qi in range(sims.shape[0]):
            # keep ties at the cut (similarity.keep_candidates) so the
            # ADC candidate SET is partition/batch-order independent
            idx = keep_candidates(sims[qi], kk, 0.0)
            keep = idx[b_ids[idx] != q_ids[qi]]
            out_q.extend([q_ids[qi]] * len(keep))
            out_n.extend(b_ids[keep])
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    B = max(1, corpus_blocks)
    inv_b = inv.withColumn(
        "__blk", F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(B)).cast("int")
    )
    probes_b = probes.withColumn(
        "__blk", F.explode(F.array(*[F.lit(i) for i in range(B)]))
    )
    return (
        probes_b.groupBy("centroid", "__blk")
        .cogroup(inv_b.groupBy("centroid", "__blk"))
        .applyInPandas(adc, "query_id long, neighbor_id long")
    )


def cosine_topk_ivfpq_streamed(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    oversample: int = 8,
    seed: int = 42,
    score_decimals: int | None = 5,
    corpus_blocks: int = 1,
    max_group_rows: int = 2_000_000,
) -> DataFrame:
    """cosine_topk_ivfpq for CORPUS-SCALE query workloads: the full
    FAISS composition with the queries kept as a DataFrame end to end.
    Broadcasts only the training artifacts (centroids + codebooks —
    size independent of both corpus and queries); probe routing runs
    distributed (ivf.probe_centroids), candidates come from a salted
    centroid-cogrouped task that PQ-encodes its corpus block and scores
    it against ADC tables built from its probing-query block, and the
    exact fold-rescore joins both vector sides distributed. The only
    driver touches are the bounded training samples.

    Per-task memory is bounded the same way as ivf._cogroup_gemm_candidates
    (VERDICT r14 scale seam): the corpus side is salted to (centroid,
    pmod(xxhash64(neighbor_id), corpus_blocks)) — one task holds at most
    Θ(n/(n_clusters·corpus_blocks)) corpus vectors — and both group sides
    are guarded by ``max_group_rows`` with the matching lever named in the
    error (n_clusters for the query side, k ~ √n). Per-block ADC keep
    lists can only ADD candidates vs the unsalted per-list cut, so recall
    is monotone in corpus_blocks and the exhaustive regime is unchanged."""
    from .ivf import _centroids, assign_centroid, probe_centroids

    cents = _centroids(corpus, vec_col, n_clusters, seed, 1.0)
    inv = assign_centroid(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        cents,
    )
    probes = probe_centroids(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv",
        cents,
        n_probe,
    )
    cands = _cogroup_adc_candidates(
        probes, inv, codebooks, k * oversample, corpus_blocks,
        max_group_rows, "cosine_topk_ivfpq_streamed",
    )
    return _rank_exact(cands, corpus, queries, k, score_decimals, id_col, vec_col)


def build_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    iters: int = 10,
    seed: int = 7,
    train_rows_cap: int = 50_000,
) -> np.ndarray:
    """Persist a PQ index: codebooks as JSON beside ``path`` (the
    broadcast-sized training artifact, the ivf.build_ivf_index convention)
    and one parquet row per vector carrying (id, pq_code, vector) — the
    FAISS IndexRefineFlat layout. Storing the raw vector IN the index
    keeps search self-contained while costing nothing at scan time:
    parquet is columnar, so the ADC candidate pass reads only
    (id, pq_code) — m+8 bytes/row, e.g. 16 B at m=8 vs 264 B for a
    64-dim float32 row — and the exact rescore reads the vector column
    for candidate rows alone. Returns the trained codebooks."""
    import json

    spark = corpus.sparkSession
    books = train_pq_codebooks(
        corpus, vec_col, m, n_codes, iters, seed, train_rows_cap
    )
    from .ivf import write_small_json

    write_small_json(
        spark, path.rstrip("/") + "__codebooks",
        {"codebooks": json.dumps(books.tolist())},
    )
    _encode_with_vec(corpus, books, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(path)
    return books


def load_pq_codebooks(spark, path: str) -> np.ndarray:
    """Read back the codebooks persisted by build_pq_index."""
    import json

    from .ivf import read_small_json

    meta = read_small_json(spark, path.rstrip("/") + "__codebooks")
    return np.array(json.loads(meta["codebooks"]), dtype=np.float32)


def _encode_with_vec(
    df: DataFrame,
    books: np.ndarray,
    id_col: str,
    vec_col: str,
    passthrough: tuple[str, ...] = (),
    residual_cents: np.ndarray | None = None,
) -> DataFrame:
    """(id, pq_code, vector[, passthrough...]) index rows — pq_encode plus
    the original vector column (type preserved so stored vectors rescore
    bit-identically to the source table) and any ``passthrough`` columns
    (e.g. the IVFPQ centroid assignment). With ``residual_cents`` the
    codes quantize the RESIDUAL x − centroid[assignment] (classic IVFPQ;
    requires 'centroid' in passthrough) — the stored vector column stays
    the raw vector either way."""
    import pandas as pd

    m, n_codes, sub = books.shape
    vec_type = df.schema[vec_col].dataType.simpleString()
    extra = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in passthrough
    )
    bc = df.sparkSession.sparkContext.broadcast((books, residual_cents))

    def gen(batches):
        bks, rcents = bc.value
        for pdf in batches:
            x = np.array(list(pdf[vec_col]), dtype=np.float32)
            if rcents is not None and len(x):
                x = x - rcents[pdf["centroid"].to_numpy()]
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                scores = xs @ bks[j].T - 0.5 * (bks[j] ** 2).sum(1)
                codes[:, j] = scores.argmax(1)
            out = {
                id_col: pdf[id_col],
                "pq_code": [c.tobytes() for c in codes],
                vec_col: pdf[vec_col],
            }
            for c in passthrough:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    schema = f"{id_col} long, pq_code binary, {vec_col} {vec_type}"
    if extra:
        schema += ", " + extra
    return df.select(id_col, vec_col, *passthrough).mapInPandas(gen, schema)


def append_pq_index(
    spark,
    path: str,
    new_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a vector batch to a persisted PQ index WITHOUT retraining —
    the PQ sibling of ivf.append_ivf_index and the incremental dedup
    index flows: load the stored codebooks (frozen quantizer, the FAISS
    maintenance model), encode ONLY the batch (one broadcast-GEMM
    mapInPandas pass over O(batch) rows), append parquet. Cost scales
    with the batch, never the index; rebuild on distribution drift,
    append otherwise. Search correctness is unaffected — ADC candidate
    recall drifts only with codebook fit, and the exhaustive regime
    stays provably exact."""
    books = load_pq_codebooks(spark, path)
    _encode_with_vec(new_vecs, books, id_col, vec_col).write.mode(
        "append"
    ).parquet(path)


def search_pq_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    oversample: int = 8,
    score_decimals: int | None = 5,
    streamed: bool = False,
    max_query_rows: int = 100_000,
    max_index_rows: int = 50_000_000,
) -> DataFrame:
    """Top-k cosine over a PERSISTED PQ index (build_pq_index /
    append_pq_index): ADC candidates from the column-pruned (id, pq_code)
    scan — m+8 bytes per corpus row, never the float vectors — then the
    shared exact rescore reading the index's vector column for candidate
    rows only. Output contract matches cosine_topk; with
    k·oversample ≥ index rows the candidate pass is exhaustive and the
    result is provably exact top-k (the contract-query regime; at
    production oversample the recall floor is pinned in tests/test_pq.py).

    Two regimes, matching search_ivf_index: default collects the
    (by-contract bounded, guarded) query set and broadcasts its ADC
    tables; ``streamed=True`` inverts the side-input roles — the m-byte
    code matrix is the (row-budgeted) broadcast and the query workload
    stays a DataFrame end to end, each Arrow batch building its own ADC
    tables in-task (the corpus-scale query shape; for an index too big
    even as codes, route through ivf.search_ivf_index instead)."""
    import pandas as pd

    books = load_pq_codebooks(spark, path)
    m, n_codes, sub = books.shape
    idx = spark.read.parquet(path)
    coded = idx.select(id_col, "pq_code")
    kk_keep = k * oversample

    if streamed:
        require_side_input_sized(
            coded, max_index_rows, "search_pq_index", "max_index_rows"
        )
        rows = coded.collect()
        b_ids = np.array([r[0] for r in rows], dtype=np.int64)
        codes = np.frombuffer(
            b"".join(r[1] for r in rows), dtype=np.uint8
        ).reshape(len(rows), m)
        bc = spark.sparkContext.broadcast((b_ids, codes, books))

        def gen(batches):
            ids, cds, bks = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                q_ids = pdf["query_id"].to_numpy()
                q_mat = np.array(list(pdf["__qv"]), dtype=np.float32)
                tabs = np.einsum(
                    "qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), bks
                )
                sims = tabs[:, np.arange(m)[None, :], cds].sum(-1)
                out_q, out_n = [], []
                kk = min(kk_keep + 1, sims.shape[1])
                for qi in range(sims.shape[0]):
                    sel = keep_candidates(sims[qi], kk, 0.0)
                    keep = sel[ids[sel] != q_ids[qi]]
                    out_q.extend([q_ids[qi]] * len(keep))
                    out_n.extend(ids[keep])
                yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

        q_in = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
        cands = q_in.mapInPandas(gen, "query_id long, neighbor_id long")
        return _rank_exact(cands, idx, queries, k, score_decimals, id_col, vec_col)

    require_side_input_sized(
        queries, max_query_rows, "search_pq_index", "max_query_rows"
    )
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float32)
    tables = np.einsum("qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), books)
    cands = _adc_candidates(coded, q_ids, tables, kk_keep, id_col)
    from .similarity import cut_margin

    cands = _gemm_cut(
        cands, idx,
        q_ids, np.array([r[1] for r in qrows], dtype=np.float64),
        k, cut_margin(score_decimals), id_col, vec_col,
    )
    return _rank_exact(
        cands, idx, queries, k, score_decimals, id_col, vec_col, broadcast_q=True
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    m: int = 8,
    n_codes: int = 256,
    iters: int = 10,
    seed: int = 42,
    sample_fraction: float = 1.0,
    max_iter: int = 8,
    train_rows_cap: int = 50_000,
    residual: bool = False,
):
    """Persist the full FAISS-style IVF-PQ index: coarse centroids AND PQ
    codebooks as JSON beside ``path`` (both broadcast-sized training
    artifacts, fit on bounded samples), and one parquet row per vector
    carrying (id, pq_code, vector) PARTITIONED BY its coarse centroid.
    Search gets both prunings multiplied: probing touches only n_probe
    partition directories (ivf.build_ivf_index's layout) and the ADC scan
    inside them reads only the m-byte code column (build_pq_index's
    columnar cut) — at 100 TB the scan cost per query drops by
    ~(n_probe/n_clusters)·(m+8)/(8+4·dim) versus brute force over raw
    vectors. Returns (centroids, codebooks).

    ``residual=True`` quantizes x − centroid[assignment] instead of x
    (classic IVFPQ, Jégou et al. §IV): on clustered data the residual
    cloud is tighter than the raw vectors, so the same m bytes buy a
    finer quantizer and better ADC candidate recall (pinned on a blob
    fixture in tests/test_pq.py). Search scoring needs NO change: within
    one inverted list q·x = q·centroid + q·residual differs from the
    residual-ADC estimate by a per-list constant, and every candidate
    cut in this module is per-list, so candidate sets — and the exact
    rescore on raw vectors — are computed identically."""
    import json

    from .ivf import _centroids, assign_centroid

    spark = corpus.sparkSession
    cents = _centroids(
        corpus, vec_col, n_clusters, seed, sample_fraction, max_iter,
        train_rows_cap=train_rows_cap,
    )
    cmat = np.array(cents, dtype=np.float32)
    if residual:
        sample = corpus.select(vec_col).limit(train_rows_cap).collect()
        x = np.array([r[0] for r in sample], dtype=np.float32)
        x = x - cmat[np.argmax(x @ cmat.T, axis=1)]
        books = _fit_codebooks(x, m, n_codes, iters, seed)
    else:
        books = train_pq_codebooks(
            corpus, vec_col, m, n_codes, iters, seed, train_rows_cap
        )
    assigned = assign_centroid(corpus.select(id_col, vec_col), vec_col, cents)
    _encode_with_vec(
        assigned, books, id_col, vec_col, passthrough=("centroid",),
        residual_cents=cmat if residual else None,
    ).write.mode("overwrite").partitionBy("centroid").parquet(path)
    from .ivf import write_small_json

    write_small_json(
        spark, path.rstrip("/") + "__meta",
        {"centroids": json.dumps(cents), "codebooks": json.dumps(books.tolist()),
         "residual": "1" if residual else "0"},
    )
    return cents, books


def _load_ivfpq_meta(spark, path: str):
    """(centroids, codebooks, residual) persisted by build_ivfpq_index.
    Pre-residual indexes have no 'residual' field — treated as raw."""
    import json

    from .ivf import read_small_json

    meta = read_small_json(spark, path.rstrip("/") + "__meta")
    residual = meta.get("residual") == "1"
    return (
        json.loads(meta["centroids"]),
        np.array(json.loads(meta["codebooks"]), dtype=np.float32),
        residual,
    )


def append_ivfpq_index(
    spark,
    path: str,
    new_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a vector batch to a persisted IVF-PQ index WITHOUT
    retraining (frozen coarse quantizer AND codebooks — the FAISS
    maintenance model shared with append_ivf_index / append_pq_index):
    assign + encode ONLY the batch, append centroid-partitioned files.
    Cost scales with the batch, never the index; rebuild on distribution
    drift, append otherwise."""
    from .ivf import assign_centroid

    cents, books, residual = _load_ivfpq_meta(spark, path)
    assigned = assign_centroid(new_vecs.select(id_col, vec_col), vec_col, cents)
    _encode_with_vec(
        assigned, books, id_col, vec_col, passthrough=("centroid",),
        residual_cents=np.array(cents, dtype=np.float32) if residual else None,
    ).write.mode("append").partitionBy("centroid").parquet(path)


def search_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    oversample: int = 8,
    score_decimals: int | None = 5,
    streamed: bool = False,
    max_query_rows: int = 100_000,
    corpus_blocks: int = 1,
    max_group_rows: int = 2_000_000,
) -> DataFrame:
    """Top-k cosine over a persisted IVF-PQ index: probe routing prunes
    to n_probe centroid PARTITIONS, ADC candidates come from the
    column-pruned (id, centroid, pq_code) scan of those partitions alone,
    and the shared exact rescore reads the vector column for candidate
    rows of the probed partitions only. With n_probe = n_clusters and
    k·oversample ≥ the largest inverted list the result is provably
    exact top-k (the contract-query regime).

    Default regime collects the (guarded) query set, routes it
    driver-side and broadcasts per-centroid ADC tables;
    ``streamed=True`` keeps queries a DataFrame end to end — distributed
    probe routing (ivf.probe_centroids) + the salted, memory-bounded
    centroid cogroup (_cogroup_adc_candidates with the stored codes), so
    only the two training artifacts are ever broadcast."""
    import pandas as pd

    from .ivf import probe_centroids

    # residual mode changes only how codes were TRAINED/encoded; ADC
    # tables and every per-list cut work identically (build_ivfpq_index
    # docstring), so the flag is loaded but needs no branch here.
    cents, books, _residual = _load_ivfpq_meta(spark, path)
    m, n_codes, sub = books.shape
    kk_keep = k * oversample

    def _pruned(probed):
        return spark.read.parquet(path).filter(
            F.col("centroid").isin(list(probed))
        )

    if streamed:
        probes = probe_centroids(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
            ),
            "__qv",
            cents,
            n_probe,
        )
        probed = sorted(
            {r["centroid"] for r in probes.select("centroid").distinct().collect()}
        )
        idx = _pruned(probed)
        inv = idx.select(
            F.col(id_col).alias("neighbor_id"), "pq_code", "centroid"
        )
        cands = _cogroup_adc_candidates(
            probes, inv, books, kk_keep, corpus_blocks, max_group_rows,
            "search_ivfpq_index", coded=True,
        )
        return _rank_exact(cands, idx, queries, k, score_decimals, id_col, vec_col)

    require_side_input_sized(
        queries, max_query_rows, "search_ivfpq_index", "max_query_rows"
    )
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float32)
    tables = np.einsum("qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), books)
    cmat = np.array(cents, dtype=np.float32)
    p = min(n_probe, len(cents))
    order = np.argsort(-(q_mat @ cmat.T), axis=1, kind="stable")[:, :p]
    packed: dict[int, tuple] = {}
    for c in np.unique(order):
        rows = np.nonzero((order == c).any(axis=1))[0]
        packed[int(c)] = (q_ids[rows], tables[rows])
    idx = _pruned(sorted(packed))
    coded = idx.select(id_col, "centroid", "pq_code")
    bc = spark.sparkContext.broadcast(packed)

    def gen(batches):
        tbl = bc.value
        for pdf in batches:
            for cen, grp in pdf.groupby("centroid"):
                hit = tbl.get(int(cen))
                if hit is None:
                    continue
                ids, tabs = hit
                codes = np.frombuffer(
                    b"".join(grp["pq_code"]), dtype=np.uint8
                ).reshape(len(grp), m)
                b_ids = grp[id_col].to_numpy()
                sims = tabs[:, np.arange(m)[None, :], codes].sum(-1)
                out_q, out_n = [], []
                kk = min(kk_keep + 1, sims.shape[1])
                for qi in range(sims.shape[0]):
                    sel = keep_candidates(sims[qi], kk, 0.0)
                    keep = sel[b_ids[sel] != ids[qi]]
                    out_q.extend([ids[qi]] * len(keep))
                    out_n.extend(b_ids[keep])
                if out_q:
                    yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    cands = coded.mapInPandas(gen, "query_id long, neighbor_id long")
    from .similarity import cut_margin

    cands = _gemm_cut(
        cands, idx,
        q_ids, np.array([r[1] for r in qrows], dtype=np.float64),
        k, cut_margin(score_decimals), id_col, vec_col,
    )
    return _rank_exact(
        cands, idx, queries, k, score_decimals, id_col, vec_col, broadcast_q=True
    )
