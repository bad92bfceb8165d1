"""DSIR — Data Selection with Importance Resampling.

Beyond-reference curation operator (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", NeurIPS — public): select raw
web documents that look like a small high-quality TARGET corpus by
importance weight under two hashed bag-of-words models,

    log w(x) = Σ_tokens [ log p_target(b(t)) − log p_raw(b(t)) ]

with tokens hashed into B buckets (the paper's hashed n-gram features) and
add-1 smoothing so unseen buckets never zero out. Selection is either
deterministic top-k by weight (the paper's variant; the oracle mode) or
Gumbel top-k (proper sampling without replacement: rank by
``log w + Gumbel(seed, id)``, the standard reservoir-free formulation).

Scale shape (100 TB raw corpus):
- the two models are B-row tables (B ≈ 8-64k) — broadcast, never shuffled;
- scoring is one token explode + broadcast join + ONE partial-agg'd
  shuffle on doc id;
- top-k is Spark's TakeOrdered (per-partition heaps, no global sort).

Determinism (oracle-exact, the unigram_logprob recipe): bucket ids come
from engine-portable md5-prefix integers; each token's log-ratio is
quantized to DECIMAL(28,6) BEFORE the per-doc sum (decimal addition is
associative — partition order can't change the result — and the
quantization absorbs last-ulp libm differences between engines); ties
break by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scio_spark.functions.text import tokens

_HASH = "CAST(conv(substring(md5(token), 1, 12), 16, 10) AS BIGINT)"


def _bucket_model(df: DataFrame, text_col: str, buckets: int) -> DataFrame:
    """(bucket, logp): add-1-smoothed log2 probability per hash bucket.
    Output is at most ``buckets`` rows — broadcastable at any corpus
    size."""
    tok = df.select(F.explode(tokens(text_col)).alias("token"))
    cnt = (
        tok.select(F.expr(f"{_HASH} % {buckets}").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = cnt.agg(F.sum("cnt").alias("__n"))
    return cnt.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.expr(f"LOG2((cnt + 1) / CAST(__n + {buckets} AS DOUBLE))").alias(
            "logp"
        ),
        F.col("__n").alias("n_total"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 8192,
) -> DataFrame:
    """Per-raw-document log2 importance weight toward the target corpus.
    Returns (id_col, n_tokens, log_w decimal(28,6)). A token in a bucket
    NEITHER corpus populated still scores (both sides smoothed), so any
    raw doc gets a weight."""
    # The ratio table is collected to the driver and broadcast below, both
    # bounded by `buckets` — keep that bound an actual bound (the paper's
    # regime is 8-64k; 4M buckets ≈ 100 MB of rows is already generous).
    if buckets > (1 << 22):
        raise ValueError(
            f"dsir: buckets={buckets} exceeds the driver/broadcast bound "
            f"({1 << 22}); hashed DSIR models gain nothing past ~64k buckets"
        )
    # Deliberately TWO tokenize passes over raw (model, then scoring):
    # the alternative — stage a persisted (doc, bucket, cnt) table that
    # feeds both — was A/B'd at sf0.1 and lost 38% (3.16 s vs 2.29 s
    # median, identical results): the extra (doc,bucket) exchange plus
    # persist materialization costs more than re-running the pipelined
    # scan+hash, and at corpus scale the per-doc bucket table is itself
    # near-token-scale (long docs cap at `buckets` rows, short docs
    # don't), so spilling it approaches the cost of the second scan.
    #
    # The two MODELS, however, come from ONE union-tagged explode pass
    # (r15-opt; replaces two cached per-corpus _bucket_model passes + a
    # totals collect each + a ratio-join collect — 3 driver-blocking
    # jobs → 1): bucket counts per side are exact ints, so collecting the
    # ≤2·buckets (side,bucket,cnt) rows and rebuilding them as a literal
    # DataFrame changes nothing downstream. Totals are summed driver-side
    # (same ints first("n_total") read); every float expression — the
    # per-side logp and the lr subtraction with its DECIMAL(28,6) staging
    # — still evaluates in Spark SQL over the literal rows, inside the
    # scoring job's broadcast build (no separate job), so engine math is
    # bit-identical to the two-pass form.
    spark = raw.sparkSession
    both = target.select(
        F.lit(0).alias("__side"), F.col(text_col).alias("__t")
    ).unionByName(raw.select(F.lit(1).alias("__side"), F.col(text_col).alias("__t")))
    cnt_rows = (
        both.select("__side", F.explode(tokens("__t")).alias("token"))
        .select("__side", F.expr(f"{_HASH} % {buckets}").alias("bucket"))
        .groupBy("__side", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    n_tgt = sum(r["cnt"] for r in cnt_rows if r["__side"] == 0)
    n_raw = sum(r["cnt"] for r in cnt_rows if r["__side"] == 1)
    # Bucket alignment (the former full-outer join) is pure exact-int
    # bookkeeping — do it driver-side so the ratio plan is ONE Project
    # over a LocalTableScan (no join, no exchange) built inside the
    # scoring job's broadcast. NULL cnt propagates through LOG2(cnt+1…)
    # to NULL, so COALESCE falls back to the absent-bucket smoothing term
    # — the identical expression shape (and engine) as before.
    aligned: dict[int, list] = {}
    for r in cnt_rows:
        slot = aligned.setdefault(r["bucket"], [None, None])
        slot[r["__side"]] = r["cnt"]
    ratio = spark.createDataFrame(
        [(b, c[0], c[1]) for b, c in sorted(aligned.items())],
        schema="bucket bigint, cnt_t bigint, cnt_r bigint",
    ).select(
        "bucket",
        F.expr(
            f"CAST(COALESCE(LOG2((cnt_t + 1) / CAST({n_tgt} + {buckets} AS DOUBLE)),"
            f" LOG2(1.0 / ({n_tgt} + {buckets})))"
            f" - COALESCE(LOG2((cnt_r + 1) / CAST({n_raw} + {buckets} AS DOUBLE)),"
            f" LOG2(1.0 / ({n_raw} + {buckets})))"
            " AS DECIMAL(28,6)) AS lr"
        ),
    )
    tok = raw.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    scored = tok.select(
        id_col, F.expr(f"{_HASH} % {buckets}").alias("bucket")
    ).join(F.broadcast(ratio), "bucket")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("lr").cast("decimal(28,6)").alias("log_w"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 8192,
    mode: str = "topk",
    seed: int = 7,
) -> DataFrame:
    """Select ``k`` raw documents toward the target domain.

    mode="topk": deterministic highest-weight-first (ties by id) — the
    oracle-checkable variant. mode="gumbel": Gumbel top-k, i.e. sampling
    WITHOUT replacement proportional to the importance weights — the
    paper's resampling; the Gumbel is derived from a seeded md5 of the id
    so a rerun selects the same set."""
    w = dsir_weights(raw, target, id_col, text_col, buckets)
    if mode == "topk":
        key = F.col("log_w")
    elif mode == "gumbel":
        u = (
            f"(CAST(conv(substring(md5(concat('{seed}', CAST({id_col} AS "
            f"STRING))), 1, 12), 16, 10) AS DOUBLE) + 0.5) / 281474976710656.0"
        )
        key = F.col("log_w") + F.expr(
            f"CAST(-LOG2(-LOG2({u})) AS DECIMAL(28,6))"
        )
    else:
        raise ValueError(f"dsir_select: unknown mode {mode!r}")
    return (
        w.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col))
        .limit(k)
        .drop("__key")
    )
