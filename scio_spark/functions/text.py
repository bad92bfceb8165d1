"""Text analysis for large-scale training-data pipelines.

These go beyond the scio reference surface (BASELINE.json north star): language
ID (stopword-hit heuristic), quality scoring (length/punct/stopword ratios),
token counting (whitespace + regex), and document fingerprinting. Everything is
built from pyspark.sql.functions expressions — JVM-side, whole-stage-codegen,
zero Python UDFs — so a 100 TB corpus scan stays a single vectorized pass.

Every helper returns a Column; the constructions deliberately use only
functions with exact DuckDB equivalents (md5, instr, regexp splits, array
ops) so results are oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "que"],
}

#: default quality-score weights (length, stopword, word-length, punct)
QUALITY_WEIGHTS = (0.25, 0.35, 0.25, 0.15)


def tokens(col) -> Column:
    """Whitespace tokenization: regex split with empty tokens filtered out.
    The filter matters at the edges — Spark's ``trim`` strips only SPACES,
    so tab/newline-led text would otherwise yield a leading '' token
    (``"\\t1"`` → ``['', '1']``), found by the chunking property test."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


def token_count(col) -> Column:
    """Token count; blank/whitespace-only text counts 0."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(tokens(c))


def char_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    clean = F.regexp_replace(c, r"[A-Za-z0-9 ]", "")
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.length(clean) / F.length(c)
    )


def stopword_hits(col, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))


def stopword_ratio(col, lang: str = "en") -> Column:
    n = token_count(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(stopword_hits(col, lang) / n)


def mean_word_len(col) -> Column:
    n = token_count(col)
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(total / n)


def quality_score(col, weights=QUALITY_WEIGHTS) -> Column:
    """Composite quality heuristic in [0, 1]:
    length factor (saturating at 200 tokens), stopword factor (target ~0.4),
    mean-word-length factor (target 3-10 chars), low-punctuation factor."""
    w_len, w_stop, w_wlen, w_punct = weights
    n = token_count(col)
    len_f = F.least(n / F.lit(200.0), F.lit(1.0))
    stop_f = F.least(stopword_ratio(col) / F.lit(0.4), F.lit(1.0))
    wl = mean_word_len(col)
    wlen_f = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.4))
    punct_f = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    return (
        len_f * w_len + stop_f * w_stop + wlen_f * w_wlen + punct_f * w_punct
    )


def with_quality_score(df, col: str = "text", out_col: str = "quality", weights=QUALITY_WEIGHTS):
    """Staged quality_score: shared components (token count, stopword hits,
    char counts, punct ratio) computed ONCE in a first projection, the
    composite in a second. Same arithmetic as :func:`quality_score`, but the
    generated code is ~6× cheaper — the single-projection form re-expands
    the tokenization into every factor and blows up codegen."""
    w_len, w_stop, w_wlen, w_punct = weights
    staged = df.select(
        "*",
        token_count(col).alias("__n"),
        stopword_hits(col).alias("__sw"),
        F.length(F.regexp_replace(F.trim(F.col(col)), r"\s+", "")).alias("__cns"),
        punct_ratio(col).alias("__pr"),
    )
    n = F.col("__n")
    stop_ratio = F.when(n == 0, F.lit(0.0)).otherwise(F.col("__sw") / n)
    wl = F.when(n == 0, F.lit(0.0)).otherwise(F.col("__cns") / n)
    score = (
        F.least(n / F.lit(200.0), F.lit(1.0)) * w_len
        + F.least(stop_ratio / F.lit(0.4), F.lit(1.0)) * w_stop
        + F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.4)) * w_wlen
        + (F.lit(1.0) - F.least(F.col("__pr") * 4.0, F.lit(1.0))) * w_punct
    )
    return staged.withColumn(out_col, score).drop("__n", "__sw", "__cns", "__pr")


def lang_id(col) -> Column:
    """Language ID heuristic: CJK script check, else argmax of stopword hits
    with deterministic preference order en > de > fr > es; 'und' when no
    stopword hits at all."""
    c = F.col(col) if isinstance(col, str) else col
    has_cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", "")) > 0
    hits = {lang: stopword_hits(c, lang) for lang in ["en", "de", "fr", "es"]}
    best = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]), F.lit("de"))
        .when(hits["fr"] >= hits["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    total = hits["en"] + hits["de"] + hits["fr"] + hits["es"]
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(total == 0, F.lit("und"))
        .otherwise(best)
    )


def with_lang_id(df, col: str = "text", out_col: str = "lang_pred"):
    """Staged lang_id: per-language stopword hits computed once, the argmax
    CASE in a second projection (same decision logic as :func:`lang_id`,
    cheaper codegen)."""
    c = F.col(col)
    staged = df.select(
        "*",
        *[stopword_hits(c, lang).alias(f"__h_{lang}") for lang in ["en", "de", "fr", "es"]],
        (F.length(F.regexp_replace(c, r"[^一-鿿]", "")) > 0).alias("__cjk"),
    )
    h = {lang: F.col(f"__h_{lang}") for lang in ["en", "de", "fr", "es"]}
    best = (
        F.when((h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["es"]), F.lit("en"))
        .when((h["de"] >= h["fr"]) & (h["de"] >= h["es"]), F.lit("de"))
        .when(h["fr"] >= h["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    total = h["en"] + h["de"] + h["fr"] + h["es"]
    pred = (
        F.when(F.col("__cjk"), F.lit("zh")).when(total == 0, F.lit("und")).otherwise(best)
    )
    return staged.withColumn(out_col, pred).drop(
        "__cjk", *[f"__h_{lang}" for lang in ["en", "de", "fr", "es"]]
    )


def fingerprint(col) -> Column:
    """Token-sort fingerprint: md5 over the sorted distinct token set — the
    classic key for fuzzy exact-dedup (case/word-order insensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_sort(F.array_distinct(tokens(F.lower(c))))
    return F.md5(F.array_join(toks, " "))


def normalized_text(col) -> Column:
    """Canonical form for exact dedup: lowercase, collapsed whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def winnow_fingerprints(
    df, id_col: str, text_col: str, k: int = 5, w: int = 4
):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm; public). Complements the whole-doc
    token-sort ``fingerprint``: LOCAL fingerprints with the winnowing
    guarantee — any shared token run of length >= w + k - 1 between two
    documents shares at least one fingerprint, at expected density
    2/(w+1) of the k-gram count.

    Mechanics, all JVM column expressions (no Python in the hot path):
    token k-grams → 48-bit hashes (md5 hex prefix, engine-portable) →
    for each window of w consecutive hashes keep the RIGHTMOST minimum.
    The rightmost-tie argmin is one ``array_min`` over ``h*w + r`` where
    ``r`` is the distance from the window end (r < w, and h < 2^48 keeps
    the product well inside BIGINT) — so the whole selection is
    deterministic integer math that replays exactly in SQL.

    Returns (id_col, pos int, fp long): distinct selected fingerprints
    with their 1-based gram positions. One projection + one explode —
    no shuffle until the caller aggregates."""
    if k < 1 or w < 1:
        raise ValueError("winnow_fingerprints: k and w must be >= 1")
    sep = "\\u001f"
    toks = (
        f"filter(split(trim(lower({text_col})), '\\\\s+'), x -> x != '')"
    )
    hs = (
        f"transform(sequence(1, size(__toks) - {k} + 1), "
        f"i -> cast(conv(substring(md5("
        f"array_join(slice(__toks, i, {k}), '{sep}')), 1, 12), 16, 10) "
        f"as bigint))"
    )
    # enc(e) = min over r in [0, w) of h[e-r]*w + r  (rightmost min wins).
    # Staged through an inner transform so each window's min is computed
    # ONCE and shared by the pos and fp projections (the unstaged form
    # evaluated the w-element min scan twice per gram — measured ~12%
    # off the whole operator at sf0.1).
    enc = (
        f"array_min(transform(sequence(0, {w} - 1), "
        f"r -> element_at(__hs, e - r) * {w} + r))"
    )
    selected = (
        f"array_distinct(transform("
        f"transform(sequence({w}, size(__hs)), "
        f"e -> named_struct('e', e, 'v', {enc})), "
        f"s -> named_struct("
        f"'pos', cast(s.e - s.v % {w} as int), "
        f"'fp', s.v div {w})))"
    )
    return (
        df.select(id_col, F.expr(toks).alias("__toks"))
        .filter(F.size("__toks") >= k + w - 1)
        .select(id_col, F.expr(hs).alias("__hs"))
        .select(id_col, F.explode(F.expr(selected)).alias("__s"))
        .select(id_col, F.col("__s.pos").alias("pos"), F.col("__s.fp").alias("fp"))
    )


def repetition_signals(
    df, id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """Gopher-style repetition quality signals (Rae et al. 2021, app. A —
    the rules web-scale pipelines filter on): documents dominated by
    repeated words or n-grams are boilerplate/SEO/scrape artifacts. Per doc:

    - ``n_tokens``
    - ``distinct_word_ratio``  (|distinct words| / |words|)
    - ``top_word_fraction``    (most frequent word's share)
    - ``dup_bigram_fraction``  (1 − |distinct bigrams| / |bigrams|)

    The word mode is one explode + two partial-aggregated groupBys — the
    scalable idiom (no per-doc Python). The token and bigram arrays are
    STAGED in their own projections (the with_quality_score lesson, worse
    here: an unstaged form re-expands the regex split inside every factor
    and inside each per-element lambda step — O(words²) work per doc and a
    codegen blowup; staging made the sf0.1 query ~10× faster)."""
    toks = df.select(F.col(id_col), tokens(text_col).alias("__w"))
    w = F.col("__w")
    staged = toks.select(
        F.col(id_col),
        w,
        F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i + 1), F.element_at(w, i + 2)
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__g"),
    )
    g = F.col("__g")
    base = staged.select(
        F.col(id_col),
        F.size(w).alias("n_tokens"),
        (F.size(F.array_distinct(w)) / F.size(w)).alias("distinct_word_ratio"),
        F.when(F.size(g) > 0, 1.0 - F.size(F.array_distinct(g)) / F.size(g))
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_fraction"),
    )
    top = (
        toks.select(F.col(id_col), F.explode(w).alias("__word"))
        .groupBy(id_col, "__word")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top"))
    )
    return base.join(top, id_col).select(
        id_col,
        "n_tokens",
        "distinct_word_ratio",
        (F.col("__top") / F.col("n_tokens")).alias("top_word_fraction"),
        "dup_bigram_fraction",
    )


def corpus_stats(
    df, text_col: str = "text", exact_vocab: bool = True
) -> "DataFrame":
    """One-row corpus profile — the numbers every training-data conversation
    starts with: total_docs, total_tokens, p50/p99 document length, and
    vocabulary size.

    ``exact_vocab=True`` counts distinct words exactly (explode + distinct
    count — fine to tens of billions of token occurrences; the shuffle
    carries one row per distinct word per partition after partial agg).
    ``False`` switches to approx_count_distinct (HLL++, one pass, ~2%
    error) — the 100 TB default. Percentiles are exact (`percentile`,
    linear interpolation — the same semantics as DuckDB's quantile_cont,
    so the profile is oracle-checkable)."""
    n = token_count(text_col)
    base = df.select(n.alias("__n"), tokens(text_col).alias("__w"))
    core = base.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum("__n").alias("total_tokens"),
        F.expr("percentile(__n, 0.5)").alias("p50_tokens"),
        F.expr("percentile(__n, 0.99)").alias("p99_tokens"),
    )
    words = base.select(F.explode("__w").alias("__word"))
    vocab = (
        words.agg(F.countDistinct("__word").alias("vocab_size"))
        if exact_vocab
        else words.agg(F.approx_count_distinct("__word").alias("vocab_size"))
    )
    return core.crossJoin(vocab)


# ------------------------------------------------------------------ PII scrub

#: (name, pattern, replacement) — applied in order. Patterns restrict to the
#: RE2-compatible subset (no lookaround) so the DuckDB oracle runs the SAME
#: regexes; replacements contain no digits, so later patterns can't match
#: inside earlier masks. Spark regexp_replace is global by default; the
#: DuckDB mirror needs the 'g' flag.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_pii(col) -> Column:
    """Mask emails / SSNs / phone numbers / IPv4s — the redaction pass every
    web-scraped training corpus runs before anything else. Pure chained
    regexp_replace: JVM-side, codegen'd, one corpus scan at 100 TB."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(col) -> list[Column]:
    """Per-category PII hit counts (pre-scrub audit signal): one
    ``n_<category>`` column per PII_PATTERNS entry."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


# ------------------------------------------------------------------- chunking

def chunk_text(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
):
    """Sliding-window token chunking — the RAG-indexing / context-packing
    primitive: each document explodes into overlapping windows of
    ``chunk_tokens`` whitespace tokens advancing by ``chunk_tokens −
    overlap``. Returns (id, chunk_id, n_tokens, chunk); the final chunk may
    be short; zero-token docs emit nothing.

    All JVM expressions (split/sequence/posexplode/slice/array_join): the
    explode fans out rows but shuffles nothing — chunking stays inside the
    scan stage at any corpus size."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("chunk_text: need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    src = (
        df.select(id_col, tokens(F.col(text_col)).alias("__t"))
        .withColumn("__n", F.size("__t"))
        # tokens() filters empty tokens, so blank/whitespace-only docs are
        # exactly the zero-token ones — they emit nothing
        .filter(F.col("__n") > 0)
    )
    starts = F.sequence(F.lit(0), F.col("__n") - 1, F.lit(step))
    chunk = F.slice(F.col("__t"), F.col("__s") + 1, chunk_tokens)
    return (
        src.select(id_col, "__t", F.posexplode(starts).alias("chunk_id", "__s"))
        .select(
            id_col,
            "chunk_id",
            F.size(chunk).alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk"),
        )
    )


# --------------------------------------------- unigram LM scoring (CCNet-style)

def unigram_model(df, text_col: str = "text"):
    """Train a unigram language model over a corpus: one row per distinct
    token with its count and probability ``p = cnt / total``.

    The CCNet pipeline (Wenzek et al. 2020) filters web text by LM
    perplexity; a unigram model is the fully-SQL-expressible member of that
    family and already separates boilerplate from prose. Cost shape at
    100 TB: one explode + one partially-aggregated shuffle on the token —
    the output is vocabulary-sized (millions of rows, not corpus-sized), so
    the model broadcasts to the scoring pass."""
    toks = df.select(F.explode(tokens(text_col)).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "token", "cnt", (F.col("cnt") / F.col("__total")).alias("p")
    )


def unigram_logprob(
    df,
    model=None,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document bits-per-token under a unigram LM — the perplexity-proxy
    quality signal (low = repetitive/common, high = rare-token soup; both
    tails get filtered in CCNet-style curation).

    ``model`` defaults to a model trained on ``df`` itself (self-scoring —
    no OOV by construction). Pass a pre-trained ``unigram_model`` output to
    score a new batch; tokens absent from the model are dropped from the
    average (inner join semantics), which keeps the result exactly
    SQL-replayable.

    Determinism: each token's −log2 p is quantized to DECIMAL(28,6) before
    the per-doc sum (decimal addition is associative; raw double sums are
    partition-order dependent), and the quantization also absorbs any
    last-ulp libm difference between engines. Returns
    (id, n_tokens, bits_per_token)."""
    if model is None:
        model = unigram_model(df, text_col)
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    joined = tok.join(F.broadcast(model.select("token", "p")), "token", "inner")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.expr(
            "CAST(CAST(SUM(CAST(-LOG2(p) AS DECIMAL(28,6))) AS DOUBLE)"
            " / COUNT(*) AS DOUBLE)"
        ).alias("bits_per_token"),
    )


def bigram_model(df, text_col: str = "text"):
    """Train a bigram LM: one row per distinct adjacent token pair with
    ``p_bi = cnt(w1,w2) / cnt(w1·)`` (denominator = w1's count as a pair
    LEFT, so probabilities condition on exactly the events the numerator
    draws from — SQL-replayable with no smoothing constants).

    The CCNet-style upgrade over ``unigram_model``: bigram perplexity
    separates fluent prose from shuffled-word soup that unigram statistics
    cannot see. Cost shape at 100 TB: pair explode (~1× corpus tokens) →
    one partially-aggregated shuffle on the pair; output is
    bigram-vocabulary-sized, which broadcasts for scoring."""
    t = df.select(tokens(text_col).alias("t")).filter(F.size("t") >= 2)
    pairs = t.select(
        F.explode(
            F.zip_with(
                F.expr("slice(t, 1, size(t) - 1)"),
                F.expr("slice(t, 2, size(t) - 1)"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("pr")
    ).select("pr.w1", "pr.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt12"))
    left = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("cnt1"))
    return big.join(left, "w1").select(
        "w1", "w2", "cnt12", "cnt1",
        (F.col("cnt12") / F.col("cnt1")).alias("p_bi"),
    )


def bigram_logprob(
    df,
    bigram=None,
    unigram=None,
    lam: float = 0.75,  # binary-exact, as is 1-lam: engines interpolate identically
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document bits-per-token under an interpolated bigram LM:
    ``p = lam·p(w2|w1) + (1−lam)·p_uni(w2)`` over each adjacent pair
    (tokens 2..n are scored; unseen bigrams back off to the unigram term,
    so a trained model scores novel text without zeros). Models default to
    self-training on ``df``. Determinism follows ``unigram_logprob``:
    −log2 p quantized to DECIMAL(28,6) before the per-doc sum. Returns
    (id, n_scored, bits_per_token)."""
    if bigram is None:
        bigram = bigram_model(df, text_col)
    if unigram is None:
        unigram = unigram_model(df, text_col)
    t = df.select(F.col(id_col), tokens(text_col).alias("t")).filter(
        F.size("t") >= 2
    )
    pairs = t.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.expr("slice(t, 1, size(t) - 1)"),
                F.expr("slice(t, 2, size(t) - 1)"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("pr"),
    ).select(id_col, "pr.w1", "pr.w2")
    scored = (
        pairs.join(
            F.broadcast(bigram.select("w1", "w2", "p_bi")), ["w1", "w2"], "left"
        )
        .join(
            F.broadcast(
                unigram.select(F.col("token").alias("w2"), F.col("p").alias("p_uni"))
            ),
            "w2",
            "inner",  # token absent from the unigram model → dropped (OOV)
        )
        .withColumn(
            "p",
            F.lit(lam) * F.coalesce("p_bi", F.lit(0.0))
            + F.lit(1.0 - lam) * F.col("p_uni"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.expr(
            "CAST(CAST(SUM(CAST(-LOG2(p) AS DECIMAL(28,6))) AS DOUBLE)"
            " / COUNT(*) AS DOUBLE)"
        ).alias("bits_per_token"),
    )


# ------------------------------------------------------------- TF-IDF keywords

def tfidf_topk(
    df,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-k characteristic terms per document by TF-IDF — the classic
    keyword-extraction / topic-tagging primitive for corpus exploration.

    ``score = tf · ln(N / df_t)`` with the raw document frequency (no
    smoothing: every scored token occurs in ≥1 doc, so df_t ≥ 1 and the log
    is finite). Scores are quantized to DECIMAL(28,6) BEFORE ranking so the
    (score DESC, token ASC) order is total and engine-independent.

    Cost shape at 100 TB: tf = one shuffle on (doc, token); df_t = one
    partially-aggregated shuffle on token producing a vocabulary-sized
    table that broadcasts back; the rank is a per-document window (shuffle
    on doc id). Returns (id, token, score, rank), rank 1..k."""
    from pyspark.sql import Window

    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    ndocs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(ndocs))
        .select(
            F.col(id_col),
            "token",
            F.expr("CAST(tf * LN(__n / df_t) AS DECIMAL(28,6))").alias("__sq"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__sq"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "token",
            F.col("__sq").cast("double").alias("score"),
            "rank",
        )
    )


def autocomplete_topk(
    df,
    text_col: str = "text",
    k: int = 3,
    min_prefix: int = 1,
    max_prefix: int = 4,
) -> Column:
    """Top-k autocomplete candidates per prefix — the scio AutoComplete
    example (scio-examples/.../complete/AutoComplete.scala) re-expressed
    declaratively: count terms corpus-wide, explode each term into its
    prefixes (lengths ``min_prefix..max_prefix`` — bounding prefix length
    bounds the explode fan-out at scale), rank terms per prefix by
    (count DESC, term ASC) and keep the top ``k``.

    Returns (prefix, term, n, rank). The per-prefix ranked window is the
    hot-key-aware spot: prefix cardinality grows with vocabulary (not
    corpus), and each prefix group holds at most |terms sharing it| rows —
    for web-scale vocabularies switch the final rank to the two-phase
    pair.top_by_key shape."""
    from pyspark.sql import Window

    terms = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        # terms shorter than min_prefix have no valid prefix and must emit
        # NOTHING — unguarded, sequence(min_prefix, length) DESCENDS when
        # length < min_prefix (Spark's sequence auto-steps -1) and would
        # fabricate bogus prefixes for the short term
        .filter(F.length("term") >= min_prefix)
    )
    pref = terms.select(
        "term",
        "n",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(min_prefix),
                    F.least(F.length("term"), F.lit(max_prefix)),
                ),
                lambda i: F.col("term").substr(F.lit(1), i),
            )
        ).alias("prefix"),
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("n"), F.asc("term"))
    return (
        pref.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("prefix", "term", "n", "rank")
    )
