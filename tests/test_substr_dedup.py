"""Exact-substring dedup tests (functions/substr_dedup.py).

Semantics pinned: ExactSubstr after Lee et al. 2022 at n-gram resolution —
first occurrence (corpus order by doc_id, pos) survives, every later
occurrence of a duplicated n-token span is marked/stripped, overlapping
gram hits merge into maximal spans.
"""

from pyspark.sql import functions as F

from scio_spark.functions.substr_dedup import (
    mark_duplicate_spans,
    strip_duplicate_spans,
)

A = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 unique_a tail_a"
B = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 unique_b tail_b"
C = "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11"


def fixture(spark):
    return spark.createDataFrame(
        [(1, A), (2, B), (3, C)], "doc_id long, text string"
    )


def test_first_occurrence_survives(spark):
    m = {r.doc_id: r for r in mark_duplicate_spans(fixture(spark), n=10).collect()}
    assert m[1].n_dup_tokens == 0 and list(m[1].spans) == []
    # three overlapping 10-gram hits (pos 0,1,2) merge into one span 0..11
    assert [(s.start, s.end) for s in m[2].spans] == [(0, 11)]
    assert m[2].n_dup_tokens == 12
    assert m[3].n_dup_tokens == 0
    assert m[2].n_tokens == 14


def test_strip_rebuilds_without_marked_spans(spark):
    s = {r.doc_id: r.text for r in strip_duplicate_spans(fixture(spark), n=10).collect()}
    assert s[1] == A
    assert s[2] == "unique_b tail_b"
    assert s[3] == C


def test_within_doc_repetition(spark):
    phrase = "p0 p1 p2 p3 p4 p5 p6 p7 p8 p9"
    df = spark.createDataFrame(
        [(1, f"{phrase} mid1 mid2 {phrase}")], "doc_id long, text string"
    )
    m = mark_duplicate_spans(df, n=10).head()
    # second occurrence starts at token 12
    assert [(s.start, s.end) for s in m.spans] == [(12, 21)]
    assert m.n_dup_tokens == 10


def test_min_count_threshold(spark):
    rows = [(i, B) for i in range(1, 4)]  # 3 identical docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # with min_count=4 nothing is duplicated enough
    m = mark_duplicate_spans(df, n=10, min_count=4)
    assert m.agg(F.sum("n_dup_tokens")).head()[0] == 0
    # with the default, docs 2 and 3 are fully marked over the shared prefix
    m2 = {r.doc_id: r.n_dup_tokens for r in mark_duplicate_spans(df, n=10).collect()}
    assert m2 == {1: 0, 2: 14, 3: 14}


def test_two_disjoint_spans(spark):
    p = "p0 p1 p2 p3 p4 p5 p6 p7 p8 p9"
    q = "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9"
    df = spark.createDataFrame(
        [
            (1, f"{p} xx {q}"),
            (2, f"{p} yy1 yy2 yy3 {q}"),
        ],
        "doc_id long, text string",
    )
    m = {r.doc_id: r for r in mark_duplicate_spans(df, n=10).collect()}
    assert [(s.start, s.end) for s in m[2].spans] == [(0, 9), (13, 22)]
    assert m[2].n_dup_tokens == 20
    assert m[1].n_dup_tokens == 0


def test_short_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    m = mark_duplicate_spans(df, n=10)
    assert m.agg(F.sum("n_dup_tokens")).head()[0] == 0
    assert m.count() == 2  # rows still present with zero counts


def test_hash_grams_parity(spark):
    """The 100 TB shuffle mode (64-bit gram fingerprints) gives the same
    answer as exact gram strings on the fixture."""
    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    exact = mark_duplicate_spans(df, n=10).orderBy("doc_id").collect()
    hashed = mark_duplicate_spans(df, n=10, hash_grams=True).orderBy("doc_id").collect()
    assert exact == hashed
    assert sum(r.n_dup_tokens for r in exact) > 0  # fixture has planted dups


def test_stability_under_repartition(spark):
    df = fixture(spark)
    a = mark_duplicate_spans(df.repartition(1), n=10).orderBy("doc_id").collect()
    b = mark_duplicate_spans(df.repartition(13), n=10).orderBy("doc_id").collect()
    assert a == b


def test_incremental_equals_full_rebuild(spark, tmp_path):
    """Batch marking against the staged gram index == full-corpus
    mark_duplicate_spans restricted to the batch (monotone ids)."""
    from pyspark.sql import functions as F

    from scio_spark.functions.substr_dedup import (
        incremental_duplicate_spans,
        stage_gram_index,
    )

    corpus = spark.createDataFrame(
        [(1, A), (2, B), (3, C)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, A),                      # full dup of corpus doc 1
            (11, "brand new content words here only once ok fine yes sir"),
            (12, B),                      # full dup of corpus doc 2
        ],
        "doc_id long, text string",
    )
    spark.sql("DROP TABLE IF EXISTS gram_idx_t")
    stage_gram_index(corpus, "gram_idx_t", n=10)
    inc = {
        r.doc_id: r
        for r in incremental_duplicate_spans(batch, "gram_idx_t", n=10).collect()
    }
    full = {
        r.doc_id: r
        for r in mark_duplicate_spans(corpus.unionByName(batch), n=10)
        .filter(F.col("doc_id") >= 10)
        .collect()
    }
    assert set(inc) == set(full) == {10, 11, 12}
    for k in inc:
        assert inc[k].n_dup_tokens == full[k].n_dup_tokens, k
        assert [tuple(s) for s in inc[k].spans] == [tuple(s) for s in full[k].spans], k
    # dup docs fully marked, novel doc untouched
    assert inc[10].n_dup_tokens == 14 and inc[11].n_dup_tokens == 0


def test_incremental_intra_batch_dups(spark):
    """Duplicates introduced WITHIN the batch (gram unseen by the corpus)
    are still caught — later batch occurrence marked, batch-first kept."""
    from scio_spark.functions.substr_dedup import (
        incremental_duplicate_spans,
        stage_gram_index,
    )

    corpus = spark.createDataFrame([(1, C)], "doc_id long, text string")
    phrase = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"
    batch = spark.createDataFrame(
        [(10, phrase + " endx"), (11, phrase + " endy")],
        "doc_id long, text string",
    )
    spark.sql("DROP TABLE IF EXISTS gram_idx_t2")
    stage_gram_index(corpus, "gram_idx_t2", n=10)
    inc = {
        r.doc_id: r.n_dup_tokens
        for r in incremental_duplicate_spans(batch, "gram_idx_t2", n=10).collect()
    }
    assert inc == {10: 0, 11: 10}


def test_rejects_non_integral_id(spark):
    """String ids would silently disable duplicate detection (string*int
    promotes to DOUBLE -> NULL encodings), so they are rejected up front
    with a remediation hint."""
    import pytest

    from scio_spark.functions.substr_dedup import mark_duplicate_spans

    df = spark.createDataFrame(
        [("a", "one two three four")], "doc_id string, text string"
    )
    with pytest.raises(TypeError, match="integral.*doc_id"):
        mark_duplicate_spans(df, n=2).collect()


def test_positional_encoding_bound_is_enforced_at_runtime(spark, monkeypatch):
    """The 2^24-token bound must raise, not silently corrupt: the check is
    folded into the consumed _id column because an assert_true staged via
    withColumn(...).drop() is PRUNED by Catalyst and never runs (verified
    failure mode of the previous spelling). Patch the base small so a
    9-token doc exceeds it."""
    import pytest

    import scio_spark.functions.substr_dedup as S

    monkeypatch.setattr(S, "_ENC_BASE", 8)
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i")], "doc_id int, text string"
    )
    grams = S._positional_ngrams(df, "doc_id", "text", 2, False)
    with pytest.raises(Exception) as ei:
        grams.collect()
    assert "positional-encoding bound" in str(ei.value)


def test_id_magnitude_bound_is_enforced_at_runtime(spark):
    """|id| >= 2^39 would overflow id*2^24 past BIGINT and silently corrupt
    first-occurrence selection (non-ANSI wraparound breaks encoding
    monotonicity), so it must raise actionably — the exact failure a user
    hits after remapping string ids with RAW xxhash64 (full-range signed
    64-bit), which is why the type-guard message recommends a bounded
    surrogate instead."""
    import pytest

    import scio_spark.functions.substr_dedup as S

    bad = spark.createDataFrame(
        [(1 << 40, "a b c d"), (-(1 << 40) - 7, "a b c d")],
        "doc_id long, text string",
    )
    grams = S._positional_ngrams(bad, "doc_id", "text", 2, False)
    with pytest.raises(Exception) as ei:
        grams.collect()
    assert "2^39 encoding bound" in str(ei.value)

    ok = spark.createDataFrame(
        [((1 << 39) - 1, "a b c d"), (-(1 << 39) + 1, "a b c d")],
        "doc_id long, text string",
    )
    assert S._positional_ngrams(ok, "doc_id", "text", 2, False).count() == 6


def test_id_bound_rejects_long_min(spark):
    """doc_id = LONG_MIN is the abs() landmine: under non-ANSI semantics
    abs(-2^63) wraps to -2^63 (negative), which a single-sided
    abs >= bound check waves through — the guard must be two-sided."""
    import pytest

    import scio_spark.functions.substr_dedup as S

    bad = spark.createDataFrame(
        [(-(1 << 63), "a b c d")], "doc_id long, text string"
    )
    grams = S._positional_ngrams(bad, "doc_id", "text", 2, False)
    with pytest.raises(Exception) as ei:
        grams.collect()
    assert "2^39 encoding bound" in str(ei.value)
