"""BPE tokenizer tests (functions/bpe.py).

The merge table for the canonical corpus from the BPE paper (Sennrich et
al. 2016: low×5 lower×2 newest×6 widest×3) is hand-derived below, so the
trainer is pinned to the published algorithm, not to itself.
"""

from pyspark.sql import functions as F

from scio_spark.functions.bpe import (
    END,
    bpe_token_count,
    bpe_tokenize,
    train_bpe,
    train_merges,
    word_histogram,
)

PAPER_COUNTS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]

# Hand-derived: round 1 pair counts peak at 9 for (e,s),(s,t),(t,</w>);
# lexicographic tie-break picks (e,s); then (es,t) and (est,</w>) at 9;
# then (l,o) beats (o,w) at 7 by tie-break; then (lo,w) at 7.
PAPER_MERGES = [
    ("e", "s"),
    ("es", "t"),
    ("est", END),
    ("l", "o"),
    ("lo", "w"),
]


def test_train_matches_paper_example():
    assert train_merges(PAPER_COUNTS, 5) == PAPER_MERGES


def test_unseen_word_segments_with_learned_units(spark):
    df = spark.createDataFrame([("lowest",)], "text string")
    out = df.select(bpe_tokenize(F.col("text"), PAPER_MERGES).alias("t")).head()
    assert out.t == ["low", "est" + END]


def test_train_is_deterministic_under_repartition(spark):
    texts = [("low low low lower newest newest widest",)] * 4
    df = spark.createDataFrame(texts, "text string")
    m1 = train_bpe(df.repartition(1), "text", n_merges=8)
    m2 = train_bpe(df.repartition(7), "text", n_merges=8)
    assert m1 == m2


def test_encode_reconstructs_text(spark):
    """Lossless segmentation: joining a word's tokens and stripping the
    end marker reproduces the word, for every word (trained and unseen)."""
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",),
         ("the quiet fog over the brown bog",)],
        "text string",
    )
    merges = train_bpe(df, "text", n_merges=20)
    toks = df.select(
        F.col("text"), bpe_tokenize(F.col("text"), merges).alias("t")
    ).collect()
    for r in toks:
        rebuilt = "".join(r.t).replace(END, " ").strip()
        assert rebuilt == " ".join(r.text.split())


def test_token_count_column(spark):
    df = spark.createDataFrame([("lowest lowest",), (None,)], "text string")
    out = df.select(bpe_token_count(F.col("text"), PAPER_MERGES).alias("n")).collect()
    assert [r.n for r in out] == [4, None]


def test_histogram_truncation_keeps_most_frequent(spark):
    df = spark.createDataFrame(
        [("a a a b b c",)], "text string"
    )
    hist = word_histogram(df, "text", max_words=2)
    assert hist == [("a", 3), ("b", 2)]


def test_merge_budget_respected():
    merges = train_merges(PAPER_COUNTS, 3)
    assert len(merges) == 3
    # and an absurd budget stops when no pairs remain
    merges_all = train_merges([("ab", 1)], 100)
    assert len(merges_all) < 100
