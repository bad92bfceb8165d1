"""Trainable byte-pair-encoding tokenizer over DataFrames.

Beyond-reference training-pipeline operator (the brief's text-analysis
family): the existing ``text.token_count`` is the whitespace/regex
estimator; this module adds a real, trainable subword tokenizer — the
original BPE algorithm (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units", public): iteratively merge the most
frequent adjacent symbol pair until the vocabulary budget is reached.

Scale shape (the part that matters at 100 TB):
- **Training** runs on the *word histogram*, not the corpus: one
  distributed explode→groupBy→count (partial-aggregated by Spark), then
  only the ``max_words`` most frequent (word, count) rows — a bounded,
  Zipf-dominated side input — reach the driver for the merge loop. The
  corpus never does. This is how production BPE trainers work too
  (frequency tables, not text, drive the merges).
- **Encoding** broadcasts the merge ranks and applies them in an
  Arrow-batched pandas UDF with an LRU word cache — per-row Python cost
  amortizes to per-*distinct-word* cost within a batch.

Determinism is pinned: ties on pair frequency break lexicographically, so
the same corpus always yields the same merge table on any cluster layout.
"""

from collections import Counter
from typing import Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_histogram(df: DataFrame, text_col: str, max_words: int = 50000) -> list:
    """Distributed word-frequency table: whitespace-split, explode, count,
    keep the ``max_words`` most frequent. Returns [(word, count)] rows —
    the only data that travels to the driver for training."""
    counts = (
        df.select(
            F.explode(
                F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
    )
    return [(r.w, r.c) for r in counts.collect()]


def train_merges(word_counts: Iterable[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """The BPE merge loop over a word histogram: each round merges the
    globally most frequent adjacent symbol pair (ties: lexicographically
    smallest pair — determinism pin). Words start as character sequences
    with an end-of-word marker so merges never cross word boundaries."""
    words: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        seq = tuple(list(w) + [END])
        words[seq] = words.get(seq, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for seq, c in words.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == best_n)
        merges.append(best)
        a, b = best
        ab = a + b
        new_words: dict[tuple[str, ...], int] = {}
        for seq, c in words.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            k = tuple(out)
            new_words[k] = new_words.get(k, 0) + c
        words = new_words
    return merges


def train_bpe(
    df: DataFrame, text_col: str, n_merges: int = 1000, max_words: int = 50000
) -> list[tuple[str, str]]:
    """End-to-end training: distributed histogram → driver merge loop."""
    return train_merges(word_histogram(df, text_col, max_words), n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    seq = list(word) + [END]
    while len(seq) > 1:
        best_rank, best_i = None, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return tuple(seq)


def bpe_tokenize(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """Column expression: text → array<string> of BPE tokens. The merge
    ranks ship inside the serialized UDF (broadcast-sized by construction:
    ≤ n_merges entries); encoding caches per distinct word."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    # the word cache lives inside the UDF (a pickled lru_cache closure
    # won't serialize) — one dict per executor batch, exactly the reuse
    # we want
    @F.pandas_udf("array<string>")
    def enc(s: pd.Series) -> pd.Series:
        cache: dict[str, tuple[str, ...]] = {}
        out = []
        for text in s:
            if text is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in text.split():
                t = cache.get(w)
                if t is None:
                    t = cache[w] = _encode_word(w, ranks)
                toks.extend(t)
            out.append(toks)
        return pd.Series(out)

    return enc(text_col)


def bpe_token_count(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """Column expression: exact subword token count under a trained BPE —
    the budget number a training pipeline actually bills by (token_count's
    whitespace estimate is the cheap proxy)."""
    return F.array_size(bpe_tokenize(text_col, merges))
