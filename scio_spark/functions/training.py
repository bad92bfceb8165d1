"""Training-set mechanics: deterministic splits, reproducible shuffles,
shard writing — the operations between "corpus is clean" and "trainer reads
files". All pure JVM expressions; nothing touches the driver.

No scio counterpart (SURVEY §2.7 note: training-pipeline extensions are this
repo's BASELINE north star); semantics follow the standard web-corpus
pipeline shape.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unit_hash(id_col: str, seed: int):
    """u ∈ [0,1) as a pure function of (seed, id): first 8 hex digits of
    md5("seed:id") / 2^32. md5 keeps it replayable bit-for-bit in any
    engine (DuckDB: ``('0x'||substring(md5(s),1,8))::BIGINT / 2^32``)."""
    h = F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
        1,
        8,
    )
    return F.conv(h, 16, 10).cast("double") / F.lit(float(2**32))


def _md5_slice(id_col: str, seed) -> "F.Column":
    """48-bit BIGINT hash of (seed, id) — the engine-portable slice:
    ``CAST(conv(substring(md5(seed||'|'||id),1,12),16,10) AS BIGINT)`` in
    Spark == ``('0x'||substr(md5(seed||'|'||id),1,12))::BIGINT`` in DuckDB.
    Always non-negative, so ``pmod`` and ``%`` agree across engines."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")


def hash_split(
    df: DataFrame,
    splits: Mapping[str, float],
    id_col: str,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic, row-stable train/val/test assignment.

    Unlike ``randomSplit`` (a per-partition Bernoulli sample whose outcome
    depends on partitioning and evaluation order), the assignment here is a
    pure function of the row id: stable under repartitioning, re-runs, and
    incremental data arrivals — a new document joining the corpus never
    flips an existing document's split, which is the property that keeps
    eval sets uncontaminated across corpus refreshes.

    ``splits``: ordered {name: fraction}, fractions summing to ~1. Rows land
    in the split whose cumulative-boundary interval contains u(seed, id).
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1 (got {total})")
    u = _unit_hash(id_col, seed)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, expr)


def training_shuffle(
    df: DataFrame, id_col: str, seed: int = 42
) -> DataFrame:
    """Reproducible global shuffle: sort by a seeded hash of the id.
    ``orderBy`` is Spark's range-partitioned distributed sort (one sampling
    pass + one exchange) — the scalable way to produce the same permutation
    on every run; a different seed is a fresh permutation."""
    return df.orderBy(
        F.xxhash64(F.lit(seed), F.col(id_col)), F.col(id_col)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    seed: int = 42,
    sort_within: Sequence[str] | None = None,
    hash: str = "xxhash64",
) -> None:
    """Write the corpus as ``shard=N`` parquet partitions with deterministic
    shard membership (pmod of the seeded id hash) and a deterministic
    within-shard order (second-seed hash sort). Trainers stream shards
    independently; re-running the writer reproduces byte-identical shard
    membership. One exchange total (the repartition IS the shard layout).

    ``hash="xxhash64"`` (default) is the fast JVM path; ``hash="md5"``
    derives the shard from the engine-portable md5-slice hash instead, so
    the layout replays bit-for-bit in any engine
    (``('0x'||substr(md5(seed||'|'||id),1,12))::BIGINT % n_shards``)."""
    if hash == "xxhash64":
        h1 = F.xxhash64(F.lit(seed), F.col(id_col))
        h2 = F.xxhash64(F.lit(seed + 1), F.col(id_col))
    elif hash == "md5":
        h1 = _md5_slice(id_col, seed)
        h2 = _md5_slice(id_col, seed + 1)
    else:
        raise ValueError(f"hash must be 'xxhash64' or 'md5', got {hash!r}")
    shard = F.pmod(h1, F.lit(n_shards))
    order = sort_within or [id_col]
    (
        df.withColumn("shard", shard.cast("int"))
        .repartition(n_shards, "shard")
        # lead with 'shard': partitionBy requires the writer's rows
        # clustered by the partition column, and a sort NOT led by it
        # makes Spark insert its OWN sort on top — whose equal-key merge
        # order under spills is not guaranteed stable, silently breaking
        # the promised deterministic within-shard order (and paying a
        # redundant second sort)
        .sortWithinPartitions("shard", h2, *order)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def pack_sequences(
    df: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Greedy sequence packing: concatenate consecutive documents into packs
    whose summed token count stays ≤ ``token_budget`` — the step that turns
    a cleaned corpus of short documents into full context windows (padding
    waste → ~0). Returns one row per pack:
    (doc_ids, n_docs, total_tokens, text).

    Semantics match the reference BatchDoFn shape (collection.batch_weighted
    with a token weight): a pack closes when the next doc would overflow the
    budget; a single doc heavier than the budget forms its own pack. Packs
    are partition-local (zero shuffle; at most one under-full pack per
    partition) — run after ``training_shuffle`` so pack composition is
    deterministic AND mixed. Token counting = functions/text.token_count
    (whitespace tokens); swap in a BPE count column upstream if exactness
    to a tokenizer matters."""
    import pandas as pd

    from scio_spark.functions.text import token_count

    # NULL texts are skipped up front: size(split(NULL)) is -1 under the
    # legacy conf (silently shrinking the pack budget) or NULL under ANSI
    # (int(NaN) crash), and ''.join over a None raises in the executor
    src = (
        df.filter(F.col(text_col).isNotNull())
        .select(id_col, text_col)
        .withColumn("__tok", token_count(text_col).cast("long"))
    )
    # doc_ids element type follows the id column (string ids pack as
    # array<string>, etc.) instead of a hardcoded array<long>
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"doc_ids array<{id_type}>, n_docs int, total_tokens long, text string"
    )

    def gen(batches):
        cur_ids: list[int] = []
        cur_texts: list[str] = []
        cur_tok = 0

        def close():
            nonlocal cur_ids, cur_texts, cur_tok
            row = (cur_ids, len(cur_ids), cur_tok, sep.join(cur_texts))
            cur_ids, cur_texts, cur_tok = [], [], 0
            return row

        for pdf in batches:
            out = []
            for i, t, tk in zip(pdf[id_col], pdf[text_col], pdf["__tok"]):
                if cur_ids and cur_tok + int(tk) > token_budget:
                    out.append(close())
                cur_ids.append(i)
                cur_texts.append(t)
                cur_tok += int(tk)
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["doc_ids", "n_docs", "total_tokens", "text"],
                )
        if cur_ids:
            yield pd.DataFrame(
                [close()],
                columns=["doc_ids", "n_docs", "total_tokens", "text"],
            )

    return src.mapInPandas(gen, out_schema)


def mixture_sample(
    sources: Mapping[str, tuple],
    id_col: str = "doc_id",
    seed: int = 42,
    source_col: str = "source",
) -> DataFrame:
    """Deterministic data mixing: assemble a training corpus from weighted
    sources — ``{name: (df, retention_fraction)}`` — keeping each row iff
    its md5 unit hash (seeded per source) falls under the source's fraction,
    then union with a ``source`` label column.

    Like hash_split, retention is a pure function of (seed, source, id):
    re-running reproduces the same mixture bit-for-bit, refreshing one
    source never resamples another, and the per-source expected share is
    exactly the requested fraction. All sources must share a schema."""
    from functools import reduce

    if not sources:
        raise ValueError("mixture_sample: sources must be non-empty")
    outs = []
    for name, (df, frac) in sources.items():
        if not (0.0 <= frac <= 1.0):
            raise ValueError(f"mixture_sample: fraction for {name!r} not in [0,1]")
        kept = df.filter(_unit_hash(id_col, f"{seed}:{name}") < F.lit(float(frac)))
        outs.append(kept.withColumn(source_col, F.lit(name)))
    return reduce(lambda a, b: a.unionByName(b), outs)


def pack_chunks(
    df: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    token_col=None,
    text_col: str = "text",
    chunk_col: str = "chunk_id",
) -> DataFrame:
    """Concat-and-chunk packing assignment — the standard LLM-pretraining
    layout: imagine every document concatenated in ``id_col`` order into one
    token stream, split into fixed ``token_budget`` windows; each document
    is assigned to the chunk where it STARTS (``floor(tokens_before /
    budget)``). Complements ``pack_sequences`` (greedy budget-close): this
    variant is fully declarative, order-stable under any partitioning, and
    SQL-replayable.

    Built on operators/scan.running_agg — the exclusive prefix sum of token
    counts is a distributed two-phase scan, NOT a single-partition window,
    so the assignment holds at corpus scale. Token counts are BIGINTs, so
    the prefix combine is exact.

    Returns ``df`` + (``__tokens``, ``tokens_before``, ``chunk_col``).
    """
    from scio_spark.functions.text import token_count
    from scio_spark.operators.scan import running_agg

    tok = (
        token_count(text_col)
        if token_col is None
        else (F.col(token_col) if isinstance(token_col, str) else token_col)
    )
    d = df.withColumn("__tokens", tok.cast("long"))
    d = running_agg(
        d, id_col, "__tokens", agg="sum", out_col="tokens_before", inclusive=False
    )
    return d.withColumn(
        chunk_col,
        F.floor(F.col("tokens_before") / F.lit(int(token_budget))).cast("long"),
    )


def shuffle_positions(
    df: DataFrame, id_col: str, seed: int = 42, out_col: str = "pos"
) -> DataFrame:
    """The permutation behind ``training_shuffle``, materialized: each row's
    1-based position under the seeded hash order, computed with the
    distributed scan (operators/scan.row_numbers) instead of a
    single-partition ROW_NUMBER.

    Uses the engine-portable md5-slice hash (48-bit prefix) rather than
    xxhash64 so the permutation replays bit-for-bit in any engine:
    ``ROW_NUMBER() OVER (ORDER BY ('0x'||substr(md5(seed||'|'||id),1,12))::BIGINT, id)``.
    """
    from scio_spark.operators.scan import row_numbers

    d = df.withColumn("__h", _md5_slice(id_col, seed))
    return row_numbers(d, ["__h", id_col], out_col=out_col).drop("__h")


def length_buckets(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col=None,
    out_col: str = "bucket",
) -> DataFrame:
    """Equal-frequency length bucketing: assign each document to one of
    ``k`` buckets by token-count rank (NTILE semantics, ties broken by
    ``id_col``) — the batching-efficiency layout that groups like-length
    sequences so padding waste stays flat across batches. Built on the
    distributed ntile (operators/scan.py): holds at corpus scale, and
    replays in SQL as ``NTILE(k) OVER (ORDER BY tokens, id)``.

    Returns ``df`` + (``__tokens``, ``out_col``)."""
    from scio_spark.functions.text import token_count
    from scio_spark.operators.scan import ntile

    tok = (
        token_count(text_col)
        if token_col is None
        else (F.col(token_col) if isinstance(token_col, str) else token_col)
    )
    d = df.withColumn("__tokens", tok.cast("long"))
    return ntile(d, k, ["__tokens", id_col], out_col=out_col)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    n: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Cap each key's contribution at ``n`` rows — the dominant-domain guard
    in web-corpus curation (a handful of hosts otherwise swamp the mixture).
    Which rows survive is a pure function of (seed, id): rank rows within
    each key by the portable md5-slice hash and keep the first ``n``, so the
    cap is row-stable across runs/engines and a corpus refresh never swaps
    an unrelated key's survivors.

    One partitioned window (hash-shuffle on ``key_col``); for a key hot
    enough that its rows overflow an executor, use the two-phase
    ``pair.top_by_key`` shape instead — same semantics, pre-aggregated."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(_md5_slice(id_col, seed), F.col(id_col))
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def token_quota_per_key(
    df: DataFrame,
    key_col: str,
    token_budget: int,
    id_col: str,
    seed: int = 42,
    text_col: str = "text",
    token_col=None,
) -> DataFrame:
    """Per-key token quota: walk each key's rows in seeded portable-hash
    order and keep rows while the tokens taken so far (EXCLUSIVE prefix
    sum) stay under ``token_budget`` — "sample ~N tokens per domain", the
    token-denominated version of ``cap_per_key``. The first row of a key
    always survives (its exclusive prefix is 0), so no key disappears
    outright. Deterministic: survivors are a pure function of (seed, ids).

    One partitioned window; replays in SQL as
    ``SUM(tok) OVER (PARTITION BY key ORDER BY hash, id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) < budget``.

    Returns the surviving rows of ``df`` plus a ``__tokens`` column (the
    per-row token count used for the quota walk)."""
    from pyspark.sql import Window

    from scio_spark.functions.text import token_count

    tok = (
        token_count(text_col)
        if token_col is None
        else (F.col(token_col) if isinstance(token_col, str) else token_col)
    )
    d = df.withColumn("__tokens", tok.cast("long"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(_md5_slice(id_col, seed), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.withColumn("__taken", F.coalesce(F.sum("__tokens").over(w), F.lit(0)))
        .filter(F.col("__taken") < token_budget)
        .drop("__taken")
    )
