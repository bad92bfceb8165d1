"""Fuzzy join: pairs within a Levenshtein edit-distance bound, without a
cross product.

Beyond-reference join family member (entity resolution / near-duplicate
titles — the string analog of the embedding near-dup family). A naive
``levenshtein(l, r) <= d`` join is a cross product; the classic pruning
(Gravano et al., "Approximate string joins in a database (almost) for
free", VLDB 2001 — public) is the q-gram count filter:

    edit_distance(s, t) <= d  ⇒  shared q-grams(s, t) >=
        max(|s|, |t|) − q + 1 − d·q   (counting multiplicity)

so candidates come from an equi-join on the gram with a mergeable
count aggregation, and only candidates pay the exact (JVM-built-in)
levenshtein re-check. A length-difference filter (|len_l − len_r| <= d)
prunes further for free.

Completeness: the count bound only prunes when it is >= 1, i.e. when
max(len) >= q·(d+1). Pairs where BOTH strings are shorter than q·(d+1)
can share zero grams yet be within distance d — that short×short stratum
is joined on length bands of width d+1 (|Δlen| <= d implies adjacent or
equal bands, so probing bands {b-1, b, b+1} is an exact superset): a
shuffle-shaped equi-join, never an all-pairs cross, regardless of how
many short strings the corpus holds. Short×long pairs satisfy the gram
bound via the longer side. Result: exactly the naive join's pairs
(parity-tested), at O(shared-gram pairs + per-band pairs) instead of
O(n·m).

Scale note: a gram shared by f strings on each side fans out f² candidate
rows — the same boilerplate hazard as the dedup inverted indexes. The
aggregation is partial-agg'd (mergeable sums), and ubiquitous grams can
be capped with ``max_gram_freq`` at the documented cost of possibly
missing pairs whose ONLY shared grams are ubiquitous (off by default;
exactness is the default contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(df: DataFrame, id_name: str, text_name: str, q: int):
    """(id, gram, cnt) with multiplicity counts, plus a len column."""
    g = df.filter(F.length(text_name) >= q).select(
        F.col(id_name),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(text_name) - q + 1),
                lambda i: F.col(text_name).substr(i, F.lit(q)),
            )
        ).alias("gram"),
    )
    return g.groupBy(id_name, "gram").agg(F.count(F.lit(1)).alias("cnt"))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    max_dist: int,
    left_id: str = "l_id",
    left_col: str = "l_text",
    right_id: str = "r_id",
    right_col: str = "r_text",
    q: int = 2,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """All (left_id, right_id, distance) pairs with
    ``levenshtein(left_col, right_col) <= max_dist``. Exact by default
    (parity with the naive cross join is the tested contract)."""
    if max_dist < 0:
        raise ValueError("fuzzy_join: max_dist must be >= 0")
    d = int(max_dist)
    short_cut = q * (d + 1)  # below this, the gram bound can't prune

    lt = left.select(
        F.col(left_id), F.col(left_col), F.length(left_col).alias("__llen")
    )
    rt = right.select(
        F.col(right_id), F.col(right_col), F.length(right_col).alias("__rlen")
    )

    # --- gram-filter stratum: pairs where at least one side is long ------
    lg = _grams(left.select(left_id, F.col(left_col).alias("__t")), left_id, "__t", q)
    rg = _grams(right.select(right_id, F.col(right_col).alias("__t")), right_id, "__t", q)
    if max_gram_freq is not None:
        freq = (
            lg.select("gram").union(rg.select("gram"))
            .groupBy("gram").agg(F.count(F.lit(1)).alias("f"))
            .filter(F.col("f") <= max_gram_freq)
            .select("gram")
        )
        lg = lg.join(freq, "gram")
        rg = rg.join(freq, "gram")
    lg = lg.withColumnRenamed("cnt", "__lcnt")
    rg = rg.withColumnRenamed("cnt", "__rcnt")
    shared = (
        lg.join(rg, "gram")
        .groupBy(left_id, right_id)
        .agg(F.sum(F.least("__lcnt", "__rcnt")).alias("shared"))
    )
    gram_cands = (
        shared.join(lt.select(left_id, "__llen"), left_id)
        .join(rt.select(right_id, "__rlen"), right_id)
        .filter(
            F.col("shared")
            >= F.greatest("__llen", "__rlen") - q + 1 - d * q
        )
        .filter(F.greatest("__llen", "__rlen") >= short_cut)
        .select(left_id, right_id)
    )

    # --- short×short stratum: length-band EQUI-join ----------------------
    # A pair with |len_l - len_r| <= d sits in adjacent (or equal) bands of
    # width d+1, so joining left band b against right bands {b-1, b, b+1}
    # is an exact superset — a plain shuffle-shaped equi-join (AQE may
    # still choose to broadcast a genuinely small side) instead of the
    # r5-flagged forced-broadcast cross product, which bounded string
    # LENGTH but not row COUNT and could OOM on a short-string-heavy
    # corpus (titles/queries/codes).
    lband = F.floor(F.col("__llen") / (d + 1)).cast("long")
    short_l = (
        lt.filter(F.col("__llen") < short_cut)
        .select(
            left_id,
            "__llen",
            F.explode(F.array(lband - 1, lband, lband + 1)).alias("__band"),
        )
    )
    short_r = rt.filter(F.col("__rlen") < short_cut).select(
        right_id,
        "__rlen",
        F.floor(F.col("__rlen") / (d + 1)).cast("long").alias("__band"),
    )
    short_pairs = (
        short_l.join(short_r, "__band")
        .filter(F.abs(F.col("__llen") - F.col("__rlen")) <= d)
        .select(left_id, right_id)
    )

    cands = gram_cands.unionByName(short_pairs).distinct()
    out = (
        cands.join(lt.select(left_id, left_col, "__llen"), left_id)
        .join(rt.select(right_id, right_col, "__rlen"), right_id)
        .filter(F.abs(F.col("__llen") - F.col("__rlen")) <= d)
        .withColumn("distance", F.levenshtein(F.col(left_col), F.col(right_col)))
        .filter(F.col("distance") <= d)
        .select(left_id, right_id, "distance")
    )
    return out
