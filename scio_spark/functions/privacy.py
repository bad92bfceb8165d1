"""Privacy guards beyond regex PII scrubbing: k-anonymity over
quasi-identifiers.

Beyond-reference curation operator, completing the privacy tier that
``text.scrub_pii`` starts: scrubbing removes direct identifiers, but a
released table can still single people out through quasi-identifier
COMBINATIONS (the classic zip+birthdate+sex result — Sweeney,
"k-anonymity: a model for protecting privacy", 2002, public). A table is
k-anonymous over columns Q when every combination of Q values present is
shared by at least k rows.

Both operations are one partially-aggregated groupBy on Q — shuffle bytes
scale with |distinct combinations|, not rows, so the guard costs the same
as any keyed count at 100 TB:

- ``k_anonymity_report``: the audit — distinct combination count, minimum
  group size (the table's actual k), and how many rows sit in groups
  below the requested k.
- ``k_suppress``: the enforcement — drop rows whose combination is shared
  by fewer than k rows (suppression, the conservative baseline;
  generalization hierarchies are domain-specific and out of scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_sizes(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    return df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__gsize"))


def k_anonymity_report(df: DataFrame, quasi_cols, k: int) -> DataFrame:
    """One-row audit: (n_rows, n_groups, min_group_size, n_rows_below_k,
    n_groups_below_k, is_k_anonymous)."""
    quasi_cols = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    sizes = _group_sizes(df, quasi_cols)
    return sizes.agg(
        F.sum("__gsize").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("__gsize").cast("long").alias("min_group_size"),
        F.sum(F.when(F.col("__gsize") < k, F.col("__gsize")).otherwise(0))
        .cast("long")
        .alias("n_rows_below_k"),
        F.sum(F.when(F.col("__gsize") < k, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_below_k"),
        (F.min("__gsize") >= k).alias("is_k_anonymous"),
    )


def k_suppress(df: DataFrame, quasi_cols, k: int) -> DataFrame:
    """Rows whose quasi-identifier combination is shared by ≥ k rows — the
    k-anonymous release. NULL combinations group together (NULL-safe
    grouping is exactly what groupBy does), matching the audit."""
    from functools import reduce

    quasi_cols = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    keep = (
        _group_sizes(df, quasi_cols)
        .filter(F.col("__gsize") >= k)
        .select(*[F.col(c).alias(f"__k_{c}") for c in quasi_cols])
    )
    # eqNullSafe per column: groupBy treats NULLs as one group, so the
    # semi-join must too (a bare `on` list uses `=`, which drops them)
    cond = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"__k_{c}")) for c in quasi_cols],
    )
    return df.join(keep, cond, "left_semi")
