"""Declarative data-quality checks — the validate-before-publish step of a
production ingest pipeline (Deequ/great-expectations shape, public tools),
kept Spark-frugal:

- every ROW rule (predicate that each row must satisfy) compiles into one
  conditional-sum column, so ALL row rules run in a SINGLE aggregate pass
  over the data — one scan, no shuffle beyond the final 1-row reduce;
- each UNIQUENESS rule is one partial-agg'd groupBy on its key set
  (duplicate count = Σ max(group_size − 1, 0));
- output is one row per check: (check, kind, n_violations, n_rows, passed),
  so the report is driver-sized no matter the corpus.

Beyond-reference surface (scio pipelines assert ad hoc; SURVEY §2.7 note).
Everything is exact integer arithmetic — oracle-replayable bit-for-bit.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def run_checks(
    df: DataFrame,
    row_rules: Mapping[str, Column] | None = None,
    unique_keys: Sequence[Sequence[str]] | None = None,
) -> DataFrame:
    """Evaluate quality checks and return the report table.

    ``row_rules``: {check_name: boolean Column}; a NULL predicate result
    counts as a violation (a rule you cannot evaluate is not satisfied —
    the conservative reading, and what makes ``col > 0`` catch NULLs).
    ``unique_keys``: list of key-column lists; violations = number of rows
    beyond the first in any duplicate group.

    Returns (check, kind, n_violations, n_rows, passed) — one row per
    check, computed in one row-rule scan + one groupBy per key set."""
    row_rules = dict(row_rules or {})
    unique_keys = [list(k) for k in (unique_keys or [])]
    if not row_rules and not unique_keys:
        raise ValueError("run_checks: no checks given")
    # names become both string literals and __v_<name> column references
    # inside a generated stack() selectExpr
    from scio_spark.functions._ident import validate_sql_identifier

    for name in row_rules:
        validate_sql_identifier(name, "run_checks: check")
    spark = df.sparkSession
    reports = []

    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for name, pred in row_rules.items():
            aggs.append(
                # coalesce: SUM over zero rows is NULL — an empty table
                # must report 0 violations / passed=true, not NULL
                F.coalesce(
                    F.sum(
                        F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
                    ),
                    F.lit(0),
                ).alias(f"__v_{name}")
            )
        row = df.agg(*aggs)
        stack = ", ".join(
            f"'{name}', __v_{name}" for name in row_rules
        )
        reports.append(
            row.selectExpr(
                "__n",
                f"stack({len(row_rules)}, {stack}) AS (check, n_violations)",
            ).select(
                "check",
                F.lit("row_rule").alias("kind"),
                F.col("n_violations").cast("long").alias("n_violations"),
                F.col("__n").cast("long").alias("n_rows"),
            )
        )

    for keys in unique_keys:
        name = "unique(" + ",".join(keys) + ")"
        grouped = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
        rep = grouped.agg(
            F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
            .cast("long")
            .alias("n_violations"),
            F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_rows"),
        ).select(
            F.lit(name).alias("check"),
            F.lit("uniqueness").alias("kind"),
            "n_violations",
            "n_rows",
        )
        reports.append(rep)

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)
