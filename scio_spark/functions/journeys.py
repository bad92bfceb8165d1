"""User-journey analytics over event logs: ordered funnels and cohort
retention — the daily product-analytics workloads an event-pipeline team
runs on the same corpus the streaming operators ingest.

Beyond-reference surface (scio pipelines express these ad hoc over keyed
SCollections; here they are first-class), kept scale-shaped:

- ``funnel_steps``: k ordered steps cost k-1 equi-joins on the user key,
  each against a PER-USER aggregate (one row per qualifying user, shrinking
  monotonically down the funnel) — never a self-join of raw events on ts.
- ``cohort_retention``: two keyed aggregations (first-seen + distinct
  activity), both map-side partial; period ids are integer epoch-grid
  buckets, so the whole computation is exact and engine-portable.

Both replay bit-for-bit in SQL (min/count aggregates over integer/timestamp
comparisons — no floats anywhere).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: Sequence[tuple],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user ordered-funnel completion times.

    ``steps``: ordered ``(name, predicate Column)``. Returns one row per
    user who completed step 1, with ``ts_<name>`` = earliest event matching
    step i that occurs STRICTLY AFTER the user's step i-1 time (NULL once
    the funnel breaks). The strict ordering is the semantic point — a
    purchase before the click does not convert.

    Each step is a filtered scan + one shuffle join against the (per-user,
    1-row) previous stage, then a min-agg: cost is O(k) keyed joins whose
    right side shrinks down the funnel, not a ts-self-join of the log."""
    if not steps:
        raise ValueError("funnel_steps: steps must be non-empty")
    names = [n for n, _ in steps]
    if len(set(names)) != len(names):
        raise ValueError(f"funnel_steps: duplicate step names in {names}")
    # names become ts_<name> columns and, in funnel_counts, literals and
    # column refs inside a generated stack() selectExpr
    from scio_spark.functions._ident import validate_sql_identifier

    for n in names:
        validate_sql_identifier(n, "funnel_steps: step")
    name0, pred0 = steps[0]
    out = (
        df.filter(pred0)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"ts_{name0}"))
    )
    prev = f"ts_{name0}"
    for name, pred in steps[1:]:
        nxt = (
            df.filter(pred)
            .select(user_col, ts_col)
            .join(out.select(user_col, prev), user_col)
            .filter(F.col(ts_col) > F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"ts_{name}"))
        )
        out = out.join(nxt, user_col, "left")
        prev = f"ts_{name}"
    return out


def funnel_counts(
    df: DataFrame,
    steps: Sequence[tuple],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The funnel report: (step, step_index, n_users) — users completing
    each ordered prefix. One pass over ``funnel_steps`` output."""
    per_user = funnel_steps(df, steps, user_col, ts_col)
    aggs = [
        F.count(F.col(f"ts_{name}")).alias(f"n_{name}") for name, _ in steps
    ]
    row = per_user.agg(*aggs)
    stack = ", ".join(
        f"'{name}', CAST({i + 1} AS INT), n_{name}"
        for i, (name, _) in enumerate(steps)
    )
    return row.selectExpr(
        f"stack({len(steps)}, {stack}) AS (step, step_index, n_users)"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604800,
) -> DataFrame:
    """Cohort retention on an epoch-aligned period grid (default weekly):
    cohort = the period of the user's first event, offset = activity period
    − cohort period. Returns (cohort_period, period_offset, n_users) with
    n_users = distinct users from that cohort active at that offset
    (offset 0 = the cohort's size).

    Integer bucket ids (``floor(epoch / period)``) rather than calendar
    truncation: exact, engine-portable, and immune to week-start
    conventions. Two keyed aggregations, both partial-agg'd."""
    period = F.lit(int(period_seconds))
    bucket = lambda c: F.floor(  # noqa: E731
        F.unix_timestamp(F.col(c).cast("timestamp")) / period
    ).cast("long")
    firsts = df.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    act = (
        df.select(user_col, ts_col)
        .join(firsts, user_col)
        .select(
            F.col(user_col),
            bucket("__first_ts").alias("cohort_period"),
            (bucket(ts_col) - bucket("__first_ts")).alias("period_offset"),
        )
    )
    return act.groupBy("cohort_period", "period_offset").agg(
        F.count_distinct(F.col(user_col)).alias("n_users")
    )
