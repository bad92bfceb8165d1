"""Metrics — scio counters/distributions on Spark observations.

Reference: scio initializes counters/distributions/gauges per job
(ScioResult.scala exposes them; JobTest asserts on them —
testing/JobTest.scala counters/distributions/gauges builders). Beam metrics
are collected runner-side; the Spark-first analog is ``df.observe`` /
``pyspark.sql.Observation`` — metric expressions evaluated during the SAME
action that runs the plan (no extra pass), fetched after completion.

Usage::

    m = Metrics()
    df = m.count(df, "valid_rows", F.col("x").isNotNull())
    df = m.distribution(df, "price", F.col("price"))
    df.write.parquet(...)            # any action
    m.get("valid_rows")              # -> int
    m.get("price")                   # -> {min, max, mean, count}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class Metrics:
    def __init__(self):
        self._observations: dict[str, Observation] = {}

    def count(self, df: DataFrame, name: str, cond: Column | None = None) -> DataFrame:
        """Counter (Beam Metrics.counter): rows, or rows matching ``cond``."""
        obs = Observation(name)
        expr = (
            F.count(F.lit(1))
            if cond is None
            else F.sum(F.when(cond, 1).otherwise(0))
        ).alias(name)
        self._observations[name] = obs
        return df.observe(obs, expr)

    def distribution(self, df: DataFrame, name: str, col: Column) -> DataFrame:
        """Distribution (Beam Metrics.distribution): min/max/mean/count/sum."""
        obs = Observation(name)
        self._observations[name] = obs
        return df.observe(
            obs,
            F.min(col).alias("min"),
            F.max(col).alias("max"),
            F.avg(col).alias("mean"),
            F.count(col).alias("count"),
            F.sum(col).alias("sum"),
        )

    def get(self, name: str):
        """Fetch after an action has run the observed plan. Counters return
        the bare number; distributions the full dict."""
        vals = self._observations[name].get
        if set(vals) == {name}:
            return vals[name]
        return vals

    def all(self) -> dict:
        return {n: self.get(n) for n in self._observations}
