"""Algebird-style aggregator ergonomics without Algebird.

Reference: scio's ``aggregate``/``aggregateByKey`` accept Algebird
``Aggregator``/``MonoidAggregator`` instances (SCollection.scala:416-440,
PairSCollectionFunctions.scala:575-605): prepare → monoid-combine → present,
with Beam lifting the partial aggregation. SURVEY §7's hard-parts list calls
out reproducing that ergonomics in Python.

Two execution paths:
- :func:`aggregate_rdd` — faithful distributed semantics: per-partition fold
  then tree-merge (treeAggregate), exactly Beam's combiner lifting. Works for
  ANY Python monoid; the slow-but-general path.
- :func:`aggregate_by_key_pandas` — per-key pandas fold via applyInPandas
  (Arrow-batched). Whole key-group in memory, like scio's per-key combine.

For anything expressible as built-in aggregate expressions, prefer
``PairSCollection.agg_by_key`` — JVM-side, partial-aggregated, 10-100×
faster. These helpers are the escape hatch for genuinely opaque monoids.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame


@dataclass
class Aggregator:
    """prepare: row → B; merge: (B, B) → B (associative); present: B → out;
    zero: the monoid identity (makes it a MonoidAggregator)."""

    prepare: Callable[[Any], Any]
    merge: Callable[[Any, Any], Any]
    present: Callable[[Any], Any] = lambda x: x
    zero: Any = None

    def compose(self, rows: Iterable[Any]):
        acc = self.zero
        first = acc is None
        for r in rows:
            b = self.prepare(r)
            acc = b if first else self.merge(acc, b)
            first = False
        return acc


def aggregate_rdd(df: DataFrame, agg: Aggregator):
    """Global aggregate with partial (map-side) combining: treeAggregate over
    the DataFrame's rows (as dicts). Returns ``present(total)``."""
    zero = agg.zero

    def seq(acc, row):
        b = agg.prepare(row.asDict())
        return b if acc is None else agg.merge(acc, b)

    def comb(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return agg.merge(a, b)

    total = df.rdd.treeAggregate(zero, seq, comb)
    return agg.present(total)


def aggregate_by_key_pandas(
    keyed, agg: Aggregator, out_schema: str, value_cols: list[str] | None = None
):
    """aggregateByKey with a Python Aggregator: one applyInPandas per key
    group; output one row per key: key cols + an ``agg`` column dict-expanded
    by ``present`` (present must return a dict matching out_schema's non-key
    fields)."""
    import pandas as pd

    key_cols = keyed.key_cols
    vcols = value_cols or keyed.value_cols

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = agg.compose(pdf[vcols].to_dict("records"))
        out = {k: [pdf[k].iloc[0]] for k in key_cols}
        for name, val in agg.present(acc).items():
            out[name] = [val]
        return pd.DataFrame(out)

    return keyed.df.groupBy(*key_cols).applyInPandas(run, out_schema)


# ------------------------------------------------------------ stock monoids

def top_k_aggregator(k: int, key: Callable[[dict], Any]) -> Aggregator:
    """Bounded top-k (priority-queue monoid — scio-extra Collections.scala)."""
    import heapq

    return Aggregator(
        prepare=lambda r: [(key(r), r)],
        merge=lambda a, b: heapq.nlargest(k, a + b, key=lambda t: t[0]),
        present=lambda acc: {"top": [r for _, r in heapq.nlargest(k, acc, key=lambda t: t[0])]},
        zero=[],
    )


def set_union_aggregator(col: str) -> Aggregator:
    return Aggregator(
        prepare=lambda r: {r[col]},
        merge=lambda a, b: a | b,
        present=lambda acc: {"distinct_values": sorted(acc)},
        zero=set(),
    )
