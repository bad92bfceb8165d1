"""t-digest: mergeable quantile sketches as first-class values.

Reference mapping: scio carries Algebird's QTree/approximate quantile
monoids as aggregatable VALUES (SURVEY §2.2 quantilesApprox family);
Spark's ``percentile_approx`` covers in-query quantiles but its internal
sketch is not exposed, so cross-dataset / cross-day quantile state cannot
be stored and merged. This module fills that slot with the t-digest
(Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests", public): a centroid summary with bounded size whose accuracy
concentrates at the tails, closed under merge — the standard mergeable
quantile artifact (same role the HLL/CMS binaries play for
distinct/frequency in sketches.py).

Implementation: the merging form. Buffered points/centroids are sorted by
mean and re-clustered left-to-right under the k1 scale function
``k(q) = δ/2π·asin(2q−1)`` (merge while the merged k-span ≤ 1) — single
pass, no tree machinery, ~2δ centroids with single-point tail resolution,
deterministic for a given input ORDER; quantile() interpolates between
centroid means.

Spark shape: one serialized partial digest per PARTITION via mapInPandas
(bytes rows — the only thing that leaves executors), merged into one
artifact on the driver: sketch-per-shard → union, the sumHll pattern.
Per-key digests come from applyInPandas with the same codec. At 100 TB
the driver merge sees |partitions| × ~(δ·16 B) — megabytes.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"TD01"


class TDigest:
    """Mergeable quantile sketch. ``delta`` bounds the centroid count
    (~2δ); bigger δ = more accuracy, more bytes."""

    def __init__(self, delta: int = 200):
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.count = 0.0
        self._min = float("inf")
        self._max = float("-inf")

    # ------------------------------------------------------------ build

    def add(self, values, weights=None) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        if values.size == 0:
            return self
        w = (
            np.ones_like(values)
            if weights is None
            else np.asarray(weights, dtype=np.float64)
        )
        self._min = min(self._min, float(values.min()))
        self._max = max(self._max, float(values.max()))
        self._compress(
            np.concatenate([self.means, values]),
            np.concatenate([self.weights, w]),
        )
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(max(self.delta, other.delta))
        out._min = min(self._min, other._min)
        out._max = max(self._max, other._max)
        out._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return out

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Merging pass under the k1 scale function
        k(q) = δ/2π · asin(2q−1) (Dunning & Ertl): adjacent mass merges
        while the merged centroid's k-span stays ≤ 1, which bounds the
        summary at ~2δ centroids with single-point resolution at the
        extreme tails."""
        import math

        total = float(weights.sum())
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        scale = self.delta / (2.0 * math.pi)

        def k(q: float) -> float:
            return scale * math.asin(2.0 * min(max(q, 0.0), 1.0) - 1.0)

        out_m: list[float] = []
        out_w: list[float] = []
        cum = 0.0  # weight fully to the left of the open centroid
        k_left = k(0.0)
        cur_m, cur_w = means[0], weights[0]
        for m, w in zip(means[1:], weights[1:]):
            if k((cum + cur_w + w) / total) - k_left <= 1.0:
                cur_m += (m - cur_m) * (w / (cur_w + w))
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                k_left = k(cum / total)
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)
        self.count = total

    # ------------------------------------------------------------ query

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be in [0,1], got {q}")
        if self.count == 0:
            raise ValueError("empty digest")
        if q == 0.0:
            return self._min
        if q == 1.0:
            return self._max
        target = q * self.count
        cum = 0.0
        for i in range(len(self.means)):
            half = self.weights[i] / 2
            if target < cum + half:
                if i == 0:
                    lo_x, lo_c = self._min, 0.0
                else:
                    lo_x = self.means[i - 1]
                    lo_c = cum - self.weights[i - 1] / 2
                hi_x, hi_c = self.means[i], cum + half
                t = (target - lo_c) / max(hi_c - lo_c, 1e-12)
                return float(lo_x + t * (hi_x - lo_x))
            cum += self.weights[i]
        return self._max

    # ------------------------------------------------------- serialization

    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<4siqdd", MAGIC, self.delta, len(self.means), self._min, self._max
        )
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        magic, delta, n, mn, mx = struct.unpack_from("<4siqdd", blob, 0)
        if magic != MAGIC:
            raise ValueError("not a TDigest blob")
        td = cls(delta)
        off = struct.calcsize("<4siqdd")
        td.means = np.frombuffer(blob, np.float64, n, off).copy()
        td.weights = np.frombuffer(blob, np.float64, n, off + 8 * n).copy()
        td.count = float(td.weights.sum())
        td._min, td._max = mn, mx
        return td


# ---------------------------------------------------------------- Spark API


def tdigest_sketch(
    df: DataFrame, col: str, delta: int = 200, weight_col: str | None = None
) -> TDigest:
    """Build one mergeable digest over a column: per-partition digests on
    executors (one bytes row each crosses to the driver), merged here.
    Store the artifact (``to_bytes``) beside your table; tomorrow's batch
    merges into it without re-reading history.

    ``weight_col`` feeds pre-aggregated (value, weight) histograms — e.g.
    the output of ``groupBy(value).count()`` — so a low-cardinality column
    digests exactly (distinct values each holding enough mass under the k1
    scale function never merge, making the sketch a lossless weighted
    histogram; the basis of the quantiles_tdigest oracle query)."""
    import pandas as pd

    cols = [col] if weight_col is None else [col, weight_col]

    def gen(batches):
        td = TDigest(delta)
        for pdf in batches:
            pdf = pdf.dropna(subset=[col])
            v = pdf[col].to_numpy(dtype=np.float64)
            w = (
                None
                if weight_col is None
                else pdf[weight_col].to_numpy(dtype=np.float64)
            )
            td.add(v, w)
        if td.count:
            yield pd.DataFrame({"sketch": [td.to_bytes()]})

    parts = df.select(*cols).mapInPandas(gen, "sketch binary").collect()
    if not parts:
        raise ValueError(f"tdigest_sketch: no non-null values in {col!r}")
    out = TDigest.from_bytes(bytes(parts[0].sketch))
    for row in parts[1:]:
        out = out.merge(TDigest.from_bytes(bytes(row.sketch)))
    return out


def tdigest_by_key(
    df: DataFrame, key_cols, col: str, delta: int = 200
) -> DataFrame:
    """Per-key digest artifacts: (key..., sketch binary, n long). Keyed
    quantile state you can store, re-merge across days, and query without
    the raw data."""
    import pandas as pd

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        td = TDigest(delta)
        v = pdf[col].dropna().to_numpy(dtype=np.float64)
        td.add(v)
        head = pdf.iloc[:1][key_cols].copy()
        head["sketch"] = [td.to_bytes()]
        head["n"] = [int(td.count)]
        return head

    fields = ", ".join(f"{k} {dict(df.dtypes)[k]}" for k in key_cols)
    return df.select(*key_cols, col).groupBy(*key_cols).applyInPandas(
        build, f"{fields}, sketch binary, n long"
    )


def quantile_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int,
    delta: int = 200,
    out_col: str = "bucket",
) -> DataFrame:
    """Assign each row its quantile bucket (0..n_buckets-1) of ``col`` —
    the curriculum/stratification primitive (e.g. quality-score deciles
    feeding ``training.mixture_sample`` for difficulty-ordered or
    quality-weighted sampling). A global exact ntile needs a total sort;
    this uses the digest instead: one sketch pass (per-partition digests →
    driver merge), then a broadcast of the n_buckets-1 boundary values and
    a pure-expression assignment — no global sort at any scale. Boundary
    accuracy is the digest's (~0.1% of rank at delta=200)."""
    td = tdigest_sketch(df, col, delta)
    bounds = [td.quantile(i / n_buckets) for i in range(1, n_buckets)]
    expr = F.lit(0)
    for b in bounds:
        expr = expr + F.when(F.col(col) > F.lit(float(b)), 1).otherwise(0)
    return df.withColumn(out_col, expr.cast("int"))
