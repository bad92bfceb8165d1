"""First-class Bloom-filter values — scio's ApproxFilter / scalable BF.

Reference: scio ``ApproxFilter``/``BloomFilter`` value types and
``MutableScalableBloomFilter.scala:1-301``: a Bloom filter the user BUILDS
once, merges, serializes, broadcasts, and reuses across many prefilter
joins (vs the runtime row-level BF Catalyst injects per query, and vs the
exact-keyset semi-join in operators/joins.sparse_join).

Spark-first split of labor:

- **hashing is JVM-side**: the k probe positions are
  ``pmod(xxhash64(lit(slot), col), m)`` computed as built-in expressions, so
  build and probe agree bit-for-bit and no Python hashing exists anywhere;
- **bits are numpy**: per-partition bitmaps built in one Arrow pass, OR'd
  into the final artifact driver-side (num_partitions × m/8 bytes transient
  — the artifact itself is m/8 bytes, broadcastable);
- **probing is one Arrow pass**: broadcast bits + vectorized numpy gather,
  no shuffle, no per-row Python.

At 100 TB: build once over the small/keys side (one scan), persist with
``to_bytes``, broadcast to every subsequent query — the repeated-prefilter
pattern scio's ApproxFilter exists for.
"""

from __future__ import annotations

import math
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(col, m_bits: int, k: int):
    """k probe positions as JVM expressions (xxhash64 seeded by slot)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(m_bits)).cast("long")
            for i in range(k)
        ]
    )


class BloomFilter:
    """Fixed-size Bloom filter value: (m_bits, k, bitmap). Mergeable (OR,
    same shape), serializable, broadcastable."""

    MAGIC = b"SBF1"

    def __init__(self, m_bits: int, k: int, bits=None):
        import numpy as np

        self.m_bits = int(m_bits)
        self.k = int(k)
        nbytes = (self.m_bits + 7) // 8
        self.bits = (
            np.zeros(nbytes, dtype=np.uint8) if bits is None else bits
        )
        assert len(self.bits) == nbytes

    @classmethod
    def sized_for(cls, expected: int, fpp: float = 0.01) -> "BloomFilter":
        """Optimal m = −n·ln(p)/ln(2)², k = m/n·ln(2) (Bloom 1970)."""
        expected = max(1, expected)
        m = int(math.ceil(-expected * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / expected * math.log(2)))
        return cls(m, k)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError("can only merge Bloom filters of the same shape")
        return BloomFilter(self.m_bits, self.k, self.bits | other.bits)

    @property
    def fill_ratio(self) -> float:
        import numpy as np

        return float(np.unpackbits(self.bits).sum()) / self.m_bits

    def approx_fpp(self) -> float:
        """Current false-positive probability from the fill ratio."""
        return self.fill_ratio ** self.k

    def to_bytes(self) -> bytes:
        return self.MAGIC + struct.pack("<QI", self.m_bits, self.k) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        import numpy as np

        if blob[:4] != cls.MAGIC:
            raise ValueError("not a serialized BloomFilter")
        m_bits, k = struct.unpack_from("<QI", blob, 4)
        bits = np.frombuffer(blob[16:], dtype=np.uint8).copy()
        return cls(m_bits, k, bits)


def build_bloom_filter(
    df: DataFrame,
    col: str,
    expected: int | None = None,
    fpp: float = 0.01,
) -> BloomFilter:
    """Build a BloomFilter over a column in ONE distributed scan: JVM-hashed
    positions → per-partition numpy bitmaps → driver OR. ``expected``
    defaults to a count of the column (an extra cheap scan) — pass it when
    known to stay single-pass."""
    import numpy as np
    import pandas as pd

    if expected is None:
        expected = df.count()
    proto = BloomFilter.sized_for(expected, fpp)
    m_bits, k, nbytes = proto.m_bits, proto.k, len(proto.bits)

    src = df.select(_positions(col, m_bits, k).alias("__pos"))

    def gen(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            pos = np.concatenate([np.asarray(p, dtype=np.int64) for p in pdf["__pos"]])
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"blob": [bits.tobytes()]})

    out = BloomFilter(m_bits, k)
    for row in src.mapInPandas(gen, "blob binary").collect():
        out = out.merge(BloomFilter(m_bits, k, np.frombuffer(bytes(row["blob"]), dtype=np.uint8).copy()))
    return out


def filter_with_bloom(
    df: DataFrame, col: str, bf: BloomFilter, negate: bool = False
) -> DataFrame:
    """Keep rows whose ``col`` might be in the filter (no false negatives;
    ~fpp false positives). ``negate=True`` keeps definite non-members.

    The probe is a BOOLEAN pandas UDF over only the JVM-hashed position
    array (r15-opt, guide §4: pass only the columns the function needs) —
    the row payload never crosses the Python boundary. The previous
    mapInPandas probe shipped EVERY column of every row JVM→Python→JVM
    (Spark cannot prune through an opaque map), which for a wide
    prefilter input multiplied Arrow bytes ~width×; as a filter predicate
    the payload stays in the JVM and only ~k×8 bytes/row cross."""
    import numpy as np
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast(bf.bits)

    def _might(pos_s):
        bits = bc.value
        if not len(pos_s):
            return pd.Series([], dtype=bool)
        pos = np.stack([np.asarray(p, dtype=np.int64) for p in pos_s])
        hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    # built without type hints (pandas is lazily imported here), so the
    # eval type is stated explicitly: a scalar Series->Series pandas UDF
    from pyspark.sql.functions import PandasUDFType

    might_contain = F.pandas_udf(_might, "boolean", PandasUDFType.SCALAR)
    pred = might_contain(_positions(col, bf.m_bits, bf.k))
    return df.filter(~pred if negate else pred)


class ScalableBloomFilter:
    """MutableScalableBloomFilter.scala:1-301 — unknown-cardinality BF that
    grows by slices: when the current slice saturates past its target fpp,
    a new (larger, tighter) slice starts. Membership = any slice matches;
    compound fpp stays ≤ fpp/(1−tightening)."""

    def __init__(self, initial_expected: int = 1024, fpp: float = 0.01,
                 growth: int = 2, tightening: float = 0.5):
        self.fpp = fpp
        self.growth = growth
        self.tightening = tightening
        self._next_expected = initial_expected
        self._next_fpp = fpp * (1 - tightening)
        self.slices: list[BloomFilter] = []

    def add_dataframe(self, df: DataFrame, col: str, expected: int | None = None):
        """Absorb a column as a new slice (one scan); grows geometrically."""
        n = expected if expected is not None else df.count()
        size = max(n, self._next_expected)
        self.slices.append(build_bloom_filter(df, col, expected=size, fpp=self._next_fpp))
        self._next_expected = size * self.growth
        self._next_fpp *= self.tightening
        return self

    def filter(self, df: DataFrame, col: str, negate: bool = False) -> DataFrame:
        """Rows matching ANY slice (or, negated, matching none) — all
        slices probed in a single Arrow pass."""
        import numpy as np

        if not self.slices:
            return df.filter(F.lit(bool(negate)))
        bc = df.sparkSession.sparkContext.broadcast(
            [(s.bits, s.m_bits, s.k) for s in self.slices]
        )
        out_cols = list(df.columns)
        src = df
        for idx, s in enumerate(self.slices):
            src = src.withColumn(f"__pos{idx}", _positions(col, s.m_bits, s.k))

        def gen(batches):
            slices = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                member = np.zeros(len(pdf), dtype=bool)
                for idx, (bits, _m, _k) in enumerate(slices):
                    pos = np.stack(
                        [np.asarray(p, dtype=np.int64) for p in pdf[f"__pos{idx}"]]
                    )
                    hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
                    member |= hit.all(axis=1)
                yield pdf.loc[~member if negate else member, out_cols]

        return src.mapInPandas(gen, df.schema)
