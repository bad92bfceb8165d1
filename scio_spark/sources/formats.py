"""Additional source/sink formats (SURVEY §2.6 IO inventory).

- object files (scio-avro ObjectFileIO: Avro-wrapped serialized objects) →
  pickle-in-binary-column parquet: the same "opaque objects, self-describing
  container" contract on Spark's native columnar format.
- TFRecord (scio-tensorflow TFRecordIO.scala, codec TFRecordCodec.scala):
  pure-Python reader/writer of the framing (length + masked CRC-32C +
  payload); CRC-32C implemented in-module (no external lib in this image).
- dynamic destinations (scio-core io/dynamic/): ``partitionBy`` — per-record
  output path from record fields, Spark-native.
- Zstd dictionary training (SCollection.scala:1720 saveAsZstdDictionary):
  import-gated on ``zstandard`` (absent here) with a clear error.
"""

from __future__ import annotations

import pickle
import struct
from typing import Any, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ------------------------------------------------------------- object files


def save_as_object_file(spark: SparkSession, objs: Iterable[Any], path: str):
    """ObjectFileIO analog: arbitrary pickled Python objects in a binary
    column (cloudpickle-class escape hatch, SURVEY §1.3 'Kryo fallback')."""
    data = [(i, pickle.dumps(o)) for i, o in enumerate(objs)]
    df = spark.createDataFrame(data, "idx long, payload binary")
    df.write.mode("overwrite").parquet(path)


def read_object_file(
    spark: SparkSession, path: str, max_rows: int = 100_000
) -> list[Any]:
    """DRIVER-SIZED contract (same as side inputs, enrich.py:31-71, and the
    HNSW corpus, similarity.py:497): the whole file is collected and
    unpickled on the driver — object files are the Kryo-fallback escape
    hatch for driver-scale object lists (models, configs, manifests), not
    a distributed dataset path. A file above ``max_rows`` fails actionably
    instead of OOMing the driver; distributed pickled data belongs in a
    binary column read with spark.read.parquet + a batch decoder."""
    src = spark.read.parquet(path)
    n = src.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"read_object_file: {path} has >{max_rows} rows but is "
            "collected to the driver by contract. Read it as a DataFrame "
            "(spark.read.parquet) and decode the 'payload' column in a "
            "mapInPandas batch instead, or raise max_rows if the driver "
            "genuinely has the memory."
        )
    rows = src.orderBy("idx").collect()
    return [pickle.loads(bytes(r["payload"])) for r in rows]


def object_file_df(df: DataFrame, pickle_cols: list[str], path: str):
    """Mixed mode: keep scalar columns queryable, pickle the opaque ones.
    Pickling is inherently per-object python work, but the transfer is
    Arrow-batched (pandas_udf) so (de)serialization overhead amortizes per
    batch instead of per row. Values are normalized to plain Python before
    pickling (Arrow hands ArrayType as numpy arrays, StructType as dicts,
    numerics as numpy scalars), so `pickle.loads` round-trips engine-
    independent types: lists for arrays, dicts for structs, int/float/str
    scalars — never numpy objects."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    def _norm(v):
        if v is None:
            return None
        if isinstance(v, np.ndarray):
            return [_norm(x) for x in v.tolist()]
        if isinstance(v, np.generic):
            return v.item()
        if isinstance(v, dict):
            return {k: _norm(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [_norm(x) for x in v]
        return v

    @pandas_udf("binary")
    def _pickle_batch(s):  # pd.Series (or pd.DataFrame for structs) -> bytes
        import pandas as pd

        if isinstance(s, pd.DataFrame):
            # Arrow hands StructType to a scalar pandas_udf as a DataFrame
            # (one column per field) — pickle each row as a plain dict.
            return pd.Series(
                [pickle.dumps(_norm(v)) for v in s.to_dict("records")],
                index=s.index,
            )
        return s.map(lambda v: pickle.dumps(_norm(v)))

    out = df
    for c in pickle_cols:
        out = out.withColumn(c, _pickle_batch(F.col(c)))
    out.write.mode("overwrite").parquet(path)


# ----------------------------------------------------------------- TFRecord

_CRC_TABLE = []


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), table-driven — the TFRecord checksum."""
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def tfrecord_encode(records: Iterable[bytes]) -> bytes:
    """TFRecordCodec.scala write path: [len u64][masked_crc(len) u32]
    [payload][masked_crc(payload) u32]."""
    out = bytearray()
    for rec in records:
        length = struct.pack("<Q", len(rec))
        out += length
        out += struct.pack("<I", _masked_crc(length))
        out += rec
        out += struct.pack("<I", _masked_crc(rec))
    return bytes(out)


def tfrecord_decode(blob: bytes, verify: bool = True) -> list[bytes]:
    """TFRecordCodec read path with checksum verification."""
    recs, off = [], 0
    while off < len(blob):
        (length,) = struct.unpack_from("<Q", blob, off)
        (len_crc,) = struct.unpack_from("<I", blob, off + 8)
        if verify and _masked_crc(blob[off : off + 8]) != len_crc:
            raise ValueError(f"corrupt TFRecord length crc at offset {off}")
        payload = blob[off + 12 : off + 12 + length]
        (data_crc,) = struct.unpack_from("<I", blob, off + 12 + length)
        if verify and _masked_crc(payload) != data_crc:
            raise ValueError(f"corrupt TFRecord data crc at offset {off}")
        recs.append(payload)
        off += 12 + length + 4
    return recs


def save_as_tfrecord(df: DataFrame, payload_col: str, path: str):
    """saveAsTfRecordFile analog: one TFRecord file per partition, written
    distributed (binary concat per partition via mapInPandas → binary sink
    files). Payload column must be binary."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]):
        chunks = []
        for pdf in batches:
            chunks.append(tfrecord_encode(bytes(x) for x in pdf[payload_col]))
        yield pd.DataFrame({"blob": [b"".join(chunks)]})

    blobs = df.select(payload_col).mapInPandas(gen, "blob binary")
    blobs.write.mode("overwrite").format("parquet").save(path)


def read_tfrecord(spark: SparkSession, path: str) -> DataFrame:
    """Read back: parquet of blobs → explode framed records (binary rows)."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            recs = []
            for blob in pdf["blob"]:
                recs.extend(tfrecord_decode(bytes(blob)))
            yield pd.DataFrame({"record": recs})

    return spark.read.parquet(path).mapInPandas(gen, "record binary")


# ------------------------------------------------- framed binary files


def frame_encode(records: Iterable[bytes], header: bytes = b"", footer: bytes = b"") -> bytes:
    """BinaryIO write framing (scio-core io/BinaryIO.scala): header ⧺
    [u32-LE length][payload]* ⧺ footer."""
    out = bytearray(header)
    for rec in records:
        out += struct.pack("<I", len(rec))
        out += rec
    out += footer
    return bytes(out)


def frame_decode(blob: bytes, header: bytes = b"", footer: bytes = b"") -> list[bytes]:
    """Inverse of frame_encode, validating header/footer and exact framing."""
    if header and not blob.startswith(header):
        raise ValueError("framed binary: header mismatch")
    if footer and not blob.endswith(footer):
        raise ValueError("framed binary: footer mismatch")
    off, end, recs = len(header), len(blob) - len(footer), []
    while off < end:
        if off + 4 > end:
            raise ValueError(f"framed binary: truncated length at offset {off}")
        (length,) = struct.unpack_from("<I", blob, off)
        off += 4
        if off + length > end:
            raise ValueError(f"framed binary: truncated record at offset {off}")
        recs.append(blob[off : off + length])
        off += length
    return recs


def save_as_binary_file(
    df: DataFrame,
    payload_col: str,
    path: str,
    header: bytes = b"",
    footer: bytes = b"",
    suffix: str = ".bin",
) -> list:
    """saveAsBinaryFile (io/BinaryIO.scala): one framed binary file per
    partition — header, u32-LE length-prefixed records, footer — written
    executor-side (each task writes its own file; no driver
    materialization). Empty partitions produce no file. Returns the
    manifest rows (file, n_records, n_bytes); the write is the action.

    Paths here are local/NFS (the test env); an object-store deployment
    swaps the ``open`` for pyarrow.fs with the same framing.

    Overwrite semantics: pre-existing ``*{suffix}`` files under ``path``
    are removed first (a prior export may have had more partitions than
    this one, so stale shards must go)."""
    import glob
    import os
    import uuid

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    for old in glob.glob(os.path.join(path, f"*{suffix}")) + glob.glob(
        os.path.join(path, f"*{suffix}.tmp.*")
    ):
        os.remove(old)

    def gen(batches: Iterator[pd.DataFrame]):
        recs: list[bytes] = []
        for pdf in batches:
            recs.extend(bytes(x) for x in pdf[payload_col])
        if not recs:
            return
        # Partition-id filename + atomic rename: a retried or speculative
        # task replaces its own file instead of adding a duplicate (uuid
        # names would double this partition's records on any task rerun).
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        fname = os.path.join(path, f"part-{pid:05d}{suffix}")
        blob = frame_encode(recs, header, footer)
        tmp = f"{fname}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, fname)
        yield pd.DataFrame(
            {"file": [fname], "n_records": [len(recs)], "n_bytes": [len(blob)]}
        )

    manifest = df.select(payload_col).mapInPandas(
        gen, "file string, n_records long, n_bytes long"
    )
    return manifest.collect()


def read_binary_file(
    spark: SparkSession,
    path: str,
    header: bytes = b"",
    footer: bytes = b"",
    suffix: str = ".bin",
) -> DataFrame:
    """Read framed binary files back: binaryFile source (whole file per
    row, distributed) → frame_decode per file → one binary row per record."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            recs: list[bytes] = []
            for blob in pdf["content"]:
                recs.extend(frame_decode(bytes(blob), header, footer))
            yield pd.DataFrame({"record": recs})

    files = spark.read.format("binaryFile").load(f"{path}/*{suffix}")
    return files.select("content").mapInPandas(gen, "record binary")


# ------------------------------------------------- dynamic destinations


def save_dynamic(df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"):
    """saveAsDynamicAvroFile / dynamic destinations (scio-core io/dynamic/):
    per-record output directory from record fields — Spark-native
    ``partitionBy`` (hive-style layout, prunable on read)."""
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


# --------------------------------------------------------------- zstd dict


def train_zstd_dictionary(df: DataFrame, col: str, dict_size: int = 16 * 1024, sample_rows: int = 10000) -> bytes:
    """saveAsZstdDictionary (SCollection.scala:1720, io/ZstdDictIO.scala):
    train a zstd dictionary from a sampled bytes column. Import-gated —
    ``zstandard`` is not in this container."""
    try:
        import zstandard
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "zstd dictionary training requires the 'zstandard' package "
            "(not installed in this image)"
        ) from e
    samples = [
        bytes(r[0]) for r in df.select(col).limit(sample_rows).collect()
    ]  # pragma: no cover
    return zstandard.train_dictionary(dict_size, samples).as_bytes()  # pragma: no cover
