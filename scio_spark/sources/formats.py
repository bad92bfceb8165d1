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


def read_object_file(spark: SparkSession, path: str) -> list[Any]:
    rows = spark.read.parquet(path).orderBy("idx").collect()
    return [pickle.loads(bytes(r["payload"])) for r in rows]


def object_file_df(df: DataFrame, pickle_cols: list[str], path: str):
    """Mixed mode: keep scalar columns queryable, pickle the opaque ones."""
    out = df
    for c in pickle_cols:
        out = out.withColumn(
            c, F.udf(lambda v: pickle.dumps(v), "binary")(F.col(c))
        )
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
