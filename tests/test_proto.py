"""Protobuf wire-format + tf.Example TFRecord tests (sources/proto.py).

No protobuf/tensorflow implementation exists in this image to
cross-validate against, so compatibility anchors to spec-derived golden
byte vectors: the canonical examples from the protobuf encoding guide
(protobuf.dev/programming-guides/encoding) and a hand-assembled
tf.Example per tensorflow/core/example/feature.proto.
"""

import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scio_spark.sources.proto import (
    decode_fields,
    example_decode,
    example_encode,
    message_decode,
    message_encode,
    read_protobuf_file,
    read_tf_example,
    save_as_protobuf_file,
    save_as_tf_example,
    write_int64,
    write_len,
)

FULL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("emb", T.ArrayType(T.FloatType(), False), True),
        T.StructField("toks", T.ArrayType(T.LongType(), False), True),
        T.StructField("words", T.ArrayType(T.StringType(), False), True),
        T.StructField("blob", T.BinaryType(), True),
    ]
)

FULL_ROW = {
    "id": -42,
    "name": "héllo",
    "score": 1.5,
    "emb": [0.25, -0.5],
    "toks": [1, 2, 300],
    "words": ["a", "b"],
    "blob": b"\x00\xff",
}


def test_encoding_guide_golden_vectors():
    # message Test1 { int32 a = 1; } with a=150  →  08 96 01
    out = bytearray()
    write_int64(out, 1, 150)
    assert bytes(out) == bytes.fromhex("089601")
    # message Test2 { string b = 2; } with b="testing"
    out = bytearray()
    write_len(out, 2, b"testing")
    assert bytes(out) == bytes.fromhex("120774657374696e67")
    # message Test3 { Test1 c = 3; } with c.a=150  →  1a 03 08 96 01
    inner = bytearray()
    write_int64(inner, 1, 150)
    out = bytearray()
    write_len(out, 3, bytes(inner))
    assert bytes(out) == bytes.fromhex("1a03089601")
    # negative int64 = 10-byte two's-complement varint
    out = bytearray()
    write_int64(out, 1, -2)
    assert bytes(out) == bytes.fromhex("08feffffffffffffffff01")


def test_tf_example_golden():
    """{"x": 3} hand-assembled per feature.proto: Example.features(1) →
    map entry(1) → key(1)="x", value(2)=Feature.int64_list(3) →
    Int64List.value(1 packed)=[3]."""
    schema = T.StructType([T.StructField("x", T.LongType(), True)])
    b = example_encode({"x": 3}, schema)
    assert b == bytes.fromhex("0a0c0a0a0a017812051a030a0103")
    assert example_decode(b, schema) == {"x": 3}


def test_tf_example_roundtrip_all_types():
    back = example_decode(example_encode(FULL_ROW, FULL_SCHEMA), FULL_SCHEMA)
    assert back == FULL_ROW
    nulls = dict.fromkeys(FULL_ROW, None)
    back2 = example_decode(example_encode(nulls, FULL_SCHEMA), FULL_SCHEMA)
    # null scalars stay null; null arrays become empty lists (TF semantics:
    # a feature holds zero-or-more values, no null marker)
    assert back2 == {
        "id": None, "name": None, "score": None,
        "emb": [], "toks": [], "words": [], "blob": None,
    }


def test_float_narrowing_is_float32():
    """FloatList is float32 on the wire (feature.proto) — doubles narrow,
    exactly as TF writes them."""
    schema = T.StructType([T.StructField("v", T.DoubleType(), True)])
    third = 1.0 / 3.0
    got = example_decode(example_encode({"v": third}, schema), schema)["v"]
    assert got == struct.unpack("<f", struct.pack("<f", third))[0]
    assert got != third


SPEC = {
    1: ("id", "int64", False),
    2: ("name", "string", False),
    3: ("vals", "double", True),
    4: ("tags", "string", True),
    5: ("inner", {1: ("a", "int64", False)}, False),
}


def test_generic_message_roundtrip():
    r = {"id": 7, "name": "x", "vals": [1.5, 2.5], "tags": ["p", "q"],
         "inner": {"a": 9}}
    assert message_decode(message_encode(r, SPEC), SPEC) == r
    empty = {"id": None, "name": None, "vals": [], "tags": [], "inner": None}
    assert message_decode(message_encode(empty, SPEC), SPEC) == empty


def test_unknown_fields_skipped():
    """Decoder tolerates fields not in the spec (forward compat, like any
    proto reader)."""
    out = bytearray()
    write_int64(out, 1, 5)
    write_len(out, 99, b"future")
    write_int64(out, 98, 1)
    got = message_decode(bytes(out), {1: ("id", "int64", False)})
    assert got == {"id": 5}
    assert 99 in decode_fields(bytes(out))


def test_distributed_tf_example_roundtrip(spark, tmp_path):
    df = spark.range(500).select(
        F.col("id"),
        F.concat(F.lit("doc_"), F.col("id")).alias("name"),
        (F.col("id") * 0.5).alias("score"),
        F.array(F.col("id"), F.col("id") + 1).alias("toks"),
    )
    d = str(tmp_path / "tfex")
    save_as_tf_example(df, d)
    schema = "id long, name string, score double, toks array<long>"
    back = read_tf_example(spark, d, schema)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_distributed_protobuf_file_roundtrip(spark, tmp_path):
    spec = {1: ("id", "int64", False), 2: ("name", "string", False)}
    df = spark.range(200).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    d = str(tmp_path / "pbf")
    save_as_protobuf_file(df, d, spec)
    back = read_protobuf_file(spark, d, spec, "id long, name string")
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_bad_wire_type_rejected():
    with pytest.raises(ValueError, match="wire type"):
        decode_fields(bytes([(1 << 3) | 3]))  # deprecated group wire type


def test_malformed_wire_bytes_raise_valueerror_only():
    """Hostile/foreign wire bytes must surface as typed ValueErrors:
    truncated varints, LEN fields claiming more bytes than exist, short
    fixed-width payloads, junk UTF-8 — never IndexError/struct.error/
    UnicodeDecodeError escaping to kill a task."""
    import pyspark.sql.types as T

    from scio_spark.sources.proto import (
        decode_fields,
        example_decode,
        message_decode,
    )

    with pytest.raises(ValueError, match="truncated"):
        decode_fields(b"\x80\x80\x80")  # endless varint
    with pytest.raises(ValueError, match="truncated"):
        decode_fields(b"\x0a\x7f\x00")  # LEN field claims 127 bytes
    with pytest.raises(ValueError, match="truncated"):
        decode_fields(b"\x09\x01\x02")  # I64 with 2 bytes left
    spec = {1: ("s", "string", False), 2: ("d", "double", False)}
    with pytest.raises(ValueError, match="malformed"):
        message_decode(b"\x0a\x02\xff\xfe", spec)  # invalid UTF-8
    with pytest.raises(ValueError, match="malformed"):
        message_decode(b"\x12\x03\x00\x00\x00", spec)  # 3-byte double
    schema = T.StructType([T.StructField("x", T.StringType())])
    with pytest.raises(ValueError):
        example_decode(b"\x0a\x05\x0a\x03\x0a\x01\xff", schema)


def test_uvarint_ten_byte_cap():
    """Wire spec caps varints at 10 bytes: a hostile run of
    0x80-continuation bytes must raise, not accumulate a multi-megabit
    bignum with O(n^2) shift cost."""
    from scio_spark.sources.proto import read_uvarint

    # exactly 10 bytes (shift 63 on the last) is legal
    legal = b"\x80" * 9 + b"\x01"
    val, pos = read_uvarint(memoryview(legal), 0)
    assert pos == 10 and val == 1 << 63
    with pytest.raises(ValueError, match="varint"):
        read_uvarint(memoryview(b"\x80" * 11 + b"\x01"), 0)
    with pytest.raises(ValueError, match="varint"):
        read_uvarint(memoryview(b"\x80" * 100000 + b"\x01"), 0)
