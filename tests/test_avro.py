"""Avro object-container codec tests (sources/avro.py).

Parity target: scio-avro AvroIO.scala (avroFile / saveAsAvroFile). The
interop tests below are the load-bearing ones: files written by our
pure-Python codec are read back by the JVM Avro library
(avro-1.12.1.jar on Spark's classpath, driven through py4j) and vice
versa — so "Avro support" means wire-format compatibility, not just
self-round-trip.
"""

import datetime as dt
import decimal
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scio_spark.sources.avro import (
    avro_to_spark_schema,
    parse_container,
    read_avro,
    save_as_avro,
    spark_to_avro_schema,
    write_container,
)

FULL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("dec", T.DecimalType(12, 3), True),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField("m", T.MapType(T.StringType(), T.LongType(), True), True),
        T.StructField(
            "nested",
            T.StructType(
                [
                    T.StructField("a", T.IntegerType(), True),
                    T.StructField("b", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FULL_ROWS = [
    {
        "id": 1,
        "name": "alpha",
        "score": 1.5,
        "flag": True,
        "blob": b"\x00\x01",
        "d": dt.date(2024, 3, 1),
        "ts": dt.datetime(2024, 3, 1, 12, 30, 45, 123456),
        "dec": decimal.Decimal("123.456"),
        "tags": ["x", None, "y"],
        "m": {"k1": 7, "k2": None},
        "nested": {"a": 5, "b": "inner"},
    },
    {
        "id": 2,
        "name": None,
        "score": None,
        "flag": None,
        "blob": None,
        "d": None,
        "ts": None,
        "dec": None,
        "tags": None,
        "m": None,
        "nested": None,
    },
    {
        "id": -12345678901234,
        "name": "",
        "score": -0.25,
        "flag": False,
        "blob": b"",
        "d": dt.date(1969, 12, 31),
        "ts": dt.datetime(1969, 12, 31, 23, 59, 59),
        "dec": decimal.Decimal("-0.001"),
        "tags": [],
        "m": {},
        "nested": {"a": None, "b": None},
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(codec):
    avsc = spark_to_avro_schema(FULL_SCHEMA)
    blob = write_container(FULL_ROWS, avsc, codec=codec)
    avsc2, back = parse_container(blob)
    assert avsc2 == avsc
    assert back == FULL_ROWS


def test_schema_mapping_inverts():
    avsc = spark_to_avro_schema(FULL_SCHEMA)
    assert avro_to_spark_schema(avsc) == FULL_SCHEMA


def test_multi_block_container():
    avsc = spark_to_avro_schema(
        T.StructType([T.StructField("n", T.LongType(), False)])
    )
    rows = [{"n": i} for i in range(10000)]
    blob = write_container(rows, avsc, block_rows=512)
    _, back = parse_container(blob)
    assert back == rows


def test_deterministic_output():
    """Same rows → same bytes (sync marker derived from the schema), so a
    retried task rewrites an identical file instead of forking history."""
    avsc = spark_to_avro_schema(FULL_SCHEMA)
    assert write_container(FULL_ROWS, avsc) == write_container(FULL_ROWS, avsc)


def test_bad_magic_and_codec_rejected():
    with pytest.raises(ValueError, match="magic"):
        parse_container(b"nope" + b"\x00" * 32)
    with pytest.raises(ValueError, match="codec"):
        write_container([], {"type": "record", "name": "r", "fields": []}, codec="snappy")


def test_jvm_reads_our_file(spark, tmp_path):
    """Interop direction 1: org.apache.avro DataFileReader consumes a file
    produced by this codec (deflate blocks, logical types included)."""
    avsc = spark_to_avro_schema(FULL_SCHEMA)
    p = str(tmp_path / "ours.avro")
    with open(p, "wb") as f:
        f.write(write_container(FULL_ROWS, avsc, codec="deflate"))
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), rdr)
    got = []
    while dfr.hasNext():
        r = dfr.next()
        tags = r.get("tags")
        nested = r.get("nested")
        got.append(
            {
                "id": r.get("id"),
                "name": None if r.get("name") is None else str(r.get("name")),
                "score": r.get("score"),
                "d_days": r.get("d"),  # logical date = int days on the wire
                "tags": None
                if tags is None
                else [
                    None if tags.get(i) is None else str(tags.get(i))
                    for i in range(tags.size())
                ],
                "nested_a": None if nested is None else nested.get("a"),
            }
        )
    dfr.close()
    assert [g["id"] for g in got] == [1, 2, -12345678901234]
    assert got[0]["name"] == "alpha" and got[1]["name"] is None
    assert got[0]["score"] == 1.5 and got[2]["score"] == -0.25
    assert got[0]["d_days"] == (dt.date(2024, 3, 1) - dt.date(1970, 1, 1)).days
    assert got[2]["d_days"] == -1
    assert got[0]["tags"] == ["x", None, "y"] and got[2]["tags"] == []
    assert got[0]["nested_a"] == 5 and got[1]["nested_a"] is None


def test_we_read_jvm_file(spark, tmp_path):
    """Interop direction 2: a DataFileWriter-produced file (JVM codec path)
    decodes exactly with parse_container."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("tags", T.ArrayType(T.StringType(), False), True),
        ]
    )
    avsc = spark_to_avro_schema(schema)
    jvm = spark._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(avsc))
    p = str(tmp_path / "theirs.avro")
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    dfw.create(jschema, jvm.java.io.File(p))
    rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
    rec.put("id", jvm.java.lang.Long.valueOf(42))
    rec.put("name", "beta")
    rec.put("score", 2.25)
    al = jvm.java.util.ArrayList()
    al.add("a")
    al.add("b")
    rec.put("tags", al)
    dfw.append(rec)
    rec2 = jvm.org.apache.avro.generic.GenericData.Record(jschema)
    rec2.put("id", jvm.java.lang.Long.valueOf(-7))
    dfw.append(rec2)
    dfw.close()
    with open(p, "rb") as f:
        _, back = parse_container(f.read())
    assert back == [
        {"id": 42, "name": "beta", "score": 2.25, "tags": ["a", "b"]},
        {"id": -7, "name": None, "score": None, "tags": None},
    ]


def test_distributed_roundtrip_orders(spark, tmp_path):
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = str(tmp_path / "orders_avro")
    manifest = save_as_avro(orders, d)
    assert sum(m.n_records for m in manifest) == orders.count()
    back = read_avro(spark, d)
    assert back.schema == orders.schema
    a = sorted(orders.collect(), key=repr)
    b = sorted(back.collect(), key=repr)
    assert a == b


def test_overwrite_replaces(spark, tmp_path):
    df1 = spark.range(100).select(F.col("id"))
    df2 = spark.range(7).select(F.col("id"))
    d = str(tmp_path / "ow")
    save_as_avro(df1, d)
    save_as_avro(df2, d)
    assert read_avro(spark, d).count() == 7


def test_context_avro_file_fallback(sc, spark, tmp_path):
    """ScioContext.avro_file: with no spark-avro jar the native codec path
    serves the read transparently."""
    df = spark.range(50).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    d = str(tmp_path / "ctx_avro")
    save_as_avro(df, d)
    got = sc.avro_file(d).df
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_recursive_schema_roundtrip():
    """ADVICE r5: self-referential records (here a linked list) must
    compile lazily instead of recursing forever at closure-compile time,
    and must round-trip value-exactly."""
    avsc = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }
    rows = [
        {"v": 1, "next": {"v": 2, "next": {"v": 3, "next": None}}},
        {"v": 9, "next": None},
    ]
    blob = write_container(rows, avsc)
    avsc2, back = parse_container(blob)
    assert avsc2 == avsc
    assert back == rows


def test_non_utc_session_tz_writes_true_epochs(spark, tmp_path):
    """ADVICE r5: with spark.sql.session.timeZone != UTC, naive pandas
    timestamps are session-LOCAL; save_as_avro must normalize to UTC so
    the stored epoch micros are the true instant (read back under UTC,
    the value is unchanged)."""
    path = str(tmp_path / "tz")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 12, 0, 0))], "id long, ts timestamp"
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        save_as_avro(df, path)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    back = read_avro(spark, path).collect()  # session tz is UTC again here
    assert [(r.id, r.ts) for r in back] == [(1, dt.datetime(2024, 6, 1, 12, 0, 0))]


def test_hostile_containers_raise_valueerror_only():
    """Crafted containers (lying block counts, truncated varints,
    negative sizes, deflate bombs) must raise ValueError — never
    IndexError/KeyError/zlib.error, and never an unbounded allocation."""
    import struct as _s
    import zlib

    avsc = spark_to_avro_schema(
        T.StructType([T.StructField("n", T.LongType(), False)])
    )
    good = write_container([{"n": i} for i in range(100)], avsc)
    # truncate mid-block
    for cut in (5, 40, len(good) - 3):
        with pytest.raises(ValueError):
            parse_container(good[:cut])
    # corrupt the sync marker itself
    bad = bytearray(write_container([{"n": 1}], avsc))
    bad[-5] ^= 0x7F
    with pytest.raises(ValueError, match="sync"):
        parse_container(bytes(bad))

    def varint(v):
        out = bytearray()
        z = v << 1  # zigzag of a non-negative value
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        return bytes(out)

    # appended hostile block: row count 2^40 over a 1-byte payload must
    # be rejected by the count/size plausibility checks, not looped
    blob = write_container([{"n": 0}], avsc)
    hostile = blob + varint(1 << 40) + varint(1) + b"\x00"
    with pytest.raises(ValueError):
        parse_container(hostile)
    # deflate blocks: inflation is bounded at min(size*1032, 1 GiB) —
    # a 64 MB-of-zeros payload (near deflate's max ratio) stays under
    # the spec-maximum bound and must parse to exactly its declared
    # rows, not amplify them
    blobd = bytearray(write_container([{"n": 0}], avsc, codec="deflate"))
    bomb = zlib.compress(b"\x00" * (1 << 26), 9)[2:-4]
    sync = bytes(blobd[-16:])
    hdr_end = bytes(blobd).index(sync) + 16
    crafted = (
        bytes(blobd[:hdr_end]) + varint(3) + varint(len(bomb)) + bomb + sync
    )
    _, rows = parse_container(crafted)
    assert rows == [{"n": 0}] * 3  # 64 MB of zeros decodes 3 zero rows


def test_read_long_ten_byte_cap():
    """Avro zig-zag varints are at most 10 bytes: a hostile
    0x80-continuation run raises instead of accumulating a bignum."""
    from scio_spark.sources.avro import read_long

    legal = b"\x80" * 9 + b"\x01"  # shift 63 on byte 10 -> legal
    val, pos = read_long(memoryview(legal), 0)
    assert pos == 10
    with pytest.raises(ValueError, match="varint"):
        read_long(memoryview(b"\x80" * 11 + b"\x01"), 0)
    with pytest.raises(ValueError, match="varint"):
        read_long(memoryview(b"\x80" * 100000 + b"\x01"), 0)
