"""Property-based tests for the wire codecs (hypothesis).

The deterministic tests pin golden bytes and fixed fixtures; these drive
the same codecs through randomized value space — the places wire formats
actually break (varint boundaries, negative ints, empty/unicode strings,
nesting, NaNs)."""

import datetime as dt
import decimal
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from scio_spark.sources.avro import (
    parse_container,
    spark_to_avro_schema,
    write_container,
)
from scio_spark.sources.proto import (
    example_decode,
    example_encode,
    message_decode,
    message_encode,
    read_uvarint,
    write_uvarint,
)

I64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@given(I64.map(lambda v: v & ((1 << 64) - 1)))
def test_uvarint_roundtrip(n):
    out = bytearray()
    write_uvarint(out, n)
    got, pos = read_uvarint(memoryview(bytes(out)), 0)
    assert got == n and pos == len(out)


AVRO_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("b", T.BinaryType(), True),
        T.StructField("dt", T.DateType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("dec", T.DecimalType(18, 4), True),
        T.StructField("arr", T.ArrayType(T.LongType(), True), True),
        T.StructField("m", T.MapType(T.StringType(), T.StringType(), True), True),
    ]
)

avro_row = st.fixed_dictionaries(
    {
        "i": st.none() | I64,
        "s": st.none() | st.text(max_size=40),
        "d": st.none()
        | st.floats(allow_nan=False, allow_infinity=True, width=64),
        "b": st.none() | st.binary(max_size=40),
        "dt": st.none()
        | st.dates(min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 31)),
        "ts": st.none()
        | st.datetimes(
            min_value=dt.datetime(1, 1, 1), max_value=dt.datetime(9999, 12, 28)
        ),
        "dec": st.none()
        | st.integers(min_value=-(10**14), max_value=10**14).map(
            lambda u: decimal.Decimal(u).scaleb(-4)
        ),
        "arr": st.none() | st.lists(st.none() | I64, max_size=8),
        "m": st.none()
        | st.dictionaries(st.text(max_size=8), st.none() | st.text(max_size=8), max_size=6),
    }
)


@settings(max_examples=60, deadline=None)
@given(st.lists(avro_row, max_size=12), st.sampled_from(["null", "deflate"]))
def test_avro_container_roundtrip_random(rows, codec):
    avsc = spark_to_avro_schema(AVRO_SCHEMA)
    blob = write_container(rows, avsc, codec=codec, block_rows=5)
    _, back = parse_container(blob)
    assert back == rows


PROTO_SPEC = {
    1: ("i", "int64", False),
    2: ("s", "string", False),
    3: ("ds", "double", True),
    4: ("tags", "string", True),
    5: ("inner", {1: ("a", "int64", False), 2: ("bs", "bytes", True)}, False),
}

proto_row = st.fixed_dictionaries(
    {
        "i": st.none() | I64,
        "s": st.none() | st.text(max_size=30),
        "ds": st.lists(
            st.floats(allow_nan=False, allow_infinity=True, width=64), max_size=6
        ),
        "tags": st.lists(st.text(max_size=10), max_size=5),
        "inner": st.none()
        | st.fixed_dictionaries(
            {"a": st.none() | I64, "bs": st.lists(st.binary(max_size=10), max_size=4)}
        ),
    }
)


@settings(max_examples=60, deadline=None)
@given(proto_row)
def test_proto_message_roundtrip_random(row):
    assert message_decode(message_encode(row, PROTO_SPEC), PROTO_SPEC) == row


TFEX_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("toks", T.ArrayType(T.LongType(), False), True),
        T.StructField("emb", T.ArrayType(T.FloatType(), False), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

F32 = st.floats(allow_nan=False, allow_infinity=False, width=32)

tfex_row = st.fixed_dictionaries(
    {
        "i": st.none() | I64,
        "s": st.none() | st.text(max_size=30),
        "toks": st.lists(I64, max_size=8),
        "emb": st.lists(F32, max_size=8),
        "payload": st.none() | st.binary(max_size=30),
    }
)


@settings(max_examples=60, deadline=None)
@given(tfex_row)
def test_tf_example_roundtrip_random(row):
    back = example_decode(example_encode(row, TFEX_SCHEMA), TFEX_SCHEMA)
    # float32 lists round-trip exactly (values are already float32-exact);
    # null arrays decode to [] (TF has no null feature values)
    expect = dict(row)
    if expect["toks"] is None:
        expect["toks"] = []
    if expect["emb"] is None:
        expect["emb"] = []
    for k in ("i", "s", "toks", "payload"):
        assert back[k] == expect[k], k
    assert len(back["emb"]) == len(expect["emb"])
    for a, b in zip(back["emb"], expect["emb"]):
        assert a == b or (math.isnan(a) and math.isnan(b))


# ------------------------------------------------------------------- PNG

import numpy as np  # noqa: E402

from scio_spark.functions.codecs import decode_png, encode_png  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([None, 3, 4]),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=5),
)
def test_png_roundtrip_property(h, w, ch, seed, cycle):
    shape = (h, w) if ch is None else (h, w, ch)
    arr = np.random.RandomState(seed % (2**31)).randint(
        0, 256, size=shape, dtype=np.uint8
    )
    blob = encode_png(arr, filter_cycle=tuple(cycle))
    assert np.array_equal(decode_png(blob), arr)
