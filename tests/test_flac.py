"""FLAC codec tests (functions/flac.py).

FLAC is lossless, so the backbone is exactness: encode→decode must
reproduce every input bit-for-bit (checked across signal shapes, frame
counts, and channel layouts). The decoder paths the encoder never
emits — LPC subframes, Rice2 partitions, escapes, wasted bits, stereo
decorrelation, sample-rate/block-size table codes — are checked against
independently hand-assembled bit streams whose samples are computed in
the test from the spec recurrences. CRCs are pinned against a
test-local bitwise implementation (the module uses tables)."""

import struct

import numpy as np
import pytest

from scio_spark.functions.flac import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


# ------------------------------------------------------- test-local tools


def _crc8_bitwise(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16_bitwise(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


class _BW:
    """Test-local MSB-first bit writer (independent of the module's)."""

    def __init__(self):
        self.bits = []

    def w(self, v, n):
        self.bits += [(v >> (n - 1 - i)) & 1 for i in range(n)]
        return self

    def ws(self, v, n):
        return self.w(v & ((1 << n) - 1), n)

    def unary(self, q):
        self.bits += [0] * q + [1]
        return self

    def rice(self, v, param):
        z = (abs(v) << 1) - (1 if v < 0 else 0)
        self.unary(z >> param)
        if param:
            self.w(z & ((1 << param) - 1), param)
        return self

    def bytes(self):
        bs = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            int("".join(map(str, bs[i : i + 8])), 2) for i in range(0, len(bs), 8)
        )


def _streaminfo(rate, channels, bps, total):
    w = _BW()
    w.w(1, 1).w(0, 7).w(34, 24)  # last block, STREAMINFO, length
    w.w(4096, 16).w(4096, 16).w(0, 24).w(0, 24)
    w.w(rate, 20).w(channels - 1, 3).w(bps - 1, 5).w(total, 36)
    return b"fLaC" + w.bytes() + b"\x00" * 16  # md5 zero: check skipped


def _frame_header(bs_code, rate_code, chan_code, bps_code, fno=0, extra=()):
    w = _BW()
    w.w(0x3FFE, 14).w(0, 1).w(0, 1)
    w.w(bs_code, 4).w(rate_code, 4).w(chan_code, 4).w(bps_code, 3).w(0, 1)
    w.w(fno, 8)  # frame number < 0x80 is a single UTF-8 byte
    for val, nbits in extra:
        w.w(val, nbits)
    hdr = w.bytes()
    return hdr + bytes([_crc8_bitwise(hdr)])


def _finish_frame(hdr, body_bits):
    body_bits.bits += [0] * (-len(body_bits.bits) % 8)
    frame = hdr + body_bits.bytes()
    return frame + struct.pack(">H", _crc16_bitwise(frame))


# ---------------------------------------------------------------- tests


def test_crc_tables_match_bitwise_spec():
    rng = np.random.RandomState(0)
    for ln in (0, 1, 7, 64, 301):
        data = bytes(rng.randint(0, 256, ln, dtype=np.uint8))
        assert crc8(data) == _crc8_bitwise(data)
        assert crc16(data) == _crc16_bitwise(data)


def test_roundtrip_exact_across_shapes():
    rng = np.random.RandomState(3)
    t = np.arange(10000)
    cases = [
        np.zeros(5000, np.int16),
        np.full(4097, -1234, np.int16),
        np.arange(-3000, 3000, dtype=np.int16),
        (8000 * np.sin(t / 30)).astype(np.int16),
        rng.randint(-32768, 32768, 9000).astype(np.int16),
        np.array([5, -7, 3], np.int16),
        np.array([32767, -32768], np.int16),
        np.stack(
            [
                (8000 * np.sin(np.arange(7001) / 25)).astype(np.int16),
                rng.randint(-2000, 2000, 7001).astype(np.int16),
            ],
            axis=1,
        ),
    ]
    for x in cases:
        sr, back = decode_flac(encode_flac(x, 44100))
        ref = x[:, None] if x.ndim == 1 else x
        assert sr == 44100
        assert back.shape == ref.shape
        assert (back == ref).all()


def test_many_frames_utf8_numbers_roundtrip():
    """300 frames of blocksize 16 → frame numbers cross the 1-byte UTF-8
    boundary (multi-byte coded numbers both written and parsed)."""
    x = (1000 * np.sin(np.arange(300 * 16) / 9)).astype(np.int16)
    sr, back = decode_flac(encode_flac(x, 8000, blocksize=16))
    assert (back[:, 0] == x).all()


def test_compression_actually_compresses():
    t = np.arange(20000)
    smooth = (12000 * np.sin(t / 50) + 3000 * np.sin(t / 11)).astype(np.int16)
    blob = encode_flac(smooth, 44100)
    assert len(blob) < smooth.size * 2 * 0.6  # < 60% of raw PCM


def test_hand_assembled_constant_and_verbatim():
    """Mono 8-sample frame, bps 16: a CONSTANT subframe then (second
    frame) a VERBATIM subframe — samples known by construction."""
    blob = _streaminfo(8000, 1, 16, 16)
    hdr = _frame_header(6, 0, 0, 4, fno=0, extra=[(7, 8)])  # bs 8 via 8-bit
    body = _BW()
    body.w(0, 1).w(0, 6).w(0, 1).ws(-777, 16)  # CONSTANT -777
    blob += _finish_frame(hdr, body)
    hdr = _frame_header(6, 0, 0, 4, fno=1, extra=[(7, 8)])
    body = _BW()
    body.w(0, 1).w(1, 6).w(0, 1)  # VERBATIM
    vals = [0, 1, -1, 32767, -32768, 5, -5, 1234]
    for v in vals:
        body.ws(v, 16)
    blob += _finish_frame(hdr, body)
    sr, out = decode_flac(blob)
    assert sr == 8000
    assert out[:8, 0].tolist() == [-777] * 8
    assert out[8:, 0].tolist() == vals


def test_hand_assembled_fixed_order2_with_rice():
    """FIXED order 2: warmups (10, 13), residuals (2, -1, 0, 3, -2, 1)
    coded Rice(param=2). Expected samples from the spec recurrence
    x[i] = 2 x[i-1] - x[i-2] + r[i], computed in the test."""
    blob = _streaminfo(8000, 1, 16, 8)
    hdr = _frame_header(6, 0, 0, 4, extra=[(7, 8)])
    body = _BW()
    body.w(0, 1).w(10, 6).w(0, 1)  # FIXED order 2
    body.ws(10, 16).ws(13, 16)
    body.w(0, 2).w(0, 4).w(2, 4)  # rice, 1 partition, param 2
    res = [2, -1, 0, 3, -2, 1]
    for r in res:
        body.rice(r, 2)
    blob += _finish_frame(hdr, body)
    _, out = decode_flac(blob)
    x = [10, 13]
    for r in res:
        x.append(2 * x[-1] - x[-2] + r)
    assert out[:, 0].tolist() == x


def test_hand_assembled_lpc_subframe():
    """LPC order 2, precision 6, shift 3, coefficients (5, -2):
    x[i] = ((5 x[i-1] - 2 x[i-2]) >> 3) + r[i] — expected values from
    the recurrence computed here, including the floor behaviour of the
    arithmetic shift on negative accumulators."""
    blob = _streaminfo(8000, 1, 16, 8)
    hdr = _frame_header(6, 0, 0, 4, extra=[(7, 8)])
    body = _BW()
    body.w(0, 1).w(32 + 1, 6).w(0, 1)  # LPC order 2 (type 100001)
    body.ws(-20, 16).ws(30, 16)  # warmups
    body.w(6 - 1, 4).ws(3, 5)  # precision 6, shift 3
    body.ws(5, 6).ws(-2, 6)  # coefficients, newest first
    body.w(0, 2).w(0, 4).w(3, 4)
    res = [4, -6, 2, 0, 7, -3]
    for r in res:
        body.rice(r, 3)
    blob += _finish_frame(hdr, body)
    _, out = decode_flac(blob)
    x = [-20, 30]
    for r in res:
        x.append(((5 * x[-1] - 2 * x[-2]) >> 3) + r)
    assert out[:, 0].tolist() == x


def test_hand_assembled_rice2_partitions_and_escape():
    """FIXED order 0 (residual IS the signal), Rice2 method, partition
    order 1 (two partitions of 4): first partition Rice2 param 1,
    second ESCAPED to 6-bit raw. Exercises the 5-bit param read, the
    partition sample-count split, and raw escapes."""
    blob = _streaminfo(8000, 1, 16, 8)
    hdr = _frame_header(6, 0, 0, 4, extra=[(7, 8)])
    body = _BW()
    body.w(0, 1).w(8, 6).w(0, 1)  # FIXED order 0
    body.w(1, 2).w(1, 4)  # rice2, partition order 1
    body.w(1, 5)  # partition 1: param 1
    p1 = [0, -1, 2, -2]
    for r in p1:
        body.rice(r, 1)
    body.w(31, 5).w(6, 5)  # partition 2: escape, 6-bit raw
    p2 = [-17, 30, -32, 5]
    for r in p2:
        body.ws(r, 6)
    blob += _finish_frame(hdr, body)
    _, out = decode_flac(blob)
    assert out[:, 0].tolist() == p1 + p2


def test_hand_assembled_wasted_bits():
    """CONSTANT subframe with 2 wasted bits: stored value 300 at
    bps-2 = 14 bits decodes to 300 << 2 = 1200."""
    blob = _streaminfo(8000, 1, 16, 4)
    hdr = _frame_header(6, 0, 0, 4, extra=[(3, 8)])  # blocksize 4
    body = _BW()
    body.w(0, 1).w(0, 6)
    body.w(1, 1).unary(1)  # wasted flag, unary 1 → wasted = 2
    body.ws(300, 14)
    blob += _finish_frame(hdr, body)
    _, out = decode_flac(blob)
    assert out[:, 0].tolist() == [1200] * 4


def test_hand_assembled_stereo_decorrelation():
    """Three frames, one per mode, all CONSTANT subframes. left/side:
    L=100, S=L-R=30 → R=70. right/side: S=-25, R=50 → L=25. mid/side:
    L=81, R=40 → mid=(81+40)>>1=60, side=41; reconstruction restores
    the dropped low bit: (60*2+1±41)/2 → (81, 40)."""
    blob = _streaminfo(8000, 2, 16, 12)

    def const_frame(chan_code, a_val, a_bits, b_val, b_bits, fno):
        hdr = _frame_header(6, 0, chan_code, 4, fno=fno, extra=[(3, 8)])
        body = _BW()
        body.w(0, 1).w(0, 6).w(0, 1).ws(a_val, a_bits)
        body.w(0, 1).w(0, 6).w(0, 1).ws(b_val, b_bits)
        return _finish_frame(hdr, body)

    blob += const_frame(8, 100, 16, 30, 17, 0)  # left/side
    blob += const_frame(9, -25, 17, 50, 16, 1)  # side/right
    mid, side = (81 + 40) >> 1, 81 - 40
    blob += const_frame(10, mid, 16, side, 17, 2)  # mid/side
    _, out = decode_flac(blob)
    assert out[0:4].tolist() == [[100, 70]] * 4
    assert out[4:8].tolist() == [[25, 50]] * 4
    assert out[8:12].tolist() == [[81, 40]] * 4


def test_hand_assembled_rate_and_blocksize_table_codes():
    """Block size from the table (code 1 → 192) and sample rate from
    the frame header table (code 5 → 16000), overriding STREAMINFO."""
    blob = _streaminfo(8000, 1, 16, 192)
    hdr = _frame_header(1, 5, 0, 4)
    body = _BW()
    body.w(0, 1).w(0, 6).w(0, 1).ws(7, 16)
    blob += _finish_frame(hdr, body)
    sr, out = decode_flac(blob)
    assert sr == 16000
    assert out.shape == (192, 1) and (out == 7).all()


def test_crc_and_md5_tamper_detection():
    x = (3000 * np.sin(np.arange(5000) / 20)).astype(np.int16)
    good = encode_flac(x, 8000)
    # flip a bit inside the last frame's entropy bytes
    bad = bytearray(good)
    bad[-40] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # tamper the STREAMINFO MD5 itself (frames stay valid)
    bad2 = bytearray(good)
    bad2[4 + 4 + 18] ^= 0xFF  # first md5 byte
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad2))


def test_corrupt_streams_raise_valueerror_only():
    with pytest.raises(ValueError):
        decode_flac(b"not a flac")
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")  # truncated metadata
    good = encode_flac(np.arange(100, dtype=np.int16), 8000)
    for cut in (10, 30, len(good) - 3):
        with pytest.raises(ValueError):
            decode_flac(good[:cut])


def test_md5_verification_uses_ceil_bps_bytes():
    """STREAMINFO MD5 is over samples packed little-endian into
    ceil(bps/8) bytes each (RFC 9639): a 12-bit stream hashes 2-byte
    samples, 20-bit 3-byte, 4-bit 1-byte. Regression: bps//8 hashed
    the wrong widths (false MD5 mismatch for valid 12/20-bit streams,
    KeyError at bps<8)."""
    import hashlib

    def stream(bps, value, md5_raw):
        si = _streaminfo(8000, 1, bps, 8)
        si = si[:-16] + hashlib.md5(md5_raw).digest()
        # bps_code 0 = from STREAMINFO; bs 8 via 8-bit follow
        hdr = _frame_header(6, 0, 0, 0, fno=0, extra=[(7, 8)])
        body = _BW()
        body.w(0, 1).w(0, 6).w(0, 1).ws(value, bps)  # CONSTANT
        return si + _finish_frame(hdr, body)

    raw = np.full(8, -777, "<i2").tobytes()  # 12-bit -> 2-byte samples
    _, out = decode_flac(stream(12, -777, raw))
    assert out[:, 0].tolist() == [-777] * 8
    le = np.frombuffer(np.full(8, 123456, "<i4").tobytes(), np.uint8)
    raw = le.reshape(-1, 4)[:, :3].tobytes()  # 20-bit -> 3-byte samples
    _, out = decode_flac(stream(20, 123456, raw))
    assert out[:, 0].tolist() == [123456] * 8
    raw = np.full(8, -5, "<i1").tobytes()  # 4-bit -> 1-byte samples
    _, out = decode_flac(stream(4, -5, raw))
    assert out[:, 0].tolist() == [-5] * 8
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(stream(12, -777, b"wrong bytes"))
