"""FLAC lossless audio codec — pure Python/numpy, no media libraries.

Implements the public FLAC format (xiph.org spec / RFC 9639): the
decoder handles the full frame algebra — CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (any order) subframes, wasted bits, Rice and Rice2
residual partitions with escape codes, all four channel assignments
(independent, left/side, right/side, mid/side), fixed and variable
blocking, CRC-8 header and CRC-16 frame checks, and the STREAMINFO MD5
verification of the decoded output. The encoder emits a spec-valid
subset: 16-bit samples, independent channels, per-channel best-of
CONSTANT / FIXED(0-2) / VERBATIM with single-partition Rice residuals —
enough that decode(encode(x)) == x EXACTLY for any int16 signal, which
is what the contract query pins.

Like the reference engine, which reads media as opaque bytes
(binaryFileIO; SURVEY.md §2.7), the Spark integration keeps payloads in
binary columns; decode runs inside mapInPandas so bytes cross the
Python boundary Arrow-batched. The Rice hot loop is vectorized: the
stream's bits unpack ONCE (shared across frames), unary terminators
resolve through the 1-bit index with plain integer ops, and quotients/
remainders extract in one numpy pass (read_rice_vec; ~20x over per-bit
reads — measured ~1-1.3 Msamples/s/core decode, ~1.6 encode, i.e.
~25x realtime for 44.1 kHz audio per core); FIXED predictor
integration is exact int64 cumsum. Decode parallelizes per asset
across mapInPandas tasks, same story as the JPEG Huffman tier
(jpeg.py:17).

Verification strategy (tests/test_flac.py): hand-assembled bit streams
with analytically-known samples for every subframe type and stereo
mode (independent of the encoder), exact roundtrips, CRC/MD5 tamper
tests, and corrupt-input ValueError containment.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ------------------------------------------------------------------ CRCs

_CRC8_TAB = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TAB.append(_c)

_CRC16_TAB = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TAB.append(_c)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TAB[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TAB[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------------------- bit reader


class _Bits:
    """MSB-first bit reader over a pre-unpacked numpy bit array, with a
    flatnonzero index of 1-bits so unary runs (Rice quotients) resolve
    via searchsorted instead of per-bit Python."""

    def __init__(self, data: bytes, start_byte: int = 0, shared=None):
        if shared is None:
            self.arr = np.unpackbits(np.frombuffer(data, np.uint8))
            self.ones = np.flatnonzero(self.arr)
            self._onel = self.ones.tolist()
        else:  # (arr, ones, ones_list) unpacked ONCE per stream — frames
            self.arr, self.ones, self._onel = shared  # reuse, O(file) total
        self.pos = start_byte * 8
        self.n = self.arr.size

    def read(self, nbits: int) -> int:
        p = self.pos
        if p + nbits > self.n:
            raise ValueError("FLAC: bitstream truncated")
        self.pos = p + nbits
        v = 0
        for b in self.arr[p : p + nbits]:
            v = (v << 1) | int(b)
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= 1 << (nbits - 1) else v

    def read_signed_vec(self, nbits: int, count: int) -> np.ndarray:
        """count fixed-width signed integers in one vectorized gather
        (VERBATIM subframes, escaped partitions, LPC warmups)."""
        p = self.pos
        if nbits == 0 or count == 0:
            return np.zeros(count, np.int64)
        if p + nbits * count > self.n:
            raise ValueError("FLAC: bitstream truncated")
        self.pos = p + nbits * count
        idx = p + np.arange(count)[:, None] * nbits + np.arange(nbits)
        pow2 = 1 << np.arange(nbits - 1, -1, -1, dtype=np.int64)
        v = (self.arr[idx].astype(np.int64) * pow2).sum(axis=1)
        return np.where(v >= 1 << (nbits - 1), v - (1 << nbits), v)

    def unary(self) -> int:
        """Count 0-bits until the next 1 (consuming it)."""
        oi = int(np.searchsorted(self.ones, self.pos))
        if oi >= self.ones.size:
            raise ValueError("FLAC: unary run past end of stream")
        t = int(self.ones[oi])
        q = t - self.pos
        self.pos = t + 1
        return q

    def read_rice_vec(self, param: int, count: int) -> np.ndarray:
        """count Rice(param)-coded residuals, un-zigzagged. The unary
        terminators resolve through the precomputed 1-bit index with
        plain integer ops (amortized O(total bits)); quotients and the
        fixed-width remainders then extract in one vectorized pass —
        this is the FLAC hot loop (~20x over per-bit reads)."""
        if count == 0:
            return np.zeros(0, np.int64)
        onel = self._onel
        oi = int(np.searchsorted(self.ones, self.pos))
        p = self.pos
        ts = []
        append = ts.append
        try:
            for _ in range(count):
                while onel[oi] < p:
                    oi += 1
                t = onel[oi]
                oi += 1
                append(t)
                p = t + 1 + param
        except IndexError:
            raise ValueError("FLAC: Rice run past end of stream") from None
        if p > self.n:
            raise ValueError("FLAC: bitstream truncated")
        tarr = np.array(ts, np.int64)
        starts = np.empty(count, np.int64)
        starts[0] = self.pos
        starts[1:] = tarr[:-1] + 1 + param
        q = tarr - starts
        if param:
            idx = tarr[:, None] + 1 + np.arange(param)
            pow2 = 1 << np.arange(param - 1, -1, -1, dtype=np.int64)
            rem = (self.arr[idx].astype(np.int64) * pow2).sum(axis=1)
            z = (q << param) | rem
        else:
            z = q
        self.pos = p
        return (z >> 1) ^ -(z & 1)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


# ------------------------------------------------------------- bit writer


class _BitW:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        self.bits.extend((value >> (nbits - 1 - i)) & 1 for i in range(nbits))

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        self.bits.extend([0] * q)
        self.bits.append(1)

    def write_signed_vec(self, values: np.ndarray, nbits: int) -> None:
        """Fixed-width signed integers, one vectorized scatter."""
        v = np.asarray(values, np.int64) & ((1 << nbits) - 1)
        shifts = np.arange(nbits - 1, -1, -1, dtype=np.int64)
        self.bits.extend(((v[:, None] >> shifts) & 1).ravel().tolist())

    def write_rice_vec(self, res: np.ndarray, param: int) -> None:
        """Rice-code a residual vector in one vectorized build: zigzag,
        scatter the unary terminators by cumulative offset, broadcast
        the fixed-width remainders (the encoder hot loop)."""
        v = np.asarray(res, np.int64)
        z = (np.abs(v) << 1) - (v < 0).astype(np.int64)
        qs = z >> param
        lens = qs + 1 + param
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        bits = np.zeros(int(lens.sum()), np.uint8)
        bits[starts + qs] = 1
        if param:
            rem = z & ((1 << param) - 1)
            idx = (starts + qs + 1)[:, None] + np.arange(param)
            shifts = np.arange(param - 1, -1, -1, dtype=np.int64)
            bits[idx.ravel()] = ((rem[:, None] >> shifts) & 1).ravel()
        self.bits.extend(bits.tolist())

    def align(self) -> None:
        pad = -len(self.bits) % 8
        self.bits.extend([0] * pad)

    def bytes(self) -> bytes:
        self.align()
        return np.packbits(np.array(self.bits, np.uint8)).tobytes()


# --------------------------------------------------------------- helpers

_BLOCKSIZE_TAB = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_TAB = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_TAB = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_utf8_number(br: _Bits) -> int:
    """FLAC's UTF-8-style coded number (extended to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nfollow = 0
    mask = 0x80
    while b0 & mask:
        nfollow += 1
        mask >>= 1
    if nfollow < 1 or nfollow > 6:
        raise ValueError("FLAC: invalid UTF-8 coded number")
    v = b0 & (0x7F >> nfollow)
    for _ in range(nfollow - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _write_utf8_number(w: _BitW, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    for n in range(2, 8):  # n-byte form carries (7-n) + 6*(n-1) bits
        if v < 1 << (6 * (n - 1) + (7 - n)):
            break
    w.write(((0xFF00 >> n) & 0xFF) | (v >> (6 * (n - 1))), 8)
    for i in range(n - 2, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


# ---------------------------------------------------------------- decode


def decode_flac(blob: bytes) -> tuple[int, np.ndarray]:
    """FLAC bytes → (sample_rate, int32 samples (frames, channels)).
    Raises ValueError (only) on corrupt streams, failed CRCs, or a
    failed STREAMINFO MD5 check."""
    try:
        return _decode_flac(blob)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"corrupt FLAC stream: {e!r}") from e


def _decode_flac(blob: bytes) -> tuple[int, np.ndarray]:
    if blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC marker)")
    pos = 4
    si = None
    while True:
        if pos + 4 > len(blob):
            raise ValueError("FLAC: truncated metadata")
        hdr = blob[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + blob[pos + 1 : pos + 4])
        body = blob[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError("FLAC: bad STREAMINFO length")
            si = _parse_streaminfo(body)
        pos += 4 + blen
        if last:
            break
    if si is None:
        raise ValueError("FLAC: missing STREAMINFO")
    rate, channels, bps, total, md5 = si

    arr = np.unpackbits(np.frombuffer(blob, np.uint8))
    ones = np.flatnonzero(arr)
    shared = (arr, ones, ones.tolist())
    out = [[] for _ in range(channels)]
    got = 0
    first = True
    while pos < len(blob) and (total == 0 or got < total):
        pos, chans, frate = _decode_frame(
            blob, pos, rate, channels, bps, shared
        )
        if first:
            rate = frate  # frame-header rate code overrides STREAMINFO
            first = False
        for c in range(channels):
            out[c].append(chans[c])
        got += chans[0].size
    arr = np.stack(
        [np.concatenate(c) if c else np.zeros(0, np.int64) for c in out],
        axis=1,
    )
    if total:
        arr = arr[:total]
    if md5 != b"\x00" * 16:
        # Per RFC 9639 the MD5 is over samples packed little-endian into
        # ceil(bps/8) bytes each — NOT bps//8 (a 12-bit stream hashes
        # 2-byte samples, a 20-bit stream 3-byte samples, 4-bit 1-byte).
        width = (bps + 7) // 8
        if width == 3:
            le = np.frombuffer(arr.astype("<i4").tobytes(), np.uint8)
            raw = le.reshape(-1, 4)[:, :3].tobytes()
        else:
            raw = arr.astype({1: "<i1", 2: "<i2", 4: "<i4"}[width]).tobytes()
        if hashlib.md5(raw).digest() != md5:
            raise ValueError("FLAC: MD5 mismatch — decoded audio is wrong")
    return rate, arr.astype(np.int32)


def _parse_streaminfo(b: bytes):
    br = _Bits(b)
    br.read(16)  # min block size
    br.read(16)  # max block size
    br.read(24)  # min frame size
    br.read(24)  # max frame size
    rate = br.read(20)
    channels = br.read(3) + 1
    bps = br.read(5) + 1
    total = br.read(36)
    md5 = b[18:34]
    if rate == 0:
        raise ValueError("FLAC: sample rate 0")
    return rate, channels, bps, total, md5


def _decode_frame(blob, pos, si_rate, si_channels, si_bps, shared=None):
    br = _Bits(blob, pos, shared)
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError("FLAC: bad frame sync")
    if br.read(1):
        raise ValueError("FLAC: reserved bit set in frame header")
    br.read(1)  # blocking strategy (number meaning only)
    bs_code = br.read(4)
    rate_code = br.read(4)
    chan_code = br.read(4)
    bps_code = br.read(3)
    if br.read(1):
        raise ValueError("FLAC: reserved frame header bit set")
    _read_utf8_number(br)  # frame/sample number (sequential decode)
    if bs_code == 0:
        raise ValueError("FLAC: reserved block size code")
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_TAB[bs_code]
    if rate_code == 0:
        rate = si_rate
    elif rate_code in _RATE_TAB:
        rate = _RATE_TAB[rate_code]
    elif rate_code == 12:
        rate = br.read(8) * 1000
    elif rate_code == 13:
        rate = br.read(16)
    elif rate_code == 14:
        rate = br.read(16) * 10
    else:
        raise ValueError("FLAC: invalid sample rate code")
    if bps_code == 0:
        bps = si_bps
    elif bps_code in _BPS_TAB:
        bps = _BPS_TAB[bps_code]
    else:
        raise ValueError("FLAC: reserved sample size code")
    hdr_end = br.byte_pos()
    if crc8(blob[pos:hdr_end]) != br.read(8):
        raise ValueError("FLAC: frame header CRC-8 mismatch")

    if chan_code <= 7:
        nch = chan_code + 1
        if nch != si_channels:
            raise ValueError("FLAC: frame/STREAMINFO channel mismatch")
        chans = [
            _decode_subframe(br, blocksize, bps) for _ in range(nch)
        ]
    elif chan_code in (8, 9, 10):
        if si_channels != 2:
            raise ValueError("FLAC: stereo decorrelation in non-stereo stream")
        a = _decode_subframe(br, blocksize, bps + (1 if chan_code == 9 else 0))
        b = _decode_subframe(br, blocksize, bps + (0 if chan_code == 9 else 1))
        if chan_code == 8:  # left/side: a=left, b=side=L-R
            chans = [a, a - b]
        elif chan_code == 9:  # right/side: a=side, b=right
            chans = [b + a, b]
        else:  # mid/side
            mid, side = a, b
            m2 = (mid << 1) | (side & 1)
            chans = [(m2 + side) >> 1, (m2 - side) >> 1]
    else:
        raise ValueError("FLAC: reserved channel assignment")
    br.align()
    foot = br.byte_pos()
    if crc16(blob[pos:foot]) != br.read(16):
        raise ValueError("FLAC: frame CRC-16 mismatch")
    return br.byte_pos(), chans, rate


def _decode_subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC: subframe header padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        x = np.full(blocksize, br.read_signed(bps), np.int64)
    elif stype == 1:  # VERBATIM
        x = br.read_signed_vec(bps, blocksize)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        x = _restore_fixed(order, warm, res)
    elif stype >= 32:  # LPC
        order = stype - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        x = np.empty(blocksize, np.int64)
        x[:order] = warm
        c = np.array(coefs, np.int64)[::-1]  # x[i-order..i-1] dot
        for i in range(order, blocksize):
            x[i] = ((x[i - order : i] * c).sum() >> shift) + res[i - order]
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    return x << wasted if wasted else x


def _restore_fixed(order: int, warm, res: np.ndarray) -> np.ndarray:
    """Fixed predictor order k means the residual is the k-th forward
    difference of the signal; integration is k exact int64 cumsums,
    each seeded with the head of the corresponding difference level
    (derived from the warmup samples)."""
    if order == 0:
        return res.astype(np.int64)
    w = np.array(warm, np.int64)
    seeds = []
    for _ in range(order):
        seeds.append(int(w[0]))
        w = np.diff(w)
    y = res.astype(np.int64)
    for j in range(order - 1, -1, -1):
        y = np.cumsum(np.concatenate([[seeds[j]], y]))
    return y


def _decode_residual(br: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("FLAC: partition order does not divide block size")
    out = np.empty(blocksize - order, np.int64)
    w = 0
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC: predictor order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            out[w : w + cnt] = br.read_signed_vec(raw, cnt)
        else:
            out[w : w + cnt] = br.read_rice_vec(param, cnt)
        w += cnt
    return out


# ---------------------------------------------------------------- encode


def encode_flac(
    samples: np.ndarray, sample_rate: int, blocksize: int = 4096
) -> bytes:
    """int16 (frames,) or (frames, channels) → FLAC bytes. Spec-valid
    subset: independent channels, per-channel best of CONSTANT /
    FIXED(0-2) / VERBATIM, single Rice partition, fixed blocking.
    decode_flac(encode_flac(x)) == x exactly (lossless)."""
    arr = np.asarray(samples, np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    frames, channels = arr.shape
    if channels < 1 or channels > 8:
        raise ValueError(f"FLAC: unsupported channel count {channels}")
    if not 16 <= blocksize <= 32768:
        raise ValueError("FLAC: block size out of range")
    md5 = hashlib.md5(arr.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC")
    w = _BitW()
    w.write(1, 1)  # last metadata block
    w.write(0, 7)  # STREAMINFO
    w.write(34, 24)
    w.write(blocksize, 16)
    w.write(blocksize, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sample_rate, 20)
    w.write(channels - 1, 3)
    w.write(15, 5)  # bps - 1 = 15
    w.write(frames, 36)
    out += w.bytes() + md5

    x64 = arr.astype(np.int64)
    fno = 0
    for start in range(0, max(frames, 1), blocksize):
        blk = x64[start : start + blocksize]
        if blk.shape[0] == 0:
            break
        out += _encode_frame(blk, fno, sample_rate)
        fno += 1
    return bytes(out)


def _encode_frame(blk: np.ndarray, fno: int, rate: int) -> bytes:
    n, channels = blk.shape
    w = _BitW()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)  # fixed blocking
    w.write(7, 4)  # block size: 16-bit at end of header
    w.write(0, 4)  # rate: from STREAMINFO
    w.write(channels - 1, 4)
    w.write(4, 3)  # bps 16
    w.write(0, 1)
    _write_utf8_number(w, fno)
    w.write(n - 1, 16)
    hdr = w.bytes()  # header is byte-aligned here by construction
    hdr += bytes([crc8(hdr)])
    body = _BitW()
    for c in range(channels):
        _encode_subframe(body, blk[:, c])
    frame = hdr + body.bytes()
    return frame + struct.pack(">H", crc16(frame))


def _rice_cost(res: np.ndarray, param: int) -> int:
    z = (np.abs(res) << 1) - (res < 0).astype(np.int64)
    return int((z >> param).sum()) + res.size * (1 + param)


def _best_param(res: np.ndarray) -> int:
    if res.size == 0:
        return 0
    z = float(np.abs(res).mean())
    p = max(0, min(14, int(np.log2(z + 1)) ))
    best, bcost = p, _rice_cost(res, p)
    for q in (p - 1, p + 1, p + 2):
        if 0 <= q <= 14:
            c = _rice_cost(res, q)
            if c < bcost:
                best, bcost = q, c
    return best


def _encode_subframe(w: _BitW, x: np.ndarray) -> None:
    n = x.size
    if n and (x == x[0]).all():
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write_signed(int(x[0]), 16)
        return
    best = None  # (bits, order, warm, res, param)
    for order in range(0, 3):
        if n <= order:
            break
        r = x.astype(np.int64)
        for _ in range(order):
            r = np.diff(r)
        if np.abs(r).max(initial=0) >= 1 << 30:
            continue
        param = _best_param(r)
        cost = order * 16 + 2 + 4 + 4 + _rice_cost(r, param)
        if best is None or cost < best[0]:
            best = (cost, order, x[:order], r, param)
    verbatim_cost = 16 * n
    if best is None or best[0] >= verbatim_cost:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        w.write_signed_vec(x, 16)
        return
    _, order, warm, res, param = best
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)
    for v in warm:
        w.write_signed(int(v), 16)
    w.write(0, 2)  # rice method 0 (4-bit params)
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    w.write_rice_vec(res, param)
