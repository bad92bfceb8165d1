"""Baseline JPEG codec tests (functions/jpeg.py).

JPEG is lossy, so the verification strategy is layered: the DCT pair is
pinned as an exact float inverse; DECODE is checked against hand-
assembled streams whose pixels are analytically known (DC-only blocks
decode to flat values computable from the quant table by hand) —
independent of encode_jpeg; encode→decode round-trips are bounded by
error profiles that only hold when both directions are right (a flat
image must survive EXACTLY; smooth gradients within ±1 at q95)."""

import struct
import zlib  # noqa: F401  (parallel with the PNG tests' toolkit)

import numpy as np
import pytest

from scio_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    dct2,
    encode_jpeg,
    idct2,
    quality_tables,
)


def test_dct_idct_exact_inverse():
    rng = np.random.RandomState(3)
    blocks = rng.rand(20, 8, 8) * 255.0 - 128.0
    assert np.allclose(idct2(dct2(blocks)), blocks, atol=1e-9)
    # Parseval: orthonormal transform preserves energy
    assert np.allclose(
        (dct2(blocks) ** 2).sum(), (blocks**2).sum(), rtol=1e-12
    )


def test_flat_image_roundtrips_exactly():
    for v in (0, 63, 128, 130, 255):
        flat = np.full((16, 24), v, np.uint8)
        out = decode_jpeg(encode_jpeg(flat, 90))
        assert out.shape == (16, 24)
        assert int(np.abs(out.astype(int) - v).max()) == 0, v


def test_smooth_roundtrip_error_profile():
    y, x = np.mgrid[0:40, 0:56]
    sm = (128 + 60 * np.sin(x / 9) + 50 * np.cos(y / 7)).clip(0, 255)
    sm = sm.astype(np.uint8)
    prev = None
    for q in (50, 75, 95):
        d = decode_jpeg(encode_jpeg(sm, q))
        err = float(np.abs(d.astype(int) - sm.astype(int)).mean())
        assert err < 2.0, (q, err)
        if prev is not None:
            assert err <= prev + 0.05  # quality ladder monotone-ish
        prev = err
    rgb = np.dstack([sm, sm[::-1], sm[:, ::-1]])
    d = decode_jpeg(encode_jpeg(rgb, 95))
    assert d.shape == rgb.shape
    assert float(np.abs(d.astype(int) - rgb.astype(int)).mean()) < 2.0


def test_shapes_preserved_including_padding():
    rng = np.random.RandomState(2)
    for shape in [(1, 1), (7, 5), (9, 17, 3), (8, 8, 3), (23, 3)]:
        a = rng.randint(0, 256, size=shape, dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(a, 90)).shape == a.shape


# ------------------------------------------------- hand-assembled streams


def _canonical(bits, huffval):
    """Test-local canonical code builder (T.81 Annex C, re-derived here so
    golden streams don't depend on the module under test)."""
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _W:
    def __init__(self):
        self.bits = []

    def put(self, code, ln):
        self.bits += [(code >> (ln - 1 - i)) & 1 for i in range(ln)]

    def bytes(self):
        bs = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bs), 8):
            b = int("".join(map(str, bs[i : i + 8])), 2)
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
# only EOB (0x00) is needed for DC-only blocks; full table for validity
from scio_spark.functions.jpeg import _AC_L  # noqa: E402

AC_VALS = _AC_L[1]


def _seg(tag, payload):
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def _gray_dc_only_stream(dc_diffs, w, h, q00=16, dri=0, rst_between=False):
    """Assemble a baseline gray JPEG whose blocks are DC-only with the
    given per-block DC DIFF values; quant table is all q00."""
    qtab = bytes([0]) + bytes([q00] * 64)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dc = _canonical(DC_BITS, DC_VALS)
    ac = _canonical(AC_BITS, AC_VALS)
    chunks = []
    wtr = _W()
    for i, diff in enumerate(dc_diffs):
        if rst_between and i > 0:
            chunks.append(wtr.bytes())
            chunks.append(bytes([0xFF, 0xD0 + (i - 1) % 8]))
            wtr = _W()
        if diff == 0:
            c, ln = dc[0]
            wtr.put(c, ln)
        else:
            t = abs(diff).bit_length()
            code = diff if diff >= 0 else diff + (1 << t) - 1
            c, ln = dc[t]
            wtr.put(c, ln)
            wtr.put(code, t)
        c, ln = ac[0x00]  # EOB
        wtr.put(c, ln)
    chunks.append(wtr.bytes())
    body = b"".join(chunks)
    out = b"\xff\xd8" + _seg(0xDB, qtab) + _seg(0xC0, sof)
    out += _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    out += _seg(0xDA, sos) + body + b"\xff\xd9"
    return out


def test_decode_hand_assembled_dc_only():
    """Two 8x8 blocks side by side: DC diffs (2, 3) → absolute DC (2, 5)
    → dequantized (32, 80) → IDCT of a DC-only block is coef/8 flat →
    pixels 128+4=132 and 128+10=138. Analytic, independent of
    encode_jpeg."""
    blob = _gray_dc_only_stream([2, 3], w=16, h=8, q00=16)
    out = decode_jpeg(blob)
    assert out.shape == (8, 16)
    assert (out[:, :8] == 132).all()
    assert (out[:, 8:] == 138).all()


def test_decode_restart_markers_reset_dc_prediction():
    """DRI=1 with an RST0 between the two MCUs: the second block's 'diff'
    is absolute (predictor reset to 0), so diffs (2, 2) decode to DC
    (2, 2) — NOT (2, 4)."""
    blob = _gray_dc_only_stream(
        [2, 2], w=16, h=8, q00=16, dri=1, rst_between=True
    )
    out = decode_jpeg(blob)
    assert (out[:, :8] == 132).all()
    assert (out[:, 8:] == 132).all()  # would be 136 without the reset


def test_decode_420_subsampled_flat_color():
    """Hand-assembled 4:2:0 stream: one MCU = 4 Y blocks + 1 Cb + 1 Cr,
    all DC-only, flat (Y, Cb, Cr) = (90+128, 148, 108) after level shift
    — the RGB output is the analytic YCbCr inverse of those constants."""
    q00 = 8
    qtab = bytes([0]) + bytes([q00] * 64)
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    dc = _canonical(DC_BITS, DC_VALS)
    ac = _canonical(AC_BITS, AC_VALS)
    wtr = _W()

    def put_dc(diff):
        if diff == 0:
            c, ln = dc[0]
            wtr.put(c, ln)
        else:
            t = abs(diff).bit_length()
            code = diff if diff >= 0 else diff + (1 << t) - 1
            c, ln = dc[t]
            wtr.put(c, ln)
            wtr.put(code, t)
        c, ln = ac[0x00]
        wtr.put(c, ln)

    # Y blocks: first diff 90*8/q00... DC coef = level-shifted value * 8
    # / q00: value 90 → coef 90*8/8 = 90. diffs: 90, 0, 0, 0
    put_dc(90)
    put_dc(0)
    put_dc(0)
    put_dc(0)
    put_dc(20)  # Cb: (148-128)*8/8 = 20
    put_dc(-20)  # Cr: (108-128)*8/8 = -20
    blob = (
        b"\xff\xd8" + _seg(0xDB, qtab) + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos) + wtr.bytes() + b"\xff\xd9"
    )
    out = decode_jpeg(blob)
    assert out.shape == (16, 16, 3)
    y, cb, cr = 218.0, 148.0, 108.0
    exp = [
        round(y + 1.402 * (cr - 128)),
        round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        round(y + 1.772 * (cb - 128)),
    ]
    assert out[0, 0].tolist() == exp
    assert (out == np.array(exp, np.uint8)).all()


def test_encoder_respects_quality_tables():
    ql50, qc50 = quality_tables(50)
    assert ql50[0] == 16 and qc50[0] == 17  # scale 100 = identity
    ql100, _ = quality_tables(100)
    assert (ql100 == 1).all()
    with pytest.raises(ValueError):
        quality_tables(0)


def test_rejects_unsupported_streams():
    # arithmetic-coded sequential (SOF9) stays unsupported
    sof9 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    blob = b"\xff\xd8" + _seg(0xC9, sof9) + b"\xff\xd9"
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(blob)
    # progressive SOF2 with no SOS: a frame header alone is not a stream
    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    blob = b"\xff\xd8" + _seg(0xC2, sof2) + b"\xff\xd9"
    with pytest.raises(ValueError, match="SOF/SOS"):
        decode_jpeg(blob)
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no SOF/SOS
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # truncated entropy data
    good = encode_jpeg(np.full((8, 8), 80, np.uint8), 90)
    with pytest.raises(ValueError):
        decode_jpeg(good[:-6])


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot values
    assert ZIGZAG[1] == 1 and ZIGZAG[2] == 8 and ZIGZAG[63] == 63


def test_jpeg_through_spark_surfaces(spark):
    from scio_spark.functions.codecs import image_features, resize_images, sniff

    img = np.dstack(
        [np.full((16, 16), v, np.uint8) for v in (200, 40, 90)]
    )
    blob = encode_jpeg(img, 90)
    assert sniff(blob) == "jpeg"
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "asset_id long, content binary"
    )
    f = image_features(df).head()
    assert f.decoder == "jpeg" and (f.width, f.height, f.channels) == (16, 16, 3)
    assert abs(f.mean_intensity - float(img.mean())) < 3.0
    r = resize_images(df, 8, 8).head()
    assert r.resized
    back = decode_jpeg(bytes(r.content))  # stays a JPEG
    assert back.shape == (8, 8, 3)
    assert int(np.abs(back.astype(int) - img[::2, ::2].astype(int)).max()) < 6


def test_corrupt_jpeg_raises_valueerror_and_degrades_in_spark(spark):
    """Truncated JPEG segments must raise ValueError (not IndexError /
    KeyError / struct.error), so the Spark feature surface degrades them
    to decoder='unknown' rows instead of failing the task."""
    from scio_spark.functions.codecs import image_features

    good = encode_jpeg(np.full((16, 16, 3), 77, np.uint8), 85)
    cut_points = [4, 20, len(good) // 3, len(good) - 3]
    for cut in cut_points:
        with pytest.raises(ValueError):
            decode_jpeg(good[:cut])
    df = spark.createDataFrame(
        [(i, bytearray(good[:c])) for i, c in enumerate(cut_points)]
        + [(99, bytearray(good))],
        "asset_id long, content binary",
    )
    got = {r.asset_id: r.decoder for r in image_features(df).collect()}
    assert got[99] == "jpeg"
    assert all(got[i] == "unknown" for i in range(len(cut_points)))


def test_adversarial_high_frequency_at_q100():
    """Max-amplitude checkerboards at quality 100 (quant table all 1s)
    maximize coefficient magnitudes: AC stays within Huffman size 10 and
    DC diff within size 11 (|F| <= sqrt(64)*128 < 1024 for orthonormal
    DCT), so the Annex K tables always have a code — and the roundtrip
    is near-exact."""
    y, x = np.mgrid[0:32, 0:32]
    for pat in [255 * ((x + y) % 2), 255 * (x % 2), 255 * (y % 2)]:
        img = pat.astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, 100))
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2
    rgbchk = np.dstack([255 * ((x + y) % 2)] * 3).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgbchk, 100))
    assert int(np.abs(out.astype(int) - rgbchk.astype(int)).max()) == 0


def test_single_component_scan_is_non_interleaved():
    """T.81 A.2: a one-component scan is non-interleaved — MCU = one 8x8
    data unit. A grayscale stream may legally declare Hi=Vi=2 in SOF0;
    those factors must not change the block raster (a 2x2-interleaved
    read misparses the entropy stream — usually 'entropy data
    truncated')."""
    img = (np.arange(24 * 24, dtype=np.uint8) % 251).reshape(24, 24)
    blob = encode_jpeg(img, quality=90)
    baseline = decode_jpeg(blob)
    # patch the single component's sampling byte in SOF0: 0x11 -> 0x22
    i = blob.index(b"\xff\xc0")
    assert blob[i + 9] == 1  # one component (grayscale)
    assert blob[i + 11] == 0x11
    patched = bytearray(blob)
    patched[i + 11] = 0x22
    got = decode_jpeg(bytes(patched))
    assert np.array_equal(got, baseline)


# --------------------------------------------- progressive (SOF2) decode
#
# Strategy mirrors the baseline tier: hand-assembled multi-scan streams
# whose final coefficients are known by construction, pixels checked
# against a test-local textbook IDCT (independent of the module's
# einsum idct2); then encode_jpeg_progressive vs encode_jpeg exactness
# (the two entropy paths share only quantization, so any defect in the
# scan script, EOB runs, or correction bits breaks pixel equality).


def _ref_idct_block(coef_natural):
    """Textbook T.81 A.3.3 inverse DCT, O(64^2) loops — deliberately
    naive and independent of jpeg.idct2."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef_natural[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def _prog_sos(scan, ss, se, ah, al):
    """SOS segment for a progressive scan: scan = [(comp_id, td, ta)]."""
    body = bytes([len(scan)])
    for cs, td, ta in scan:
        body += bytes([cs, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def _gray_prog_headers(w, h, q00):
    qtab = bytes([0]) + bytes([q00] * 64)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    return (
        b"\xff\xd8" + _seg(0xDB, qtab) + _seg(0xC2, sof) + _seg(0xC4, dht_dc)
    )


def test_progressive_dc_successive_approximation():
    """Two 8x8 blocks. Scan 1 (Ss=Se=0, Ah=0, Al=1) carries DC>>1 as
    diffs: (2, diff 1) -> shifted DC (4, 6). Scan 2 (Ah=1, Al=0) refines
    one raw bit per block: (1, 0) -> final DC (5, 6). q00=16: pixels
    128 + dc*16/8 = (138, 140), flat — fully analytic."""
    dc = _canonical(DC_BITS, DC_VALS)

    def put_diff(wtr, diff):
        if diff == 0:
            c, ln = dc[0]
            wtr.put(c, ln)
            return
        t = abs(diff).bit_length()
        code = diff if diff >= 0 else diff + (1 << t) - 1
        c, ln = dc[t]
        wtr.put(c, ln)
        wtr.put(code, t)

    w1 = _W()
    put_diff(w1, 2)  # block 0: DC>>1 = 2
    put_diff(w1, 1)  # block 1: DC>>1 = 3
    w2 = _W()
    w2.put(1, 1)  # block 0 bit0 = 1 -> DC 5
    w2.put(0, 1)  # block 1 bit0 = 0 -> DC 6
    blob = (
        _gray_prog_headers(16, 8, q00=16)
        + _prog_sos([(1, 0, 0)], 0, 0, 0, 1) + w1.bytes()
        + _prog_sos([(1, 0, 0)], 0, 0, 1, 0) + w2.bytes()
        + b"\xff\xd9"
    )
    out = decode_jpeg(blob)
    assert out.shape == (8, 16)
    assert (out[:, :8] == 138).all()
    assert (out[:, 8:] == 140).all()


def test_progressive_ac_band_scan_and_eobrun():
    """Three blocks, q00=8. DC scan (Al=0) delivers DC (4, 2, 1). An AC
    scan over band 1..63 gives block 0 one coefficient (k=1, value +1)
    then ends the band with EOB1 + extension bit 1 = an end-of-band run
    covering blocks 1 and 2. Expected pixels come from a test-local
    textbook IDCT of the known coefficient grids."""
    dc = _canonical(DC_BITS, DC_VALS)
    # tiny custom AC table: EOB0, (run0,size1), EOB1, ZRL
    ac_bits = [0, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x01, 0x10, 0xF0]
    ac = _canonical(ac_bits, ac_vals)

    def put_diff(wtr, diff):
        if diff == 0:
            c, ln = dc[0]
            wtr.put(c, ln)
            return
        t = abs(diff).bit_length()
        code = diff if diff >= 0 else diff + (1 << t) - 1
        c, ln = dc[t]
        wtr.put(c, ln)
        wtr.put(code, t)

    wdc = _W()
    for d in (4, -2, -1):  # DC 4, 2, 1
        put_diff(wdc, d)
    wac = _W()
    c, ln = ac[0x01]  # run 0, size 1
    wac.put(c, ln)
    wac.put(1, 1)  # +1 at k=1
    c, ln = ac[0x10]  # EOB1: run of (1<<1) + ext bits
    wac.put(c, ln)
    wac.put(1, 1)  # extension bit -> covers this block + 2 more
    blob = (
        _gray_prog_headers(24, 8, q00=8)
        + _prog_sos([(1, 0, 0)], 0, 0, 0, 0) + wdc.bytes()
        + _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + _prog_sos([(1, 0, 0)], 1, 63, 0, 0) + wac.bytes()
        + b"\xff\xd9"
    )
    out = decode_jpeg(blob)
    assert out.shape == (8, 24)
    # expected: block 0 has DC=4*8=32, AC(0,1)=1*8=8; blocks 1-2 DC-only
    exp = np.zeros((8, 24))
    cf = np.zeros((8, 8))
    cf[0, 0], cf[0, 1] = 32.0, 8.0  # zigzag k=1 is natural (v=0, u=1)
    exp[:, :8] = _ref_idct_block(cf) + 128.0
    for bi, dcv in ((1, 2), (2, 1)):
        cf = np.zeros((8, 8))
        cf[0, 0] = dcv * 8.0
        exp[:, bi * 8 : bi * 8 + 8] = _ref_idct_block(cf) + 128.0
    assert (out == np.clip(np.round(exp), 0, 255).astype(np.uint8)).all()


def test_progressive_ac_refinement_correction_bits():
    """Band 1..63 at Al=1 makes k=1 significant (coef 2 after shift);
    the Ah=1->Al=0 refinement scan then (a) corrects k=1 by one bit
    (2 -> 3) and (b) introduces a new +-1 at k=2 — exercising the
    sign-bit + buffered-correction-bit path. Pixels via textbook IDCT."""
    dc = _canonical(DC_BITS, DC_VALS)
    ac_bits = [0, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x01, 0x10, 0xF0]
    ac = _canonical(ac_bits, ac_vals)

    wdc = _W()
    c, ln = dc[2]
    wdc.put(c, ln)
    wdc.put(2, 2)  # DC>>1 = 2
    wdcr = _W()
    wdcr.put(0, 1)  # DC bit0 = 0 -> DC 4
    wac1 = _W()
    c, ln = ac[0x01]
    wac1.put(c, ln)
    wac1.put(1, 1)  # k=1: +1 at Al=1 -> coef 2
    c, ln = ac[0x00]  # EOB0
    wac1.put(c, ln)
    wacr = _W()
    c, ln = ac[0x01]  # newly significant, zero-history run 0
    wacr.put(c, ln)
    wacr.put(1, 1)  # sign: positive -> k=2 becomes +1
    wacr.put(1, 1)  # correction bit for k=1 (passed over): 2 -> 3
    c, ln = ac[0x00]  # EOB0 for the rest of the band
    wacr.put(c, ln)
    blob = (
        _gray_prog_headers(8, 8, q00=8)
        + _prog_sos([(1, 0, 0)], 0, 0, 0, 1) + wdc.bytes()
        + _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + _prog_sos([(1, 0, 0)], 1, 63, 0, 1) + wac1.bytes()
        + _prog_sos([(1, 0, 0)], 0, 0, 1, 0) + wdcr.bytes()
        + _prog_sos([(1, 0, 0)], 1, 63, 1, 0) + wacr.bytes()
        + b"\xff\xd9"
    )
    out = decode_jpeg(blob)
    cf = np.zeros((8, 8))
    cf[0, 0] = 4 * 8.0
    cf[0, 1] = 3 * 8.0  # zigzag k=1
    cf[1, 0] = 1 * 8.0  # zigzag k=2 is natural (v=1, u=0)
    exp = np.clip(np.round(_ref_idct_block(cf) + 128.0), 0, 255)
    assert (out == exp.astype(np.uint8)).all()


def test_progressive_restart_resets_dc_prediction():
    """DRI=1 with RST0 between the two blocks of a DC-first scan: the
    second 'diff' is absolute. Same analytic shape as the baseline
    restart test, but through the progressive scan machinery."""
    dc = _canonical(DC_BITS, DC_VALS)
    w1 = _W()
    c, ln = dc[2]
    w1.put(c, ln)
    w1.put(2, 2)  # block 0: DC 2
    w2 = _W()
    c, ln = dc[2]
    w2.put(c, ln)
    w2.put(2, 2)  # block 1: diff 2 from a RESET predictor -> DC 2
    blob = (
        _gray_prog_headers(16, 8, q00=16)
        + _seg(0xDD, struct.pack(">H", 1))
        + _prog_sos([(1, 0, 0)], 0, 0, 0, 0)
        + w1.bytes() + bytes([0xFF, 0xD0]) + w2.bytes()
        + b"\xff\xd9"
    )
    out = decode_jpeg(blob)
    assert (out[:, :8] == 132).all()
    assert (out[:, 8:] == 132).all()  # 136 without the predictor reset


def test_progressive_roundtrip_matches_baseline_exactly():
    """decode(encode_jpeg_progressive(x, q)) == decode(encode_jpeg(x, q))
    pixel-for-pixel: the progressive scan script (spectral selection +
    successive approximation + refinement) must reconstruct the exact
    quantized coefficients of the baseline stream."""
    from scio_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(11)
    shapes = [(8, 8), (17, 23), (16, 16, 3), (9, 13, 3), (24, 40, 3)]
    for shape in shapes:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        for q in (50, 85, 95):
            base = decode_jpeg(encode_jpeg(img, q))
            prog = decode_jpeg(encode_jpeg_progressive(img, q))
            assert base.shape == prog.shape == img.shape
            assert (base == prog).all(), (shape, q)
    y, x = np.mgrid[0:32, 0:48]
    grad = np.dstack([(y * 3 + x) % 256, (x * 5) % 256, (y * 7) % 256])
    grad = grad.astype(np.uint8)
    for q in (30, 75, 90):
        assert (
            decode_jpeg(encode_jpeg(grad, q))
            == decode_jpeg(encode_jpeg_progressive(grad, q))
        ).all()


def test_progressive_corrupt_streams_raise_valueerror():
    from scio_spark.functions.jpeg import encode_jpeg_progressive

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_jpeg_progressive(img, 85)
    with pytest.raises(ValueError):
        decode_jpeg(good[:-8])  # truncated final scan
    # flip a byte inside the first entropy segment
    sos0 = good.index(b"\xff\xda")
    bad = bytearray(good)
    bad[sos0 + 40] ^= 0x5A
    try:
        decode_jpeg(bytes(bad))  # may still decode (lossy) — must not
    except ValueError:
        pass  # ...escape as IndexError/KeyError/struct.error


# ------------------------------------------------- 12-bit (SOF1, Pq=1)


def test_12bit_hand_assembled_dc_only_16bit_dqt():
    """Extended-sequential 12-bit stream assembled by hand: Pq=1 DQT
    with a 16-bit entry (300 — unrepresentable in a baseline 8-bit
    table), one DC-only block. DC diff 2 → dequantized 600 → flat
    600/8 = 75 above the 2048 level shift → every pixel 2123, uint16."""
    q00 = 300
    qtab = bytes([0x10]) + b"".join(
        struct.pack(">H", q00) for _ in range(64)
    )
    sof = struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dc = _canonical(DC_BITS, DC_VALS)
    ac = _canonical(AC_BITS, AC_VALS)
    wtr = _W()
    c, ln = dc[2]
    wtr.put(c, ln)
    wtr.put(2, 2)  # diff = +2
    c, ln = ac[0x00]
    wtr.put(c, ln)  # EOB
    blob = (
        b"\xff\xd8" + _seg(0xDB, qtab) + _seg(0xC1, sof)
        + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos) + wtr.bytes() + b"\xff\xd9"
    )
    out = decode_jpeg(blob)
    assert out.dtype == np.uint16
    assert out.shape == (8, 8)
    assert (out == 2123).all()


def test_12bit_flat_roundtrips_exactly():
    from scio_spark.functions.jpeg import encode_jpeg12

    for v in (0, 1, 1000, 2048, 3000, 4095):
        img = np.full((16, 24), v, np.uint16)
        out = decode_jpeg(encode_jpeg12(img, 95))
        assert out.dtype == np.uint16 and out.shape == (16, 24)
        assert (out == v).all(), v


def test_12bit_roundtrip_error_profile_and_color():
    from scio_spark.functions.jpeg import encode_jpeg12

    y, x = np.mgrid[0:32, 0:40]
    sm = (2048 + 1500 * np.sin(x / 9) + 1200 * np.cos(y / 7)).clip(0, 4095)
    sm = sm.astype(np.uint16)
    prev = None
    for q in (50, 75, 95):
        d = decode_jpeg(encode_jpeg12(sm, q))
        err = float(np.abs(d.astype(int) - sm.astype(int)).mean())
        assert err < 32.0, (q, err)  # 12-bit scale: 32/4096 ≈ 2/256
        if prev is not None:
            assert err <= prev + 0.5
        prev = err
    rgb = np.dstack([sm, sm[::-1], sm[:, ::-1]])
    d = decode_jpeg(encode_jpeg12(rgb, 95))
    assert d.shape == rgb.shape and d.dtype == np.uint16
    assert float(np.abs(d.astype(int) - rgb.astype(int)).mean()) < 32.0


def test_12bit_encoder_input_validation():
    from scio_spark.functions.jpeg import encode_jpeg12

    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg12(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError, match="0..4095"):
        encode_jpeg12(np.full((8, 8), 5000, np.uint16))
    # 8-bit streams still come back uint8 (no dtype regression)
    out = decode_jpeg(encode_jpeg(np.full((8, 8), 77, np.uint8), 90))
    assert out.dtype == np.uint8


# --------------------------------------------------- EXIF orientation


def _with_exif(jpeg_bytes, orientation):
    """Splice a hand-built APP1 Exif segment (TIFF IFD, tag 274) right
    after SOI."""
    tiff = b"II*\x00" + struct.pack("<I", 8)
    tiff += struct.pack("<H", 1)
    tiff += struct.pack("<HHIHH", 274, 3, 1, orientation, 0)
    tiff += struct.pack("<I", 0)
    payload = b"Exif\x00\x00" + tiff
    app1 = struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload
    return jpeg_bytes[:2] + app1 + jpeg_bytes[2:]


def test_exif_orientation_parse_and_apply():
    from scio_spark.functions.jpeg import (
        apply_orientation,
        decode_jpeg_oriented,
        exif_orientation,
    )

    base = np.zeros((8, 16, 3), np.uint8)
    base[0, 0] = 255  # a corner marker
    plain = encode_jpeg(base, 95)
    assert exif_orientation(plain) == 1
    for o in range(1, 9):
        blob = _with_exif(plain, o)
        assert exif_orientation(blob) == o
        got = decode_jpeg_oriented(blob)
        exp = apply_orientation(decode_jpeg(plain), o)
        assert got.shape == exp.shape
        assert (got == exp).all()
    # the transforms themselves, pinned on an asymmetric array
    a = np.arange(6).reshape(2, 3)
    assert apply_orientation(a, 3).tolist() == [[5, 4, 3], [2, 1, 0]]
    assert apply_orientation(a, 6).tolist() == [[3, 0], [4, 1], [5, 2]]
    assert apply_orientation(a, 8).tolist() == [[2, 5], [1, 4], [0, 3]]
    assert apply_orientation(a, 5).tolist() == [[0, 3], [1, 4], [2, 5]]
    # malformed APP1 payloads degrade to orientation 1
    broken = _with_exif(plain, 6)
    broken = broken.replace(b"II*\x00", b"XX*\x00")
    assert exif_orientation(broken) == 1
    assert exif_orientation(b"\xff\xd8\xff\xd9") == 1
