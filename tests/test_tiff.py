"""TIFF codec tests (functions/tiff.py).

Hand-assembled IFDs and compression streams pin the decoder
independently of the encoder: the LZW vector's variable-width codes are
derived by hand below, PackBits runs come straight from the spec's
examples, and the predictor algebra is checked analytically. Roundtrips
then cover every encoder/decoder pairing across layouts and depths."""

import struct

import numpy as np
import pytest

from scio_spark.functions.tiff import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


class _MSB:
    """Test-local MSB-first bit packer for hand-building LZW streams."""

    def __init__(self):
        self.bits = []

    def put(self, code, width):
        self.bits += [(code >> (width - 1 - i)) & 1 for i in range(width)]

    def bytes(self):
        bs = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            int("".join(map(str, bs[i : i + 8])), 2)
            for i in range(0, len(bs), 8)
        )


def test_lzw_hand_derived_vector():
    """Input bytes 7 7 7 8: the encoder emits Clear(256), literal 7,
    then '77' is in the table (code 258) after the first add, so the
    sequence is 7, 258('77'), 8, EOI — all at 9 bits. Decoding must
    rebuild the same table on the fly (the code-equals-next-entry case
    included)."""
    w = _MSB()
    for code in (256, 7, 258, 8, 257):
        w.put(code, 9)
    assert _lzw_decode_tiff(w.bytes(), 64) == bytes([7, 7, 7, 8])
    # code == len(table): 'abab...' pattern forces the KwKwK case
    w = _MSB()
    for code in (256, 97, 98, 258, 260, 257):
        w.put(code, 9)
    # 258='ab' added after (97,98); 260 == next entry -> prev+prev[0]
    assert _lzw_decode_tiff(w.bytes(), 64) == b"ababababa"[:7]


def test_lzw_roundtrip_and_width_growth():
    rng = np.random.RandomState(3)
    for data in (
        bytes(range(256)) * 8,  # forces width growth past 9 bits
        rng.randint(0, 4, 9000, dtype=np.uint8).tobytes(),  # long runs
        b"",
        b"\x00" * 5000,
    ):
        enc = _lzw_encode_tiff(data)
        assert _lzw_decode_tiff(enc, len(data) + 1) == data
    big = rng.randint(0, 256, 60000, dtype=np.uint8).tobytes()
    assert _lzw_decode_tiff(_lzw_encode_tiff(big), len(big) + 1) == big


def test_packbits_spec_vector_and_roundtrip():
    # the TIFF 6.0 spec's own PackBits example
    enc = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80, 0x00,
         0x2A, 0x22, 0xF7, 0xAA]
    )
    dec = _packbits_decode(enc, 64)
    assert dec == bytes(
        [0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4
        + [0x80, 0x00, 0x2A, 0x22] + [0xAA] * 10
    )
    rng = np.random.RandomState(5)
    for data in (b"", b"\x07" * 300, rng.randint(0, 9, 4000, np.uint8).tobytes()):
        assert _packbits_decode(_packbits_encode(data), len(data) + 1) == data


def _ifd(entries, data_off=None):
    """Hand-build a little-endian TIFF from (tag, type, values) plus a
    raw payload placed after the IFD."""
    raise NotImplementedError  # built inline where needed


def test_hand_assembled_gray_uncompressed():
    """Minimal II TIFF written field-by-field: 3x2 gray, one strip."""
    px = bytes([10, 20, 30, 40, 50, 60])
    entries = [
        (256, 3, 1, 3), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, None), (277, 3, 1, 1),
        (278, 3, 1, 2), (279, 4, 1, len(px)),
    ]
    n = len(entries)
    ifd_off = 8
    strip_off = ifd_off + 2 + 12 * n + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n)
    for tag, typ, cnt, val in entries:
        if val is None:
            val = strip_off
        out += struct.pack("<HHI", tag, typ, cnt)
        out += struct.pack("<I", val) if typ == 4 else struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    out += px
    arr = decode_tiff(bytes(out))
    assert arr.shape == (2, 3) and arr.dtype == np.uint8
    assert arr.tolist() == [[10, 20, 30], [40, 50, 60]]
    # big-endian variant of the same image
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off))
    out += struct.pack(">H", n)
    for tag, typ, cnt, val in entries:
        if val is None:
            val = strip_off
        out += struct.pack(">HHI", tag, typ, cnt)
        out += struct.pack(">I", val) if typ == 4 else struct.pack(">HH", val, 0)
    out += struct.pack(">I", 0)
    out += px
    assert decode_tiff(bytes(out)).tolist() == [[10, 20, 30], [40, 50, 60]]


def test_roundtrips_all_compressions_and_layouts():
    rng = np.random.RandomState(7)
    y, x = np.mgrid[0:21, 0:17]
    gray8 = ((x * 7 + y * 3) % 256).astype(np.uint8)
    rgb8 = np.dstack([gray8, gray8[::-1], (x % 256).astype(np.uint8)])
    gray16 = ((x * 700 + y * 301) % 65536).astype(np.uint16)
    rgb16 = np.dstack([gray16, gray16[::-1], gray16 % 4096]).astype(np.uint16)
    noise = rng.randint(0, 256, (15, 9, 3), dtype=np.uint8)
    for img in (gray8, rgb8, gray16, rgb16, noise):
        for comp in ("none", "packbits", "lzw"):
            for rps in (0, 4):
                back = decode_tiff(
                    encode_tiff(img, compression=comp, rows_per_strip=rps)
                )
                assert back.dtype == img.dtype
                assert (back == img).all(), (img.shape, comp, rps)
        back = decode_tiff(
            encode_tiff(img, compression="lzw", predictor=True, rows_per_strip=6)
        )
        assert (back == img).all(), ("predictor", img.shape)


def test_predictor_analytic():
    """Horizontal differencing: stored row (5, 3, 3, 3) integrates to
    (5, 8, 11, 14); with RGB the difference is per-channel."""
    img = np.array([[5, 8, 11, 14]], np.uint8)
    blob = encode_tiff(img, compression="lzw", predictor=True)
    # the LZW payload must encode the DIFFERENCED row
    from scio_spark.functions.tiff import _read_ifd

    tags = _read_ifd(blob, 8, "<")
    off, cnt = tags[273][0], tags[279][0]
    raw = _lzw_decode_tiff(blob[off : off + cnt], 16)
    assert list(raw) == [5, 3, 3, 3]
    assert decode_tiff(blob).tolist() == [[5, 8, 11, 14]]


def test_photometric_whitezero_and_palette():
    # WhiteIsZero: invert the stored values
    base = encode_tiff(np.array([[0, 255]], np.uint8))
    # patch PhotometricInterpretation (tag 262) from 1 to 0
    i = base.index(struct.pack("<HHI", 262, 3, 1))
    patched = base[: i + 8] + struct.pack("<HH", 0, 0) + base[i + 12 :]
    assert decode_tiff(patched).tolist() == [[255, 0]]
    # palette-color: hand-build with a ColorMap (3 * 256 SHORTs)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    cmap = np.zeros((3, 256), np.uint16)
    cmap[0, 0], cmap[1, 1], cmap[2, 2] = 65535, 32896, 257  # R,G,B picks
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, None), (277, 3, 1, 1),
        (278, 3, 1, 2), (279, 4, 1, 4), (320, 3, 768, "cmap"),
    ]
    n = len(entries)
    ifd_off = 8
    cmap_off = ifd_off + 2 + 12 * n + 4
    strip_off = cmap_off + 768 * 2
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n)
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt)
        if val == "cmap":
            out += struct.pack("<I", cmap_off)
        elif val is None:
            out += struct.pack("<I", strip_off)
        elif typ == 4:
            out += struct.pack("<I", val)
        else:
            out += struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    out += cmap.astype("<u2").tobytes()
    out += idx.tobytes()
    arr = decode_tiff(bytes(out))
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]  # 65535 // 257
    assert arr[0, 1].tolist() == [0, 128, 0]  # 32896 // 257
    assert arr[1, 0].tolist() == [0, 0, 1]  # 257 // 257


def test_corrupt_tiffs_raise_valueerror_only():
    good = encode_tiff(np.zeros((4, 4), np.uint8), compression="lzw")
    with pytest.raises(ValueError):
        decode_tiff(b"not a tiff at all")
    with pytest.raises(ValueError):
        decode_tiff(good[:20])  # truncated IFD
    for cut in (len(good) - 2, len(good) - 6):
        try:
            decode_tiff(good[:cut])
        except ValueError:
            pass
    # unsupported compression id
    i = good.index(struct.pack("<HHI", 259, 3, 1))
    bad = good[: i + 8] + struct.pack("<HH", 7, 0) + good[i + 12 :]  # JPEG-in-TIFF
    with pytest.raises(ValueError, match="compression 7"):
        decode_tiff(bad)


def test_sniff_and_image_features_route_tiff(spark):
    from scio_spark.functions.codecs import image_features, sniff

    img = np.dstack([np.full((9, 7), v, np.uint8) for v in (10, 90, 200)])
    blob = encode_tiff(img, compression="lzw")
    assert sniff(blob) == "tiff"
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "asset_id long, content binary"
    )
    f = image_features(df).head()
    assert f.decoder == "tiff"
    assert (f.width, f.height, f.channels) == (7, 9, 3)
    assert f.mean_intensity == pytest.approx(100.0)


def _tiled_tiff(img, tw, tl, comp_id=1, predictor=False):
    """Hand-build a tiled little-endian TIFF (tags 322-325)."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    px = img.reshape(h, w, spp)
    tiles = []
    for y0 in range(0, h, tl):
        for x0 in range(0, w, tw):
            tile = np.zeros((tl, tw, spp), px.dtype)
            ch, cw = min(tl, h - y0), min(tw, w - x0)
            tile[:ch, :cw] = px[y0 : y0 + ch, x0 : x0 + cw]
            if predictor:
                d = tile.astype(np.int64)
                d[:, 1:, :] -= tile.astype(np.int64)[:, :-1, :]
                tile = (d & 0xFF).astype(np.uint8)
            raw = tile.tobytes()
            if comp_id == 5:
                raw = _lzw_encode_tiff(raw)
            elif comp_id == 32773:
                raw = _packbits_encode(raw)
            tiles.append(raw)
    entries = [
        (256, 3, 1, [w]), (257, 3, 1, [h]), (258, 3, spp, [8] * spp),
        (259, 3, 1, [comp_id]), (262, 3, 1, [2 if spp == 3 else 1]),
        (277, 3, 1, [spp]), (322, 3, 1, [tw]), (323, 3, 1, [tl]),
        (324, 4, len(tiles), None), (325, 4, len(tiles), [len(t) for t in tiles]),
    ]
    if predictor:
        entries.append((317, 3, 1, [2]))
        entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n)
    tail = bytearray()
    patch_at = None
    for tag, typ, cnt, vals in entries:
        out += struct.pack("<HHI", tag, typ, cnt)
        fmt = "H" if typ == 3 else "I"
        size = (2 if typ == 3 else 4) * cnt
        if vals is None:  # tile offsets, patched below
            patch_at = (len(out), size > 4, len(tail))
            vals = [0] * cnt
        if size <= 4:
            out += struct.pack("<" + fmt * cnt, *vals).ljust(4, b"\x00")
        else:
            out += struct.pack("<I", data_off + len(tail))
            tail += struct.pack("<" + fmt * cnt, *vals)
    out += struct.pack("<I", 0)
    tile_base = data_off + len(tail)
    offsets, pos = [], tile_base
    for t in tiles:
        offsets.append(pos)
        pos += len(t)
    at, indirect, tail_pos = patch_at
    if indirect:
        tail[tail_pos : tail_pos + 4 * len(tiles)] = struct.pack(
            "<" + "I" * len(tiles), *offsets
        )
    else:
        out[at : at + 4] = struct.pack("<I", offsets[0])
    out += tail
    for t in tiles:
        out += t
    return bytes(out)


def test_tiled_tiff_all_compressions_and_edge_crop():
    """Tiled layout (tags 322-325): tiles raster across then down, edge
    tiles are full-size and cropped; with the predictor, differencing
    restarts per TILE row (not per image row) — a multi-tile-wide image
    catches an implementation that integrates across tile seams."""
    y, x = np.mgrid[0:10, 0:13]
    img = np.dstack(
        [(y * 11 + x * 3) % 256, (x * 7) % 256, (y * 5) % 256]
    ).astype(np.uint8)
    for comp_id in (1, 5, 32773):
        blob = _tiled_tiff(img, tw=6, tl=4, comp_id=comp_id)
        assert (decode_tiff(blob) == img).all(), comp_id
    blob = _tiled_tiff(img, tw=6, tl=4, comp_id=5, predictor=True)
    assert (decode_tiff(blob) == img).all()
    gray = ((y * 11 + x * 3) % 256).astype(np.uint8)
    assert (decode_tiff(_tiled_tiff(gray, 5, 3, 5)) == gray).all()


def test_hostile_dimensions_raise_not_allocate():
    """A 30-byte blob whose header claims 65535x65535x3 must raise
    ValueError, not attempt a multi-TB allocation."""
    import struct as _s

    out = bytearray(b"II*\x00" + _s.pack("<I", 8))
    entries = [(256, 3, 1, 65535), (257, 3, 1, 65535), (277, 3, 1, 3)]
    out += _s.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += _s.pack("<HHI", tag, typ, cnt) + _s.pack("<HH", val, 0)
    out += _s.pack("<I", 0)
    with pytest.raises(ValueError, match="implausible"):
        decode_tiff(bytes(out))
