"""TIFF codec — pure Python/numpy over the public TIFF 6.0 spec.

Decoder: both byte orders (II/MM), strip-based baseline images —
uncompressed, PackBits (RLE), and LZW (the TIFF variant: MSB-first
variable-width codes with the spec's early-change width bump) — with
the horizontal-differencing predictor (tag 317), grayscale (including
WhiteIsZero inversion), RGB/RGBA, palette-color, 8- and 16-bit
samples, multi-strip layouts. Encoder: spec-valid uncompressed /
PackBits / LZW chunky output for gray and RGB (used by the roundtrip
tests and format-preserving re-encode).

Verification (tests/test_tiff.py): hand-assembled IFDs and LZW/PackBits
streams with hand-derived codes (independent of the encoder), exact
roundtrips across layouts, predictor algebra pinned analytically,
corrupt-input ValueError containment.

Parity note: the reference engine has no image codecs (binaryFile is
its multimodal floor — scio-core io/BinaryIO); this module extends the
training-data multimodal tier like functions/codecs.py.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(blob: bytes, off: int, bo: str) -> dict[int, list[int]]:
    if off + 2 > len(blob):
        raise ValueError("TIFF: truncated IFD")
    (n,) = struct.unpack_from(bo + "H", blob, off)
    entries: dict[int, list[int]] = {}
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(blob):
            raise ValueError("TIFF: truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", blob, e)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown field type: spec says skip
        total = size * cnt
        voff = e + 8 if total <= 4 else struct.unpack_from(bo + "I", blob, e + 8)[0]
        if voff + total > len(blob):
            raise ValueError("TIFF: value offset out of range")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}.get(typ)
        if typ == 5:  # RATIONAL: keep numerators (unused fields anyway)
            vals = [
                struct.unpack_from(bo + "II", blob, voff + 8 * i)[0]
                for i in range(cnt)
            ]
        else:
            vals = list(struct.unpack_from(bo + fmt * cnt, blob, voff))
        entries[tag] = vals
    return entries


def _lzw_decode_tiff(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW: MSB-first variable-width codes, Clear=256,
    EOI=257, width bumps one code EARLY (at next_code 510/1022/2046 per
    the spec's off-by-one)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = bits = 0
    pos = 0
    n = len(data)
    while True:
        while bits < width:
            if pos >= n:
                return bytes(out)  # missing EOI: tolerate (common)
            acc = (acc << 8) | data[pos]
            pos += 1
            bits += 8
        code = (acc >> (bits - width)) & ((1 << width) - 1)
        bits -= width
        if code == 256:  # Clear
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            return bytes(out)
        if prev is None:
            if code > 255:
                raise ValueError("TIFF LZW: first code after clear invalid")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW: code out of range")
        out += entry
        if len(out) > max_out:
            raise ValueError("TIFF LZW: output exceeds strip size")
        prev = entry
        # early change, from the READER side: the writer bumped after
        # ADDING entry (1<<width)-2, and the reader trails the writer's
        # table by one entry — so bump when the next free code reaches
        # (1<<width)-2, two shy of the natural boundary.
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (MSB-first, early change) — inverse of
    _lzw_decode_tiff; emits Clear up front and on table overflow."""
    out = bytearray()
    acc = bits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)  # Clear
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        put(table[w], width)
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1  # early change (mirrors the decoder)
        elif next_code >= 4094:
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        put(table[w], width)
    put(257, width)  # EOI
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("TIFF PackBits: truncated repeat")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op per spec
        if len(out) > max_out:
            raise ValueError("TIFF PackBits: output exceeds strip size")
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
        ):
            i += 1
        out.append(i - lit - 1)
        out += data[lit:i]
    return bytes(out)


def decode_tiff(blob: bytes) -> np.ndarray:
    """TIFF → uint8/uint16 (h, w) gray or (h, w, 3|4) color. First IFD
    only (multi-page files decode their first image, like most
    single-image consumers). Raises ValueError (only) on corrupt or
    unsupported streams."""
    try:
        return _decode_tiff(blob)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"corrupt TIFF stream: {e!r}") from e


def _decode_tiff(blob: bytes) -> np.ndarray:
    if blob[:4] == b"II*\x00":
        bo = "<"
    elif blob[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order/magic header)")
    (ifd_off,) = struct.unpack_from(bo + "I", blob, 4)
    tags = _read_ifd(blob, ifd_off, bo)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    spp = one(277, 1)
    bits_list = tags.get(258, [8] * spp)
    if len(set(bits_list)) != 1 or bits_list[0] not in (8, 16):
        raise ValueError(f"TIFF: unsupported BitsPerSample {bits_list}")
    depth = bits_list[0]
    comp = one(259, 1)
    photo = one(262, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    if planar != 1:
        raise ValueError("TIFF: planar (non-chunky) layout unsupported")
    if w == 0 or h == 0:
        raise ValueError("TIFF: empty image")
    if h * w * spp > 1 << 29:  # hostile header: don't allocate TBs on a
        raise ValueError(  # 30-byte blob — contained per-asset error
            f"TIFF: implausible dimensions {w}x{h}x{spp}"
        )
    bps = depth // 8
    out_dt = np.uint8 if depth == 8 else np.uint16
    dt = np.uint8 if depth == 8 else np.dtype(bo + "u2")
    if predictor not in (1, 2):
        raise ValueError(f"TIFF: predictor {predictor} unsupported")

    def decompress(chunk: bytes, want: int) -> bytes:
        if comp == 1:
            return chunk[:want]
        if comp == 5:
            return _lzw_decode_tiff(chunk, want)
        if comp == 32773:
            return _packbits_decode(chunk, want)
        raise ValueError(
            f"TIFF: compression {comp} unsupported "
            "(none/LZW/PackBits are built in)"
        )

    def undiff(a: np.ndarray) -> np.ndarray:
        # horizontal differencing per channel: integrate along the row
        a = np.cumsum(a.astype(np.int64), axis=1)
        return (a & ((1 << depth) - 1)).astype(out_dt)

    if 322 in tags:  # tiled layout (TileWidth/TileLength/Offsets/Counts)
        tw, tl = one(322), one(323)
        offs = tags.get(324)
        counts = tags.get(325)
        if not tw or not tl or not offs or not counts:
            raise ValueError("TIFF: tiled image missing tile tags")
        tiles_x = -(-w // tw)
        tiles_y = -(-h // tl)
        if len(offs) < tiles_x * tiles_y or len(counts) < len(offs):
            raise ValueError("TIFF: tile count mismatch")
        tile_bytes = tl * tw * spp * bps
        arr = np.zeros((h, w, spp), out_dt)
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                ti = ty * tiles_x + tx
                off, cnt = offs[ti], counts[ti]
                if off + cnt > len(blob):
                    raise ValueError("TIFF: tile out of range")
                raw = decompress(blob[off : off + cnt], tile_bytes)
                if len(raw) < tile_bytes:
                    raise ValueError("TIFF: tile shorter than declared")
                tile = np.frombuffer(raw[:tile_bytes], dt).reshape(
                    tl, tw, spp
                ).astype(out_dt)
                if predictor == 2:
                    # differencing restarts per TILE row, so integrate
                    # before cropping edge tiles into place
                    tile = undiff(tile)
                y0, x0 = ty * tl, tx * tw
                ch = min(tl, h - y0)
                cw = min(tw, w - x0)
                arr[y0 : y0 + ch, x0 : x0 + cw] = tile[:ch, :cw]
    else:
        offs = tags.get(273)
        counts = tags.get(279)
        if not offs or not counts or len(offs) != len(counts):
            raise ValueError("TIFF: missing strip offsets/byte counts")
        rps = one(278, h)
        row_bytes = w * spp * bps
        raws: list[bytes] = []
        rows_left = h
        for off, cnt in zip(offs, counts):
            if off + cnt > len(blob):
                raise ValueError("TIFF: strip out of range")
            strip_rows = min(rps, rows_left)
            rows_left -= strip_rows
            want = strip_rows * row_bytes
            raw = decompress(blob[off : off + cnt], want)
            if len(raw) < want:
                raise ValueError("TIFF: strip shorter than declared rows")
            raws.append(raw[:want])
        arr = np.frombuffer(b"".join(raws), dt).reshape(h, w, spp).astype(
            out_dt
        )
        if predictor == 2:
            arr = undiff(arr)

    if photo == 3:  # palette-color: ColorMap has 3*2^depth SHORTs
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * (1 << depth):
            raise ValueError("TIFF: palette image missing/invalid ColorMap")
        lut = (np.array(cmap, np.uint32).reshape(3, -1).T // 257).astype(
            np.uint8
        )
        return lut[arr[:, :, 0]]
    if photo == 0:  # WhiteIsZero: invert
        arr = ((1 << depth) - 1) - arr.astype(np.int64)
        arr = arr.astype(np.uint8 if depth == 8 else np.uint16)
    if spp == 1:
        return arr[:, :, 0]
    if spp in (3, 4):
        return arr
    raise ValueError(f"TIFF: unsupported SamplesPerPixel {spp}")


def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    rows_per_strip: int = 0,
    predictor: bool = False,
) -> bytes:
    """uint8/uint16 (h, w) gray or (h, w, 3) RGB → little-endian TIFF
    ('none' | 'packbits' | 'lzw'; optional horizontal predictor with
    LZW). Deterministic output for retried tasks."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint16:
        depth = 16
    else:
        arr = arr.astype(np.uint8)
        depth = 8
    if arr.ndim == 2:
        spp = 1
        photo = 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        spp = 3
        photo = 2
    else:
        raise ValueError(f"encode_tiff: need (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_tiff: empty image")
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_id is None:
        raise ValueError(f"encode_tiff: unknown compression {compression!r}")
    if predictor and comp_id != 5:
        raise ValueError("encode_tiff: predictor is an LZW option")
    rps = rows_per_strip or h

    px = arr.reshape(h, w, spp)
    if predictor:
        d = px.astype(np.int64)
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        px = (d & ((1 << depth) - 1)).astype(
            np.uint8 if depth == 8 else np.uint16
        )
    if depth == 16:
        body = px.astype("<u2").tobytes()
    else:
        body = px.tobytes()
    row_bytes = w * spp * (depth // 8)
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        chunk = body[y0 * row_bytes : min(y0 + rps, h) * row_bytes]
        if comp_id == 5:
            strips.append(_lzw_encode_tiff(chunk))
        elif comp_id == 32773:
            strips.append(_packbits_encode(chunk))
        else:
            strips.append(chunk)

    n_strips = len(strips)
    entries = []  # (tag, type, count, value_or_bytes)

    def short(tag, *vals):
        entries.append((tag, 3, len(vals), list(vals)))

    def long(tag, *vals):
        entries.append((tag, 4, len(vals), list(vals)))

    short(256, w) if w < 65536 else long(256, w)
    short(257, h) if h < 65536 else long(257, h)
    short(258, *([depth] * spp))
    short(259, comp_id)
    short(262, photo)
    long(273, *([0] * n_strips))  # patched below
    short(277, spp)
    short(278, min(rps, 65535)) if rps < 65536 else long(278, rps)
    long(279, *[len(s) for s in strips])
    if predictor:
        short(317, 2)

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n)
    tail = bytearray()
    fmt = {3: "H", 4: "I"}
    strip_dir_pos = None
    for tag, typ, cnt, vals in entries:
        out += struct.pack("<HHI", tag, typ, cnt)
        total = _TYPE_SIZE[typ] * cnt
        if tag == 273:
            strip_dir_pos = (len(out), total > 4, data_off + len(tail))
        if total <= 4:
            packed = struct.pack("<" + fmt[typ] * cnt, *vals)
            out += packed + b"\x00" * (4 - total)
        else:
            out += struct.pack("<I", data_off + len(tail))
            tail += struct.pack("<" + fmt[typ] * cnt, *vals)
            if len(tail) & 1:
                tail += b"\x00"
    out += struct.pack("<I", 0)  # next IFD
    # strip payloads follow the value tail; patch StripOffsets
    strip_base = data_off + len(tail)
    offsets = []
    pos = strip_base
    for s in strips:
        offsets.append(pos)
        pos += len(s) + (len(s) & 1)
    at, indirect, tail_at = strip_dir_pos
    if indirect:
        rel = tail_at - data_off
        tail[rel : rel + 4 * n_strips] = struct.pack(
            "<" + "I" * n_strips, *offsets
        )
    else:
        out[at : at + 4] = struct.pack("<I", offsets[0]) + b""
    out += tail
    for s in strips:
        out += s + (b"\x00" if len(s) & 1 else b"")
    return bytes(out)
