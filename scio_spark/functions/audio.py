"""Compressed-audio codecs — pure Python/numpy, no media libraries.

The reference engine treats audio as opaque binary (its multimodal floor
is ``binaryFileIO``; see SURVEY.md §2.7) — decode is where this repo goes
beyond it for training-data curation. multimodal.py's import gate is only
needed for formats that genuinely require a native library; the telephony
and lossless tiers are pure arithmetic and get real implementations here:

- **G.711 μ-law / A-law** (WAV format tags 7 / 6): the CCITT segmented
  companding curves, implemented VECTORIZED (segment lookup via
  searchsorted, no per-sample Python). Tests pin both directions against
  CPython's ``audioop`` (an independent C implementation of the same
  spec) over the full 16-bit input range and all 256 code points.
- **IMA/DVI ADPCM** (WAV format tag 0x11): 4-bit adaptive delta PCM with
  the standard 89-entry step table, including the WAV block layout
  (per-channel block headers carrying predictor + step index, low-nibble
  first, stereo interleaved in 4-byte groups). The nibble core is pinned
  against ``audioop``'s Intel/DVI codec; the block framing is round-trip
  and layout tested. Encode/decode is a per-sample recurrence (the
  predictor feeds back), so it runs as a Python loop — it parallelizes
  per asset across mapInPandas tasks like the JPEG entropy decoder.

- **MP3 frame probe** (``probe_mp3``): the curation-pipeline slice of
  MPEG audio — ID3v2 skip, per-frame header walk (ISO 11172-3 frame
  length arithmetic, all versions/layers), Xing/Info VBR frame counts —
  yielding sample rate / bitrate / channels / duration without sample
  decode (the polyphase filterbank needs a media library and stays
  import-gated in multimodal.py).

``decode_wav`` in functions/codecs.py routes format tags 1 (8/16/24/32-bit
PCM), 3 (float32), 6, 7, and 0x11 here; everything decodes to int16.
FLAC (lossless, full decode) lives in functions/flac.py.

Scale: all entry points are plain bytes→ndarray functions so they drop
into the existing mapInPandas feature extractors — no new shuffle, no
driver involvement, corrupt payloads raise ValueError only.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- G.711 μ-law

_BIAS = 0x84  # 132
_ULAW_CLIP14 = 8159  # clip after the >>2 shift to 14-bit magnitude
_SEG_U = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], np.int64
)
_SEG_A = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], np.int64
)


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 → G.711 μ-law codes (uint8), vectorized CCITT algorithm:
    shift to 14-bit, bias by 33, find the segment, take the 4-bit
    mantissa, complement. Bit-exact vs audioop.lin2ulaw on all 65536
    inputs (pinned in tests)."""
    v = np.asarray(samples, np.int64) >> 2
    mask = np.where(v < 0, 0x7F, 0xFF)
    v = np.where(v < 0, -v, v)
    v = np.minimum(v, _ULAW_CLIP14) + (_BIAS >> 2)
    seg = np.searchsorted(_SEG_U, v, side="left")
    uval = (seg << 4) | ((v >> (seg + 1)) & 0xF)
    return (np.where(seg >= 8, 0x7F, uval) ^ mask).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """G.711 μ-law codes → int16, vectorized: magnitude is
    ((mantissa<<3)+BIAS)<<segment minus BIAS. Bit-exact vs
    audioop.ulaw2lin for all 256 codes."""
    c = (~np.asarray(codes, np.int64)) & 0xFF
    sign = c & 0x80
    e = (c >> 4) & 7
    m = c & 0x0F
    mag = (((m << 3) + _BIAS) << e) - _BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 → G.711 A-law codes (uint8): shift to 13-bit (ones'
    complement for negatives), segment lookup, XOR 0x55 bit inversion.
    Bit-exact vs audioop.lin2alaw on all 65536 inputs."""
    v = np.asarray(samples, np.int64) >> 3
    mask = np.where(v >= 0, 0xD5, 0x55)
    v = np.where(v >= 0, v, -v - 1)
    seg = np.searchsorted(_SEG_A, v, side="left")
    segc = np.minimum(seg, 7)
    aval = (segc << 4) | (np.where(segc < 2, v >> 1, v >> segc) & 0xF)
    return (np.where(seg >= 8, 0x7F, aval) ^ mask).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law codes → int16. Bit-exact vs audioop.alaw2lin for all
    256 codes."""
    c = np.asarray(codes, np.int64) ^ 0x55
    sign = c & 0x80
    e = (c >> 4) & 7
    m = c & 0x0F
    mag = np.where(e == 0, (m << 4) + 8, ((m << 4) + 0x108) << np.maximum(e - 1, 0))
    return np.where(sign, mag, -mag).astype(np.int16)


# --------------------------------------------------------- IMA/DVI ADPCM

_IMA_STEP = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    np.int64,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int64)


def ima_nibbles_decode(
    nibbles, pred: int, index: int
) -> tuple[list[int], int, int]:
    """Decode a sequence of 4-bit IMA ADPCM codes given the running
    (predictor, step index) state; returns (samples, pred, index).
    Matches audioop.adpcm2lin bit-for-bit (pinned in tests)."""
    out = []
    step_tab, idx_tab = _IMA_STEP, _IMA_INDEX
    for nib in nibbles:
        step = int(step_tab[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        index = max(0, min(88, index + int(idx_tab[nib & 7])))
        out.append(pred)
    return out, pred, index


def ima_nibbles_encode(
    samples, pred: int, index: int
) -> tuple[list[int], int, int]:
    """Encode int16 samples to 4-bit IMA ADPCM codes; the encoder tracks
    the decoder's reconstruction so the state never drifts. Matches
    audioop.lin2adpcm bit-for-bit."""
    nibs = []
    step_tab, idx_tab = _IMA_STEP, _IMA_INDEX
    for s in samples:
        step = int(step_tab[index])
        diff = int(s) - pred
        nib = 8 if diff < 0 else 0
        if diff < 0:
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        d = step >> 3
        if nib & 1:
            d += step >> 2
        if nib & 2:
            d += step >> 1
        if nib & 4:
            d += step
        if nib & 8:
            d = -d
        pred = max(-32768, min(32767, pred + d))
        index = max(0, min(88, index + int(idx_tab[nib & 7])))
        nibs.append(nib)
    return nibs, pred, index


def adpcm_wav_decode(
    data: bytes, channels: int, block_align: int
) -> np.ndarray:
    """WAV format-0x11 'data' chunk bytes → int16 (frames, channels).
    Each block starts with a 4-byte header per channel (int16 predictor
    = the block's first output sample, uint8 step index, reserved);
    payload nibbles are low-first, stereo interleaved in 4-byte groups
    per channel.

    Blocks are decoded VECTORIZED: the per-sample recurrence is
    unavoidable (the predictor feeds back), but every block carries its
    own starting state in its header, so the loop runs once over the
    samples-per-block axis with all (block, channel) lanes advancing as
    numpy vectors — samples_per_block iterations total instead of
    samples_per_block x n_blocks (the nibble core ima_nibbles_decode
    stays as the audioop-pinned scalar reference)."""
    if channels not in (1, 2):
        raise ValueError(f"IMA ADPCM: unsupported channel count {channels}")
    if block_align < 4 * channels:
        raise ValueError("IMA ADPCM: block_align smaller than headers")
    nblocks = len(data) // block_align
    if nblocks == 0:
        if len(data) >= 4 * channels:
            nblocks = 0  # fall through to the short-tail path below
        else:
            return np.zeros((0, channels), np.int16)
    blocks = np.frombuffer(
        data[: nblocks * block_align], np.uint8
    ).reshape(nblocks, block_align)
    tail = data[nblocks * block_align :]

    # headers: per channel (int16 LE predictor, uint8 index, reserved)
    hdr = blocks[:, : 4 * channels].reshape(nblocks, channels, 4)
    preds = (
        hdr[:, :, 0].astype(np.int64) | (hdr[:, :, 1].astype(np.int64) << 8)
    )
    preds = np.where(preds >= 1 << 15, preds - (1 << 16), preds)
    idxs = hdr[:, :, 2].astype(np.int64)
    if (idxs > 88).any():
        raise ValueError("IMA ADPCM: step index out of range")

    payload = blocks[:, 4 * channels :]
    nib_lo = payload & 0x0F
    nib_hi = payload >> 4
    if channels == 1:
        # (nblocks, n_payload_bytes * 2) low-first
        nibs = np.stack([nib_lo, nib_hi], axis=2).reshape(nblocks, -1)
        nibs = nibs[:, :, None]  # (nblocks, spb-1, 1)
    else:
        nbytes = payload.shape[1] - payload.shape[1] % 8
        lo = nib_lo[:, :nbytes].reshape(nblocks, -1, 2, 4)
        hi = nib_hi[:, :nbytes].reshape(nblocks, -1, 2, 4)
        # byte k of a 4-byte group holds nibbles (2k, 2k+1) low-first
        grp = np.stack([lo, hi], axis=4).reshape(nblocks, -1, 2, 8)
        nibs = grp.transpose(0, 1, 3, 2).reshape(nblocks, -1, 2)

    n_per = nibs.shape[1]
    out = np.empty((nblocks, n_per + 1, channels), np.int64)
    out[:, 0, :] = preds
    pred = preds.copy()
    index = idxs.copy()
    nibs = nibs.astype(np.int64)
    for j in range(n_per):
        nib = nibs[:, j, :]
        step = _IMA_STEP[index]
        diff = (
            (step >> 3)
            + (nib & 1) * (step >> 2)
            + ((nib >> 1) & 1) * (step >> 1)
            + ((nib >> 2) & 1) * step
        )
        diff = np.where(nib & 8, -diff, diff)
        pred = np.clip(pred + diff, -32768, 32767)
        index = np.clip(index + _IMA_INDEX[nib & 7], 0, 88)
        out[:, j + 1, :] = pred
    chans = [out[:, :, c].reshape(-1).astype(np.int16) for c in range(channels)]

    # short tail (a final partial block): scalar path, mono layout only
    if len(tail) >= 4 * channels and channels == 1:
        p, i, _ = struct.unpack_from("<hBB", tail, 0)
        if i > 88:
            raise ValueError("IMA ADPCM: step index out of range")
        tnibs = []
        for b in tail[4:]:
            tnibs.append(b & 0x0F)
            tnibs.append(b >> 4)
        dec, _, _ = ima_nibbles_decode(tnibs, p, i)
        chans[0] = np.concatenate(
            [chans[0], np.array([p] + dec, np.int16)]
        )
    n = min(c.size for c in chans)
    return np.stack([c[:n] for c in chans], axis=1)


def adpcm_wav_encode(
    samples: np.ndarray, samples_per_block: int = 505
) -> tuple[bytes, int]:
    """int16 (frames,) or (frames, channels) → WAV format-0x11 'data'
    bytes. Returns (data, block_align). samples_per_block must be odd
    for mono (the header carries sample 0; the rest pack two per byte)
    and 1 mod 8 for stereo (4-byte channel groups); 505 satisfies both
    and is the common choice for 2041/2048-byte mono/stereo blocks.

    Encodes VECTORIZED, mirroring adpcm_wav_decode: every block's
    4-byte header carries its full starting state (predictor = first
    sample, step index = 0), so blocks are independent and the
    per-sample feedback loop runs once over the samples-per-block axis
    with all (block, channel) lanes as numpy vectors. Seeding the step
    index at 0 per block (instead of carrying it across blocks) costs
    a few coarse steps of adaptation per 505-sample block — inaudible
    — and is what makes the ~20x lane-parallel encode possible; any
    spec decoder honours the header state (ours does, pinned in
    tests). The nibble core ima_nibbles_encode stays as the
    audioop-pinned scalar reference."""
    arr = np.asarray(samples, np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    if channels not in (1, 2):
        raise ValueError(f"IMA ADPCM: unsupported channel count {channels}")
    spb = samples_per_block
    if channels == 1:
        if (spb - 1) % 2:
            raise ValueError("mono IMA ADPCM needs an odd samples_per_block")
        block_align = 4 + (spb - 1) // 2
    else:
        if (spb - 1) % 8:
            raise ValueError(
                "stereo IMA ADPCM needs samples_per_block ≡ 1 (mod 8)"
            )
        block_align = 8 + (spb - 1)
    frames = arr.shape[0]
    if frames == 0:
        return b"", block_align
    nblocks = -(-frames // spb)
    pad = nblocks * spb - frames
    if pad:  # pad the tail block by repeating the last sample
        arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
    blk = arr.reshape(nblocks, spb, channels).astype(np.int64)

    pred = blk[:, 0, :].copy()  # (nblocks, channels) lanes
    index = np.zeros((nblocks, channels), np.int64)
    nibs = np.empty((nblocks, spb - 1, channels), np.int64)
    for j in range(1, spb):
        step = _IMA_STEP[index]
        diff = blk[:, j, :] - pred
        sign = (diff < 0).astype(np.int64)
        adiff = np.abs(diff)
        b4 = (adiff >= step).astype(np.int64)
        adiff = adiff - b4 * step
        half = step >> 1
        b2 = (adiff >= half).astype(np.int64)
        adiff = adiff - b2 * half
        quarter = step >> 2
        b1 = (adiff >= quarter).astype(np.int64)
        nib = (sign << 3) | (b4 << 2) | (b2 << 1) | b1
        # track the decoder's reconstruction so the state never drifts
        d = (step >> 3) + b1 * quarter + b2 * half + b4 * step
        pred = np.clip(pred + np.where(sign, -d, d), -32768, 32767)
        index = np.clip(index + _IMA_INDEX[nib & 7], 0, 88)
        nibs[:, j - 1, :] = nib

    # headers: per channel (int16 LE predictor, uint8 index=0, reserved)
    hdr = np.zeros((nblocks, channels, 4), np.uint8)
    p16 = blk[:, 0, :] & 0xFFFF
    hdr[:, :, 0] = p16 & 0xFF
    hdr[:, :, 1] = p16 >> 8
    if channels == 1:
        lo = nibs[:, 0::2, 0]
        hi = nibs[:, 1::2, 0]
        payload = (lo | (hi << 4)).astype(np.uint8)
    else:
        # 4-byte channel groups of 8 nibbles, low nibble first
        grp = nibs.reshape(nblocks, -1, 8, 2).transpose(0, 1, 3, 2)
        packed = (grp[..., 0::2] | (grp[..., 1::2] << 4)).astype(np.uint8)
        payload = packed.reshape(nblocks, -1)
    out = np.concatenate([hdr.reshape(nblocks, -1), payload], axis=1)
    return out.tobytes(), block_align


# --------------------------------------------------- WAV container glue


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int, law: str = "ulaw"
) -> bytes:
    """int16 (frames,) or (frames, channels) → G.711 WAV bytes
    (format tag 7 for μ-law, 6 for A-law; 8 bits per sample)."""
    arr = np.asarray(samples, np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    enc = ulaw_encode if law == "ulaw" else alaw_encode
    if law not in ("ulaw", "alaw"):
        raise ValueError(f"law must be 'ulaw' or 'alaw', got {law!r}")
    data = enc(arr.reshape(-1)).tobytes()
    fmt_tag = 7 if law == "ulaw" else 6
    fmt = struct.pack(
        "<HHIIHHH", fmt_tag, channels, sample_rate,
        sample_rate * channels, channels, 8, 0,
    )
    return _riff_wave(fmt, data)


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """int16 samples → IMA ADPCM WAV bytes (format tag 0x11 with the
    wSamplesPerBlock extension and a 'fact' chunk, per the RIFF spec)."""
    arr = np.asarray(samples, np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    n_frames = arr.shape[0]
    data, block_align = adpcm_wav_encode(arr, samples_per_block)
    n_blocks = -(-n_frames // samples_per_block)
    byte_rate = sample_rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, sample_rate, byte_rate,
        block_align, 4, 2, samples_per_block,
    )
    fact = struct.pack("<I", n_blocks * samples_per_block)
    return _riff_wave(fmt, data, fact=fact)


def _riff_wave(fmt_body: bytes, data: bytes, fact: bytes | None = None) -> bytes:
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) % 2:
        chunks += b"\x00"
    if fact is not None:
        chunks += b"fact" + struct.pack("<I", len(fact)) + fact
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ------------------------------------------------------- MP3 frame probe

_MP3_BITRATE = {
    # kbps tables from ISO/IEC 11172-3 / 13818-3, index 1..14
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATE = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000), 25: (11025, 12000, 8000)}


def probe_mp3(blob: bytes) -> dict:
    """MP3/MPEG-audio metadata probe — the curation-pipeline slice of
    MP3 (sample decode needs the polyphase filterbank and stays
    import-gated in multimodal.py). Walks the elementary stream frame
    by frame using the ISO 11172-3 header arithmetic: skips an ID3v2
    tag (syncsafe length), parses each 4-byte header (version, layer,
    bitrate/sample-rate indices, padding, channel mode), advances by
    the computed frame length, and reads a Xing/Info VBR header when
    present. Returns dict(version, layer, sample_rate, channels,
    bitrate_kbps [first frame], n_frames, duration_ms, vbr).
    Raises ValueError on anything that is not a clean frame walk."""
    pos = 0
    if blob[:3] == b"ID3":
        if len(blob) < 10:
            raise ValueError("MP3: truncated ID3v2 header")
        size = 0
        for b in blob[6:10]:
            if b & 0x80:
                raise ValueError("MP3: invalid ID3v2 syncsafe size")
            size = (size << 7) | b
        pos = 10 + size
    n_frames = 0
    first = None
    xing_frames = None
    total_bits = 0

    def _trailer_ok(at: int) -> bool:
        # Trailing metadata after a clean walk is fine — but ONLY when
        # the remaining bytes look like a known appended tag (ID3v1
        # "TAG", APEv2 "APETAGEX", appended ID3v2, Lyrics3) or we are
        # within a few slack bytes of EOF. Real-world taggers commonly
        # pad with 0x00/0xFF runs BEFORE the tag (frames + zero padding
        # + "TAG...", ADVICE r14) — and an 0xFF run even false-syncs as
        # a header with reserved fields — so skip any such run first and
        # re-check at the padding's end. Arbitrary mid-stream garbage
        # must keep failing so a corrupt file can't silently report
        # truncated n_frames/duration.
        while at < len(blob) and blob[at] in (0x00, 0xFF):
            at += 1
        trailer = blob[at : at + 11]
        is_tag = (
            trailer[:3] in (b"TAG", b"ID3")
            or trailer[:8] == b"APETAGEX"
            or trailer == b"LYRICSBEGIN"
        )
        return is_tag or len(blob) - at < 16

    while pos + 4 <= len(blob):
        h = struct.unpack_from(">I", blob, pos)[0]
        if h >> 21 != 0x7FF:
            if n_frames and _trailer_ok(pos):
                break
            raise ValueError(f"MP3: lost sync at byte {pos}")
        vbits = (h >> 19) & 3
        version = {0: 25, 2: 2, 3: 1}.get(vbits)
        layer = {1: 3, 2: 2, 3: 1}.get((h >> 17) & 3)
        if version is None or layer is None:
            if n_frames and _trailer_ok(pos):
                break
            raise ValueError("MP3: reserved version/layer bits")
        bridx = (h >> 12) & 0xF
        sridx = (h >> 10) & 3
        if bridx in (0, 15) or sridx == 3:
            if n_frames and _trailer_ok(pos):
                break
            raise ValueError("MP3: free-format/reserved bitrate or rate")
        pad = (h >> 9) & 1
        mode = (h >> 6) & 3
        channels = 1 if mode == 3 else 2
        rate = _MP3_RATE[version][sridx]
        kbps = _MP3_BITRATE[(1 if version == 1 else 2, layer)][bridx]
        if layer == 1:
            flen = (12000 * kbps // rate + pad) * 4
            spf = 384
        else:
            spf = 1152 if (layer == 2 or version == 1) else 576
            flen = spf // 8 * 1000 * kbps // rate + pad
        if flen <= 4:
            raise ValueError("MP3: degenerate frame length")
        if first is None:
            first = (version, layer, rate, channels, kbps, spf)
            # Xing/Info header: offset past the side-info block
            if layer == 3:
                off = pos + 4 + (
                    (32 if channels == 2 else 17)
                    if version == 1
                    else (17 if channels == 2 else 9)
                )
                tag = blob[off : off + 4]
                if tag in (b"Xing", b"Info"):
                    flags = struct.unpack_from(">I", blob, off + 4)[0]
                    if flags & 1:
                        xing_frames = struct.unpack_from(">I", blob, off + 8)[0]
        total_bits += kbps
        n_frames += 1
        pos += flen
    if first is None:
        raise ValueError("MP3: no frames found")
    version, layer, rate, channels, kbps, spf = first
    frames = xing_frames if xing_frames is not None else n_frames
    return {
        "version": version,
        "layer": layer,
        "sample_rate": rate,
        "channels": channels,
        "bitrate_kbps": kbps,
        "n_frames": frames,
        "duration_ms": frames * spf * 1000 // rate,
        "vbr": xing_frames is not None,
    }


# --------------------------------------------------------- resampling

def resample_linear(
    samples: np.ndarray, sr_from: int, sr_to: int
) -> np.ndarray:
    """Sample-rate conversion by linear interpolation, fully vectorized
    (center-aligned grid, edge-clamped) — the cheap resampler every
    speech pipeline runs to normalize a scraped corpus to one rate
    before featurization. int16 in → int16 out; same-rate input passes
    through untouched. For band-limited fidelity a windowed-sinc kernel
    would be the upgrade; linear is the standard speed/quality floor."""
    if sr_from <= 0 or sr_to <= 0:
        raise ValueError("resample_linear: sample rates must be positive")
    arr = np.asarray(samples, np.int16)
    squeeze = arr.ndim == 1
    if squeeze:
        arr = arr[:, None]
    if sr_from == sr_to or arr.shape[0] == 0:
        out = arr
    else:
        n = arr.shape[0]
        m = max(1, int(round(n * sr_to / sr_from)))
        pos = (np.arange(m) + 0.5) * n / m - 0.5
        i0 = np.clip(np.floor(pos).astype(np.int64), 0, n - 1)
        i1 = np.minimum(i0 + 1, n - 1)
        frac = np.clip(pos - i0, 0.0, 1.0)[:, None]
        a = arr.astype(np.float64)
        out = np.clip(
            np.floor(a[i0] * (1.0 - frac) + a[i1] * frac + 0.5),
            -32768, 32767,
        ).astype(np.int16)
    return out[:, 0] if squeeze else out


def resample_audio(df, target_rate: int, content_col="content", id_col="asset_id"):
    """Spark surface: decode any supported audio payload (every WAV
    codec + FLAC), resample to ``target_rate``, re-encode as PCM16 WAV —
    the corpus-normalization stage before featurization. Undecodable
    payloads pass through with resampled=false (one bad asset, one
    row)."""
    import pandas as pd

    from scio_spark.functions import codecs as _codecs

    schema = f"{id_col} long, {content_col} binary, sample_rate int, resampled boolean"

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob)
                try:
                    if b[:4] == b"fLaC":
                        from scio_spark.functions.flac import decode_flac

                        sr, arr = decode_flac(b)
                        arr = np.clip(arr, -32768, 32767).astype(np.int16)
                    else:
                        sr, arr, _ = _codecs.decode_wav_ex(b)
                except ValueError:
                    rows.append(
                        {
                            id_col: aid, content_col: b,
                            "sample_rate": None, "resampled": False,
                        }
                    )
                    continue
                out = resample_linear(arr, sr, target_rate)
                rows.append(
                    {
                        id_col: aid,
                        content_col: _codecs.encode_wav(out, target_rate),
                        "sample_rate": target_rate,
                        "resampled": True,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(gen, schema)
