"""Compressed-audio codec tests (functions/audio.py + decode_wav_ex).

Verification strategy: G.711 and the IMA ADPCM nibble core are pinned
BIT-EXACT against CPython's ``audioop`` — an independent C
implementation of the same specs — over the full 16-bit input range /
all 256 code points. The WAV block framing (which audioop doesn't do)
is checked against hand-assembled blocks with analytically-known
samples, plus multi-block/stereo round-trips with an ADPCM error bound.
"""

import struct

import numpy as np
import pytest

from scio_spark.functions.audio import (
    adpcm_wav_decode,
    adpcm_wav_encode,
    alaw_decode,
    alaw_encode,
    encode_wav_adpcm,
    encode_wav_g711,
    ima_nibbles_decode,
    ima_nibbles_encode,
    ulaw_decode,
    ulaw_encode,
)
from scio_spark.functions.codecs import decode_wav, decode_wav_ex

audioop = pytest.importorskip("audioop")  # stdlib in <=3.12


ALL_I16 = np.arange(-32768, 32768, dtype=np.int16)
ALL_CODES = np.arange(256, dtype=np.uint8)


def test_ulaw_bit_exact_vs_audioop():
    ref_enc = np.frombuffer(audioop.lin2ulaw(ALL_I16.tobytes(), 2), np.uint8)
    assert (ulaw_encode(ALL_I16) == ref_enc).all()
    ref_dec = np.frombuffer(audioop.ulaw2lin(ALL_CODES.tobytes(), 2), "<i2")
    assert (ulaw_decode(ALL_CODES) == ref_dec).all()


def test_alaw_bit_exact_vs_audioop():
    ref_enc = np.frombuffer(audioop.lin2alaw(ALL_I16.tobytes(), 2), np.uint8)
    assert (alaw_encode(ALL_I16) == ref_enc).all()
    ref_dec = np.frombuffer(audioop.alaw2lin(ALL_CODES.tobytes(), 2), "<i2")
    assert (alaw_decode(ALL_CODES) == ref_dec).all()


def test_g711_spec_spot_values():
    """Hand-computed from the G.711 curves, not from any implementation:
    μ-law code 0xFF is digital zero (mantissa 0, segment 0 → magnitude
    (0+132)·1−132 = 0); A-law code 0xD5 (= 0x80^0x55) is +8 (segment 0,
    mantissa 0 → (0<<4)+8)."""
    assert int(ulaw_decode(np.array([0xFF]))[0]) == 0
    assert int(alaw_decode(np.array([0xD5]))[0]) == 8
    # μ-law segment-0 step is 8: codes 0xFF,0xFE,0xFD... decode 0,8,16...
    got = ulaw_decode(np.array([0xFF, 0xFE, 0xFD, 0xFC]))
    assert got.tolist() == [0, 8, 16, 24]
    # companding error bound: |decode(encode(x)) - x| <= segment width
    x = ALL_I16.astype(np.int64)
    err = np.abs(ulaw_decode(ulaw_encode(ALL_I16)).astype(np.int64) - x)
    assert int(err[np.abs(x) < 8000].max()) <= 256
    erra = np.abs(alaw_decode(alaw_encode(ALL_I16)).astype(np.int64) - x)
    assert int(erra[np.abs(x) < 8000].max()) <= 256


def test_ima_core_bit_exact_vs_audioop():
    rng = np.random.RandomState(5)
    x = np.cumsum(rng.randint(-900, 900, 4000)).clip(-32000, 32000)
    x = x.astype(np.int16)
    ref_enc, ref_state = audioop.lin2adpcm(x.tobytes(), 2, None)
    nibs, pred, idx = ima_nibbles_encode(x.tolist(), 0, 0)
    # audioop packs the first sample of each pair in the HIGH nibble
    packed = bytearray()
    for j in range(0, len(nibs), 2):
        packed.append((nibs[j] << 4) | nibs[j + 1])
    assert bytes(packed) == ref_enc
    assert (pred, idx) == ref_state
    ref_dec = np.frombuffer(audioop.adpcm2lin(ref_enc, 2, None)[0], "<i2")
    out, _, _ = ima_nibbles_decode(nibs, 0, 0)
    assert (np.array(out[: len(ref_dec)], np.int16) == ref_dec).all()


def test_adpcm_wav_block_layout_hand_assembled():
    """One mono block, block_align=8: header (predictor=100, index=0)
    then 4 payload bytes = 8 nibbles. Nibble 0 with step 7 gives
    diff = 7>>3 = 0 → sample stays 100 and index drops to 0 (clamped);
    nibble 2 adds 7>>1 + 7>>3 = 3. Samples derived by hand from the
    step table."""
    hdr = struct.pack("<hBB", 100, 0, 0)
    # nibbles: 0,0, 2,0, 0,0, 0,0  (low nibble first within each byte)
    payload = bytes([0x00, 0x02 & 0x0F | (0x00 << 4), 0x00, 0x00])
    payload = bytes([0x00, 0x02, 0x00, 0x00])  # (2,0) in byte 1
    out = adpcm_wav_decode(hdr + payload, channels=1, block_align=8)
    assert out.shape == (9, 1)
    assert out[0, 0] == 100  # block header predictor IS sample 0
    assert out[1, 0] == 100 and out[2, 0] == 100  # two zero nibbles
    assert out[3, 0] == 103  # nibble 2: +(7>>1 + 7>>3) = +3
    assert (out[4:, 0] == 103).all()  # zero nibbles keep the predictor


def test_adpcm_wav_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(11)
    t = np.arange(3000)
    mono = (6000 * np.sin(t / 40) + 800 * np.sin(t / 7)).astype(np.int16)
    data, ba = adpcm_wav_encode(mono, samples_per_block=505)
    back = adpcm_wav_decode(data, 1, ba)[: mono.shape[0], 0]
    err = np.abs(back.astype(np.int64) - mono.astype(np.int64))
    assert float(err.mean()) < 120.0  # adaptive step tracks a smooth signal
    stereo = np.stack([mono, mono[::-1]], axis=1)
    data, ba = adpcm_wav_encode(stereo, samples_per_block=505)
    back = adpcm_wav_decode(data, 2, ba)[: stereo.shape[0]]
    err = np.abs(back.astype(np.int64) - stereo.astype(np.int64))
    assert float(err.mean()) < 120.0
    with pytest.raises(ValueError, match="odd"):
        adpcm_wav_encode(mono, samples_per_block=500)
    with pytest.raises(ValueError, match="mod 8"):
        adpcm_wav_encode(stereo, samples_per_block=503)


def test_wav_container_g711_and_adpcm_route():
    t = np.arange(2020)
    sig = (5000 * np.sin(t / 25)).astype(np.int16)
    for law, codec in (("ulaw", "ulaw"), ("alaw", "alaw")):
        blob = encode_wav_g711(sig, 8000, law)
        sr, arr, name = decode_wav_ex(blob)
        assert (sr, name) == (8000, codec)
        dec = (ulaw_decode if law == "ulaw" else alaw_decode)(
            (ulaw_encode if law == "ulaw" else alaw_encode)(sig)
        )
        assert (arr[:, 0] == dec).all()
    blob = encode_wav_adpcm(sig, 8000)
    sr, arr, name = decode_wav_ex(blob)
    assert (sr, name) == (8000, "ima_adpcm")
    err = np.abs(arr[: sig.shape[0], 0].astype(np.int64) - sig)
    assert float(err.mean()) < 120.0
    # legacy 2-tuple API still works
    sr2, arr2 = decode_wav(blob)
    assert sr2 == 8000 and (arr2 == arr).all()


def _pcm_wav(fmt, bits, data, channels=1, rate=8000):
    body = struct.pack(
        "<HHIIHH", fmt, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(body)) + body
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_pcm_depths_and_float():
    # 8-bit unsigned: 128 is digital zero, 129 -> +256
    sr, arr, name = decode_wav_ex(_pcm_wav(1, 8, bytes([128, 129, 0, 255])))
    assert name == "pcm8"
    assert arr[:, 0].tolist() == [0, 256, -32768, 32512]
    # 24-bit: top 16 bits kept — 0x010000 -> 256; 0xFFFFFF (-1) -> -1
    d24 = b"\x00\x00\x01" + b"\xff\xff\xff"
    sr, arr, name = decode_wav_ex(_pcm_wav(1, 24, d24))
    assert name == "pcm24" and arr[:, 0].tolist() == [256, -1]
    # 32-bit int: 1<<16 -> 1
    d32 = struct.pack("<ii", 1 << 16, -(1 << 31))
    sr, arr, name = decode_wav_ex(_pcm_wav(1, 32, d32))
    assert name == "pcm32" and arr[:, 0].tolist() == [1, -32768]
    # float32: ±1.0 saturate to ±32767
    df = struct.pack("<ff", 1.0, -0.5)
    sr, arr, name = decode_wav_ex(_pcm_wav(3, 32, df))
    assert name == "float32" and arr[:, 0].tolist() == [32767, -16384]


def test_wav_corrupt_paths_raise_valueerror_only():
    with pytest.raises(ValueError):
        decode_wav_ex(_pcm_wav(0x55, 16, b"\x00\x00"))  # unknown tag
    with pytest.raises(ValueError):
        decode_wav_ex(_pcm_wav(1, 12, b"\x00\x00"))  # odd depth
    bad_idx = struct.pack("<hBB", 0, 200, 0) + bytes(4)  # index 200 > 88
    with pytest.raises(ValueError):
        adpcm_wav_decode(bad_idx, 1, 8)
    with pytest.raises(ValueError):
        adpcm_wav_decode(b"\x00" * 16, 3, 16)  # 3 channels


def test_audio_features_routes_flac_and_g711(spark):
    from scio_spark.functions.codecs import audio_features
    from scio_spark.functions.flac import encode_flac

    x = (2000 * np.sin(np.arange(4000) / 15)).astype(np.int16)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_flac(x, 16000))),
            (2, bytearray(encode_wav_g711(x, 8000, "ulaw"))),
            (3, bytearray(encode_wav_adpcm(x, 8000))),
        ],
        "asset_id long, content binary",
    )
    rows = {r.asset_id: r for r in audio_features(df).collect()}
    assert rows[1].decoder == "flac"
    assert rows[1].sample_rate == 16000 and rows[1].n_frames == 4000
    assert rows[2].decoder == "wav-ulaw" and rows[2].sample_rate == 8000
    assert rows[3].decoder == "wav-ima_adpcm"


# ------------------------------------------------------------- MP3 probe


def _mp3_header(version_bits, layer_bits, bridx, sridx, pad=0, mode=3):
    h = (
        (0x7FF << 21) | (version_bits << 19) | (layer_bits << 17)
        | (1 << 16) | (bridx << 12) | (sridx << 10) | (pad << 9)
        | (mode << 6)
    )
    return struct.pack(">I", h)


def test_probe_mp3_cbr_layer3():
    from scio_spark.functions.audio import probe_mp3

    # MPEG1 (11) Layer III (01) 128kbps (idx 9) 44100 (idx 0) mono
    flen = 144 * 128000 // 44100
    blob = (_mp3_header(3, 1, 9, 0) + bytes(flen - 4)) * 10
    got = probe_mp3(blob)
    assert got == {
        "version": 1, "layer": 3, "sample_rate": 44100, "channels": 1,
        "bitrate_kbps": 128, "n_frames": 10,
        "duration_ms": 10 * 1152 * 1000 // 44100, "vbr": False,
    }


def test_probe_mp3_padding_and_layer2_and_mpeg2():
    from scio_spark.functions.audio import probe_mp3

    # padding adds one byte per padded frame (Layer III)
    flen = 144 * 128000 // 44100
    blob = (_mp3_header(3, 1, 9, 0, pad=1) + bytes(flen - 3)) * 4
    assert probe_mp3(blob)["n_frames"] == 4
    # MPEG1 Layer II (10): idx 9 = 160 kbps, 48 kHz (idx 1), stereo
    flen = 144 * 160000 // 48000
    blob = (_mp3_header(3, 2, 9, 1, mode=0) + bytes(flen - 4)) * 6
    got = probe_mp3(blob)
    assert (got["layer"], got["bitrate_kbps"], got["channels"]) == (2, 160, 2)
    assert got["duration_ms"] == 6 * 1152 * 1000 // 48000
    # MPEG2 (10) Layer III: 576 samples/frame, idx 9 = 80 kbps, 22050
    flen = 576 // 8 * 1000 * 80 // 22050
    blob = (_mp3_header(2, 1, 9, 0) + bytes(flen - 4)) * 6
    got = probe_mp3(blob)
    assert (got["version"], got["sample_rate"]) == (2, 22050)
    assert got["bitrate_kbps"] == 80
    assert got["duration_ms"] == 6 * 576 * 1000 // 22050


def test_probe_mp3_id3v2_skip_and_xing_vbr():
    from scio_spark.functions.audio import probe_mp3

    flen = 144 * 128000 // 44100
    frame = bytearray(_mp3_header(3, 1, 9, 0) + bytes(flen - 4))
    # MPEG1 mono side info = 17 bytes -> Xing at frame offset 4+17
    frame[4 + 17 : 4 + 21] = b"Xing"
    frame[4 + 21 : 4 + 25] = struct.pack(">I", 1)  # flags: frames present
    frame[4 + 25 : 4 + 29] = struct.pack(">I", 42)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 7]) + bytes(7)
    blob = id3 + bytes(frame) + (_mp3_header(3, 1, 9, 0) + bytes(flen - 4)) * 2
    got = probe_mp3(blob)
    assert got["vbr"] is True
    assert got["n_frames"] == 42  # Xing count wins over the walk
    assert got["duration_ms"] == 42 * 1152 * 1000 // 44100


def test_probe_mp3_corrupt_raises_valueerror():
    from scio_spark.functions.audio import probe_mp3

    with pytest.raises(ValueError):
        probe_mp3(b"\x00" * 100)  # no sync
    with pytest.raises(ValueError):
        probe_mp3(_mp3_header(3, 1, 0, 0) + bytes(100))  # free-format
    with pytest.raises(ValueError):
        probe_mp3(_mp3_header(3, 0, 9, 0) + bytes(100))  # reserved layer
    # lost sync BEFORE any valid frame is corruption
    with pytest.raises(ValueError, match="lost sync"):
        probe_mp3(b"\xff\x00" + b"not-a-frame" * 10)


def test_probe_mp3_tolerates_trailing_tags():
    """Trailing non-frame bytes after a clean walk are appended tags
    (ID3v1 'TAG' 128 bytes, APEv2, Lyrics3 — near-universal on real
    MP3s), not corruption: the walk stops and reports the frames it
    saw. Regression: this used to raise 'lost sync' because the
    trailer guard was unreachable."""
    from scio_spark.functions.audio import probe_mp3

    flen = 144 * 128000 // 44100
    good = (_mp3_header(3, 1, 9, 0) + bytes(flen - 4)) * 5
    id3v1 = b"TAG" + bytes(125)  # 128-byte ID3v1 trailer
    assert probe_mp3(good + id3v1)["n_frames"] == 5
    ape = b"APETAGEX" + bytes(24)  # APEv2 footer-ish trailer
    assert probe_mp3(good + ape)["n_frames"] == 5
    # short trailer (<4 bytes) also fine
    assert probe_mp3(good + b"..")["n_frames"] == 5
    # appended ID3v2 and Lyrics3 trailers too
    assert probe_mp3(good + b"ID3\x04\x00\x00" + bytes(100))["n_frames"] == 5
    assert probe_mp3(good + b"LYRICSBEGIN" + bytes(40))["n_frames"] == 5
    # r14-ADVICE regression: taggers commonly leave 0x00/0xFF padding
    # BEFORE the appended tag — frames + 500 zero bytes + ID3v1 is a
    # valid file, as is padding that simply runs to EOF
    assert probe_mp3(good + bytes(500) + id3v1)["n_frames"] == 5
    assert probe_mp3(good + b"\xff" * 64 + ape)["n_frames"] == 5
    assert probe_mp3(good + bytes(4096))["n_frames"] == 5


def test_probe_mp3_midstream_garbage_still_raises():
    """r13-ADVICE regression: junk that is neither a recognized tag magic
    nor within a few bytes of EOF must raise even after valid frames — a
    mid-stream-corrupt file can't silently report truncated
    n_frames/duration."""
    from scio_spark.functions.audio import probe_mp3

    flen = 144 * 128000 // 44100
    good = (_mp3_header(3, 1, 9, 0) + bytes(flen - 4)) * 5
    with pytest.raises(ValueError, match="lost sync"):
        probe_mp3(good + b"\x01" * 4096 + good)


def test_wav_format_extensible_routes_by_subformat_guid():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE): the real codec is the first
    word of the SubFormat GUID (1 = PCM here), the common container for
    modern multichannel/24-bit captures."""
    data = np.array([100, -200, 300, -400], np.int16).tobytes()
    body = struct.pack(
        "<HHIIHH", 0xFFFE, 2, 48000, 48000 * 4, 4, 16
    ) + struct.pack("<HHI", 22, 16, 3) + struct.pack("<H", 1) + bytes(14)
    chunks = b"fmt " + struct.pack("<I", len(body)) + body
    chunks += b"data" + struct.pack("<I", len(data)) + data
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    sr, arr, name = decode_wav_ex(blob)
    assert (sr, name) == (48000, "pcm16")
    assert arr.tolist() == [[100, -200], [300, -400]]
    # truncated EXTENSIBLE chunk raises, never IndexError
    short = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(short)) + short
    chunks += b"data" + struct.pack("<I", 2) + b"\x00\x00"
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(ValueError, match="EXTENSIBLE"):
        decode_wav_ex(blob)


def test_resample_linear_analytic():
    from scio_spark.functions.audio import resample_linear

    ramp = np.arange(0, 1000, 10, dtype=np.int16)  # 100 samples
    # identity: exact passthrough
    assert (resample_linear(ramp, 16000, 16000) == ramp).all()
    # 2x upsample of a linear ramp stays on the line (interior)
    up = resample_linear(ramp, 8000, 16000)
    assert up.shape == (200,)
    diffs = np.diff(up[2:-2].astype(int))
    assert diffs.min() >= 4 and diffs.max() <= 6  # slope 10 per src step
    # 2x downsample averages neighbors: midpoint of a ramp
    down = resample_linear(ramp, 16000, 8000)
    assert down.shape == (50,)
    assert abs(int(down[10]) - int(ramp[20] + ramp[21]) // 2) <= 10
    # stereo keeps channel identity
    st = np.stack([ramp, ramp[::-1]], axis=1)
    out = resample_linear(st, 16000, 8000)
    assert out.shape == (50, 2)
    assert (out[:, 0][::-1] == out[:, 1]).all()
    with pytest.raises(ValueError):
        resample_linear(ramp, 0, 8000)


def test_resample_audio_spark_surface(spark):
    from scio_spark.functions.audio import resample_audio
    from scio_spark.functions.codecs import decode_wav_ex, encode_wav
    from scio_spark.functions.flac import encode_flac

    tone = (4000 * np.sin(np.arange(8000) / 20)).astype(np.int16)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(tone, 8000))),
            (2, bytearray(encode_flac(tone, 8000))),
            (3, bytearray(encode_wav_g711(tone, 8000, "ulaw"))),
            (4, bytearray(b"not audio at all")),
        ],
        "asset_id long, content binary",
    )
    rows = {r.asset_id: r for r in resample_audio(df, 16000).collect()}
    for aid in (1, 2, 3):
        assert rows[aid].resampled is True
        sr, arr, codec = decode_wav_ex(bytes(rows[aid].content))
        assert (sr, codec) == (16000, "pcm16")
        assert arr.shape[0] == 16000  # 1 s at the new rate
    assert rows[4].resampled is False
    assert bytes(rows[4].content) == b"not audio at all"
