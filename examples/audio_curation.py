"""Audio-curation pipeline over the REAL pure-Python audio codecs:
synthesize a mixed-codec corpus (PCM WAV, G.711 μ-law/A-law, IMA ADPCM,
FLAC, MP3 — binary column, one codec family per asset), exact-dedup by
payload digest, decode + feature-extract (sample rate, duration, RMS,
per-codec routing) with corrupt payloads degrading to decoder='unknown'
rows instead of task failures, probe MP3s for metadata without sample
decode, filter on duration/energy, segment the keepers into fixed
windows, and archive them LOSSLESSLY as FLAC — the transcode every
speech-corpus pipeline runs before training.

Run: python examples/audio_curation.py [out_dir]
"""

import sys

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scio_spark import ScioContext  # noqa: E402
from scio_spark.functions import codecs as C  # noqa: E402
from scio_spark.functions.audio import (  # noqa: E402
    encode_wav_adpcm,
    encode_wav_g711,
    probe_mp3,
)
from scio_spark.functions.flac import decode_flac, encode_flac  # noqa: E402
from scio_spark.functions.multimodal import content_stats  # noqa: E402


def synth_assets(spark, n=200):
    """Deterministic mixed-codec corpus: two-tone signals cycled through
    PCM / μ-law / A-law / ADPCM / FLAC containers plus MP3 header-only
    streams, ~5% duplicated payloads, ~4% truncated."""
    base = spark.range(n).select(F.col("id").alias("asset_id"))

    def gen(batches):
        import struct

        import pandas as pd

        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                src = i - (i % 20 == 7)  # every 20th duplicates i-1
                frames = 2000 + (src % 5) * 800
                t = np.arange(frames)
                sig = (
                    (3000 + src * 7) * np.sin(t / (18.0 + src % 9))
                    + 700 * np.sin(t / (4.0 + src % 3))
                ).astype(np.int16)
                kind = src % 6
                if kind == 0:
                    blob = C.encode_wav(sig, 16000)
                elif kind == 1:
                    blob = encode_wav_g711(sig, 8000, "ulaw")
                elif kind == 2:
                    blob = encode_wav_g711(sig, 8000, "alaw")
                elif kind == 3:
                    blob = encode_wav_adpcm(sig, 16000)
                elif kind == 4:
                    blob = encode_flac(sig, 16000)
                else:
                    # MP3: valid frame walk, payload bytes zeroed (the
                    # probe never decodes samples)
                    h = (
                        (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
                        | (9 << 12) | (0 << 10) | (3 << 6)
                    )
                    flen = 144 * 128000 // 44100
                    nf = 8 + src % 97  # 97 coprime to the codec cycle
                    blob = (struct.pack(">I", h) + bytes(flen - 4)) * nf
                if i % 25 == 13:
                    blob = blob[: len(blob) // 3]  # corrupt in transit
                rows.append({"asset_id": i, "content": blob})
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, "asset_id long, content binary")


def probe_mp3_assets(df):
    """MP3 metadata probe as a mapInPandas stage (frame walk only)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                try:
                    p = probe_mp3(bytes(blob))
                except ValueError:
                    continue
                rows.append(
                    {
                        "asset_id": aid,
                        "mp3_kbps": p["bitrate_kbps"],
                        "mp3_duration_ms": p["duration_ms"],
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(
        gen, "asset_id long, mp3_kbps int, mp3_duration_ms long"
    )


def to_flac(df):
    """Lossless archive transcode: decode whatever WAV/FLAC codec the
    asset arrived in, re-encode as FLAC."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob)
                try:
                    if b[:4] == b"fLaC":
                        sr, arr = decode_flac(b)
                    else:
                        sr, arr, _ = C.decode_wav_ex(b)
                except ValueError:
                    continue
                out = encode_flac(arr[:, 0].astype(np.int16), sr)
                rows.append(
                    {"asset_id": aid, "content": out, "n_bytes": len(out)}
                )
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(gen, "asset_id long, content binary, n_bytes long")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/audio_curation"
    ctx = ScioContext()
    spark = ctx.spark
    spark.sparkContext.setLogLevel("ERROR")

    assets = synth_assets(spark)
    n0 = assets.count()

    # 1. exact dedup on the payload digest — JVM-side sha2, no decode
    deduped = (
        content_stats(assets)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("digest").orderBy("asset_id")
            ),
        )
        .filter("rk = 1")
        .drop("rk", "digest", "n_bytes")
    )
    n1 = deduped.count()

    # 2. decode + feature-extract: every codec routes through its real
    # decoder; truncated payloads come back decoder='unknown'
    feats = C.audio_features(deduped)
    by_decoder = {
        r.decoder: r.n
        for r in feats.groupBy("decoder").agg(F.count("*").alias("n")).collect()
    }

    # 3. MP3s carry metadata only — probe instead of decode
    mp3_meta = probe_mp3_assets(deduped)
    n_mp3 = mp3_meta.count()

    # 4. keep decodable audio with real energy and >= 150 ms
    keep_ids = feats.filter(
        "decoder != 'unknown' AND rms > 100.0 AND duration_ms >= 150"
    ).select("asset_id")
    kept = deduped.join(keep_ids, "asset_id", "left_semi")

    # 5. fixed 100 ms training windows (decode + re-encode per window)
    segs = C.segment_audio(kept, window_ms=100)
    n_seg = segs.count()

    # 6. normalize every keeper to 16 kHz (the featurization rate),
    # then archive losslessly as FLAC and write parquet
    from scio_spark.functions.audio import resample_audio

    normalized = resample_audio(kept, 16000).filter("resampled").drop(
        "sample_rate", "resampled"
    )
    flac = to_flac(normalized)
    flac.write.mode("overwrite").parquet(out)
    sizes = flac.agg(
        F.count("*").alias("n"), F.sum("n_bytes").alias("bytes")
    ).head()
    print(
        f"assets={n0} after_exact_dedup={n1} decoders={by_decoder} "
        f"mp3_probed={n_mp3} windows={n_seg} "
        f"flac_archived={sizes.n} flac_bytes={sizes.bytes} -> {out}"
    )


if __name__ == "__main__":
    main()
