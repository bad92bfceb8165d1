"""Multimodal image-curation pipeline over the REAL pure-Python codecs:
synthesize a mixed PNG/JPEG/PPM/BMP/TIFF corpus (binary column + typed
metadata), exact-dedup assets by payload digest, decode + feature-extract
(dimensions, mean/std intensity) with corrupt payloads degrading to
decoder='unknown' rows instead of task failures, filter on decode
features, resize the keepers to a training thumbnail size (format-
preserving re-encode), and export the result as WebDataset tar shards —
the exchange format torch loaders stream.

Run: python examples/image_curation.py [out_dir]
"""

import sys

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scio_spark import ScioContext  # noqa: E402
from scio_spark.functions import codecs as C  # noqa: E402
from scio_spark.functions.jpeg import encode_jpeg  # noqa: E402
from scio_spark.functions.tiff import encode_tiff  # noqa: E402
from scio_spark.functions.multimodal import content_stats  # noqa: E402
from scio_spark.sources import webdataset as W  # noqa: E402


def synth_assets(spark, n=240):
    """Deterministic mixed-format corpus: gradient images cycled through
    PNG / JPEG / PPM / BMP / TIFF-LZW encoders, ~5% duplicated payloads (the exact-
    dup case), ~4% truncated (the corrupt-payload case)."""
    base = spark.range(n).select(F.col("id").alias("asset_id"))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid in pdf["asset_id"]:
                i = int(aid)
                src = i - (i % 20 == 7)  # every 20th asset duplicates i-1
                h, w = 24 + src % 3 * 8, 32 + src % 5 * 8
                y, x = np.mgrid[0:h, 0:w]
                img = np.dstack(
                    [((x * 5 + c * 40 + src) % 256) for c in range(3)]
                ).astype(np.uint8)
                kind = src % 5
                if kind == 0:
                    blob = C.encode_png(img, filter_cycle=(0, 1, 2, 3, 4))
                elif kind == 1:
                    blob = encode_jpeg(img, 85)
                elif kind == 2:
                    blob = C.encode_ppm(img)
                elif kind == 3:
                    blob = C.encode_bmp(img)
                else:
                    blob = encode_tiff(
                        img, compression="lzw", predictor=bool(src % 2)
                    )
                if i % 25 == 13:
                    blob = blob[: len(blob) // 3]  # corrupt in transit
                rows.append({"asset_id": i, "content": blob})
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, "asset_id long, content binary")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/image_curation"
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

    # 2. decode + feature-extract (PNG/JPEG/PPM/BMP/TIFF all REAL decoders;
    # truncated payloads come back decoder='unknown', job survives)
    feats = C.image_features(deduped)
    by_decoder = {
        r.decoder: r.n
        for r in feats.groupBy("decoder").agg(F.count("*").alias("n")).collect()
    }

    # 3. keep decodable, reasonably-sized, non-flat images
    keep_ids = feats.filter(
        "decoder != 'unknown' AND width >= 32 AND std_intensity > 1.0"
    ).select("asset_id")
    kept = deduped.join(keep_ids, "asset_id", "left_semi")
    n2 = kept.count()

    # 4. thumbnail for training (format-preserving re-encode)
    thumbs = C.resize_images(kept, 16, 16)

    # 5. export as WebDataset shards (partition-id shard names: task
    # retries replace, never duplicate)
    manifest = W.save_as_webdataset(
        thumbs.withColumn("key", F.format_string("img_%05d", "asset_id")),
        out,
        "key",
        {"content": "img"},
    )
    print(
        f"assets={n0} after_exact_dedup={n1} decoders={by_decoder} "
        f"kept={n2} shards={len(manifest)} "
        f"samples={sum(m.n_samples for m in manifest)} -> {out}"
    )


if __name__ == "__main__":
    main()
