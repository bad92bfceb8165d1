"""WebDataset tar-shard IO tests (sources/webdataset.py).

The tar bytes come from stdlib tarfile (so loader interop is the stdlib's
guarantee); these tests pin the Spark-side contracts: distributed shard
write with a manifest, key-grouped reads, member contiguity/ordering,
missing-modality nulls, and deterministic shard bytes.
"""

import io
import tarfile

import pytest
from pyspark.sql import functions as F

from scio_spark.sources.webdataset import read_webdataset, save_as_webdataset


def sample_df(spark, n=200):
    return spark.range(n).select(
        F.concat(F.lit("sample_"), F.lpad(F.col("id").cast("string"), 5, "0")).alias("key"),
        F.concat(F.lit("caption for "), F.col("id")).alias("caption"),
        # fake image payload: deterministic bytes per id
        F.encode(F.concat(F.lit("IMG"), F.col("id").cast("string")), "utf-8").alias("img"),
        F.when(F.col("id") % 3 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("meta-"), F.col("id"))
        ).alias("meta"),
    )


EXTS = {"img": "jpg", "caption": "txt", "meta": "json"}


def test_roundtrip(spark, tmp_path):
    df = sample_df(spark)
    d = str(tmp_path / "wds")
    manifest = save_as_webdataset(df, d, "key", EXTS)
    assert sum(m.n_samples for m in manifest) == 200
    back = read_webdataset(
        spark, d, EXTS, text_cols={"caption", "meta"}
    )
    got = {r.key: r for r in back.collect()}
    assert len(got) == 200
    r = got["sample_00007"]
    assert r.caption == "caption for 7"
    assert bytes(r.img) == b"IMG7"
    assert r.meta == "meta-7"
    # missing modality (meta null for id%3==0) → member skipped → null back
    assert got["sample_00009"].meta is None
    assert got["sample_00009"].caption == "caption for 9"


def test_member_contiguity_and_order(spark, tmp_path):
    """WebDataset contract: all members of one sample are adjacent, keys
    ascend within a shard."""
    df = sample_df(spark, 50).repartition(2)
    d = str(tmp_path / "wds_order")
    save_as_webdataset(df, d, "key", EXTS)
    import glob

    for shard in glob.glob(f"{d}/*.tar"):
        with tarfile.open(shard) as tar:
            names = [m.name for m in tar.getmembers()]
        bases = [n.rpartition(".")[0] for n in names]
        # contiguity: each base appears in exactly one run
        seen, prev = set(), None
        for b in bases:
            if b != prev:
                assert b not in seen, f"{b} split into non-adjacent runs"
                seen.add(b)
                prev = b
        # sorted keys across runs
        runs = sorted(set(bases))
        assert sorted(bases, key=bases.index) == sorted(bases, key=bases.index)
        assert [b for i, b in enumerate(bases) if i == 0 or bases[i - 1] != b] == runs


def test_shard_per_task(spark, tmp_path):
    df = sample_df(spark, 120).repartition(4)
    d = str(tmp_path / "wds_shards")
    manifest = save_as_webdataset(df, d, "key", EXTS)
    assert len(manifest) == 4  # one shard per non-empty task
    back = read_webdataset(spark, d, EXTS, text_cols={"caption"})
    assert back.count() == 120


def test_unknown_extensions_ignored(spark, tmp_path):
    d = tmp_path / "wds_extra"
    d.mkdir()
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, data in [
            ("k1.txt", b"hello"),
            ("k1.xyz", b"???"),  # not in ext_cols
            ("k2.txt", b"world"),
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    (d / "part-0.tar").write_bytes(buf.getvalue())
    back = read_webdataset(spark, str(d), {"caption": "txt"}, text_cols={"caption"})
    assert sorted((r.key, r.caption) for r in back.collect()) == [
        ("k1", "hello"),
        ("k2", "world"),
    ]


def test_deterministic_shard_bytes(spark, tmp_path):
    """Same partition → same tar bytes (mtime pinned), so task retries
    republish identical shards."""
    df = sample_df(spark, 30).coalesce(1)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = save_as_webdataset(df, d1, "key", EXTS)
    m2 = save_as_webdataset(df, d2, "key", EXTS)
    b1 = open(m1[0].file, "rb").read()
    b2 = open(m2[0].file, "rb").read()
    assert b1 == b2


def test_overwrite_replaces(spark, tmp_path):
    d = str(tmp_path / "ow")
    save_as_webdataset(sample_df(spark, 40), d, "key", EXTS)
    save_as_webdataset(sample_df(spark, 10), d, "key", EXTS)
    assert read_webdataset(spark, d, EXTS).count() == 10


def test_missing_column_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no column"):
        save_as_webdataset(
            sample_df(spark, 5), str(tmp_path / "x"), "key", {"nope": "bin"}
        )


def test_shard_names_deterministic_for_retries(spark, tmp_path):
    """Shard filenames derive from the partition id, and shard bytes are
    deterministic — so a retried/speculative task reproduces the SAME file
    instead of adding a duplicate shard (uuid names would double every
    sample in the rerun shard on read)."""
    import glob
    import os

    df = sample_df(spark, 60).repartition(3)
    d = str(tmp_path / "wds_retry")
    save_as_webdataset(df, d, "key", EXTS)
    first = {
        os.path.basename(p): open(p, "rb").read()
        for p in glob.glob(f"{d}/*.tar")
    }
    assert set(first) == {f"part-{i:05d}.tar" for i in range(3)}
    save_as_webdataset(df, d, "key", EXTS)  # the "retry"
    second = {
        os.path.basename(p): open(p, "rb").read()
        for p in glob.glob(f"{d}/*.tar")
    }
    assert first == second  # same names, byte-identical shards
    assert read_webdataset(spark, d, EXTS).count() == 60
    assert not glob.glob(f"{d}/*.tmp.*")  # atomic-rename leftovers
