"""First-class Bloom-filter values (scio ApproxFilter /
MutableScalableBloomFilter.scala:1-301 analog): build-once / merge /
serialize / broadcast-reuse semantics and error bounds."""

import pytest


@pytest.fixture(scope="module")
def members(spark):
    return spark.createDataFrame([(f"key_{i}",) for i in range(500)], ["k"])


@pytest.fixture(scope="module")
def probes(spark):
    # 500 members + 2000 non-members
    return spark.createDataFrame(
        [(f"key_{i}",) for i in range(500)]
        + [(f"other_{i}",) for i in range(2000)],
        ["k"],
    )


def test_bloom_no_false_negatives_and_bounded_fp(members, probes):
    from scio_spark.functions.bloom import build_bloom_filter, filter_with_bloom

    bf = build_bloom_filter(members, "k", fpp=0.01)
    kept = {r["k"] for r in filter_with_bloom(probes, "k", bf).collect()}
    assert all(f"key_{i}" in kept for i in range(500))  # no false negatives
    fps = sum(1 for k in kept if k.startswith("other_"))
    assert fps <= 2000 * 0.05  # ~1% target, generous bound
    dropped = {r["k"] for r in filter_with_bloom(probes, "k", bf, negate=True).collect()}
    assert not any(k.startswith("key_") for k in dropped)
    assert len(kept) + len(dropped) == 2500


def test_bloom_merge_and_serialize_roundtrip(spark, members):
    from scio_spark.functions.bloom import BloomFilter, build_bloom_filter, filter_with_bloom

    more = spark.createDataFrame([(f"extra_{i}",) for i in range(300)], ["k"])
    a = build_bloom_filter(members, "k", expected=800, fpp=0.01)
    b = build_bloom_filter(more, "k", expected=800, fpp=0.01)
    merged = BloomFilter.from_bytes(a.merge(b).to_bytes())
    probes = members.unionByName(more)
    kept = filter_with_bloom(probes, "k", merged).count()
    assert kept == 800  # every member of either build survives the merge
    assert 0 < merged.fill_ratio < 1


def test_bloom_shape_mismatch_rejected(members):
    from scio_spark.functions.bloom import build_bloom_filter

    a = build_bloom_filter(members, "k", expected=100)
    b = build_bloom_filter(members, "k", expected=10_000)
    with pytest.raises(ValueError):
        a.merge(b)


def test_scalable_bloom_grows_and_matches_all_slices(spark, members, probes):
    from scio_spark.functions.bloom import ScalableBloomFilter

    more = spark.createDataFrame([(f"other_{i}",) for i in range(100)], ["k"])
    sbf = ScalableBloomFilter(initial_expected=256, fpp=0.01)
    sbf.add_dataframe(members, "k").add_dataframe(more, "k")
    assert len(sbf.slices) == 2
    kept = {r["k"] for r in sbf.filter(probes, "k").collect()}
    assert all(f"key_{i}" in kept for i in range(500))
    assert all(f"other_{i}" in kept for i in range(100))
    missing = {r["k"] for r in sbf.filter(probes, "k", negate=True).collect()}
    assert not any(k.startswith("key_") for k in missing)
    assert len(kept) + len(missing) == 2500
