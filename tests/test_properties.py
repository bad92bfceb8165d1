"""Property-based tests (hypothesis) — mirrors the reference's scalacheck
suites (scio-core/src/test/.../coders, util random samplers, and
ApproximationAssertions; SURVEY §5.5).

Few examples per property (each example runs Spark jobs); properties chosen
so the assertion is exact, not statistical."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

kv_lists = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(-100, 100)),
    min_size=1,
    max_size=30,
)


@given(left=kv_lists, right=kv_lists)
@settings(**SETTINGS)
def test_join_matches_python_semantics(spark, left, right):
    """Inner join == per-key cartesian product (ArtisanJoin.scala:97-115)."""
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    l = sc.parallelize(left, schema=["k", "v"]).key_by("k")
    r = sc.parallelize([(k, str(v)) for k, v in right], schema=["k", "w"]).key_by("k")
    got = sorted((x["k"], x["v"], x["w"]) for x in l.join(r).collect())
    expected = sorted(
        (k1, v, str(w)) for k1, v in left for k2, w in right if k1 == k2
    )
    assert got == expected


@given(data=st.lists(st.integers(-1000, 1000), min_size=1, max_size=50))
@settings(**SETTINGS)
def test_stats_match_python(spark, data):
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    r = sc.parallelize([float(x) for x in data]).stats().collect()[0]
    assert r["count"] == len(data)
    assert r["min"] == min(data) and r["max"] == max(data)
    assert abs(r["sum"] - sum(data)) < 1e-9
    mean = sum(data) / len(data)
    assert abs(r["mean"] - mean) < 1e-9
    var = sum((x - mean) ** 2 for x in data) / len(data)
    assert abs(r["variance"] - var) < 1e-6


@given(data=st.lists(st.integers(0, 50), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_histogram_total_and_bounds(spark, data):
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    buckets = [0.0, 10.0, 20.0, 30.0, 40.0, 50.0]
    hist = dict(
        (r["bucket"], r["count"])
        for r in sc.parallelize([float(x) for x in data])
        .histogram("value", buckets)
        .collect()
    )
    assert sum(hist.values()) == len(data)  # every in-range value lands once
    assert all(1 <= b <= 5 for b in hist)


@given(
    docs=st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=30), min_size=2, max_size=8
    )
)
@settings(**SETTINGS)
def test_simhash_identical_docs_collide(spark, docs):
    """Identical token sets ⇒ identical simhash (determinism property)."""
    from scio_spark.functions.dedup import simhash

    rows = [(i, d) for i, d in enumerate(docs)] + [(len(docs), docs[0])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert sh[0] == sh[len(docs)]


@given(n=st.integers(1, 40), zero=st.integers(-5, 5))
@settings(**SETTINGS)
def test_fold_associativity(spark, n, zero):
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    out = sc.parallelize(list(range(1, n + 1))).fold(zero, "acc + x").collect()[0]
    assert out["folded"] == zero + n * (n + 1) // 2


@given(
    weights=st.lists(st.floats(0.1, 1.0), min_size=2, max_size=3),
)
@settings(**SETTINGS)
def test_random_split_partitions_everything(spark, weights):
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    parts = sc.parallelize(list(range(60))).random_split(weights, seed=3)
    total = sum(p.count() for p in parts)
    assert total == 60
    seen = set()
    for p in parts:
        vals = {r[0] for r in p.collect()}
        assert not (seen & vals)  # disjoint
        seen |= vals


@given(recs=st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=20))
@settings(max_examples=20, deadline=None)
def test_tfrecord_codec_roundtrip_property(recs):
    from scio_spark.sources.formats import tfrecord_decode, tfrecord_encode

    assert tfrecord_decode(tfrecord_encode(recs)) == recs


@given(
    recs=st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=20),
    header=st.binary(min_size=0, max_size=16),
    footer=st.binary(min_size=0, max_size=16),
)
@settings(max_examples=20, deadline=None)
def test_binary_frame_codec_roundtrip_property(recs, header, footer):
    from scio_spark.sources.formats import frame_decode, frame_encode

    assert frame_decode(frame_encode(recs, header, footer), header, footer) == recs


def test_sample_weighted_biases_toward_heavy(spark):
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    # half the items weigh 10×: they should dominate the sample
    data = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(400)]
    c = sc.parallelize(data, schema=["id", "w"])
    heavy_frac = []
    for seed in range(5):
        got = c.sample_weighted(40, "w", seed=seed).collect()
        assert len(got) == 40
        heavy_frac.append(sum(1 for r in got if r["w"] == 10.0) / 40)
    assert sum(heavy_frac) / len(heavy_frac) > 0.7  # E≈0.91 under A-Res


def test_sample_weighted_row_stable_mode(spark):
    """id_col mode: the sample is identical under repartitioning (hash
    priorities, not F.rand), still exactly n, and still weight-biased."""
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    data = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(400)]
    c = sc.parallelize(data, schema=["id", "w"])
    a = sorted(r["id"] for r in c.sample_weighted(40, "w", id_col="id").collect())
    c2 = sc.parallelize(data, schema=["id", "w"])
    c2.df = c2.df.repartition(7)  # different physical layout
    b = sorted(r["id"] for r in c2.sample_weighted(40, "w", id_col="id").collect())
    assert a == b and len(a) == 40
    heavy = sum(1 for i in a if i % 2 == 0) / 40
    assert heavy > 0.7


def test_sample_byte_sized_respects_budget(spark):
    from scio_spark import ScioContext

    sc = ScioContext(spark)
    c = sc.parallelize([("x" * (10 + i % 20),) for i in range(300)], schema=["value"])
    got = c.sample_byte_sized(200, "value").collect()
    total = sum(len(r["value"].encode()) for r in got)
    assert 0 < total <= 200


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_connected_components_match_union_find(spark, edges):
    """Distributed min-label propagation must agree with a reference
    union-find on arbitrary random graphs (self-loops and duplicate edges
    included)."""
    from scio_spark.functions.dedup import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}
    # find() with path compression can leave stale roots; normalize
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_1 long, id_2 long"
    )
    got = {
        r["node"]: r["comp"]
        for r in connected_components(pairs).collect()
    }
    assert got == expected


texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abc xyz.@-123\t\n")),
        min_size=0,
        max_size=80,
    ),
    min_size=1,
    max_size=8,
)


@given(docs=texts, chunk_tokens=st.integers(2, 8), overlap=st.integers(0, 3))
@settings(**SETTINGS)
def test_chunk_text_reconstruction_property(spark, docs, chunk_tokens, overlap):
    """For any text and window config (overlap < chunk_tokens): joining each
    doc's chunks at stride boundaries reconstructs exactly its token stream —
    chunking loses nothing, duplicates only the overlap, and never emits an
    empty chunk."""
    from scio_spark.functions.text import chunk_text

    overlap = min(overlap, chunk_tokens - 1)
    step = chunk_tokens - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    out = chunk_text(df, chunk_tokens=chunk_tokens, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        assert r["n_tokens"] > 0 and r["chunk"] != ""
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk"]))
    for i, t in enumerate(docs):
        toks = t.split()
        if not toks:
            assert i not in by_doc
            continue
        chunks = [c for _, c in sorted(by_doc[i])]
        # stride-prefix of every chunk except the last, then the whole last
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c.split()[:step])
        rebuilt.extend(chunks[-1].split())
        assert rebuilt == toks, (toks, chunks)


@given(doc=st.text(alphabet=st.sampled_from(list("ab @.-0159\n")), max_size=60))
@settings(**SETTINGS)
def test_scrub_pii_idempotent_and_digit_free_masks(spark, doc):
    """scrub ∘ scrub == scrub (masks contain nothing any pattern matches),
    and a scrubbed text plus injected PII scrubs back to the same text."""
    from scio_spark.functions.text import scrub_pii

    df = spark.createDataFrame([(doc,)], ["t"])
    once = df.select(scrub_pii("t").alias("s"))
    twice = once.select(scrub_pii("s").alias("s"))
    a, b = once.collect()[0]["s"], twice.collect()[0]["s"]
    assert a == b
    inj = spark.createDataFrame(
        [(a + " x@y.io 10.1.2.3 123-45-6789 555-123-4567",)], ["t"]
    )
    assert (
        inj.select(scrub_pii("t").alias("s")).collect()[0]["s"]
        == a + " <EMAIL> <IP> <SSN> <PHONE>"
    )


@given(
    toks=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_md5_slice_hash_portable_across_engines(spark, toks):
    """The engine-portable hash recipe underneath MinHash signatures,
    winnowing, DSIR buckets and hash_split: Spark's
    CAST(conv(substring(md5(x), off, 12), 16, 10) AS BIGINT) must equal
    DuckDB's CAST('0x' || substr(md5(x), off, 12) AS BIGINT) for BOTH
    md5 slices (hex chars 1-12 and 13-24) on arbitrary printable input."""
    import duckdb

    df = spark.createDataFrame([(t,) for t in toks], "s string")
    got = {
        (r["s"], r["h1"], r["h2"])
        for r in df.select(
            "s",
            F.expr(
                "CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT)"
            ).alias("h1"),
            F.expr(
                "CAST(conv(substring(md5(s), 13, 12), 16, 10) AS BIGINT)"
            ).alias("h2"),
        ).collect()
    }
    con = duckdb.connect()
    expected = set()
    for t in toks:
        r = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 12)) AS BIGINT),"
            "       CAST(('0x' || substr(md5(?), 13, 12)) AS BIGINT)",
            [t, t],
        ).fetchone()
        expected.add((t, r[0], r[1]))
    con.close()
    assert got == expected


scan_rows = st.lists(
    st.tuples(st.integers(-1000, 1000), st.integers(-50, 50)),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(rows=scan_rows, agg=st.sampled_from(["sum", "min", "max", "count"]),
       n=st.sampled_from([1, 3, 7]))
@settings(**SETTINGS)
def test_running_agg_matches_python_scan(spark, rows, agg, n):
    """Two-phase distributed scan == sequential Python scan for every agg
    kind, bucket count, and an arbitrary (unique-keyed) input."""
    from scio_spark.operators.scan import running_agg

    df = spark.createDataFrame(rows, "k int, v int").repartition(4)
    got = {
        r.k: r.running
        for r in running_agg(
            df, "k", None if agg == "count" else "v", agg=agg, num_partitions=n
        ).collect()
    }
    expect, acc, cnt = {}, None, 0
    for k, v in sorted(rows):
        cnt += 1
        if agg == "sum":
            acc = v if acc is None else acc + v
        elif agg == "min":
            acc = v if acc is None else min(acc, v)
        elif agg == "max":
            acc = v if acc is None else max(acc, v)
        expect[k] = cnt if agg == "count" else acc
    assert got == expect


@given(rows=scan_rows, k=st.sampled_from([1, 2, 5]))
@settings(**SETTINGS)
def test_ntile_matches_python_ntile(spark, rows, k):
    """Distributed NTILE == the SQL definition: first n%k buckets get
    ceil(n/k) rows, in (v, k) order."""
    from scio_spark.operators.scan import ntile

    df = spark.createDataFrame(rows, "k int, v int").repartition(3)
    got = {r.k: r.bucket for r in ntile(df, k, ["v", "k"]).collect()}
    n = len(rows)
    q, r = divmod(n, k)
    expect = {}
    for pos, (key, _v) in enumerate(
        sorted(rows, key=lambda t: (t[1], t[0])), start=1
    ):
        if pos <= r * (q + 1):
            expect[key] = (pos - 1) // (q + 1) + 1
        else:
            expect[key] = r + (pos - r * (q + 1) - 1) // q + 1
    assert got == expect
