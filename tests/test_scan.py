"""Distributed prefix scan (operators/scan.py) + the training ops built on it.

The load-bearing assertions: (1) the two-phase scan equals the sequential
reference for every agg kind, on data spread over MANY partitions with an
adversarial initial layout; (2) no single-partition window over the data ever
appears in the plan (the partition-totals window sees #partitions rows only);
(3) pack_chunks / shuffle_positions replay their SQL spelling exactly.
"""

import pytest
from pyspark.sql import functions as F

from scio_spark.functions.training import pack_chunks, shuffle_positions
from scio_spark.operators.scan import row_numbers, running_agg


@pytest.fixture(scope="module")
def scan_df(spark):
    # 500 rows, values chosen so min/max prefixes actually move around,
    # scattered over 16 partitions in hash (not range) order.
    rows = [(i, (i * 37) % 211 - 100) for i in range(500)]
    return (
        spark.createDataFrame(rows, "k int, v int").repartition(16, "v").cache()
    )


def _seq(rows, agg, inclusive):
    """Sequential reference scan over (k, v) sorted by k."""
    out = {}
    acc = None
    n = 0
    for k, v in sorted(rows):
        before = acc if agg != "count" else n
        if agg == "sum":
            acc = v if acc is None else acc + v
        elif agg == "min":
            acc = v if acc is None else min(acc, v)
        elif agg == "max":
            acc = v if acc is None else max(acc, v)
        n += 1
        if agg == "count":
            out[k] = n if inclusive else before
        elif inclusive:
            out[k] = acc
        else:
            out[k] = 0 if (before is None and agg == "sum") else before
    return out


@pytest.mark.parametrize("agg", ["sum", "min", "max", "count"])
@pytest.mark.parametrize("inclusive", [True, False])
def test_running_agg_matches_sequential(scan_df, agg, inclusive):
    data = [(r.k, r.v) for r in scan_df.collect()]
    expect = _seq(data, agg, inclusive)
    got = {
        r.k: r.running
        for r in running_agg(
            scan_df,
            "k",
            None if agg == "count" else "v",
            agg=agg,
            inclusive=inclusive,
            num_partitions=13,
        ).collect()
    }
    assert got == expect


def test_running_agg_partition_invariance(scan_df):
    """Same answer at 1, 3, and 32 scan partitions (the 1-partition case
    degenerates to the naive window — the reference semantics)."""
    outs = []
    for n in (1, 3, 32):
        outs.append(
            sorted(
                (r.k, r.running)
                for r in running_agg(
                    scan_df, "k", "v", num_partitions=n
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_no_single_partition_window_over_data(scan_df):
    """The only global-order window in the plan runs over partition TOTALS
    (#partitions rows); the per-row window is partitioned by pid. Assert the
    data-side window spec carries a partition clause."""
    plan = running_agg(scan_df, "k", "v", num_partitions=8)._jdf.queryExecution().optimizedPlan().toString()
    # Two Window nodes: the data one must be partitioned by the pid column.
    assert "__scan_pid" in plan
    windows = [ln for ln in plan.splitlines() if "Window [" in ln or "windowspecdefinition" in ln]
    assert any("__scan_pid" in ln for ln in windows)


def test_row_numbers_is_rank(spark):
    df = spark.createDataFrame(
        [(c,) for c in "qwertyuiopasdfghjklzxcvbnm"], "s string"
    ).repartition(7)
    got = sorted((r.s, r.pos) for r in row_numbers(df, "s").collect())
    expect = sorted(
        (s, i + 1) for i, s in enumerate(sorted("qwertyuiopasdfghjklzxcvbnm"))
    )
    assert got == expect


def test_pack_chunks_assignment(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([3, 4, 5, 1, 7, 2, 6])],
        "doc_id int, text string",
    ).repartition(5)
    out = {
        r.doc_id: (r.tokens_before, r.chunk_id)
        for r in pack_chunks(docs, token_budget=8).collect()
    }
    # cumulative-before: 0,3,7,12,13,20,22 → chunks 0,0,0,1,1,2,2
    assert out == {
        0: (0, 0),
        1: (3, 0),
        2: (7, 0),
        3: (12, 1),
        4: (13, 1),
        5: (20, 2),
        6: (22, 2),
    }


def test_shuffle_positions_is_permutation_and_stable(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id int"
    ).repartition(9)
    a = {r.doc_id: r.pos for r in shuffle_positions(docs, "doc_id", seed=1).collect()}
    b = {r.doc_id: r.pos for r in shuffle_positions(docs, "doc_id", seed=1).collect()}
    c = {r.doc_id: r.pos for r in shuffle_positions(docs, "doc_id", seed=2).collect()}
    assert sorted(a.values()) == list(range(1, 201))
    assert a == b
    assert a != c  # a different seed is a different permutation


def test_running_agg_rejects_bad_args(scan_df):
    with pytest.raises(ValueError):
        running_agg(scan_df, "k", "v", agg="median")
    with pytest.raises(ValueError):
        running_agg(scan_df, "k", None, agg="sum")


@pytest.mark.parametrize("n,k", [(103, 4), (103, 5), (500, 8), (3, 7), (96, 8)])
def test_ntile_matches_sql_ntile(spark, n, k):
    """Distributed ntile == Spark SQL NTILE, including shapes where the
    remainder distribution differs from even spreading (103/5, 500/8) and
    n < k (every row its own bucket)."""
    from scio_spark.operators.scan import ntile

    df = spark.createDataFrame([(i, (i * 31) % 97) for i in range(n)], "k int, v int").repartition(8)
    got = {r.k: r.bucket for r in ntile(df, k, ["v", "k"]).collect()}
    df.createOrReplaceTempView("ntile_src")
    expect = {
        r.k: r.b
        for r in spark.sql(
            f"SELECT k, NTILE({k}) OVER (ORDER BY v, k) AS b FROM ntile_src"
        ).collect()
    }
    assert got == expect


def test_length_buckets_monotone(spark):
    """Bucket boundaries respect token-count order and sizes differ by <=1."""
    from collections import Counter

    from scio_spark.functions.training import length_buckets

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * ((i * 13) % 29 + 1))) for i in range(100)],
        "doc_id int, text string",
    ).repartition(6)
    out = length_buckets(docs, 4).select("doc_id", "__tokens", "bucket").collect()
    sizes = Counter(r.bucket for r in out)
    assert sorted(sizes) == [1, 2, 3, 4]
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # every doc in bucket b has tokens <= every doc in bucket b+1
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r["__tokens"])
    for b in (1, 2, 3):
        assert max(by_bucket[b]) <= min(by_bucket[b + 1])


def test_portable_shards_roundtrip(spark, tmp_path):
    """md5-hash sharding: deterministic membership, replayable in Python."""
    import hashlib

    from scio_spark.functions.training import write_training_shards

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(60)], "doc_id int, text string")
    p = str(tmp_path / "shards")
    write_training_shards(docs, p, n_shards=4, id_col="doc_id", seed=9, hash="md5")
    back = spark.read.parquet(p)
    got = {r.doc_id: r.shard for r in back.collect()}
    expect = {
        i: int(hashlib.md5(f"9|{i}".encode()).hexdigest()[:12], 16) % 4
        for i in range(60)
    }
    assert got == expect


def test_write_training_shards_rejects_bad_hash(spark, tmp_path):
    from scio_spark.functions.training import write_training_shards

    docs = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "x"), 2, "doc_id", hash="sha1")


def test_cap_per_key_deterministic(spark):
    import hashlib

    from scio_spark.functions.training import cap_per_key

    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id int, source string").repartition(5)
    out = sorted(r.doc_id for r in cap_per_key(df, "source", 4, "doc_id", seed=5).collect())
    # python replay: per source, 4 smallest by (md5-slice, id)
    expect = []
    by_src = {}
    for i, s in rows:
        h = int(hashlib.md5(f"5|{i}".encode()).hexdigest()[:12], 16)
        by_src.setdefault(s, []).append((h, i))
    for s, lst in by_src.items():
        expect += [i for _, i in sorted(lst)[:4]]
    assert out == sorted(expect)
    # idempotent re-run
    out2 = sorted(r.doc_id for r in cap_per_key(df, "source", 4, "doc_id", seed=5).collect())
    assert out == out2


def test_token_quota_per_key(spark):
    import hashlib

    from scio_spark.functions.training import token_quota_per_key

    rows = [(i, f"s{i % 2}", " ".join(["w"] * (i % 7 + 1))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string").repartition(4)
    out = sorted(
        r.doc_id
        for r in token_quota_per_key(df, "source", 10, "doc_id", seed=3).collect()
    )
    expect = []
    by_src = {}
    for i, s, t in rows:
        h = int(hashlib.md5(f"3|{i}".encode()).hexdigest()[:12], 16)
        by_src.setdefault(s, []).append((h, i, len(t.split())))
    for s, lst in by_src.items():
        taken = 0
        for _, i, tk in sorted(lst):
            if taken < 10:
                expect.append(i)
            taken += tk
    assert out == sorted(expect)
    # first row of every key survives even when it alone busts the budget
    big = spark.createDataFrame([(1, "a", " ".join(["w"] * 99))], "doc_id int, source string, text string")
    assert token_quota_per_key(big, "source", 10, "doc_id").count() == 1


def test_bucket_path_has_no_range_exchange(scan_df):
    """Numeric leading key takes the sampled-bucket path: no range exchange
    (the repartitionByRange + pid spelling costs a SECOND full-data shuffle
    because Catalyst re-exchanges for the window's pid distribution)."""
    df = running_agg(scan_df, "k", "v", num_partitions=8)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" not in plan or "rangepartitioning" not in plan


def test_string_key_falls_back_to_range_exchange(spark):
    """Non-numeric leading keys still work via the physical-range fallback."""
    df = spark.createDataFrame(
        [(c, i) for i, c in enumerate("zyxwvutsrq")], "s string, v int"
    ).repartition(4)
    got = {r.s: r.running for r in running_agg(df, "s", "v", num_partitions=3).collect()}
    acc, expect = 0, {}
    for s, v in sorted((c, i) for i, c in enumerate("zyxwvutsrq")):
        acc += v
        expect[s] = acc
    assert got == expect


def test_bucket_expr_plan_size_flat_at_high_partition_count(spark):
    """The searchsorted bucket expression must hold a CONSTANT node count:
    boundaries live in array literals, not one comparison node per
    boundary — at num_partitions=2048 the analyzed plan must not blow up
    (the old chained spelling grew one `(k > b)` node per partition)."""
    df = spark.range(100_000).select(
        F.col("id").cast("double").alias("k"),
        F.lit(1).alias("v"),
    )
    out = running_agg(df, "k", "v", agg="sum", num_partitions=2048)
    plan = out._jdf.queryExecution().analyzed().toString()
    # one aggregate lambda comparison regardless of partition count
    assert plan.count("lambda") < 20
    assert len(plan) < 100_000


def test_searchsorted_matches_bisect(spark):
    import bisect
    import random

    from scio_spark.operators.scan import _searchsorted

    random.seed(11)
    bounds = sorted({random.uniform(-50, 50) for _ in range(300)})
    df = spark.range(1500).select((F.rand(5) * 140 - 70).alias("k"))
    got = df.withColumn("b", _searchsorted(F.col("k"), bounds)).collect()
    for r in got:
        assert r["b"] == bisect.bisect_left(bounds, r["k"])


def test_searchsorted_single_boundary(spark):
    from scio_spark.operators.scan import _searchsorted

    df = spark.createDataFrame([(4.0,), (5.0,), (6.0,)], "k double")
    got = [
        (r.k, r.b)
        for r in df.withColumn("b", _searchsorted(F.col("k"), [5.0])).collect()
    ]
    assert got == [(4.0, 0), (5.0, 0), (6.0, 1)]


def test_searchsorted_outlier_and_nan_keys_clamp_not_overflow(spark):
    """Boundaries are sampled quantiles, so keys can sit arbitrarily far
    outside their span. The cell expression must clamp in DOUBLE space
    before the int cast — floor-then-cast overflowed BIGINT→INT for a
    1e10 outlier (ANSI: CAST_OVERFLOW crash; non-ANSI: wrapped bits →
    non-monotone buckets). NaN orders greatest in Spark, so it counts
    every boundary."""
    import bisect

    from scio_spark.operators.scan import _searchsorted

    bounds = [0.0, 0.5, 1.0, 1.5, 2.0]
    df = spark.createDataFrame(
        [(-1e10,), (-3.0,), (1.2,), (1e10,), (float("nan"),)], "k double"
    )
    got = {
        r.k: r.b
        for r in df.withColumn("b", _searchsorted(F.col("k"), bounds)).collect()
    }
    assert got[-1e10] == 0 and got[-3.0] == 0
    assert got[1.2] == bisect.bisect_left(bounds, 1.2)
    assert got[1e10] == len(bounds)
    import math

    nan_bucket = next(v for k, v in got.items() if isinstance(k, float) and math.isnan(k))
    assert nan_bucket == len(bounds)


def test_running_sum_with_null_values_matches_sql_window(spark):
    """A bucket whose whole prefix is NULL-valued must carry the offset
    from prior buckets, not poison the running sum to NULL (SQL's SUM
    skips NULLs; NULL + offset would not). Also pins the leading-NULLs
    case where SQL genuinely returns NULL."""
    rows = [(i, None if i % 3 == 0 else i) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, v int").repartition(16, "v")
    got = {
        r.k: r.run
        for r in running_agg(
            df, "k", "v", agg="sum", out_col="run", num_partitions=8
        ).collect()
    }
    acc = None
    for k, v in sorted(rows):
        if v is not None:
            acc = v if acc is None else acc + v
        assert got[k] == acc, f"k={k}: got {got[k]}, want {acc}"
