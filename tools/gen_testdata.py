"""Generate driver-shaped synthetic testdata at arbitrary scale factors.

The driver ships read-only parquet at sf0.001/0.01/0.1 (TESTDATA.md);
scale-evidence runs need bigger inputs. This reproduces the generator
SHAPE — schemas, value distributions, key ranges, the near-dup seeding
in ``documents``, the NTZ timestamp encoding (timestamp[us] without a
timezone, which Spark reads as TIMESTAMP_NTZ like the driver files) —
scaled by row count:

    table      rows(sf)
    region     5            nation    25
    customer   150,000*sf   supplier  10,000*sf
    part       200,000*sf   orders    1,500,000*sf
    lineitem   ~6,000,000*sf (per-order line counts, 0-7, mean ~4)
    events     1,000,000*sf (users = customers/10, 30-day window)
    documents  50,000*sf (~5% near-dups: donor text + ' dup')
    embeddings max(500, 20,000*sf), 64-dim L2-normalized

Exact per-value equality with the driver files is NOT a goal (the
oracle gate compares Spark vs DuckDB on the SAME files, so it is
self-consistent on any input); distribution shape and referential
integrity are.

Usage: python tools/gen_testdata.py SF OUTDIR [SEED]
e.g.:  python tools/gen_testdata.py 1 localdata/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO", "ECONOMY"]
ADJ = ["small", "red", "blue", "hot", "old", "big", "new", "dim"]
NOUN = ["ring", "widget", "bolt", "gear", "gizmo", "cog", "plate"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.44, 0.14, 0.14, 0.14, 0.14]
VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "window", "spark", "order", "data", "column",
    "join", "small", "line", "customer", "query", "the", "a", "big",
    "filter", "group", "sort", "stream", "vector",
]

EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")


def _write(outdir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=1 << 20)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts_days(rng, n, span_days, start=EPOCH_1995):
    return start.astype("datetime64[us]") + (
        rng.integers(0, span_days, n) * 86_400_000_000
    ).astype("timedelta64[us]")


def generate(sf: float, outdir: str, seed: int = 42) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = max(15, int(150_000 * sf))
    n_supp = max(10, int(10_000 * sf))
    n_part = max(20, int(200_000 * sf))
    n_ord = max(150, int(1_500_000 * sf))
    n_ev = max(100, int(1_000_000 * sf))
    n_doc = max(50, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))
    n_users = max(1, n_cust // 10)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(
                rng.integers(0, len(ADJ), n_part),
                rng.integers(0, len(NOUN), n_part),
            )
        ],
        "p_brand": [f"Brand#{b}" for b in rng.integers(0, 25, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    }))

    o_orderdate = _ts_days(rng, n_ord, 2404)  # 1995-01-01 .. 2001-08-01
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]
        ),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(o_orderdate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    # lineitem: per-order line counts in 0..7 (mean ~4), linenumber 1..n
    nlines = np.clip(rng.poisson(4.0, n_ord), 0, 7)
    l_orderkey = np.repeat(np.arange(n_ord), nlines)
    n_li = l_orderkey.size
    l_linenumber = (
        np.arange(n_li) - np.repeat(np.cumsum(nlines) - nlines, nlines) + 1
    )
    ship = (
        o_orderdate[l_orderkey]
        + (rng.integers(1, 96, n_li) * 86_400_000_000).astype(
            "timedelta64[us]"
        )
    )
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))

    # events: increasing ts over a fixed 30-day window (exponential gaps)
    gaps = rng.exponential(1.0, n_ev)
    ts_us = (
        np.cumsum(gaps) / gaps.sum() * (30 * 86_400_000_000 - 2)
    ).astype(np.int64)
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(
            EPOCH_2024 + ts_us.astype("timedelta64[us]"), pa.timestamp("us")
        ),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.uniform(0.01, 500.0, n_ev) ** 1.0, 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: bag-of-words text; ~5% near-dups = donor + ' dup'
    vocab = np.array(VOCAB)
    lens = rng.integers(8, 91, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.05:
            donor = texts[int(rng.integers(0, i))]
            texts.append(donor + " dup")
        else:
            texts.append(
                " ".join(vocab[rng.integers(0, len(vocab), lens[i])])
            )
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(
            np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]
        ),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb = rng.standard_normal((n_emb, 64))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            emb.astype(np.float32).tolist(), pa.list_(pa.float32())
        ),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    print(f"generating sf={sf} -> {outdir} (seed={seed})")
    generate(sf, outdir, seed)
