"""tools/gen_testdata.py — the scale-evidence generator must stay
driver-shaped: exact schema equality with the shipped testdata, the
near-dup seeding the dedup families rely on, normalized embeddings,
and the NTZ timestamp encoding."""

import duckdb
import numpy as np
import pytest

from tools.gen_testdata import generate

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("gen") / "sf0001"
    generate(0.001, str(out), seed=7)
    return str(out)


def test_schemas_match_driver_testdata(gen_dir):
    con = duckdb.connect()
    for t in TABLES:
        ours = con.sql(f"DESCRIBE SELECT * FROM '{gen_dir}/{t}.parquet'").fetchall()
        theirs = con.sql(
            f"DESCRIBE SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        ).fetchall()
        assert ours == theirs, f"{t}: {ours} != {theirs}"


def test_documents_have_near_dups_and_true_n_chars(gen_dir):
    con = duckdb.connect()
    dups = con.sql(
        f"""SELECT COUNT(*) FROM '{gen_dir}/documents.parquet' a,
            '{gen_dir}/documents.parquet' b
            WHERE a.doc_id < b.doc_id AND b.text = a.text || ' dup'"""
    ).fetchone()[0]
    assert dups > 0  # the dedup families need planted near-dups
    bad = con.sql(
        f"SELECT COUNT(*) FROM '{gen_dir}/documents.parquet' "
        f"WHERE n_chars != length(text)"
    ).fetchone()[0]
    assert bad == 0


def test_embeddings_are_unit_norm(gen_dir):
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{gen_dir}/embeddings.parquet")
    mat = np.array(emb.column("embedding").to_pylist(), np.float64)
    assert mat.shape[1] == 64
    assert np.allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-5)


def test_referential_integrity_and_timestamp_encoding(gen_dir):
    con = duckdb.connect()
    orphans = con.sql(
        f"""SELECT COUNT(*) FROM '{gen_dir}/lineitem.parquet' l
            LEFT JOIN '{gen_dir}/orders.parquet' o
              ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"""
    ).fetchone()[0]
    assert orphans == 0
    # NTZ encoding: TIMESTAMP (micros, no tz), same as the driver files —
    # DuckDB types both as plain TIMESTAMP
    t = con.sql(
        f"SELECT typeof(ts) FROM '{gen_dir}/events.parquet' LIMIT 1"
    ).fetchone()[0]
    assert t == "TIMESTAMP"
    # events ts strictly inside the 30-day window, increasing with id
    lo, hi = con.sql(
        f"SELECT MIN(ts), MAX(ts) FROM '{gen_dir}/events.parquet'"
    ).fetchone()
    assert str(lo).startswith("2024-01-01") and str(hi).startswith("2024-01-3")
