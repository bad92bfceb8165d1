"""int8 scalar-quantization ANN tests (similarity.quantize_embeddings /
cosine_topk_sq8)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from scio_spark.functions.similarity import (
    cosine_topk,
    cosine_topk_sq8,
    quantize_embeddings,
)


@pytest.fixture(scope="module")
def vecs(spark):
    random.seed(23)
    data = []
    for i in range(300):
        v = [random.gauss(0, 1) for _ in range(32)]
        n = math.sqrt(sum(x * x for x in v))
        data.append((i, [x / n for x in v]))
    return spark.createDataFrame(data, ["vec_id", "embedding"])


def test_quantization_bounds_and_reconstruction(vecs):
    q = quantize_embeddings(vecs).collect()
    for r in q:
        s = r.scale
        assert s > 0
        assert all(-127 <= c <= 127 for c in r.code)
        # reconstruction error per component ≤ half a quantization step
        for x, c in zip(r.embedding, r.code):
            assert abs(x - c * s / 127) <= s / 127 * 0.5 + 1e-7


def test_quantization_is_pure_plan(vecs):
    """No UDF/python in the quantization plan — stays codegen'd."""
    plan = quantize_embeddings(vecs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sq8_recall_and_exact_scores(vecs):
    exact = cosine_topk(vecs, vecs, k=5)
    sq8 = cosine_topk_sq8(vecs, vecs, k=5, oversample=4)
    e = {(r.query_id, r.neighbor_id): r.score for r in exact.collect()}
    s = {(r.query_id, r.neighbor_id): r.score for r in sq8.collect()}
    hits = len(set(e) & set(s))
    recall = hits / len(e)
    assert recall >= 0.95, recall
    # survivors carry EXACT float scores (rescore), not quantized ones
    for pair in set(e) & set(s):
        assert e[pair] == s[pair]


def test_sq8_output_contract(vecs):
    out = cosine_topk_sq8(vecs.limit(50), vecs.limit(10), k=3)
    rows = out.collect()
    assert set(out.columns) == {"query_id", "neighbor_id", "score", "rank"}
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
