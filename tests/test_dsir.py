"""DSIR tests (functions/dsir.py): importance selection must prefer
target-like documents, Gumbel mode must be a seeded deterministic sample
biased the same way, and weights must order as the theory says."""

from scio_spark.functions.dsir import dsir_select, dsir_weights


def _corpora(spark):
    # target domain speaks vocabulary "alpha..", off-domain speaks "zeta.."
    tgt_rows = [(f"alpha{i % 7} beta{i % 5} gamma{i % 3} delta",) for i in range(40)]
    raw_rows = []
    for i in range(30):  # target-like raw docs: ids 0..29
        raw_rows.append((i, f"alpha{i % 7} beta{i % 5} gamma{i % 3} delta"))
    for i in range(30):  # off-domain raw docs: ids 100..129
        raw_rows.append((100 + i, f"zeta{i % 7} eta{i % 5} theta{i % 3} iota"))
    return (
        spark.createDataFrame(raw_rows, "doc_id long, text string"),
        spark.createDataFrame(tgt_rows, "text string"),
    )


def test_topk_prefers_target_like_docs(spark):
    raw, tgt = _corpora(spark)
    sel = {r.doc_id for r in dsir_select(raw, tgt, k=30, buckets=512).collect()}
    assert sel == set(range(30))  # exactly the target-like half


def test_weights_order(spark):
    raw, tgt = _corpora(spark)
    w = {r.doc_id: float(r.log_w) for r in dsir_weights(raw, tgt, buckets=512).collect()}
    assert min(w[i] for i in range(30)) > max(w[100 + i] for i in range(30))


def test_gumbel_mode_seeded_and_biased(spark):
    raw, tgt = _corpora(spark)
    a = {r.doc_id for r in dsir_select(raw, tgt, 20, mode="gumbel", seed=3).collect()}
    b = {r.doc_id for r in dsir_select(raw, tgt, 20, mode="gumbel", seed=3).collect()}
    c = {r.doc_id for r in dsir_select(raw, tgt, 20, mode="gumbel", seed=4).collect()}
    assert a == b and len(a) == 20     # seeded determinism
    assert a != c                      # the seed actually matters
    # overwhelming weight gap => the sample still lands mostly on-domain
    assert len([i for i in a if i < 100]) >= 15
