"""Phase profiler for the persisted-index ANN family (VERDICT r15 item 3).

Replicates the entry fixtures for ann_pq_index / ann_ivf_appended /
ann_ivfpq_index / ann_ivf_streamed, timing each lifecycle phase separately
(build, append, search-construction, search-execution via noop sink) in one
warm session, twice each, so we can see whether the cost is job-count
(writes/metadata/guards) or the exhaustive rescore volume.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from scio_spark.context import build_session  # noqa: E402

spark = build_session("profile_ann")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"  {label:32s} {time.perf_counter() - t0:6.3f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


emb_all = spark.read.parquet(f"{SF}/embeddings.parquet")
emb_all.count()  # warm scan

for rep in (1, 2):
    print(f"=== ann_pq_index rep {rep}")
    from scio_spark.functions.pq import (
        append_pq_index, build_pq_index, search_pq_index,
    )
    emb = emb_all.select("vec_id", "embedding").filter("vec_id < 2000")
    path = tempfile.mkdtemp(prefix="prof_pqidx_") + "/idx"
    t("build_pq_index", lambda: build_pq_index(
        emb.filter("vec_id < 300"), path, m=8, n_codes=16, iters=4))
    t("append_pq_index", lambda: append_pq_index(
        spark, path, emb.filter("vec_id >= 300")))
    qs = emb.filter("vec_id % 40 = 2")
    res = t("search construct", lambda: search_pq_index(
        spark, path, qs, k=3, oversample=700, score_decimals=5))
    t("search exec (noop)", lambda: noop(res))

    print(f"=== ann_ivf_appended rep {rep}")
    from scio_spark.functions.ivf import (
        append_ivf_index, build_ivf_index, search_ivf_index,
    )
    emb2 = emb_all.select("vec_id", "embedding")
    path2 = tempfile.mkdtemp(prefix="prof_ivfidx_") + "/idx"
    t("build_ivf_index", lambda: build_ivf_index(
        emb2.filter("vec_id < 300"), path2, n_clusters=8, max_iter=2))
    t("append_ivf_index", lambda: append_ivf_index(
        spark, path2, emb2.filter("vec_id >= 300")))
    qs2 = emb2.filter("vec_id % 10 = 1")
    res2 = t("search construct", lambda: search_ivf_index(
        spark, path2, qs2, k=3, n_probe=8, score_decimals=5))
    t("search exec (noop)", lambda: noop(res2))

    print(f"=== ann_ivfpq_index rep {rep}")
    from scio_spark.functions.pq import (
        append_ivfpq_index, build_ivfpq_index, search_ivfpq_index,
    )
    emb3 = emb_all.select("vec_id", "embedding").filter("vec_id < 2000")
    path3 = tempfile.mkdtemp(prefix="prof_ivfpqidx_") + "/idx"
    t("build_ivfpq_index", lambda: build_ivfpq_index(
        emb3.filter("vec_id < 300"), path3, n_clusters=8, m=8, n_codes=16,
        iters=4, max_iter=2, residual=True))
    t("append_ivfpq_index", lambda: append_ivfpq_index(
        spark, path3, emb3.filter("vec_id >= 300")))
    qs3 = emb3.filter("vec_id % 40 = 3")
    res3 = t("search construct", lambda: search_ivfpq_index(
        spark, path3, qs3, k=3, n_probe=8, oversample=700, score_decimals=5))
    t("search exec (noop)", lambda: noop(res3))

    print(f"=== ann_ivf_streamed rep {rep}")
    from scio_spark.functions.ivf import cosine_topk_ivf_streamed
    qs4 = emb_all.filter("vec_id % 10 = 0")
    res4 = t("construct (train+probe)", lambda: cosine_topk_ivf_streamed(
        emb_all, qs4, k=3, n_clusters=8, n_probe=8, sample_fraction=0.5,
        score_decimals=5, max_iter=2))
    t("exec (noop)", lambda: noop(res4))
