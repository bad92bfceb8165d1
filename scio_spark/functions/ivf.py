"""IVF (inverted-file) approximate nearest neighbor — the k-means scale path.

Complements functions/similarity.py: hyperplane LSH needs no training but
gives uncontrolled bucket sizes; IVF trains a coarse quantizer (k-means
centroids), assigns every corpus vector to its nearest centroid (the
"inverted lists"), and searches only the ``n_probe`` lists nearest to each
query. The classic FAISS-style layout expressed as DataFrames:

- train: pyspark.ml KMeans on a corpus sample (one pass, driver-held
  centroids — `n_clusters × dim` floats, trivially broadcastable);
- assign: Arrow-batched numpy GEMM against the broadcast centroid matrix
  (plan size constant in n_clusters — literal expansion dies at k ≥ ~256);
- search: query → n_probe nearest centroids → semi-join the corpus on
  centroid id → exact re-rank. Corpus scan work drops by ~n_probe/n_clusters.

At 100 TB the inverted lists would be a bucketed/partitioned table on
``centroid`` (operators/smb.py), making each query's probe a partition-pruned
read instead of a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _centroids(
    corpus: DataFrame,
    vec_col: str,
    n_clusters: int,
    seed: int,
    sample_fraction: float,
    max_iter: int = 8,
):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sample = corpus.sample(False, sample_fraction, seed) if sample_fraction < 1.0 else corpus
    train = sample.select(array_to_vector(F.col(vec_col)).alias("features"))
    # a coarse quantizer doesn't need convergence — a few Lloyd iterations
    # position centroids well enough for probe routing (recall is governed by
    # n_probe, not centroid optimality)
    model = KMeans(k=n_clusters, seed=seed, maxIter=max_iter).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _with_centroid(df: DataFrame):
    from pyspark.sql.types import IntegerType, StructField, StructType

    # fresh StructType — StructType.add mutates the DataFrame's cached schema
    return StructType(
        list(df.schema.fields) + [StructField("centroid", IntegerType())]
    )


def assign_centroid(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Nearest centroid by cosine (vectors normalized ⇒ max dot product):
    one numpy GEMM per Arrow batch against the broadcast centroid matrix.

    A literal-expression argmax works at k≈16 but the generated code grows
    O(k·dim) and blows past the JIT/codegen limits at realistic k (256–4096);
    the GEMM keeps the plan size constant in k."""
    import numpy as np

    cent = np.array(centroids, dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast(cent)
    schema = _with_centroid(df)

    def gen(batches):
        c = bc.value
        for pdf in batches:
            pdf = pdf.copy()
            if pdf.empty:
                pdf["centroid"] = np.array([], dtype="int32")
            else:
                mat = np.array(list(pdf[vec_col]), dtype=np.float64)
                pdf["centroid"] = np.argmax(mat @ c.T, axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(gen, schema)


def probe_centroids(df: DataFrame, vec_col: str, centroids: list[list[float]], n_probe: int) -> DataFrame:
    """Each query row → its n_probe nearest centroid ids (row replicated
    n_probe×), via the same broadcast-GEMM pattern; ties broken by lower
    centroid id (stable argsort) for deterministic probing."""
    import numpy as np

    cent = np.array(centroids, dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast(cent)
    schema = _with_centroid(df)

    def gen(batches):
        c = bc.value
        p = min(n_probe, c.shape[0])
        for pdf in batches:
            if pdf.empty:
                pdf = pdf.copy()
                pdf["centroid"] = np.array([], dtype="int32")
                yield pdf
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            idx = np.argsort(-(mat @ c.T), axis=1, kind="stable")[:, :p]
            out = pdf.loc[pdf.index.repeat(p)].copy()
            out["centroid"] = idx.reshape(-1).astype("int32")
            yield out

    return df.mapInPandas(gen, schema)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
    sample_fraction: float = 1.0,
    max_iter: int = 8,
) -> list[list[float]]:
    """Persist the inverted lists as a centroid-PARTITIONED parquet table —
    the 100 TB layout: each query's probe becomes a partition-pruned read
    of n_probe directories instead of a corpus scan. Centroids are stored
    alongside (<path>__centroids as single-file JSON via the same
    filesystem). Returns the centroids."""
    cents = _centroids(corpus, vec_col, n_clusters, seed, sample_fraction, max_iter)
    assigned = assign_centroid(corpus.select(id_col, vec_col), vec_col, cents)
    assigned.write.mode("overwrite").partitionBy("centroid").parquet(path)
    spark = corpus.sparkSession
    import json

    spark.createDataFrame(
        [(json.dumps(cents),)], "centroids string"
    ).coalesce(1).write.mode("overwrite").json(path.rstrip("/") + "__centroids")
    return cents


def search_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    score_decimals: int | None = None,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Search a persisted IVF index: route each query to its n_probe nearest
    centroids, then read ONLY those partitions (`centroid IN (...)` reaches
    the scan as a PartitionFilter — assert via .explain) and exact-fold
    re-rank. The probed-centroid set is collected from the (broadcast-sized
    by contract — guarded by ``max_query_rows``, since the routed query set
    is broadcast into the pruned-partition join) query set; the corpus is
    touched only through pruned
    partition directories."""
    import json

    from scio_spark.functions.similarity import require_side_input_sized

    require_side_input_sized(
        queries, max_query_rows, "search_ivf_index", "max_query_rows"
    )
    cents_df = spark.read.json(path.rstrip("/") + "__centroids")
    cents = json.loads(cents_df.collect()[0]["centroids"])
    probes = probe_centroids(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv",
        cents,
        n_probe,
    )
    probed = sorted({r["centroid"] for r in probes.select("centroid").distinct().collect()})
    inv = (
        spark.read.parquet(path)
        .filter(F.col("centroid").isin(probed))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            "centroid",
        )
    )
    scored = (
        inv.join(F.broadcast(probes), "centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            F.aggregate(
                F.zip_with(
                    F.col("__qv"), F.col("__cv"),
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    if score_decimals is not None:
        scored = scored.withColumn("score", F.round("score", score_decimals))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_fraction: float = 1.0,
    score_decimals: int | None = None,
    max_iter: int = 8,
) -> DataFrame:
    """IVF ANN: (query_id, neighbor_id, score, rank) searching only the
    n_probe nearest inverted lists per query. Scores come from the exact
    sequential fold (rounded BEFORE ranking when ``score_decimals`` is set),
    so with n_probe = n_clusters the output is oracle-exact top-k."""
    cents = _centroids(corpus, vec_col, n_clusters, seed, sample_fraction, max_iter)
    inv = assign_centroid(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        cents,
    )
    probes = probe_centroids(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv",
        cents,
        n_probe,
    )
    scored = (
        inv.join(F.broadcast(probes), "centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            F.aggregate(
                F.zip_with(
                    F.col("__qv"), F.col("__cv"), lambda x, y: x.cast("double") * y.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    if score_decimals is not None:
        scored = scored.withColumn("score", F.round("score", score_decimals))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
