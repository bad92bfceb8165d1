"""IVF (inverted-file) approximate nearest neighbor — the k-means scale path.

Complements functions/similarity.py: hyperplane LSH needs no training but
gives uncontrolled bucket sizes; IVF trains a coarse quantizer (k-means
centroids), assigns every corpus vector to its nearest centroid (the
"inverted lists"), and searches only the ``n_probe`` lists nearest to each
query. The classic FAISS-style layout expressed as DataFrames:

- train: pyspark.ml KMeans on a corpus sample (one pass, driver-held
  centroids — `n_clusters × dim` floats, trivially broadcastable);
- assign: a JVM-side argmin over broadcast centroid literals (no Python);
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


def _dot_literal(vec_col, center: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(F.col(vec_col), arr, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_centroid(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Nearest centroid by cosine (vectors normalized ⇒ max dot product),
    as a pure expression argmax over centroid literals."""
    scored = F.array(
        *[
            F.struct(_dot_literal(vec_col, c).alias("d"), F.lit(i).alias("cid"))
            for i, c in enumerate(centroids)
        ]
    )
    return df.withColumn("centroid", F.array_max(scored)["cid"])


def probe_centroids(df: DataFrame, vec_col: str, centroids: list[list[float]], n_probe: int) -> DataFrame:
    """Each query row → n_probe nearest centroid ids (exploded)."""
    scored = F.array(
        *[
            F.struct(_dot_literal(vec_col, c).alias("d"), F.lit(i).alias("cid"))
            for i, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.sort_array(scored, asc=False), 1, n_probe)
    return df.withColumn("centroid", F.explode(F.transform(top, lambda s: s["cid"])))


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
) -> DataFrame:
    """IVF ANN: (query_id, neighbor_id, score, rank) searching only the
    n_probe nearest inverted lists per query."""
    cents = _centroids(corpus, vec_col, n_clusters, seed, sample_fraction)
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
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
