"""scio_spark — a PySpark-native analytics engine with the operator surface of
spotify/scio (Scala/Beam), re-expressed idiomatically on DataFrame / Spark SQL /
Structured Streaming.

Reference (read-only, public): /root/reference — see SURVEY.md for the full
operator inventory with file:line citations. This package is NOT a port: scio's
"optimizer" is its API surface (manual join-flavor selection, fanout hints);
ours is Catalyst + AQE, so most of scio's machinery collapses into declarative
DataFrame plans.

Layout:
  context.py            ScioContext (SparkSession wrapper, reads, test IO substitution)
  collection.py         SCollection — element-wise / aggregation / sampling ops
  pair.py               PairSCollection — keyed ops (*ByKey) and the join suite
  operators/joins.py    hash/sparse/skewed/multi join implementations
  operators/smb.py      sort-merge-bucket analog (bucketBy/sortBy writer + reader)
  operators/windows.py  fixed/sliding/session/calendar windowing (batch + streaming)
  functions/sketches.py approx distinct (HLL), quantiles, CMS, Bloom filters
  functions/stats.py    one-pass stats, histogram
  functions/text.py     language-id, quality score, token count, fingerprint
  functions/dedup.py    exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
  functions/similarity.py  brute-force + LSH-bucketed cosine top-k ANN
  functions/multimodal.py  binary-column (image/audio) plumbing (decode stubbed)
  sources/registry.py   named IO registry with JobTest-style substitution
  streaming/            watermark/stateful helpers, TestStream-style fixture
  plans/lint.py         plan inspection: shuffle counts, pushdown asserts
"""

from scio_spark.context import ScioContext, ScioResult
from scio_spark.collection import SCollection
from scio_spark.pair import PairSCollection

__version__ = "0.1.0"

__all__ = ["ScioContext", "ScioResult", "SCollection", "PairSCollection"]
