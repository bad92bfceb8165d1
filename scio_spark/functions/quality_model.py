"""Trainable quality classifier for corpus filtering (fasttext-filter
analog).

Beyond-reference curation operator: production pipelines (CCNet, GPT-3,
LLaMA data work — public papers) filter web text with a lightweight linear
classifier trained to separate a "good" reference corpus (e.g. wiki/books)
from raw crawl. The heuristic scores in ``functions/text.py`` are the
zero-training tier; this module is the trained tier, built on Spark ML so
training is distributed and the fitted model is a first-class artifact
(save/load, broadcast scoring).

Pipeline: whitespace/regex tokens → hashed term frequencies (HashingTF —
fixed feature space, no vocabulary shuffle) → IDF → logistic regression.
Everything is JVM-side; scoring adds two narrow columns and no shuffle.

Scale notes: HashingTF means the feature space never needs a fitted
vocabulary (the usual CountVectorizer scale trap — a driver-held vocab);
IDF and LR train in O(passes) over the labeled set, which is a SAMPLE by
construction (label budgets are thousands-to-millions, not corpus-sized).
Scoring a 100 TB corpus is one map-side pass with the broadcast model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pipeline(text_col: str, n_features: int, reg_param: float, seed: int):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern=r"\s+", minTokenLength=1
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__tf", numFeatures=n_features, binary=False
    )
    idf = IDF(inputCol="__tf", outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="label",
        maxIter=50,
        regParam=reg_param,
        standardization=True,
    )
    return Pipeline(stages=[tok, tf, idf, lr])


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 18,
    reg_param: float = 1e-3,
    seed: int = 7,
):
    """Fit the quality model on a labeled sample: ``label_col`` is 1.0 for
    reference-quality docs, 0.0 for raw/rejected docs. Returns the fitted
    PipelineModel (save with ``model.write().save(path)``)."""
    df = labeled.select(
        F.col(text_col), F.col(label_col).cast("double").alias("label")
    )
    model = _pipeline(text_col, n_features, reg_param, seed).fit(df)
    _drop_training_summaries(model)
    return model


def _drop_training_summaries(model) -> None:
    """Detach fitted-stage training summaries. A summary pins the training
    DATASET, whose SparkSession reference the prediction UDF's closure then
    drags into task serialization — and in Spark 4.1 the session's
    ObservationManager is not serializable, so scoring dies with
    'Task not serializable' in any session where ANY df.observe ever ran
    (e.g. after scio_spark.metrics). Summaries are training-time
    diagnostics; the scoring artifact doesn't need them."""
    import pyspark

    sc = pyspark.SparkContext._active_spark_context
    for stage in getattr(model, "stages", []):
        if getattr(stage, "hasSummary", False):
            try:
                stage._java_obj.setSummary(sc._jvm.scala.Option.empty())
            except Exception:  # noqa: BLE001 — best-effort diagnostic detach
                pass


def score_quality(
    model,
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "quality_prob",
    keep_prediction: bool = False,
) -> DataFrame:
    """Append P(reference-quality | text) to every row — the number
    curation pipelines threshold or importance-sample on. One map-side
    pass (broadcast model), no shuffle; intermediate ML columns dropped."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    out = scored.withColumn(
        out_col, vector_to_array(F.col("probability")).getItem(1)
    )
    drop = ["__tokens", "__tf", "__features", "rawPrediction", "probability"]
    if not keep_prediction:
        drop.append("prediction")
    return out.drop(*drop)


def quality_filter(
    model, df: DataFrame, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Keep rows the model scores at or above ``threshold``."""
    return (
        score_quality(model, df, text_col)
        .filter(F.col("quality_prob") >= threshold)
        .drop("quality_prob")
    )
