"""Trained quality-classifier tests (functions/quality_model.py)."""

import pytest
from pyspark.sql import functions as F

from scio_spark.functions.quality_model import (
    quality_filter,
    score_quality,
    train_quality_classifier,
)


@pytest.fixture(scope="module")
def labeled(spark):
    good = [
        (f"the quick brown fox studies history and writes essays number {i}", 1.0)
        for i in range(120)
    ]
    bad = [
        (f"click here buy now xx{i} free spam winner casino jackpot {i}", 0.0)
        for i in range(120)
    ]
    return spark.createDataFrame(good + bad, "text string, label double")


@pytest.fixture(scope="module")
def model(labeled):
    return train_quality_classifier(labeled, n_features=1 << 14)


def test_separates_held_out_styles(spark, model):
    test = spark.createDataFrame(
        [
            (1, "the fox writes careful essays about history"),
            (2, "buy now free winner casino click spam"),
        ],
        "id long, text string",
    )
    got = {r.id: r.quality_prob for r in score_quality(model, test).collect()}
    assert got[1] > 0.9
    assert got[2] < 0.1


def test_scoring_adds_one_column_no_ml_residue(spark, model):
    df = spark.createDataFrame([(1, "some text")], "id long, text string")
    out = score_quality(model, df)
    assert set(out.columns) == {"id", "text", "quality_prob"}


def test_scoring_plan_is_shuffle_free(spark, model):
    df = spark.createDataFrame([(1, "words here")], "id long, text string")
    plan = score_quality(model, df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_filter_threshold(spark, model, labeled):
    kept = quality_filter(model, labeled.drop("label"), threshold=0.5)
    texts = [r.text for r in kept.collect()]
    assert texts and all("spam" not in t for t in texts)


def test_model_roundtrips_through_save(tmp_path, spark, model):
    p = str(tmp_path / "qmodel")
    model.write().overwrite().save(p)
    from pyspark.ml import PipelineModel

    back = PipelineModel.load(p)
    df = spark.createDataFrame([(1, "fox essays history")], "id long, text string")
    a = score_quality(model, df).head().quality_prob
    b = score_quality(back, df).head().quality_prob
    assert a == b


def test_scoring_survives_session_observations(spark, labeled):
    """Regression: in Spark 4.1 a fitted LR model's training summary pins
    the training Dataset -> session -> ObservationManager, and once ANY
    df.observe has run in the session (scio_spark.metrics does), scoring
    dies with 'Task not serializable'. train_quality_classifier detaches
    the summary, so training and scoring work in an observation-tainted
    session."""
    from pyspark.sql import Observation

    obs = Observation("qm_regression")
    spark.range(3).observe(obs, F.count(F.lit(1)).alias("n")).collect()
    m = train_quality_classifier(labeled, n_features=1 << 12)
    out = score_quality(
        m, spark.createDataFrame([(1, "buy spam now")], "id long, text string")
    )
    assert out.head().quality_prob < 0.5
