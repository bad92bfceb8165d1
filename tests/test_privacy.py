"""k-anonymity tests (functions/privacy.py)."""

from pyspark.sql import functions as F

from scio_spark.functions.privacy import k_anonymity_report, k_suppress


def fixture(spark):
    rows = (
        [("10001", "1980", "m", i) for i in range(5)]       # group of 5
        + [("10002", "1990", "f", 100 + i) for i in range(2)]  # group of 2
        + [("99999", "1975", "x", 999)]                        # singleton
        + [(None, "1980", "m", 50), (None, "1980", "m", 51)]   # null group of 2
    )
    return spark.createDataFrame(rows, "zip string, birth string, sex string, id long")


def test_report(spark):
    r = k_anonymity_report(fixture(spark), ["zip", "birth", "sex"], k=3).head()
    assert r.n_rows == 10 and r.n_groups == 4
    assert r.min_group_size == 1
    assert r.n_rows_below_k == 5  # 2 + 1 + 2
    assert r.n_groups_below_k == 3
    assert not r.is_k_anonymous


def test_suppress(spark):
    out = k_suppress(fixture(spark), ["zip", "birth", "sex"], k=3)
    assert out.count() == 5
    assert out.select("zip").distinct().collect()[0].zip == "10001"
    # post-suppression the table IS k-anonymous
    r = k_anonymity_report(out, ["zip", "birth", "sex"], k=3).head()
    assert r.is_k_anonymous


def test_suppress_k2_keeps_null_group(spark):
    out = k_suppress(fixture(spark), ["zip", "birth", "sex"], k=2)
    assert out.count() == 9  # only the singleton drops
    assert out.filter(F.col("zip").isNull()).count() == 2


def test_single_column_and_k1(spark):
    df = fixture(spark)
    assert k_suppress(df, "sex", k=1).count() == df.count()
    r = k_anonymity_report(df, "sex", k=2).head()
    assert r.min_group_size == 1  # the 'x' singleton
