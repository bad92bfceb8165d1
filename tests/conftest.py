import pytest

from scio_spark.context import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("scio_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sc(spark):
    from scio_spark import ScioContext

    return ScioContext(spark)


def rows(df, *cols):
    """Collect to a sorted list of tuples for order-insensitive equality."""
    if cols:
        df = df.select(*cols)
    return sorted([tuple(r) for r in df.collect()], key=repr)
