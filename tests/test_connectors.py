"""Service-connector gating tests: every shim resolves the idiomatic Spark
DataSource and raises an ACTIONABLE NotImplementedError when the jar is
absent (this environment has none of them) — the documented
"document, gate, don't fake" policy. Each error must name the missing
artifact so the failure is self-serviceable."""

import pytest

from scio_spark.sources import connectors as C


@pytest.mark.parametrize(
    "call, needle",
    [
        (lambda s: C.bigtable_read(s, "p", "i", "t"), "spark-bigtable"),
        (lambda s: C.datastore_read(s, "gs://bucket/export"), "export"),
        (lambda s: C.spanner_read(s, "p", "i", "d", "t"), "spanner"),
        (lambda s: C.redis_read(s, "localhost", 6379, "*"), "spark-redis"),
        (lambda s: C.cassandra_read(s, "ks", "t"), "cassandra"),
        (lambda s: C.neo4j_cypher(s, "bolt://x", "MATCH (n) RETURN n"), "neo4j"),
        (lambda s: C.snowflake_read(s, {}, "SELECT 1"), "snowflake"),
    ],
)
def test_connector_gated_with_actionable_error(spark, call, needle):
    with pytest.raises(NotImplementedError, match=needle):
        call(spark)


def test_es_write_gated(spark):
    df = spark.range(1)
    with pytest.raises(NotImplementedError, match="elasticsearch-spark"):
        C.elasticsearch_write(df, "localhost", "idx")
