"""Service-backed connectors — import/classpath-gated entry points.

The reference ships connectors for BigQuery, PubSub, Bigtable, Kafka (via
Beam), Iceberg, Elasticsearch, Redis, Neo4j, Cassandra, Snowflake, JDBC
(SURVEY §2.6). Their Spark equivalents are established third-party or
built-in connectors; this environment has neither the services nor the
connector jars, so each helper here resolves the right Spark format and
fails with an actionable error when the jar/service is absent — the same
"document, gate, don't fake" policy as multimodal decoding.

JDBC is built into Spark and exposed on ScioContext.jdbc already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _format_available(spark: SparkSession, fmt: str) -> bool:
    try:
        spark.read.format(fmt).load("/nonexistent-probe")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # "Failed to find data source" / ClassNotFound → jar missing;
        # path/option errors → the format itself resolved fine
        return not (
            "Failed to find data source" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
            or "ClassNotFoundException" in msg
        )


def kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """PubsubIO analog (scio-gcp pubsub/PubsubIO.scala:48-105) on the
    idiomatic Spark bus: readStream.format('kafka')."""
    if not _format_available(spark, "kafka"):
        raise NotImplementedError(
            "kafka connector jar (spark-sql-kafka) not on the classpath in "
            "this environment; add org.apache.spark:spark-sql-kafka-0-10 to use"
        )
    return (  # pragma: no cover
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def iceberg_table(spark: SparkSession, table: str) -> DataFrame:
    """saveAsIceberg analog (scio-managed IcebergIO.scala) — first-class in
    Spark via the Iceberg catalog."""
    try:
        return spark.read.table(table)
    except Exception as e:  # noqa: BLE001
        raise NotImplementedError(
            f"iceberg catalog/table {table!r} unavailable: configure "
            "spark.sql.catalog.<name> with the iceberg runtime jar"
        ) from e


def bigquery_read(spark: SparkSession, table: str) -> DataFrame:
    """bigQueryTable analog (scio-gcp bigquery syntax) via the
    spark-bigquery connector."""
    if not _format_available(spark, "bigquery"):
        raise NotImplementedError(
            "spark-bigquery connector not on the classpath in this environment"
        )
    return spark.read.format("bigquery").option("table", table).load()  # pragma: no cover
