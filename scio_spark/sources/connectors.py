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


def bigtable_read(
    spark: SparkSession, project: str, instance: str, table: str
) -> DataFrame:
    """bigtable analog (scio-gcp bigtable/BigTableIO.scala) via Google's
    spark-bigtable connector (format 'bigtable'); Bigtable also speaks the
    HBase API, so the HBase-Spark connector is the fallback mapping."""
    if not _format_available(spark, "bigtable"):
        raise NotImplementedError(
            "spark-bigtable connector not on the classpath in this "
            "environment; add com.google.cloud.spark.bigtable:spark-bigtable "
            "(or the hbase-spark connector against the HBase API) to use"
        )
    return (  # pragma: no cover
        spark.read.format("bigtable")
        .option("spark.bigtable.project.id", project)
        .option("spark.bigtable.instance.id", instance)
        .option("catalog", table)
        .load()
    )


def datastore_read(spark: SparkSession, export_path: str) -> DataFrame:
    """datastore analog (scio-gcp datastore/DatastoreIO.scala). Datastore
    has no maintained Spark DataSource; the idiomatic Spark path is the
    managed-export pattern: gcloud datastore export → entity files on GCS →
    read here. Exports are LevelDB-log-wrapped protobuf Entity records —
    gated until a decoder for that framing is needed; Firestore-in-
    Datastore-mode exports can instead be loaded to BigQuery and read via
    bigquery_read."""
    raise NotImplementedError(
        "datastore: no Spark DataSource exists; export the database "
        "(gcloud datastore export) and read the export — or route through "
        "BigQuery (load export, then bigquery_read). "
        f"(requested export path: {export_path!r})"
    )


def spanner_read(
    spark: SparkSession, project: str, instance: str, database: str, table: str
) -> DataFrame:
    """spanner analog (scio-gcp spanner/SpannerIO.scala) via Google's
    spark-spanner connector (format 'cloud-spanner')."""
    if not _format_available(spark, "cloud-spanner"):
        raise NotImplementedError(
            "spark-spanner connector not on the classpath in this "
            "environment; add com.google.cloud.spark:spark-3.1-spanner to use"
        )
    return (  # pragma: no cover
        spark.read.format("cloud-spanner")
        .option("projectId", project)
        .option("instanceId", instance)
        .option("databaseId", database)
        .option("table", table)
        .load()
    )


def elasticsearch_write(
    df: DataFrame, nodes: str, index: str, mode: str = "append"
) -> None:
    """saveAsElasticsearch analog (scio-elasticsearch common/.../
    ElasticsearchIO.scala) via the official es-hadoop Spark DataSource
    (format 'org.elasticsearch.spark.sql')."""
    if not _format_available(df.sparkSession, "org.elasticsearch.spark.sql"):
        raise NotImplementedError(
            "elasticsearch-spark connector not on the classpath in this "
            "environment; add org.elasticsearch:elasticsearch-spark-30 to use"
        )
    (  # pragma: no cover
        df.write.format("org.elasticsearch.spark.sql")
        .option("es.nodes", nodes)
        .mode(mode)
        .save(index)
    )


def redis_read(spark: SparkSession, host: str, port: int, keys_pattern: str) -> DataFrame:
    """redis analog (scio-redis RedisIO.scala) via spark-redis
    (format 'org.apache.spark.sql.redis')."""
    if not _format_available(spark, "org.apache.spark.sql.redis"):
        raise NotImplementedError(
            "spark-redis connector not on the classpath in this environment; "
            "add com.redislabs:spark-redis to use"
        )
    return (  # pragma: no cover
        spark.read.format("org.apache.spark.sql.redis")
        .option("host", host)
        .option("port", port)
        .option("keys.pattern", keys_pattern)
        .load()
    )


def cassandra_read(spark: SparkSession, keyspace: str, table: str) -> DataFrame:
    """saveAsCassandra analog (scio-cassandra cassandra3/.../
    CassandraIO.scala) via the DataStax connector
    (format 'org.apache.spark.sql.cassandra')."""
    if not _format_available(spark, "org.apache.spark.sql.cassandra"):
        raise NotImplementedError(
            "spark-cassandra connector not on the classpath in this "
            "environment; add com.datastax.spark:spark-cassandra-connector to use"
        )
    return (  # pragma: no cover
        spark.read.format("org.apache.spark.sql.cassandra")
        .options(keyspace=keyspace, table=table)
        .load()
    )


def neo4j_cypher(spark: SparkSession, url: str, query: str) -> DataFrame:
    """neo4jCypher analog (scio-neo4j Neo4jIO.scala) via the official
    neo4j-spark connector (format 'org.neo4j.spark.DataSource')."""
    if not _format_available(spark, "org.neo4j.spark.DataSource"):
        raise NotImplementedError(
            "neo4j-spark connector not on the classpath in this environment; "
            "add org.neo4j:neo4j-connector-apache-spark to use"
        )
    return (  # pragma: no cover
        spark.read.format("org.neo4j.spark.DataSource")
        .option("url", url)
        .option("query", query)
        .load()
    )


def snowflake_read(
    spark: SparkSession, options: dict, query: str
) -> DataFrame:
    """snowflakeQuery analog (scio-snowflake SnowflakeIO.scala) via the
    official spark-snowflake DataSource
    (format 'net.snowflake.spark.snowflake')."""
    if not _format_available(spark, "net.snowflake.spark.snowflake"):
        raise NotImplementedError(
            "spark-snowflake connector not on the classpath in this "
            "environment; add net.snowflake:spark-snowflake to use"
        )
    return (  # pragma: no cover
        spark.read.format("net.snowflake.spark.snowflake")
        .options(**options)
        .option("query", query)
        .load()
    )
