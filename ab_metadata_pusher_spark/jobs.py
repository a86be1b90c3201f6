"""Job dispatch + env-var contract (SURVEY.md §2.A A4, §2.F F5/F6).

The reference selects a job script from ``(TARGET_DB_TYPE,
TARGET_MESSAGE_QUEUE_TYPE)`` via a HOCON registry resolved in bash
(config/docker.conf:3-14, shell/bootstrap.sh:3-8) and configures it from
env vars with defaults (README.md:39-48).  Here the registry is an
in-process mapping to Pipeline factories, honoring the same env contract;
cron becomes whatever scheduler calls ``spark-submit`` (or the streaming
equivalents in streaming/ replace it entirely).
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ab_metadata_pusher_spark.config import env
from ab_metadata_pusher_spark.operators.graph import to_nodes, to_relations
from ab_metadata_pusher_spark.operators.metadata import table_metadata
from ab_metadata_pusher_spark.pipeline import Pipeline
from ab_metadata_pusher_spark.sinks.sqs import SqsPublisher
from ab_metadata_pusher_spark.sinks.staging import StagingArea
from ab_metadata_pusher_spark.sources.catalog import catalog_columns
from ab_metadata_pusher_spark.sources.jdbc import (
    JdbcCatalogSource, mysql_catalog_sql, postgres_catalog_sql,
)

__all__ = ["JOB_REGISTRY", "build_metadata_job", "job_from_env"]


def _catalog_extractor(db_type: str, conf: dict[str, Any]):
    """catalog_columns DataFrame builder per source type."""
    if db_type == "fixtures":
        sf_dir = conf.get("sf_dir", "/root/testdata/sf0.001")

        def extract(spark: SparkSession) -> DataFrame:
            return catalog_columns(spark, sf_dir)
        return extract

    if db_type == "bigquery":
        # SURVEY.md §2.A A7: the roadmap source drops into the SAME
        # dispatch as mysql/postgres.  Env contract mirrors the JDBC
        # rows: GCP_PROJECT / BQ_DATASET name the catalog scope,
        # BQ_ENDPOINT overrides the REST endpoint (tests point it at a
        # local emulator; the connector-jar Storage-API path stays in
        # BigQueryCatalogSource.load), BQ_TOKEN is the bearer token.
        from ab_metadata_pusher_spark.sources.bigquery import (
            BigQueryCatalogSource,
        )
        src = BigQueryCatalogSource(
            project=conf.get("project", env("GCP_PROJECT", "")),
            dataset=conf.get("dataset", env("BQ_DATASET", "")),
            where_clause_suffix=conf.get("where_clause_suffix", ""))
        endpoint = conf.get(
            "endpoint",
            env("BQ_ENDPOINT", "https://bigquery.googleapis.com/bigquery/v2"))
        token = conf.get("token", env("BQ_TOKEN", "")) or None

        def extract_bq(spark: SparkSession) -> DataFrame:
            return src.load_rest(spark, endpoint=endpoint, token=token)
        return extract_bq

    if db_type in ("mysql", "postgres"):
        if db_type == "mysql":
            query = mysql_catalog_sql(conf.get("where_clause_suffix", ""))
            default_port = 3306
            scheme = "mysql"
        else:
            query = postgres_catalog_sql(conf.get("schema", "public"))
            default_port = 5432
            # the JDBC scheme is NOT the db_type string: the PostgreSQL
            # driver only accepts jdbc:postgresql://
            scheme = "postgresql"
        host = conf.get("host", env("TARGET_DB_HOST", "localhost"))
        port = int(conf.get("port", env("TARGET_DB_PORT", str(default_port))))
        name = conf.get("db_name", env("TARGET_DB_NAME", db_type))
        user = conf.get("user", env("TARGET_DB_USER", ""))
        password = conf.get("password", env("TARGET_DB_PASSWORD", ""))
        # TARGET_DB_PROTOCOL=wire (r10): run the SAME dialect catalog
        # query over the native wire protocol (sources/mysqlwire.py /
        # sources/pgwire.py) instead of Spark JDBC — the jar-free path,
        # live-tested end-to-end against local protocol emulators.
        # Catalog scans are bounded (driver-built contract); the JDBC
        # path stays the default for clusters with driver jars.
        if conf.get("protocol", env("TARGET_DB_PROTOCOL", "jdbc")) == "wire":
            if db_type == "mysql":
                from ab_metadata_pusher_spark.sources.mysqlwire import (
                    MysqlWireSource,
                )
                wire = MysqlWireSource(host, port, user=user, database=name,
                                       password=password)
                suffix = conf.get("where_clause_suffix", "")
                return lambda spark: wire.load_catalog(spark, suffix)
            from ab_metadata_pusher_spark.sources.pgwire import (
                PostgresWireSource,
            )
            pg = PostgresWireSource(host, port, user=user, database=name,
                                    password=password)
            schema = conf.get("schema", "public")
            return lambda spark: pg.load_catalog(spark, schema)
        src = JdbcCatalogSource(
            url=f"jdbc:{scheme}://{host}:{port}/{name}",
            query=query,
            user=user,
            password=password)
        return src.load

    raise ValueError(f"unknown TARGET_DB_TYPE {db_type!r}")


def build_metadata_job(db_type: str, queue_type: str,
                       conf: dict[str, Any]) -> Pipeline:
    """Compose the flagship metadata pipeline for a (source, queue) pair."""
    extract_catalog = _catalog_extractor(db_type, conf)

    def extract(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        tm = table_metadata(
            extract_catalog(spark),
            where=conf.get("where") or None,
            use_catalog_as_cluster_name=conf.get(
                "use_catalog_as_cluster_name", True),
            cluster=conf.get("cluster", "gold"))
        return to_nodes(tm), to_relations(tm)

    publish = None
    if queue_type == "aws_sqs":
        def make_client():  # pragma: no cover - needs AWS
            import boto3
            return boto3.client("sqs")

        publisher = SqsPublisher(
            queue_url=conf.get("queue_url",
                               env("AWS_SQS_URL", "")),
            client_factory=conf.get("client_factory", make_client),
            message_group_id=conf.get("message_group_id",
                                      env("AWS_SQS_MESSAGE_GROUP_ID",
                                          "metadata")))
        tag = conf.get("publish_tag", env("JOB_PUBLISH_TAG", "dev"))

        def publish(nodes: DataFrame, relations: DataFrame):
            return publisher.publish_collected(nodes, relations, tag)
    elif queue_type == "kafka":
        tag = conf.get("publish_tag", env("JOB_PUBLISH_TAG", "dev"))
        bootstrap = conf.get(
            "bootstrap_servers", env("KAFKA_BOOTSTRAP_SERVERS", ""))
        topic = conf.get("topic", env("KAFKA_TOPIC", "metadata"))
        # KAFKA_MODE=wire (r10): publish over the raw Kafka protocol
        # from foreachPartition (sinks/kafka.py publish_wire) — the
        # jar-free path, live-tested against a local broker emulator.
        # The spark-sql-kafka connector stays the default.
        if conf.get("mode", env("KAFKA_MODE", "connector")) == "wire":
            from ab_metadata_pusher_spark.sinks.kafka import (
                build_kafka_rows, publish_wire,
            )

            def publish(nodes: DataFrame, relations: DataFrame):
                return publish_wire(build_kafka_rows(nodes, relations, tag),
                                    bootstrap, topic)
        else:
            from ab_metadata_pusher_spark.sinks.kafka import write_envelopes

            def publish(nodes: DataFrame,
                        relations: DataFrame):  # pragma: no cover
                return write_envelopes(nodes, relations, tag,
                                       bootstrap_servers=bootstrap,
                                       topic=topic)
    elif queue_type != "none":
        raise ValueError(f"unknown TARGET_MESSAGE_QUEUE_TYPE {queue_type!r}")

    return Pipeline(
        identifier=f"{db_type}_{queue_type}",
        staging=StagingArea(conf.get("staging_dir", "/tmp/ab_metadata_staging")),
        extract=None if conf.get("publish_only") else extract,
        publish=publish)


#: (TARGET_DB_TYPE, TARGET_MESSAGE_QUEUE_TYPE) -> factory — the in-process
#: equivalent of config/docker.conf.
JOB_REGISTRY: dict[tuple[str, str],
                   Callable[[dict[str, Any]], Pipeline]] = {
    (db, q): partial(build_metadata_job, db, q)
    for db in ("fixtures", "mysql", "postgres", "bigquery")
    for q in ("aws_sqs", "kafka", "none")
}


def job_from_env(conf: dict[str, Any] | None = None) -> Pipeline:
    """Resolve the job exactly like shell/bootstrap.sh: from
    TARGET_DB_TYPE x TARGET_MESSAGE_QUEUE_TYPE."""
    key = (env("TARGET_DB_TYPE", "fixtures"),
           env("TARGET_MESSAGE_QUEUE_TYPE", "aws_sqs"))
    try:
        factory = JOB_REGISTRY[key]
    except KeyError:
        raise ValueError(f"no job registered for {key}") from None
    return factory(conf or {})
