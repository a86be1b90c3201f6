"""Source-interface shapes: BigQuery roadmap source (A7) and the pipeline
transform hook (C1)."""

from __future__ import annotations

from ab_metadata_pusher_spark.sources.bigquery import (
    BigQueryCatalogSource, bigquery_catalog_sql,
)


def test_bigquery_catalog_sql_shape():
    sql = bigquery_catalog_sql("proj", "ds", "c.table_name = 'orders'")
    # canonical catalog_columns aliases, same as the JDBC shapes
    for alias in ("td_database", "table_catalog", "table_schema",
                  "table_name", "table_description", "col_name", "col_type",
                  "col_description", "col_sort_order", "is_view"):
        assert alias in sql
    assert "INFORMATION_SCHEMA.COLUMNS" in sql
    assert "AND (c.table_name = 'orders')" in sql
    assert "`proj.ds`" in sql


def test_bigquery_reader_options():
    src = BigQueryCatalogSource(project="proj", dataset="ds")
    opts = src.reader_options()
    assert opts["viewsEnabled"] == "true"
    assert opts["materializationDataset"] == "ds"
    assert "INFORMATION_SCHEMA" in opts["query"]


def test_pipeline_transform_hook(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.operators.graph import to_nodes, to_relations
    from ab_metadata_pusher_spark.operators.metadata import table_metadata
    from ab_metadata_pusher_spark.pipeline import Pipeline
    from ab_metadata_pusher_spark.sinks.staging import StagingArea
    from ab_metadata_pusher_spark.sources.catalog import catalog_columns

    def extract(s):
        tm = table_metadata(catalog_columns(s, sf_dir))
        return to_nodes(tm), to_relations(tm)

    def transform(nodes, relations):
        return (nodes.withColumn("name", F.upper("name")), relations)

    p = Pipeline(identifier="t", staging=StagingArea(str(tmp_path)),
                 extract=extract, transform=transform)
    res = p.run(spark)
    assert res.succeeded and res.staged
    names = [r["name"] for r in p.staging.read_nodes(spark).collect()]
    assert names and all(n == n.upper() for n in names)
