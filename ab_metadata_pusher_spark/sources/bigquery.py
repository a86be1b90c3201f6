"""BigQuery catalog source — the reference's declared-roadmap source
(README.md:53 lists "Support BigQuery" as future work; SURVEY.md §2.A A7).

The interface mirrors JdbcCatalogSource so the §2.B pipeline is
source-agnostic: ``catalog_query`` yields the same catalog_columns row
shape (FIXTURES.md B1) from BigQuery's INFORMATION_SCHEMA, and
``reader_options``/``load`` target the public Spark BigQuery connector
(``spark.read.format("bigquery")``, spark-bigquery-connector).  The
connector jar is not in this container, so ``load`` raises a clear error
until one is on the classpath — the query/options surface is what's tested.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["BigQueryCatalogSource", "bigquery_catalog_sql"]


def bigquery_catalog_sql(project: str, dataset: str,
                         where_clause_suffix: str = "") -> str:
    """catalog_columns-shaped query over BigQuery INFORMATION_SCHEMA.

    Same canonical aliases as the MySQL/Postgres shapes (sources/jdbc.py),
    so operators/metadata.py consumes all three identically.  BigQuery has
    no per-column comments in COLUMNS; descriptions come from
    COLUMN_FIELD_PATHS.
    """
    where = f"AND ({where_clause_suffix})" if where_clause_suffix else ""
    return f"""
SELECT
  'bigquery'               AS td_database,
  c.table_catalog          AS table_catalog,
  c.table_schema           AS table_schema,
  c.table_name             AS table_name,
  NULL                     AS table_description,
  LOWER(c.column_name)     AS col_name,
  LOWER(c.data_type)       AS col_type,
  p.description            AS col_description,
  c.ordinal_position       AS col_sort_order,
  FALSE                    AS is_view
FROM `{project}.{dataset}`.INFORMATION_SCHEMA.COLUMNS c
LEFT JOIN `{project}.{dataset}`.INFORMATION_SCHEMA.COLUMN_FIELD_PATHS p
  ON p.table_name = c.table_name AND p.column_name = c.column_name
WHERE c.ordinal_position > 0 {where}
""".strip()


@dataclass
class BigQueryCatalogSource:
    """Spark BigQuery connector read of the catalog query.

    ``viewsEnabled``/``materializationDataset`` are required by the
    connector to execute a SQL query (as opposed to a direct table read);
    reads stream over the BigQuery Storage Read API, already partitioned —
    no JDBC-style partition-column plumbing needed.
    """

    project: str
    dataset: str
    where_clause_suffix: str = ""
    materialization_dataset: str | None = None

    def reader_options(self) -> dict[str, str]:
        return {
            "query": bigquery_catalog_sql(self.project, self.dataset,
                                          self.where_clause_suffix),
            "parentProject": self.project,
            "viewsEnabled": "true",
            "materializationDataset": (self.materialization_dataset
                                       or self.dataset),
        }

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("bigquery")
        for k, v in self.reader_options().items():
            reader = reader.option(k, v)
        try:
            return reader.load()
        except Exception as exc:  # pragma: no cover - no connector jar here
            raise NotImplementedError(
                "spark-bigquery-connector not on the classpath; add "
                "com.google.cloud.spark:spark-bigquery-with-dependencies "
                "to spark.jars.packages") from exc
