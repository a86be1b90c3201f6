"""JDBC metadata sources: the MySQL/Postgres catalog scans as partitioned
Spark JDBC reads (SURVEY.md §2.A A1-A3).

The reference's extractors run a fixed SQL over ``information_schema``
inside the source DB via SQLAlchemy, one row at a time
(MysqlMetadataExtractor imported at job/sample_mysql_aws_sqs_job.py:7,
PostgresMetadataExtractor at job/sample_postgres_aws_sqs_job.py:7; conn
string :34-35; WHERE suffix :39-41).  Here the same queries are pushed
down through ``spark.read.format("jdbc").option("query", ...)`` — the
whole catalog join executes DB-side exactly as before, but rows arrive in
parallel partitions.

No MySQL/Postgres server (or JDBC driver jar) exists in the test
container; the generic A1 ``load`` path IS live-verified —
tests/test_sources.py round-trips a table through the embedded Derby
engine that ships in Spark's jars, proving the partitioned range-slice
read (4 real scan partitions) and engine-side filter pushdown.  Since
r10 the A2/A3 DIALECTS are live too: ``sources/mysqlwire.py`` and
``sources/pgwire.py`` execute these exact catalog queries over the
public MySQL / PostgreSQL wire protocols against local emulators
(handshake + auth + text resultset decode, end-to-end), so the dialect
SQL is executed, not just shape-checked.  The produced schema is
``catalog_columns`` (FIXTURES.md B1) — identical to sources/catalog.py,
so operators/metadata.py is source-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["JdbcCatalogSource", "mysql_catalog_sql", "postgres_catalog_sql",
           "derby_catalog_sql"]


def mysql_catalog_sql(where_clause_suffix: str = "",
                      database: str = "mysql") -> str:
    """The MySQL catalog query: columns LEFT OUTER JOIN tables
    (semantics per SURVEY.md §2.A A2; ORDER BY dropped — grouping is a
    shuffle groupBy, not an adjacency scan)."""
    where = f"WHERE {where_clause_suffix}" if where_clause_suffix else ""
    return f"""
SELECT
  '{database}'            AS td_database,
  c.table_catalog         AS table_catalog,
  LOWER(c.table_schema)   AS table_schema,
  LOWER(c.table_name)     AS table_name,
  t.table_comment         AS table_description,
  LOWER(c.column_name)    AS col_name,
  LOWER(c.data_type)      AS col_type,
  c.column_comment        AS col_description,
  c.ordinal_position      AS col_sort_order,
  FALSE                   AS is_view
FROM INFORMATION_SCHEMA.COLUMNS c
LEFT OUTER JOIN INFORMATION_SCHEMA.TABLES t
  ON c.table_name = t.table_name AND c.table_schema = t.table_schema
{where}
""".strip()


def postgres_catalog_sql(schema: str, database: str = "postgres") -> str:
    """The Postgres catalog query: columns joined with pg_catalog
    description tables (semantics per SURVEY.md §2.A A3)."""
    return f"""
SELECT
  '{database}'            AS td_database,
  c.table_catalog         AS table_catalog,
  LOWER(c.table_schema)   AS table_schema,
  LOWER(c.table_name)     AS table_name,
  obj_description(pgc.oid) AS table_description,
  LOWER(c.column_name)    AS col_name,
  LOWER(c.data_type)      AS col_type,
  col_description(pgc.oid, c.ordinal_position) AS col_description,
  c.ordinal_position      AS col_sort_order,
  (t.table_type = 'VIEW') AS is_view
FROM information_schema.columns c
JOIN information_schema.tables t
  ON c.table_name = t.table_name AND c.table_schema = t.table_schema
LEFT JOIN pg_catalog.pg_class pgc
  ON pgc.relname = c.table_name
WHERE c.table_schema = '{schema}'
""".strip()


def derby_catalog_sql(schema: str = "APP",
                      database: str = "derby") -> str:
    """The same catalog scan against Derby's ``SYS`` tables — the dialect
    that runs LIVE in this container (embedded Derby ships in Spark's
    jars), so the reference's core job — introspect a real database's
    catalog into ``catalog_columns`` rows — is integration-tested
    end-to-end, not just SQL-shape-checked.  Derby has no catalogs or
    comment columns: ``table_catalog`` carries the database literal and
    the descriptions are typed NULLs (the fold coalesces them to '').
    ``CAST(COLUMNDATATYPE AS VARCHAR)`` stringizes Derby's type
    descriptor ('BIGINT NOT NULL', ...)."""
    return f"""
SELECT
  '{database}'            AS td_database,
  '{database}'            AS table_catalog,
  s.SCHEMANAME            AS table_schema,
  t.TABLENAME             AS table_name,
  CAST(NULL AS VARCHAR(1)) AS table_description,
  c.COLUMNNAME            AS col_name,
  CAST(c.COLUMNDATATYPE AS VARCHAR(128)) AS col_type,
  CAST(NULL AS VARCHAR(1)) AS col_description,
  c.COLUMNNUMBER          AS col_sort_order,
  CASE WHEN t.TABLETYPE = 'V' THEN TRUE ELSE FALSE END AS is_view
FROM SYS.SYSCOLUMNS c
JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID
JOIN SYS.SYSSCHEMAS s ON t.SCHEMAID = s.SCHEMAID
WHERE s.SCHEMANAME = '{schema}' AND t.TABLETYPE IN ('T', 'V')
""".strip()


@dataclass
class JdbcCatalogSource:
    """Partitioned JDBC read of a catalog query.

    Two reader modes, selected by ``partition_column``:

    * unset (default): the whole ``query`` is pushed via the ``query``
      option — one DB-side execution, rows in one partition.  Right for
      catalog-sized results.
    * set: the query is wrapped as a derived table (Spark disallows
      ``query`` together with ``partitionColumn``) and the scan splits
      into ``num_partitions`` range slices of ``partition_column``
      between ``lower_bound`` and ``upper_bound`` — N concurrent DB
      cursors, the shape for reading a big JDBC table.  Engine-side
      filters push down into the DB query in both modes
      (``pushDownPredicate``).

    Live-verified against an embedded Derby database in
    tests/test_sources.py (round trip, partition count, pushed filter);
    MySQL/Postgres differ only in URL + dialect.
    """

    url: str
    query: str
    user: str = ""
    password: str = ""
    num_partitions: int = 4
    fetch_size: int = 10_000
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    driver: str | None = None

    def reader_options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "fetchsize": str(self.fetch_size),
            # keep predicate pushdown on: Catalyst appends engine-side
            # filters to the pushed query.
            "pushDownPredicate": "true",
        }
        if self.partition_column is None:
            opts["query"] = self.query
            opts["numPartitions"] = str(self.num_partitions)
        else:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError(
                    "partition_column requires lower_bound and upper_bound "
                    "(min/max of the column — probe them with a 1-row "
                    "aggregate query first)")
            opts["dbtable"] = f"({self.query}) spark_gen_subq"
            opts["partitionColumn"] = self.partition_column
            opts["lowerBound"] = str(self.lower_bound)
            opts["upperBound"] = str(self.upper_bound)
            opts["numPartitions"] = str(self.num_partitions)
        if self.driver:
            opts["driver"] = self.driver
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        return opts

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("jdbc")
        for k, v in self.reader_options().items():
            reader = reader.option(k, v)
        return reader.load()
