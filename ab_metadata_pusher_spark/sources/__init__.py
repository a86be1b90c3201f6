"""Sources: fixture parquet tables, catalog introspection, JDBC metadata
scans, and the (db_type, queue_type) dispatch registry."""

from ab_metadata_pusher_spark.sources.fixtures import FIXTURE_TABLES, load_table, load_tables
from ab_metadata_pusher_spark.sources.catalog import catalog_columns

__all__ = ["FIXTURE_TABLES", "load_table", "load_tables", "catalog_columns"]
