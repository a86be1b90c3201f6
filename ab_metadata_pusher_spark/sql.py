"""User-facing SQL entry point: register the engine's tables and run SQL.

The DataFrame plans in ``plans/`` are the engine's programmatic surface;
this module is the declarative one — the same capability a reference user
gets from their database shell.  ``open_session`` registers every fixture
table (plus any extra DataFrames) as temp views; ``run_sql`` then executes
arbitrary Spark SQL over them, going through the exact same Catalyst
pipeline as the DataFrame plans (one logical plan namespace, so SQL can
join against views a DataFrame pipeline registered and vice versa).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ab_metadata_pusher_spark.sources.fixtures import FIXTURE_TABLES, load_table

__all__ = ["open_session", "run_sql"]


def open_session(spark: SparkSession, sf_dir: str,
                 extra: dict[str, DataFrame] | None = None) -> SparkSession:
    """Register all fixture tables (and any ``extra`` frames) as temp views.

    Views are lazy — nothing is read until a query runs, so registration
    is free and predicate pushdown / column pruning still reach the
    parquet scans underneath each view.
    """
    for t in FIXTURE_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    for name, df in (extra or {}).items():
        df.createOrReplaceTempView(name)
    return spark


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views and run ``query``."""
    return open_session(spark, sf_dir).sql(query)
