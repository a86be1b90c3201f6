"""catalog_columns -> nested TableMetadata: the reference's extraction query.

Re-expresses SURVEY.md §2.B (the semantics of the reference's configured
extractor SQL + row-grouping, reference import/config at
job/sample_mysql_aws_sqs_job.py:48-53 and the Databuilder TableMetadata
grouping) as one declarative DataFrame plan:

* B1 projection/aliasing, B2 ``lower()``, B3 literal ``is_view``,
* B4 caller-injected WHERE predicate (SQL string, like the reference's
  ``where_clause_suffix`` at job/sample_mysql_aws_sqs_job.py:39-41),
* B5/B6 description joins (already materialized in catalog_columns),
* B7 ORDER BY is deliberately dropped: the reference needed source-side
  ordering because its grouping was a sequential scan over adjacent rows;
  a shuffle groupBy has no adjacency requirement, ordering survives only
  *inside* the nested array via ``sort_array`` (B8),
* B9 cluster-name selection (catalog column vs configured literal).

At 100 TB this plan is shuffle-minimal: one hash aggregation keyed on the
table identity; no sort, no window, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["table_metadata"]


def table_metadata(catalog_cols: DataFrame,
                   where: str | None = None,
                   use_catalog_as_cluster_name: bool = True,
                   cluster: str = "gold") -> DataFrame:
    """Fold per-column catalog rows into one nested record per table.

    Output schema (FIXTURES.md B2)::

        database, cluster, schema, table_name, description: string,
        is_view: boolean,
        columns: array<struct<sort_order:int, name:string,
                              description:string, col_type:string>>

    ``columns`` is sorted by ``sort_order`` (sort_array over a struct whose
    first field is the ordinal — no global sort needed).
    NULL descriptions surface as '' to preserve the reference's
    ``na_filter=False`` CSV semantics (publisher/aws_sqs_csv_puiblisher.py:158).
    """
    df = catalog_cols
    if where:
        df = df.filter(F.expr(where))

    cluster_col: Column = (
        F.col("table_catalog") if use_catalog_as_cluster_name else F.lit(cluster)
    )

    projected = df.select(
        F.col("td_database").alias("database"),
        cluster_col.alias("cluster"),
        F.lower(F.col("table_schema")).alias("schema"),
        F.lower(F.col("table_name")).alias("table_name"),
        F.coalesce(F.col("table_description"), F.lit("")).alias("description"),
        F.col("is_view"),
        F.col("col_sort_order").alias("sort_order"),
        F.lower(F.col("col_name")).alias("col_name"),
        F.coalesce(F.col("col_description"), F.lit("")).alias("col_description"),
        F.lower(F.col("col_type")).alias("col_type"),
    )

    return (
        projected
        .groupBy("database", "cluster", "schema", "table_name",
                 "description", "is_view")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("sort_order"),
            F.col("col_name").alias("name"),
            F.col("col_description").alias("description"),
            F.col("col_type"),
        ))).alias("columns"))
    )
