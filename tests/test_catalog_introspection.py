"""The pyarrow footer introspection must agree exactly with what Spark's
own loader reports for every fixture table (same names, same DDL type
strings, same order)."""

from __future__ import annotations

from ab_metadata_pusher_spark.sources.catalog import catalog_columns
from ab_metadata_pusher_spark.sources.fixtures import FIXTURE_TABLES, load_table


def test_arrow_types_match_spark_loader(spark, sf_dir):
    cc = {(r.table_name, r.col_sort_order): (r.col_name, r.col_type)
          for r in catalog_columns(spark, sf_dir).collect()}
    for table in FIXTURE_TABLES:
        df = load_table(spark, sf_dir, table)
        for i, (name, dtype) in enumerate(df.dtypes, start=1):
            assert cc[(table, i)] == (name.lower(), dtype), (
                f"{table}.{name}: arrow said {cc[(table, i)]}, "
                f"spark loader says {(name.lower(), dtype)}")