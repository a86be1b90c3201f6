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

def test_sql_session_runs_adhoc_tpch_style_query(spark, sf_dir, duck):
    """The declarative surface: open_session registers every fixture
    table; arbitrary Spark SQL over the views must match DuckDB on the
    same text.  Also proves pushdown survives the view layer."""
    from ab_metadata_pusher_spark.sql import run_sql
    from tests.conftest import assert_matches_oracle

    q = """
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_custs
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 0
    GROUP BY n_name
    """
    df = run_sql(spark, sf_dir, q)
    assert_matches_oracle(df, duck, q)

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(c_acctbal" in plan, "filter not pushed through view"
