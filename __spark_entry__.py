"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the engine's query registry
(``ab_metadata_pusher_spark.plans.registry``): one ``queries()`` entry per
implemented operator from SURVEY.md §2, each with a DuckDB ``oracle_sql()``
where the semantics are ANSI-SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ab_metadata_pusher_spark.plans import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the reference's whole semantic core in one plan: catalog scan ->
    projection/filter/join -> group-to-nested TableMetadata -> explode to
    property-graph nodes (SURVEY.md §3 EP1, re-architected for Spark).
    """
    return _registry.queries()["metadata_nodes"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
