"""Query registry — the engine's public query surface.

Each implemented operator from SURVEY.md §2 registers a ``QuerySpec``:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where expressible)
an equivalent ANSI-SQL oracle string for DuckDB.  ``__spark_entry__.py``
exposes this registry to the driver's correctness gate.

The registry replaces the reference's HOCON job-dispatch table
(config/docker.conf:3-14 + shell/bootstrap.sh:3-8 select a job script from
(TARGET_DB_TYPE, TARGET_MESSAGE_QUEUE_TYPE)) with an in-process mapping.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "REGISTRY", "register", "queries", "oracle_sql"]

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None = None
    #: SURVEY.md §2 operator ids this query covers (e.g. "B8", "G.dedup").
    covers: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None,
             covers: tuple[str, ...] = ()) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, covers=covers)
        return fn
    return deco


def _load_all() -> None:
    """Import every plan module so its registrations run."""
    from ab_metadata_pusher_spark.plans import (  # noqa: F401
        metadata_queries,
    )
    for mod in ("relational_queries", "function_queries", "llm_queries",
                "streaming_queries", "timeseries_queries", "udf_queries",
                "analytics_queries"):
        try:
            __import__(f"ab_metadata_pusher_spark.plans.{mod}")
        except ImportError:
            pass


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
