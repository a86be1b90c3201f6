"""Loaders for the driver's deterministic parquet fixture tables.

Spark lists and splits parquet files itself (distributed, unlike the
reference's driver-side non-recursive ``os.listdir`` at
publisher/aws_sqs_csv_puiblisher.py:86-97); predicate pushdown and column
pruning reach the scan for free once the plan is declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["FIXTURE_TABLES", "load_table", "load_tables"]

#: The driver's table set (TESTDATA.md) in a stable, deterministic order.
FIXTURE_TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TIMESTAMP_NTZ whatever the file encoding.

    The driver has shipped events.parquet with ``ts`` as parquet
    TIMESTAMP(NANOS) (loads as a nanosecond LongType under the legacy
    conf), and later as TIMESTAMP(MICROS) (loads natively as a timestamp).
    Dispatch on the loaded dtype so either encoding — and any future flip
    back — produces the same TIMESTAMP_NTZ column.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype is None:
        return df
    if dtype == "bigint":
        # nanos-as-long → microsecond TIMESTAMP_NTZ (DuckDB's ns->us cast).
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"))
    if dtype != "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The caller's session may not be ours (the driver passes its own):
    # pin the two confs correctness depends on.  Both are runtime-settable.
    # UTC keeps NTZ<->LTZ casts and collected timestamps wall-clock-stable
    # so DuckDB oracles hash-match regardless of host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Tolerate the TIMESTAMP(NANOS) encoding (Spark has no native type
        # for it; a plain session throws PARQUET_TYPE_ILLEGAL without the
        # legacy conf).  Harmless when the file is already micros.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = FIXTURE_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}
