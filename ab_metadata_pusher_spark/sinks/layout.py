"""Range-clustered parquet layout: write a frame sorted by a key so each
output file owns a disjoint key range and downstream key-filtered scans
prune whole files from the parquet min/max footer stats.

The reference stages plain CSV with no layout control
(/root/reference/job/sample_mysql_aws_sqs_job.py:43-45 — whatever order the
loader buffered).  At 100 TB, layout IS the index: a predicate on the
cluster key reads 1/N of the files instead of all of them, before a single
row group decodes.

``repartitionByRange(n, key)`` does one range-shuffle (sampled split
points, so skew spreads across files) and ``sortWithinPartitions`` orders
rows inside each file — giving file-level pruning from footer min/max plus
page-level pruning from column indexes.  This is the single-column core of
what Z-ordering generalizes to multi-column keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_clustered", "file_key_ranges"]


def write_clustered(df: DataFrame, path: str, key: str,
                    n_files: int = 8) -> None:
    """Write ``df`` as ``n_files`` parquet files range-clustered on
    ``key`` (disjoint per-file key ranges, sorted within each file)."""
    (df.repartitionByRange(n_files, F.col(key))
       .sortWithinPartitions(key)
       .write.mode("overwrite").parquet(path))


def file_key_ranges(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Per-file (min, max, rows) of ``key`` — the pruning audit: ranges
    must be pairwise disjoint for file-skipping to engage.  Reads the data
    grouped by ``input_file_name`` (metadata-only alternatives exist per
    format; this one is engine-portable)."""
    return (spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("file"))
            .agg(F.min(key).alias("key_min"), F.max(key).alias("key_max"),
                 F.count(F.lit(1)).alias("rows")))
