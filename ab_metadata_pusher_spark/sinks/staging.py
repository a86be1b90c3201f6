"""Staging area: the loader/publisher handoff as a first-class artifact
(SURVEY.md §2.D D1/D2, §3 EP3).

The reference stages graph CSVs in two directories (nodes/, relationships/
— job/sample_mysql_aws_sqs_job.py:43-45,54-57) so a publisher-only job can
re-publish without re-extracting (job/customized_job.py:65-67).  Here:

* canonical staging is **parquet partitioned by label** — typed columns,
  column pruning, partition pruning on label;
* a **legacy CSV mode** reproduces the reference's on-disk contract:
  one header'd CSV per label with ``LABEL``/``KEY`` columns and the
  ``:UNQUOTED`` suffix marking non-string properties
  (publisher/aws_sqs_csv_puiblisher.py:43-51), and the empty-string-
  not-null convention (na_filter=False, :158);
* ``read_*`` functions restore the exact engine schema from either format,
  so publish-only pipelines (EP3) are lossless.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["StagingArea"]

_NUMERIC_TYPES = (T.IntegerType, T.LongType, T.DoubleType, T.FloatType,
                  T.BooleanType, T.ShortType, T.ByteType, T.DecimalType)


class StagingArea:
    """A (nodes, relations) staging directory pair."""

    def __init__(self, base_dir: str) -> None:
        self.base_dir = base_dir
        self.nodes_dir = os.path.join(base_dir, "nodes")
        self.relations_dir = os.path.join(base_dir, "relationships")

    # -- canonical parquet staging ----------------------------------------

    def write(self, nodes: DataFrame, relations: DataFrame) -> None:
        """Partitioned-by-label parquet: label pruning is free for any
        downstream reader; overwrite gives idempotent re-runs."""
        (nodes.write.mode("overwrite").partitionBy("label")
         .parquet(self.nodes_dir))
        relations.write.mode("overwrite").parquet(self.relations_dir)

    def read_nodes(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.nodes_dir)

    def read_relations(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.relations_dir)

    # -- legacy CSV mode (reference on-disk contract) ----------------------

    def write_legacy_csv(self, nodes: DataFrame, relations: DataFrame) -> None:
        """Reference-compatible CSV staging.

        Per the publisher contract (aws_sqs_csv_puiblisher.py:43-51):
        node files carry ``LABEL``/``KEY`` columns; non-string property
        headers get the ``:UNQUOTED`` suffix (type info lives in the header
        name, not a schema).  NULL -> '' on write (na_filter=False parity).
        """
        self._write_legacy(nodes.withColumnsRenamed(
            {"label": "LABEL", "key": "KEY"}), f"{self.nodes_dir}_csv")
        self._write_legacy(relations.withColumnsRenamed(
            {"start_label": "START_LABEL", "start_key": "START_KEY",
             "end_label": "END_LABEL", "end_key": "END_KEY",
             "type": "TYPE", "reverse_type": "REVERSE_TYPE"}),
            f"{self.relations_dir}_csv")

    @staticmethod
    def _write_legacy(df: DataFrame, path: str) -> None:
        renames = {}
        for field in df.schema.fields:
            if isinstance(field.dataType, _NUMERIC_TYPES):
                renames[field.name] = f"{field.name}:UNQUOTED"
        out = df.withColumnsRenamed(renames)
        # Empty-string-not-null: the reference reads CSVs with
        # na_filter=False so consumers see '' where we'd have NULL.
        out = out.select(*[
            F.coalesce(F.col(f"`{c}`").cast("string"), F.lit("")).alias(c)
            for c in out.columns
        ])
        (out.coalesce(1).write.mode("overwrite")
         .option("header", True).option("emptyValue", "")
         .csv(path))

    def read_legacy_nodes(self, spark: SparkSession) -> DataFrame:
        """Read legacy CSVs back into the engine schema: strip ``:UNQUOTED``
        suffixes, restore types from the header markers, lower-case the
        contract columns.

        Spark's CSV reader maps empty fields to NULL; the reference reads
        with ``na_filter=False`` (empty string, never null —
        aws_sqs_csv_puiblisher.py:158), so that invariant is enforced here
        at the read surface with a coalesce per column.
        """
        raw = (spark.read.option("header", True)
               .csv(f"{self.nodes_dir}_csv"))
        cols = []
        for c in raw.columns:
            base = c[: -len(":UNQUOTED")] if c.endswith(":UNQUOTED") else c
            cols.append(F.coalesce(F.col(f"`{c}`"), F.lit("")).alias(base))
        df = raw.select(*cols)
        return df.withColumnsRenamed({"LABEL": "label", "KEY": "key"})
