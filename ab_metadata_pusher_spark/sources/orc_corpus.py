"""ORC corpus round trip — the second columnar format next to parquet.

Spark ships the ORC reader/writer natively (no extra package), so a
warehouse standardized on ORC gets the same engine: columnar pruning,
predicate pushdown into row-group (stripe) stats, splittable files.
Unlike the text formats (sources/csv_corpus.py, jsonl.py, xml_corpus.py)
there is no corrupt-record quarantine concept — ORC is schema-carrying,
so the ingest check here is the columnar contract instead: the read plan
must show the pushed filter and the pruned schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["prepare_documents_orc", "read_orc_corpus"]


def prepare_documents_orc(spark: SparkSession, sf_dir: str,
                          base_dir: str = "/tmp/spark_graft_orc") -> str:
    """Materialize the documents fixture as ORC and return the directory.
    Fresh dir per invocation (mkdtemp) so concurrent verification runs
    cannot race on a shared path."""
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    os.makedirs(base_dir, exist_ok=True)
    out = tempfile.mkdtemp(prefix=f"{tag}-", dir=base_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.coalesce(4).write.mode("overwrite").orc(out)
    return out


def read_orc_corpus(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
