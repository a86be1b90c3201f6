"""CSV corpus ingest with PERMISSIVE corrupt-record quarantine.

Completes the ingest set (JSONL / XML / WARC / CSV).  The staging sink
(sinks/staging.py) already covers the reference's LEGACY CSV *write*
contract (empty-string-not-null, ``:UNQUOTED`` headers); this is the
tolerant *read* path a crawl-scale CSV drop needs: explicit schema (no
inference pass), quoted multi-line fields off (splittable files),
malformed lines routed to ``_corrupt_record`` instead of failing the
job.  Same column-pruning caveat as XML/JSON: a type violation only
quarantines when the violating column is parsed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_csv_corpus", "prepare_documents_csv", "CSV_CORRUPT_LINES"]

#: One type-violating line (doc_id not a bigint) and one arity-short
#: line — both quarantine under PERMISSIVE.
CSV_CORRUPT_LINES = (
    'NOTANUMBER,"some text",en,web,9',
    'just-one-field',
)


def read_csv_corpus(spark: SparkSession, path: str, schema: str,
                    mode: str = "PERMISSIVE") -> DataFrame:
    """Read headerless CSV with an explicit schema; malformed lines land
    in ``_corrupt_record``.  Downstream must reference a data column
    alongside the corrupt column (same engine rule as raw JSON)."""
    return (spark.read
            .schema(f"{schema}, _corrupt_record string")
            .option("mode", mode)
            .option("header", "false")
            .option("multiLine", "false")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(path))


def prepare_documents_csv(spark: SparkSession, sf_dir: str,
                          base_dir: str = "/tmp/spark_graft_csv") -> str:
    """Materialize the documents fixture as headerless CSV (plus a file
    of corrupt lines) and return the directory.  Fresh dir per
    invocation (``mkdtemp``) so concurrent verification runs cannot
    race on a shared path."""
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    os.makedirs(base_dir, exist_ok=True)
    out = tempfile.mkdtemp(prefix=f"{tag}-", dir=base_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (docs.coalesce(4).write.mode("overwrite")
     .option("header", "false").option("quoteAll", "true").csv(out))
    with open(os.path.join(out, "corrupt.csv"), "w",
              encoding="utf-8") as fh:
        for line in CSV_CORRUPT_LINES:
            fh.write(line + "\n")
    return out
