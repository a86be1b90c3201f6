"""JSONL corpus ingest — the de-facto interchange format for LLM
training corpora (one JSON document per line).

Spark-first shape for 100 TB of JSONL:

* **Explicit schema, never inference** — ``spark.read.json`` without a
  schema runs a full extra pass over the data just to infer types;
  ``read_jsonl`` requires the schema up front so the scan is one pass.
* **Line-delimited stays splittable** — ``multiLine=False`` (default)
  lets Spark split large files at line boundaries across executors;
  multiline JSON forces one task per file.
* **Corrupt records are data, not exceptions** — PERMISSIVE mode routes
  unparseable lines into ``_corrupt_record`` so a bad line quarantines
  instead of failing a 1000-executor job (FAILFAST is one malformed
  crawl record away from wasting the whole pass).

The reference ingests only via SQL scans and CSV staging
(publisher/aws_sqs_csv_puiblisher.py); JSONL is part of the §2.G
extension surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_jsonl", "CORRUPT_COL", "DOCUMENTS_JSONL_SCHEMA",
           "prepare_documents_jsonl"]

CORRUPT_COL = "_corrupt_record"

#: documents-table schema in DDL form (JSONL carries no types itself).
DOCUMENTS_JSONL_SCHEMA = ("doc_id bigint, text string, lang string, "
                          "source string, n_chars bigint")


def read_jsonl(spark: SparkSession, path: str, schema: str,
               mode: str = "PERMISSIVE") -> DataFrame:
    """Read line-delimited JSON with an explicit schema; malformed lines
    land in ``_corrupt_record`` (PERMISSIVE) instead of failing the job.

    Downstream must reference at least one data column alongside
    ``_corrupt_record`` (Spark disallows plans touching only the
    internal corrupt column on uncached reads).
    """
    return (spark.read
            .schema(f"{schema}, {CORRUPT_COL} string")
            .option("mode", mode)
            .option("multiLine", "false")
            .json(path))


#: Malformed lines injected into the round-trip corpus — one truncated
#: object, one bare token, one structurally-invalid object.
CORRUPT_LINES = (
    '{"doc_id": 900000, "text": "unterminated',
    'not json at all',
    '{"doc_id": }',
)


def prepare_documents_jsonl(spark: SparkSession, sf_dir: str,
                            base_dir: str = "/tmp/spark_graft_jsonl") -> str:
    """Materialize the documents fixture as a JSONL directory (plus a
    file of deliberately corrupt lines) and return its path.

    Deterministic CONTENT per ``sf_dir``; the directory itself is fresh
    per invocation (``mkdtemp``) so concurrent runs — two harnesses
    verifying the same query at once — can never observe each other's
    half-written corpus.  This is the test stand-in for a corpus that
    already EXISTS as JSONL; production never runs this step.
    """
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    os.makedirs(base_dir, exist_ok=True)
    out = tempfile.mkdtemp(prefix=f"{tag}-", dir=base_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (docs.coalesce(4).write.mode("overwrite").json(out))
    with open(os.path.join(out, "corrupt.jsonl"), "w",
              encoding="utf-8") as fh:
        for line in CORRUPT_LINES:
            fh.write(line + "\n")
    return out


def _self_check() -> None:  # pragma: no cover - import-time sanity
    for line in CORRUPT_LINES:
        try:
            json.loads(line)
        except ValueError:
            continue
        raise AssertionError(f"CORRUPT_LINES entry parses as JSON: {line!r}")


_self_check()
