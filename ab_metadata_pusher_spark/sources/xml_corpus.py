"""XML corpus ingest — Spark 4's NATIVE xml source (no spark-xml
package needed): ``rowTag`` record framing, explicit schema, PERMISSIVE
corrupt-record quarantine.

Same scale rules as JSONL (sources/jsonl.py): explicit schema (no
inference pass), malformed records are data not exceptions.  Unlike
JSONL an XML record spans lines, so files are the split unit — arrange
many files for parallelism, exactly like WARC.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_xml_corpus", "prepare_documents_xml",
           "XML_CORRUPT_SNIPPET"]

#: One WELL-FORMED document whose doc_id fails the bigint schema —
#: exactly one quarantined record under PERMISSIVE.  (A truncated
#: document is also quarantined but its record count depends on how far
#: the parser got — not stable enough for an exact oracle.)
XML_CORRUPT_SNIPPET = ("<docs><doc><doc_id>NOTANUMBER</doc_id>"
                       "<lang>en</lang></doc></docs>")


def read_xml_corpus(spark: SparkSession, path: str, schema: str,
                    row_tag: str = "doc",
                    mode: str = "PERMISSIVE") -> DataFrame:
    """Read an XML corpus with an explicit schema; malformed records land
    in ``_corrupt_record`` instead of failing the scan.  As with raw
    JSON, downstream must reference a data column alongside the corrupt
    column."""
    return (spark.read.format("xml")
            .schema(f"{schema}, _corrupt_record string")
            .option("rowTag", row_tag)
            .option("mode", mode)
            .load(path))


def prepare_documents_xml(spark: SparkSession, sf_dir: str,
                          base_dir: str = "/tmp/spark_graft_xml") -> str:
    """Materialize the documents fixture as XML (plus a corrupt file)
    and return the directory — test scaffolding for a corpus that
    already EXISTS as XML.  Fresh dir per invocation (``mkdtemp``) so
    concurrent verification runs cannot race on a shared path."""
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    os.makedirs(base_dir, exist_ok=True)
    out = tempfile.mkdtemp(prefix=f"{tag}-", dir=base_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (docs.coalesce(4).write.mode("overwrite").format("xml")
     .option("rootTag", "docs").option("rowTag", "doc").save(out))
    with open(os.path.join(out, "corrupt.xml"), "w",
              encoding="utf-8") as fh:
        fh.write(XML_CORRUPT_SNIPPET)
    return out
