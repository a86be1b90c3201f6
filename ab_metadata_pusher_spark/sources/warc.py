"""WARC (Web ARChive) corpus ingest — the de-facto container for web
crawl data (Common Crawl ships it); an LLM-data engine must read it.

Format (ISO 28500): a WARC file is a sequence of records, each a header
block (``WARC/1.0`` + ``Name: value`` lines, CRLF) terminated by a blank
line, followed by ``Content-Length`` body bytes and a blank-line record
separator.  The parser below is stdlib-only and tolerant: a malformed
record ends that FILE's parse (sequential format — nothing after a
corrupt length marker can be trusted) but never fails the task; files
are independent, so damage stays contained.

Spark shape for crawl scale: one WARC file is NOT splittable (records
are back-to-back, and real crawls gzip per record), so parallelism comes
from the file count — exactly how Common Crawl is laid out (thousands of
~1 GiB segments).  ``read_warc_dir`` uses the ``binaryFile`` source
(one row per file, bytes executor-side) and explodes records via
Arrow-batched ``mapInPandas``; the driver never touches payload bytes.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["parse_warc", "read_warc_dir", "prepare_documents_warc",
           "WARC_SCHEMA"]

WARC_SCHEMA = T.StructType([
    T.StructField("uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("body", T.StringType()),
    T.StructField("body_bytes", T.LongType()),
])

_SEP = b"\r\n\r\n"


def _record_bytes(uri: str, date: str, lang: str, body: bytes) -> bytes:
    # no trailing CRLF on the last header line: the record separator
    # itself supplies the header-terminating blank line
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Identified-Content-Language: {lang}\r\n"
            f"Content-Length: {len(body)}").encode("utf-8")
    return head + _SEP + body + _SEP


def parse_warc(data: bytes):
    """Yield ``(headers_dict, body_bytes)`` per record; stop at the first
    malformed record (sequential format — see module docstring)."""
    pos = 0
    while pos < len(data):
        end = data.find(_SEP, pos)
        if end < 0:
            return
        lines = data[pos:end].decode("utf-8", "replace").split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            n = int(headers["content-length"])
        except (KeyError, ValueError):
            return
        body_start = end + len(_SEP)
        if body_start + n > len(data):
            return
        yield headers, data[body_start:body_start + n]
        pos = body_start + n + len(_SEP)


def read_warc_dir(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC read: binaryFile rows -> records, executor-side."""

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("uri", "warc_date", "lang", "body",
                                   "body_bytes")}
            for content in pdf["content"]:
                for headers, body in parse_warc(bytes(content)):
                    out["uri"].append(headers.get("warc-target-uri", ""))
                    out["warc_date"].append(headers.get("warc-date", ""))
                    out["lang"].append(headers.get(
                        "warc-identified-content-language", ""))
                    out["body"].append(body.decode("utf-8", "replace"))
                    out["body_bytes"].append(len(body))
            yield pd.DataFrame(out)

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc").load(path))
    return files.select("content").mapInPandas(explode, WARC_SCHEMA)


def prepare_documents_warc(spark: SparkSession, sf_dir: str,
                           base_dir: str = "/tmp/spark_graft_warc",
                           n_files: int = 4) -> str:
    """Materialize the documents fixture as ``n_files`` WARC segments
    (plus one deliberately-truncated record at the end of file 0, which
    the tolerant parser must drop without losing earlier records).
    Test scaffolding for a corpus that already EXISTS as WARC.  Fresh
    dir per invocation (``mkdtemp``) so concurrent verification runs
    cannot race on a shared path."""
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    os.makedirs(base_dir, exist_ok=True)
    out = tempfile.mkdtemp(prefix=f"{tag}-", dir=base_dir)
    rows = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang").collect())
    buckets: list[list[bytes]] = [[] for _ in range(n_files)]
    for r in rows:
        body = (r.text or "").encode("utf-8")
        buckets[int(r.doc_id) % n_files].append(_record_bytes(
            f"http://corpus.example/doc/{r.doc_id}",
            "2026-01-01T00:00:00Z", r.lang or "", body))
    for i, recs in enumerate(buckets):
        blob = b"".join(recs)
        if i == 0:  # truncated trailer: header promises more than exists
            blob += b"WARC/1.0\r\nContent-Length: 999999\r\n\r\nshort"
        with open(os.path.join(out, f"seg-{i:03d}.warc"), "wb") as fh:
            fh.write(blob)
    return out
