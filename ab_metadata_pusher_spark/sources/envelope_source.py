"""Python Data Source (Spark 4 API) reading staged SQS JSON envelopes
back into typed node/relation rows — the consumer half of the publish
contract.

The reference only ever WRITES its envelope (one
``{'nodes': [...], 'relations': [...]}`` JSON message,
/root/reference/publisher/aws_sqs_csv_puiblisher.py:127-138); whatever
sits on the other side of the queue has to re-parse it by hand.  Here the
wire format becomes a first-class source:

    spark.dataSource.register(EnvelopeDataSource)
    df = (spark.read.format("metadata_envelope")
          .option("path", dir_of_envelope_json_files).load())

One :class:`InputPartition` per envelope file, so a queue drain spread
over many files scans in parallel (the chunked publisher writes one
envelope per <=256 KiB message — sinks/envelope.py pack_envelopes — so a
big publish is naturally many partitions).  Rows are the union shape of
node and relation records: ``kind`` discriminates, the unused half is
NULL — mirroring how sinks/envelope.py packs both record streams into one
message body.

Scale note: the reader is Arrow-free pure-Python (envelope payloads are
queue-message-sized by construction, so per-row overhead is bounded by
the 256 KiB chunk budget); the parallelism story is the partition-per-
file fan-out, not per-row decode speed.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, InputPartition, SimpleDataSourceStreamReader,
)

__all__ = ["EnvelopeDataSource", "ENVELOPE_SCHEMA"]

#: kind + envelope provenance + node columns + relation columns.
ENVELOPE_SCHEMA = (
    "kind string, chunk int, of int, tag string, "
    "label string, key string, name string, description string, "
    "col_type string, sort_order int, is_view boolean, "
    "start_label string, start_key string, end_label string, end_key string, "
    "type string, reverse_type string"
)

_NODE_FIELDS = ("label", "key", "name", "description", "col_type",
                "sort_order", "is_view")
_REL_FIELDS = ("start_label", "start_key", "end_label", "end_key",
               "type", "reverse_type")


class _EnvelopeFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class EnvelopeReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("metadata_envelope source requires .option('path', dir)")
        self.path = path

    def partitions(self):  # one task per envelope file
        files = sorted(str(p) for p in Path(self.path).glob("*.json"))
        return [_EnvelopeFilePartition(f) for f in files]

    def read(self, partition: _EnvelopeFilePartition) -> Iterator[tuple]:
        return _decode_file(partition.path)


def _decode_file(path: str) -> Iterator[tuple]:
    env = json.loads(Path(path).read_text())
    meta = (env.get("chunk"), env.get("of"), env.get("tag"))
    for rec in env.get("nodes", ()):
        yield (("node",) + meta
               + tuple(rec.get(f) for f in _NODE_FIELDS)
               + (None,) * len(_REL_FIELDS))
    for rec in env.get("relations", ()):
        yield (("relation",) + meta
               + (None,) * len(_NODE_FIELDS)
               + tuple(rec.get(f) for f in _REL_FIELDS))


class EnvelopeStreamReader(SimpleDataSourceStreamReader):
    """Streaming queue drain: each micro-batch consumes the envelope
    files that appeared since the last committed offset.

    The offset is the count of files consumed from the sorted listing —
    valid because a queue drain only ever APPENDS files (the publisher
    names chunks monotonically).  ``readBetweenOffsets`` replays any
    [start, end) slice from the same listing, so recovery after a crash
    re-reads exactly the files of the failed batch — the at-least-once
    contract the reference's one-shot publisher cannot offer at all
    (a failed send just raises: aws_sqs_csv_puiblisher.py:141-143).
    """

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("metadata_envelope source requires .option('path', dir)")
        self.path = path

    def _files(self) -> list[str]:
        return sorted(str(p) for p in Path(self.path).glob("*.json"))

    def initialOffset(self) -> dict:
        return {"n": 0}

    def read(self, start: dict):
        files = self._files()
        rows = [r for f in files[start["n"]:] for r in _decode_file(f)]
        return iter(rows), {"n": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        files = self._files()
        return iter([r for f in files[start["n"]:end["n"]]
                     for r in _decode_file(f)])


class EnvelopeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "metadata_envelope"

    def schema(self) -> str:
        return ENVELOPE_SCHEMA

    def reader(self, schema) -> EnvelopeReader:
        return EnvelopeReader(self.options)

    def simpleStreamReader(self, schema) -> EnvelopeStreamReader:
        return EnvelopeStreamReader(self.options)
