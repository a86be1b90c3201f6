"""Multimodal column plumbing (SURVEY.md §2.G north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes stream executor-side in columnar batches and
never transit the driver.

The real decoders (PIL/librosa/av) are NOT in this container, so decode is
STUBBED: ``decode_features`` computes deterministic byte-level features and
raises ``NotImplementedError`` from the clearly-marked hook if a real codec
is requested.  Everything Spark-side — schema, partitioning, batch shape,
UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["with_binary_payload", "decode_features", "DECODE_SCHEMA"]


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Wrap the documents fixture as a multimodal table: payload bytes
    (UTF-8 of text — the deterministic stand-in for image bytes) plus a
    typed metadata struct, the schema a real ingest would carry."""
    return documents.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length("text").alias("byte_len"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.IntegerType()),
    T.StructField("payload_md5", T.StringType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("byte_mean", T.DoubleType()),
])


def decode_features(multimodal: DataFrame, codec: str = "stub") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``codec="stub"`` computes deterministic byte statistics (the plumbing
    under test).  Any real codec name raises NotImplementedError at plan
    time — swap in PIL/librosa here when the runtime has them.
    """
    if codec != "stub":
        # REAL-DECODER HOOK: `pip install pillow librosa av` in a real
        # deployment and dispatch on mime type here.
        raise NotImplementedError(
            f"codec {codec!r}: real decoders are not available in this "
            "container; only the deterministic 'stub' codec is implemented")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int32"),
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1).astype("int32"),
                "byte_mean": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0)
                    .round(4),
            })

    return (multimodal.select("doc_id", "payload")
            .mapInPandas(extract, DECODE_SCHEMA))
