"""Media-file ingest via Spark's ``binaryFile`` source — the entry point
of the multimodal pipeline (operators/multimodal.py consumes the opaque
binary column this produces).

The reference has no binary/media surface at all (SURVEY.md §2.G); a
training-data pipeline's images/audio/video arrive as FILES, and this is
the Spark-native way to get them into a DataFrame: each row is
(path, modificationTime, length, content binary), read distributed — one
task per file group, no driver-side listing loop.

Format detection is magic-byte sniffing on the first bytes of ``content``
— pure JVM expressions (substring/startswith on BinaryType), no UDF, so
a 100 TB media crawl classifies while it scans.  Decode stays gated
behind operators/multimodal.py's stub codecs (image/audio libs are not
in this container by design).

Scale notes: ``binaryFile`` caps file size at
spark.sql.sources.binaryFile.maxLength (2 GB default); whole-file rows
mean partition sizes follow file sizes — pack small media into parquet
(content binary column, this module's ``pack_to_table``) so downstream
scans get splittable row groups instead of millions of tiny files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["MAGIC", "read_media_dir", "pack_to_table"]

#: (media_type, magic prefix bytes) — order decides sniff precedence.
MAGIC: list[tuple[str, bytes]] = [
    ("image/png", b"\x89PNG\r\n\x1a\n"),
    ("image/jpeg", b"\xff\xd8\xff"),
    ("audio/wav", b"RIFF"),
    ("video/mp4", b"\x00\x00\x00"),  # ftyp box length prefix (heuristic)
]


def _sniff(content_col: str = "content"):
    expr = F.lit("application/octet-stream")
    for mtype, magic in reversed(MAGIC):
        hexlit = magic.hex().upper()
        probe = F.hex(F.substring(F.col(content_col), 1, len(magic)))
        expr = F.when(probe == hexlit, mtype).otherwise(expr)
    return expr


def read_media_dir(spark: SparkSession, path: str,
                   glob: str | None = None) -> DataFrame:
    """Distributed read of a media directory -> typed multimodal frame:
    (media_id, path, media_type, n_bytes, content).  ``glob`` maps to
    pathGlobFilter (pushed into the file listing, files never opened)."""
    reader = (spark.read.format("binaryFile")
              .option("recursiveFileLookup", "true"))
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.xxhash64("path").alias("media_id"),
        "path",
        _sniff().alias("media_type"),
        F.col("length").alias("n_bytes"),
        "content")


def pack_to_table(media: DataFrame, out_path: str,
                  target_file_bytes: int = 256 * 1024 * 1024) -> int:
    """Re-pack file-per-row media into parquet with a binary payload
    column — the small-file fix for media corpora: downstream scans read
    splittable row groups with footer stats instead of opening millions
    of tiny objects.  Returns file count (sinks/layout.py sizing)."""
    from ab_metadata_pusher_spark.sinks.layout import write_compacted
    return write_compacted(media, out_path, target_file_bytes)
