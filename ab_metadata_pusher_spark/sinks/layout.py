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

__all__ = ["write_clustered", "file_key_ranges", "zorder_value",
           "write_zordered", "write_compacted", "write_sharded_manifest"]


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


def zorder_value(cols: list[str], mins: list[float], maxs: list[float],
                 bits: int = 8) -> F.Column:
    """Morton (Z-curve) value for ``cols``: each key is linearly scaled to
    a ``bits``-bit integer against its [min, max], then the bit strings
    are interleaved.  Pure integer expressions — whole-stage codegen, no
    UDF."""
    from ab_metadata_pusher_spark.operators.layout import interleave_bits

    buckets = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = (hi - lo) or 1.0
        scaled = F.floor((F.col(c).cast("double") - F.lit(float(lo)))
                         / F.lit(float(span)) * ((1 << bits) - 1))
        buckets.append(F.least(F.greatest(scaled, F.lit(0)),
                               F.lit((1 << bits) - 1)).cast("long"))
    return interleave_bits(buckets, bits)


def write_zordered(df: DataFrame, path: str, keys: list[str],
                   n_files: int = 8, bits: int = 8) -> None:
    """Write ``df`` as parquet files clustered on the Z-curve of ``keys``:
    every file owns a compact hyper-rectangle-ish region of the key space,
    so footer min/max stats prune files for predicates on ANY of the keys
    — the multi-column generalization of ``write_clustered``.

    The per-key min/max needed for scaling is one tiny aggregate
    (driver-sized); the write itself is one range shuffle on the z-value.
    At 100 TB this is the Delta/Iceberg OPTIMIZE ZORDER shape, done with
    nothing but repartitionByRange."""
    stats = df.agg(*[f(c).alias(f"{n}_{c}") for c in keys
                     for n, f in (("min", F.min), ("max", F.max))]).first()
    mins = [float(stats[f"min_{c}"]) for c in keys]
    maxs = [float(stats[f"max_{c}"]) for c in keys]
    z = zorder_value(keys, mins, maxs, bits)
    (df.withColumn("_z", z)
       .repartitionByRange(n_files, F.col("_z"))
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))


def write_compacted(df: DataFrame, path: str, target_file_bytes: int,
                    size_ratio: float = 1.0) -> int:
    """Bin-pack ``df`` into parquet files near ``target_file_bytes`` each
    — the small-file compaction every long-running 100 TB lake needs:
    streaming micro-batches and per-partition writers leave thousands of
    KB-sized files whose open/footer cost dominates scans; periodic
    compaction rewrites them at the scan-optimal size (HDFS-block-ish,
    128 MB-1 GB).

    File count comes from the OPTIMIZER's size estimate
    (``sizeInBytes`` of the optimized plan — no extra pass over the
    data).  For scan-rooted plans that's the source files' on-disk
    (already-compressed) bytes, so ``size_ratio`` defaults to 1;
    shuffled/derived plans estimate decompressed widths, where a
    measured 0.2-0.3 ratio applies — feed actual output sizes back to
    calibrate per-table.  Round-robin repartition spreads rows evenly
    regardless of key skew.  Returns the file count written."""
    est = int(df._jdf.queryExecution().optimizedPlan()
              .stats().sizeInBytes())
    n = max(1, -(-int(est * size_ratio) // target_file_bytes))
    df.repartition(n).write.mode("overwrite").parquet(path)
    return n


def write_sharded_manifest(df: DataFrame, path: str, id_col: str,
                           n_shards: int = 16,
                           shuffle_salt: str | None = None) -> DataFrame:
    """Corpus release write: deterministic hash sharding + a verifiable
    manifest — the publish step of a 100 TB corpus build.

    Shard assignment is ``md5(id) % n_shards`` (a pure projection —
    reproducible across engines, partitionings, and reruns, unlike
    round-robin or file-order splits), written as one parquet directory
    per shard.  The returned manifest has one row per shard:
    ``shard, n_rows, content_digest`` where the digest is the BIT_XOR of
    the per-row ``md5_long(id)`` values — an ORDER-INSENSITIVE,
    overflow-free aggregate (ids are unique, so xor-cancellation needs a
    hash collision), so
    two corpus builds match iff their shard contents match, regardless
    of task scheduling.  Consumers re-derive the digest with one scan to
    prove a download/copy is complete before training starts.

    ``shuffle_salt`` additionally stamps every row with ``pos`` — its
    rank by ``md5(salt || id)`` within the shard — a deterministic
    pseudo-random TRAINING ORDER: (shard, pos) is a pure function of
    (salt, id), so data loaders reading ORDER BY pos replay the exact
    same example order on every epoch/restart, and a new salt is a fresh
    full-corpus shuffle with no RNG state and no global sort (hash order
    within hash shards is already uniform).  The order rides as a COLUMN
    because the parquet partitioned-write path re-sorts rows by the
    partition key — implicit file order does not survive the writer.

    One wide shuffle (repartition by shard) sizes output files; the
    manifest aggregate is map-side combinable on top of the same
    partitioning, so the verification metadata is nearly free.
    """
    from ab_metadata_pusher_spark.functions.hashing import md5_long

    from pyspark.sql import Window as _W

    shard = (md5_long(F.col(id_col).cast("string")) % n_shards).alias("shard")
    sharded = df.withColumn("shard", shard).repartition("shard")
    if shuffle_salt is not None:
        order = F.md5(F.concat(F.lit(shuffle_salt),
                               F.col(id_col).cast("string")))
        w = _W.partitionBy("shard").orderBy(order, F.col(id_col))
        sharded = sharded.withColumn("pos", F.row_number().over(w))
    (sharded.write.mode("overwrite").partitionBy("shard").parquet(path))
    written = df.sparkSession.read.parquet(path)
    return (written
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.bit_xor(md5_long(F.col(id_col).cast("string")))
                  .alias("content_digest"))
            .orderBy("shard"))
