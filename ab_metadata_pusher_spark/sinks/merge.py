"""MERGE-style upsert into partitioned parquet staging — no table
format required.

Delta/Iceberg MERGE rewrites the files that contain matched keys; plain
parquet has no file-level index, but partition-level dynamic overwrite
gives the same contract one level coarser:

1. rewrite set = partitions the SOURCE touches ∪ partitions where the
   TARGET already holds one of the source keys (the second term is what
   makes key MOVES safe — updating a row into a new partition must also
   rewrite the partition that held its old version, or the key
   duplicates);
2. merged partitions = target rows whose key is NOT in the source
   (anti-join) + all source rows (source wins — SCD1); a rewrite-set
   partition the merge leaves EMPTY is deleted explicitly, because
   dynamic overwrite only touches partitions present in the output and
   would otherwise keep its stale files;
3. ``localCheckpoint`` the merged frame (severs the plan's dependency on
   the files being replaced — Spark refuses a same-path read+overwrite
   otherwise), then write with dynamic partition overwrite so untouched
   partitions keep their files byte-identical.

Scale: the one full-target pass is the key-location probe (broadcast
semi-join against the distinct source keys — no shuffle); everything
else reads only the rewrite set.  At 100 TB keep source batches
partition-aligned (CDC feeds usually are) so the probe can be replaced
by a key→partition manifest, and this function's rewrite set collapses
to term 1.  The reference has no update path at all — its staging is
append-only CSV (publisher/aws_sqs_csv_puiblisher.py) — so this is §2.G
extension surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["MergeReport", "merge_upsert"]


@dataclass(frozen=True)
class MergeReport:
    n_source: int
    n_updated: int
    n_inserted: int
    partitions_rewritten: tuple[str, ...]


def merge_upsert(spark: SparkSession, path: str, source: DataFrame,
                 keys: list[str], partition_col: str) -> MergeReport:
    """Upsert ``source`` into the day/partition-laid parquet at ``path``.

    Source rows replace target rows with the same key (SCD1); unmatched
    source rows insert.  Only partitions in the rewrite set are
    rewritten.  Deterministic given deterministic inputs.
    """
    target = spark.read.parquet(path)
    src_keys = source.select(*keys).distinct()

    src_parts = {r[0] for r in
                 source.select(partition_col).distinct().collect()}
    moved_parts = {r[0] for r in
                   target.join(F.broadcast(src_keys), keys, "left_semi")
                         .select(partition_col).distinct().collect()}
    parts = sorted(str(p) for p in (src_parts | moved_parts))

    tgt_touched = target.filter(
        F.col(partition_col).cast("string").isin(parts))
    n_matched = tgt_touched.join(
        F.broadcast(src_keys), keys, "left_semi"
    ).select(*keys).distinct().count()
    n_source = source.count()

    merged = (tgt_touched
              .join(F.broadcast(src_keys), keys, "left_anti")
              .unionByName(source)
              # sever lineage from the files about to be overwritten
              .localCheckpoint(eager=True))

    # Dynamic overwrite only rewrites partitions PRESENT in the output.
    # A partition the merge leaves empty (its only rows were keys that
    # moved elsewhere) produces no output rows, so it would silently
    # keep its stale files — delete those partition dirs explicitly.
    out_parts = {str(r[0]) for r in
                 merged.select(partition_col).distinct().collect()}
    emptied = [p for p in parts if p not in out_parts]

    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "dynamic")
    try:
        (merged.write.mode("overwrite")
         .partitionBy(partition_col).parquet(path))
    finally:
        spark.conf.set(conf_key, prev)
    if emptied:
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            spark._jsc.hadoopConfiguration())
        for p in emptied:
            fs.delete(jvm.org.apache.hadoop.fs.Path(
                f"{path}/{partition_col}={p}"), True)

    n_src_keys = src_keys.count()
    return MergeReport(
        n_source=n_source,
        n_updated=n_matched,
        n_inserted=n_src_keys - n_matched,
        partitions_rewritten=tuple(parts))
