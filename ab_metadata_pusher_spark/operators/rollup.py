"""Incremental rollup maintenance — the continuous-aggregate shape
(TimescaleDB continuous aggregates / incremental materialized-view
refresh), engine-native.

The reference recomputes everything per cron tick (crontab:1 re-runs the
full batch job); a warehouse at 100 TB cannot.  The Spark-native
replacement keeps bucketed PARTIALS (count / exact-cents sum / min /
max — all commutative monoids) as the stored state; each refresh
aggregates ONLY the arriving batch to partials and merges them with the
stored ones.  Merging is a groupBy over bucket keys whose input is
partial-sized (buckets × types), not event-sized — refresh cost tracks
the new batch + the bucket cardinality, never the corpus.

Sums accumulate fixed-point cents (exact longs), so merge order cannot
perturb results: double summation is non-associative, and the whole
point of an incremental aggregate is that ANY batch split must
reproduce the single-pass answer bit-for-bit (the oracle checks exactly
that).  Means/averages are derived at finalize time from (sum, count) —
the standard mergeable-mean decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bucket_partials", "merge_partials", "finalize_rollup"]


def bucket_partials(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """Aggregate an event batch to mergeable per-(bucket, event_type)
    partials: n_events, sum_cents (exact long), min/max value."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (events.select(
                # date_trunc returns LTZ even for NTZ input; cast back
                # (identity under the UTC session conf load_table pins)
                F.date_trunc(bucket, "ts").cast("timestamp_ntz")
                 .alias("bucket"),
                "event_type", "value", cents.alias("cents"))
            .groupBy("bucket", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("cents").alias("sum_cents"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value")))


def merge_partials(*parts: DataFrame) -> DataFrame:
    """Merge any number of partial frames (stored state + new batches).

    Every column is a monoid (sum/sum/min/max), so the merge is one
    map-side-combinable groupBy over partial-sized input — this is the
    whole refresh cost besides aggregating the new batch itself.
    """
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return (merged.groupBy("bucket", "event_type")
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_cents").alias("sum_cents"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value")))


def finalize_rollup(partials: DataFrame) -> DataFrame:
    """Derive the user-facing aggregate view from partials: exact total
    (cents -> double once) and the mergeable mean at 4 decimals via
    half-up integer division (engine-exact; round(double, 4) straddles
    half boundaries differently across engines)."""
    s, n = F.col("sum_cents"), F.col("n_events")
    return partials.select(
        "bucket", "event_type", "n_events",
        (s.cast("double") / 100).alias("total_value"),
        "min_value", "max_value",
        (F.floor((s * 200 + n) / (n * 2)) / 10000.0).alias("avg_value"))
