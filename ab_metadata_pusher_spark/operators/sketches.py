"""Mergeable sketch operators beyond the built-ins.

Spark ships HLL (distinct counts) and Greenwald-Khanna (quantiles); the
third classic bounded-memory summary a 100 TB profile needs is frequency
estimation — Misra-Gries heavy hitters.  The exact alternative (groupBy
count over every distinct value) shuffles the full key cardinality; the
sketch keeps k counters per partition and merges P·k rows, so driver and
shuffle cost are independent of both corpus size and cardinality.

Guarantee (standard MG, survives merging because errors are additive in
the dropped mass): for every item, ``true - n/(k+1) <= estimate <=
true`` over n total rows — so every item with frequency above n/(k+1)
is guaranteed present.  tests/test_sketches.py asserts both bounds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["heavy_hitters_mg", "mg_summary", "merge_mg_summaries"]

_SUMMARY_SCHEMA = T.StructType([
    T.StructField("item", T.StringType()),
    T.StructField("weight", T.LongType()),
])


def _mg_partition(k: int):
    """Partition-local Misra-Gries fold: at most k counters survive."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf["item"]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"item": list(counters.keys()),
                            "weight": list(counters.values())})

    return fold


def heavy_hitters_mg(df: DataFrame, col: str, k: int = 32) -> DataFrame:
    """Approximate heavy hitters over ``df[col]``: item + estimated count
    with undercount bounded by n/(k+1).

    Plan: one ``mapInPandas`` pass builds a ≤k-row summary PER PARTITION
    (state lives across the partition's Arrow batches, never more than k
    counters); the P·k summary rows then merge DataFrame-side — sum
    weights per item, subtract the (k+1)-th largest merged weight (the
    standard MG merge), drop non-positive.  Nothing corpus-sized is ever
    shuffled or collected.
    """
    summaries = (df.select(F.col(col).cast("string").alias("item"))
                 .mapInPandas(_mg_partition(k), _SUMMARY_SCHEMA))
    combined = summaries.groupBy("item").agg(F.sum("weight").alias("w"))
    rank_w = Window.orderBy(F.col("w").desc(), F.col("item"))
    ranked = combined.withColumn("rn", F.row_number().over(rank_w))
    # (k+1)-th largest combined weight (0 when fewer than k+1 items):
    # the standard MG merge subtracts it so at most k counters survive.
    # The global window runs over P*k rows — sketch-sized, not data-sized.
    kth = ranked.agg(F.coalesce(
        F.max(F.when(F.col("rn") == k + 1, F.col("w"))),
        F.lit(0).cast("long")).alias("kth"))
    return (ranked.crossJoin(F.broadcast(kth))
            .withColumn("est_count", F.col("w") - F.col("kth"))
            .filter(F.col("est_count") > 0)
            .select("item", "est_count"))


def mg_summary(df: DataFrame, col: str, k: int = 32) -> DataFrame:
    """Raw Misra-Gries summary (item, weight) of one batch — the stored
    sketch state for incremental maintenance.  ≤ P·k rows."""
    return (df.select(F.col(col).cast("string").alias("item"))
            .mapInPandas(_mg_partition(k), _SUMMARY_SCHEMA))


def merge_mg_summaries(k: int, *summaries: DataFrame) -> DataFrame:
    """Merge any number of MG summaries (stored state + new batches) into
    one ≤k-row summary: sum weights per item, subtract the (k+1)-th
    largest, drop non-positive — the standard mergeable-MG step, errors
    stay additive in the dropped mass.  Input and output are both
    summary-shaped, so a streaming job can fold one batch at a time into
    a persisted sketch forever at constant cost."""
    merged = summaries[0]
    for s in summaries[1:]:
        merged = merged.unionByName(s)
    combined = merged.groupBy("item").agg(F.sum("weight").alias("weight"))
    rank_w = Window.orderBy(F.col("weight").desc(), F.col("item"))
    ranked = combined.withColumn("rn", F.row_number().over(rank_w))
    kth = ranked.agg(F.coalesce(
        F.max(F.when(F.col("rn") == k + 1, F.col("weight"))),
        F.lit(0).cast("long")).alias("kth"))
    return (ranked.crossJoin(F.broadcast(kth))
            .withColumn("weight", F.col("weight") - F.col("kth"))
            .filter(F.col("weight") > 0)
            .select("item", "weight"))
