"""Column profiling: per-column stats (rows, nulls, distincts, min/max)
for any DataFrame in ONE pass — the stats half of a metadata catalog.

The reference ships only schema metadata (tables/columns/descriptions,
extractor SQL in /root/reference/extractor/mysql_search_data_extractor.py);
its ecosystem's column-stats extractors are separate per-database jobs.
Here profiling is an engine operator: unpivot every column to
(col_name, value-as-string) rows, then one groupBy computes all stats for
all columns together — one shuffle regardless of column count.

Min/max are computed ON THE STRING CAST (bytewise comparison, identical
across engines) so one schema serves every column type; numeric-typed
min/max, when needed, is a second profile over the numeric subset.

At 100 TB: the unpivot multiplies rows by column count BUT carries only
(name, short string) pairs, all aggregates are map-side combinable, and
count(DISTINCT) per group is the one expensive piece — swap it for
approx_count_distinct to make the whole profile a single streaming pass
(the sketch path agg_hll_sketch_union demonstrates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, approx: bool = False) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) with min/max over the string cast."""
    pairs = []
    for c in df.columns:
        pairs.append(F.struct(F.lit(c).alias("col_name"),
                              F.col(c).cast("string").alias("val")))
    tall = df.select(F.explode(F.array(*pairs)).alias("p")) \
             .select("p.col_name", "p.val")
    n_distinct = (F.approx_count_distinct("val") if approx
                  else F.count_distinct("val"))
    return (tall.groupBy("col_name")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("val").isNull().cast("long")).alias("n_nulls"),
                 n_distinct.alias("n_distinct"),
                 F.min("val").alias("min_value"),
                 F.max("val").alias("max_value")))
