"""Relational operator library over the TPC-H-ish fixtures (SURVEY.md §2.B
data-scale semantics + §2.G gap inventory: joins, aggregations, windows,
set ops, sorts/top-k, grouping sets/rollup/cube).

Every query is a declarative DataFrame plan — Catalyst handles pushdown,
pruning, join strategy (small dims broadcast under the session's 64 MiB
threshold) and AQE handles runtime coalescing/skew.  Floating-point
aggregates are rounded in BOTH the Spark plan and the oracle so the
driver's value hash is stable across engines.

Scale notes per family are in each docstring; the overarching rules:
fact-to-fact joins shuffle on join keys only after filters (pushdown),
dimensions broadcast, window functions partition on high-cardinality keys,
and no query collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ab_metadata_pusher_spark.operators._shared import (
    materialize_shared, spread_if_narrow,
)
from ab_metadata_pusher_spark.plans.registry import register
from ab_metadata_pusher_spark.plans.generated_oracles import (
    PINNED_ORACLES,
)
from ab_metadata_pusher_spark.sources.fixtures import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

@register(
    "agg_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""",
    covers=("G.agg",),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan -> partial+final hash agg on a
    2-value key.  At 100 TB: map-side combine reduces the shuffle to
    #groups x #partitions rows; the shipdate filter pushes to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
              .alias("sum_disc_price"),
             F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
             F.round(F.avg("l_discount"), 4).alias("avg_disc"),
             F.count(F.lit(1)).alias("count_order"))
    )


@register(
    "agg_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    covers=("G.agg.rollup",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals; Spark expands rollup into a single expand+agg
    (one shuffle), not one pass per grouping set."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )


@register(
    "agg_cube",
    oracle="""
SELECT c_mktsegment, c_nationkey,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
GROUP BY CUBE (c_mktsegment, c_nationkey)
""",
    covers=("G.agg.cube",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .cube("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    covers=("G.agg.grouping_sets",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@register(
    "agg_count_distinct",
    oracle="""
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
    covers=("G.agg.distinct",),
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct: Spark plans this as a two-phase expand+agg.  At scale
    prefer agg_approx_count_distinct (HLL, one pass, mergeable sketches)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n_customers"),
             F.count(F.lit(1)).alias("n_orders"))
    )


@register("agg_approx_count_distinct",
          oracle=PINNED_ORACLES["agg_approx_count_distinct"],
          covers=("G.agg.approx",))
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB path (no expand, sketches merge
    map-side).  Oracle: pinned constants (HLL++ is a deterministic
    function of the value multiset — per-value hash, register max — so
    the estimate is exactly reproducible; scripts/gen_pinned_oracles.py
    regenerates)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers"))
    )


@register(
    "agg_max_by",
    oracle="""
SELECT o_orderpriority, o_orderkey AS top_orderkey,
       round(o_totalprice, 2) AS top_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
""",
    covers=("G.topk.max_by",),
)
def q_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by with a struct ordering key — deterministic argmax without a
    window (single hash agg; at scale this beats the window formulation
    because there is no per-group sort)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.max_by("o_orderkey",
                      F.struct("o_totalprice", "o_orderkey")).alias("top_orderkey"),
             F.round(F.max("o_totalprice"), 2).alias("top_totalprice"))
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@register(
    "join_multiway_revenue",
    oracle="""
SELECT r.r_name AS region_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    covers=("B5", "B6", "G.join.multiway"),
)
def q_multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: one fact-fact shuffle join (lineitem x orders on
    orderkey), everything else broadcast.  customer is broadcast-hinted —
    at 100 TB replace with a shuffle join or bucketed co-location, but
    nation/region stay broadcast at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
              .alias("revenue"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


@register(
    "join_left_outer_orders",
    oracle="""
SELECT c.c_custkey, c.c_name,
       count(o.o_orderkey) AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
FROM customer c
LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
""",
    covers=("B5",),
)
def q_left_outer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's LEFT OUTER catalog join (B5) at data scale —
    count() over a nullable join output preserves customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"),
             F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2)
              .alias("total_spent"))
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
    covers=("G.join.semi",),
)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi: EXISTS without duplicating or widening rows — the filter
    pushes into the build side before the join."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (c.join(big, c.c_custkey == big.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 450000)
""",
    covers=("G.join.anti",),
)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti = NOT EXISTS; the predicate keeps the result non-empty
    (every fixture customer has at least one order)."""
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    c = _t(spark, sf_dir, "customer")
    return (c.join(big, c.c_custkey == big.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


_BANDS = [(0, 100_000, "small"), (100_000, 300_000, "medium"),
          (300_000, 600_000, "large")]

_BANDS_CTE = ("bands(lo, hi, band) AS (VALUES " + ", ".join(
    f"({lo}, {hi}, '{name}')" for lo, hi, name in _BANDS) + ")")


@register(
    "join_range_bands",
    oracle="WITH " + _BANDS_CTE + """
SELECT b.band, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o
JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""",
    covers=("G.join.range",),
)
def q_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join against a broadcast band table — the scalable
    pattern for interval lookup: broadcast-nested-loop over a tiny side is
    O(rows x bands) with no shuffle."""
    o = _t(spark, sf_dir, "orders")
    bands = F.broadcast(spark.createDataFrame(_BANDS, "lo long, hi long, band string"))
    return (
        o.join(bands, (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )


# --------------------------------------------------------------------------
# Windows
# --------------------------------------------------------------------------

@register(
    "window_topk_per_group",
    oracle="""
SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 2
""",
    covers=("G.window.rank",),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per key via row_number with a deterministic tiebreak.  At scale
    the rank<=k filter is pushed by Spark's WindowGroupLimit so each
    partition keeps only k rows before the shuffle."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey",
                F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


@register(
    "window_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
""",
    covers=("G.window.frame",),
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey",
                F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"))
    )


@register(
    "window_lag_delta",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey,
       round(l_extendedprice
             - lag(l_extendedprice, 1, 0.0) OVER (
                 PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey), 2) AS price_delta
FROM lineitem
""",
    covers=("G.window.lag",),
)
def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, l_linenumber) is NOT unique in the fixture — the full
    tiebreak (linenumber, partkey, suppkey) makes the window order (and so
    lag) deterministic across engines."""
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey")
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_partkey",
        F.round(F.col("l_extendedprice")
                - F.lag("l_extendedprice", 1, 0.0).over(w), 2)
         .alias("price_delta"))


@register(
    "window_moving_avg",
    oracle="""
SELECT user_id, event_id,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
FROM events
""",
    covers=("G.window.frame",),
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, Window.currentRow))
    return (_t(spark, sf_dir, "events")
            .select("user_id", "event_id",
                    F.round(F.avg("value").over(w), 4).alias("moving_avg")))


# --------------------------------------------------------------------------
# Sorts / top-k / distinct
# --------------------------------------------------------------------------

@register(
    "topk_global",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
""",
    covers=("G.topk",),
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition heaps + driver merge, never a full sort.  The right
    pattern at any scale as long as k is small."""
    return (_t(spark, sf_dir, "orders")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(15)
            .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice")))


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    covers=("G.distinct",),
)
def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@register(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    covers=("G.setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
""",
    covers=("G.setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers who never placed a >300k order."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (_t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
         .select(F.col("o_custkey").alias("custkey")))
    return c.subtract(o)


@register(
    "setop_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    covers=("E1", "G.setop"),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union (the reference's only set op is E1's record concat — union all
    then envelope; here with DISTINCT semantics for the SQL parity case)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


# --------------------------------------------------------------------------
# Pivot
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]


@register(
    "pivot_event_types",
    oracle="""
SELECT user_id % 10 AS user_bucket,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'view') AS view,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'error') AS error
FROM events
GROUP BY user_id % 10
""",
    covers=("G.pivot",),
)
def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — mandatory at scale (implicit
    pivot first runs a distinct over the pivot column)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(median(l_extendedprice), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       round(quantile_disc(l_extendedprice, 0.5), 4) AS p50_disc
FROM lineitem GROUP BY l_returnflag
""",
    covers=("G.agg.percentile",),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation, matching DuckDB's
    quantile_cont) plus the exact discrete median via
    ``percentile_disc`` — the same buffer-per-group aggregate family as
    the continuous form.  At 100 TB the exact forms need per-group
    state O(group); agg_percentiles_guaranteed pins the sketch-bracket
    scale path.

    The discrete median used to be ``percentile_approx`` with an
    INT_MAX accuracy ("zero error budget") — semantically exact but
    QUADRATIC: an unbounded GK summary compresses against its own
    ever-growing height, measured 156.8 s at the x100 decade vs 6.8 s
    for ``percentile_disc`` (identical results on every probe,
    identical rank-⌈p·n⌉ convention as DuckDB quantile_disc) — the r12
    decade study's defect 8, e₂ = +1.57 before, linear after."""
    li = _t(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5),
                                                  F.lit(0.95)))
    return (li.groupBy("l_returnflag")
              .agg(F.round(pct.getItem(0), 4).alias("p25"),
                   F.round(pct.getItem(1), 4).alias("p50"),
                   F.round(pct.getItem(2), 4).alias("p95"),
                   F.round(F.expr("percentile_disc(0.5) WITHIN GROUP "
                                  "(ORDER BY l_extendedprice)"),
                           4).alias("p50_disc")))


@register(
    "subquery_above_avg",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
""",
    covers=("G.subquery.scalar",),
)
def q_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery decorrelated the way Catalyst does it: the aggregate
    becomes a one-row broadcast crossed into the filter — no per-row
    re-evaluation (SURVEY.md §4.1 'subquery decorrelation: built-in')."""
    o = _t(spark, sf_dir, "orders")
    avg_price = o.agg(F.avg("o_totalprice").alias("_avg"))
    return (o.crossJoin(F.broadcast(avg_price))
            .filter(F.col("o_totalprice") > F.col("_avg"))
            .select("o_orderkey",
                    F.round("o_totalprice", 2).alias("totalprice")))


@register(
    "rollup_time_buckets",
    oracle="""
WITH base AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
)
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_1h,
       time_bucket(INTERVAL '1 day', ts) AS bucket_1d,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM base
GROUP BY GROUPING SETS ((bucket_1h, event_type), (bucket_1d, event_type),
                        (event_type))
""",
    covers=("G.rollup.hypertable",),
)
def q_rollup_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (the TimescaleDB continuous
    aggregate shape): hourly, daily, and all-time aggregates per event_type
    in ONE pass via grouping sets — partial aggregation is shared, not
    recomputed per resolution."""
    # stay in TIMESTAMP_NTZ end-to-end: LTZ outputs collect as
    # host-local wall time and break the oracle hash off-UTC
    ev = _t(spark, sf_dir, "events").select("ts", "event_type", "value")
    # date_trunc returns LTZ even for NTZ input; cast back (identity
    # under the UTC session conf load_table pins)
    base = ev.select(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket_1h"),
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("bucket_1d"),
        "event_type", "value")
    return (base
            .groupingSets(
                [["bucket_1h", "event_type"], ["bucket_1d", "event_type"],
                 ["event_type"]],
                "bucket_1h", "bucket_1d", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value")))


@register(
    "join_full_outer_nations",
    oracle="""
WITH s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
  FROM supplier WHERE s_nationkey < 15 GROUP BY s_nationkey
),
c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_customers
  FROM customer WHERE c_nationkey > 10 GROUP BY c_nationkey
)
SELECT coalesce(s.nationkey, c.nationkey) AS nationkey,
       s.n_suppliers, c.n_customers
FROM s FULL OUTER JOIN c USING (nationkey)
""",
    covers=("G.join.full_outer",),
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on BOTH sides (disjoint filter
    ranges force them)."""
    s = (_t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 15)
         .groupBy(F.col("s_nationkey").alias("nationkey"))
         .agg(F.count(F.lit(1)).alias("n_suppliers")))
    c = (_t(spark, sf_dir, "customer").filter(F.col("c_nationkey") > 10)
         .groupBy(F.col("c_nationkey").alias("nationkey"))
         .agg(F.count(F.lit(1)).alias("n_customers")))
    return (s.join(c, "nationkey", "full_outer")
            .select("nationkey", "n_suppliers", "n_customers"))


@register(
    "join_cross_regions",
    oracle="""
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
""",
    covers=("G.join.cross",),
)
def q_cross_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (tiny x tiny — anything larger belongs behind
    a broadcast or a blocking key, see similarity/dedup operators)."""
    r = _t(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("region_a"))
    b = r.select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b)


@register(
    "window_rank_functions",
    oracle="""
SELECT o_orderkey,
       o_orderpriority,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       lead(o_orderkey) OVER w AS next_key,
       nth_value(o_orderkey, 3) OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS third_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
""",
    covers=("G.window.rank", "G.window.ntile", "G.window.lead"),
)
def q_window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family window functions in one pass (one shuffle,
    one sort, five functions share the frame)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice",
                                                      "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey", "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.lead("o_orderkey").over(w).alias("next_key"),
        F.nth_value("o_orderkey", 3).over(wrun).alias("third_key"),
    )


@register(
    "agg_statistics",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(skewness(l_discount) * (count(*) - 2) / sqrt(count(*) * (count(*) - 1.0)), 6) AS skew_disc,
       round(kurtosis_pop(l_discount), 6) AS kurt_disc
FROM lineitem GROUP BY l_returnflag
""",
    covers=("G.agg.stats",),
)
def q_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (all single-pass, map-side combinable
    moment sketches — the cheap kind of aggregate at 100 TB).

    Estimator pinning: Spark's skewness/kurtosis are the POPULATION
    moments (g1, excess g2); DuckDB defaults to bias-corrected sample
    estimators, so the oracle uses kurtosis_pop and converts skewness via
    g1 = G1 * (n-2) / sqrt(n*(n-1))."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6)
         .alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4)
         .alias("covar_qty_price"),
        F.round(F.skewness("l_discount"), 6).alias("skew_disc"),
        F.round(F.kurtosis("l_discount"), 6).alias("kurt_disc"),
    ))


@register(
    "unpivot_lineitem_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, round(value, 2) AS value
FROM (
  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                  l_discount, l_tax
           FROM lineitem WHERE l_orderkey < 100)
  ON l_quantity, l_extendedprice, l_discount, l_tax
  INTO NAME measure VALUE value
)
""",
    covers=("G.unpivot",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) — the inverse of pivot; Spark expands
    it as a generator expression, no shuffle."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return (li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure", "value")
        .withColumn("value", F.round("value", 2)))


@register(
    "join_salted_revenue",
    oracle="""
SELECT s_nationkey,
       round(sum(l_extendedprice), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
""",
    covers=("G.join.skew",),
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-dim join: the fact side scatters over salt
    buckets, the dimension replicates into each, and the oracle is the
    PLAIN join — proving salting changes the plan, never the result.

    This is the explicit fallback for skew AQE can't split (one hot key
    inside a broadcast build side); see operators/skew.py and SCALE.md.
    """
    from ab_metadata_pusher_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
    return (salted_join(li, sup, "l_suppkey")
            .groupBy("s_nationkey")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


@register(
    "setop_intersect_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
""",
    covers=("G.setop.all",),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) intersection — keeps min(count_left, count_right)
    copies of each row, unlike the distinct-ifying ``intersect``.  Spark
    plans it as a count-compare aggregate + generate, one shuffle per
    side on the full row; at 100 TB both sides pre-aggregate map-side so
    the shuffle carries (row, count) not raw duplicates."""
    o = _t(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    right = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return left.intersectAll(right)


@register(
    "setop_except_all",
    oracle="""
SELECT l_linenumber FROM lineitem WHERE l_returnflag = 'R'
EXCEPT ALL
SELECT l_linenumber FROM lineitem WHERE l_returnflag = 'A'
""",
    covers=("G.setop.all",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference — keeps count_left - count_right copies
    (floored at zero); same count-compare physical shape as
    ``intersectAll``."""
    li = _t(spark, sf_dir, "lineitem")
    left = li.filter(F.col("l_returnflag") == "R").select("l_linenumber")
    right = li.filter(F.col("l_returnflag") == "A").select("l_linenumber")
    return left.exceptAll(right)


@register(
    "agg_bool_bitwise",
    oracle="""
SELECT o_orderstatus,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       bit_and(o_orderkey % 256) AS key_bit_and,
       bit_or(o_orderkey % 256) AS key_bit_or,
       bit_xor(o_orderkey % 256) AS key_bit_xor
FROM orders
GROUP BY o_orderstatus
""",
    covers=("G.agg.bool",),
)
def q_bool_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean every/any and bitwise-reduce aggregates — all fully
    map-side-combinable (commutative + associative), so the shuffle is
    #groups rows regardless of input size."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 256
    return (o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.bit_and(k).alias("key_bit_and"),
        F.bit_or(k).alias("key_bit_or"),
        F.bit_xor(k).alias("key_bit_xor")))


@register(
    "join_lateral_topk",
    oracle="""
SELECT n.n_name, t.o_orderkey, t.o_totalprice
FROM nation n, LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 3
) t
""",
    covers=("G.join.lateral",),
)
def q_join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (top-3 orders per nation).
    Spark decorrelates the ORDER BY + LIMIT lateral into a window
    rank-filter over one join — verify with .explain that no
    nation-at-a-time re-execution survives; DuckDB runs the same SQL
    natively.  The decorrelated plan is the scale story: one shuffle by
    nation key, not 25 correlated scans."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql("""
        SELECT n.n_name, t.o_orderkey, t.o_totalprice
        FROM _lat_nation n
        JOIN LATERAL (
          SELECT o.o_orderkey, o.o_totalprice
          FROM _lat_orders o JOIN _lat_customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey
          LIMIT 3
        ) t
    """)


@register(
    "join_null_safe",
    oracle="""
WITH l AS (
  SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderpriority END AS k,
         count(*) AS n_left
  FROM orders WHERE o_totalprice < 150000 GROUP BY 1
),
r AS (
  SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderpriority END AS k,
         count(*) AS n_right
  FROM orders WHERE o_totalprice >= 150000 GROUP BY 1
)
SELECT l.k AS k, l.n_left, r.n_right
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
""",
    covers=("G.join.null_safe",),
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping — required when a join key is a
    legitimately-absent attribute (here: order priority nulled out for
    in-progress orders).  Spark hashes the null bucket like any value,
    so it stays a hash join (one shuffle per side on k), not a
    cartesian fallback."""
    o = _t(spark, sf_dir, "orders")
    k = F.when(F.col("o_orderstatus") == "P", F.lit(None)) \
         .otherwise(F.col("o_orderpriority")).alias("k")
    left = (o.filter(F.col("o_totalprice") < 150000)
            .groupBy(k).agg(F.count(F.lit(1)).alias("n_left")).alias("l"))
    right = (o.filter(F.col("o_totalprice") >= 150000)
             .groupBy(k).agg(F.count(F.lit(1)).alias("n_right")).alias("r"))
    return (left.join(right, F.col("l.k").eqNullSafe(F.col("r.k")))
            .select(F.col("l.k").alias("k"), "n_left", "n_right"))


@register(
    "agg_regression",
    oracle="""
SELECT l_returnflag,
       round(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       regr_count(l_extendedprice, l_quantity) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    covers=("G.agg.regr",),
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (slope/intercept/R²/corr) — all
    moment-based, so they reduce map-side to six partial sums per group
    and merge exactly; one tiny shuffle at any data size."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (li.groupBy("l_returnflag").agg(
        F.round(F.corr(y, x), 6).alias("corr_price_qty"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n")))


@register(
    "agg_mode",
    oracle="""
WITH c AS (
  SELECT l_returnflag, l_quantity, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
r AS (
  SELECT l_returnflag, l_quantity, n,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, l_quantity) AS rn
  FROM c
)
SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_count
FROM r WHERE rn = 1
""",
    covers=("G.agg.mode",),
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value, ties -> smallest value):
    value-count aggregate then a single argmax per group via max_by on a
    (count, -value) struct — no window, no per-group sort.  Both phases
    are map-side combinable; the oracle uses the explicit
    row_number formulation because SQL mode() leaves ties undefined."""
    li = _t(spark, sf_dir, "lineitem")
    counts = (li.groupBy("l_returnflag", "l_quantity")
              .agg(F.count(F.lit(1)).alias("n")))
    return (counts.groupBy("l_returnflag")
            .agg(F.max_by("l_quantity",
                          F.struct(F.col("n"), -F.col("l_quantity")))
                  .alias("mode_qty"),
                 F.max(F.struct(F.col("n"), -F.col("l_quantity")))
                  .getField("n").alias("mode_count")))


@register(
    "window_ignore_nulls",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_id, user_id, ts,
       round(last_value(v IGNORE NULLS) OVER w, 4) AS last_good_v,
       round(first_value(v IGNORE NULLS) OVER w, 4) AS first_good_v,
       round(nth_value(v, 2 IGNORE NULLS) OVER w, 4) AS second_good_v
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    covers=("G.window.ignore_nulls",),
)
def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation (last/first/nth non-null seen so
    far) over a sensor-style stream where error events carry no value —
    the general form of LOCF.  Partitioned by user (high cardinality),
    growing frame: per-row state is O(1) for first/last and O(k) for
    nth, independent of partition size."""
    ev = _t(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)) \
         .otherwise(F.col("value"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    e = ev.select("event_id", "user_id", "ts", v.alias("v"))
    return e.select(
        "event_id", "user_id", "ts",
        F.round(F.last("v", ignorenulls=True).over(w), 4).alias("last_good_v"),
        F.round(F.first("v", ignorenulls=True).over(w), 4)
         .alias("first_good_v"),
        F.round(F.nth_value("v", 2, ignoreNulls=True).over(w), 4)
         .alias("second_good_v"))


@register(
    "subquery_not_in",
    oracle="""
SELECT o_orderkey, nullif(o_custkey, 7) AS cust
FROM orders
WHERE nullif(o_custkey, 7) NOT IN
      (SELECT c_custkey FROM customer WHERE c_acctbal < 100)
""",
    covers=("G.subquery.not_in",),
)
def q_subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a nullable outer column — SQL's three-valued-logic
    trap: ``NULL NOT IN (...)`` is NULL, so rows whose probe key is NULL
    must be DROPPED, where a naive left-anti join would keep them (NULL
    matches nothing, so anti-join retains the row).  The nullif()
    synthesizes NULL probes the fixtures don't have.

    Expressed as real SQL so Catalyst plans its null-aware anti join
    rather than a hand-rolled join+filter; the oracle runs the identical
    predicate.  At scale this stays a broadcast anti join while the
    subquery side is provably small; if the subquery side could contain
    NULLs, Spark falls back to a non-splittable single-key lookup — the
    docstring-level moral is to add an IS NOT NULL guard on the subquery
    column whenever the schema allows it."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_ni_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_ni_customer")
    return spark.sql("""
        SELECT o_orderkey, nullif(o_custkey, 7) AS cust
        FROM _ni_orders
        WHERE nullif(o_custkey, 7) NOT IN
              (SELECT c_custkey FROM _ni_customer WHERE c_acctbal < 100)
    """)


@register(
    "agg_filtered",
    oracle="""
SELECT l_returnflag,
       count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       count(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
       round(sum(l_extendedprice) FILTER (WHERE year(l_shipdate) = 1995), 2)
           AS rev_1995,
       round(avg(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4)
           AS avg_qty_f
FROM lineitem
GROUP BY l_returnflag
""",
    covers=("G.agg.filtered",),
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (SQL FILTER clause): four differently-
    predicated aggregates in ONE pass over the fact table — the
    dashboard-query staple that would otherwise be four scans or a
    pre-pivot.  Spark spells it count_if / aggregate-over-CASE; both
    compile to the same partial-aggregable expressions, so the shuffle
    carries one row per (group, 4 accumulators) and map-side combine
    does the heavy lifting regardless of group skew."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_tax") == 0).alias("n_taxfree"),
        F.round(F.sum(F.when(F.year("l_shipdate") == 1995,
                             F.col("l_extendedprice"))), 2)
         .alias("rev_1995"),
        F.round(F.avg(F.when(F.col("l_linestatus") == "F",
                             F.col("l_quantity"))), 4)
         .alias("avg_qty_f")))


_BIN_W = 50_000  # bin width for the binned range join (divides every band edge)


@register(
    "join_range_binned",
    oracle="WITH " + _BANDS_CTE + """
SELECT b.band, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o
JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""",
    covers=("G.join.range.binned",),
)
def q_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SHUFFLE-scalable range join: explode each interval into the
    fixed-width bins it covers, equi-join point-side bin to interval-side
    bin, re-check the exact predicate, aggregate.  Same result as
    join_range_bands (the oracle is identical), different physical
    strategy: a hash join on the bin key instead of a broadcast nested
    loop — the form that survives when the interval table is itself too
    big to broadcast (the Databricks range-join-hint trick, expressed as
    a plain composition).

    Cost: interval side inflates by (span / bin_width) rows — pick the
    width near the median interval span so most intervals land in O(1)
    bins; the point side computes one integer bin, and the join is an
    ordinary shuffled (or AQE-broadcast, as here) equi-join that salts,
    prunes and skew-splits like any other."""
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "lo long, hi long, band string")
    binned_bands = bands.select(
        "lo", "hi", "band",
        F.explode(F.sequence(
            (F.col("lo") / _BIN_W).cast("long"),
            ((F.col("hi") - 1) / _BIN_W).cast("long"))).alias("bin"))
    pts = o.select("o_totalprice",
                   (F.col("o_totalprice") / _BIN_W).cast("long").alias("bin"))
    return (pts.join(binned_bands, "bin")
            .filter((F.col("o_totalprice") >= F.col("lo"))
                    & (F.col("o_totalprice") < F.col("hi")))
            .groupBy("band")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price")))


@register(
    "window_moving_median",
    oracle="""
SELECT user_id, ts,
       round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)
           AS med5
FROM events
""",
    covers=("G.window.median",),
)
def q_window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median (5-row lookback per user) — the robust-smoothing
    window Spark has no native frame function for: composed as
    sort_array(collect_list) over the frame + order-statistic pick,
    handling odd/even frames with the ceil/floor+1 midpoint average.
    The oracle uses DuckDB's NATIVE median-over-frame — two different
    algorithms, same values.

    The composed form carries the frame contents (bounded: 5 values) per
    row, so state is O(frame), exactly like any built-in frame aggregate;
    at 100 TB it shuffles once on user_id like every other window here.
    A Pandas UDAF would be the escape hatch for large frames."""
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, Window.currentRow))
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.ceil(n / 2).cast("int")              # upper median index (1-based)
    hi = (F.floor(n / 2) + 1).cast("int")       # lower median index (1-based)
    med = (F.element_at(arr, lo) + F.element_at(arr, hi)) / 2
    return ev.select("user_id", "ts", F.round(med, 4).alias("med5"))


@register(
    "setop_union_evolve",
    oracle="""
SELECT event_id, user_id, source, value FROM (
  SELECT event_id, user_id, 'v1' AS source
  FROM events WHERE event_id % 3 = 0
  UNION ALL BY NAME
  SELECT event_id, user_id, value, 'v2' AS source
  FROM events WHERE event_id % 3 = 1)
""",
    covers=("G.setop.evolve",),
)
def q_union_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: v1 rows predate the `value` column, v2
    rows carry it — `unionByName(allowMissingColumns=True)` aligns by
    NAME and null-fills the missing column (DuckDB's UNION ALL BY NAME),
    where positional UNION would silently mis-bind columns.  The daily
    reality of long-lived event streams: readers must union epochs of
    the schema, and name-based alignment is the only shape that stays
    correct as columns accrete.  Pure narrow op — no shuffle; the union
    is a scan-concat."""
    ev = _t(spark, sf_dir, "events")
    v1 = (ev.filter(F.col("event_id") % 3 == 0)
          .select("event_id", "user_id", F.lit("v1").alias("source")))
    v2 = (ev.filter(F.col("event_id") % 3 == 1)
          .select("event_id", "user_id", "value", F.lit("v2").alias("source")))
    return v1.unionByName(v2, allowMissingColumns=True)


@register(
    "cdc_latest_snapshot",
    oracle="""
SELECT user_id, value AS current_value, ts AS updated_at
FROM (SELECT user_id, value, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1 AND event_type <> 'error'
""",
    covers=("G.cdc.upsert",),
)
def q_cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog -> current snapshot (MERGE semantics without a
    mutable table): treat events as an upsert stream keyed by user_id
    ('error' rows are deletes), apply last-writer-wins by (ts, event_id)
    version order, and drop keys whose final op is a delete.  One
    window over one shuffle on the key — the compaction every
    table-format (Delta/Iceberg/Hudi CDC read) runs under the hood.

    At 100 TB: this plan IS the periodic compaction job; between
    compactions the same logic serves reads as a view over
    base UNION changelog.  AQE handles hot-key skew in the window
    shuffle; the rn=1 filter is a WindowGroupLimit pushdown (top-1 per
    key computed with a per-partition running max, not a full sort)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                              F.col("event_id").desc())
    return (ev.select("user_id", "value", "ts", "event_type",
                      F.row_number().over(w).alias("rn"))
            .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
            .select("user_id", F.col("value").alias("current_value"),
                    F.col("ts").alias("updated_at")))


@register(
    "cdc_scd2_intervals",
    oracle="""
SELECT user_id, event_type AS state, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS version
FROM (SELECT *,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)
WHERE prev_type IS NULL OR event_type <> prev_type
""",
    covers=("G.cdc.scd2",),
)
def q_cdc_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change stream: keep only
    rows where the tracked attribute actually CHANGED (lag compaction),
    then stamp [valid_from, valid_to) validity windows with lead — open
    intervals (valid_to NULL) are the current version.  Composed with
    cdc_latest_snapshot this is the full table-format story: snapshot =
    SCD2 where valid_to IS NULL.

    One shuffle on user_id serves all three windows (lag, lead, and
    row_number share partitioning and ordering — one Exchange, one Sort
    in the plan).  At 100 TB the change-compaction filter runs FIRST, so
    the interval-stamping windows see only change rows — on slowly
    changing attributes that is orders of magnitude fewer rows than the
    event stream."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (ev.withColumn("prev_type",
                             F.lag("event_type").over(w))
               .filter(F.col("prev_type").isNull()
                       | (F.col("event_type") != F.col("prev_type"))))
    return changes.select(
        "user_id", F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"))


@register("agg_hll_sketch_union",
          oracle=PINNED_ORACLES["agg_hll_sketch_union"],
          covers=("G.agg.sketch_union",))
def q_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — THE 100 TB distinct-count architecture:
    build one Datasketches HLL sketch per (priority, status) cell
    (hll_sketch_agg), persist-then-UNION the sketches up to priority
    totals (hll_union_agg) without ever re-touching the rows.  This is
    how a 1000-executor cluster serves "distinct users per day AND per
    month AND overall" from one pass over the data: the re-aggregation
    cost is sketch-sized (~KB), not data-sized.

    Oracle: pinned constants (the sketch is a deterministic function
    of the input multiset — union is register-wise max, order- and
    partition-independent; scripts/gen_pinned_oracles.py regenerates);
    tests/test_sketches.py additionally bounds the estimate against the
    exact count (<2% at HLL lgK=12)."""
    o = _t(spark, sf_dir, "orders")
    cells = (o.groupBy("o_orderpriority", "o_orderstatus")
             .agg(F.hll_sketch_agg("o_custkey").alias("sk")))
    return (cells.groupBy("o_orderpriority")
            .agg(F.hll_sketch_estimate(
                F.hll_union_agg("sk")).alias("approx_customers")))


@register(
    "join_temporal_dim",
    oracle="""
SELECT b.user_id, b.ts, b.event_id,
       (SELECT round(s.value, 2)
        FROM events s
        WHERE s.event_type = 'signup' AND s.user_id = b.user_id
          AND s.ts <= b.ts
        ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS plan_in_effect
FROM events b WHERE b.event_type = 'purchase'
""",
    covers=("G.join.temporal",),
)
def q_join_temporal_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) dimension join WITHOUT a join: each
    purchase picks up the signup 'plan' in effect at its timestamp.  The
    sorted-union trick: tag dimension-change rows and fact rows, union,
    ONE window ordered (ts, dim-first, event_id) per user, and
    last_value(ignore nulls) carries the current dimension value onto
    every fact row.  The oracle states the same semantics as a
    correlated top-1 subquery — maximally different algorithm.

    This beats the range-join formulation at scale: one shuffle on the
    entity key and a linear merge per partition, versus an interval
    join's candidate explosion.  It is the batch twin of the streaming
    as-of pattern, and the lookup side of cdc_scd2_intervals: the same
    window that stamps validity intervals can instead deliver the value
    in effect directly onto consumers."""
    ev = _t(spark, sf_dir, "events")
    dim = (ev.filter(F.col("event_type") == "signup")
           .select("user_id", "ts", "event_id",
                   F.round("value", 2).alias("plan"), F.lit(1).alias("is_dim")))
    fact = (ev.filter(F.col("event_type") == "purchase")
            .select("user_id", "ts", "event_id",
                    F.lit(None).cast("double").alias("plan"),
                    F.lit(0).alias("is_dim")))
    w = (Window.partitionBy("user_id")
         .orderBy("ts", F.desc("is_dim"), "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (dim.unionByName(fact)
            .withColumn("plan_in_effect",
                        F.last("plan", ignorenulls=True).over(w))
            .filter(F.col("is_dim") == 0)
            .select("user_id", "ts", "event_id", "plan_in_effect"))


@register(
    "window_ema_bounded",
    oracle="""
SELECT user_id, event_id,
       round((coalesce(lag(value, 0) OVER w, 0)
              + 0.5 * coalesce(lag(value, 1) OVER w, 0)
              + 0.25 * coalesce(lag(value, 2) OVER w, 0)
              + 0.125 * coalesce(lag(value, 3) OVER w, 0))
             / (CASE WHEN lag(value, 0) OVER w IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN lag(value, 1) OVER w IS NOT NULL
                       THEN 0.5 ELSE 0 END
                + CASE WHEN lag(value, 2) OVER w IS NOT NULL
                       THEN 0.25 ELSE 0 END
                + CASE WHEN lag(value, 3) OVER w IS NOT NULL
                       THEN 0.125 ELSE 0 END), 4) AS ema
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    covers=("G.window.ema",),
)
def q_window_ema_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average with a bounded lookback
    (decay 0.5, last 4 observations) per user — the smoothing primitive
    behind trend/quality drift monitors.  Expressed as an explicit
    lag-weight chain so the arithmetic is the literal same expression in
    both engines (a native EWMA would be engine-specific state); partial
    windows renormalize over the weights actually present.  One shuffle
    + per-partition sort, identical to any lag window; the lag chain is
    a single window spec so Spark evaluates one sorted pass."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weights = [1.0, 0.5, 0.25, 0.125]
    num = sum((F.coalesce(F.lag("value", j).over(w), F.lit(0.0)) * wt
               for j, wt in enumerate(weights)), F.lit(0.0))
    den = sum((F.when(F.lag("value", j).over(w).isNotNull(), wt)
               .otherwise(0.0)
               for j, wt in enumerate(weights)), F.lit(0.0))
    return ev.select("user_id", "event_id",
                     F.round(num / den, 4).alias("ema"))


@register(
    "window_distribution_funcs",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CASE WHEN percent_rank() OVER w <= 0.1 THEN 'top_decile'
            WHEN cume_dist() OVER w >= 0.9 THEN 'bottom_decile'
            ELSE 'mid' END AS band
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC,
             o_orderkey)
""",
    covers=("G.window.distribution",),
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank (rank-1)/(n-1) and
    cume_dist over per-priority price order, banded into deciles — the
    relative-standing primitives behind curriculum difficulty scores and
    per-domain percentile cutoffs (sample_length_curriculum uses ntile;
    these are its continuous cousins).  Same single shuffle + sort as
    any rank window; tie-broken deterministically for the oracle."""
    ev = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey")
    pr, cd = F.percent_rank().over(w), F.cume_dist().over(w)
    return ev.select(
        "o_orderkey", "o_orderpriority",
        F.round(pr, 6).alias("pct_rank"),
        F.round(cd, 6).alias("cume"),
        F.when(pr <= 0.1, "top_decile")
         .when(cd >= 0.9, "bottom_decile")
         .otherwise("mid").alias("band"))


@register(
    "quality_fk_violations",
    oracle="""
SELECT 'orders.o_custkey->customer' AS fk, count(*) AS n_orphans
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'lineitem.l_orderkey->orders', count(*)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT 'lineitem.l_partkey->part', count(*)
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_partkey IS NULL
""",
    covers=("G.quality.referential",),
)
def q_fk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    for each FK edge via anti joins — the data-quality gate a pipeline
    runs BEFORE publishing a graph built on those joins (the engine's
    metadata graph assumes exactly these edges hold).  Each anti join
    broadcasts the key side when small and degenerates to one shuffle
    otherwise; the three audits share nothing and run in parallel.

    At 100 TB: anti join beats except/distinct formulations because it
    never materializes the distinct key set, and a Bloom runtime filter
    (proven in tests/test_bucketing.py) prunes the probe scan."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def orphans(fact, key, dim, dim_key, label):
        return (fact.join(dim, fact[key] == dim[dim_key], "left_anti")
                .agg(F.count(F.lit(1)).alias("n_orphans"))
                .select(F.lit(label).alias("fk"), "n_orphans"))

    return (orphans(o, "o_custkey", c, "c_custkey",
                    "orders.o_custkey->customer")
            .unionByName(orphans(li, "l_orderkey", o, "o_orderkey",
                                 "lineitem.l_orderkey->orders"))
            .unionByName(orphans(li, "l_partkey", p, "p_partkey",
                                 "lineitem.l_partkey->part")))


@register(
    "quality_expectations",
    oracle="""
WITH w AS (
  SELECT count(*) AS n,
    CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS r1,
    CAST(sum(CASE WHEN NOT coalesce(o_totalprice < 300000, FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS r2,
    CAST(sum(CASE WHEN NOT coalesce(
               o_orderpriority IN ('1-URGENT', '2-HIGH'), FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS r3,
    CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O', 'F', 'P'), FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS r4
  FROM orders)
SELECT 'price_positive' AS rule, r1 AS n_violations, n AS n_rows,
       r1 * 1000000 // n AS violated_ppm FROM w
UNION ALL SELECT 'price_under_300k', r2, n, r2 * 1000000 // n FROM w
UNION ALL SELECT 'urgent_or_high', r3, n, r3 * 1000000 // n FROM w
UNION ALL SELECT 'status_valid', r4, n, r4 * 1000000 // n FROM w
""",
    covers=("G.quality.expectations",),
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations report (operators/quality.py): four
    admission rules over orders evaluated in ONE map-side-combinable
    aggregate — per-rule violation counts and exact integer ppm rates,
    rule-count-sized output at any corpus size.  The same rule dict
    drives apply_expectations' valid/quarantine split
    (tests/test_analytics.py)."""
    from ab_metadata_pusher_spark.operators.quality import (
        expectations_report,
    )
    o = _t(spark, sf_dir, "orders")
    return expectations_report(o, {
        "price_positive": F.col("o_totalprice") > 0,
        "price_under_300k": F.col("o_totalprice") < 300000,
        "urgent_or_high": F.col("o_orderpriority")
                           .isin("1-URGENT", "2-HIGH"),
        "status_valid": F.col("o_orderstatus").isin("O", "F", "P"),
    })


#: agg_percentiles_guaranteed: quantiles computed, GK rank-error budget
#: (accuracy = 1/eps), and the bracket half-width in rank space.
_PCTL_GUAR_PS = (0.5, 0.95, 0.99)
_PCTL_GUAR_EPS = 0.01


@register(
    "agg_percentiles_guaranteed",
    oracle="""
SELECT o_orderpriority,
       quantile_disc(o_totalprice, 0.5)  AS p50,
       quantile_disc(o_totalprice, 0.95) AS p95,
       quantile_disc(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderpriority
""",
    covers=("G.agg.approx_percentile",),
)
def q_percentiles_guaranteed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles found through the GK sketch — the
    sketch-proposes / exact-refines pattern (same model as
    agg_heavy_hitters_guaranteed), replacing the r1-r9
    ``agg_approx_percentiles`` whose raw GK cutpoints were
    partition-layout-dependent and therefore un-orackleable (r9 VERDICT
    ask #7).

    Pass 1 (sketch): per group, ``percentile_approx`` at p±2ε
    (accuracy 1/ε) proposes a value bracket [lo, hi] per quantile.
    GK's rank guarantee — the returned value's rank is within ε·n of
    the requested rank — means the bracket provably CONTAINS the value
    at rank ⌈p·n⌉ whenever ε·n ≥ 1 (n ≥ 100 here; below that the
    buffered sketch is exact anyway).  Pass 2 (exact refine): one more
    scan counts rows strictly below ``lo`` and collects ONLY the
    in-bracket rows (≈4ε·n of them, the memory bound), so the value at
    exact rank ⌈p·n⌉ is ``sorted(in_bracket)[rank - below]``.  The
    result is the exact discrete percentile — partition-independent,
    hash-checkable against DuckDB's ``quantile_disc`` (empirically
    rank = max(1, ceil(p*n)), probed at n=4 and n=5) — while the 100 TB
    cost keeps the sketch's shape: two map-side-combinable passes, no
    per-group full-column sort, per-group agg state O(ε·n) instead of
    O(n).  Ties to the driver's value-hash gate because both engines
    emit an ACTUAL data value (no interpolation arithmetic to drift).
    """
    ps, eps = _PCTL_GUAR_PS, _PCTL_GUAR_EPS
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_totalprice").alias("x"))
    plos = [max(0.0, p - 2 * eps) for p in ps]
    phis = [min(1.0, p + 2 * eps) for p in ps]
    br = (o.groupBy("o_orderpriority")
          .agg(F.count("x").alias("n"),
               F.percentile_approx("x", plos + phis,
                                   int(round(1 / eps))).alias("qb")))
    j = o.join(F.broadcast(br), "o_orderpriority")
    aggs = [F.first("n").alias("n")]
    for i in range(len(ps)):
        lo, hi = F.col("qb")[i], F.col("qb")[i + len(ps)]
        aggs.append(F.sum(F.when(F.col("x") < lo, 1).otherwise(0))
                    .alias(f"below_{i}"))
        aggs.append(F.sort_array(F.collect_list(
            F.when(F.col("x").between(lo, hi), F.col("x"))))
            .alias(f"inb_{i}"))
    refined = j.groupBy("o_orderpriority").agg(*aggs)
    out = [F.col("o_orderpriority")]
    for i, (p, name) in enumerate(zip(ps, ("p50", "p95", "p99"))):
        rank = F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("n")))
        out.append(F.element_at(
            F.col(f"inb_{i}"),
            (rank - F.col(f"below_{i}")).cast("int")).alias(name))
    return refined.select(*out)


@register("agg_heavy_hitters", covers=("G.agg.heavy_hitters",))
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters over events.event_type
    (operators/sketches.py): bounded-memory frequency estimation — k
    counters per partition, P*k-row merge — where the exact groupBy
    would shuffle the full key cardinality.  Every type above the
    n/(k+1) undercount bound is guaranteed reported, so the row set is
    partitioning-independent here even though estimates are not.

    No oracle (estimates depend on partition layout); rows-only from the
    driver, with both MG error bounds property-tested in
    tests/test_sketches.py."""
    from ab_metadata_pusher_spark.operators.sketches import heavy_hitters_mg
    return heavy_hitters_mg(_t(spark, sf_dir, "events"), "event_type", k=8)


@register(
    "agg_heavy_hitters_guaranteed",
    oracle="""
SELECT CAST(event_type AS VARCHAR) AS item,
       CAST(count(*) AS BIGINT) AS exact_count
FROM events WHERE event_type IS NOT NULL
GROUP BY event_type
HAVING count(*) * 5 > (SELECT count(*) FROM events
                       WHERE event_type IS NOT NULL)
""",
    covers=("G.agg.heavy_hitters",),
)
def q_heavy_hitters_guaranteed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic heavy hitters (operators/sketches.py
    guaranteed_heavy_hitters): MG sketch proposes ≤k candidates — which
    provably include every item above the n/(k+1) frequency bound — then
    a broadcast semi-join counts the candidates EXACTLY and keeps those
    above the bound.  Partition-layout-independent by construction, so
    unlike agg_heavy_hitters this one is fully hash-checkable against
    plain SQL; the sketch's value at 100 TB is that the exact pass
    shuffles ≤k keys, not the column's full cardinality."""
    from ab_metadata_pusher_spark.operators.sketches import (
        guaranteed_heavy_hitters,
    )
    return guaranteed_heavy_hitters(
        _t(spark, sf_dir, "events"), "event_type", k=4)


@register(
    "window_running_distinct",
    oracle="""
SELECT user_id, event_id,
       count(DISTINCT event_type)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS n_types_seen
FROM events
""",
    covers=("G.window.count_distinct",),
)
def q_window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user — the window SQL gap: Spark has no
    COUNT(DISTINCT) OVER, so the engine states it as size(collect_set()
    OVER) — set semantics give exactly the distinct count, and the set
    is bounded by event-type cardinality, not row count.  (For unbounded-
    cardinality columns the scale form is the first-occurrence flag —
    row_number per (user, value) == 1 — summed over the frame.)  The
    oracle uses DuckDB's native windowed DISTINCT aggregate; ties order
    deterministically on (ts, event_id)."""
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "user_id", "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_seen"))


@register(
    "subquery_correlated_exists",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_totalprice > c.c_acctbal * 100
)
""",
    covers=("G.subquery.correlated_exists",),
)
def q_subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a cross-relation inequality (order value
    exceeding 100x the customer's balance) — the subquery shape that is
    NOT a plain semi-join on equal keys.  Stated in Spark SQL so Catalyst
    performs the decorrelation (RewriteCorrelatedScalarSubquery /
    RewritePredicateSubquery turn it into a left-semi join with the
    inequality as residual); the DataFrame API cannot express correlated
    subqueries directly, and hand-decorrelating is exactly the rewrite
    the optimizer owns."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_totalprice > c.c_acctbal * 100
        )
    """)


@register(
    "setop_symmetric_diff",
    oracle="""
WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
b AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
SELECT k, 'only_building' AS side FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
UNION ALL
SELECT k, 'only_finished' AS side FROM (SELECT k FROM b EXCEPT SELECT k FROM a)
""",
    covers=("G.setop.symmetric_diff",),
)
def q_setop_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with side provenance: building-segment
    customers vs customers with finished orders, each EXCEPT branch
    tagged.  Both EXCEPTs hash on the same key, so AQE plans them from
    one pair of shuffles."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = (c.filter(F.col("c_mktsegment") == "BUILDING")
         .select(F.col("c_custkey").alias("k")))
    b = (o.filter(F.col("o_orderstatus") == "F")
         .select(F.col("o_custkey").alias("k")))
    return (a.subtract(b)
            .withColumn("side", F.lit("only_building"))
            .unionByName(b.subtract(a)
                         .withColumn("side", F.lit("only_finished"))))


@register(
    "agg_weighted_avg",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(sum(CAST(round(l_extendedprice * l_quantity * 100, 0)
                          AS BIGINT)) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
                     AS BIGINT) AS DOUBLE) AS weighted_avg_price_x100
FROM lineitem GROUP BY l_returnflag
""",
    covers=("G.agg.weighted_avg",),
)
def q_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average extended price per return flag —
    sum(w*x)/sum(w) with BOTH sums accumulated as exact fixed-point
    longs (doubles would drift with partitioning; the one float division
    at the end is engine-identical on identical longs)."""
    li = _t(spark, sf_dir, "lineitem")
    wx = F.round(F.col("l_extendedprice") * F.col("l_quantity") * 100, 0) \
          .cast("long")
    w = F.round(F.col("l_quantity") * 100, 0).cast("long")
    return (li.groupBy("l_returnflag")
            .agg((F.sum(wx).cast("double") / F.sum(w).cast("double"))
                 .alias("weighted_avg_price_x100")))


@register(
    "pivot_multi_agg",
    oracle="""
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS click_n,
       CAST(coalesce(sum(CAST(round(value * 100, 0) AS BIGINT))
                     FILTER (WHERE event_type = 'click'), 0) AS DOUBLE) / 100
         AS click_total,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
       CAST(coalesce(sum(CAST(round(value * 100, 0) AS BIGINT))
                     FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE) / 100
         AS purchase_total
FROM events GROUP BY user_id
""",
    covers=("G.pivot.multi_agg",),
)
def q_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per pivoted value (count + exact
    cents total per event type): Spark names multi-agg pivot columns
    `value_alias`, re-aliased here to the oracle's filtered-aggregate
    names.  One shuffle however many (value, agg) pairs spread out."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    p = (ev.select("user_id", "event_type", cents.alias("cents"))
         .groupBy("user_id")
         .pivot("event_type", ["click", "purchase"])
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("cents").alias("cents")))
    return p.select(
        "user_id",
        F.col("click_n"),
        (F.coalesce(F.col("click_cents"), F.lit(0)).cast("double") / 100)
            .alias("click_total"),
        F.col("purchase_n"),
        (F.coalesce(F.col("purchase_cents"), F.lit(0)).cast("double") / 100)
            .alias("purchase_total"))


@register(
    "agg_histogram_equi_depth",
    oracle="""
SELECT bucket, count(*) AS n_rows,
       min(v) AS lo, max(v) AS hi
FROM (SELECT l_extendedprice AS v,
             ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                             l_linenumber) AS bucket
      FROM lineitem)
GROUP BY bucket
""",
    covers=("G.agg.histogram_equi_depth",),
)
def q_agg_histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (equal row counts per bucket, data-dependent
    boundaries) — the statistics a range-clustered layout or skew-aware
    partitioner actually needs, vs agg_histogram's fixed-width bins.
    Exact form uses a global ntile (single-partition sort — correct but
    the known bounded-use shape; ties broken on the unique key for
    determinism).  At 100 TB compute boundaries from approx_percentile
    cutpoints instead: one mergeable pass, then a map-side bucket
    assignment — same output contract, no global sort."""
    from pyspark.sql import Window
    li = _t(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    return (li.select(F.col("l_extendedprice").alias("v"),
                      F.ntile(10).over(w).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("v").alias("lo"), F.max("v").alias("hi")))


@register(
    "subquery_correlated_scalar",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_small_orders,
       round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey)
""",
    covers=("G.subquery.correlated_scalar",),
)
def q_subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR aggregate subquery (TPC-H Q17's shape): rows
    whose quantity is below half their part's own average.  The third
    correlated-subquery form next to EXISTS (subquery_correlated_exists)
    and NOT IN (subquery_not_in): a per-outer-row aggregate over the
    same fact table.

    Expressed as its decorrelation — per-part averages (one map-side-
    combinable groupBy producing a #parts-sized frame) joined back and
    filtered — which is exactly the plan Catalyst rewrites the nested
    SQL into; writing the join directly keeps the threshold frame
    reusable and the oracle states the nested form, so the two engines
    agree across the rewrite.  At 100 TB both sides shuffle on partkey
    once; AQE broadcasts the averages when #parts allows."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    th = (li.groupBy("l_partkey")
          .agg((F.lit(0.5) * F.avg("l_quantity")).alias("q_th")))
    return (li.join(th, "l_partkey")
            .filter(F.col("l_quantity") < F.col("q_th"))
            .agg(F.count(F.lit(1)).alias("n_small_orders"),
                 F.round(F.sum("l_extendedprice") / 7.0, 2)
                  .alias("avg_yearly")))


@register(
    "agg_having_in",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       round(big.total_qty, 2) AS total_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 270) big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    covers=("G.agg.having",),
)
def q_agg_having_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume-customer lookup (TPC-H Q18's shape): aggregate the
    fact table, keep groups over a HAVING threshold, then join the
    surviving (tiny) group set back to the dimension chain.  The HAVING
    filter collapses the fact table to a handful of keys BEFORE any
    dimension join, so both joins broadcast the aggregate side — the
    order matters at 100 TB: joining first and filtering last would
    shuffle orders and customer against the full fact table."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("total_qty"))
           .filter(F.col("total_qty") > 270))
    return (F.broadcast(big)
            .join(o, big.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey",
                    F.round("total_qty", 2).alias("total_qty")))


@register(
    "join_disjunctive_pred",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_size BETWEEN 11 AND 25 AND l.l_quantity BETWEEN 20 AND 40)
   OR (p.p_size BETWEEN 26 AND 50 AND l.l_quantity >= 35)
""",
    covers=("G.join.disjunctive",),
)
def q_join_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive mixed-table predicates over an equi-join (TPC-H Q19's
    shape): three OR'd conjunction arms, each constraining BOTH sides.
    The optimizer hazard this pins: the OR must not defeat the equi-join
    detection (a naive engine falls back to a nested-loop theta join),
    and the single-table prefilters implied by the disjunction
    (p_size 1..50, l_quantity >= 1) should still push to the scans.
    Spark keeps the hash join on p_partkey and evaluates the residual
    OR post-join; part is the small side and broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q, s = F.col("l_quantity"), F.col("p_size")
    arm1 = s.between(1, 10) & q.between(1, 20)
    arm2 = s.between(11, 25) & q.between(20, 40)
    arm3 = s.between(26, 50) & (q >= 35)
    return (j.filter(arm1 | arm2 | arm3)
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"),
                 F.count(F.lit(1)).alias("n_rows")))


@register(
    "cdc_join_view_delta",
    oracle="""
SELECT o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
    covers=("G.cdc.join_view",),
)
def q_cdc_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: revenue per order
    priority over orders ⋈ lineitem, maintained from a base snapshot
    plus deltas via the delta-join identity
    Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — the algebra every streaming
    materialized-view engine implements.  rollup_incremental_merge
    covers single-table aggregate IVM; this pins the two-table case.

    Both tables are deterministically split into base/delta on
    coprime key moduli (7 and 5), so all three delta terms are
    non-empty — including the cross term a full recompute would
    silently hide.  The maintained result (base view + aggregated
    delta terms, merged by outer union-sum) is verified against the
    oracle's FULL recompute, i.e. the check is the IVM identity
    itself, not a mirrored implementation.

    At 100 TB: the delta terms join a small frame against a big one —
    broadcast the delta side, never re-shuffle the base; the view merge
    touches #groups rows.  Partial-sum merge (sum-of-sums, count-of-
    counts) is exactly how the view stays mergeable."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")

    a = o.filter(F.col("o_orderkey") % 7 != 0)
    da = o.filter(F.col("o_orderkey") % 7 == 0)
    b = li.filter(F.col("l_orderkey") % 5 != 0)
    db = li.filter(F.col("l_orderkey") % 5 == 0)

    def view(orders_df: DataFrame, items_df: DataFrame) -> DataFrame:
        return (orders_df.join(
                    items_df, orders_df.o_orderkey == items_df.l_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.sum(rev).alias("revenue"),
                     F.count(F.lit(1)).alias("n_items")))

    base_view = view(a, b)  # "yesterday's" materialized state
    deltas = (view(da, b)
              .unionByName(view(a, db))
              .unionByName(view(da, db)))
    merged = (base_view.unionByName(deltas)
              .groupBy("o_orderpriority")
              .agg(F.sum("revenue").alias("revenue"),
                   F.sum("n_items").alias("n_items")))
    return merged.select("o_orderpriority",
                         F.round("revenue", 2).alias("revenue"),
                         F.col("n_items"))


def _cm_oracle() -> str:
    from ab_metadata_pusher_spark.operators.sketches import (
        CM_DEPTH, cm_cell_sql)
    cell_selects = " UNION ALL ".join(
        f"SELECT {r} AS r, "
        f"{cm_cell_sql('CAST(l_partkey AS VARCHAR)', r)} AS c FROM lineitem"
        for r in range(CM_DEPTH))
    probe_selects = " UNION ALL ".join(
        f"SELECT v, {r} AS r, {cm_cell_sql('CAST(v AS VARCHAR)', r)} AS c "
        f"FROM pv" for r in range(CM_DEPTH))
    return f"""
WITH cells AS MATERIALIZED (
  SELECT r, c, count(*) AS cnt FROM ({cell_selects}) GROUP BY r, c),
pv AS (SELECT CAST(v AS BIGINT) AS v
       FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8)) p(v)),
ph AS ({probe_selects}),
est AS (SELECT v, min(cnt) AS cm_est FROM ph JOIN cells USING (r, c)
        GROUP BY v),
tru AS (SELECT l_partkey AS v, count(*) AS true_cnt FROM lineitem
        WHERE l_partkey BETWEEN 1 AND 8 GROUP BY l_partkey)
SELECT tru.v AS item, true_cnt, cm_est FROM tru JOIN est ON tru.v = est.v
"""


@register("agg_countmin_sketch", oracle=_cm_oracle(),
          covers=("G.agg.countmin",))
def q_agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch: depth x width cell counts from the shared
    cross-engine md5 hash family, probed for 8 fixed part keys and
    reported next to the TRUE counts (estimate >= truth always; error
    <= 2n/width w.p. 1-2^-depth).  Unlike the HLL/GK sketch internals
    (engine-specific, rows-only checkable), every Count-Min cell is an
    exact count of hash-colliding keys — the driver verifies the sketch
    VALUE-for-value, closing the "sketches aren't oracle-checkable" gap
    the same way agg_heavy_hitters_guaranteed did for Misra-Gries.

    Build is one narrow (r, c) groupBy over an in-row depth-way
    expansion (map-side combinable; 256 cells out regardless of input
    size); estimates broadcast-join the 256-cell frame.  At 100 TB the
    sketch IS the shuffle payload — constant size, mergeable by adding
    cells, the same shape streaming aggregation state wants."""
    from ab_metadata_pusher_spark.operators.sketches import (
        countmin_build, countmin_estimate)
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    # The single-file fixture scan splits into ~3 input partitions, which
    # would serialize the md5 stage onto 3 cores; spreading one long
    # column first is a near-free shuffle (a real corpus arrives as many
    # files and skips this).  Materialize the 256-row sketch once — the
    # broadcast for the probe join and the true-count comparison would
    # otherwise each rebuild it.
    spread = spread_if_narrow(li)
    cells = materialize_shared(countmin_build(spread, "l_partkey"))
    probes = spark.range(1, 9).select(F.col("id").alias("l_partkey"))
    est = countmin_estimate(cells, probes, "l_partkey")
    tru = (li.filter(F.col("l_partkey").between(1, 8))
           .groupBy("l_partkey").agg(F.count(F.lit(1)).alias("true_cnt")))
    return (tru.join(est, "l_partkey")
            .select(F.col("l_partkey").alias("item"), "true_cnt", "cm_est"))


def _cm_join_oracle() -> str:
    from ab_metadata_pusher_spark.operators.sketches import (
        CM_DEPTH, cm_cell_sql)
    a_sel = " UNION ALL ".join(
        f"SELECT {r} AS r, "
        f"{cm_cell_sql('CAST(l_orderkey AS VARCHAR)', r)} AS c "
        f"FROM lineitem" for r in range(CM_DEPTH))
    b_sel = " UNION ALL ".join(
        f"SELECT {r} AS r, "
        f"{cm_cell_sql('CAST(o_orderkey AS VARCHAR)', r)} AS c "
        f"FROM orders" for r in range(CM_DEPTH))
    return f"""
WITH ca AS MATERIALIZED (
  SELECT r, c, count(*) AS cnt FROM ({a_sel}) GROUP BY r, c),
cb AS MATERIALIZED (
  SELECT r, c, count(*) AS cnt FROM ({b_sel}) GROUP BY r, c),
ip AS (SELECT ca.r, sum(ca.cnt * cb.cnt) AS est
       FROM ca JOIN cb ON ca.r = cb.r AND ca.c = cb.c GROUP BY ca.r),
tru AS (SELECT count(*) AS true_size
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT CAST(min(est) AS BIGINT) AS est_join_size,
       CAST(max(true_size) AS BIGINT) AS true_join_size
FROM ip, tru
"""


@register("analytics_join_size_estimate", oracle=_cm_join_oracle(),
          covers=("G.analytics.join_size",))
def q_analytics_join_size_estimate(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Equi-join cardinality prediction WITHOUT running the join: the
    inner product of the two sides' Count-Min rows (min over depth)
    upper-bounds |A ⋈ B| — the sketch trick cost-based optimizers use
    to choose join order/strategy before touching the data.  Reported
    next to the true join size, which the estimate can never undercut
    (per-row inner products only add hash-collision cross terms).

    Each side folds to a 256-cell sketch (one narrow groupBy apiece);
    the "join" that produces the estimate is 256x256 cells, constant
    at any input scale — this is what makes sketch-based planning free
    compared to sampling.  Cells come from the same md5-slice family as
    agg_countmin_sketch, so the oracle rebuilds them exactly."""
    from ab_metadata_pusher_spark.operators.sketches import countmin_build
    li = spread_if_narrow(_t(spark, sf_dir, "lineitem").select("l_orderkey"))
    o = spread_if_narrow(_t(spark, sf_dir, "orders").select("o_orderkey"))
    ca = countmin_build(li, "l_orderkey")
    cb = countmin_build(o, "o_orderkey")
    ip = (ca.join(cb.withColumnRenamed("cnt", "cnt_b"), ["r", "c"])
          .groupBy("r")
          .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("est")))
    tru = (li.join(o, li.l_orderkey == o.o_orderkey)
           .agg(F.count(F.lit(1)).alias("true_size")))
    return (ip.agg(F.min("est").alias("est_join_size"))
            .crossJoin(F.broadcast(tru.select(
                F.max("true_size").alias("true_join_size")))))
