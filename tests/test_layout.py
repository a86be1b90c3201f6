"""Z-order layout: the interleaved key must bound BOTH dimensions inside
every z-range, where a linear (px-major) sort bounds only the leading one
— the property that makes z-ordering worth a rewrite at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from ab_metadata_pusher_spark.operators.layout import quantize, zorder_value


def _quantized(spark, sf_dir):
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_partkey", "l_suppkey"))
    ext = li.agg(F.min("l_partkey").alias("minp"),
                 F.max("l_partkey").alias("maxp"),
                 F.min("l_suppkey").alias("mins"),
                 F.max("l_suppkey").alias("maxs"))
    return li.crossJoin(F.broadcast(ext)).select(
        quantize(F.col("l_partkey"), F.col("minp"), F.col("maxp"), 8)
        .alias("px"),
        quantize(F.col("l_suppkey"), F.col("mins"), F.col("maxs"), 8)
        .alias("sx"))


def test_zorder_buckets_bound_both_dims(spark, sf_dir):
    q = _quantized(spark, sf_dir)
    z = q.select("px", "sx", zorder_value(F.col("px"), F.col("sx"), 8)
                 .alias("z"))
    spans = (z.groupBy(F.shiftright("z", 11).alias("bucket"))
             .agg((F.max("px") - F.min("px")).alias("pspan"),
                  (F.max("sx") - F.min("sx")).alias("sspan"))
             .collect())
    assert spans
    for r in spans:
        # bucket = top 5 z bits = px's top 2 + sx's top 3 — hard bounds
        assert r.pspan <= 63, r
        assert r.sspan <= 31, r


def test_linear_sort_leaves_trailing_dim_unbounded(spark, sf_dir):
    q = _quantized(spark, sf_dir)
    spans = (q.groupBy(F.shiftright("px", 3).alias("bucket"))
             .agg((F.max("sx") - F.min("sx")).alias("sspan"))
             .collect())
    # px-major buckets fix px just as tightly, but sx stats are useless
    assert max(r.sspan for r in spans) > 200


def test_zorder_value_is_exact_bit_interleave(spark):
    df = spark.createDataFrame([(0, 0), (255, 0), (0, 255), (255, 255),
                                (170, 85)], "x long, y long")
    out = {(r.x, r.y): r.z for r in df.select(
        "x", "y", zorder_value(F.col("x"), F.col("y"), 8).alias("z"))
        .collect()}

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in out.items():
        assert z == morton(x, y)


def test_skyline_handles_all_tie_shapes(spark, tmp_path):
    """Equal-price earlier-date dominates; equal-date cheaper dominates;
    exact duplicates survive together — the sweep must agree with the
    brute-force dominance definition on every tie shape."""
    import datetime as dt

    from ab_metadata_pusher_spark.plans.registry import queries

    rows = [
        # (orderkey, price, date)
        (1, 100.0, dt.date(2024, 1, 5)),   # skyline
        (2, 100.0, dt.date(2024, 1, 9)),   # equal price, later date: out
        (3, 90.0, dt.date(2024, 1, 9)),    # skyline (cheaper)
        (4, 95.0, dt.date(2024, 1, 9)),    # dominated by 3 (equal date)
        (5, 90.0, dt.date(2024, 1, 9)),    # exact duplicate of 3: kept
        (6, 80.0, dt.date(2024, 2, 1)),    # skyline (cheapest)
        (7, 85.0, dt.date(2024, 3, 1)),    # dominated by 6
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate date")
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = {r.o_orderkey for r in
           queries()["analytics_skyline_2d"](spark, str(tmp_path))
           .collect()}

    def dominated(a):
        return any(
            (b[1] < a[1] and b[2] <= a[2]) or (b[1] <= a[1] and b[2] < a[2])
            for b in rows)
    want = {a[0] for a in rows if not dominated(a)}
    assert got == want == {1, 3, 5, 6}


def test_skyline_matches_bruteforce_on_random_tie_dense_grids(spark, tmp_path):
    """Randomized dominance oracle for the TWO-LEVEL sweep (local
    per-partition skyline + global sweep, round 4): points drawn from a
    6x6 value grid so equal-price and equal-date ties are everywhere,
    across several partition layouts — the local pre-filter must change
    nothing about the result set."""
    import datetime as dt
    import random

    from ab_metadata_pusher_spark.plans.registry import queries

    rng = random.Random(42)
    prices = [80.0, 85.0, 90.0, 95.0, 100.0, 105.0]
    dates = [dt.date(2024, 1, d) for d in (3, 7, 11, 15, 19, 23)]
    for case, n_part in ((0, 1), (1, 3), (2, 8)):
        rows = [(k, rng.choice(prices), rng.choice(dates))
                for k in range(80)]
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_totalprice double, o_orderdate date")
        (df.repartition(n_part).write.mode("overwrite")
         .parquet(f"{tmp_path}/orders.parquet"))
        got = {r.o_orderkey for r in
               queries()["analytics_skyline_2d"](spark, str(tmp_path))
               .collect()}

        def dominated(a, rows=rows):
            return any((b[1] < a[1] and b[2] <= a[2])
                       or (b[1] <= a[1] and b[2] < a[2]) for b in rows)

        want = {a[0] for a in rows if not dominated(a)}
        assert got == want, (case, n_part, got ^ want)
