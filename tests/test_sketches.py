"""Sketch correctness bounds — the checks the hash-equality driver can't
express: HLL union estimates must track exact distinct counts."""

from pyspark.sql import functions as F

from ab_metadata_pusher_spark.plans.registry import queries
from ab_metadata_pusher_spark.sources.fixtures import load_table


def test_hll_union_estimate_within_2pct(spark, sf_dir):
    est = {r["o_orderpriority"]: r["approx_customers"]
           for r in queries()["agg_hll_sketch_union"](spark, sf_dir)
           .collect()}
    exact = {r["o_orderpriority"]: r["n"]
             for r in load_table(spark, sf_dir, "orders")
             .groupBy("o_orderpriority")
             .agg(F.count_distinct("o_custkey").alias("n")).collect()}
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.02, (k, est[k], n)


def test_hll_sketch_column_is_mergeable_binary(spark, sf_dir):
    """The intermediate sketch column is a binary payload an engine can
    persist and re-union later (the incremental-rollup contract)."""
    o = load_table(spark, sf_dir, "orders")
    cells = (o.groupBy("o_orderstatus")
             .agg(F.hll_sketch_agg("o_custkey").alias("sk")))
    assert dict(cells.dtypes)["sk"] == "binary"
    total = cells.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")).first()["e"]
    exact = o.agg(F.count_distinct("o_custkey").alias("n")).first()["n"]
    assert abs(total - exact) / exact < 0.02


def test_percentiles_guaranteed_are_exact(spark, sf_dir):
    """agg_percentiles_guaranteed (r10, replacing the rows-only
    agg_approx_percentiles): the GK sketch only PROPOSES a
    rank-guaranteed value bracket; the exact-refine pass must land the
    EXACT discrete percentile — the value at rank max(1, ceil(p*n)) —
    independent of partition layout."""
    import math

    from pyspark.sql import functions as F

    got = {r["o_orderpriority"]: (r["p50"], r["p95"], r["p99"])
           for r in queries()["agg_percentiles_guaranteed"](spark, sf_dir)
           .collect()}
    o = load_table(spark, sf_dir, "orders")
    assert len(got) == 5
    for prio, est in got.items():
        vals = sorted(r["o_totalprice"] for r in
                      o.filter(F.col("o_orderpriority") == prio)
                      .select("o_totalprice").collect())
        n = len(vals)
        for q, e in zip((0.5, 0.95, 0.99), est):
            rank = max(1, math.ceil(q * n))
            assert e == vals[rank - 1], (prio, q, e, vals[rank - 1])


def test_misra_gries_heavy_hitters_bounds(spark):
    """Both MG guarantees on a skewed corpus: (a) every item with true
    frequency above n/(k+1) is reported; (b) every reported estimate is
    an undercount by at most n/(k+1)."""
    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.operators.sketches import heavy_hitters_mg

    k = 32
    hot = spark.range(5000).select(F.lit("hot").alias("v"))
    warm = spark.range(2000).select(F.lit("warm").alias("v"))
    tail = spark.range(3000).select(
        F.concat(F.lit("t"), (F.col("id") % 500).cast("string")).alias("v"))
    data = hot.unionByName(warm).unionByName(tail).repartition(8)

    n = data.count()
    bound = n / (k + 1)
    true = {r.v: r.c for r in
            data.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()}
    est = {r.item: r.est_count for r in
           heavy_hitters_mg(data, "v", k=k).collect()}

    for item, c in true.items():
        if c > bound:
            assert item in est, f"{item} (true {c} > bound {bound}) missing"
    for item, e in est.items():
        assert e <= true[item], f"{item} overcounted: {e} > {true[item]}"
        assert e >= true[item] - bound, \
            f"{item} undercounted beyond bound: {e} < {true[item]} - {bound}"


def test_mg_summary_incremental_fold_keeps_bounds(spark, tmp_path):
    """Incremental sketch maintenance: fold three batches one at a time
    into a parquet-persisted summary (the streaming shape — constant
    per-batch cost); the folded sketch must still satisfy both MG bounds
    against the exact counts of the full corpus."""
    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.operators.sketches import (
        merge_mg_summaries, mg_summary,
    )

    k = 32
    hot = spark.range(4000).select(F.lit("hot").alias("v"),
                                   (F.col("id") % 3).alias("b"))
    tail = spark.range(6000).select(
        F.concat(F.lit("t"), (F.col("id") % 800).cast("string")).alias("v"),
        (F.col("id") % 3).alias("b"))
    data = hot.unionByName(tail)

    state = str(tmp_path / "sketch")
    for i in range(3):
        batch = data.filter(F.col("b") == i).select("v")
        summary = mg_summary(batch.repartition(4), "v", k=k)
        if i == 0:
            merged = merge_mg_summaries(k, summary)
        else:
            merged = merge_mg_summaries(
                k, spark.read.parquet(state), summary)
        merged.write.mode("overwrite").parquet(state + "_next")
        # atomic-swap stand-in: re-point state at the new version
        import shutil
        shutil.rmtree(state, ignore_errors=True)
        shutil.move(state + "_next", state)

    n = data.count()
    bound = n / (k + 1) * 1.0
    true = {r.v: r.c for r in
            data.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()}
    est = {r.item: r.weight for r in spark.read.parquet(state).collect()}

    assert "hot" in est, "guaranteed heavy hitter missing after folds"
    for item, e in est.items():
        assert e <= true[item]
        assert e >= true[item] - bound


def test_vectorized_mg_fold_bounds_property():
    """Pure-pandas property check of the vectorized Misra-Gries fold
    (no Spark): for random streams and batch splits, every surviving
    counter obeys true - n/(k+1) <= estimate <= true, and every item
    with true frequency > n/(k+1) survives."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ab_metadata_pusher_spark.operators.sketches import _mg_partition

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, 12), min_size=1, max_size=300),
           st.integers(1, 8), st.integers(1, 50))
    def prop(stream, k, batch_size):
        items = [str(x) for x in stream]
        batches = [pd.DataFrame({"item": items[i:i + batch_size]})
                   for i in range(0, len(items), batch_size)]
        (out,) = list(_mg_partition(k)(iter(batches)))
        est = dict(zip(out["item"], out["weight"]))
        n = len(items)
        true = pd.Series(items).value_counts().to_dict()
        for item, e in est.items():
            assert e <= true[item]
            assert true[item] - e <= n / (k + 1)
        assert len(est) <= k
        for item, t in true.items():
            if t > n / (k + 1):
                assert item in est, (item, t, n, k)

    prop()


def test_countmin_never_undercounts_and_merges(spark, sf_dir):
    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.operators.sketches import (
        countmin_build, countmin_estimate)

    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_partkey"))
    cells = countmin_build(li, "l_partkey")
    probes = li.select("l_partkey").distinct().limit(20)
    est = countmin_estimate(cells, probes, "l_partkey")
    true = (li.join(probes, "l_partkey", "semi")
            .groupBy("l_partkey").agg(F.count(F.lit(1)).alias("t")))
    joined = {r.l_partkey: (r.t, r.cm_est)
              for r in true.join(est, "l_partkey").collect()}
    assert joined
    for t, e in joined.values():
        assert e >= t  # CM estimates never undercount

    # absent keys: a probe the stream never saw must still return a row,
    # and its estimate must be reachable down to exactly 0 (a sparse
    # sketch omits zero cells; the estimator must treat absence as 0,
    # not drop the row — the r3 ADVICE inner-join bug)
    ghost = spark.createDataFrame(
        [(-999_999_999,)], "l_partkey long")
    ghost_est = countmin_estimate(cells, ghost, "l_partkey").collect()
    assert len(ghost_est) == 1
    assert ghost_est[0].cm_est >= 0  # present iff some cell collides; row never vanishes
    # with a tiny sketch stream, all cells of the ghost key are absent -> 0
    tiny_cells = countmin_build(li.limit(1), "l_partkey")
    tiny_est = countmin_estimate(tiny_cells, ghost, "l_partkey").collect()
    assert len(tiny_est) == 1 and tiny_est[0].cm_est == 0

    # mergeable: cells(left half) + cells(right half) == cells(whole)
    half_a = countmin_build(li.filter(F.col("l_partkey") % 2 == 0),
                            "l_partkey")
    half_b = countmin_build(li.filter(F.col("l_partkey") % 2 == 1),
                            "l_partkey")
    merged = (half_a.unionByName(half_b)
              .groupBy("r", "c").agg(F.sum("cnt").alias("cnt")))
    diff = (merged.join(cells.withColumnRenamed("cnt", "cnt0"),
                        ["r", "c"], "full")
            .filter(F.coalesce("cnt", F.lit(0))
                    != F.coalesce("cnt0", F.lit(0))))
    assert diff.count() == 0
