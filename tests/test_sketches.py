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
