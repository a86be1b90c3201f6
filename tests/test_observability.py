"""Operational observability surfaces: per-action metrics without a second
pass over the data (the engine-side upgrade of the reference's statsd
success/fail counters, pipeline.py MetricsEmitter)."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from ab_metadata_pusher_spark.sources.fixtures import load_table


def test_observe_collects_metrics_in_one_pass(spark, sf_dir):
    """df.observe threads accumulator-backed aggregates through the SAME
    job that materializes the result — row counts, null counts, value
    bounds for data-quality gates come free with the write, no extra
    scan.  This is how the 100 TB pipeline records per-publish stats
    (rows staged, nulls dropped, max ts) without doubling I/O."""
    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("publish_stats")
    staged = (docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_texts"),
        F.max("n_chars").alias("max_chars"))
        .filter(F.col("n_chars") > 0))
    n_out = staged.count()
    got = obs.get
    assert got["n_rows"] >= n_out
    assert got["null_texts"] == 0
    assert got["max_chars"] > 0
