"""Streaming tests: foreachBatch -> SQS publishing and stream/batch
equivalence (the oracle-parity suite covers windowed/session/dedup values;
these cover the sink path and the AvailableNow tick)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ab_metadata_pusher_spark.sinks.sqs import SqsPublisher
from ab_metadata_pusher_spark.sources.fixtures import load_table
from ab_metadata_pusher_spark.streaming import events as E

from tests.test_sinks import StubSqsClient


def test_foreach_batch_publish(spark, sf_dir):
    stub = StubSqsClient()
    publisher = SqsPublisher("https://queue/stream", lambda: stub,
                             max_bytes=32 * 1024)
    stream = E.events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type")
    q = E.foreach_batch_publish(stream, publisher, tag="tick1")
    q.awaitTermination()

    assert stub.batches, "no batches published"
    total = 0
    for batch in stub.batches:
        for e in batch["Entries"]:
            env = json.loads(e["MessageBody"])
            assert env["tag"].startswith("tick1-batch")
            assert len(e["MessageBody"].encode()) <= 32 * 1024
            total += len(env["nodes"])
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == n_events


def test_stream_equals_batch_tumbling(spark, sf_dir):
    """The AvailableNow stream over the fixture must agree with the same
    aggregation computed in batch — Spark vs Spark, full values."""
    streamed = E.run_to_memory(
        E.tumbling_counts(E.events_stream(spark, sf_dir)))
    batch = (load_table(spark, sf_dir, "events")
             .groupBy(F.window(F.col("ts").cast("timestamp"), "5 minutes")
                      .alias("win"), "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum("value"), 2).alias("total_value"))
             .select(F.col("win.start").alias("win_start"), "event_type",
                     "n_events", "total_value"))
    s = {tuple(map(str, r)) for r in streamed.collect()}
    b = {tuple(map(str, r)) for r in batch.collect()}
    assert s == b


def test_transform_with_state_matches_apply_in_pandas(spark, sf_dir):
    """The two arbitrary-state APIs must produce identical per-user stats.
    transformWithStateInPandas needs google.protobuf at runtime; skip
    where the container lacks it."""
    import pytest
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: TWS runner cannot start")
    from ab_metadata_pusher_spark.streaming import events as E
    a = E.run_to_memory(
        E.stateful_user_stats(E.events_stream(spark, sf_dir)),
        output_mode="update")
    b = E.run_to_memory(
        E.stateful_user_stats_tws(E.events_stream(spark, sf_dir)),
        output_mode="update")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
