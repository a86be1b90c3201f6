"""Physical-plan shape regressions for plans repaired in round 4.

Each test pins the SHAPE that makes the query survive scale — not its
timing — so a refactor that silently reintroduces a single-partition
sort or a recomputed subplan fails fast.  Results themselves are
covered by the oracle-parity suite; these assert how Spark runs them.
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from ab_metadata_pusher_spark.plans.registry import queries  # noqa: E402


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _q(spark, sf_dir, name):
    return queries()[name](spark, sf_dir)


def test_weighted_sample_topk_is_take_ordered(spark, sf_dir):
    """Efraimidis-Spirakis top-k must plan as TakeOrderedAndProject
    (per-partition heap + merge), never a corpus-wide single-partition
    window sort, and needs no hash shuffle at all."""
    plan = _plan(_q(spark, sf_dir, "sample_weighted"))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_bm25_topk_is_take_ordered(spark, sf_dir):
    """The BM25 top-10 ranks only the limit survivors: the scored set
    (every doc containing a query term) is corpus-sized for common
    terms, so the global sort must be a TakeOrdered, not a window."""
    plan = _plan(_q(spark, sf_dir, "text_bm25"))
    assert "TakeOrderedAndProject" in plan


def test_skyline_runs_local_sweep_before_global(spark, sf_dir):
    """The 2-D skyline must do a per-partition (spark_partition_id)
    sweep before the unparallelizable global window, so the global
    sort sees partition skylines, not every distinct pair."""
    plan = _plan(_q(spark, sf_dir, "analytics_skyline_2d"))
    assert plan.count("Window") >= 2
    assert "SPARK_PARTITION_ID" in plan.upper()


def test_link_prediction_expansion_is_parallel_and_cached(spark, sf_dir):
    """The deg² wedge expansion must read a fixed-width round-robin
    repartition (AQE coalesces the tiny |V|-row adjacency shuffle to
    ONE partition otherwise, serializing the Generate into a single
    task), and the adjacency must come from a materialized snapshot so
    the edge set and degree tables don't recompute the per-order pair
    expansion.  Since round 5 the snapshot is an eager localCheckpoint
    (freed via ContextCleaner on GC) instead of a CacheManager entry
    that leaked across invocations: every consumer reads 'Scan
    ExistingRDD' and the plan contains NO parquet re-scan of lineitem."""
    for name in ("graph_link_prediction", "graph_link_prediction_capped"):
        plan = _plan(_q(spark, sf_dir, name))
        assert "RoundRobinPartitioning" in plan, name
        # every consumer (wedge expansion, anti-join edges, both degree
        # sides) reads the checkpointed adjacency RDD
        assert plan.count("Scan ExistingRDD") >= 3, name
        assert "lineitem" not in plan, (
            f"{name} recomputes the adjacency from the fact table")
