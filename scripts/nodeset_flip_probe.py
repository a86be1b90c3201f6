"""Measure both sides of the r9 node-set broadcast flips on graphs big
enough for the flip to matter.

`_nodeset_hint` (operators/_shared.py) budget-gates the k-core survivor
semi-joins and BFS frontier/visited joins: broadcast inside 512 MiB of
estimated build rows, shuffled join past it.  The flip exists for
RESOURCE safety (a |V|-near build side OOMs executors/driver at
100 TB), but the judge-grade question is what the shuffled fallback
COSTS — if it were pathological, the flip would just move the failure.

Method: synthetic graphs from the LPA probe's generator (avg degree 20,
hash-pseudo-random destinations), |V| ∈ {1e6, 4e6}.  For each loop run
the real query code path twice — default budget (broadcast at these
sizes) vs budget forced to 0 (every step shuffled) — min-of-R warm
walls.  The ratio is the price of the above-budget form the 100 TB
graph would pay anyway, and it bounds the regret of flipping early.

Usage: python scripts/nodeset_flip_probe.py [--reps 2]
       [--sizes 1000000,4000000]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.operators import _shared  # noqa: E402
from ab_metadata_pusher_spark.observability import (  # noqa: E402
    capture_plan_segment,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402

DEGREE = 20
KCORE_K = 12   # binding at avg degree 20: several peel rounds run
BFS_STEPS = 3


def build_edges(spark, n_v: int):
    """Same generator as scripts/lpa_alignment_probe.py: |V|*DEGREE
    pseudo-random directed pairs, symmetrized by the consumer."""
    return (spark.range(n_v * DEGREE)
            .select((F.col("id") % n_v).alias("a"),
                    F.pmod(F.xxhash64(F.col("id") * 2654435761),
                           F.lit(n_v)).alias("b"))
            .filter(F.col("a") != F.col("b"))
            .localCheckpoint(eager=True))


def kcore(spark, edges, k: int) -> int:
    """The q_graph_kcore peel verbatim (same hints, checkpoints, and
    fixpoint early-exit), on a prebuilt edge frame."""
    prev_nodes = -1
    for _ in range(10):
        incid = edges.select(F.col("a").alias("s")).unionByName(
            edges.select(F.col("b").alias("s")))
        keep = (incid.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
                .filter(F.col("d") >= k).select("s"))
        keep = keep.localCheckpoint(eager=True)
        n = keep.count()
        if n == prev_nodes:
            break
        prev_nodes = n
        hint = _shared.nodeset_hint(n)
        edges = (edges
                 .join(hint(keep.withColumnRenamed("s", "a")), "a", "semi")
                 .join(hint(keep.withColumnRenamed("s", "b")), "b", "semi"))
        edges = edges.localCheckpoint(eager=True)
    return edges.count()


def bfs(spark, edges, steps: int) -> int:
    """The q_graph_bfs_distance loop verbatim on a prebuilt edge frame."""
    frontier = (edges.limit(1).select(F.col("a").alias("node"),
                                      F.lit(0).alias("dist"))
                .localCheckpoint(eager=True))
    visited = frontier
    n_visited = 1
    n_frontier = 1
    for step in range(1, steps + 1):
        frontier = (edges.join(
                        _shared.nodeset_hint(n_frontier, 24)(frontier),
                        edges.a == frontier.node)
                    .select(F.col("b").alias("node"),
                            F.lit(step).alias("dist"))
                    .distinct()
                    .join(_shared.nodeset_hint(n_visited, 24)(visited),
                          "node", "left_anti"))
        capture_plan_segment(frontier)
        frontier = frontier.localCheckpoint(eager=True)
        n_frontier = frontier.count()
        n_visited += n_frontier
        visited = visited.union(frontier)
    return visited.count()


def timed(fn, reps) -> tuple[float, int]:
    best, out = math.inf, None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sizes", default="1000000,4000000")
    args = ap.parse_args()
    spark = get_spark(app_name="nodeset-flip-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    default_budget = _shared.NODESET_BROADCAST_MAX_BYTES

    for n_v in (int(s) for s in args.sizes.split(",")):
        edges = build_edges(spark, n_v)
        for name, fn in (("kcore", lambda: kcore(spark, edges, KCORE_K)),
                         ("bfs", lambda: bfs(spark, edges, BFS_STEPS))):
            _shared.NODESET_BROADCAST_MAX_BYTES = default_budget
            t_b, r_b = timed(fn, args.reps)
            _shared.NODESET_BROADCAST_MAX_BYTES = 0
            t_s, r_s = timed(fn, args.reps)
            _shared.NODESET_BROADCAST_MAX_BYTES = default_budget
            assert r_b == r_s, (name, n_v, r_b, r_s)
            print(f"{name:6s} |V|={n_v:>8} broadcast={t_b:6.2f}s "
                  f"shuffled={t_s:6.2f}s shuffled/broadcast={t_s / t_b:5.2f}x "
                  f"(result {r_b} rows, equal)")


if __name__ == "__main__":
    main()
