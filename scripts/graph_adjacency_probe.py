"""Paired A/B: eager vs ride-the-next-action adjacency materialization
for graph_triangles and graph_link_prediction_capped (r14, VERDICT ask
#7 — the k-core lazy-checkpoint pattern applied to the two audited-but-
untouched graph heads).

Both heads build a node->sorted-neighbors adjacency and, in the bench's
eager materialize mode, pay a dedicated localCheckpoint job for it at
construction.  Each head also has a guaranteed next action that can
write the checkpoint blocks instead: triangles' auto-orientation
probe (max out-list / edge count aggregate) runs immediately after,
and link prediction's exec action consumes the adjacency three ways.
``ride_checkpoint`` (operators/_shared.py) truncates the plan to the
same LogicalRDD shape lazily — one job instead of two per head.

Protocol: one session, bench conf (eager materialize), variants
alternated per rep, min-of-N, outputs hash-equal, job counts via
setJobGroup + statusTracker.

Usage: python scripts/graph_adjacency_probe.py [--reps 5] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.observability import (  # noqa: E402
    capture_plan_segment,
)
from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    MATERIALIZE_CONF, _materialize_mode, materialize_shared,
)
from ab_metadata_pusher_spark.plans import analytics_queries as AQ  # noqa: E402
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402


def ride_checkpoint(df, mode=None):
    """The measured variant: materialize_shared whose eager branch is a
    LAZY localCheckpoint — same LogicalRDD truncation, but the blocks
    are written by the head's next action (triangles' orientation
    probe / link prediction's exec) instead of a dedicated job.
    MEASURED FLAT (this probe, r14): one job saved per head, wall time
    within noise — the adjacency aggregation is the cost and it runs
    either way — so the product keeps plain materialize_shared."""
    mode = _materialize_mode(mode, df.sparkSession.conf.get)
    if mode != "eager":
        return materialize_shared(df, mode)
    capture_plan_segment(df)
    return df.localCheckpoint(eager=False)

HEADS = {
    "graph_triangles": AQ.q_graph_triangles,
    "graph_link_prediction_capped": AQ.q_graph_link_prediction_capped,
}
VARIANTS = {"eager": materialize_shared, "ride": ride_checkpoint}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark(app_name="graph-adjacency-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.cleaner.periodicGC.interval": "5min"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(MATERIALIZE_CONF, "eager")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    results: dict[tuple[str, str], list[float]] = {
        (h, v): [] for h in HEADS for v in VARIANTS}
    jobs: dict[tuple[str, str], int] = {}
    hashes: dict[tuple[str, str], tuple] = {}

    def run(head: str, variant: str, rep: int) -> None:
        group = f"{head}-{variant}-{rep}"
        sc.setJobGroup(group, group)
        AQ.materialize_shared = VARIANTS[variant]
        try:
            t0 = time.monotonic()
            df = HEADS[head](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if rep == 0:
                row = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.crc32(F.concat_ws("|", *df.columns))).alias("h")
                ).collect()[0]
                hashes[(head, variant)] = (row["n"], row["h"])
                jobs[(head, variant)] = len(
                    set(tracker.getJobIdsForGroup(group)))
            else:
                results[(head, variant)].append(dt)
        finally:
            AQ.materialize_shared = materialize_shared
            sc.setJobGroup(None, None)

    order = list(VARIANTS)
    for rep in range(args.reps + 1):
        for head in HEADS:
            for i in range(len(order)):
                run(head, order[(i + rep) % len(order)], rep)

    rc = 0
    for head in HEADS:
        ref = hashes[(head, "eager")]
        ok = all(hashes[(head, v)] == ref for v in VARIANTS)
        print(f"{head}: outputs equal {ok}  (rows, crc-sum) = {ref}")
        if not ok:
            rc = 1
        for v in VARIANTS:
            ts = sorted(results[(head, v)])
            print(f"  {v:5s} jobs={jobs[(head, v)]:3d}  min={ts[0]:.2f}s  "
                  f"median={ts[len(ts) // 2]:.2f}s  "
                  f"all=[{', '.join(f'{t:.2f}' for t in ts)}]")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
