"""Probe the graph_triangles third-decade superlinearity (r10).

scripts/scale_multi_decade.py measured graph_triangles at
x1/x10/x100 of sf0.1 (generator-identical block-diagonal replicas):
1.05 s / 3.60 s / 167.8 s — e=+1.67 on the x10->x100 decade.  The
workload is structurally linear (each replica is an isolated copy of
the same graph), so the blow-up is ENGINE-level.  Prime suspect: the
two intersect joins ship the full sorted-neighbor arrays as SMJ
payload — at x100 that is ~55 M edge rows x two ~230 B array columns
through TWO sort-merge joins, and sorting array-payload rows spills.

Variants (all output-equality-checked against each other per dir):

* smj    — the shipped shape (whatever Catalyst picks; SMJ at x100)
* shj    — SHUFFLE_HASH hint on BOTH adjacency (build) sides: hash
           join never sorts the probe side, so the array payload
           streams instead of spilling through a sort
* bcast  — broadcast hint on the adjacency sides (only plausible
           while |V| x avg-degree stays under a few hundred MB; probed
           for the crossover record, expected to lose/fail at x100)

Usage:
    python scripts/triangle_scale_probe.py \
        --dirs .scratch/scaled/x10,.scratch/scaled/x100 --reps 2
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.plans.analytics_queries import (  # noqa: E402
    _cooccur_edges,
)
from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    materialize_shared,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402


def tri_count(spark, sf_dir: str, hint: str | None):
    pairs = _cooccur_edges(spark, sf_dir)
    adj = materialize_shared(
        pairs.groupBy("a").agg(F.sort_array(F.collect_set("b"))
                               .alias("nbrs")))
    e = adj.select("a", F.explode("nbrs").alias("b"))
    na = adj.select("a", F.col("nbrs").alias("na"))
    nb = adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nb"))
    if hint:
        na, nb = na.hint(hint), nb.hint(hint)
    return (e.join(na, "a").join(nb, "b")
            .agg(F.sum(F.size(F.array_intersect("na", "nb")))
                 .alias("n_triangles")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default=".scratch/scaled/x10,.scratch/scaled/x100")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-bcast-at-x100", action="store_true")
    args = ap.parse_args()
    dirs = [str(REPO / d) if not d.startswith("/") else d
            for d in args.dirs.split(",")]

    spark = get_spark(app_name="triangle-scale-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    variants = [("smj", None), ("shj", "shuffle_hash"),
                ("bcast", "broadcast")]
    for d in dirs:
        counts = {}
        for name, hint in variants:
            if (name == "bcast" and args.skip_bcast_at_x100
                    and d.endswith("x100")):
                continue
            spark.catalog.clearCache()
            tri_count(spark, d, hint).write.format("noop") \
                .mode("overwrite").save()  # warm
            best, val = float("inf"), None
            for _ in range(args.reps):
                spark.catalog.clearCache()
                t0 = time.time()
                row = tri_count(spark, d, hint).first()
                best = min(best, time.time() - t0)
                val = row["n_triangles"]
            counts[name] = val
            print(f"{Path(d).name:6s} {name:6s} {best:8.2f}s  "
                  f"n_triangles={val}", flush=True)
        assert len(set(counts.values())) == 1, f"variants disagree: {counts}"


if __name__ == "__main__":
    main()
