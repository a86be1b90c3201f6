"""Probe dedup_containment_full's third-decade superlinearity (r10).

Honest multi-decade numbers (scripts/scale_multi_decade.py, x1/x10/x100
generator-identical replicas): 2.38 / 5.25 / 113.7 s — e=+1.34 on the
x10->x100 decade.  The candidate self-join's OUTPUT is linear by the
max_df gate, but the join shuffles ~300M exploded shingle rows through
the session's 32 partitions: ~10M rows per sort task, which spills.

AQE is on but `initialPartitionNum` is unset, so AQE only ever
coalesces DOWN from 32 — it cannot widen a starved shuffle.  Candidate
fix: raise `spark.sql.adaptive.coalescePartitions.initialPartitionNum`
so every shuffle STARTS wide and AQE coalesces each one to its
advisory size (small fixture shuffles collapse to a few partitions;
the 300M-row shingle shuffle keeps the width it needs).

Each variant runs in a FRESH SparkSession (the conf is static).

Usage:
    python scripts/containment_width_probe.py \
        --dir .scratch/scaled/x100 --inits default,256,1024 --reps 2
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ab_metadata_pusher_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".scratch/scaled/x100")
    ap.add_argument("--inits", default="default,256,1024")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--query", default="dedup_containment_full")
    args = ap.parse_args()
    d = args.dir if args.dir.startswith("/") else str(REPO / args.dir)

    import bench

    sigs = {}
    for init in args.inits.split(","):
        conf = {"spark.ui.enabled": "false",
                "spark.ui.showConsoleProgress": "false"}
        if init != "default":
            conf["spark.sql.adaptive.coalescePartitions"
                 ".initialPartitionNum"] = init
        spark = get_spark(app_name=f"containment-width-{init}",
                          extra_conf=conf)
        spark.sparkContext.setLogLevel("ERROR")
        builder = bench._unbounded_llm(spark, d)[args.query]
        builder().write.format("noop").mode("overwrite").save()  # warm
        best, sig = float("inf"), None
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.time()
            df = builder()
            row = df.selectExpr(
                "count(*) AS n",
                "sum(hash(*)) AS h").first()
            best = min(best, time.time() - t0)
            sig = (row["n"], row["h"])
        sigs[init] = sig
        print(f"init={init:8s} {best:8.2f}s  rows={sig[0]} hash={sig[1]}",
              flush=True)
        spark.stop()
    assert len(set(sigs.values())) == 1, f"variants disagree: {sigs}"


if __name__ == "__main__":
    main()
