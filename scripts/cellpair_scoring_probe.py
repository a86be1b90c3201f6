"""Paired A/B for the r14 per-cell cogroup scoring tier (guide §8).

The per-PAIR tiers (fold and pandas alike) materialize BOTH embeddings
on every candidate row of the cell join, so the scoring stage carries
~2·dim doubles per CANDIDATE: 4 GB of Arrow traffic / boxed folds for
quality_label_full's 4M sf0.1 candidates, measured 200-450 s of task
CPU in scripts/qlf_solo_probe.py.  The ``cellpairs`` tier cogroups by
cell instead: each vector crosses the Python boundary once per
(cell, side), the within-cell score matrix is one vectorized numpy
pass whose per-pair accumulation order is the fold's exactly, and the
kNN form prunes each (query, cell) group to the candidates that can
still reach the global top-k before anything returns to the JVM.

Protocol: the two bench heads that cross the tier threshold
(quality_label_full, dedup_semantic_full) built EXACTLY as bench.py
builds them, tiers forced via SPARK_GRAFT_COSINE_SCORING, alternated
per rep in one session, min/median-of-N warm, outputs crc-checked
equal, Spark job counts per variant.

Usage: python scripts/cellpair_scoring_probe.py [--reps 5] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.operators.similarity import (  # noqa: E402
    COSINE_SCORING_ENV,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.sources.fixtures import load_table  # noqa: E402

TIERS = ("pandas", "cellpairs")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiers", default=",".join(TIERS),
                    help="comma list from fold|pandas|cellpairs")
    args = ap.parse_args()
    tiers = args.tiers.split(",")

    spark = get_spark(app_name="cellpair-scoring-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.cleaner.periodicGC.interval":
                                      "5min"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    import bench

    emb = load_table(spark, args.sf_dir, "embeddings")
    emb_path = f"{args.sf_dir}/embeddings.parquet"
    heads = {
        "quality_label_full":
            lambda: bench._quality_label_full(emb, emb_path),
        "dedup_semantic_full":
            lambda: bench._semantic_full(emb, emb_path),
    }

    def crc(df):
        cols = [F.col(c).cast("string") for c in df.columns]
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.crc32(F.concat_ws("|", *cols))).alias("h")
                   ).collect()[0]
        return (r["n"], r["h"])

    rc = 0
    for head, builder in heads.items():
        results: dict[str, list[float]] = {t: [] for t in tiers}
        jobs: dict[str, int] = {}
        hashes: dict[str, tuple] = {}
        for rep in range(args.reps + 1):
            for i in range(len(tiers)):
                tier = tiers[(i + rep) % len(tiers)]
                os.environ[COSINE_SCORING_ENV] = tier
                group = f"{head}-{tier}-{rep}"
                sc.setJobGroup(group, group)
                try:
                    t0 = time.monotonic()
                    df = builder()
                    df.write.format("noop").mode("overwrite").save()
                    dt = time.monotonic() - t0
                    if rep == 0:  # warmup doubles as equality+job pass
                        hashes[tier] = crc(builder())
                        jobs[tier] = len(set(
                            tracker.getJobIdsForGroup(group)))
                    else:
                        results[tier].append(dt)
                finally:
                    sc.setJobGroup(None, None)
        os.environ.pop(COSINE_SCORING_ENV, None)
        ok = len(set(hashes.values())) == 1
        print(f"{head}: outputs equal across {tiers}: {ok}  "
              f"(rows, crc-sum) = {hashes[tiers[0]]}")
        if not ok:
            for t, h in hashes.items():
                print(f"  {t}: {h}")
            rc = 1
        for t in tiers:
            ts = sorted(results[t])
            print(f"  {t:10s} jobs={jobs[t]:3d}  min={ts[0]:.2f}s  "
                  f"median={ts[len(ts) // 2]:.2f}s  "
                  f"all=[{', '.join(f'{x:.2f}' for x in ts)}]",
                  flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
