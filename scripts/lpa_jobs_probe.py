"""LPA driver-cost probe (r14, VERDICT ask #4): where do the head's
~13 build jobs / ~8 s go, and does riding checkpoint materialization on
the next round's broadcast build cut them?

The r13 fused-round-1 LPA still pays, per broadcast-aligned round: one
eager localCheckpoint job + the next round's broadcast-build job (a
scan of the checkpointed blocks).  Under the broadcast alignment every
round's plan is EXCHANGE-FREE, so a LAZY localCheckpoint runs no job
at construction (nothing for AQE to materialize) and the plan is still
truncated to a LogicalRDD immediately — the checkpoint blocks are then
written by the first consumer, which is exactly the next round's
broadcast build (or the final eager checkpoint).  One job per round
instead of two; the FINAL round stays eager because the loop unpersists
the pinned edge frames before returning (a lazy tail would recompute
the co-occur pipeline at the caller's action).

Variants (paired in one session, alternated, outputs equality-checked):

* ``r13_eager``  — shipped: eager localCheckpoint every round.
* ``lazy_ride``  — lazy localCheckpoint rounds 1..n-1, eager final.
* ``no_mid``     — NO mid-loop checkpoint at all: rounds 1..n-1 plans
                   nest (round r's broadcast build executes the whole
                   chain once — bounded for the fixed 3 iters), eager
                   final.  The r9 OOM note was about per-round REBUILDS
                   without any cut; with one consumer per round the
                   chain executes once.  Measures whether the
                   LogicalRDD truncation itself is worth anything at
                   iters=3.

Also prints the per-phase split of the shipped head (count / rounds /
final) and per-variant job counts (setJobGroup + statusTracker).

Usage: python scripts/lpa_jobs_probe.py [--reps 5] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from ab_metadata_pusher_spark.observability import (  # noqa: E402
    capture_plan_segment,
)
from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    MATERIALIZE_CONF, parquet_rowcount,
)
from ab_metadata_pusher_spark.plans.analytics_queries import (  # noqa: E402
    _LPA_BROADCAST_MAX_BYTES, _LPA_ITERS, _LPA_LABEL_ROW_BYTES,
    _cooccur_edges, _loop_width,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402


def _lpa_variant(spark: SparkSession, e0: DataFrame, iters: int,
                 n_vertices_hint: int, mode: str,
                 phases: dict[str, float] | None = None) -> DataFrame:
    """_lpa_run with the checkpoint cadence as a switch (broadcast
    alignment only — the fixture path).  mode: eager | lazy | none
    for the MID-LOOP rounds; the final round is always eager."""
    edges = (e0.unionByName(e0.select(F.col("b").alias("a"),
                                      F.col("a").alias("b")))
             .select(F.col("a").cast("long").alias("a"),
                     F.col("b").cast("long").alias("b")))
    conf_key = "spark.sql.shuffle.partitions"
    prev_conf = spark.conf.get(conf_key)
    pinned: list[DataFrame] = []
    t0 = time.monotonic()
    try:
        edges = edges.persist()
        pinned.append(edges)
        n_rows = edges.count()
        width = _loop_width(n_rows, spark.sparkContext.defaultParallelism)
        spark.conf.set(conf_key, str(width))
        assert (n_vertices_hint * _LPA_LABEL_ROW_BYTES
                <= _LPA_BROADCAST_MAX_BYTES)
        edges = edges.repartition(width, "a").persist()
        pinned.append(edges)
        if phases is not None:
            phases["count+repart"] = time.monotonic() - t0

        def round_argmax(joined: DataFrame) -> DataFrame:
            return (joined
                    .groupBy(F.col("a").alias("v"), "lab")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .groupBy("v")
                    .agg(F.max(F.struct(
                        F.col("c"),
                        (-F.col("lab")).alias("nl"))).alias("m"))
                    .select("v", (-F.col("m.nl")).alias("lab")))

        labels = round_argmax(edges.select("a", F.col("b").alias("lab")))
        for r in range(iters - 1):
            t1 = time.monotonic()
            if mode == "eager":
                capture_plan_segment(labels)
                labels = labels.localCheckpoint(eager=True)
            elif mode == "lazy":
                capture_plan_segment(labels)
                labels = labels.localCheckpoint(eager=False)
            if phases is not None:
                phases[f"ckpt{r + 1}"] = time.monotonic() - t1
            t1 = time.monotonic()
            labels = round_argmax(
                edges.join(F.broadcast(labels.withColumnRenamed("v", "b")),
                           "b"))
            if phases is not None:
                phases[f"round{r + 2}_plan"] = time.monotonic() - t1
        t1 = time.monotonic()
        capture_plan_segment(labels)
        labels = labels.localCheckpoint(eager=True)
        if phases is not None:
            phases["final_ckpt"] = time.monotonic() - t1
    finally:
        spark.conf.set(conf_key, prev_conf)
        for frame in pinned:
            frame.unpersist()
    return labels.select(F.col("v").alias("node"),
                         F.col("lab").alias("community"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark(app_name="lpa-jobs-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.cleaner.periodicGC.interval": "5min"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(MATERIALIZE_CONF, "eager")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    n_v = parquet_rowcount(f"{args.sf_dir}/part.parquet")

    modes = ["eager", "lazy", "none"]
    results: dict[str, list[float]] = {m: [] for m in modes}
    jobs: dict[str, int] = {}
    hashes: dict[str, tuple] = {}

    def run(mode: str, rep: int) -> None:
        group = f"{mode}-{rep}"
        sc.setJobGroup(group, mode)
        try:
            phases: dict[str, float] = {}
            t0 = time.monotonic()
            e0 = _cooccur_edges(spark, args.sf_dir)
            df = _lpa_variant(spark, e0, _LPA_ITERS, n_v, mode,
                              phases if rep == 1 else None)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if rep == 0:
                row = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.crc32(F.concat_ws(
                        "|", F.col("node"), F.col("community")))).alias("h")
                ).collect()[0]
                hashes[mode] = (row["n"], row["h"])
                jobs[mode] = len(set(tracker.getJobIdsForGroup(group)))
            else:
                results[mode].append(dt)
                if rep == 1:
                    ph = "  ".join(f"{k}={v:.2f}" for k, v in phases.items())
                    print(f"  [{mode} rep1 phases] {ph}", flush=True)
        finally:
            sc.setJobGroup(None, None)

    for rep in range(args.reps + 1):
        for i in range(len(modes)):
            run(modes[(i + rep) % len(modes)], rep)

    ref = hashes["eager"]
    ok = all(h == ref for h in hashes.values())
    print(f"outputs equal across variants: {ok}  (rows, crc-sum) = {ref}")
    if not ok:
        for n, h in hashes.items():
            print(f"  {n}: {h}")
        return 1
    for m in modes:
        ts = sorted(results[m])
        print(f"{m:6s} jobs={jobs[m]:3d}  min={ts[0]:.2f}s  "
              f"median={ts[len(ts) // 2]:.2f}s  "
              f"all=[{', '.join(f'{t:.2f}' for t in ts)}]")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
