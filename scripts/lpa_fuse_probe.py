"""A/B the LPA round body and lineage-cut cadence (r9 VERDICT ask #2).

The graph-loop head (LPA + link-pred + triangles + k-core ~= 16s, 14%
of the sf0.1 bench) is floor-bound on per-round work, not shuffles: in
the broadcast alignment every round's executed plan is exchange-free,
so the levers left are (a) the number of aggregate passes per round,
(b) the lineage-cut mechanism, (c) the cut cadence.

Variants measured here, all on the REAL sf0.1 fixture graph (the bench
condition) with warm repetitions:

* ``two_groupby``      — shipped r9 shape: join -> groupBy(a, lab).count
                         -> groupBy(v).max(struct) -> eager
                         localCheckpoint per round.
* ``fused_mode``       — ONE aggregation: groupBy(v).agg(mode(lab, true)).
                         Spark's deterministic mode breaks frequency
                         ties to the SMALLEST value — exactly LPA's
                         (most frequent, ties -> lowest label) rule —
                         so the two hash-aggregate passes over the |E|
                         joined rows fuse into a single
                         ObjectHashAggregate pass.
* ``fused_ckpt2``      — fused body, lineage cut every 2 rounds instead
                         of every round (the broadcast build of round r
                         then re-executes at most ONE uncut round, not
                         r-1 of them).
* ``persist_count``    — two-groupby body, persist()+count() instead of
                         localCheckpoint as the cut (keeps lineage but
                         materializes; measures whether checkpoint's
                         partition copy is the cost).

Usage: python scripts/lpa_fuse_probe.py [--sf-dir DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from ab_metadata_pusher_spark.plans.analytics_queries import (  # noqa: E402
    _LPA_ITERS, _LPA_SHUFFLE_W, _cooccur_edges,
)


def _loop(spark: SparkSession, e0: DataFrame, iters: int, body: str,
          ckpt_every: int = 1, cut: str = "localCheckpoint") -> list:
    edges = (e0.unionByName(e0.select(F.col("b").alias("a"),
                                      F.col("a").alias("b")))
             .select(F.col("a").cast("long").alias("a"),
                     F.col("b").cast("long").alias("b")))
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, str(_LPA_SHUFFLE_W))
    pinned = []
    try:
        edges = edges.persist()
        pinned.append(edges)
        labels = (edges.select(F.col("a").alias("v"),
                               F.col("a").alias("lab"))
                  .distinct().localCheckpoint(eager=True))
        edges = edges.repartition(_LPA_SHUFFLE_W, "a").persist()
        pinned.append(edges)
        for it in range(iters):
            joined = edges.join(
                F.broadcast(labels.withColumnRenamed("v", "b")), "b")
            if body == "fused":
                labels = (joined.groupBy(F.col("a").alias("v"))
                          .agg(F.expr("mode(lab, true)").alias("lab")))
            else:
                labels = (joined
                          .groupBy(F.col("a").alias("v"), "lab")
                          .agg(F.count(F.lit(1)).alias("c"))
                          .groupBy("v")
                          .agg(F.max(F.struct(
                              F.col("c"),
                              (-F.col("lab")).alias("nl"))).alias("m"))
                          .select("v", (-F.col("m.nl")).alias("lab")))
            if (it + 1) % ckpt_every == 0 or it == iters - 1:
                if cut == "persist":
                    labels = labels.persist()
                    labels.count()
                    pinned.append(labels)
                else:
                    labels = labels.localCheckpoint(eager=True)
        out = sorted((r["v"], r["lab"]) for r in labels.collect())
    finally:
        spark.conf.set(conf_key, prev)
        for fr in pinned:
            fr.unpersist()
    return out


VARIANTS = {
    "two_groupby": dict(body="two", ckpt_every=1, cut="localCheckpoint"),
    "fused_mode": dict(body="fused", ckpt_every=1, cut="localCheckpoint"),
    "fused_ckpt2": dict(body="fused", ckpt_every=2, cut="localCheckpoint"),
    "persist_count": dict(body="two", ckpt_every=1, cut="persist"),
    "fused_persist": dict(body="fused", ckpt_every=1, cut="persist"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("lpa_fuse_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    e0 = _cooccur_edges(spark, args.sf_dir)
    baseline = None
    results = {}
    for name, kw in VARIANTS.items():
        times = []
        for rep in range(args.reps):
            t0 = time.monotonic()
            out = _loop(spark, e0, _LPA_ITERS, **kw)
            times.append(time.monotonic() - t0)
            if baseline is None:
                baseline = out
            elif out != baseline:
                print(f"MISMATCH: {name} rep {rep} diverges from "
                      f"two_groupby output")
                return 1
        times.sort()
        results[name] = times
        print(f"{name:14s} min={times[0]:.2f}s "
              f"median={times[len(times) // 2]:.2f}s all="
              + ",".join(f"{t:.2f}" for t in times))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
