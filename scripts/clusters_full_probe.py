"""Solo paired A/B for the dedup_clusters_full BENCH HEAD (r14, VERDICT
ask #1).

dedup_clusters_full regressed in every r13-era record (driver 32c
3.07 -> 5.76 s; builder closing 4.29 s; scaling-adjusted c8) while the
registry-head probe (dedup_clusters, 3.09 -> 2.39) only covered the
bounded form.  This probe settles whether the r13 connected_components
rewrite (fused identity round 1 + lazy per-checkpoint-round
localCheckpoint, commit d270e1c) is a real regression ON THE FULL
WRAPPER — the exact bench formulation: fingerprint keys over the full
documents table -> star edges -> cluster_labels(shuffle_partitions=8),
bench session conf (eager materialize mode), noop sink.

Variants bisect the two halves of d270e1c:

* ``r13_shipped``   — fused round 1 + LAZY checkpoints (current tree).
* ``fused_eager``   — fused round 1 + EAGER checkpoints (half A).
* ``join_lazy``     — join round 1 + LAZY checkpoints (half B).
* ``r12_old``       — join round 1 + EAGER checkpoints (pre-d270e1c).

All four run through the REAL cluster_labels/star_edges wrapper by
swapping the module-level connected_components the wrapper calls, so
every surrounding piece (keys persist, star edges, bench conf) is the
shipped code.  Alternated per rep inside ONE session (paired; min-of-N
is the statistic under one-sided host stalls), outputs hash-equal, job
counts per variant via setJobGroup + statusTracker.

Usage: python scripts/clusters_full_probe.py [--reps 5] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ab_metadata_pusher_spark.observability import (  # noqa: E402
    capture_plan_segment,
)
from ab_metadata_pusher_spark.operators import dedup as D  # noqa: E402
from ab_metadata_pusher_spark.operators import text as X  # noqa: E402
from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    MATERIALIZE_CONF, spread_if_narrow,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.sources.fixtures import load_table  # noqa: E402


def _cc_variant(fused_round1: bool, lazy_ckpt: bool):
    """connected_components with the two d270e1c halves as switches.

    fused_round1=True, lazy_ckpt=True reproduces the shipped r13 code;
    False/False reproduces the pre-d270e1c (r12) code — byte-for-byte
    the same loop body modulo the two switches."""

    def cc(vertices: DataFrame, edges: DataFrame, max_iter: int = 15,
           shuffle_partitions: int | None = None,
           checkpoint_every: int = 3) -> DataFrame:
        spark = vertices.sparkSession
        conf_key = "spark.sql.shuffle.partitions"
        prev_conf = spark.conf.get(conf_key)
        if shuffle_partitions is not None:
            spark.conf.set(conf_key, str(shuffle_partitions))
        try:
            both = (edges.select("src", "dst")
                    .unionByName(edges.select(F.col("dst").alias("src"),
                                              F.col("src").alias("dst")))
                    .distinct())
            both.persist()
            labels = vertices.select(F.col("id"), F.col("id").alias("label"))
            prev_sum = None
            for i in range(max_iter):
                if i == 0 and fused_round1:
                    prop = both.select(F.col("dst").alias("id"),
                                       F.col("src").alias("label"))
                else:
                    prop = (both.alias("e")
                            .join(labels.alias("l"),
                                  F.col("e.src") == F.col("l.id"))
                            .select(F.col("e.dst").alias("id"),
                                    F.col("l.label")))
                new = (prop.unionByName(labels)
                       .groupBy("id").agg(F.min("label").alias("label")))
                if (i + 1) % checkpoint_every == 0:
                    capture_plan_segment(new)
                    new = new.localCheckpoint(eager=not lazy_ckpt)
                else:
                    new.persist()
                cur_sum = new.agg(F.sum("label")).collect()[0][0]
                labels.unpersist()
                labels = new
                if prev_sum is not None and cur_sum == prev_sum:
                    break
                prev_sum = cur_sum
            both.unpersist()
            return labels
        finally:
            spark.conf.set(conf_key, prev_conf)

    return cc


VARIANTS = {
    "r13_shipped": _cc_variant(fused_round1=True, lazy_ckpt=True),
    "fused_eager": _cc_variant(fused_round1=True, lazy_ckpt=False),
    "join_lazy": _cc_variant(fused_round1=False, lazy_ckpt=True),
    "r12_old": _cc_variant(fused_round1=False, lazy_ckpt=False),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    # Bench session conf, verbatim (bench.py main()).
    spark = get_spark(app_name="clusters-full-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.cleaner.periodicGC.interval": "5min"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(MATERIALIZE_CONF, "eager")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def build_full():
        # bench.py _clusters_full, verbatim
        docs = spread_if_narrow(load_table(spark, args.sf_dir, "documents"))
        keys = X.fingerprint(docs).select(
            "doc_id", F.col("md5_full").alias("k1"),
            F.col("min_shingle_hash").alias("k2"))
        return D.cluster_labels(keys, ["k1", "k2"], shuffle_partitions=8)

    shipped_cc = D.connected_components
    results: dict[str, list[float]] = {n: [] for n in VARIANTS}
    jobs: dict[str, int] = {}
    hashes: dict[str, tuple] = {}

    def run(name: str, rep: int) -> None:
        D.connected_components = VARIANTS[name]
        group = f"{name}-{rep}"
        sc.setJobGroup(group, name)
        try:
            t0 = time.monotonic()
            df = build_full()
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if rep == 0:  # one equality pass per variant, untimed
                rows = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.crc32(F.concat_ws(
                        "|", F.col("id"), F.col("label")))).alias("h")
                ).collect()[0]
                hashes[name] = (rows["n"], rows["h"])
                jobs[name] = len(set(tracker.getJobIdsForGroup(group)))
            else:
                results[name].append(dt)
        finally:
            sc.setJobGroup(None, None)
            D.connected_components = shipped_cc

    order = list(VARIANTS)
    # warm once per variant (rep 0 doubles as the equality + job count
    # pass; its timing is discarded — JIT/footer warmup)
    for rep in range(args.reps + 1):
        for i, name in enumerate(order):
            # alternate starting variant per rep so session drift
            # cancels pairwise
            run(order[(i + rep) % len(order)], rep)

    ref = hashes["r12_old"]
    ok = all(h == ref for h in hashes.values())
    print(f"outputs equal across variants: {ok}  "
          f"(rows, crc-sum) = {ref}")
    if not ok:
        for n, h in hashes.items():
            print(f"  {n}: {h}")
        return 1
    for name in order:
        ts = sorted(results[name])
        print(f"{name:12s} jobs={jobs[name]:3d}  min={ts[0]:.2f}s  "
              f"median={ts[len(ts) // 2]:.2f}s  "
              f"all=[{', '.join(f'{t:.2f}' for t in ts)}]")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
