"""Paired A/B: can LPA's edge dedup ride the loop's alignment exchange?

The shipped graph_label_propagation build pays TWO pair-stream
exchanges before the rounds start: ``_cooccur_edges``'s ``distinct()``
(HashPartitioning(a, b)) and ``_lpa_run``'s alignment
``repartition(width, "a")``.  HashPartitioning(a) satisfies the
clustering a (a, b) dedup aggregation needs (a is a subset of the
group keys), and symmetrize-then-dedup is set-equal to
dedup-then-symmetrize, so the candidate shape symmetrizes the RAW
pair stream, repartitions once by ``a``, and lets ``distinct()`` ride
that exchange — one pair-stream exchange instead of two.  The loop
width is then sized from the pre-dedup symmetrized count (an upper
bound — same _loop_width input class, a heuristic not a contract).

Protocol: both shapes built side by side in one session (bench conf),
alternated per rep, min/median-of-N, outputs crc-checked equal, job
counts.  The shipped shape calls the PRODUCT q_graph_label_propagation
builder; the candidate is a faithful inline copy of _lpa_run with only
the edge-prep restructure.

Usage: python scripts/lpa_dedup_ride_probe.py [--reps 5] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    parquet_rowcount,
)
from ab_metadata_pusher_spark.plans.analytics_queries import (  # noqa: E402
    _LPA_ITERS, _lpa_run, _loop_width, _t,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402


def _raw_pairs(spark, sf_dir):
    """_cooccur_edges WITHOUT the trailing distinct()."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    per = (li.groupBy("l_orderkey")
           .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    pairs = F.flatten(F.transform("ps", lambda x, i: F.transform(
        F.slice("ps", i + F.lit(2), F.size("ps")),
        lambda y: F.struct(x.alias("a"), y.alias("b")))))
    return (per.select(F.explode(pairs).alias("p"))
            .select("p.a", "p.b"))


def _lpa_ride(spark, raw, iters, n_vertices_hint):
    """_lpa_run (broadcast alignment, the fixture path) with the dedup
    riding the alignment exchange.  Faithful copy of the product loop
    otherwise — outputs are crc-checked against the product builder."""
    edges = (raw.unionByName(raw.select(F.col("b").alias("a"),
                                        F.col("a").alias("b")))
             .select(F.col("a").cast("long").alias("a"),
                     F.col("b").cast("long").alias("b")))
    conf_key = "spark.sql.shuffle.partitions"
    prev_conf = spark.conf.get(conf_key)
    pinned = []
    try:
        edges = edges.persist()
        pinned.append(edges)
        n_rows = edges.count()  # pre-dedup upper bound
        width = _loop_width(n_rows, spark.sparkContext.defaultParallelism)
        spark.conf.set(conf_key, str(width))
        # ONE pair-stream exchange: dedup rides HashPartitioning(a)
        edges = edges.repartition(width, "a").distinct().persist()
        pinned.append(edges)

        def round_argmax(joined):
            return (joined
                    .groupBy(F.col("a").alias("v"), "lab")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .groupBy("v")
                    .agg(F.max(F.struct(
                        F.col("c"), (-F.col("lab")).alias("nl"))).alias("m"))
                    .select("v", (-F.col("m.nl")).alias("lab")))

        labels = round_argmax(edges.select("a", F.col("b").alias("lab")))
        labels = labels.localCheckpoint(eager=True)
        for _ in range(iters - 1):
            labels = round_argmax(
                edges.join(F.broadcast(labels.withColumnRenamed("v", "b")),
                           "b"))
            labels = labels.localCheckpoint(eager=True)
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

    spark = get_spark(app_name="lpa-dedup-ride-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.cleaner.periodicGC.interval":
                                      "5min"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    hint = parquet_rowcount(f"{args.sf_dir}/part.parquet")

    from ab_metadata_pusher_spark.plans.analytics_queries import (
        _cooccur_edges,
    )

    variants = {
        "shipped": lambda: _lpa_run(
            spark, _cooccur_edges(spark, args.sf_dir), _LPA_ITERS,
            n_vertices_hint=hint),
        "ride": lambda: _lpa_ride(
            spark, _raw_pairs(spark, args.sf_dir), _LPA_ITERS, hint),
    }
    results = {n: [] for n in variants}
    jobs, hashes = {}, {}
    order = list(variants)
    for rep in range(args.reps + 1):
        for i in range(len(order)):
            name = order[(i + rep) % len(order)]
            group = f"{name}-{rep}"
            sc.setJobGroup(group, name)
            try:
                t0 = time.monotonic()
                df = variants[name]()
                df.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                if rep == 0:
                    r = df.agg(F.count(F.lit(1)).alias("n"),
                               F.sum(F.crc32(F.concat_ws(
                                   "|", "node", "community"))).alias("h")
                               ).collect()[0]
                    hashes[name] = (r["n"], r["h"])
                    jobs[name] = len(set(tracker.getJobIdsForGroup(group)))
                else:
                    results[name].append(dt)
            finally:
                sc.setJobGroup(None, None)
    ok = len(set(hashes.values())) == 1
    print(f"outputs equal: {ok}  (rows, crc-sum) = {hashes['shipped']}")
    if not ok:
        for n, h in hashes.items():
            print(f"  {n}: {h}")
        spark.stop()
        return 1
    for name in order:
        ts = sorted(results[name])
        print(f"{name:8s} jobs={jobs[name]:3d}  min={ts[0]:.2f}s  "
              f"median={ts[len(ts) // 2]:.2f}s  "
              f"all=[{', '.join(f'{t:.2f}' for t in ts)}]")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
