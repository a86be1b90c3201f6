"""A/B the two shuffle alignments of synchronous label propagation and
record the broadcast-label crossover |V| (r6 VERDICT ask #6).

Form A (shipped, `graph_label_propagation`): edges hash-partitioned by
the DESTINATION ``a`` once; each round broadcasts the |V|-row label
frame and runs exchange-free (the BroadcastHashJoin preserves the
streamed side's partitioning, which satisfies both round aggregations).
Cost per round: broadcast-build of |V| (label, lab) longs.

Form B (the flip the docstring prescribes when |V| outgrows the
broadcast): edges hash-partitioned by the JOIN key ``b``; labels shuffle
to the join alignment (SortMergeJoin/ShuffledHashJoin), and the round
pays the (a, lab) aggregation exchange instead.  Cost per round: one
|V|-row shuffle + one |E|-row aggregation exchange — no broadcast.

Method: synthetic power-of-ten graphs (avg degree 20, pseudo-random
destinations from a hash so the label frame stays |V|-cardinality),
3 rounds per form, fresh localCheckpoint discipline identical to the
shipped loop, min-of-R wall times.  Run on an otherwise idle host.

Usage: python scripts/lpa_alignment_probe.py [--reps 3]
       [--sizes 100000,1000000,4000000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.session import get_spark  # noqa: E402

DEGREE = 20
ROUNDS = 3


def build_edges(spark, n_v: int):
    """Symmetric-ish pseudo-random graph: |V| vertices, |V|*DEGREE edges;
    destinations from xxhash64 so every vertex keeps a distinct label
    (worst case for the broadcast: the label frame never shrinks)."""
    e = (spark.range(n_v * DEGREE)
         .select((F.col("id") % n_v).alias("a"),
                 F.pmod(F.xxhash64(F.col("id") * 2654435761),
                        F.lit(n_v)).alias("b"))
         .filter(F.col("a") != F.col("b")))
    return e


def run_form(spark, edges, width: int, form: str) -> float:
    part_key = "a" if form == "broadcast" else "b"
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, str(width))
    t0 = time.time()
    try:
        e = edges.repartition(width, part_key).persist()
        labels = e.select(F.col("a").alias("v"),
                          F.col("a").alias("lab")).distinct()
        for _ in range(ROUNDS):
            lab_b = labels.withColumnRenamed("v", "b")
            joined = (e.join(F.broadcast(lab_b), "b") if form == "broadcast"
                      else e.join(lab_b, "b"))
            labels = (joined
                      .groupBy(F.col("a").alias("v"), "lab")
                      .agg(F.count(F.lit(1)).alias("c"))
                      .groupBy("v")
                      .agg(F.max(F.struct(
                          F.col("c"),
                          (-F.col("lab")).alias("nl"))).alias("m"))
                      .select("v", (-F.col("m.nl")).alias("lab")))
            labels = labels.localCheckpoint(eager=True)
        n = labels.count()
        assert n > 0
        e.unpersist()
    finally:
        spark.conf.set(conf_key, prev)
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sizes", default="100000,1000000,4000000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_spark(app_name="lpa-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # scale the loop width with |V| the way the docstring prescribes
    for n_v in sizes:
        width = max(16, n_v // 250_000)
        edges = build_edges(spark, n_v)
        res = {}
        for form in ("broadcast", "shuffled"):
            ts = [run_form(spark, edges, width, form)
                  for _ in range(args.reps)]
            res[form] = min(ts)
            print(f"|V|={n_v:>9,} width={width:>3} {form:>9}: "
                  f"min={min(ts):6.2f}s runs={[round(t, 2) for t in ts]}",
                  flush=True)
        ratio = res["shuffled"] / res["broadcast"]
        verdict = "broadcast wins" if ratio > 1 else "FLIP (shuffled wins)"
        print(f"|V|={n_v:>9,} shuffled/broadcast = {ratio:.2f} -> {verdict}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
