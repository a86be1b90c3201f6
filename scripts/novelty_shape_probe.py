"""Paired A/B: window-count vs aggregate-join shape for
text_ngram_novelty (r14) — the aggregate shape LOST and was NOT
shipped; this probe is the rejection record.

The shipped (r6) shape computes each shingle's corpus df as a WINDOW
count over the exploded distinct-shingle stream — one exchange on
``shingle`` plus the WindowExec sort, then the per-doc aggregation.
The candidate reshape kept ONE full-stream exchange as a hash
aggregate (``groupBy(shingle).agg(count, min(sid))`` — a df=1
shingle's ``min(sid)`` IS its owning document), derived per-doc
totals map-only from the document row (a second tokenize pass), and
joined two |docs|-row frames at output scale.

MEASURED (this probe): the aggregate shape is 2.2-2.6x SLOWER with
crc-equal outputs — sf0.1 min 2.45 s (window) vs 6.50 s (agg); x10
replica 3.54 s vs 7.66 s.  Near-unique shingle keys give the hash
aggregate no map-side reduction (every row inserts into a
~|vocabulary| hash table) while WindowExec rides the exchange's sort,
and the second tokenize pass is real CPU.  The window form stays.

Protocol: both shapes built side by side in one session (bench conf),
alternated per rep, min-of-N, outputs hash-equal, job counts.

Usage: python scripts/novelty_shape_probe.py [--reps 5] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window, functions as F  # noqa: E402

from ab_metadata_pusher_spark.operators import dedup as D  # noqa: E402
from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    MATERIALIZE_CONF,
)
from ab_metadata_pusher_spark.plans.llm_queries import (  # noqa: E402
    q_text_ngram_novelty,
)
from ab_metadata_pusher_spark.operators.text import (  # noqa: E402
    shingle_array, tokens,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.sources.fixtures import load_table  # noqa: E402


def _agg_shape(spark, sf_dir):
    """The REJECTED aggregate-join candidate (see module docstring)."""
    d = load_table(spark, sf_dir, "documents")
    sh = D.doc_shingles(d, 3)
    per_shingle = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df"), F.min("sid").alias("owner"))
    uniq = (per_shingle.filter(F.col("df") == 1)
            .groupBy(F.col("owner").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("n_unique")))
    totals = (d.select(
        F.col("doc_id"),
        F.size(F.array_distinct(shingle_array(tokens("text"), 3)))
         .cast("long").alias("n_shingles"))
        .filter(F.col("n_shingles") > 0))
    return (totals.join(uniq, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    F.coalesce(F.col("n_unique"), F.lit(0).cast("long"))
                     .alias("n_unique"),
                    F.round(F.coalesce(F.col("n_unique"),
                                       F.lit(0).cast("long"))
                            / F.col("n_shingles"), 4).alias("novelty")))


VARIANTS = {
    "window": q_text_ngram_novelty,  # shipped
    "agg": _agg_shape,               # rejected candidate
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark(app_name="novelty-shape-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.cleaner.periodicGC.interval": "5min"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(MATERIALIZE_CONF, "eager")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    results: dict[str, list[float]] = {v: [] for v in VARIANTS}
    jobs: dict[str, int] = {}
    hashes: dict[str, tuple] = {}

    def run(variant: str, rep: int) -> None:
        group = f"{variant}-{rep}"
        sc.setJobGroup(group, group)
        try:
            t0 = time.monotonic()
            df = VARIANTS[variant](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if rep == 0:
                row = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.crc32(F.concat_ws("|", *df.columns))).alias("h")
                ).collect()[0]
                hashes[variant] = (row["n"], row["h"])
                jobs[variant] = len(set(tracker.getJobIdsForGroup(group)))
            else:
                results[variant].append(dt)
        finally:
            sc.setJobGroup(None, None)

    order = list(VARIANTS)
    for rep in range(args.reps + 1):
        for i in range(len(order)):
            run(order[(i + rep) % len(order)], rep)

    ok = hashes["window"] == hashes["agg"]
    print(f"outputs equal: {ok}  (rows, crc-sum) = {hashes['window']}")
    for v in VARIANTS:
        ts = sorted(results[v])
        print(f"  {v:6s} jobs={jobs[v]:3d}  min={ts[0]:.2f}s  "
              f"median={ts[len(ts) // 2]:.2f}s  "
              f"all=[{', '.join(f'{t:.2f}' for t in ts)}]")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
