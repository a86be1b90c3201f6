"""Recall-at-scale for the data-sized + bucket-capped kNN self-join.

The recall GATES (quality_label_consistency_recall,
similarity_ann_recall) run on gate-bounded corpora where the r11 plane
sizing floors out and the bucket cap never activates — they pin the
fixture behavior, not the scale behavior.  This probe measures what
the gates cannot: recall@5 of the data-sized (and, above the floor,
bucket-capped) ``ann_lsh_knn_self`` against exact brute force on a
deterministic probe subset of the scaled replicas, plus the same for
the sized-but-UNCAPPED variant where it is still runnable, isolating
the cap's own cost.

Usage:
    python scripts/knn_recall_probe.py --dirs .scratch/scaled/x10 \
        --probes 200 [--uncapped]
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
    parquet_rowcount, release_materialized,
)
from ab_metadata_pusher_spark.operators.similarity import (  # noqa: E402
    ann_ivf_knn_self, ann_lsh_knn_self, ivf_cells_for, lsh_planes_for,
    topk_cosine_bruteforce,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.sources.fixtures import load_table  # noqa: E402

K = 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default=".scratch/scaled/x10")
    ap.add_argument("--probes", type=int, default=200)
    ap.add_argument("--uncapped", action="store_true",
                    help="also measure the sized-planes variant WITHOUT "
                         "the bucket cap (slow at x100)")
    ap.add_argument("--nprobes", default="",
                    help="comma list of EXTRA ivf nprobe values to sweep "
                         "(r11 VERDICT ask #3: the recall/cost curve), "
                         "e.g. --nprobes 16,32")
    ap.add_argument("--skip-lsh", action="store_true",
                    help="ivf-only sweep (skip the LSH baselines)")
    args = ap.parse_args()
    dirs = [str(REPO / d) if not d.startswith("/") else d
            for d in args.dirs.split(",")]

    spark = get_spark(app_name="knn-recall-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    for d in dirs:
        emb = load_table(spark, d, "embeddings")
        n = parquet_rowcount(f"{d}/embeddings.parquet")
        step = max(1, n // args.probes)
        probes = emb.filter(F.col("vec_id") % step == 0)
        exact = (topk_cosine_bruteforce(emb, probes, k=K)
                 .select("query_id", "neighbor_id"))
        exact_pairs = {(r["query_id"], r["neighbor_id"])
                       for r in exact.collect()}
        if not exact_pairs:  # empty table / stride yielded no probes
            print(f"{Path(d).name:5s} n={n:,}: no exact probe pairs — "
                  "skipping (empty embeddings or stride too wide)")
            continue

        def recall(nn_df, label: str) -> None:
            t0 = time.time()
            got = {(r["query_id"], r["neighbor_id"])
                   for r in nn_df.join(
                       probes.select(F.col("vec_id").alias("query_id")),
                       "query_id", "semi")
                   .select("query_id", "neighbor_id").collect()}
            release_materialized(spark)
            hits = len(got & exact_pairs)
            print(f"{Path(d).name:5s} {label:22s} n={n:>7,} "
                  f"planes={lsh_planes_for(n, floor=3)} "
                  f"recall@{K} {hits}/{len(exact_pairs)} = "
                  f"{hits / len(exact_pairs):.3f}  ({time.time() - t0:.1f}s)",
                  flush=True)

        if not args.skip_lsh:
            recall(ann_lsh_knn_self(emb, k=K, n_vectors=n),
                   "lsh sized+capped")
            if args.uncapped:
                recall(ann_lsh_knn_self(
                    emb, k=K, n_planes=lsh_planes_for(n, floor=3)),
                    "lsh sized, UNCAPPED")
        cells = ivf_cells_for(n)
        sweep = [8] + [int(x) for x in args.nprobes.split(",") if x]
        for np_ in sweep:
            recall(ann_ivf_knn_self(emb, k=K, n_vectors=n, nprobe=np_),
                   f"ivf cells={cells} probe={np_}")


if __name__ == "__main__":
    main()
