"""Recall of the fixed-nprobe IVF kNN-self on a CLUSTERED corpus.

The r11/r12 recall rows (scripts/knn_recall_probe.py, SCALE.md) measure
the synthetic near-isotropic fixture, where recall at fixed candidates
decays with corpus size — an information limit the r11 verdict accepted
but flagged as a watch item, on the defense that REAL embedding corpora
cluster and learned cells track those clusters.  This probe turns that
defense from an argument into a measurement: deterministic clustered
corpora (Gaussian mixture, ~500 points/cluster, intra-cluster cosine
~0.8 — the neighborhood geometry of a real sentence-embedding corpus),
same operator, same data-sized cells, same fixed nprobe=8, measured
across the same two decades.

Usage:
    python scripts/clustered_recall_probe.py [--sizes 20000,200000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.operators.similarity import (  # noqa: E402
    ann_ivf_knn_self, ivf_cells_for, topk_cosine_bruteforce,
)
from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    release_materialized,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402

K = 5
DIM = 64
CLUSTER_SIZE = 500
NOISE = 0.5  # per-dim sigma -> E[intra-cluster cosine] ~ 1/(1+NOISE^2)


def make_corpus(n: int, path: Path) -> None:
    rng = np.random.default_rng(20260816)
    n_clusters = max(2, n // CLUSTER_SIZE)
    centers = rng.standard_normal((n_clusters, DIM))
    assign = rng.integers(0, n_clusters, size=n)
    X = centers[assign] + NOISE * rng.standard_normal((n, DIM))
    # measured geometry, for the record
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    probe = Xn[:: max(1, n // 200)][:200]
    cs = probe @ Xn.T
    np.fill_diagonal(cs[:, : len(probe)], -1)  # mask trivial self hits
    top5 = np.sort(cs, axis=1)[:, -K:]
    print(f"  n={n:,} clusters={n_clusters} true-5NN cosine "
          f"p50={np.median(top5):.2f}")
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(X.astype(np.float32).tolist(),
                              type=pa.list_(pa.float32())),
    })
    pq.write_table(tbl, path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="20000,200000")
    ap.add_argument("--probes", type=int, default=200)
    args = ap.parse_args()

    spark = get_spark(app_name="clustered-recall-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    scratch = REPO / ".scratch" / "clustered"
    scratch.mkdir(parents=True, exist_ok=True)

    for n in (int(s) for s in args.sizes.split(",")):
        path = scratch / f"emb_{n}.parquet"
        if not path.exists():
            make_corpus(n, path)
        emb = spark.read.parquet(str(path))
        step = max(1, n // args.probes)
        probes = emb.filter(F.col("vec_id") % step == 0)
        exact = {(r["query_id"], r["neighbor_id"])
                 for r in topk_cosine_bruteforce(emb, probes, k=K)
                 .select("query_id", "neighbor_id").collect()}
        if not exact:
            print(f"  n={n:,}: no exact probe pairs — skipping")
            continue
        t0 = time.time()
        got = {(r["query_id"], r["neighbor_id"])
               for r in ann_ivf_knn_self(emb, k=K, n_vectors=n)
               .join(probes.select(F.col("vec_id").alias("query_id")),
                     "query_id", "semi")
               .select("query_id", "neighbor_id").collect()}
        release_materialized(spark)
        hits = len(got & exact)
        print(f"clustered n={n:>8,} cells={ivf_cells_for(n)} probe=8 "
              f"recall@{K} {hits}/{len(exact)} = {hits / len(exact):.3f} "
              f"({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
