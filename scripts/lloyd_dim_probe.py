"""A/B the two physical shapes of the Lloyd centroid update across
embedding widths and record the wide-dim crossover (r8 VERDICT ask #4).

Shape A (wide-sum, shipped default): ONE cluster-keyed shuffle of
``dim`` per-dimension ``avg`` columns — no row inflation, k x (dim+1)
scalars on the wire, but codegen compiles one aggregate expression per
dimension into a single generated method, so very wide embeddings pay
a superlinear one-time compile + fall out of JIT comfort.

Shape B (exploded): posexplode to (cluster, pos, val) — corpus x dim
row inflation through one (cluster, pos)-keyed aggregation exchange,
but a constant-size generated method regardless of width.

Method: synthetic corpora of N vectors x dim doubles built from
spark.range + a transform over xxhash64 (deterministic, no Python
row generation), k=8 clusters pre-assigned by id hash so both shapes
aggregate identical input.  min-of-R wall times per (dim, shape).

Result (r9, local[32]): exploded wins at EVERY probed point (dim
8-2048 x rows 20k-2M) — the wide shape exits whole-stage codegen past
spark.sql.codegen.maxFields (100) aggregate expressions and pays
superlinear plan/compile time besides.  update_centroids' ``auto``
shape is therefore exploded; ``wide`` stays caller-selectable.

Usage: python scripts/lloyd_dim_probe.py [--reps 2] [--rows 20000]
       [--dims 64,256,512,1024,2048]
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

K = 8


def build_assigned(spark, n_rows: int, dim: int):
    """N rows of (cluster, embedding<array<double>[dim]>), deterministic."""
    return (spark.range(n_rows)
            .select(F.pmod(F.xxhash64("id"), F.lit(K)).alias("cluster"),
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda i: (F.pmod(F.xxhash64(F.col("id") * 31 + i),
                                          F.lit(1000)) / 500.0 - 1.0)
                    ).alias("embedding"))
            .repartition(8))


def run_shape(assigned, dim: int, shape: str) -> float:
    from ab_metadata_pusher_spark.operators import clustering as C
    t0 = time.time()
    out = C.update_centroids(assigned, assigned, id_col="id",
                             emb_col="embedding", dim=dim, shape=shape)
    assert len(out) == K
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--dims", default="64,256,512,1024,2048")
    args = ap.parse_args()
    dims = [int(d) for d in args.dims.split(",")]

    spark = get_spark(app_name="lloyd_dim_probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    print(f"rows={args.rows} k={K} reps={args.reps} (min-of-reps, "
          "first rep includes codegen compile — reported separately)")
    print(f"{'dim':>6} {'wide_cold':>10} {'wide_warm':>10} "
          f"{'expl_cold':>10} {'expl_warm':>10} {'winner':>8}")
    for dim in dims:
        assigned = build_assigned(spark, args.rows, dim)
        assigned.persist().count()
        res = {}
        for shape in ("wide", "exploded"):
            times = [run_shape(assigned, dim, shape)
                     for _ in range(max(2, args.reps))]
            res[shape] = (times[0], min(times[1:]))
        assigned.unpersist()
        warm_winner = ("wide" if res["wide"][1] <= res["exploded"][1]
                       else "exploded")
        print(f"{dim:>6} {res['wide'][0]:>10.2f} {res['wide'][1]:>10.2f} "
              f"{res['exploded'][0]:>10.2f} {res['exploded'][1]:>10.2f} "
              f"{warm_winner:>8}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
