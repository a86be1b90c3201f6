"""A/B the physical shapes of IVF cell assignment across centroid
counts and record the literal->arrow crossover (round 9).

Shapes probed (same contract: cosine ranking, ties to lower cell,
degenerate similarity ranks last):

* **literal** — centroids inlined into the plan as ONE SQL
  array-of-structs literal; per-row transform + array_sort.  Zero
  Python, bit-exact with the DuckDB oracles, but plan parse/codegen
  grows superlinearly with k x dim.
* **broadcast-HOF** — same per-row expressions, centroids shipped as a
  single-row broadcast-joined column instead of plan text.  Fixes the
  parse blowup but leaves the real bottleneck: Catalyst higher-order
  folds run ~30M mul-adds/s.
* **arrow** — mapInPandas, one numpy matmul per batch
  (operators/similarity._assign_cells_arrow).

Measured (r9, local[32], dim 64, 5k-row corpus, warm; broadcast-HOF
from a one-off probe at the same sizes):

    k        literal   broadcast-HOF   arrow
    8         0.65s         -           0.28s
    256       4.04s        3.3s         0.29s
    512       7.8s         6.3s        ~0.3s
    1024     15.24s       10.3s         0.38s
    4096     (minutes at   50.3s        0.72s
              20k rows)
    16384        -           -          2.19s

Conclusion: ASSIGN_CELLS_LITERAL_MAX = 8192 doubles (128 cells at
dim 64) keeps every oracle-gated query (n_cells=8) on the exact
literal tier and routes real IVF cell counts to the matmul tier.
The broadcast-HOF shape is dominated at every k and not shipped.

Usage: python scripts/ivf_cells_probe.py [--rows 5000] [--dims 64]
       [--cells 8,256,1024,4096] [--shapes literal,arrow]
"""

from __future__ import annotations

import argparse
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5000)
    ap.add_argument("--dims", type=int, default=64)
    ap.add_argument("--cells", default="8,256,1024,4096")
    ap.add_argument("--shapes", default="literal,arrow")
    args = ap.parse_args()

    spark = get_spark(app_name="ivf_cells_probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from ab_metadata_pusher_spark.operators.similarity import _assign_cells

    dim = args.dims
    df = (spark.range(args.rows)
          .select(F.col("id").alias("vec_id"),
                  F.transform(
                      F.sequence(F.lit(0), F.lit(dim - 1)),
                      lambda i: (F.pmod(F.xxhash64(F.col("id") * 31 + i),
                                        F.lit(1000)) / 500.0 - 1.0)
                  ).alias("embedding"))
          .repartition(8).persist())
    df.count()
    rng = random.Random(7)

    print(f"rows={args.rows} dim={dim} nprobe=2 (first run incl. "
          "codegen/worker spin-up, second warm)")
    for k in (int(x) for x in args.cells.split(",")):
        cents = [(c, [rng.uniform(-1, 1) for _ in range(dim)])
                 for c in range(k)]
        for shape in args.shapes.split(","):
            if shape == "literal" and k * dim > 64 * 1024:
                print(f"k={k:6d} {shape:8s} SKIPPED (pathological — "
                      "minutes of parse/codegen)", flush=True)
                continue
            t0 = time.time()
            n = _assign_cells(df, cents, "vec_id", "embedding",
                              nprobe=2, shape=shape).count()
            t1 = time.time() - t0
            t0 = time.time()
            _assign_cells(df, cents, "vec_id", "embedding",
                          nprobe=2, shape=shape).count()
            print(f"k={k:6d} {shape:8s} first={t1:6.2f}s "
                  f"warm={time.time() - t0:6.2f}s rows={n}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
