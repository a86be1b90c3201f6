"""Does a small-SF warmup run of the quality_label_full SHAPE remove
its cold-JIT spike at sf0.1?  (r14 — companion to qlf_solo_probe.py,
which measured the solo cold curve 80.5 -> 48.1 -> 6.5 -> 5.0 s: the
per-task CPU of the scoring stages drops ~10x between reps, no spill,
no GC wall — the classic one-time-JIT spike the bench's _warmup list
exists for, an order of magnitude bigger than the three heads already
on that list.)

Mode A (default): fresh session -> run the head at --warm-sf (0.001 /
0.01) N_WARM times -> run at sf0.1.  If the sf0.1 first run lands near
its warm floor (~5-7 s), the warmup shape transfers and bench.py's
_warmup should include it.

Usage: python scripts/qlf_warmup_probe.py [--warm-sf 0.001] [--n-warm 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ab_metadata_pusher_spark.operators import similarity as S  # noqa: E402
from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    MATERIALIZE_CONF, parquet_rowcount, spread_if_narrow,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.sources.fixtures import load_table  # noqa: E402


def head(spark, sf_dir):
    from ab_metadata_pusher_spark.plans.llm_queries import _qlc_flags
    emb = spread_if_narrow(load_table(spark, sf_dir, "embeddings"))
    nprobe = int(os.environ.get("SPARK_GRAFT_IVF_NPROBE", "8"))
    return _qlc_flags(emb, S.ann_ivf_knn_self(
        emb, k=5, nprobe=nprobe,
        n_vectors=parquet_rowcount(f"{sf_dir}/embeddings.parquet")))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm-sf", default="0.001")
    ap.add_argument("--n-warm", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="qlf-warmup-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(MATERIALIZE_CONF, "eager")

    warm_dir = f"/root/testdata/sf{args.warm_sf}"
    for i in range(args.n_warm):
        t0 = time.monotonic()
        head(spark, warm_dir).write.format("noop").mode("overwrite").save()
        print(f"warm sf{args.warm_sf} run {i}: {time.monotonic() - t0:.2f}s",
              flush=True)
    for i in range(3):
        t0 = time.monotonic()
        head(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        print(f"sf0.1 run {i}: {time.monotonic() - t0:.2f}s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
