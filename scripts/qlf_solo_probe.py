"""Solo instrumented probe for the quality_label_full bench head (r14).

The head measured 51.0 s (build 10.8 / exec 40.2) in an otherwise-QUIET
round-open session (session_factor 1.02, every other head at baseline),
reproduced across the bench's retry — while the same code measured
7.5-10.2 s in earlier 32-core sessions and 7.8 s in the driver's 8-core
run.  Its own code path is unchanged since r12 (5.2 s).  This probe
runs the head SOLO with phase timing and pulls per-stage executor
metrics (run time, GC, spill, shuffle) from the UI REST API to see
where the seconds go when it is slow — and whether solo runs are slow
at all (if not, the blowup is bench-session state, not the plan).

Usage: python scripts/qlf_solo_probe.py [--reps 5] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.operators import similarity as S  # noqa: E402
from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    MATERIALIZE_CONF, parquet_rowcount, spread_if_narrow,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.sources.fixtures import load_table  # noqa: E402

UI_PORT = 4078


def _stages() -> list[dict]:
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    return json.load(urllib.request.urlopen(f"{base}/{app_id}/stages"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark(app_name="qlf-solo-probe",
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": str(UI_PORT),
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.cleaner.periodicGC.interval": "5min"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(MATERIALIZE_CONF, "eager")

    from ab_metadata_pusher_spark.plans.llm_queries import _qlc_flags

    emb_path = f"{args.sf_dir}/embeddings.parquet"
    nprobe = int(os.environ.get("SPARK_GRAFT_IVF_NPROBE", "8"))

    for rep in range(args.reps):
        seen = {s["stageId"] for s in _stages()}
        t0 = time.monotonic()
        emb = spread_if_narrow(load_table(spark, args.sf_dir, "embeddings"))
        t1 = time.monotonic()
        df = _qlc_flags(emb, S.ann_ivf_knn_self(
            emb, k=5, nprobe=nprobe,
            n_vectors=parquet_rowcount(emb_path)))
        t2 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.monotonic()
        print(f"rep {rep}: load+spread={t1 - t0:.2f}s  "
              f"build={t2 - t1:.2f}s  exec={t3 - t2:.2f}s  "
              f"total={t3 - t0:.2f}s", flush=True)
        new = [s for s in _stages() if s["stageId"] not in seen]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        for s in new[:6]:
            print(f"    stage {s['stageId']:4d} {s['status']:9s} "
                  f"tasks={s.get('numCompleteTasks', 0):4d} "
                  f"runTime={s.get('executorRunTime', 0) / 1e3:7.1f}s "
                  f"gc={s.get('jvmGcTime', 0) / 1e3:6.1f}s "
                  f"spillMem={s.get('memoryBytesSpilled', 0):>12,d} "
                  f"spillDisk={s.get('diskBytesSpilled', 0):>12,d} "
                  f"in={s.get('inputBytes', 0):>12,d} "
                  f"shW={s.get('shuffleWriteBytes', 0):>11,d} : "
                  f"{(s.get('name') or '')[:60]}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
