"""COLD-cost A/B of the SemDeDup pairwise-scoring tier on
dedup_semantic_full (r14, companion to qlf_cold_scoring_probe.py).

Why this head needs its own probe: it is the LAST head in the bench
order and — once quality_label_full's scoring moved to the numpy tier —
the only remaining interpreted-fold cosine user running after it, so it
inherits the fold's cold-JIT ramp that QLF used to absorb (measured in
the r14 fold-vs-auto bench pair: exec 0.90 s with QLF-on-fold warming
the path vs 6.03 s with QLF-on-numpy leaving it cold).  The fix under
test wires `_candidate_cosine` into `semantic_dedup_pairs`
(est pairs = n²/(2k) ≥ the 1M crossover at sf0.1's doubled corpus),
selected per run here via ``SPARK_GRAFT_COSINE_SCORING``.

Protocol: full-head outputs equality-checked fold-vs-pandas in one
shared session first, then one fresh JVM per (variant, rep), variants
alternated, noop sink, bench session conf.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _head(spark):
    from ab_metadata_pusher_spark.operators._shared import spread_if_narrow
    from ab_metadata_pusher_spark.sources.fixtures import load_table

    import bench

    emb = spread_if_narrow(load_table(spark, SF_DIR, "embeddings"))
    return bench._semantic_full(emb, f"{SF_DIR}/embeddings.parquet")


def _run_one() -> None:
    from ab_metadata_pusher_spark.operators._shared import MATERIALIZE_CONF
    from ab_metadata_pusher_spark.session import get_spark

    variant = os.environ["SPARK_GRAFT_COSINE_SCORING"]
    spark = get_spark(app_name=f"sem-cold-{variant}",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.cleaner.periodicGC.interval": "5min"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(MATERIALIZE_CONF, "eager")
    t0 = time.monotonic()
    _head(spark).write.format("noop").mode("overwrite").save()
    print(f"COLD {variant} {time.monotonic() - t0:.2f}", flush=True)
    spark.stop()


def _equality() -> None:
    from ab_metadata_pusher_spark.operators._shared import MATERIALIZE_CONF
    from ab_metadata_pusher_spark.session import get_spark

    spark = get_spark(app_name="sem-cold-eq",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(MATERIALIZE_CONF, "eager")
    outs = {}
    for v in ("fold", "pandas"):
        os.environ["SPARK_GRAFT_COSINE_SCORING"] = v
        outs[v] = sorted(tuple(r) for r in _head(spark).collect())
    os.environ.pop("SPARK_GRAFT_COSINE_SCORING", None)
    ok = outs["fold"] == outs["pandas"]
    print(f"EQUAL {ok} rows={len(outs['fold'])}", flush=True)
    if not ok:
        diff = sum(1 for x, y in zip(outs["fold"], outs["pandas"])
                   if x != y)
        print(f"  fold vs pandas: {diff} differing rows")
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", action="store_true")
    ap.add_argument("--equality", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.equality:
        _equality()
        return 0
    if args.one:
        _run_one()
        return 0
    subprocess.run([sys.executable, __file__, "--equality"], check=True)
    variants = ["fold", "pandas"]
    for rep in range(args.reps):
        for i in range(len(variants)):
            v = variants[(i + rep) % len(variants)]
            env = dict(os.environ, SPARK_GRAFT_COSINE_SCORING=v)
            subprocess.run([sys.executable, __file__, "--one"],
                           check=True, env=env)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
