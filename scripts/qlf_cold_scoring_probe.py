"""COLD-cost A/B of candidate-cosine scoring tiers on quality_label_full
(r14 follow-up to scripts/cosine_scoring_probe.py).

The r13 probe compared tiers WARM (min-of-N in one session) and kept
the interpreted `cosine_prenorm` fold.  r14's instrumented solo probe
(qlf_solo_probe.py) showed the bench never sees the warm number: the
fold's scoring stage burns 2700 s of task CPU on its FIRST execution
vs 48 s hot (a ~50x interpreted/JIT ramp needing 3-4 full executions
to converge, with 12 GB/run of boxed-Double garbage driving 250-330 s
GC spikes) — the head measured 51.0 s in the round-open bench, 30.6 s
in the r13 driver record, 5-7 s warm.  Every bench/driver run pays
cold, so COLD is the number that matters.

Each (variant, rep) runs in a FRESH JVM (subprocess), bench session
conf, one noop-sink execution of the whole head.  Variants:

* ``fold``    — shipped: cosine_prenorm higher-order fold (interpreted).
* ``unroll``  — dot as a 64-term left-associated codegen sum of
                get(a,i)*get(b,i) casts (bit-exact with the fold's
                accumulation order; F.get yields NULL out-of-bounds,
                matching zip_with's null padding).
* ``pandas``  — arrow-serialized pandas_udf: elementwise product then
                SEQUENTIAL per-dim accumulation in numpy (the r13
                bit-exact recipe; cold == warm for native code).

Run without args to execute the matrix; with ``--variant X`` it runs
one measurement (the subprocess entry).  An equality pass compares all
variants' full outputs in one session first.
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


def _head(spark, variant: str):
    from pyspark.sql import Window, functions as F

    from ab_metadata_pusher_spark.operators import similarity as S
    from ab_metadata_pusher_spark.operators._shared import (
        parquet_rowcount, spread_if_narrow,
    )
    from ab_metadata_pusher_spark.plans.llm_queries import _qlc_flags
    from ab_metadata_pusher_spark.sources.fixtures import load_table

    emb = spread_if_narrow(load_table(spark, SF_DIR, "embeddings"))
    n_vectors = parquet_rowcount(f"{SF_DIR}/embeddings.parquet")
    n_cells = S.ivf_cells_for(n_vectors)
    nprobe = int(os.environ.get("SPARK_GRAFT_IVF_NPROBE", "8"))
    cents = S.ivf_centroid_list(emb, n_cells=n_cells, iters=2)
    dim = len(cents[0][1])
    build = S._assign_cells(
        emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("c_emb"),
                   S.l2_norm(F.col("embedding")).alias("c_norm")),
        cents, "neighbor_id", "c_emb", nprobe=1)
    query = S._assign_cells(
        emb.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("q_emb"),
                   S.l2_norm(F.col("embedding")).alias("q_norm")),
        cents, "query_id", "q_emb", nprobe=nprobe)
    cand = (query.join(build, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id")))

    if variant == "fold":
        scored = cand.withColumn(
            "cosine_sim", S.cosine_prenorm(F.col("q_emb"), F.col("c_emb"),
                                           F.col("q_norm"), F.col("c_norm")))
    elif variant == "unroll":
        acc = F.lit(0.0)
        a, b = F.col("q_emb"), F.col("c_emb")
        for i in range(dim):
            acc = acc + (F.get(a, i).cast("double")
                         * F.get(b, i).cast("double"))
        scored = cand.withColumn(
            "cosine_sim", acc / (F.col("q_norm") * F.col("c_norm")))
    elif variant == "pandas":
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        # NOTE: no inline type hints — this module's postponed
        # annotations (`from __future__ import annotations`) stringify
        # them, which pyspark's hint inference rejects.
        def dot_seq(qa, ca):
            n = len(qa)
            out = np.empty(n, dtype=np.float64)
            qm = np.empty((n, dim), dtype=np.float64)
            cm = np.empty((n, dim), dtype=np.float64)
            ok = np.ones(n, dtype=bool)
            for r in range(n):
                q, c = qa.iloc[r], ca.iloc[r]
                if q is None or c is None or len(q) != dim \
                        or len(c) != dim:
                    ok[r] = False
                    continue
                qm[r] = q
                cm[r] = c
            prod = qm * cm
            accv = np.zeros(n, dtype=np.float64)
            for i in range(dim):  # sequential per-dim: the fold's order
                accv = accv + prod[:, i]
            out[:] = accv
            res = pd.Series(out)
            res[~ok] = None
            return res

        dot_seq.__annotations__ = {"qa": pd.Series, "ca": pd.Series,
                                   "return": pd.Series}
        dot_udf = pandas_udf(dot_seq, "double")
        scored = cand.withColumn(
            "cosine_sim", dot_udf(F.col("q_emb"), F.col("c_emb"))
            / (F.col("q_norm") * F.col("c_norm")))
    else:
        raise ValueError(variant)

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id"))
    nn = (scored.withColumn("rank", F.row_number().over(w))
          .filter(F.col("rank") <= 5)
          .select("query_id", "neighbor_id",
                  F.round("cosine_sim", 6).alias("cosine_sim"), "rank"))
    return _qlc_flags(emb, nn)


def _run_one(variant: str) -> None:
    from ab_metadata_pusher_spark.operators._shared import MATERIALIZE_CONF
    from ab_metadata_pusher_spark.session import get_spark

    spark = get_spark(app_name=f"qlf-cold-{variant}",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.cleaner.periodicGC.interval": "5min"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(MATERIALIZE_CONF, "eager")
    t0 = time.monotonic()
    _head(spark, variant).write.format("noop").mode("overwrite").save()
    print(f"COLD {variant} {time.monotonic() - t0:.2f}", flush=True)
    spark.stop()


def _equality() -> None:
    from pyspark.sql import functions as F

    from ab_metadata_pusher_spark.operators._shared import MATERIALIZE_CONF
    from ab_metadata_pusher_spark.session import get_spark

    spark = get_spark(app_name="qlf-cold-eq",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(MATERIALIZE_CONF, "eager")
    outs = {}
    for v in ("fold", "unroll", "pandas"):
        outs[v] = sorted(tuple(r) for r in _head(spark, v).collect())
    ok = outs["fold"] == outs["unroll"] == outs["pandas"]
    print(f"EQUAL {ok} rows={len(outs['fold'])}", flush=True)
    if not ok:
        for v in ("unroll", "pandas"):
            diff = sum(1 for x, y in zip(outs["fold"], outs[v]) if x != y)
            print(f"  fold vs {v}: {diff} differing rows")
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant")
    ap.add_argument("--equality", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.equality:
        _equality()
        return 0
    if args.variant:
        _run_one(args.variant)
        return 0
    # driver: equality once, then the cold matrix in fresh JVMs
    subprocess.run([sys.executable, __file__, "--equality"], check=True)
    variants = ["fold", "unroll", "pandas"]
    for rep in range(args.reps):
        for i in range(len(variants)):
            v = variants[(i + rep) % len(variants)]
            subprocess.run([sys.executable, __file__, "--variant", v],
                           check=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
