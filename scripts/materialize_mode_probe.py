"""Eager-checkpoint vs lazy-persist materialization, per affected head.

OPTIMIZATION_r13.md backlog item 2: eager localCheckpoint erases
outputPartitioning, forcing re-exchanges the lazy-persist
(library-default) mode does not pay.  This probe times every bench head
that routes through materialize_shared under BOTH modes, alternated
per rep in one session (persist mode releases its frames after every
head, which is what a persist-mode bench would do).

VERDICT (r13, settles OPTIMIZATION_r13.md backlog item 2): persist
wins where partitioning recovery matters (dedup_weighted_minhash
-0.64 s, agg_countmin_sketch -0.49 s, dedup_ppjoin -0.33 s) but loses
on multi-consumer materializations (orders_basket_lift +1.05 s,
graph_link_prediction_capped +0.76 s) — net +1.25 s WORSE over the 18
heads (39.9 s eager vs 41.2 s persist, min-of-3 each).  The bench
keeps eager; per-site overrides remain available via the
``materialize=`` parameter.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]

from ab_metadata_pusher_spark.session import get_spark
from ab_metadata_pusher_spark.operators._shared import (
    MATERIALIZE_CONF, release_materialized,
)
from ab_metadata_pusher_spark.plans.registry import queries
import bench as bench_mod

spark = get_spark(app_name="mat_mode_probe",
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

reg = queries()
full = bench_mod._unbounded_llm(spark, SF_DIR)

HEADS = [
    "dedup_ppjoin", "dedup_bloom_incremental", "dedup_weighted_minhash",
    "sample_dsir", "quality_ppl_buckets", "agg_countmin_sketch",
    "graph_triangles", "graph_link_prediction_capped", "orders_basket_lift",
    "similarity_ann_ivf", "multimodal_phash_pairs", "dedup_semantic",
    "quality_label_consistency_ann",
    # full heads
    "dedup_containment_full", "dedup_minhash_lsh_full", "dedup_simhash_full",
    "similarity_ann_full", "dedup_weighted_minhash_full",
]
builders = {}
for h in HEADS:
    if h in full:
        builders[h] = full[h]
    else:
        builders[h] = (lambda h=h: reg[h](spark, SF_DIR))


def run(build):
    t0 = time.perf_counter()
    df = build()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


import hashlib


def result_hash(build):
    df = build()
    rows = sorted(map(str, df.collect()))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


# light equality check on three representative heads
for h in ("dedup_containment_full", "graph_triangles", "orders_basket_lift"):
    spark.conf.set(MATERIALIZE_CONF, "eager")
    he = result_hash(builders[h])
    spark.conf.set(MATERIALIZE_CONF, "persist")
    hp = result_hash(builders[h])
    release_materialized(spark)
    print(f"equal[{h}]: {he == hp}", flush=True)

times = {h: {"eager": [], "persist": []} for h in HEADS}
for rep in range(3):
    for mode in ("eager", "persist"):
        spark.conf.set(MATERIALIZE_CONF, mode)
        for h in HEADS:
            try:
                dt = run(builders[h])
            except Exception as exc:
                print(f"ERR {h} {mode}: {exc}", flush=True)
                dt = float("nan")
            times[h][mode].append(dt)
            if mode == "persist":
                release_materialized(spark)
    print(f"rep {rep} done", flush=True)

print(f"{'head':35s} {'eager':>7s} {'persist':>7s}  delta")
te = tp = 0.0
for h in HEADS:
    e, p = min(times[h]["eager"]), min(times[h]["persist"])
    te += e; tp += p
    print(f"{h:35s} {e:7.3f} {p:7.3f}  {p-e:+.3f}")
print(f"{'TOTAL (min per head)':35s} {te:7.3f} {tp:7.3f}  {tp-te:+.3f}")
spark.stop()
