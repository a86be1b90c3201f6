"""Paired A/B: sequential eager checkpoints vs lazy checkpoints forced
in parallel, on the metadata_fk_inference build (9 per-column distinct
frames).  Same audited consumer shape (Scan ExistingRDD) either way;
the lazy+parallel arm just overlaps the tiny materialization jobs.
Results equality-checked in-session.

VERDICT (r13, settles OPTIMIZATION_r13.md backlog item 4): min-of-6
seq 1.80 s vs par 1.72 s — the nine jobs are ~60-80 ms each and the
head's floor is plan analysis, so the threading buys ~4 %, inside this
box's session noise.  Not shipped.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]

from concurrent.futures import ThreadPoolExecutor

from ab_metadata_pusher_spark.session import get_spark
from ab_metadata_pusher_spark.sources.fixtures import load_table
from ab_metadata_pusher_spark.plans.metadata_queries import _FK_CANDIDATES
from pyspark.sql import functions as F

spark = get_spark(app_name="fk_par_probe",
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")


def build(par: bool):
    col_distinct = {}
    for ct, cc, pt, pc in _FK_CANDIDATES:
        for t, c in ((ct, cc), (pt, pc)):
            if (t, c) not in col_distinct:
                col_distinct[(t, c)] = (
                    load_table(spark, SF_DIR, t).select(c).distinct())
    if par:
        lcs = {k: df.localCheckpoint(eager=False)
               for k, df in col_distinct.items()}
        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(lambda df: df.count(), lcs.values()))
        col_distinct = lcs
    else:
        col_distinct = {k: df.localCheckpoint(eager=True)
                        for k, df in col_distinct.items()}
    out = None
    for ct, cc, pt, pc in _FK_CANDIDATES:
        child = col_distinct[(ct, cc)]
        parent = col_distinct[(pt, pc)]
        row = (child.join(F.broadcast(parent),
                          child[cc] == parent[pc], "left")
               .agg(F.count(F.lit(1)).alias("n_child_distinct"),
                    F.count(parent[pc]).alias("n_contained")))
        row = row.select(
            F.lit(ct).alias("child_table"), F.lit(cc).alias("child_col"),
            F.lit(pt).alias("parent_table"), F.lit(pc).alias("parent_col"),
            "n_child_distinct", "n_contained",
            F.round(F.col("n_contained") / F.col("n_child_distinct"), 4)
             .alias("inclusion"))
        out = row if out is None else out.unionByName(row)
    return out


def run(par):
    t0 = time.perf_counter()
    df = build(par)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


r_seq = sorted(map(str, build(False).collect()))
r_par = sorted(map(str, build(True).collect()))
print("results equal:", r_seq == r_par, flush=True)

seq_t, par_t = [], []
for i in range(6):
    seq_t.append(run(False))
    par_t.append(run(True))
    print(f"round {i}: seq={seq_t[-1]:.3f} par={par_t[-1]:.3f}", flush=True)
print(f"MIN seq={min(seq_t):.3f} par={min(par_t):.3f}")
spark.stop()
