"""Shuffle-BYTES A/B for the r13 WMH exchange-sharing trade (r14).

r13 (commit 2ccd970) replaced wmh_pairs' two early exchanges — the
(sid, w) partial-aggregated tf exchange plus the w-keyed window
exchange — with ONE ``repartition("w")`` of the RAW exploded shingle
stream.  The r13 verdict's scale caveat: the raw stream has no
map-side partial aggregation, so once tf > 1 tokens appear the single
exchange could ship MORE bytes than the two partial-agg exchanges it
replaced.  This probe measures shuffle WRITE bytes (the scale-honest
quantity — guide §2.3) for both shapes on generator-identical corpora
at x1 / x10 / x100 of sf0.1 (scripts/gen_scaled_testdata.py), outputs
crc-checked equal per scale and against the shipped ``wmh_pairs``.

Both shapes are built side by side from the same product helpers; only
the tf stage differs:

* shared (shipped): ``toks.repartition("w").groupBy("sid","w")`` —
  one raw-stream exchange serving tf agg + df window.
* split (pre-r13):  ``toks.groupBy("sid","w")`` + window on w —
  partial-agg exchange on (sid, w), second exchange on w.

Bytes are read from the UI REST API per run (sum of shuffleWriteBytes
over the run's new stages), which is deterministic up to partial-agg
combine ratios; wall seconds are recorded but NOT the decision signal.

Usage:
    python scripts/wmh_bytes_probe.py \
        --dirs .scratch/scaled/x1,.scratch/scaled/x10,.scratch/scaled/x100
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.functions.hashing import (  # noqa: E402
    MERSENNE_P, md5_long, minhash_coeffs,
)
from ab_metadata_pusher_spark.operators import text as X  # noqa: E402
from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    materialize_shared, release_materialized,
)
from ab_metadata_pusher_spark.plans.llm_queries import (  # noqa: E402
    _WMH_K, _WMH_MAX_DF, _WMH_R, wmh_pairs,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402

UI_PORT = 4079


def _stages() -> list[dict]:
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    return json.load(urllib.request.urlopen(
        f"{base}/{app_id}/stages?status=complete"))


def wmh_variant(corpus: DataFrame, tf_shape: str) -> DataFrame:
    """wmh_pairs with the tf stage's exchange shape switchable.

    Mirrors plans/llm_queries.wmh_pairs exactly (crc-checked against it
    below); ``tf_shape`` = 'shared' (shipped) | 'split' (pre-r13)."""
    toks = corpus.select(
        F.col("doc_id").alias("sid"),
        F.explode(X.shingle_array(X.tokens("text"))).alias("w"))
    if tf_shape == "shared":
        grouped = toks.repartition("w").groupBy("sid", "w")
    elif tf_shape == "split":
        grouped = toks.groupBy("sid", "w")
    else:
        raise ValueError(tf_shape)
    tf = (grouped
          .agg(F.count(F.lit(1)).alias("tf"))
          .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("w")))
          .filter(F.col("df") <= _WMH_MAX_DF)
          .drop("df")
          .withColumn("h", F.pmod(md5_long(F.col("w")), F.lit(MERSENNE_P))))
    aggs = []
    for j, (a, b) in enumerate(minhash_coeffs(_WMH_K)):
        u = (F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE_P))
             + 0.5) / MERSENNE_P
        e = -F.log(u) / F.col("tf")
        aggs.append(F.min(F.struct(e.alias("e"), F.col("w").alias("t")))
                    .alias(f"s{j}"))
    sig = tf.groupBy("sid").agg(*aggs)
    comp_build = (sig.select("sid", F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"), F.col(f"s{j}.t").alias("t"))
        for j in range(_WMH_K)])).alias("c"))
        .select("sid", F.col("c.j").alias("j"), F.col("c.t").alias("t")))
    comp = materialize_shared(comp_build)
    a_, b_ = comp.alias("a"), comp.alias("b")
    return (a_.join(b_, (F.col("a.j") == F.col("b.j"))
                    & (F.col("a.t") == F.col("b.t"))
                    & (F.col("a.sid") < F.col("b.sid")))
            .groupBy(F.col("a.sid").alias("sid_a"),
                     F.col("b.sid").alias("sid_b"))
            .agg(F.count(F.lit(1)).alias("n_agree"))
            .filter(F.col("n_agree") >= _WMH_R)
            .select("sid_a", "sid_b", "n_agree",
                    F.round(F.col("n_agree") / F.lit(float(_WMH_K)), 4)
                     .alias("est_weighted_jaccard")))


def _crc(df: DataFrame) -> tuple:
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.concat_ws(
            "|", "sid_a", "sid_b", "n_agree",
            F.format_number("est_weighted_jaccard", 4)))).alias("h"),
    ).collect()[0]
    return (r["n"], r["h"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs",
                    default=".scratch/scaled/x1,.scratch/scaled/x10,"
                            ".scratch/scaled/x100")
    args = ap.parse_args()
    dirs = [str(REPO / d) if not d.startswith("/") else d
            for d in args.dirs.split(",")]
    for d in dirs:
        if not Path(d).exists():
            sys.exit(f"missing scaled dir {d} — run gen_scaled_testdata.py")

    spark = get_spark(app_name="wmh-bytes-probe",
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": str(UI_PORT),
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.ui.retainedStages": "5000",
                                  "spark.cleaner.periodicGC.interval": "5min"})
    spark.sparkContext.setLogLevel("ERROR")

    for d in dirs:
        scale = Path(d).name
        docs = (spark.read.parquet(f"{d}/documents.parquet")
                .select("doc_id", "text"))
        crcs: dict[str, tuple] = {}
        for shape in ("shared", "split"):
            df = wmh_variant(docs, shape)
            seen = {s["stageId"] for s in _stages()}
            spark.sparkContext.setJobDescription(f"wmh-{scale}-{shape}")
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            spark.sparkContext.setJobDescription(None)
            new = [s for s in _stages() if s["stageId"] not in seen]
            sh_w = sum(s.get("shuffleWriteBytes") or 0 for s in new)
            sh_r = sum(s.get("shuffleReadBytes") or 0 for s in new)
            crcs[shape] = _crc(df)
            release_materialized(spark)
            print(f"{scale:5s} {shape:6s} shuffleWrite={sh_w:>13,d} B  "
                  f"shuffleRead={sh_r:>13,d} B  wall={dt:6.1f}s  "
                  f"stages={len(new)}", flush=True)
        if scale == "x1":
            crcs["product"] = _crc(wmh_pairs(docs))
            release_materialized(spark)
        vals = set(crcs.values())
        print(f"{scale:5s} outputs equal: {len(vals) == 1}  "
              f"(rows, crc-sum) = {crcs['shared']}", flush=True)
        if len(vals) != 1:
            for k, v in crcs.items():
                print(f"  {k}: {v}")
            spark.stop()
            return 1
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
