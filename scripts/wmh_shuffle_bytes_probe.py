"""WMH exchange-trade verification at scale (r14, VERDICT ask #6).

The r13 change (2ccd970) replaced two exchanges of the PARTIALLY
AGGREGATED (sid, w, tf) stream — one on (sid, w) for the tf groupBy
with map-side combine, one on w for the df window — with ONE
``repartition("w")`` of the RAW exploded shingle stream (no map-side
partial aggregation).  That wins while shingles are near-unique per
document (raw ≈ combined rows, 1 exchange < 2) and loses when tf >> 1
(the combined stream is much smaller).  This probe measures the actual
SHUFFLE BYTES WRITTEN of both shapes on the x1 / x10 / x100 replicas
(scripts/gen_scaled_testdata.py output — word-rewritten per replica, so
df structure is scale-realistic), plus wall time for context.

Bytes come from the UI REST API (cumulative shuffle write across all
stages, diffed around each run) — deterministic, noise-free evidence;
the timed signature build uses the noop sink on the ``tf`` + signature
aggregate (the pair join downstream is identical in both shapes).

Usage:
    python scripts/gen_scaled_testdata.py --factor 1   --out /tmp/scaled/x1
    python scripts/gen_scaled_testdata.py --factor 10  --out /tmp/scaled/x10
    python scripts/gen_scaled_testdata.py --factor 100 --out /tmp/scaled/x100
    python scripts/wmh_shuffle_bytes_probe.py /tmp/scaled/x1 /tmp/scaled/x10 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window, functions as F  # noqa: E402

from ab_metadata_pusher_spark.functions.hashing import (  # noqa: E402
    MERSENNE_P, md5_long, minhash_coeffs,
)
from ab_metadata_pusher_spark.operators import text as X  # noqa: E402
from ab_metadata_pusher_spark.plans.llm_queries import (  # noqa: E402
    _WMH_K, _WMH_MAX_DF,
)
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402

UI_PORT = 4077


def _shuffle_totals() -> tuple[int, int]:
    """Cumulative (shuffle write bytes, records) across all stages."""
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages"))
    return (sum(s.get("shuffleWriteBytes", 0) for s in stages),
            sum(s.get("shuffleWriteRecords", 0) for s in stages))


def _sig(tf):
    aggs = []
    for j, (a, b) in enumerate(minhash_coeffs(_WMH_K)):
        u = (F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE_P))
             + 0.5) / MERSENNE_P
        e = -F.log(u) / F.col("tf")
        aggs.append(F.min(F.struct(e.alias("e"), F.col("w").alias("t")))
                    .alias(f"s{j}"))
    return tf.groupBy("sid").agg(*aggs)


def build(docs, shape: str):
    toks = docs.select(
        F.col("doc_id").alias("sid"),
        F.explode(X.shingle_array(X.tokens("text"))).alias("w"))
    w_df = Window.partitionBy("w")
    if shape == "new":  # shipped r13: one raw-stream exchange on w
        base = toks.repartition("w")
    else:  # pre-2ccd970: partial-agg exchange on (sid, w) + window on w
        base = toks
    tf = (base.groupBy("sid", "w")
          .agg(F.count(F.lit(1)).alias("tf"))
          .withColumn("df", F.count(F.lit(1)).over(w_df))
          .filter(F.col("df") <= _WMH_MAX_DF)
          .drop("df")
          .withColumn("h", F.pmod(md5_long(F.col("w")), F.lit(MERSENNE_P))))
    return _sig(tf)


def main() -> int:
    dirs = sys.argv[1:]
    if not dirs:
        print(__doc__)
        return 1
    spark = get_spark(app_name="wmh-bytes-probe",
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": str(UI_PORT),
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        for shape in ("old", "new"):
            b0, r0 = _shuffle_totals()
            t0 = time.monotonic()
            build(docs, shape).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            b1, r1 = _shuffle_totals()
            print(f"{os.path.basename(d):6s} {shape:4s} "
                  f"shuffle_bytes={b1 - b0:>13,d}  "
                  f"records={r1 - r0:>12,d}  wall={dt:6.2f}s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
