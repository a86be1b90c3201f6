"""A/B the triangle-count orientations and measure the hub flip
(r9: the SCALE.md "orient by (degree, id) at power-law scale" prose is
now code — `_triangles_run(orientation=...)`; this probe records the
numbers the auto flip stands on).

Form ID: edges oriented a < b by node id.  A hub with a small id keeps
its WHOLE neighborhood in one out-list, so the per-edge
`array_intersect` degrades toward O(n) work against that list.

Form DEGREE: edges reoriented toward the (degree, id)-greater end —
two extra |E|-row exchanges buy out-lists bounded by O(√(2m)) under any
skew.

Graphs: (a) the real sf0.1 co-occurrence fixture (mild skew — the flip
should NOT trigger); (b) synthetic power-law graphs where destinations
concentrate on small ids (hubs get the worst-case id orientation), at
|V| ∈ {50k, 200k}, avg degree ~20.  min-of-R warm wall times.

Usage: python scripts/triangle_orientation_probe.py [--reps 3]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.plans.analytics_queries import (  # noqa: E402
    _TRI_HUB_FACTOR, _triangles_run, _t,
)
from ab_metadata_pusher_spark.operators._shared import (  # noqa: E402
    release_materialized,
)

DEGREE = 20


def fixture_pairs(spark):
    li = _t(spark, "/root/testdata/sf0.1", "lineitem").select(
        "l_orderkey", "l_partkey")
    per = (li.groupBy("l_orderkey")
           .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    pairs = F.flatten(F.transform("ps", lambda x, i: F.transform(
        F.slice("ps", i + F.lit(2), F.size("ps")),
        lambda y: F.struct(x.alias("a"), y.alias("b")))))
    return per.select(F.explode(pairs).alias("p")).select("p.a", "p.b")


def powerlaw_pairs(spark, n_v: int):
    """|V|*DEGREE draws with destinations ~ u³-concentrated on SMALL
    ids: hubs get small ids, the id orientation's worst case."""
    u = (F.pmod(F.xxhash64(F.col("id") * 2654435761), F.lit(1_000_000))
         / 1_000_000.0)
    raw = (spark.range(n_v * DEGREE)
           .select((F.col("id") % n_v).alias("x"),
                   F.floor(F.pow(u, 3.0) * n_v).cast("long").alias("y"))
           .filter(F.col("x") != F.col("y")))
    return (raw.select(F.least("x", "y").alias("a"),
                       F.greatest("x", "y").alias("b")))


def signals(spark, pairs):
    adj = (pairs.groupBy("a")
           .agg(F.sort_array(F.collect_set("b")).alias("nbrs")))
    sig = adj.agg(F.max(F.size("nbrs")).alias("mx"),
                  F.sum(F.size("nbrs")).alias("m")).first()
    return sig["mx"], sig["m"]


def timed(spark, pairs, orientation, reps):
    best = math.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _triangles_run(spark, pairs, orientation).collect()
        best = min(best, time.perf_counter() - t0)
        release_materialized(spark)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark(app_name="triangle-orientation-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    cases = [("sf0.1 co-occur", fixture_pairs(spark))]
    for n_v in (50_000, 200_000):
        cases.append((f"powerlaw |V|={n_v}", powerlaw_pairs(spark, n_v)))

    for name, pairs in cases:
        pairs = pairs.localCheckpoint(eager=True)  # probe the count, not the build
        mx, m = signals(spark, pairs)
        bound = _TRI_HUB_FACTOR * math.sqrt(2 * m)
        flip = "degree" if mx > bound else "id"
        t_id = timed(spark, pairs, "id", args.reps)
        t_deg = timed(spark, pairs, "degree", args.reps)
        print(f"{name:22s} m={m:>9} max_out={mx:>6} "
              f"{_TRI_HUB_FACTOR}*sqrt(2m)={bound:8.1f} auto->{flip:6s} "
              f"id={t_id:6.2f}s degree={t_deg:6.2f}s "
              f"id/degree={t_id / t_deg:5.2f}x")


if __name__ == "__main__":
    main()
