"""Probe the LPA loop shuffle width across the measured decades (r10).

_LPA_SHUFFLE_W=16 is the r4 fixture-scale floor (8 under-parallelizes,
32 adds near-empty-partition scheduling cost at sf0.1).  The
multi-decade study (scripts/scale_multi_decade.py, x1/x10/x100
generator-identical replicas) put honest LPA at 2.42/11.54/116.6 s —
e=+1.00 on the last decade with HALF the 32-core box idle: a
fixture-tuned constant, not a scale rule.  This probe re-runs the
registry LPA with the width overridden to candidate values per decade;
outputs are equality-checked across widths (width is plan-shape only).

Usage:
    python scripts/lpa_width_probe.py --dirs .scratch/scaled/x100 \
        --widths 16,32,64,128 --reps 2
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ab_metadata_pusher_spark.plans import analytics_queries as AQ  # noqa: E402
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default=".scratch/scaled/x100")
    ap.add_argument("--widths", default="16,32,64,128")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    dirs = [str(REPO / d) if not d.startswith("/") else d
            for d in args.dirs.split(",")]
    widths = [int(w) for w in args.widths.split(",")]

    spark = get_spark(app_name="lpa-width-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # monkeypatch is module-wide: anything sharing AQ._loop_width (kcore
    # peels with it too) would silently inherit the last forced width —
    # restore the shipped rule even if a sweep rep dies (r10 ADVICE)
    shipped_loop_width = AQ._loop_width
    try:
        for d in dirs:
            sigs = {}
            for w in widths:
                # force the candidate width through the (now data-sized)
                # rule — the shipped _loop_width picks by edge count
                AQ._loop_width = lambda n_rows, parallelism, _w=w: _w
                spark.catalog.clearCache()
                AQ.q_graph_label_propagation(spark, d).write.format("noop") \
                    .mode("overwrite").save()  # warm
                best, sig = float("inf"), None
                for _ in range(args.reps):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    df = AQ.q_graph_label_propagation(spark, d)
                    sig = df.selectExpr(
                        "count(*) AS n",
                        "sum(hash(node, community)) AS h").first()
                    best = min(best, time.time() - t0)
                sigs[w] = (sig["n"], sig["h"])
                print(f"{Path(d).name:6s} w={w:<4d} {best:8.2f}s  "
                      f"rows={sig['n']} hash={sig['h']}", flush=True)
            assert len(set(sigs.values())) == 1, f"widths disagree: {sigs}"
    finally:
        AQ._loop_width = shipped_loop_width


if __name__ == "__main__":
    main()
