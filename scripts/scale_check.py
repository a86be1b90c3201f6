"""Measure warm sf0.01 -> sf0.1 wall time for named registry queries —
the 10x-rows scaling evidence recorded in SCALE.md.

Usage: python scripts/scale_check.py q1 q2 ...
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ab_metadata_pusher_spark.plans.registry import queries  # noqa: E402
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402

SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="scale-check",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries()
    names = sys.argv[1:]
    for name in names:
        times = []
        for sf in SFS:
            # warm once (JIT/IO), measure second run
            reg[name](spark, sf).write.format("noop").mode(
                "overwrite").save()
            t0 = time.time()
            reg[name](spark, sf).write.format("noop").mode(
                "overwrite").save()
            times.append(time.time() - t0)
        a, b = times
        print(f"{name:30s} sf0.01={a:.2f}s sf0.1={b:.2f}s "
              f"ratio={b / a:.1f}x")


if __name__ == "__main__":
    main()
