"""Volume accounting for dedup_substring_spans across the measured
decades (r10 VERDICT ask #3).

The r10 multi-decade study measured dedup_substring_spans at
0.77 / 7.43 / 18.0 s (e1=+0.98, e2=+0.38) but — unlike containment,
whose 113M-pair check proved linear candidate volume — never counted
the operator's actual work volume.  duplicated_spans is linear BY
CONSTRUCTION (windows = sum(len - w + 1) per doc, one hash-partitioned
window count, never pairwise); this probe turns that argument into
measured numbers per decade:

* n_windows  — rows entering the window-hash exchange
* n_out      — duplicate occurrences emitted (the query's output)
* n_dup_keys — distinct duplicated window hashes

If all three grow ~10x per decade, time growth is volume-linear and
any exponent near +1.0 on a fixed-core box is saturation, not a
super-linear plan.

Usage:
    python scripts/substring_volume_probe.py \
        --dirs .scratch/scaled/x1,.scratch/scaled/x10,.scratch/scaled/x100
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ab_metadata_pusher_spark.operators.dedup import duplicated_spans  # noqa: E402
from ab_metadata_pusher_spark.operators.text import tokens  # noqa: E402
from ab_metadata_pusher_spark.session import get_spark  # noqa: E402
from ab_metadata_pusher_spark.sources.fixtures import load_table  # noqa: E402

W = 10  # the registry query's window width (plans/llm_queries.py)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs",
                    default=".scratch/scaled/x1,.scratch/scaled/x10,"
                            ".scratch/scaled/x100")
    args = ap.parse_args()
    dirs = [str(REPO / d) if not d.startswith("/") else d
            for d in args.dirs.split(",")]
    spark = get_spark(app_name="substring-volume-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    prev = None
    for d in dirs:
        docs = load_table(spark, d, "documents").select("doc_id", "text")
        n_windows = docs.select(
            F.sum(F.greatest(F.size(tokens("text")) - (W - 1), F.lit(0)))
            .alias("n")).first()["n"]
        spans = duplicated_spans(docs, w=W)
        agg = spans.agg(
            F.count(F.lit(1)).alias("n_out"),
            F.countDistinct("window_md5").alias("n_dup_keys")).first()
        row = (n_windows, agg["n_out"], agg["n_dup_keys"])
        ratios = ("" if prev is None else "  ratios " + " ".join(
            f"{b / a:.2f}x" for a, b in zip(prev, row)))
        print(f"{Path(d).name:6s} n_windows={row[0]:>12,} "
              f"n_out={row[1]:>12,} n_dup_keys={row[2]:>12,}{ratios}",
              flush=True)
        prev = row


if __name__ == "__main__":
    main()
