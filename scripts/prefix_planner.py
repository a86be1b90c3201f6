"""Plan the next round's DRIVER_PREFIX rotation.

The driver scores a bounded prefix of ``queries()`` per round; evidence
is cumulative across rounds, so each round should keep a small sentinel
core and rotate every other slot to oracle-backed queries that have
never had a driver row.  This script reports, from the CORRECTNESS_r*
records present in the repo:

* which registered queries have driver evidence (and from which round),
* which oracle-backed queries have NEVER been scored (rotation pool),
* whether the current DRIVER_PREFIX wastes slots on already-scored
  non-sentinel queries.

Usage: python scripts/prefix_planner.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ab_metadata_pusher_spark.plans.registry import (  # noqa: E402
    DRIVER_PREFIX, REGISTRY, _load_all,
)

#: Slots intentionally re-scored every round (reference-parity core +
#: one representative per family).  Everything else in the prefix should
#: be a first-time-scored query.
SENTINELS = set(DRIVER_PREFIX[:15])

#: Deliberate re-proof slots (round 7): the never-scored pool shrank to
#: 28 < 35 rotation slots, so the remainder re-scores the r5/r6 repairs
#: at driver conditions.  Not "wasted" — each re-proves a specific fix
#: (PassJoin edit-distance, exchange-free LPA, UTF-8 envelope chunking,
#: the keep_emb Lloyd path, capped link prediction, Count-Min, the ANN
#: label screen).
REPROOF = {
    "dedup_edit_distance", "graph_label_propagation",
    "sink_envelope_chunking", "similarity_ann_ivf",
    "graph_link_prediction_capped", "agg_countmin_sketch",
    "quality_label_consistency_ann",
}

#: The driver's correctness gate scores this many queries() entries per
#: round (observed width of every CORRECTNESS_r* record).  Names beyond
#: this position are ordering, not scored slots — they must not count
#: as "wasted".
SCORED_WINDOW = 50


def main() -> int:
    _load_all()
    scored: dict[str, str] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        try:
            rec = json.loads(path.read_text())
        except Exception:  # noqa: BLE001
            continue
        if isinstance(rec, dict):
            for name, row in rec.items():
                if isinstance(row, dict) and not row.get("err"):
                    if all(row.get(k) for k in
                           ("rows_match", "schema_match", "hash_match")):
                        scored.setdefault(name, path.name)

    oracle_backed = [n for n, s in REGISTRY.items() if s.oracle]
    pool = [n for n in oracle_backed if n not in scored]
    wasted = [n for n in DRIVER_PREFIX[:SCORED_WINDOW]
              if n in scored and n not in SENTINELS and n not in REPROOF]

    print(f"registered={len(REGISTRY)} oracle_backed={len(oracle_backed)} "
          f"driver_green_ever={len(scored)}")
    print(f"rotation pool (oracle-backed, never driver-scored): {len(pool)}")
    for n in pool:
        print(f"  {n}")
    if wasted:
        print(f"prefix slots re-scoring non-sentinel already-green queries "
              f"({len(wasted)} — rotate these next round):")
        for n in wasted:
            print(f"  {n}")
    else:
        print("prefix wastes no slots (every non-sentinel is first-time).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
