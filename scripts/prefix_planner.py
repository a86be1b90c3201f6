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

Usage: python scripts/prefix_planner.py [--skip-tests]

By default the planner finishes by running tests/test_registry.py —
planning a rotation and verifying its invariants are one command (the
r8 rotation shipped red because the test run was a separate checklist
item).  --skip-tests is for read-only analysis iterations.
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

#: Deliberate re-proof slots: below-gate normalized drifts scheduled
#: for settling in the driver's own session (the LPA precedent: r9
#: drift -> r10 re-proof slot -> driver-normalized 1.06x, closed).
#: r11's trio (quality_label_consistency_ann, orders_basket_lift,
#: dedup_substring_spans) all closed green in the r11 driver record —
#: r12 carries no open drift, so the set is empty and all 35
#: non-sentinel slots are freshness.
REPROOF: set[str] = set()

#: The driver's correctness gate scores this many queries() entries per
#: round (observed width of every CORRECTNESS_r* record).  Names beyond
#: this position are ordering, not scored slots — they must not count
#: as "wasted".
SCORED_WINDOW = 50

#: Heavy forms banned from the scored window by policy (their capped /
#: trained counterparts are scored instead; tests/test_registry.py
#: test_scored_window_excludes_bench_excluded_heavy_forms pins this).
#: They must never be reported as stale freshness candidates.
WINDOW_BANNED = {"graph_link_prediction", "text_bpe_train"}


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tests", action="store_true")
    args = ap.parse_args()
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

    latest: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        try:
            rec = json.loads(path.read_text())
        except Exception:  # noqa: BLE001
            continue
        rnd = int("".join(ch for ch in path.stem if ch.isdigit()) or 0)
        if isinstance(rec, dict):
            for name in rec:
                latest[name] = max(latest.get(name, 0), rnd)

    oracle_backed = [n for n, s in REGISTRY.items() if s.oracle]
    pool = [n for n in oracle_backed if n not in scored]

    print(f"registered={len(REGISTRY)} oracle_backed={len(oracle_backed)} "
          f"driver_green_ever={len(scored)}")
    print(f"rotation pool (oracle-backed, never driver-scored): {len(pool)}")
    for n in pool:
        print(f"  {n}")

    unscheduled_pool = [n for n in pool
                        if n not in DRIVER_PREFIX[:SCORED_WINDOW]]
    if unscheduled_pool:
        # Never-scored queries exist AND are not in the window: any
        # prefix slot re-scoring an already-green non-sentinel is a
        # wasted slot.  (A pool entry already inside the window is fine
        # — the remaining slots rightly hold freshness rotations.)
        wasted = [n for n in DRIVER_PREFIX[:SCORED_WINDOW]
                  if n in scored and n not in SENTINELS and n not in REPROOF]
        print(f"UNSCHEDULED never-scored queries ({len(unscheduled_pool)}):")
        for n in unscheduled_pool:
            print(f"  {n}")
        if wasted:
            print(f"prefix slots re-scoring non-sentinel already-green "
                  f"queries ({len(wasted)} — swap for the unscheduled "
                  f"pool next round):")
            for n in wasted:
                print(f"  {n}")
        return 0 if args.skip_tests else _run_registry_tests()
    if pool:
        print("all never-scored queries are scheduled in the window; "
              "remaining slots fall through to the freshness policy.")

    # Registry cleared (r7): the policy becomes re-proof + FRESHNESS —
    # rotation slots should hold the queries whose latest driver row is
    # oldest.  A slot is stale only if some unscheduled query has
    # strictly older evidence than the newest evidence inside the
    # window's freshness slots.
    window = [n for n in DRIVER_PREFIX[:SCORED_WINDOW]
              if n not in SENTINELS and n not in REPROOF]
    outside = [n for n in oracle_backed
               if n not in DRIVER_PREFIX[:SCORED_WINDOW]
               and n not in WINDOW_BANNED]
    newest_in = max((latest.get(n, 0) for n in window), default=0)
    older_out = sorted(n for n in outside
                       if latest.get(n, 99) < newest_in)
    print(f"freshness window: {len(window)} rotation slots, latest "
          f"evidence rounds "
          f"{sorted({latest.get(n, 0) for n in window})}")
    if older_out:
        print(f"STALE: {len(older_out)} unscheduled queries have older "
              f"evidence than a scheduled freshness slot:")
        for n in older_out:
            print(f"  {n} (r{latest.get(n)})")
    else:
        print("freshness optimal: no unscheduled query has older evidence "
              "than any scheduled freshness slot.")
    return 0 if args.skip_tests else _run_registry_tests()


def _run_registry_tests() -> int:
    """Any prefix edit must keep the registry invariants green — the r8
    rotation shipped with tests/test_registry.py red because this step
    was a checklist item instead of code (r8 VERDICT ask #1).  Planning
    a rotation and verifying it are now the same command."""
    import subprocess
    print("\nrunning pytest tests/test_registry.py (rotation invariants)…")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_registry.py", "-q",
         "--no-header", "-x"], cwd=REPO)
    if proc.returncode != 0:
        print("REGISTRY TESTS RED — fix before committing the rotation.")
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
