"""Snapshot the previous round's bench record as the fixed regression
baseline (BENCH_BASELINE.json).

Run ONCE at round start, before any bench.py invocation of the new
round:

    python scripts/snapshot_bench_baseline.py --round N [--commit SHA]

It copies the current BENCH_DETAIL.json — which at round start is the
previous round's final (driver-recorded) per-query map — into
BENCH_BASELINE.json with provenance fields.  bench.py then compares
every run of the new round against this frozen file; in-round
BENCH_DETAIL.json refreshes can no longer rebaseline the gate (the r4
failure mode: "Refresh the bench baseline" commits silently absorbed
cumulative slowdowns).

Refuses to overwrite a baseline that already names the same round, so
an accidental second invocation mid-round is a no-op.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True,
                    help="the PREVIOUS round number the snapshot captures")
    ap.add_argument("--commit", default=None,
                    help="commit of the source BENCH_DETAIL.json "
                         "(default: current HEAD short sha)")
    args = ap.parse_args()

    src = REPO / "BENCH_DETAIL.json"
    dst = REPO / "BENCH_BASELINE.json"
    rec = json.loads(src.read_text())
    if not rec.get("queries"):
        print(f"refusing: {src} has no per-query map", file=sys.stderr)
        return 1
    if dst.exists():
        cur = json.loads(dst.read_text())
        if cur.get("_round") == args.round:
            print(f"no-op: {dst} already snapshots round {args.round}")
            return 0
    commit = args.commit or subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True).stdout.strip()
    out = {
        "_provenance": (
            f"Round-{args.round} bench (BENCH_DETAIL.json as of commit "
            f"{commit}), snapshotted at round-{args.round + 1} start as the "
            "FIXED regression baseline: bench.py compares against this "
            "file, never against a same-round BENCH_DETAIL.json refresh.  "
            "Update policy: overwrite only at round start via "
            "scripts/snapshot_bench_baseline.py."),
        "_round": args.round,
        "_commit": commit,
        **rec,
    }
    dst.write_text(json.dumps(out, indent=1))
    print(f"wrote {dst} (r{args.round}@{commit}, "
          f"{len(rec['queries'])} queries, sf={rec.get('sf')})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
