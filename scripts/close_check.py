"""Mechanical post-close guard (r9 VERDICT ask #4).

The repo rule is: ANY product change after the recorded close-out
verification stack re-triggers the stack.  r9 violated it once
(fc52311 landed 3 minutes after the recorded stack), so the rule is
now code instead of checklist prose:

* ``--record`` — run AFTER the closing verification stack passes.
  Snapshots the git TREE HASHES of every product surface
  (``ab_metadata_pusher_spark/``, ``__spark_entry__.py``,
  ``bench.py``) into ``CLOSECHECK.json``.  Refuses to record if any
  product path has uncommitted changes (the stack must have run on
  committed state).
* ``--check`` (default) — recomputes the hashes and fails if any
  product surface differs from the recorded snapshot (committed OR
  uncommitted drift).  The judge can run this at HEAD: exit 0 proves
  the last verification stack covered exactly the shipped product
  tree.

The snapshot is content-addressed (tree/blob hashes), so commit
reordering, message edits, and non-product commits (docs, scripts,
records) never trip it.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
RECORD = REPO / "CLOSECHECK.json"
PRODUCT = ("ab_metadata_pusher_spark", "__spark_entry__.py", "bench.py")


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, check=True,
                          capture_output=True, text=True).stdout.strip()


def _dirty_product_paths() -> list[str]:
    out = _git("status", "--porcelain", "--", *PRODUCT)
    return [line for line in out.splitlines() if line.strip()]


def _snapshot() -> dict[str, str]:
    return {path: _git("rev-parse", f"HEAD:{path}") for path in PRODUCT}


def main() -> int:
    record_mode = "--record" in sys.argv[1:]
    dirty = _dirty_product_paths()
    if record_mode:
        if dirty:
            print("REFUSING to record: uncommitted product changes —")
            print("\n".join(dirty))
            return 1
        snap = {"hashes": _snapshot(), "recorded_at": _git(
            "rev-parse", "HEAD")}
        RECORD.write_text(json.dumps(snap, indent=2) + "\n")
        print(f"recorded product tree hashes at {snap['recorded_at'][:9]} "
              f"-> {RECORD.name}")
        print("commit this file as the LAST commit touching the product.")
        return 0

    if not RECORD.exists():
        print(f"{RECORD.name} missing — run --record at close.")
        return 1
    rec = json.loads(RECORD.read_text())
    now = _snapshot()
    stale = [p for p in PRODUCT if now[p] != rec["hashes"].get(p)]
    if stale or dirty:
        for p in stale:
            print(f"PRODUCT CHANGED since recorded close-out: {p} "
                  f"({rec['hashes'].get(p, 'none')[:9]} -> {now[p][:9]})")
        for line in dirty:
            print(f"UNCOMMITTED product change: {line}")
        print("re-run the closing verification stack, then --record.")
        return 1
    print(f"close-check OK: product tree matches the close-out recorded "
          f"at {rec['recorded_at'][:9]}.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
