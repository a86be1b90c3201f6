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
* ``--stack --round N`` — (r11 VERDICT ask #1: make the gate
  BINDING) runs the entire closing verification stack itself —
  pytest, bench.py, the driver_sim scored window strict at sf0.01
  AND sf0.1, plain_driver_check, explain_audit --write-plans N —
  and records ONLY if every stage exits 0.  Verify-and-record is
  one command, so a last-minute product commit can no longer slip
  between a manually-run stack and the record (the r11 failure
  mode: the final IVF commit landed after the recorded stack).

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


def _record() -> int:
    dirty = _dirty_product_paths()
    if dirty:  # re-check: the stack takes ~1 h; product must not drift
        print("REFUSING to record: uncommitted product changes —")
        print("\n".join(dirty))
        return 1
    snap = {"hashes": _snapshot(), "recorded_at": _git("rev-parse", "HEAD")}
    RECORD.write_text(json.dumps(snap, indent=2) + "\n")
    print(f"recorded product tree hashes at {snap['recorded_at'][:9]} "
          f"-> {RECORD.name}")
    print("commit this file as the LAST commit touching the product.")
    return 0


def _run_stack(round_n: int) -> int:
    """Run the full closing verification stack; 0 only if ALL pass.

    The product tree hashes are PINNED before stage 1 (r12 ADVICE): the
    stack takes ~1 h, and _record()'s dirty-only recheck cannot see a
    product COMMIT landing mid-stack — the record would then bless the
    new tree even though earlier stages ran the old one (the exact r11
    slip the gate exists to prevent).  Any drift between the pinned and
    final hashes refuses the record."""
    pinned = _snapshot()
    from ab_metadata_pusher_spark.plans.registry import (  # noqa: PLC0415
        DRIVER_PREFIX,
    )
    window = list(DRIVER_PREFIX[:50])
    py = sys.executable
    stages: list[tuple[str, list[str]]] = [
        ("pytest", [py, "-m", "pytest", "tests/", "-q"]),
        ("bench", [py, "bench.py"]),
        ("driver_sim sf0.01 strict",
         [py, "scripts/driver_sim.py", "--strict-types", *window]),
        ("driver_sim sf0.1 strict",
         [py, "scripts/driver_sim.py", "--strict-types",
          "--sf-dir", "/root/testdata/sf0.1", *window]),
        ("plain_driver_check", [py, "scripts/plain_driver_check.py"]),
        ("explain_audit",
         [py, "scripts/explain_audit.py", "--write-plans", str(round_n)]),
    ]
    for name, cmd in stages:
        print(f"== stack stage: {name}", flush=True)
        rc = subprocess.run(cmd, cwd=REPO).returncode
        if rc != 0:
            print(f"STACK STAGE FAILED ({name}, rc={rc}) — not recording.")
            return rc
    now = _snapshot()
    drifted = [p for p in PRODUCT if pinned[p] != now[p]]
    if drifted:
        print("REFUSING to record: product tree changed mid-stack —")
        for p in drifted:
            print(f"  {p}: {pinned[p][:9]} -> {now[p][:9]}")
        print("re-run --stack on the final tree.")
        return 1
    print("== stack green — recording.")
    return _record()


def main() -> int:
    argv = sys.argv[1:]
    record_mode = "--record" in argv
    stack_mode = "--stack" in argv
    dirty = _dirty_product_paths()
    if stack_mode:
        if dirty:
            print("REFUSING stack: uncommitted product changes —")
            print("\n".join(dirty))
            return 1
        if "--round" not in argv:
            print("--stack requires --round N (for explain_audit)")
            return 1
        try:  # r12 ADVICE: a missing/non-numeric value crashed with an
            # unhandled IndexError/ValueError instead of the usage line
            round_n = int(argv[argv.index("--round") + 1])
        except (IndexError, ValueError):
            print("--stack requires --round N (for explain_audit)")
            return 1
        sys.path.insert(0, str(REPO))
        return _run_stack(round_n)
    if record_mode:
        if dirty:
            print("REFUSING to record: uncommitted product changes —")
            print("\n".join(dirty))
            return 1
        return _record()

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
