"""Hostile-environment sweep matrix (round-7 hardening, r6 VERDICT #5).

Runs the full oracled-query surface under environments a third-party
driver harness could legitimately present, one subprocess per variant
(a JVM locale/option change needs a fresh JVM):

* ``plain``     — plain SparkSession + TZ=America/New_York (the r6 sweep)
* ``locale``    — + JVM default locale tr-TR (the dotted/dotless-i trap
  for anything that lowercases through the JVM default locale) and
  LC_ALL=tr_TR.UTF-8 for the Python workers
* ``ansi``      — + spark.sql.ansi.enabled=true (strict casts, overflow
  and div-by-zero errors; catches silent-null dependencies)
* ``narrow``    — + spark.sql.shuffle.partitions=4 (a cluster tuned far
  below our session default; catches partition-count-dependent results)
* ``nocodegen`` — + spark.sql.codegen.wholeStage=false (interpreted
  expression eval; catches results that silently depend on codegen
  evaluation order / codegen-only expression semantics — r8 VERDICT
  ask #8)

Usage: python scripts/hostile_env_sweep.py [--sf-dir DIR] [variant ...]

Prints one summary line per variant and exits non-zero if any fails.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

VARIANTS: dict[str, dict] = {
    "plain": {"env": {}, "conf": []},
    "locale": {
        "env": {"LC_ALL": "tr_TR.UTF-8", "LANG": "tr_TR.UTF-8"},
        "conf": [
            "spark.driver.extraJavaOptions="
            "-Duser.language=tr -Duser.country=TR",
        ],
    },
    "ansi": {"env": {}, "conf": ["spark.sql.ansi.enabled=true"]},
    "narrow": {"env": {}, "conf": ["spark.sql.shuffle.partitions=4"]},
    "nocodegen": {"env": {},
                  "conf": ["spark.sql.codegen.wholeStage=false"]},
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("variants", nargs="*", default=None)
    args = ap.parse_args()
    picks = args.variants or list(VARIANTS)

    overall = 0
    for name in picks:
        spec = VARIANTS[name]
        env = {**os.environ, **spec["env"]}
        cmd = [sys.executable, str(REPO / "scripts/plain_driver_check.py"),
               "--sf-dir", args.sf_dir]
        for c in spec["conf"]:
            cmd += ["--conf", c]
        print(f"=== variant {name}: env={spec['env']} conf={spec['conf']}",
              flush=True)
        proc = subprocess.run(cmd, env=env, cwd=REPO,
                              capture_output=True, text=True)
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith(("FAIL", "EXC", "PASS", "CONF"))]
        for ln in lines:
            print(f"[{name}] {ln}", flush=True)
        if proc.returncode != 0:
            overall = 1
            tail = proc.stderr.strip().splitlines()[-5:]
            for ln in tail:
                print(f"[{name}] stderr: {ln}", flush=True)
    print(f"SWEEP {'PASS' if overall == 0 else 'FAIL'} across "
          f"{len(picks)} variants")
    return overall


if __name__ == "__main__":
    raise SystemExit(main())
