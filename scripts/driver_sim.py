"""Simulate the driver's verify: smoke entry() at sf0.001, then run every
queries() entry at sf0.01 against its oracle_sql() via DuckDB and report
row-count / column / value matches (order-insensitive, like the driver).

Usage: python scripts/driver_sim.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import importlib.util
import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


STRICT_TYPES = False


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v) if STRICT_TYPES else v
    if isinstance(v, float):
        r = "NaN" if math.isnan(v) else round(v, 6)
        # strict: a float cell and an int cell with equal value (0 vs 0.0)
        # hash-differ in the driver's stringifying comparator — surface it.
        return ("f", r) if STRICT_TYPES else r
    if isinstance(v, int):
        return ("i", v) if STRICT_TYPES else v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if type(v).__name__ == "Decimal":
        return ("d", str(v)) if STRICT_TYPES else float(v)
    return v


def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--smoke-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--strict-types", action="store_true",
                    help="treat int/float/Decimal cells of equal value as "
                         "mismatching (models a stringifying hasher)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    global STRICT_TYPES
    STRICT_TYPES = args.strict_types

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from ab_metadata_pusher_spark.session import get_spark
    spark = get_spark(app_name="driver-sim")
    spark.sparkContext.setLogLevel("ERROR")

    df = m.entry(spark)
    n = df.count()
    print(f"SMOKE entry(): rows={n} schema={df.columns}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    # Under the lazy-persist default (operators/_shared.py), every query
    # with a shared self-join stream registers a cache entry; one
    # 239-query session would accumulate them all without this release.
    from ab_metadata_pusher_spark.operators._shared import (
        release_materialized,
    )

    qs, oracles = m.queries(), m.oracle_sql()
    names = args.names or sorted(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        finally:
            release_materialized(spark)
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"WEAK  {name}: rows={len(s_rows)} (no oracle, rows-only check)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols, d_rows = list(rel.columns), [tuple(r) for r in rel.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            failures += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            failures += 1
        elif norm(s_cols, s_rows) != norm(d_cols, d_rows):
            sn, dn = norm(s_cols, s_rows), norm(d_cols, d_rows)
            diff = next(i for i, (a, b) in enumerate(zip(sn, dn)) if a != b)
            print(f"FAIL  {name}: value mismatch at sorted-row {diff}:\n"
                  f"      spark={sn[diff]}\n      duck ={dn[diff]}")
            failures += 1
        else:
            # engine vs oracle split: "spark N.NNs + duck N.NNs" — a slow
            # OK row is usually the DuckDB oracle (e.g. the brute-force
            # levenshtein enumeration), not the plan under test
            print(f"OK    {name}: rows={len(s_rows)} ({dt:.2f}s = "
                  f"spark {t_spark:.2f}s + duck {dt - t_spark:.2f}s)")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: "
          f"{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
