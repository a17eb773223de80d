"""Mirror the driver's correctness gate exactly: every `queries()` entry
with an `oracle_sql()` entry, run at sf0.01, compared via the same
row-count + schema + order-insensitive value check.

Usage: python scripts/verify_local.py [--sf-dir DIR] [--queries a,b,c]

Exit code 0 iff every checked query matches. Run this before ending a
round — CORRECTNESS_r{N}.json should hold no surprises.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    # The same import the driver performs — if this raises, the round
    # scores zero, so fail loudly here first.
    entry = importlib.import_module("__spark_entry__")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    from declarativeml_spark.session import get_spark
    from declarativeml_spark.testing import compare_query

    spark = get_spark("verify-local")

    names = (
        [q.strip() for q in args.queries.split(",") if q.strip()]
        if args.queries
        else [n for n in queries if n in oracles]
    )

    failures = []
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            r = compare_query(spark, name, queries[name], oracles[name], args.sf_dir)
            ok, notes = r.ok, r.notes
        except Exception as e:  # a crash is a red row in the driver too
            ok, notes = False, [f"EXCEPTION: {e!r}"]
        dt = time.perf_counter() - t0
        status = "ok" if ok else "FAIL"
        print(f"[{i:3}/{len(names)}] {status:4} {name} ({dt:.1f}s)", flush=True)
        if not ok:
            failures.append((name, notes))
            for n in notes[:3]:
                print(f"      {n}", flush=True)

    print(json.dumps({"checked": len(names), "failed": len(failures),
                      "failures": [f[0] for f in failures]}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
