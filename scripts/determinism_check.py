"""Run every registered query TWICE at the given scale factor and
compare sorted results — catches run-to-run nondeterminism that the
sf0.01 oracle gate can miss.

Motivation: the round-4 ordered.py bug (cross-job range-boundary
races corrupting NTILE buckets) was invisible at sf0.01 — range
sampling there is exhaustive, so both jobs agreed — but corrupted
results at sf0.1, varying per run. Any query whose plan evaluates a
sampled/shuffled subtree from two different jobs is exposed to the
same class. This sweep is the regression net: a query that cannot
reproduce its own output twice in a row is broken regardless of what
the oracle says.

Usage: python scripts/determinism_check.py [--sf-dir DIR] [--queries a,b]
                                            [--out DETERMINISM.json]
Exit 0 iff every query is stable. ``--out`` records the sweep as a
JSON artifact — the round-end gate commits DETERMINISM.json alongside
BENCH_LOCAL.json (see README "Round-end checklist").
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(rows) -> list:
    out = []
    for r in rows:
        vals = []
        for v in r:
            # float formatting at 12 significant digits: bitwise-equal
            # doubles compare equal, and NaN compares to itself
            if isinstance(v, float):
                vals.append(f"{v:.12g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--out", default=None, help="write the sweep result as JSON")
    args = ap.parse_args()

    from declarativeml_spark.operators.caching import capture, release_all
    from declarativeml_spark.queries import QUERIES
    from declarativeml_spark.session import get_spark

    spark = get_spark("determinism-check")
    names = (
        [q.strip() for q in args.queries.split(",") if q.strip()]
        if args.queries
        else sorted(QUERIES)
    )

    unstable = []
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            runs = []
            for _ in range(2):
                with capture() as persisted:
                    try:
                        runs.append(
                            _canon(QUERIES[name](spark, args.sf_dir).collect())
                        )
                    finally:
                        # release INSIDE the per-run scope: a crash
                        # mid-collect previously leaked the run's
                        # persisted frames into the remaining sweep
                        release_all(persisted)
            ok = runs[0] == runs[1]
        except Exception as e:  # noqa: BLE001 — a crash counts as unstable
            ok = False
            runs = [[f"EXCEPTION: {e!r}"], []]
        dt = time.perf_counter() - t0
        status = "ok" if ok else "UNSTABLE"
        print(f"[{i:3}/{len(names)}] {status:8} {name} ({dt:.1f}s)", flush=True)
        if not ok:
            unstable.append(name)
            # multiset diff: a pair differing only in duplicate-row
            # MULTIPLICITY is unstable too, and a set symmetric
            # difference printed zero diagnostic lines for it
            from collections import Counter

            ca, cb = Counter(runs[0]), Counter(runs[1])
            diffs = [
                f"{d!r} (run1 x{ca.get(d, 0)}, run2 x{cb.get(d, 0)})"
                for d in list(((ca - cb) + (cb - ca)).keys())[:4]
            ]
            for d in diffs:
                print(f"      diff: {d}", flush=True)

    print({"checked": len(names), "unstable": unstable}, flush=True)
    if args.out:
        import datetime
        import json

        with open(args.out, "w") as fh:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "checked": len(names),
                    "unstable": unstable,
                    "run_at": datetime.datetime.now(
                        datetime.timezone.utc
                    ).isoformat(timespec="seconds"),
                },
                fh,
                indent=1,
            )
            fh.write("\n")
    return 1 if unstable else 0


if __name__ == "__main__":
    sys.exit(main())
