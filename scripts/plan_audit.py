"""Audit the physical plan of every registered query for scale
anti-patterns.

Flags per query:
* ``BatchEvalPython`` — row-at-a-time Python UDF in the plan (the
  slow path; should be zero everywhere);
* ``CartesianProduct`` — unbounded pair blow-up;
* ``BroadcastNestedLoopJoin`` — acceptable only when the broadcast
  side is provably tiny (theta joins); review any new occurrence;
* ``SortMergeJoin`` — fine per se, but at local test scale every dim
  join should have resolved to broadcast, so new SMJs deserve a look;
* partition-less window (``Exchange SinglePartition`` feeding a
  ``Window``) — a global sort funneling all rows through ONE task;
  counts as a failure like BatchEvalPython (use
  operators/ordered.py's two-phase rank/ntile/cumsum instead);
* exchange count — shuffles + broadcasts; watch for jumps.

Usage: python scripts/plan_audit.py [--sf-dir DIR] [--fail-on-python]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = [
    "BatchEvalPython",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "ArrowEvalPython",
]


def partitionless_windows(plan: str) -> int:
    """Count Window nodes with NO partition spec in a formatted plan.

    A ``(n) Window`` node detail line reads
    ``Arguments: [funcs], [partitionCols], [orderCols]`` when
    partitioned but only ``Arguments: [funcs], [orderCols]`` when
    global — so two top-level bracket groups instead of three marks
    the single-task global sort.
    """
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if not re.match(r"\(\d+\) Window\b", line.strip()):
            continue
        for j in range(i + 1, min(i + 8, len(lines))):
            arg = lines[j].strip()
            if not arg.startswith("Arguments:"):
                continue
            depth = groups = 0
            for ch in arg:
                if ch == "[":
                    if depth == 0:
                        groups += 1
                    depth += 1
                elif ch == "]":
                    depth -= 1
            if groups == 2:
                hits += 1
            break
    return hits


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--fail-on-python",
        action="store_true",
        help="exit 1 if any plan contains a row-at-a-time Python UDF",
    )
    args = ap.parse_args()

    from declarativeml_spark.queries import QUERIES
    from declarativeml_spark.session import get_spark

    spark = get_spark("plan-audit", cpus="8")
    bad = 0
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # keep auditing the rest
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        flags = [
            f"{m}x{plan.count(m)}" for m in MARKERS if plan.count(m)
        ]
        pw = partitionless_windows(plan)
        if pw:
            flags.append(f"GlobalWindowx{pw}")
        if "BatchEvalPython" in plan or pw:
            bad += 1
        print(f"{name}: exchanges={plan.count('Exchange')} {' '.join(flags)}")
    if args.fail_on_python and bad:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
