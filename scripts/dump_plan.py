"""Dump ``explain("formatted")`` for named queries to files — the
plan-evidence artifacts the optimization rounds commit under
``plans/r<N>/``.

Usage: python scripts/dump_plan.py --out-dir plans/r11 --suffix after \
           [--sf-dir DIR] q1,q2,...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default="plans/r11")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("queries")
    args = ap.parse_args()

    from declarativeml_spark.queries import QUERIES
    from declarativeml_spark.session import get_spark

    spark = get_spark("dump-plan")
    os.makedirs(args.out_dir, exist_ok=True)
    for name in [q.strip() for q in args.queries.split(",") if q.strip()]:
        df = QUERIES[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
