"""Scaling legs over the GENERATED large fixtures (r11 verdict #2).

scripts/scaling_curve.py measures the driver legs (sf0.001-0.1),
where 121/212 queries sit on job-launch/compile floors and persists
measure as a wash. This sweeps a query list across the
gen_fixtures.py legs (default sf0.1 / sf0.3 / sf1 — a full decade
above the driver's bench SF, generator-consistent so exponents never
mix generators) and writes docs/SCALING_BIG.md.

alpha = log10(time ratio) / log10(data ratio) per step; <= ~1 is
linear-or-better. Methodology matches scaling_curve.py (capture/
release per run, one JVM, warmup query first), plus an optional
--laps N keeping the median so one-shot host spikes don't fabricate
exponents.

Usage:
  python scripts/scaling_big.py [--sfs sf0.1,sf0.3,sf1] [--laps 2] q1,q2,...
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from declarativeml_spark.operators.caching import capture, release_all
    from declarativeml_spark.queries import QUERIES as REGISTRY
    from declarativeml_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.environ.get(
        "SPARK_GRAFT_BIG_ROOT", "/root/testdata_big"))
    ap.add_argument("--sfs", default="sf0.1,sf0.3,sf1")
    ap.add_argument("--laps", type=int, default=1)
    ap.add_argument("--no-doc", action="store_true",
                    help="print JSON rows only, leave SCALING_BIG.md alone")
    ap.add_argument("queries")
    args = ap.parse_args()

    sfs = [s.strip() for s in args.sfs.split(",") if s.strip()]
    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    spark = get_spark("scaling-big")
    REGISTRY[names[0]](spark, os.path.join(args.root, sfs[0])).count()  # warm

    def sf_value(s: str) -> float:
        return float(s[2:])

    rows = []
    for name in names:
        times: dict[str, float] = {}
        failed = False
        for sf in sfs:
            laps = []
            for lap in range(max(1, args.laps)):
                spark.sparkContext.setJobDescription(f"{name}@{sf}:{lap}")
                t0 = time.perf_counter()
                try:
                    with capture() as persisted:
                        try:
                            REGISTRY[name](
                                spark, os.path.join(args.root, sf)
                            ).count()
                        finally:
                            release_all(persisted)
                except Exception as e:  # noqa: BLE001 — keep the sweep alive
                    print(json.dumps({"query": name, "sf": sf,
                                      "error": repr(e)[:200]}), flush=True)
                    failed = True
                    break
                laps.append(time.perf_counter() - t0)
            if failed:
                break
            times[sf] = round(statistics.median(laps), 3)
        if failed:
            continue
        rec = {"query": name, **times}
        for lo, hi in zip(sfs, sfs[1:]):
            dec = math.log10(sf_value(hi) / sf_value(lo))
            rec[f"alpha_{lo}_{hi}"] = round(
                math.log10(max(times[hi], 1e-3) / max(times[lo], 1e-3)) / dec,
                2,
            )
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    if not args.no_doc:
        doc = os.path.join(os.path.dirname(__file__), "..", "docs",
                           "SCALING_BIG.md")
        alpha_cols = [f"alpha_{lo}_{hi}" for lo, hi in zip(sfs, sfs[1:])]
        with open(doc, "w") as f:
            f.write(
                "# Scale-factor sensitivity on the GENERATED large legs\n\n"
                "gen_fixtures.py data (distributions mimic the driver's,\n"
                "generator-consistent across these legs), local[32], one\n"
                "JVM, median of --laps runs. `alpha` is the empirical\n"
                "scaling exponent per step, normalized per decade; <= ~1\n"
                "is linear-or-better, ~2 means quadratic. Regenerate with\n"
                "`python scripts/scaling_big.py <queries>`.\n\n"
                "| query | " + " | ".join(sfs) + " | "
                + " | ".join(f"α({lo}→{hi})" for lo, hi in zip(sfs, sfs[1:]))
                + " |\n"
                "|" + "---|" * (1 + len(sfs) + len(alpha_cols)) + "\n"
            )
            for r in rows:
                f.write(
                    "| " + r["query"] + " | "
                    + " | ".join(f"{r[sf]}s" for sf in sfs) + " | "
                    + " | ".join(str(r[c]) for c in alpha_cols) + " |\n"
                )
        print(f"wrote {doc} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
