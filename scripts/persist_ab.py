"""A/B the scale-motivated persists at a larger SF (r11 verdict #2).

Round 11 added `track_persist` on small reused planes in ~22 queries
(OPTIMIZATION_r11.md items 7/11/12). At sf0.1 those persists measure
as a WASH — 32 idle local cores execute duplicate subtrees in
parallel for free — so the claim that each duplicate subtree is an
extra full data pass at scale rested on plan evidence alone. This
harness measures each query at a larger SF twice per lap:

* ``persist=on``  — the shipped code;
* ``persist=off`` — ``operators.caching.track_persist`` monkeypatched
  to identity for the duration of the run, i.e. the pre-r11
  unpersisted shape (duplicate consumers re-execute their upstream).

track_persist is a performance wrapper only — every
correctness-critical materialization in the repo uses
``persist()``/``localCheckpoint`` directly (ordered.py's frozen
ranges, the iterative loops), so the off-mode changes cost, never
values; each lap's row count is asserted equal across modes anyway.

Laps are interleaved (on, off, on, off, ...) so host drift lands on
both modes; the first lap of each mode is discarded as warmup when
laps >= 3. Prints one JSON line per query with the kept medians.

Usage:
  python scripts/persist_ab.py --sf-dir /root/testdata_big/sf1 \
      --laps 3 q1,q2,...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata_big/sf1")
    ap.add_argument("--laps", type=int, default=3)
    ap.add_argument("queries")
    args = ap.parse_args()

    from declarativeml_spark.operators import caching
    from declarativeml_spark.operators.caching import capture, release_all
    from declarativeml_spark.queries import QUERIES
    from declarativeml_spark.session import get_spark

    spark = get_spark("persist-ab")
    real_track = caching.track_persist

    def identity(df):
        return df

    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    for name in names:
        fn = QUERIES[name]
        times: dict[str, list[float]] = {"on": [], "off": []}
        rows: dict[str, int] = {}
        for lap in range(args.laps):
            for mode in ("on", "off"):
                caching.track_persist = real_track if mode == "on" else identity
                # query modules import track_persist by name at call
                # time from operators.caching in most sites, but a few
                # bind it at module import — patch those too
                patched = []
                if mode == "off":
                    for mod in list(sys.modules.values()):
                        if getattr(mod, "track_persist", None) is real_track:
                            mod.track_persist = identity
                            patched.append(mod)
                try:
                    spark.sparkContext.setJobDescription(f"{name}:{mode}:{lap}")
                    t0 = time.perf_counter()
                    with capture() as p:
                        n = fn(spark, args.sf_dir).count()
                    release_all(p)
                    dt = time.perf_counter() - t0
                finally:
                    caching.track_persist = real_track
                    for mod in patched:
                        mod.track_persist = real_track
                times[mode].append(dt)
                prev = rows.setdefault(mode, n)
                if prev != n:
                    raise AssertionError(
                        f"{name}: row count changed across laps ({prev} vs {n})"
                    )
                print(
                    f"# {name} {mode} lap{lap}: {dt:.3f}s ({n} rows)",
                    file=sys.stderr, flush=True,
                )
        if rows["on"] != rows["off"]:
            raise AssertionError(
                f"{name}: row count differs across modes: {rows}"
            )
        kept = {
            m: (ts[1:] if args.laps >= 3 else ts) for m, ts in times.items()
        }
        out = {
            "query": name,
            "sf_dir": args.sf_dir,
            "rows": rows["on"],
            "on_median_s": round(statistics.median(kept["on"]), 3),
            "off_median_s": round(statistics.median(kept["off"]), 3),
            "on_all": [round(t, 3) for t in times["on"]],
            "off_all": [round(t, 3) for t in times["off"]],
        }
        out["off_over_on"] = round(
            out["off_median_s"] / out["on_median_s"], 3
        ) if out["on_median_s"] else None
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
