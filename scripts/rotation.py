#!/usr/bin/env python
"""Compute the driver-window rotation from the CORRECTNESS artifacts.

The driver's correctness gate only checks the FIRST 50 entries of
``__spark_entry__.queries()`` each round, so the window must rotate:
fresh greens move to the back, the stalest greens (most rounds since
their last driver-green row) move to the front, and never-checked
additions lead.  Doing this by hand each round is the repo's one
recurring process risk (judge, round 6) — this script makes it
mechanical.

Usage:
    python scripts/rotation.py            # report cohorts
    python scripts/rotation.py --emit     # print the two code blocks

It does NOT rewrite ``__spark_entry__.py`` (the additions section is
hand-curated as queries land mid-round); paste the emitted blocks.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _greens(path: str) -> set[str]:
    with open(path) as fh:
        data = json.load(fh)
    out = set()
    for name, row in data.items():
        if not isinstance(row, dict):
            continue
        ok = (
            row.get("rows_match")
            and row.get("schema_match", True)
            and row.get("hash_match") is not False
        )
        if ok:
            out.add(name)
    return out


def load_rounds() -> dict[int, set[str]]:
    rounds: dict[int, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rounds[int(m.group(1))] = _greens(path)
    return rounds


def cohorts(rounds: dict[int, set[str]]) -> dict[int, list[str]]:
    """Map each query to the round of its LAST green row."""
    last: dict[str, int] = {}
    for rnd in sorted(rounds):
        for name in rounds[rnd]:
            last[name] = rnd
    by_round: dict[int, list[str]] = {}
    for name, rnd in last.items():
        by_round.setdefault(rnd, []).append(name)
    return {rnd: sorted(names) for rnd, names in by_round.items()}


def registry_names() -> set[str]:
    sys.path.insert(0, REPO)
    from declarativeml_spark.queries import QUERIES

    return set(QUERIES)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit", action="store_true", help="print code blocks")
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    rounds = load_rounds()
    if not rounds:
        print("no CORRECTNESS artifacts found", file=sys.stderr)
        return 1
    by_last = cohorts(rounds)
    registry = registry_names()
    # intersect with the LIVE registry: a query renamed/removed since
    # its last green row would otherwise occupy a window slot in the
    # printed plan (and the emitted blocks) while __spark_entry__'s
    # runtime filter silently drops it — the driver's actual window
    # would then pull a different, unplanned query forward
    ghosts = sorted(set().union(*rounds.values()) - registry)
    if ghosts:
        print(f"GHOST artifact names not in the registry ({len(ghosts)},"
              f" excluded from the plan): {ghosts}")
    by_last = {
        rnd: [n for n in names if n in registry]
        for rnd, names in by_last.items()
    }
    by_last = {rnd: names for rnd, names in by_last.items() if names}
    ever_green = set().union(*rounds.values()) & registry
    never = sorted(registry - ever_green)

    print(f"registry: {len(registry)} queries; ever-green: {len(ever_green)}")
    if never:
        print(f"NEVER CHECKED ({len(never)}): {never}")
    for rnd in sorted(by_last):
        staleness = max(rounds) - rnd
        print(f"last green r{rnd:02d} (stale {staleness}): {len(by_last[rnd])}")

    # Window plan: never-checked first, then cohorts oldest-first.
    head: list[str] = list(never)
    for rnd in sorted(by_last):
        head.extend(by_last[rnd])
    window = head[: args.window]
    print(f"\nwindow ({len(window)}): leads with "
          f"{window[:3]} ... fills through {window[-1]!r}")

    if args.emit:
        print("\n# --- _CHECK_FIRST body (paste under the additions) ---")
        for rnd in sorted(by_last):
            if rnd == max(rounds):
                break
            print(f"    # last green r{rnd:02d} ({len(by_last[rnd])})")
            for name in by_last[rnd]:
                print(f'    "{name}",')
        print("\n# --- _CHECK_LAST body ---")
        for name in sorted(ever_green):
            print(f'        "{name}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
