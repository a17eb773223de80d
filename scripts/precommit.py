"""Fast pre-commit gate: HEAD must never be un-importable.

Round 2 scored zero because the driver graded a commit whose
``import __spark_entry__`` raised. This gate makes that class of
breakage mechanically impossible to commit:

1. ``import __spark_entry__`` and materialize the three contract
   functions (queries/oracle registries build at import time — most
   breakage surfaces right here, in ~2 s);
2. every ``oracle_sql()`` key must exist in ``queries()``;
3. the bench artifact must agree with the registry size
   (``BENCH_LOCAL.json`` n_queries == len(queries()) — a stale
   artifact means bench.py wasn't re-run after adding a query).

Install as a git hook (done by ``scripts/install_hooks.sh``):

    ln -sf ../../scripts/pre-commit.sh .git/hooks/pre-commit

Only (1) and (2) block the commit; (3) prints a loud warning (a
stale bench artifact is repairable by re-running bench.py, and must
never block an end-of-round snapshot commit).

Exit 0 = safe to commit.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    try:
        import __spark_entry__ as entry

        queries = entry.queries()
        oracles = entry.oracle_sql()
        assert callable(entry.entry)
    except Exception as e:  # noqa: BLE001 — any import failure blocks
        print(f"PRECOMMIT BLOCK: import __spark_entry__ failed: {e!r}")
        return 1

    extra = set(oracles) - set(queries)
    if extra:
        print(f"PRECOMMIT BLOCK: oracle_sql keys missing from queries(): {sorted(extra)}")
        return 1

    bench_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_LOCAL.json",
    )
    try:
        with open(bench_path) as f:
            n_bench = json.load(f).get("n_queries")
    except OSError:
        n_bench = None
    if n_bench is not None and n_bench != len(queries):
        print(
            f"PRECOMMIT WARN: BENCH_LOCAL.json has n_queries={n_bench} but"
            f" the registry has {len(queries)} — re-run `python bench.py`"
            " in the same commit that changes the registry."
        )

    print(f"precommit ok: {len(queries)} queries, {len(oracles)} oracles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
