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


def _staged_tree() -> str | None:
    """Materialize the STAGED index into a temp dir and return it, or
    None when not in a usable git checkout. Importing the working
    tree instead let a partially staged commit produce an
    un-importable HEAD — the exact round-2 failure the gate exists
    to prevent (and conversely blocked committing a clean staged
    state from a broken working tree)."""
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = tempfile.mkdtemp(prefix="precommit_staged_")
    try:
        subprocess.run(
            ["git", "checkout-index", "-a", f"--prefix={tmp}/"],
            cwd=repo,
            check=True,
            capture_output=True,
        )
        return tmp
    except Exception:
        return None


def main() -> int:
    staged = _staged_tree()
    if staged:
        sys.path.insert(0, staged)
    try:
        import __spark_entry__ as entry

        queries = entry.queries()
        oracles = entry.oracle_sql()
        assert callable(entry.entry)
    except Exception as e:  # noqa: BLE001 — any import failure blocks
        where = "staged index" if staged else "working tree"
        print(f"PRECOMMIT BLOCK: import __spark_entry__ ({where}) failed: {e!r}")
        return 1
    finally:
        if staged:
            import shutil

            sys.path.remove(staged)
            shutil.rmtree(staged, ignore_errors=True)

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
            data = json.load(f)
        n_bench = data.get("n_queries") if isinstance(data, dict) else None
    except (OSError, ValueError):
        # a truncated/corrupt artifact must WARN-or-skip, never block
        # the end-of-round snapshot commit (ValueError covers
        # json.JSONDecodeError)
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
