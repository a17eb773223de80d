"""Guard the driver contract itself.

Round 2's correctness run produced an EMPTY result because HEAD had an
ImportError in the query registry — every query, bench.py and
__spark_entry__.py were unrunnable, and nothing in the suite caught it
because the breakage was introduced after the last test run. These
checks are import-time only (no Spark jobs), so they run in
milliseconds and fail loudly if the registry or the entry module ever
stops importing or drifts out of shape.
"""

import importlib


def test_entry_module_imports_and_exposes_contract():
    mod = importlib.import_module("__spark_entry__")
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert callable(mod.entry)
    assert len(qs) >= 66
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs)
    # at most one rows-only query (ann_ivf_topk has a documented
    # justification: model-specific cell assignment)
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {"ann_ivf_topk"}, rows_only
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_check_first_names_are_registered():
    """A typo'd or stale name in the priority list would silently waste
    a driver verification slot."""
    mod = importlib.import_module("__spark_entry__")
    qs = mod.queries()
    missing = [n for n in mod._CHECK_FIRST if n not in qs]
    assert not missing, missing


def test_priority_queries_lead_the_registry():
    mod = importlib.import_module("__spark_entry__")
    head = list(mod.queries())[: len(mod._CHECK_FIRST)]
    assert head == list(mod._CHECK_FIRST)


def test_check_first_has_no_duplicates():
    mod = importlib.import_module("__spark_entry__")
    assert len(mod._CHECK_FIRST) == len(set(mod._CHECK_FIRST))
