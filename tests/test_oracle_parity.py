"""Every registered query with an oracle must hash-match DuckDB.

This mirrors the driver's correctness gate (row count + schema +
order-insensitive values) at the smoke scale factor so the suite
stays fast; the driver re-runs it at sf0.01.
"""

import pytest

from declarativeml_spark.queries import ORACLES, QUERIES
from declarativeml_spark.testing import compare_query

CASES = sorted(ORACLES.keys())


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, smoke_dir, name):
    result = compare_query(spark, name, QUERIES[name], ORACLES[name], smoke_dir)
    assert result.ok, f"{name}: {result.notes}"


def test_all_queries_have_callables():
    for name in ORACLES:
        assert name in QUERIES
