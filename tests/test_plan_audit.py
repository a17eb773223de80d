"""The plan audit must have teeth: a planted scale anti-pattern fails.

Round-7 verdict finding: ``scripts/plan_audit.py`` exited 0 by
default even with ``bad > 0``, so the round-end gate checklist proved
nothing unless ``--fail-on-python`` was passed. These tests pin the
strict-by-default contract against REAL Spark plans, not synthetic
strings.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from plan_audit import GLOBAL_WINDOW_BOUNDED_OK, audit_plan  # noqa: E402


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_planted_python_udf_fails_audit(spark):
    """A row-at-a-time Python UDF (BatchEvalPython) must flag bad."""
    slow = F.udf(lambda x: x + 1, LongType())
    df = spark.range(10).select(slow(F.col("id")).alias("y"))
    plan = _formatted(df)
    assert "BatchEvalPython" in plan  # the fixture really planted it
    flags, bad = audit_plan("planted_udf", plan)
    assert bad
    assert any(f.startswith("BatchEvalPythonx") for f in flags)


def test_planted_global_window_fails_audit(spark):
    """An un-allowlisted partition-less window must flag bad."""
    from pyspark.sql.window import Window

    df = spark.range(100).withColumn(
        "rk", F.row_number().over(Window.orderBy("id"))
    )
    plan = _formatted(df)
    flags, bad = audit_plan("planted_global_window", plan)
    assert bad
    assert any(f.startswith("GlobalWindowx") for f in flags)
    # ... but the identical plan under an allowlisted name passes,
    # with the justification carried into the flag text.
    name = next(iter(GLOBAL_WINDOW_BOUNDED_OK))
    flags_ok, bad_ok = audit_plan(name, plan)
    assert not bad_ok
    assert any(f.startswith("GlobalWindowOKx") for f in flags_ok)


def test_clean_plan_passes(spark):
    df = spark.range(100).groupBy((F.col("id") % 7).alias("k")).count()
    flags, bad = audit_plan("clean", _formatted(df))
    assert not bad


def test_strict_exit_is_default():
    """main() must exit 1 on bad plans without any flag (r7 verdict #3)."""
    import inspect

    import plan_audit

    src = inspect.getsource(plan_audit.main)
    assert "args.warn_only" in src
    # the old vacuous guard must be gone
    assert "args.fail_on_python and bad" not in src
