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


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_planted_fact_broadcast_hint_fails_audit(spark, sf_dir):
    """F.broadcast over a raw data-proportional scan must flag bad
    (round-8 verdict: the dedup_source_overlap_matrix defect class)."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    raw = li.select("l_orderkey", "l_partkey")
    df = li.join(F.broadcast(raw), "l_orderkey")
    flags, bad = audit_plan("planted_fact_broadcast", _formatted(df), _analyzed(df))
    assert bad
    assert any(f.startswith("ForcedBroadcastx") for f in flags)


def test_dim_bounded_broadcast_hints_pass(spark, sf_dir):
    """Hints over aggregates of facts and over true dim scans stay legal."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    agg = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    df = li.join(F.broadcast(agg), "l_returnflag")
    _, bad = audit_plan("agg_broadcast", _formatted(df), _analyzed(df))
    assert not bad

    nat = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    df2 = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    _, bad2 = audit_plan("dim_broadcast", _formatted(df2), _analyzed(df2))
    assert not bad2


def test_identity_keyed_aggregate_is_not_bounding(spark, sf_dir):
    """groupBy(doc_id).agg(...) keeps corpus cardinality — a broadcast
    hint over it must still flag (review finding, round 9)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    per_doc = docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df = docs.join(F.broadcast(per_doc), "doc_id")
    flags, bad = audit_plan("planted_id_agg", _formatted(df), _analyzed(df))
    assert bad
    assert any(f.startswith("ForcedBroadcastx") for f in flags)
    # ... while a bounded-key aggregate over the same table stays legal
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    df2 = docs.join(F.broadcast(per_src), "source")
    _, bad2 = audit_plan("src_agg", _formatted(df2), _analyzed(df2))
    assert not bad2


def test_bounded_branch_does_not_mask_sibling_raw_scan(spark, sf_dir):
    """A join of (aggregate, raw fact scan) under one hint still fails:
    the bounding node must sit on the raw relation's OWN ancestor path."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    agg = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    mixed = agg.join(li.select("l_orderkey", "l_partkey"), "l_orderkey")
    df = li.join(F.broadcast(mixed), "l_orderkey")
    flags, bad = audit_plan("mixed_broadcast", _formatted(df), _analyzed(df))
    assert bad
    assert any(f.startswith("ForcedBroadcastx") for f in flags)


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


def test_join_side_limit_does_not_mask_global_window(spark, sf_dir):
    """r10 tightening: a limit on a JOIN SIDE BRANCH must not count as
    bounding the window input — fact.join(dim.limit(k)) over a global
    window is still the single-task sort (Spark itself warns 'Moving
    all data to a single partition'), but the old any-descendant limit
    scan suppressed the flag."""
    from pyspark.sql.window import Window

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    dim = li.select("l_orderkey").limit(10)
    df = li.join(dim, "l_orderkey").withColumn(
        "rk", F.row_number().over(Window.orderBy("l_extendedprice"))
    )
    plan = _formatted(df)
    assert "GlobalLimit" in plan or "LocalLimit" in plan  # planted
    flags, bad = audit_plan("planted_join_side_limit_window", plan)
    assert bad
    assert any(f.startswith("GlobalWindowx") for f in flags)


def test_spine_limit_still_bounds_window(spark, sf_dir):
    """The standard bounded top-k-then-rank shape (limit on the
    window's own input spine) must still pass."""
    from pyspark.sql.window import Window

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    df = (
        li.orderBy(F.desc("l_extendedprice"))
        .limit(25)
        .withColumn("rk", F.row_number().over(Window.orderBy("l_extendedprice")))
    )
    flags, bad = audit_plan("planted_bounded_topk_window", _formatted(df))
    assert not bad
