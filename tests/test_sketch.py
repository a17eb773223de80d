"""Portable HyperLogLog sketch (operators/sketch.py).

Pins the three properties the oracle hash alone doesn't isolate:
the (idx, rho) extraction against an independent pure-Python md5
reference, the register MAX-merge law (per-partition planes union
freely — the distributed shape), and the accuracy/branch behavior
of the estimator.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from declarativeml_spark.operators import sketch as SK
from declarativeml_spark.queries import QUERIES


def _py_idx_rho(token: str) -> tuple[int, int]:
    h = hashlib.md5(token.encode()).hexdigest()
    idx = int(h[:2], 16)
    bits = int(h[2:15], 16)  # 13 hex chars = 52 bits
    if bits == 0:
        return idx, 53
    return idx, 53 - bits.bit_length()


def test_idx_rho_match_python_reference(spark):
    toks = [f"tok{i}" for i in range(500)]
    df = spark.createDataFrame([(t,) for t in toks], "t string").select(
        "t",
        F.expr("md5(t)").alias("h"),
    ).select(
        "t",
        F.expr(SK.hll_idx_expr("h")).alias("idx"),
        F.expr(SK.hll_rho_expr("h")).alias("rho"),
    )
    got = {r["t"]: (r["idx"], r["rho"]) for r in df.collect()}
    for t in toks:
        assert got[t] == _py_idx_rho(t), t


def test_register_max_merge_law(spark):
    # registers(A ∪ B) == elementwise-max(registers(A), registers(B))
    toks = [(f"w{i}", i % 2) for i in range(2000)]
    df = spark.createDataFrame(toks, "t string, half int").select(
        "t", "half", F.expr("md5(t)").alias("h")
    ).select(
        "t",
        "half",
        F.expr(SK.hll_idx_expr("h")).alias("idx"),
        F.expr(SK.hll_rho_expr("h")).alias("rho"),
    )
    whole = {
        r["idx"]: r["reg"]
        for r in df.groupBy("idx").agg(F.max("rho").alias("reg")).collect()
    }
    halves = df.groupBy("half", "idx").agg(F.max("rho").alias("reg"))
    merged: dict[int, int] = {}
    for r in halves.collect():
        merged[r["idx"]] = max(merged.get(r["idx"], 0), r["reg"])
    assert merged == whole


def test_estimator_branches_and_accuracy(spark):
    # Small set -> linear-counting branch, tight estimate.
    def estimate(n: int) -> tuple[float, int]:
        df = spark.createDataFrame(
            [(f"key-{i}",) for i in range(n)], "t string"
        ).select(F.expr("md5(t)").alias("h")).select(
            F.expr(SK.hll_idx_expr("h")).alias("idx"),
            F.expr(SK.hll_rho_expr("h")).alias("rho"),
        )
        regs = df.groupBy("idx").agg(F.max("rho").alias("reg"))
        row = regs.agg(
            F.count("*").alias("registers_nonzero"),
            F.expr(SK.hll_sint_agg_expr()).alias("s_int"),
        ).select(
            "registers_nonzero",
            F.expr(
                SK.hll_estimate_expr("s_int", "registers_nonzero")
            ).alias("est"),
        ).collect()[0]
        return row["est"], row["registers_nonzero"]

    est_small, nz_small = estimate(40)
    # 40 keys over 256 registers: linear counting, near-exact
    assert nz_small < 256
    assert abs(est_small - 40) / 40 < 0.10
    est_big, _ = estimate(5000)
    # classic HLL error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est_big - 5000) / 5000 < 0.20


def test_hll_audit_rel_error_bounded(spark, sf_dir):
    rows = QUERIES["hll_distinct_audit"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["registers_nonzero"] <= 256
        assert r["rel_error"] < 0.25, r
        # estimate column is the stable-rounded estimator output
        assert r["hll_estimate"] > 0
