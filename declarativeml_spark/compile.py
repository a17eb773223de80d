"""compile_plan: the reference's ``compile_sql`` analogue.

The reference's second public function compiles a parsed statement to
its executable artifact — SQL text for PostgreSQL (reference:
dsl/parser.py:747-880). Our executable artifact is a *plan
description*: resolved source mode, compiled Spark SQL feature
expressions, estimator class + translated params, option plan. No
SparkSession required — this is the pure compile step, usable for
inspection, logging, and tests (the reference's tests assert on
compiled SQL the same way).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Union

from declarativeml_spark.dsl import ir
from declarativeml_spark.dsl.features import feature_to_spark_sql
from declarativeml_spark.dsl.parser import Statement, parse
from declarativeml_spark.dsl.source import validate_source_fragment


def compile_plan(statement: Union[str, Statement]) -> Dict[str, Any]:
    """Compile DSL text (or a parsed IR) to a plan description dict."""
    stmt = parse(statement) if isinstance(statement, str) else statement

    if isinstance(stmt, ir.TrainModel):
        if not stmt.source_is_identifier:
            validate_source_fragment(stmt.source)
        from declarativeml_spark.ml.registry import get_algorithm

        spec = get_algorithm(stmt.algorithm)
        params = {}
        for key, value in stmt.params:
            params[spec.param_map.get(key, key)] = value
        return {
            "statement": "train",
            "model": stmt.name,
            "estimator": spec.factory.__name__,
            "estimator_kind": spec.kind,
            "estimator_params": params,
            "source": stmt.source,
            "source_mode": "table" if stmt.source_is_identifier else "sql_fragment",
            "target": stmt.target,
            "features_sql": [feature_to_spark_sql(f) for f in stmt.features],
            "split": stmt.split.ratios if stmt.split else None,
            "validate": dataclasses.asdict(stmt.validate) if stmt.validate else None,
            "optimize_metric": stmt.optimize_metric,
            "stop_condition": stmt.stop_condition,
            "balance_method": stmt.balance_method,
            "checkpoint": dataclasses.asdict(stmt.checkpoint) if stmt.checkpoint else None,
        }
    if isinstance(stmt, ir.ComputeKernel):
        from declarativeml_spark.functions.kernels import KERNELS

        return {
            "statement": "compute",
            "name": stmt.name,
            "kernel": stmt.kernel,
            "kernel_registered": stmt.kernel in KERNELS,
            "inputs": stmt.inputs,
            "output": stmt.output,
            "schedule_ticks": stmt.schedule_ticks,
            "options": stmt.options,
        }
    # every other statement: typed field dump
    out = dataclasses.asdict(stmt)
    out["statement"] = type(stmt).__name__
    return out
