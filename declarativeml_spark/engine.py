"""Engine facade: execute DSL statements against a SparkSession.

The reference's executable surface is ``python -m dsl.cli`` → SQL
text for PostgreSQL to run (reference: dsl/cli.py:14-46). Our engine
executes directly: parse → IR → plan build → Spark action. One class,
one ``execute`` entry point, statement-type dispatch.
"""

from __future__ import annotations

from typing import Any, Optional, Union

from pyspark.sql import DataFrame, SparkSession

from declarativeml_spark.dsl import ir
from declarativeml_spark.dsl.parser import parse
from declarativeml_spark.ml.models import registry_load
from declarativeml_spark.ml.training import TrainedModel, train
from declarativeml_spark.plans.builder import resolve_source


class Engine:
    def __init__(self, spark: SparkSession, model_dir: Optional[str] = None):
        self.spark = spark
        self.model_dir = model_dir

    def execute(self, text: str) -> Union[TrainedModel, DataFrame, dict]:
        stmt = parse(text)
        if isinstance(stmt, ir.TrainModel):
            return train(self.spark, stmt, model_dir=self.model_dir)
        if isinstance(stmt, ir.ComputeKernel):
            from declarativeml_spark.functions.kernels import execute_compute

            return execute_compute(self.spark, stmt)
        if isinstance(stmt, ir.PredictModel):
            return self._predict(stmt)
        if isinstance(stmt, ir.EvaluateModel):
            return self._evaluate(stmt)
        raise ValueError(f"Unsupported statement: {type(stmt).__name__}")

    # -- PREDICT USING MODEL m FROM src [STORE RESULTS IN t] ----------------
    def _predict(self, stmt: ir.PredictModel) -> DataFrame:
        model = registry_load(self.spark, stmt.model, base=self.model_dir)
        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        # re-derive the feature columns the pipeline expects
        meta = self._model_meta(stmt.model)
        if meta is not None:
            from declarativeml_spark.plans.builder import build_features

            df = build_features(df, meta["features"]).df
        scored = model.transform(df)
        if stmt.sink:
            scored.write.mode("overwrite").saveAsTable(stmt.sink)
        return scored

    def _evaluate(self, stmt: ir.EvaluateModel) -> dict:
        from pyspark.sql import functions as F

        from declarativeml_spark.ml.registry import get_algorithm
        from declarativeml_spark.ml.training import _compute_metrics

        meta = self._model_meta(stmt.model)
        if meta is None:
            raise ValueError(f"No registered model named {stmt.model!r}")
        model = registry_load(self.spark, stmt.model, base=self.model_dir)
        spec = get_algorithm(meta["algorithm"])
        df = resolve_source(self.spark, stmt.source, stmt.source_is_identifier)
        from declarativeml_spark.plans.builder import build_features

        df = build_features(df, meta["features"]).df
        label_col = None
        if spec.kind != "clustering":
            label_col = "label"
            ttype = dict(df.dtypes).get(meta["target"])
            if not (spec.kind == "classification" and ttype == "string"):
                df = df.withColumn(label_col, F.col(meta["target"]).cast("double"))
        metrics = _compute_metrics(model, df, spec, label_col)
        if stmt.metrics:
            metrics = {k: v for k, v in metrics.items() if k in set(stmt.metrics)}
        return metrics

    def _model_meta(self, name: str) -> Optional[dict[str, Any]]:
        import json
        import os

        from declarativeml_spark.ml.models import DEFAULT_MODEL_DIR, _registry_path

        path = _registry_path(self.model_dir or DEFAULT_MODEL_DIR)
        if not os.path.exists(path):
            return None
        latest: Optional[dict] = None
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec["name"] == name:
                    if latest is None or rec["version"] > latest["version"]:
                        latest = rec
        return latest
