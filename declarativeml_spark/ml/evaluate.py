"""Built-in evaluation functions + prediction explanation.

Reference surface (DSL.md:215-233): ``evaluate_model(model,
test_data, metrics[])``, ``compare_models(models[], test_data,
primary_metric)``, ``feature_importance(model, method)``; and
``EXPLAIN PREDICTION`` (DSL.md:341-344) — per-row top-k feature
contributions.

Explanations are computed Spark-side: linear models decompose as
coefficient × feature value per row (exact); tree ensembles expose
global ``featureImportances`` (impurity-based). Both paths are pure
column arithmetic over the assembled vector — no per-row Python.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from declarativeml_spark.ml.models import registry_load
from declarativeml_spark.ml.registry import get_algorithm


def evaluate_model(
    spark: SparkSession,
    model_name: str,
    test_df: DataFrame,
    metrics: Optional[List[str]] = None,
    *,
    algorithm: str,
    target: str,
    base: Optional[str] = None,
) -> Dict[str, float]:
    """DSL.md:215-218 ``evaluate_model``: metric dict on held-out data."""
    from declarativeml_spark.ml.training import _compute_metrics

    spec = get_algorithm(algorithm)
    model = registry_load(spark, model_name, base=base)
    label_col = None
    if spec.kind != "clustering":
        label_col = "label"
        ttype = dict(test_df.dtypes).get(target)
        if not (spec.kind == "classification" and ttype == "string"):
            test_df = test_df.withColumn(label_col, F.col(target).cast("double"))
    out = _compute_metrics(model, test_df, spec, label_col)
    if metrics:
        out = {k: v for k, v in out.items() if k in set(metrics)}
    return out


def compare_models(
    spark: SparkSession,
    model_specs: List[dict],
    test_df: DataFrame,
    primary_metric: str,
    base: Optional[str] = None,
) -> DataFrame:
    """DSL.md:228-233 ``compare_models``: one row per model, ranked by
    the primary metric (descending for higher-better, ascending for
    error metrics)."""
    rows = []
    for spec in model_specs:
        m = evaluate_model(
            spark,
            spec["name"],
            test_df,
            algorithm=spec["algorithm"],
            target=spec["target"],
            base=base,
        )
        rows.append((spec["name"], spec["algorithm"], float(m.get(primary_metric, float("nan"))), m))
    ascending = primary_metric in {"rmse", "mse", "mae"}
    rows.sort(key=lambda r: r[2], reverse=not ascending)
    return spark.createDataFrame(
        [
            (name, alg, i + 1, val, {k: float(v) for k, v in extra.items()})
            for i, (name, alg, val, extra) in enumerate(rows)
        ],
        f"model string, algorithm string, rank int, {primary_metric} double,"
        " metrics map<string,double>",
    )


def feature_importance(
    spark: SparkSession,
    model_name: str,
    feature_names: List[str],
    base: Optional[str] = None,
) -> DataFrame:
    """Global importances: |coefficient| for linear models,
    impurity importances for trees (DSL.md:222-226)."""
    model = registry_load(spark, model_name, base=base)
    final = model.stages[-1]
    if hasattr(final, "featureImportances"):
        values = final.featureImportances.toArray().tolist()
    elif hasattr(final, "coefficients"):
        values = [abs(c) for c in final.coefficients.toArray().tolist()]
    else:
        raise ValueError(
            f"Model {model_name!r} ({type(final).__name__}) exposes no importances"
        )
    n = min(len(values), len(feature_names))
    rows = sorted(
        zip(feature_names[:n], values[:n]), key=lambda kv: kv[1], reverse=True
    )
    return spark.createDataFrame(rows, "feature string, importance double")


def explain_predictions(
    spark: SparkSession,
    model_name: str,
    df: DataFrame,
    feature_names: List[str],
    top_k: int = 3,
    base: Optional[str] = None,
) -> DataFrame:
    """EXPLAIN PREDICTION (DSL.md:341-344): per-row top-k feature
    contributions.

    Linear models: contribution_i = coef_i × x_i (exact additive
    decomposition of the margin). Tree models fall back to global
    importances replicated per row (documented approximation — true
    SHAP needs per-tree path traversal).

    Scale: ``vector_to_array`` + per-index arithmetic — no shuffle, no
    Python; sorting top-k happens inside an array expression.
    """
    from pyspark.ml.functions import vector_to_array

    model = registry_load(spark, model_name, base=base)
    final = model.stages[-1]
    scored = model.transform(df)
    arr = vector_to_array(F.col("features"))

    if hasattr(final, "coefficients"):
        coefs = final.coefficients.toArray().tolist()
        contribs = F.array(
            *[
                F.struct(
                    F.lit(feature_names[i] if i < len(feature_names) else f"f{i}").alias(
                        "feature"
                    ),
                    (arr[i] * F.lit(float(coefs[i]))).alias("contribution"),
                )
                for i in range(len(coefs))
            ]
        )
    elif hasattr(final, "featureImportances"):
        imps = final.featureImportances.toArray().tolist()
        contribs = F.array(
            *[
                F.struct(
                    F.lit(feature_names[i] if i < len(feature_names) else f"f{i}").alias(
                        "feature"
                    ),
                    F.lit(float(imps[i])).alias("contribution"),
                )
                for i in range(len(imps))
            ]
        )
    else:
        raise ValueError(f"Model {model_name!r} is not explainable")

    top = F.slice(
        F.reverse(F.array_sort(contribs, lambda a, b: F.when(
            F.abs(a.contribution) < F.abs(b.contribution), -1
        ).when(F.abs(a.contribution) > F.abs(b.contribution), 1).otherwise(0))),
        1,
        top_k,
    )
    return scored.withColumn("top_features", top)
