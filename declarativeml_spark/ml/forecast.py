"""Time-series forecasting: lag features + trend + seasonality →
regression, with iterative multi-step forecast.

Reference semantics (DSL.md:297-313): ``TRAIN … FORECAST revenue WITH
TIME COLUMN date SEASONAL weekday TREND linear``. The reference names
``prophet`` as an algorithm; there is no Prophet on a Spark cluster's
JVM — the documented mapping (SURVEY.md §2.1 'TRAIN … FORECAST') is
window-lag feature generation + an MLlib regressor. ``prophet`` is
accepted as an alias for gradient-boosted regression with the full
seasonal feature set.

Scale: feature building is one window over the time order (single
shuffle); the fit is a distributed MLlib regression. Multi-step
forecasting is inherently sequential in the horizon — it runs
driver-side over the last ``max(lags)`` observations only (a few KB),
never over the history.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.ml import Pipeline
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from declarativeml_spark.dsl.ir import ForecastModel
from declarativeml_spark.ml.registry import get_algorithm
from declarativeml_spark.plans.builder import resolve_source

_FORECAST_ALIASES = {"prophet": "gradient_boosting_regressor"}


def _feature_cols(stmt: ForecastModel) -> List[str]:
    cols = [f"lag_{k}" for k in stmt.lags]
    if stmt.trend:
        cols.append("trend_idx")
    if stmt.seasonal == "weekday":
        cols.append("dow")
    elif stmt.seasonal in {"monthly", "month"}:
        cols.append("month")
    return cols


def build_forecast_frame(df: DataFrame, stmt: ForecastModel) -> DataFrame:
    """One ordered window pass: lags, trend index, seasonal fields."""
    w = W.orderBy(F.col(stmt.time_column))
    out = df
    for k in stmt.lags:
        out = out.withColumn(
            f"lag_{k}", F.lag(F.col(stmt.target), k).over(w).cast("double")
        )
    if stmt.trend:
        out = out.withColumn("trend_idx", F.row_number().over(w).cast("double"))
    if stmt.seasonal == "weekday":
        out = out.withColumn("dow", F.dayofweek(stmt.time_column).cast("double"))
    elif stmt.seasonal in {"monthly", "month"}:
        out = out.withColumn("month", F.month(stmt.time_column).cast("double"))
    return out.na.drop(subset=[f"lag_{k}" for k in stmt.lags])


def train_forecast(
    spark: SparkSession, stmt: ForecastModel, model_dir: Optional[str] = None
):
    """Fit the forecasting pipeline and return (TrainedModel, forecast_df)."""
    from declarativeml_spark.ml.models import registry_save
    from declarativeml_spark.ml.training import TrainedModel, _compute_metrics

    alg = _FORECAST_ALIASES.get(stmt.algorithm, stmt.algorithm)
    spec = get_algorithm(alg)
    if spec.kind != "regression":
        raise ValueError(
            f"FORECAST requires a regression algorithm, got {stmt.algorithm!r}"
        )

    df = resolve_source(spark, stmt.source, stmt.source_is_identifier)
    frame = build_forecast_frame(df, stmt)
    feats = _feature_cols(stmt)
    frame = frame.withColumn("label", F.col(stmt.target).cast("double"))

    pipeline = Pipeline(
        stages=[
            VectorAssembler(inputCols=feats, outputCol="features", handleInvalid="keep"),
            spec.build(dict(stmt.params), featuresCol="features", labelCol="label"),
        ]
    )
    model = pipeline.fit(frame)
    metrics = _compute_metrics(model, frame, spec, "label")

    trained = TrainedModel(
        name=stmt.name,
        algorithm=stmt.algorithm,
        version=1,
        pipeline_model=model,
        metrics=metrics,
        features=feats,
        target=stmt.target,
    )
    registry_save(spark, trained, base=model_dir)
    forecast_df = forecast(spark, model, df, stmt)
    return trained, forecast_df


def forecast(
    spark: SparkSession, model, history_df: DataFrame, stmt: ForecastModel
) -> DataFrame:
    """Iterative h-step forecast from the tail of the history.

    Pulls only the last ``max(lags)`` (time, value) pairs to the
    driver; each step predicts one point and feeds it back as lag
    input. Frequency is inferred from the median spacing of the tail.
    """
    max_lag = max(stmt.lags)
    tail = (
        history_df.select(stmt.time_column, stmt.target)
        .orderBy(F.desc(stmt.time_column))
        .limit(max_lag + 8)
        .toPandas()
        .sort_values(stmt.time_column)
        .reset_index(drop=True)
    )
    if len(tail) < max_lag + 1:
        raise ValueError(
            f"Need at least {max_lag + 1} observations to forecast with lags {stmt.lags}"
        )
    times = pd.to_datetime(tail[stmt.time_column])
    freq = (times.diff().dropna()).median()
    values = list(tail[stmt.target].astype(float))
    last_time = times.iloc[-1]
    n_hist = history_df.count()

    rows = []
    for step in range(1, stmt.horizon + 1):
        t_next = last_time + freq * step
        feat: dict = {}
        for k in stmt.lags:
            feat[f"lag_{k}"] = values[-k]
        if stmt.trend:
            feat["trend_idx"] = float(n_hist + step)
        if stmt.seasonal == "weekday":
            # pandas dayofweek: Mon=0..Sun=6; Spark dayofweek: Sun=1..Sat=7
            feat["dow"] = float((t_next.dayofweek + 1) % 7 + 1)
        elif stmt.seasonal in {"monthly", "month"}:
            feat["month"] = float(t_next.month)
        pred_df = model.transform(
            spark.createDataFrame(pd.DataFrame([feat]))
        )
        yhat = pred_df.select("prediction").first()[0]
        values.append(float(yhat))
        rows.append((t_next.to_pydatetime(), step, float(yhat)))

    return spark.createDataFrame(
        rows, f"{stmt.time_column} timestamp, step int, forecast double"
    )
