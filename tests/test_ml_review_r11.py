"""Round-11 ml/training.py + ml/forecast.py review regressions."""

import pytest

from declarativeml_spark.engine import Engine
from declarativeml_spark.sources.catalog import register_views


@pytest.fixture(scope="module")
def engine(spark, smoke_dir, tmp_path_factory):
    register_views(spark, smoke_dir)
    spark.sql(
        "SELECT o_orderkey, o_totalprice,"
        " CAST(o_totalprice > 150000 AS INT) AS expensive FROM orders"
    ).createOrReplaceTempView("mlr_labeled")
    spark.sql(
        "SELECT o_orderkey, o_totalprice,"
        " CAST(o_orderkey % 3 AS INT) AS tri FROM orders"
    ).createOrReplaceTempView("mlr_multiclass")
    return Engine(spark, model_dir=str(tmp_path_factory.mktemp("mlr_models")))


def test_metrics_scored_on_prebalance_frame(engine, spark):
    """Without a split, the metric fallback must be the PRE-balance
    frame — scoring the oversampled duplicates inflates every metric
    the model just memorized."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    trained = engine.execute(
        "TRAIN MODEL mlr_bal USING logistic_regression(max_iter=8) "
        "FROM mlr_labeled PREDICT expensive WITH FEATURES(o_totalprice) "
        "BALANCE CLASSES BY oversampling"
    )
    # recompute accuracy on the raw (un-oversampled) frame with the
    # trained pipeline: must equal the recorded metric exactly
    from declarativeml_spark.plans.builder import build_features
    from pyspark.sql import functions as F

    df = spark.table("mlr_labeled")
    df = build_features(df, trained.features).df.withColumn(
        "label", F.col("expensive").cast("double")
    )
    pred = trained.pipeline_model.transform(df)
    acc = MulticlassClassificationEvaluator(
        labelCol="label", metricName="accuracy"
    ).evaluate(pred)
    assert trained.metrics["accuracy"] == pytest.approx(acc, abs=1e-12)


def test_checkpoints_refuse_silent_noop(engine):
    with pytest.raises(ValueError, match="iteration budget"):
        engine.execute(
            "TRAIN MODEL mlr_ck1 USING random_forest(num_trees=3) "
            "FROM mlr_labeled PREDICT expensive WITH FEATURES(o_totalprice) "
            "SAVE CHECKPOINTS EVERY 5 EPOCHS"
        )
    with pytest.raises(ValueError, match="cv"):
        engine.execute(
            "TRAIN MODEL mlr_ck2 USING logistic_regression(max_iter=8) "
            "FROM mlr_labeled PREDICT expensive WITH FEATURES(o_totalprice) "
            "VALIDATE USING cross_validation "
            "SAVE CHECKPOINTS EVERY 5 EPOCHS"
        )


def test_all_evaluators_failing_raises(engine, spark):
    """A VALIDATE ON table whose target casts to all-NULL labels must
    fail loudly, not record an empty metrics dict."""
    spark.sql(
        "SELECT o_orderkey, o_totalprice, 'not-a-number' AS expensive"
        " FROM orders LIMIT 50"
    ).createOrReplaceTempView("mlr_bad_eval")
    with pytest.raises(Exception, match="no metrics|NULL"):
        engine.execute(
            "TRAIN MODEL mlr_badeval USING logistic_regression(max_iter=5) "
            "FROM mlr_labeled PREDICT expensive WITH FEATURES(o_totalprice) "
            "VALIDATE ON mlr_bad_eval"
        )


def test_auc_on_multiclass_cv_rejected(engine):
    with pytest.raises(ValueError, match="binary target"):
        engine.execute(
            "TRAIN MODEL mlr_auc3 USING logistic_regression(max_iter=5) "
            "FROM mlr_multiclass PREDICT tri WITH FEATURES(o_totalprice) "
            "OPTIMIZE FOR auc VALIDATE USING cross_validation"
        )


def test_forecast_short_history_fails_before_fit(engine, spark):
    """A history shorter than max(lags)+1 must raise the designed
    ValueError, not an opaque MLlib empty-dataset error."""
    spark.sql(
        "SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,"
        " CAST(SUM(o_totalprice) AS DOUBLE) AS revenue"
        " FROM orders GROUP BY 1 ORDER BY 1 LIMIT 5"
    ).createOrReplaceTempView("mlr_short_series")
    with pytest.raises(ValueError, match="Need at least"):
        engine.execute(
            "TRAIN MODEL mlr_short USING linear_regression"
            " FROM mlr_short_series FORECAST revenue"
            " WITH TIME COLUMN day HORIZON 3 LAGS [1, 7]"
        )


def test_forecast_null_exog_handling(engine, spark):
    """Training rows with NULL exog are dropped (NaN features poison
    linear fits and the conformal bands); a NULL exog on the LATEST
    row fails loudly instead of TypeError-ing in Vectors.dense."""
    spark.sql(
        """
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               CAST(SUM(o_totalprice) AS DOUBLE) AS revenue,
               CASE WHEN MAX(o_orderkey) % 7 = 0 THEN NULL
                    ELSE CAST(COUNT(*) AS DOUBLE) END AS spend
        FROM orders GROUP BY 1
        """
    ).createOrReplaceTempView("mlr_exog_series")
    trained = engine.execute(
        "TRAIN MODEL mlr_exog USING linear_regression"
        " FROM mlr_exog_series PREDICT revenue"
        " WITH TIME COLUMN day AND FEATURES (spend)"
        " FORECAST 3 days AHEAD"
    )
    fc = trained.forecast.collect()
    assert len(fc) == 3
    assert all(r.forecast == r.forecast for r in fc)  # no NaN

    # force the LATEST row's exog to NULL → loud refusal
    spark.sql(
        """
        SELECT day, revenue,
               CASE WHEN day = (SELECT MAX(day) FROM mlr_exog_series)
                    THEN NULL ELSE spend END AS spend
        FROM mlr_exog_series
        """
    ).createOrReplaceTempView("mlr_exog_nulltail")
    with pytest.raises(ValueError, match="exogenous"):
        engine.execute(
            "TRAIN MODEL mlr_exog2 USING linear_regression"
            " FROM mlr_exog_nulltail PREDICT revenue"
            " WITH TIME COLUMN day AND FEATURES (spend)"
            " FORECAST 3 days AHEAD"
        )
