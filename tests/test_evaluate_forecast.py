"""evaluate/compare/importance APIs, EXPLAIN PREDICTION, FALLBACK,
and TRAIN ... FORECAST."""

import pytest
from pyspark.sql import functions as F

from declarativeml_spark.dsl import parse
from declarativeml_spark.dsl.ir import ExplainPrediction, ForecastModel
from declarativeml_spark.engine import Engine
from declarativeml_spark.sources.catalog import register_views


@pytest.fixture(scope="module")
def engine(spark, smoke_dir, tmp_path_factory):
    register_views(spark, smoke_dir)
    spark.sql(
        "SELECT *, CAST(o_totalprice > 150000 AS INT) AS expensive FROM orders"
    ).createOrReplaceTempView("orders_labeled")
    spark.sql(
        """
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1
        """
    ).createOrReplaceTempView("daily_revenue")
    eng = Engine(spark, model_dir=str(tmp_path_factory.mktemp("ef_models")))
    eng.execute(
        "TRAIN MODEL ef_lr USING logistic_regression(max_iter=10) "
        "FROM orders_labeled PREDICT expensive "
        "WITH FEATURES(o_totalprice, log(o_totalprice + 1))"
    )
    eng.execute(
        "TRAIN MODEL ef_dt USING decision_tree(max_depth=4) "
        "FROM orders_labeled PREDICT expensive "
        "WITH FEATURES(o_totalprice, log(o_totalprice + 1))"
    )
    return eng


def test_compare_models(engine, spark):
    from declarativeml_spark.ml.evaluate import compare_models
    from declarativeml_spark.plans.builder import build_features

    df = build_features(
        spark.table("orders_labeled"), ["o_totalprice", "log(o_totalprice + 1)"]
    ).df
    out = compare_models(
        spark,
        [
            {"name": "ef_lr", "algorithm": "logistic_regression", "target": "expensive"},
            {"name": "ef_dt", "algorithm": "decision_tree", "target": "expensive"},
        ],
        df,
        "accuracy",
        base=engine.model_dir,
    )
    rows = out.collect()
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].accuracy >= rows[1].accuracy


def test_feature_importance(engine, spark):
    from declarativeml_spark.ml.evaluate import feature_importance

    out = feature_importance(
        spark, "ef_dt", ["o_totalprice", "log(o_totalprice + 1)"], base=engine.model_dir
    ).collect()
    assert len(out) == 2
    assert abs(sum(r.importance for r in out) - 1.0) < 1e-6  # tree importances sum to 1


def test_explain_prediction_statement(engine):
    stmt = parse("EXPLAIN PREDICTION FOR MODEL ef_lr FROM orders_labeled TOP 2 FEATURES")
    assert isinstance(stmt, ExplainPrediction) and stmt.top_k == 2
    out = engine.execute(
        "EXPLAIN PREDICTION FOR MODEL ef_lr FROM orders_labeled TOP 2 FEATURES"
    )
    row = out.select("top_features").first()
    assert len(row.top_features) == 2
    # sorted by |contribution| descending
    assert abs(row.top_features[0].contribution) >= abs(row.top_features[1].contribution)


def test_fallback_parse_and_retry(engine):
    m = parse(
        "TRAIN MODEL fb USING logistic_regression(max_iter=10) FROM t PREDICT y "
        "WITH FEATURES(x) "
        "WITH FALLBACK (ON out_of_memory RETRY WITH max_iter=2, "
        "ON convergence_failure RETRY WITH reg=0.5) MAX RETRIES 2"
    )
    assert m.fallback.max_retries == 2
    assert m.fallback.retries[0] == ("out_of_memory", [("max_iter", 2)])
    assert m.fallback.retries[1] == ("convergence_failure", [("reg", 0.5)])

    # bad param crashes the first fit; fallback retries with an override
    trained = engine.execute(
        "TRAIN MODEL fb_ok USING logistic_regression(max_iter=-5) "
        "FROM orders_labeled PREDICT expensive WITH FEATURES(o_totalprice) "
        "WITH FALLBACK (ON invalid_param RETRY WITH max_iter=5) MAX RETRIES 1"
    )
    assert trained.metrics["accuracy"] > 0.9


def test_forecast_parse_and_train(engine, spark):
    stmt = parse(
        "TRAIN MODEL rev_fc USING linear_regression FROM daily_revenue "
        "FORECAST revenue WITH TIME COLUMN day "
        "HORIZON 5 SEASONAL weekday TREND linear LAGS [1, 7]"
    )
    assert isinstance(stmt, ForecastModel)
    assert stmt.horizon == 5 and stmt.seasonal == "weekday" and stmt.lags == [1, 7]

    trained = engine.execute(
        "TRAIN MODEL rev_fc USING linear_regression FROM daily_revenue "
        "FORECAST revenue WITH TIME COLUMN day HORIZON 5 SEASONAL weekday TREND linear"
    )
    fc = trained.forecast.collect()
    assert len(fc) == 5
    assert [r.step for r in fc] == [1, 2, 3, 4, 5]
    last_day = spark.table("daily_revenue").agg(F.max("day")).first()[0]
    assert all(r.day > last_day for r in fc)
    assert "rmse" in trained.metrics


def test_forecast_prophet_alias(engine):
    trained = engine.execute(
        "TRAIN MODEL rev_fc2 USING prophet(max_iter=10) FROM daily_revenue "
        "FORECAST revenue WITH TIME COLUMN day HORIZON 3"
    )
    assert len(trained.forecast.collect()) == 3


def test_forecast_verbose_form_parses_reference_statement():
    # reference docs/DSL.md:297-313, byte for byte
    stmt = parse(
        """TRAIN MODEL sales_forecast
  USING prophet(
    seasonality=['yearly', 'weekly'],
    holidays=us_holidays
  )
  FROM daily_sales
  PREDICT revenue
  WITH TIME COLUMN date
  AND FEATURES (
    marketing_spend,
    weather_temperature,
    SEASONAL weekday,
    TREND linear
  )
  FORECAST 30 days AHEAD
  WITH CONFIDENCE INTERVALS 0.8, 0.95"""
    )
    assert isinstance(stmt, ForecastModel)
    assert stmt.target == "revenue" and stmt.time_column == "date"
    assert stmt.exog == ["marketing_spend", "weather_temperature"]
    assert stmt.seasonal_terms == ["weekday"] and stmt.trend == "linear"
    assert stmt.horizon == 30 and stmt.horizon_unit == "days"
    assert stmt.confidence_levels == [0.8, 0.95]
    assert dict(stmt.params)["holidays"] == "us_holidays"
    assert dict(stmt.params)["seasonality"] == ["yearly", "weekly"]


def test_forecast_confidence_intervals_and_coverage(engine, spark):
    # dense calendar spine (orders has gap days; forecast steps are daily)
    spark.sql(
        """
        SELECT d.day, COALESCE(r.revenue, CAST(0.0 AS DOUBLE)) AS revenue
        FROM (
          SELECT explode(sequence(
            (SELECT MIN(day) FROM daily_revenue),
            (SELECT MAX(day) FROM daily_revenue),
            interval 1 day)) AS day
        ) d LEFT JOIN daily_revenue r USING (day)
        """
    ).createOrReplaceTempView("daily_revenue_dense")
    # hold out the last 5 days; train on the rest
    spark.sql(
        """
        SELECT * FROM daily_revenue_dense
        WHERE day < (SELECT date_add(MAX(day), -5) FROM daily_revenue_dense)
        """
    ).createOrReplaceTempView("daily_revenue_train")
    trained = engine.execute(
        "TRAIN MODEL rev_ci USING linear_regression FROM daily_revenue_train "
        "PREDICT revenue WITH TIME COLUMN day "
        "AND FEATURES (SEASONAL weekday, TREND linear) "
        "FORECAST 5 days AHEAD "
        "WITH CONFIDENCE INTERVALS 0.8, 0.95"
    )
    fc = trained.forecast.orderBy("step").toPandas()
    for col in ("lo_80", "hi_80", "lo_95", "hi_95"):
        assert col in fc.columns
    # nesting: 95% band contains the 80% band contains the point
    assert (fc.lo_95 <= fc.lo_80).all() and (fc.hi_80 <= fc.hi_95).all()
    assert (fc.lo_80 <= fc.forecast).all() and (fc.forecast <= fc.hi_80).all()
    # coverage sanity on the held-out tail: most actuals in the 95% band
    actual = spark.sql(
        """
        SELECT day, revenue FROM daily_revenue_dense
        WHERE day >= (SELECT date_add(MAX(day), -5) FROM daily_revenue_dense)
          AND day < (SELECT MAX(day) FROM daily_revenue_dense)
        """
    ).toPandas()
    merged = fc.merge(actual, on="day")
    assert len(merged) == 5
    covered = ((merged.revenue >= merged.lo_95) & (merged.revenue <= merged.hi_95)).sum()
    assert covered >= 3


def test_forecast_holidays_feature(engine, spark):
    hol = spark.sql(
        "SELECT DISTINCT o_orderdate AS holiday FROM orders LIMIT 3"
    )
    hol.createOrReplaceTempView("test_holidays")
    trained = engine.execute(
        "TRAIN MODEL rev_hol USING linear_regression(holidays=test_holidays) "
        "FROM daily_revenue FORECAST revenue WITH TIME COLUMN day HORIZON 3"
    )
    assert "is_holiday" in trained.features
    assert len(trained.forecast.collect()) == 3


def test_forecast_requires_regression(engine):
    with pytest.raises(ValueError, match="regression"):
        engine.execute(
            "TRAIN MODEL bad_fc USING logistic_regression FROM daily_revenue "
            "FORECAST revenue WITH TIME COLUMN day"
        )


def test_explain_linear_additivity(engine, spark):
    """SHAP contract on the linear path: per-row contributions sum to
    prediction_value − base_value (margin space), exactly."""
    out = engine.execute(
        "EXPLAIN PREDICTION FOR MODEL ef_lr FROM orders_labeled TOP 2 FEATURES"
    )
    rows = out.select("base_value", "prediction_value", "contributions").take(20)
    assert rows
    for r in rows:
        s = sum(c.contribution for c in r.contributions)
        assert abs(s - (r.prediction_value - r.base_value)) < 1e-6, r


def test_explain_tree_regressor_additivity(engine, spark):
    """Saabas contract on tree regressors: contributions telescope to
    prediction − base (the weighted root expectation), per row, for
    single trees, random forests and GBTs."""
    for name, algo in [
        ("ex_dtr", "decision_tree_regressor(max_depth=4)"),
        ("ex_rfr", "random_forest_regressor(num_trees=5, max_depth=4)"),
        ("ex_gbt", "gradient_boosting_regressor(max_iter=5, max_depth=3)"),
    ]:
        engine.execute(
            f"TRAIN MODEL {name} USING {algo} "
            "FROM orders_labeled PREDICT o_totalprice "
            "WITH FEATURES(o_custkey, o_orderkey, log(o_totalprice + 1))"
        )
        out = engine.execute(
            f"EXPLAIN PREDICTION FOR MODEL {name} FROM orders_labeled TOP 2 FEATURES"
        )
        rows = out.select(
            "prediction", "base_value", "prediction_value", "contributions"
        ).take(20)
        assert rows, name
        for r in rows:
            s = sum(c.contribution for c in r.contributions)
            assert abs(s - (r.prediction_value - r.base_value)) < 1e-6, (name, r)
            assert r.prediction_value == pytest.approx(r.prediction)


def test_explain_tree_classifier_additivity(engine, spark):
    """Saabas for binary tree CLASSIFIERS: DT/RF attribute in
    p(class 1) space (Σφ = probability₁ − base), GBT in margin space
    (Σφ = rawPrediction[1] − base)."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    for name, algo, space in [
        ("exc_dt", "decision_tree(max_depth=4)", "probability"),
        ("exc_rf", "random_forest(num_trees=5, max_depth=4)", "probability"),
        ("exc_gbt", "gradient_boosting(max_iter=5, max_depth=3)", "margin"),
    ]:
        engine.execute(
            f"TRAIN MODEL {name} USING {algo} "
            "FROM orders_labeled PREDICT expensive "
            "WITH FEATURES(o_custkey, o_orderkey, log(o_totalprice + 1))"
        )
        out = engine.execute(
            f"EXPLAIN PREDICTION FOR MODEL {name} FROM orders_labeled TOP 2 FEATURES"
        )
        ref_col = (
            vector_to_array(F.col("probability"))[1]
            if space == "probability"
            else vector_to_array(F.col("rawPrediction"))[1]
        )
        rows = out.select(
            ref_col.alias("ref"), "base_value", "prediction_value", "contributions"
        ).take(20)
        assert rows, name
        for r in rows:
            s = sum(c.contribution for c in r.contributions)
            assert abs(s - (r.prediction_value - r.base_value)) < 1e-6, (name, r)
            assert r.prediction_value == pytest.approx(r.ref), (name, r)


def test_explain_multiclass_tree_additivity(engine, spark):
    """Per-class Saabas for MULTICLASS tree classifiers: every class c
    gets its own additive decomposition (Σφ_c = p_c − base_c) from the
    per-node impurityStats class distributions; the top-level columns
    describe the predicted class."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    spark.sql(
        "SELECT *, CAST(o_totalprice / 100000 AS INT) % 3 AS price_class"
        " FROM orders"
    ).createOrReplaceTempView("orders_3class_tree")
    for name, algo in [
        ("exm_dt", "decision_tree(max_depth=4)"),
        ("exm_rf", "random_forest(num_trees=5, max_depth=4)"),
    ]:
        engine.execute(
            f"TRAIN MODEL {name} USING {algo} "
            "FROM orders_3class_tree PREDICT price_class "
            "WITH FEATURES(o_custkey, o_orderkey, log(o_totalprice + 1))"
        )
        out = engine.execute(
            f"EXPLAIN PREDICTION FOR MODEL {name} FROM orders_3class_tree"
            " TOP 2 FEATURES"
        )
        rows = out.select(
            vector_to_array(F.col("probability")).alias("prob"),
            F.col("prediction").cast("int").alias("pred"),
            "base_value",
            "prediction_value",
            "contributions",
            "class_contributions",
        ).take(20)
        assert rows, name
        for r in rows:
            assert len(r.class_contributions) == 3, name
            # per-class additivity: Σφ_c = p_c − base_c for EVERY class
            for cc in r.class_contributions:
                s = sum(c.contribution for c in cc.contributions)
                assert abs(s - (cc.probability_value - cc.base_value)) < 1e-6, (
                    name,
                    cc,
                )
                assert cc.probability_value == pytest.approx(r.prob[cc["class"]])
            # top-level columns mirror the predicted class
            assert r.prediction_value == pytest.approx(r.prob[r.pred]), name
            s = sum(c.contribution for c in r.contributions)
            assert abs(s - (r.prediction_value - r.base_value)) < 1e-6, (name, r)
        # probabilities are a simplex → per-row class bases sum to 1
        bases = [cc.base_value for cc in rows[0].class_contributions]
        assert sum(bases) == pytest.approx(1.0)


def test_multiclass_lr_explain_is_typed_error(engine, spark):
    """Multinomial LogisticRegressionModel.coefficients EXISTS but
    raises a Py4J SparkException ('use coefficientMatrix'), which
    hasattr does not swallow — both the importance and explain paths
    must surface the clean typed ValueError instead of the crash."""
    spark.sql(
        "SELECT *, CAST(o_totalprice / 100000 AS INT) % 3 AS price_class"
        " FROM orders"
    ).createOrReplaceTempView("orders_3class")
    engine.execute(
        "TRAIN MODEL ef_multi USING logistic_regression(max_iter=5) "
        "FROM orders_3class PREDICT price_class "
        "WITH FEATURES(o_totalprice)"
    )
    from declarativeml_spark.ml.evaluate import feature_importance

    with pytest.raises(ValueError, match="importances"):
        feature_importance(
            spark, "ef_multi", ["o_totalprice"], base=engine.model_dir
        )
    with pytest.raises(ValueError, match="not explainable"):
        engine.execute(
            "EXPLAIN PREDICTION FOR MODEL ef_multi FROM orders_3class"
            " TOP 1 FEATURES"
        )


def test_forecast_bad_unit_fails_at_parse_time():
    # a bad unit must fail BEFORE any model fit (ir-level validation)
    with pytest.raises(ValueError, match="Unknown forecast unit"):
        parse(
            "TRAIN MODEL m USING linear_regression FROM t PREDICT y "
            "WITH TIME COLUMN d FORECAST 3 months AHEAD"
        )


def test_forecast_units_cover_forecaster_steps():
    # the ir-level whitelist and the forecaster's step table must not
    # drift apart
    from declarativeml_spark.dsl.ir import FORECAST_UNITS
    from declarativeml_spark.ml.forecast import _UNIT_STEPS

    assert set(_UNIT_STEPS) == set(FORECAST_UNITS)


def test_forecast_holidays_prefers_named_calendar_column(engine, spark):
    # (created_at timestamp, holiday date): the conventionally-named
    # calendar column must win over schema order
    spark.sql(
        "SELECT TIMESTAMP '2001-01-01 00:00:00' AS created_at,"
        " o_orderdate AS holiday FROM orders LIMIT 3"
    ).createOrReplaceTempView("holidays_two_dates")
    from declarativeml_spark.ml.forecast import _holiday_dates

    dates = _holiday_dates(spark, "holidays_two_dates")
    assert dates and all(d != "2001-01-01" for d in dates)
    # several date-typed columns and none conventionally named: a
    # typed error, not a silent schema-order guess
    spark.sql(
        "SELECT TIMESTAMP '2001-01-01 00:00:00' AS created_at,"
        " o_orderdate AS observed_on FROM orders LIMIT 3"
    ).createOrReplaceTempView("holidays_ambiguous")
    with pytest.raises(ValueError, match="several date-typed columns"):
        _holiday_dates(spark, "holidays_ambiguous")


def test_explain_single_class_tree_is_additive_zero(engine, spark):
    """Degenerate constant-label classifier (numClasses == 1): every
    contribution is exactly 0 and p = base = 1 — still additive, not
    an error."""
    # label constant 0 → MLlib numClasses == 1 (constant 1 would infer
    # numClasses == 2 and take the binary p₁ branch)
    spark.sql(
        "SELECT *, CAST(0 AS INT) AS const_label FROM orders"
    ).createOrReplaceTempView("orders_const")
    engine.execute(
        "TRAIN MODEL exm_const USING decision_tree(max_depth=2) "
        "FROM orders_const PREDICT const_label WITH FEATURES(o_totalprice)"
    )
    out = engine.execute(
        "EXPLAIN PREDICTION FOR MODEL exm_const FROM orders_const"
        " TOP 1 FEATURES"
    )
    r = out.select(
        "base_value", "prediction_value", "contributions",
        "class_contributions",
    ).first()
    assert len(r.class_contributions) == 1
    assert r.prediction_value == pytest.approx(1.0)
    assert r.base_value == pytest.approx(1.0)
    assert all(c.contribution == pytest.approx(0.0) for c in r.contributions)


def test_forecast_rejects_bad_trend_and_empty_lags():
    with pytest.raises(ValueError, match="trend"):
        parse(
            "TRAIN MODEL m USING linear_regression FROM t PREDICT y "
            "WITH TIME COLUMN d AND FEATURES (TREND quadratic) "
            "FORECAST 3 days AHEAD"
        )
    with pytest.raises(ValueError, match="at least one lag"):
        parse(
            "TRAIN MODEL m USING linear_regression FROM t "
            "FORECAST y WITH TIME COLUMN d HORIZON 3 LAGS []"
        )


def test_forecast_prophet_registers_resolved_algorithm(engine, spark):
    """The registry must record the RESOLVED algorithm, not the
    'prophet' alias — EVALUATE/MONITOR/compare_models call
    get_algorithm on that field and the alias is not a REGISTRY
    entry."""
    trained = engine.execute(
        "TRAIN MODEL rev_alias USING prophet(max_iter=10) "
        "FROM daily_revenue FORECAST revenue WITH TIME COLUMN day HORIZON 2"
    )
    assert trained.algorithm == "gradient_boosting_regressor"
    # the recorded name resolves in the estimator registry (the alias
    # 'prophet' would raise here, breaking EVALUATE/MONITOR)
    from declarativeml_spark.ml.registry import get_algorithm

    assert get_algorithm(trained.algorithm).kind == "regression"
    # and the registry record carries the resolved name too
    import json as _json
    import os as _os

    with open(_os.path.join(engine.model_dir, "registry.jsonl")) as f:
        recs = [_json.loads(line) for line in f if line.strip()]
    rec = [r for r in recs if r.get("name") == "rev_alias"][-1]
    assert rec["algorithm"] == "gradient_boosting_regressor"


def test_compare_models_ranks_nan_metric_last(engine, spark):
    """A model that lacks the primary metric must rank LAST (never
    corrupt the sort), and an unmeasurable metric across the board is
    a typed error."""
    from declarativeml_spark.ml.evaluate import compare_models
    from declarativeml_spark.plans.builder import build_features

    df = build_features(
        spark.table("orders_labeled"),
        ["o_totalprice", "log(o_totalprice + 1)"],
    ).df
    specs = [
        {"name": "ef_lr", "algorithm": "logistic_regression", "target": "expensive"},
        {"name": "ef_dt", "algorithm": "decision_tree", "target": "expensive"},
    ]
    out = compare_models(spark, specs, df, "accuracy", base=engine.model_dir)
    assert [r.rank for r in out.collect()] == [1, 2]
    with pytest.raises(ValueError, match="No compared model reports"):
        compare_models(spark, specs, df, "not_a_metric", base=engine.model_dir)


def test_feature_importance_does_not_truncate(engine, spark):
    """Fewer names than model features must fall back to positional
    names, never silently drop the tail importances."""
    from declarativeml_spark.ml.evaluate import feature_importance

    out = feature_importance(
        spark, "ef_dt", ["o_totalprice"], base=engine.model_dir
    ).collect()
    assert len(out) == 2  # both features present
    assert {r.feature for r in out} == {"o_totalprice", "f1"}


def test_forecast_null_tail_rejected(engine, spark):
    # 30 daily points; the LAST one is NULL — the seed window for the
    # iterative forecast must refuse it loudly (it previously became a
    # NaN lag and poisoned every step)
    spark.sql(
        "SELECT CAST(date_add(DATE'2024-01-01', CAST(id AS INT))"
        " AS TIMESTAMP) AS day,"
        " CASE WHEN id = 29 THEN NULL"
        "      ELSE CAST(100 + id AS DOUBLE) END AS revenue"
        " FROM range(30)"
    ).createOrReplaceTempView("null_rev")
    with pytest.raises(Exception, match="NULL|null"):
        engine.execute(
            "TRAIN MODEL fc_null USING linear_regression FROM null_rev "
            "FORECAST revenue WITH TIME COLUMN day HORIZON 3 LAGS [1]"
        )


def test_forecast_time_column_name_collision_rejected(engine, spark):
    spark.sql(
        "SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS step,"
        " CAST(SUM(o_totalprice) AS DOUBLE) AS revenue"
        " FROM orders GROUP BY 1"
    ).createOrReplaceTempView("step_rev")
    with pytest.raises(Exception, match="collides"):
        engine.execute(
            "TRAIN MODEL fc_step USING linear_regression FROM step_rev "
            "FORECAST revenue WITH TIME COLUMN step HORIZON 3 LAGS [1]"
        )


def test_holiday_integer_day_column_not_picked(engine, spark):
    """A table whose `day` column is INTEGER must not win the calendar
    name scan (it previously to_date'd every row to NULL and made the
    holidays feature a silent no-op)."""
    spark.sql(
        "SELECT CAST(id + 1 AS INT) AS day,"
        " CAST(date_add(DATE'2024-01-01', CAST(id AS INT)) AS DATE) AS dt"
        " FROM range(5)"
    ).createOrReplaceTempView("hol_intday")
    from declarativeml_spark.ml.forecast import _holiday_dates

    dates = _holiday_dates(spark, "hol_intday")
    assert dates == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05",
    ]


def test_forecast_unpersists_feature_plane_on_failure(
    engine, spark, monkeypatch
):
    """A fit/metrics/calibration exception must release the persisted
    feature plane (round-9 advice) — previously only the success path
    unpersisted, leaking one plane per failed TRAIN … FORECAST for
    the session's lifetime."""
    import declarativeml_spark.ml.training as tr

    before = set(spark.sparkContext._jsc.getPersistentRDDs().keys())

    def boom(*a, **k):
        raise RuntimeError("metrics exploded")

    # train_forecast imports _compute_metrics at call time from
    # ml.training — patch it at the source
    monkeypatch.setattr(tr, "_compute_metrics", boom)
    with pytest.raises(RuntimeError, match="metrics exploded"):
        engine.execute(
            "TRAIN MODEL rev_fc_leak USING linear_regression"
            " FROM daily_revenue FORECAST revenue WITH TIME COLUMN day"
            " HORIZON 3"
        )
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    assert after <= before, "failed forecast leaked persisted frames"


# --- round-10 evaluate.py review-sweep regressions ----------------------------


def test_explain_single_row_has_nonzero_contributions(engine, spark):
    """EXPLAIN PREDICTION m FOR <row>: the SHAP background must be the
    UNFILTERED source — the filtered row's own mean is the row, which
    collapsed every linear contribution to coef*(x-x)=0."""
    key = spark.table("orders_labeled").select("o_orderkey").first().o_orderkey
    out = engine.execute(
        f"EXPLAIN PREDICTION ef_lr FOR TRANSACTION o_orderkey = {key}"
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert any(abs(c.contribution) > 0 for c in row.contributions)
    assert row.prediction_value - row.base_value == pytest.approx(
        sum(c.contribution for c in row.contributions), abs=1e-6
    )


def test_explain_onehot_labels_from_slot_metadata(engine, spark):
    """A vector-expanding feature must not positionally mislabel the
    later slots — names come from the assembler's slot metadata."""
    engine.execute(
        "TRAIN MODEL ohe_clf USING logistic_regression(max_iter=5) "
        "FROM orders_labeled PREDICT expensive "
        "WITH FEATURES(TRANSFORM(one_hot_encoder(o_orderstatus)),"
        " o_totalprice)"
    )
    out = (
        engine.execute(
            "EXPLAIN PREDICTION FOR MODEL ohe_clf FROM orders_labeled"
        )
        .limit(1)
        .collect()[0]
    )
    names = [c.feature for c in out.contributions]
    # more slots than the 2 user features, and the scalar feature must
    # NOT be attributed to a one-hot slot name
    assert len(names) > 2
    assert any("o_totalprice" in n for n in names)
    assert "o_totalprice" not in names[1] or len(names) == 2


def test_evaluate_string_trained_model_on_numeric_column(engine, spark):
    """The MODEL decides label materialization: a string-trained
    classifier evaluated where the target column is numeric-castable
    must not crash with 'label already exists'."""
    engine.execute(
        "TRAIN MODEL str_eval USING logistic_regression(max_iter=5) "
        "FROM orders_labeled PREDICT o_orderstatus "
        "WITH FEATURES(o_totalprice)"
    )
    m = engine.execute(
        "EVALUATE MODEL str_eval ON orders_labeled METRICS (accuracy)"
    )
    assert 0.0 <= m["accuracy"] <= 1.0


def test_evaluate_unknown_metric_raises(engine):
    with pytest.raises(ValueError, match="not available"):
        engine.execute(
            "EVALUATE MODEL ef_lr ON orders_labeled METRICS (acuracy)"
        )


def test_compare_models_invalid_primary_metric(engine, spark):
    from declarativeml_spark.ml.evaluate import compare_models

    with pytest.raises(ValueError, match="plain metric identifier"):
        compare_models(
            spark, [], spark.range(1), primary_metric="f1 score"
        )
