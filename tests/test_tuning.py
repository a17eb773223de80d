"""CREATE AGENT … SEARCH SPACE hyperparameter tuner (reference
DSL.md:158-171 — the last reference statement surface): verbatim
parse, deterministic budget-capped trial lattice, TrainValidationSplit
execution, and the registry audit trail.
"""

import json
import math

import pytest

from declarativeml_spark.dsl import ir
from declarativeml_spark.dsl.parser import parse, parse_script
from declarativeml_spark.engine import Engine
from declarativeml_spark.ml.tuning import build_trials
from declarativeml_spark.sources.catalog import register_views

# reference docs/DSL.md:158-171, byte for byte (trailing ; included)
_REFERENCE_STMT = """CREATE AGENT hyperparameter_tuner
  FOR MODEL recommendation_engine
  OPTIMIZE USING bayesian_optimization
  SEARCH SPACE {
    'learning_rate': log_uniform(0.001, 0.1),
    'embedding_dim': choice([64, 128, 256, 512]),
    'dropout_rate': uniform(0.1, 0.5)
  }
  MAXIMIZE recall
  WITH BUDGET 50 trials
  PARALLEL EXECUTION 4 workers;"""


@pytest.fixture(scope="module")
def engine(spark, smoke_dir, tmp_path_factory):
    register_views(spark, smoke_dir)
    spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice,
               -- a BAND label: one threshold split cannot express it,
               -- so the depth-1 base fit is genuinely hobbled and the
               -- tuner's deeper trials must win
               CAST(o_totalprice BETWEEN 80000 AND 180000 AS INT) AS expensive
        FROM orders
        """
    ).createOrReplaceTempView("orders_tuner")
    model_dir = str(tmp_path_factory.mktemp("tuner_models"))
    return Engine(spark, model_dir=model_dir)


def test_tuner_statement_parses_reference_verbatim():
    stmt = parse_script(_REFERENCE_STMT)[0]
    assert isinstance(stmt, ir.TunerAgent)
    assert stmt.name == "hyperparameter_tuner"
    assert stmt.model == "recommendation_engine"
    assert stmt.method == "bayesian_optimization"
    assert dict(stmt.space) == {
        "learning_rate": ("log_uniform", 0.001, 0.1),
        "embedding_dim": ("choice", (64, 128, 256, 512)),
        "dropout_rate": ("uniform", 0.1, 0.5),
    }
    assert stmt.metric == "recall" and stmt.maximize
    assert stmt.budget == 50 and stmt.workers == 4


def test_tuner_parse_validation():
    with pytest.raises(ValueError, match="Unknown search-space distribution"):
        parse(
            "CREATE AGENT t FOR MODEL m OPTIMIZE USING grid_search"
            " SEARCH SPACE {'x': normal(0, 1)} MAXIMIZE f1"
        )
    with pytest.raises(ValueError, match="twice"):
        parse(
            "CREATE AGENT t FOR MODEL m OPTIMIZE USING grid_search"
            " SEARCH SPACE {'x': uniform(0, 1), 'x': uniform(1, 2)}"
            " MAXIMIZE f1"
        )
    with pytest.raises(ValueError, match="lo < hi"):
        parse(
            "CREATE AGENT t FOR MODEL m OPTIMIZE USING grid_search"
            " SEARCH SPACE {'x': uniform(2, 1)} MAXIMIZE f1"
        )
    with pytest.raises(ValueError, match="positive"):
        parse(
            "CREATE AGENT t FOR MODEL m OPTIMIZE USING grid_search"
            " SEARCH SPACE {'x': log_uniform(0, 1)} MAXIMIZE f1"
        )
    with pytest.raises(ValueError, match="trial budget"):
        parse(
            "CREATE AGENT t FOR MODEL m OPTIMIZE USING grid_search"
            " SEARCH SPACE {'x': uniform(0, 1)} MAXIMIZE f1"
            " WITH BUDGET 0 trials"
        )
    # MINIMIZE accepted for loss metrics
    stmt = parse(
        "CREATE AGENT t FOR MODEL m OPTIMIZE USING grid_search"
        " SEARCH SPACE {'x': uniform(0, 1)} MINIMIZE rmse"
    )
    assert not stmt.maximize and stmt.metric == "rmse"


def test_build_trials_budget_cap_and_determinism():
    space = (
        ("learning_rate", ("log_uniform", 0.001, 0.1)),
        ("embedding_dim", ("choice", (64, 128, 256, 512))),
        ("dropout_rate", ("uniform", 0.1, 0.5)),
    )
    trials = build_trials(space, 50, "agent_a")
    assert len(trials) == 50  # capped exactly at the budget
    assert trials == build_trials(space, 50, "agent_a")  # deterministic
    assert trials != build_trials(space, 50, "agent_b")  # seed matters
    for t in trials:
        assert 0.001 < t["learning_rate"] < 0.1
        assert t["embedding_dim"] in (64, 128, 256, 512)
        assert 0.1 < t["dropout_rate"] < 0.5
    # log_uniform lattice is log-spaced: consecutive distinct values
    # have a constant ratio, not a constant difference
    lrs = sorted({t["learning_rate"] for t in trials})
    ratios = [lrs[i + 1] / lrs[i] for i in range(len(lrs) - 1)]
    assert max(ratios) - min(ratios) < 1e-9
    # a small product is NOT padded past its size
    tiny = build_trials((("d", ("choice", (1, 2, 3))),), 50, "k")
    assert [t["d"] for t in tiny] == [1, 2, 3]


def test_tuner_end_to_end_beats_default(engine, spark):
    # deliberately hobbled base fit: depth-1 stump on a threshold label
    engine.execute(
        "TRAIN MODEL tuned_clf USING decision_tree(max_depth=1, seed=7) "
        "FROM orders_tuner PREDICT expensive WITH FEATURES(o_totalprice) "
        "SPLIT DATA training=0.8, test=0.2 OPTIMIZE FOR f1"
    )
    agent = engine.execute(
        "CREATE AGENT stump_tuner FOR MODEL tuned_clf"
        " OPTIMIZE USING grid_search"
        " SEARCH SPACE {'max_depth': choice([1, 2, 3, 4, 5])}"
        " MAXIMIZE f1 WITH BUDGET 4 trials PARALLEL EXECUTION 2 workers"
    )
    assert isinstance(agent, ir.TunerAgent)
    trials = engine.run_tuner("stump_tuner")
    rows = trials.orderBy("rank").collect()
    assert len(rows) == 4  # budget caps the 5-point space
    assert rows[0].best and not rows[1].best
    # ranked: best first
    metrics = [r.f1 for r in rows]
    assert metrics == sorted(metrics, reverse=True)
    # a deeper tree must beat the stump on this non-linear label
    best = rows[0]
    assert float(best.params["max_depth"]) > 1.0
    stump = [r for r in rows if float(r.params["max_depth"]) == 1.0]
    if stump:  # the stump trial may or may not survive the budget cut
        assert best.f1 >= stump[0].f1
    # the winning trial registered a NEW version of the base model,
    # annotated with the chosen params
    recs = [
        json.loads(line)
        for line in open(f"{engine.model_dir}/registry.jsonl")
    ]
    tuned_versions = [
        r for r in recs
        if r.get("name") == "tuned_clf" and r.get("tuned_by") == "stump_tuner"
    ]
    assert len(tuned_versions) == 1
    assert tuned_versions[0]["version"] == 2
    assert tuned_versions[0]["trial_params"]["max_depth"] == int(
        float(best.params["max_depth"])
    )
    assert math.isclose(
        tuned_versions[0]["performance_metrics"]["tuned_f1"], best.f1
    )
    # the audit log replays through the engine surface
    audit = engine.tuning_trials("stump_tuner").orderBy("rank").collect()
    assert [(r.trial, r.f1) for r in audit] == [
        (r.trial, r.f1) for r in rows
    ]


def test_tuner_error_paths(engine):
    with pytest.raises(ValueError, match="No registered model"):
        engine.execute(
            "CREATE AGENT t2 FOR MODEL no_such_model OPTIMIZE USING"
            " grid_search SEARCH SPACE {'x': uniform(0, 1)} MAXIMIZE f1"
        )
    with pytest.raises(ValueError, match="Unknown optimization method"):
        engine.execute(
            "CREATE AGENT t3 FOR MODEL tuned_clf OPTIMIZE USING"
            " simulated_annealing SEARCH SPACE {'x': uniform(0, 1)}"
            " MAXIMIZE f1"
        )
    with pytest.raises(ValueError, match="Unknown tuner agent"):
        engine.run_tuner("never_registered")
    # unknown estimator param surfaces with the DSL name
    engine.execute(
        "CREATE AGENT t4 FOR MODEL tuned_clf OPTIMIZE USING grid_search"
        " SEARCH SPACE {'warp_factor': uniform(0, 1)} MAXIMIZE f1"
        " WITH BUDGET 2 trials"
    )
    with pytest.raises(ValueError, match="warp_factor"):
        engine.run_tuner("t4")
    # direction mismatch is a typed error, not a silent arg-min
    engine.execute(
        "CREATE AGENT t5 FOR MODEL tuned_clf OPTIMIZE USING grid_search"
        " SEARCH SPACE {'max_depth': choice([2, 3])} MINIMIZE f1"
    )
    with pytest.raises(ValueError, match="contradicts"):
        engine.run_tuner("t5")


def test_tuner_categorical_choice_space(engine):
    """choice() over STRING values (impurity) must survive the whole
    search — the trials schema is map<string,string> exactly so a
    categorical space can't crash after the paid-for fit."""
    engine.execute(
        "CREATE AGENT cat_tuner FOR MODEL tuned_clf OPTIMIZE USING"
        " grid_search SEARCH SPACE {'impurity': choice(['gini',"
        " 'entropy']), 'max_depth': choice([2, 3])} MAXIMIZE f1"
        " WITH BUDGET 4 trials"
    )
    rows = engine.run_tuner("cat_tuner").orderBy("rank").collect()
    assert len(rows) == 4
    assert {r.params["impurity"] for r in rows} == {"gini", "entropy"}
    audit = engine.tuning_trials("cat_tuner").collect()
    assert {r.params["impurity"] for r in audit} == {"gini", "entropy"}


def test_tuner_unknown_metric_rejected(engine):
    """_make_evaluator silently falls back to f1 for unknown names —
    the tuner must reject the name instead of optimizing the wrong
    objective under the requested label."""
    engine.execute(
        "CREATE AGENT ndcg_tuner FOR MODEL tuned_clf OPTIMIZE USING"
        " grid_search SEARCH SPACE {'max_depth': choice([2, 3])}"
        " MAXIMIZE ndcg WITH BUDGET 2 trials"
    )
    with pytest.raises(ValueError, match="Unknown metric 'ndcg'"):
        engine.run_tuner("ndcg_tuner")


def test_tuning_trials_minimize_ranking_survives_fresh_session(
    engine, spark
):
    """The search direction persists in the audit record: a fresh
    engine (no tuner registry) ranking a MINIMIZE search must put the
    SMALLEST value first, not default to descending."""
    from declarativeml_spark.engine import Engine

    engine.execute(
        "TRAIN MODEL price_reg_t USING linear_regression(max_iter=10) "
        "FROM orders_tuner PREDICT o_totalprice "
        "WITH FEATURES(o_custkey) SPLIT DATA training=0.8, test=0.2"
    )
    engine.execute(
        "CREATE AGENT rmse_tuner FOR MODEL price_reg_t OPTIMIZE USING"
        " grid_search SEARCH SPACE {'reg': choice([0.0, 0.5, 5.0])}"
        " MINIMIZE rmse WITH BUDGET 3 trials"
    )
    engine.run_tuner("rmse_tuner")
    fresh = Engine(spark, model_dir=engine.model_dir)
    audit = fresh.tuning_trials("rmse_tuner").orderBy("rank").collect()
    vals = [r.rmse for r in audit]
    assert vals == sorted(vals)  # MINIMIZE: ascending by rank
    assert audit[0].best


def test_compare_models_ranks_trials(engine, spark):
    """Trials surface through compare_models (the DSL.md:215-233
    inspection family): trials := 'agent' ranks the recorded search
    on the same ranked-table surface as registered models."""
    # depends on test_tuner_end_to_end_beats_default's tuner; rebuild
    # if this test runs alone
    if "stump_tuner" not in engine.tuners:
        engine.execute(
            "TRAIN MODEL tuned_clf USING decision_tree(max_depth=1, seed=7) "
            "FROM orders_tuner PREDICT expensive WITH FEATURES(o_totalprice) "
            "SPLIT DATA training=0.8, test=0.2 OPTIMIZE FOR f1"
        )
        engine.execute(
            "CREATE AGENT stump_tuner FOR MODEL tuned_clf"
            " OPTIMIZE USING grid_search"
            " SEARCH SPACE {'max_depth': choice([1, 2, 3, 4, 5])}"
            " MAXIMIZE f1 WITH BUDGET 4 trials PARALLEL EXECUTION 2 workers"
        )
        engine.run_tuner("stump_tuner")
    # trials alone
    ranked = engine.execute(
        "SELECT compare_models(trials := 'stump_tuner',"
        " test_data := 'orders_tuner', primary_metric := 'f1')"
    ).orderBy("rank").collect()
    assert len(ranked) == 4
    assert all(r.model.startswith("stump_tuner/trial") for r in ranked)
    vals = [r.f1 for r in ranked]
    assert vals == sorted(vals, reverse=True)  # MAXIMIZE: best first
    # mixed: the tuned model and the trials rank on one surface
    mixed = engine.execute(
        "SELECT compare_models(models := ARRAY['tuned_clf'],"
        " trials := 'stump_tuner', test_data := 'orders_tuner',"
        " primary_metric := 'f1')"
    ).orderBy("rank").collect()
    assert len(mixed) == 5
    assert {r.model for r in mixed} == {"tuned_clf"} | {
        r.model for r in ranked
    }
    mvals = [r.f1 for r in mixed]
    assert mvals == sorted(mvals, reverse=True)


def test_compare_models_trials_error_paths(engine):
    with pytest.raises(ValueError, match="No recorded search"):
        engine.execute(
            "SELECT compare_models(trials := 'nope',"
            " test_data := 'orders_tuner', primary_metric := 'f1')"
        )
    with pytest.raises(ValueError, match="recorded metric"):
        engine.execute(
            "SELECT compare_models(trials := 'stump_tuner',"
            " test_data := 'orders_tuner', primary_metric := 'accuracy')"
        )
    with pytest.raises(ValueError, match="needs models"):
        engine.execute(
            "SELECT compare_models(test_data := 'orders_tuner',"
            " primary_metric := 'f1')"
        )


# ---------------------------------------------------------------------------
# Round-11 review-sweep regressions (ml/tuning.py findings)


def test_annotate_statement_splices_and_roundtrips():
    """The tuner's registered statement must carry the CHOSEN params:
    RETRAIN re-executes the stored statement, so an un-annotated one
    silently reverts the tuning."""
    from declarativeml_spark.ml.tuning import annotate_statement

    base = (
        "TRAIN MODEL churn USING logistic_regression(max_iter=10,"
        " reg=0.1) FROM orders PREDICT expensive"
        " WITH FEATURES(o_totalprice)"
    )
    out = annotate_statement(
        base, "logistic_regression", {"max_iter": 40, "reg": 0.01}
    )
    assert "USING logistic_regression(max_iter=40, reg=0.01)" in out
    # bare USING (no param list) gains one
    bare = (
        "TRAIN MODEL churn USING decision_tree FROM orders"
        " PREDICT expensive WITH FEATURES(o_totalprice)"
    )
    out2 = annotate_statement(bare, "decision_tree", {"max_depth": 5})
    assert "USING decision_tree(max_depth=5)" in out2
    # nested list params survive the balanced-paren scan
    nn = (
        "TRAIN MODEL n USING neural_network(layers=[4, 8], max_iter=3)"
        " FROM orders PREDICT expensive WITH FEATURES(o_totalprice)"
    )
    out3 = annotate_statement(
        nn, "neural_network", {"layers": [16, 32], "max_iter": 7}
    )
    assert "layers=[16, 32]" in out3 and "max_iter=7" in out3
    # string values render in the DSL's own single-quote syntax
    dt = annotate_statement(
        bare, "decision_tree", {"max_depth": 3, "impurity": "gini"}
    )
    assert "impurity='gini'" in dt


def test_best_trial_total_order_matches_spark_under_nan():
    """Python-side ranking must use Scala's Double total order (NaN
    above +inf) so best_i always describes the model TVS actually
    saved as bestModel."""
    import math

    metrics = [float("nan"), 0.8, 0.9]

    def key(i):
        m = metrics[i]
        return (1, 0.0) if math.isnan(m) else (0, m)

    # maximize: Scala maxBy picks the NaN (total order: NaN greatest)
    assert sorted(range(3), key=key, reverse=True)[0] == 0
    # minimize: Scala minBy avoids the NaN
    assert sorted(range(3), key=key)[0] == 1


def test_tuned_model_statement_carries_winning_params(engine, spark):
    """End-to-end: after a search, the registered version's stored
    statement re-parses with the winning trial's params merged in."""
    from declarativeml_spark.dsl.parser import parse
    from declarativeml_spark.ml.models import registry_meta

    engine.execute(
        "TRAIN MODEL tuned_base USING logistic_regression(max_iter=2,"
        " reg=0.5) FROM orders_tuner PREDICT expensive"
        " WITH FEATURES(o_totalprice)"
    )
    engine.execute(
        "CREATE AGENT ann_tuner FOR MODEL tuned_base OPTIMIZE USING"
        " grid_search SEARCH SPACE {max_iter: choice([3, 6])}"
        " MAXIMIZE accuracy WITH BUDGET 2 trials"
    )
    engine.run_tuner("ann_tuner")
    meta = registry_meta("tuned_base", base=engine.model_dir)
    stmt = parse(meta["statement"])
    chosen = meta.get("trial_params") or {}
    assert chosen, meta
    got = dict(stmt.params)
    for k, v in chosen.items():
        assert got.get(k) == v, (k, got, chosen)
    # un-tuned base params survive unless overridden by the trial
    assert got.get("reg") == 0.5
