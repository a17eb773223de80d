"""Algorithm registry: DSL algorithm names → MLlib estimator factories.

The reference passes the algorithm name + params opaquely to
``ml_train_model`` (reference: dsl/parser.py:843-846); the spec names
the supported algorithms across its docs (DSL.md:273
``linear_regression``, README.md:158 ``xgboost`` aspiration,
tests/test_cli.py:31-33 ``logistic_regression``, DSL.md:36
``gradient_boosting``, DSL.md:55 ``random_forest``, DSL.md:103
``neural_network``, DSL.md:304 ``prophet`` time series). Here each
name resolves to an MLlib estimator with a parameter-name translation
table, so DSL params like ``max_iter=10`` land on ``maxIter``.

Scale note: every estimator here trains via MLlib's distributed
fitting (treeAggregate for GLMs, distributed histogram building for
trees) — the reference's entire DISTRIBUTED.md gradient-shipping
design (DISTRIBUTED.md:271-343) collapses into these built-ins.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict

from pyspark.ml.classification import (
    DecisionTreeClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    NaiveBayes,
    RandomForestClassifier,
)
from pyspark.ml.clustering import BisectingKMeans, GaussianMixture, KMeans
from pyspark.ml.regression import (
    DecisionTreeRegressor,
    GBTRegressor,
    GeneralizedLinearRegression,
    LinearRegression,
    RandomForestRegressor,
)


@dataclass
class AlgorithmSpec:
    name: str
    factory: Callable[..., Any]
    kind: str  # "classification" | "regression" | "clustering"
    param_map: Dict[str, str] = field(default_factory=dict)
    # params consumed by the training driver, not the estimator
    driver_params: tuple = ()
    supports_weight_col: bool = True

    def build(self, params: dict[str, Any], **overrides: Any):
        kwargs: dict[str, Any] = {}
        for key, value in params.items():
            mapped = self.param_map.get(key, key)
            kwargs[mapped] = value
        kwargs.update(overrides)
        return self.factory(**kwargs)


_COMMON_ITER = {"max_iter": "maxIter", "epochs": "maxIter", "iterations": "maxIter"}
_COMMON_REG = {"reg": "regParam", "regularization": "regParam", "l1_ratio": "elasticNetParam"}
# Tree-family aliases, split by what each estimator ACTUALLY exposes —
# an alias to a parameter the estimator lacks crashes setParams at fit
# time on a documented DSL name (e.g. GBTs count boosting rounds in
# maxIter, not numTrees; plain decision trees have no ensemble knobs;
# RandomForest has no learning rate).
_TREE_BASE = {
    "max_depth": "maxDepth",
    "min_instances_per_node": "minInstancesPerNode",
    "seed": "seed",
}
_FOREST_TREE = {
    **_TREE_BASE,
    "num_trees": "numTrees",
    "n_estimators": "numTrees",
    "subsample": "subsamplingRate",
}
_GBT_TREE = {
    **_TREE_BASE,
    # boosting rounds: the sklearn-style n_estimators IS maxIter here
    "num_trees": "maxIter",
    "n_estimators": "maxIter",
    "subsample": "subsamplingRate",
    "learning_rate": "stepSize",
}

REGISTRY: dict[str, AlgorithmSpec] = {}


def _register(spec: AlgorithmSpec) -> None:
    REGISTRY[spec.name] = spec


_register(
    AlgorithmSpec(
        "logistic_regression",
        LogisticRegression,
        "classification",
        {**_COMMON_ITER, **_COMMON_REG, "tol": "tol", "threshold": "threshold"},
    )
)
_register(
    AlgorithmSpec(
        "linear_regression",
        LinearRegression,
        "regression",
        {**_COMMON_ITER, **_COMMON_REG, "tol": "tol"},
    )
)
_register(
    AlgorithmSpec(
        "glm",
        GeneralizedLinearRegression,
        "regression",
        # GLR has no elasticNetParam — only the plain reg aliases
        {**_COMMON_ITER, "reg": "regParam", "regularization": "regParam",
         "family": "family", "link": "link", "tol": "tol"},
    )
)
_register(
    AlgorithmSpec(
        "decision_tree",
        DecisionTreeClassifier,
        "classification",
        dict(_TREE_BASE),
    )
)
_register(
    AlgorithmSpec(
        "decision_tree_regressor",
        DecisionTreeRegressor,
        "regression",
        dict(_TREE_BASE),
    )
)
def _ridge_factory(**kwargs):
    # local import: ridge.py imports pyspark.ml.param machinery that
    # needs no session, but keeping the registry import-light matters
    # for CLI startup
    from declarativeml_spark.ml.ridge import RidgeClosedForm

    return RidgeClosedForm(**kwargs)


_register(
    AlgorithmSpec(
        "ridge_closed_form",
        _ridge_factory,
        "regression",
        {"lambda": "lam", "reg": "lam", "regularization": "lam"},
        supports_weight_col=False,
    )
)
_register(
    AlgorithmSpec(
        "random_forest",
        RandomForestClassifier,
        "classification",
        dict(_FOREST_TREE),
    )
)
_register(
    AlgorithmSpec(
        "random_forest_regressor",
        RandomForestRegressor,
        "regression",
        dict(_FOREST_TREE),
    )
)
_register(
    AlgorithmSpec(
        "gradient_boosting",
        GBTClassifier,
        "classification",
        {**_GBT_TREE, **_COMMON_ITER},
    )
)
_register(
    AlgorithmSpec(
        "gradient_boosting_regressor",
        GBTRegressor,
        "regression",
        {**_GBT_TREE, **_COMMON_ITER},
    )
)
_register(
    AlgorithmSpec(
        "naive_bayes",
        NaiveBayes,
        "classification",
        {"smoothing": "smoothing", "model_type": "modelType"},
    )
)
_register(
    AlgorithmSpec(
        "linear_svc",
        LinearSVC,
        "classification",
        # LinearSVC has no elasticNetParam — only the plain reg aliases
        {**_COMMON_ITER, "reg": "regParam", "regularization": "regParam",
         "tol": "tol"},
    )
)
_register(
    AlgorithmSpec(
        "neural_network",
        MultilayerPerceptronClassifier,
        "classification",
        {**_COMMON_ITER, "layers": "layers", "block_size": "blockSize", "seed": "seed"},
        supports_weight_col=False,
    )
)
_register(
    AlgorithmSpec(
        "kmeans",
        KMeans,
        "clustering",
        {**_COMMON_ITER, "k": "k", "clusters": "k", "seed": "seed"},
        supports_weight_col=False,
    )
)
_register(
    AlgorithmSpec(
        "bisecting_kmeans",
        BisectingKMeans,
        "clustering",
        {**_COMMON_ITER, "k": "k", "seed": "seed"},
        supports_weight_col=False,
    )
)
_register(
    AlgorithmSpec(
        "gaussian_mixture",
        GaussianMixture,
        "clustering",
        {**_COMMON_ITER, "k": "k", "seed": "seed"},
        supports_weight_col=False,
    )
)


def get_algorithm(name: str) -> AlgorithmSpec:
    try:
        return REGISTRY[name]
    except KeyError:
        known = ", ".join(sorted(REGISTRY))
        raise ValueError(f"Unknown algorithm {name!r}; known algorithms: {known}") from None
