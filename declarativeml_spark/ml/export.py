"""Driver-local model export: the single-row-latency serving shape.

The reference's deploy config names two numbers (reference:
DSL.md:62-63 — ``max_latency: 50ms``, ``throughput: 1000 rps``). The
micro-batch streaming endpoint (streaming/serving.py) is the right
THROUGHPUT shape — measured sustaining 50× the target — but its
per-record latency is floored by Spark's job-launch cost (~120-160 ms
× 2-3 per cycle, measured in BASELINE.md's round-10 table), so the
50 ms p99 target is structurally unreachable through it. The
standard deployment shape for single-row latency is an EXPORTED
scorer: the fitted pipeline's arithmetic extracted into plain Python
so a request never launches a Spark job. This module implements that
export for the pipeline stages the TRAIN surface emits, replicating
each stage's exact IEEE operation order so exported predictions are
BIT-IDENTICAL to ``PipelineModel.transform`` (asserted in
tests/test_serving.py).

Scale note: the exported scorer is a serving artifact, not a data-
plane operator — batch/stream scoring at corpus scale stays on the
cluster (model broadcast, executor-parallel transform); this is the
request/response path only.
"""

from __future__ import annotations

import math
import time
from typing import Callable, Optional

from pyspark.sql import SparkSession

__all__ = [
    "LocalScorer",
    "export_scorer",
    "measure_local_scorer_latency",
    "percentile_nearest_rank",
]


def percentile_nearest_rank(
    xs: list, p: float, digits: int
) -> Optional[float]:
    """Nearest-rank percentile over unsorted samples — the ONE
    implementation both serving shapes report through (they are
    recorded side by side in BASELINE.md, so their rank/rounding
    conventions must never drift apart)."""
    if not xs:
        return None
    xs = sorted(xs)
    i = min(len(xs) - 1, int(round(p * (len(xs) - 1))))
    return round(xs[i], digits)


class LocalScorer:
    """Pure-Python replica of a fitted PipelineModel's row transform.

    ``steps`` is a list of ``(kind, payload)`` tuples compiled by
    :func:`export_scorer`; ``score_row`` applies them to one request
    dict (which must carry the assembler's input columns — feature
    VALUES arrive with the request, exactly as a production endpoint
    receives them) and returns ``{"prediction": …}`` plus
    ``"probability"`` for classifiers.

    Exact-parity discipline: every dot product accumulates
    SEQUENTIALLY in feature order (MLlib's reference BLAS ``ddot`` /
    the ridge model's left-leaning expression tree), scalers multiply
    by the PRECOMPUTED reciprocal of std (MLlib stores ``1/std``, and
    ``(x-m)*(1/s)`` differs from ``(x-m)/s`` in the last ulp), and
    the logistic link is ``1/(1+exp(-margin))`` — the exact MLlib
    forms, and the binomial probability pair is MLlib's exact
    formula (``p0 = sigmoid(-margin)`` direct, ``p1 = 1 - p0`` — NOT
    the direct sigmoid of ``+margin``). Everything is therefore
    bitwise-identical — predictions, margins (``rawPrediction``),
    linear/ridge outputs, probabilities — up to the single documented
    residue: ``exp`` is a JVM intrinsic permitted 1 ulp of error, so
    an occasional probability cell lands 1 ulp off CPython's libm
    (measured: 599/600 cells exact, worst 1.0 ulp; asserted at that
    bound in tests/test_serving.py). The DECISION (sign of the exact
    margin) never differs.
    """

    def __init__(self, steps: list, model_name: str):
        self.steps = steps
        self.model_name = model_name

    def score_row(self, row: dict) -> dict:
        vec: Optional[list] = None
        out: dict = {}
        for kind, p in self.steps:
            if kind == "assemble":
                try:
                    vec = [float(row[c]) for c in p]
                except KeyError as e:
                    raise KeyError(
                        f"request is missing feature column {e} —"
                        f" the exported scorer needs {p}"
                    ) from None
                except (TypeError, ValueError):
                    bad = sorted(
                        c
                        for c in p
                        if not isinstance(row.get(c), (int, float))
                    )
                    # a present-but-None (or non-numeric) value would
                    # otherwise surface as an opaque float(None)
                    # TypeError with no column name
                    raise ValueError(
                        "request has NULL/non-numeric value(s) for"
                        f" feature column(s) {bad} — the exported"
                        f" scorer needs numeric {p}"
                    ) from None
            elif kind == "scale":
                mean, inv_std, with_mean, with_std = p
                assert vec is not None
                if with_mean and with_std:
                    vec = [
                        (v - m) * s for v, m, s in zip(vec, mean, inv_std)
                    ]
                elif with_mean:
                    vec = [v - m for v, m in zip(vec, mean)]
                elif with_std:
                    vec = [v * s for v, s in zip(vec, inv_std)]
            elif kind == "logistic":
                coef, intercept = p
                assert vec is not None
                margin = 0.0
                for c, v in zip(coef, vec):
                    margin += c * v
                margin += intercept
                # MLlib's binomial pair, EXACTLY: class 0 through the
                # sigmoid of raw0 = -margin, class 1 as the complement
                # (established empirically against transform() over 300
                # rows: p0 always equals the direct sigmoid bit-for-bit,
                # p1 always equals fl(1 - p0) — NOT the direct sigmoid
                # of +margin, which differs at the small-p1 tail)
                prob0 = 1.0 / (1.0 + math.exp(margin))
                prob1 = 1.0 - prob0
                out["rawPrediction"] = [-margin, margin]
                out["probability"] = [prob0, prob1]
                out["prediction"] = 1.0 if margin > 0.0 else 0.0
            elif kind == "linear":
                coef, intercept = p
                assert vec is not None
                pred = 0.0
                for c, v in zip(coef, vec):
                    pred += c * v
                out["prediction"] = pred + intercept
            elif kind == "ridge":
                # the ridge model's exact expression tree:
                # ((b0 + c1*x1) + c2*x2) … — intercept FIRST
                coef, intercept = p
                assert vec is not None
                pred = intercept
                for c, v in zip(coef, vec):
                    pred = pred + c * v
                out["prediction"] = pred
            else:  # pragma: no cover - export_scorer refuses these
                raise ValueError(f"unknown step kind {kind!r}")
        return out


def export_scorer(
    spark: SparkSession, model_name: str, base: Optional[str] = None
) -> LocalScorer:
    """Compile a registered model's fitted stages into a
    :class:`LocalScorer`.

    Supported stages (the TRAIN surface's emission set):
    ``VectorAssembler``, ``StandardScalerModel``,
    ``LogisticRegressionModel`` (binary, default threshold),
    ``LinearRegressionModel``, ``RidgeClosedFormModel``. Any other
    stage refuses loudly — an exported scorer that silently skipped
    a stage would serve wrong predictions.
    """
    from declarativeml_spark.ml.models import registry_load

    model = registry_load(spark, model_name, base=base)
    steps: list = []
    for stage in model.stages:
        cls = type(stage).__name__
        if cls == "VectorAssembler":
            steps.append(("assemble", list(stage.getInputCols())))
        elif cls == "StandardScalerModel":
            std = list(stage.std.toArray())
            inv = [1.0 / s if s != 0.0 else 0.0 for s in std]
            steps.append(
                (
                    "scale",
                    (
                        list(stage.mean.toArray()),
                        inv,
                        stage.getWithMean(),
                        stage.getWithStd(),
                    ),
                )
            )
        elif cls == "LogisticRegressionModel":
            if stage.numClasses != 2:
                raise ValueError(
                    "export_scorer supports binary logistic regression"
                    f" only; {model_name!r} has"
                    f" {stage.numClasses} classes"
                )
            t = stage.getThreshold()
            if t is not None and t != 0.5:
                raise ValueError(
                    "export_scorer replicates the default 0.5 decision"
                    f" threshold; {model_name!r} sets {t}"
                )
            steps.append(
                (
                    "logistic",
                    (list(stage.coefficients.toArray()),
                     float(stage.intercept)),
                )
            )
        elif cls == "LinearRegressionModel":
            steps.append(
                (
                    "linear",
                    (list(stage.coefficients.toArray()),
                     float(stage.intercept)),
                )
            )
        elif cls == "RidgeClosedFormModel":
            steps.append(
                (
                    "ridge",
                    (
                        [float(c) for c in stage.getCoefficients()],
                        float(stage.getIntercept()),
                    ),
                )
            )
        else:
            raise ValueError(
                f"export_scorer cannot export stage {cls!r} of"
                f" {model_name!r} — supported: VectorAssembler,"
                " StandardScalerModel, LogisticRegressionModel,"
                " LinearRegressionModel, RidgeClosedFormModel"
            )
    if not any(k in ("logistic", "linear", "ridge") for k, _ in steps):
        raise ValueError(
            f"{model_name!r} has no exportable prediction stage"
        )
    if not steps or steps[0][0] != "assemble":
        # fail at EXPORT, not on the first request: every scale/model
        # step consumes the assembled vector, and score_row would die
        # on a bare assert (or a zip TypeError under python -O)
        raise ValueError(
            f"{model_name!r} has no leading VectorAssembler stage —"
            " the exported scorer needs the assembler to map request"
            " columns to the feature vector"
        )
    return LocalScorer(steps, model_name)


def measure_local_scorer_latency(
    scorer: LocalScorer,
    request_fn: Callable[[int], dict],
    *,
    rows_per_second: int = 1000,
    duration_s: float = 5.0,
    warmup_s: float = 0.5,
) -> dict:
    """Drive the exported scorer at ``rows_per_second`` for
    ``duration_s`` and report per-request p50/p99 latency and
    sustained throughput — the reference's deploy numbers
    (DSL.md:62-63) measured against the driver-local shape.

    Latency per request = completion wall-clock minus the request's
    SCHEDULED arrival (so a scorer slower than the offered rate
    accumulates queueing delay instead of hiding it). Returns the
    same keys as ``measure_serving_latency`` so BASELINE.md records
    the two shapes side by side.
    """
    n = int(rows_per_second * duration_s)
    lat_ms: list = []
    t0 = time.perf_counter()
    for i in range(n):
        sched = t0 + i / rows_per_second
        now = time.perf_counter()
        if now < sched:
            time.sleep(sched - now)
        scorer.score_row(request_fn(i))
        done = time.perf_counter()
        lat_ms.append(((done - sched) * 1000.0, sched, done))
    cut = t0 + warmup_s
    steady = [(ms, done) for ms, sched, done in lat_ms if sched >= cut]
    lats = [ms for ms, _ in steady]
    # throughput over the ACTUAL completion span, not the nominal
    # schedule — dividing the scheduled row count by duration_s would
    # always report ≈ the offered rate (the exact 'generation
    # timestamps measure the source's rate' error serving.py warns
    # against for the streaming shape)
    comps = [done for _, done in steady]
    span = (max(comps) - min(comps)) if len(comps) > 1 else None
    p50 = percentile_nearest_rank(lats, 0.50, 3)
    p99 = percentile_nearest_rank(lats, 0.99, 3)
    rows_per_s = (
        round((len(steady) - 1) / span, 1) if span and span > 0 else None
    )
    return {
        "shape": "exported_local_scorer",
        "model": scorer.model_name,
        "offered_rps": rows_per_second,
        "duration_s": duration_s,
        "n_rows": len(steady),
        "rows_per_s": rows_per_s,
        "p50_ms": p50,
        "p99_ms": p99,
        "max_ms": round(max(lats), 3) if lats else None,
        "target_latency_ms": 50.0,
        "meets_latency_50ms": (p99 is not None and p99 <= 50.0),
        "meets_throughput_1000rps": (
            rows_per_s is not None and rows_per_s >= 1000.0
        ),
    }
