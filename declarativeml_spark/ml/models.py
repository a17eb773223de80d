"""Model registry: versioned PipelineModel persistence + metadata table.

The reference specifies an ``ml_model`` composite + ``model_registry``
table (reference: DSL.md:179-188; DISTRIBUTED.md:76-95). Here the
registry is a directory of versioned MLlib models plus a JSON-lines
metadata file readable as a DataFrame — the Spark-native equivalent
(a Delta table on a real deployment; JSONL locally since Delta jars
aren't in this environment).

Layout:  $DML_MODEL_DIR/<name>/v<N>/   (PipelineModel.save)
         $DML_MODEL_DIR/registry.jsonl (one record per version)
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING, Optional

from pyspark.ml import PipelineModel


def _install_fast_params_writer() -> None:
    """Speed patch for Python-stage model persistence (measured on
    local[32], PySpark 4.1): ``DefaultParamsWriter.saveMetadata``
    builds its one-row metadata DataFrame from a plain local list —
    which parallelizes into defaultParallelism (32) mostly-EMPTY
    Python-RDD slices — then ``coalesce(1)`` drains all 32 slices
    sequentially through per-slice Python worker handshakes: ~6 s per
    Python stage saved, ~12 s per PipelineModel. Building the same
    one-row frame from a single-slice ``parallelize(..., 1)`` writes
    the identical metadata file in one task (~0.2 s). Guarded twice:
    API drift at install time leaves the stock writer bound, and any
    failure at CALL time (e.g. a Spark Connect session, where
    ``spark.sparkContext`` raises — the stock createDataFrame path is
    Connect-supported but the RDD fast path is not) delegates to the
    stock writer for that call instead of failing the save."""
    try:
        from pyspark.ml.util import DefaultParamsWriter
        from pyspark.sql import SparkSession

        original_get = DefaultParamsWriter._get_metadata_to_save
        original_save = DefaultParamsWriter.saveMetadata

        def save_metadata(instance, path, sc, extraMetadata=None, paramMap=None):
            try:
                spark = (
                    sc if hasattr(sc, "createDataFrame")
                    else SparkSession.active()
                )
                metadata_json = original_get(
                    instance, spark, extraMetadata, paramMap
                )
                # parallelize raises before any output exists, so the
                # fallback never collides with partial metadata files
                rdd = spark.sparkContext.parallelize([(metadata_json,)], 1)
            except Exception:
                original_save(
                    instance, path, sc,
                    extraMetadata=extraMetadata, paramMap=paramMap,
                )
                return
            spark.createDataFrame(rdd, "value string").write.text(
                os.path.join(path, "metadata")
            )

        DefaultParamsWriter.saveMetadata = staticmethod(save_metadata)
    except Exception:  # pragma: no cover — stock writer still correct
        pass


_install_fast_params_writer()
from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    from declarativeml_spark.ml.training import TrainedModel

DEFAULT_MODEL_DIR = os.environ.get("DML_MODEL_DIR", "/tmp/dml_models")


def _registry_path(base: Optional[str] = None) -> str:
    return os.path.join(base or DEFAULT_MODEL_DIR, "registry.jsonl")


def next_version(name: str, base: Optional[str] = None) -> int:
    model_dir = os.path.join(base or DEFAULT_MODEL_DIR, name)
    if not os.path.isdir(model_dir):
        return 1
    versions = [
        int(d[1:]) for d in os.listdir(model_dir) if d.startswith("v") and d[1:].isdigit()
    ]
    return max(versions, default=0) + 1


def registry_save(
    spark: SparkSession,
    trained: "TrainedModel",
    base: Optional[str] = None,
    statement: Optional[str] = None,
    extra: Optional[dict] = None,
) -> str:
    """Persist a trained model version + append registry metadata."""
    base = base or DEFAULT_MODEL_DIR
    version = next_version(trained.name, base)
    path = os.path.join(base, trained.name, f"v{version}")
    trained.pipeline_model.write().overwrite().save(path)
    trained.version = version
    trained.path = path

    os.makedirs(base, exist_ok=True)
    record = {
        "name": trained.name,
        "version": version,
        "algorithm": trained.algorithm,
        "features": trained.features,
        "target": trained.target,
        "performance_metrics": trained.metrics,
        "stopping_epoch": trained.stopping_epoch,
        "checkpoints": trained.checkpoints,
        "path": path,
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "status": "registered",
        # original DSL text: RETRAIN re-executes it (DSL.md:136-142)
        "statement": statement,
    }
    if extra:
        record.update(extra)
    with open(_registry_path(base), "a") as f:
        f.write(json.dumps(record) + "\n")
    return path


def trial_log_append(
    agent: str,
    model: str,
    method: str,
    metric: str,
    trials: list,
    best_trial: int,
    maximize: bool = True,
    base: Optional[str] = None,
) -> None:
    """Append a hyperparameter-search audit record (one line holding
    every trial's params + metric and the winner) to the registry
    metadata, so a finished search is inspectable after the fact
    (reference DSL.md:158-171 tuner agents; surfaced by
    ``Engine.tuning_trials``)."""
    base = base or DEFAULT_MODEL_DIR
    os.makedirs(base, exist_ok=True)
    record = {
        "record": "tuning_trials",
        "agent": agent,
        "name": model,
        "method": method,
        "metric": metric,
        # the search DIRECTION must persist with the log: a fresh
        # session reading this record has no tuner registry to consult,
        # and defaulting MINIMIZE searches to descending would rank the
        # WORST trial first
        "maximize": bool(maximize),
        "trials": trials,
        "best_trial": best_trial,
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(_registry_path(base), "a") as f:
        f.write(json.dumps(record) + "\n")


def trial_log_read(
    agent: str, base: Optional[str] = None
) -> Optional[dict]:
    """Latest tuning_trials record for an agent, or None."""
    base = base or DEFAULT_MODEL_DIR
    path = _registry_path(base)
    out: Optional[dict] = None
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("record") == "tuning_trials" and rec.get("agent") == agent:
                out = rec
    return out


def mark_version_status(
    name: str, version: int, status: str, base: Optional[str] = None
) -> None:
    """Append a status record for a version (e.g. rolled_back)."""
    base = base or DEFAULT_MODEL_DIR
    with open(_registry_path(base), "a") as f:
        f.write(json.dumps({"name": name, "version": version, "status": status}) + "\n")


def version_statuses(name: str, base: Optional[str] = None) -> dict[int, str]:
    """Latest status per version of a model."""
    base = base or DEFAULT_MODEL_DIR
    path = _registry_path(base)
    out: dict[int, str] = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("name") == name and rec.get("version") is not None:
                out[rec["version"]] = rec.get("status", "registered")
    return out


def registry_load(
    spark: SparkSession, name: str, version: Optional[int] = None, base: Optional[str] = None
) -> PipelineModel:
    """Load a model by name (latest non-rolled-back version unless pinned)."""
    base = base or DEFAULT_MODEL_DIR
    if version is None:
        statuses = version_statuses(name, base)
        live = [v for v, s in statuses.items() if s != "rolled_back"]
        if statuses and not live:
            # silently serving the very version that was rolled back
            # would undo the rollback for every downstream scorer
            raise ValueError(
                f"Every version of model {name!r} is rolled back; pin a"
                " version explicitly to override"
            )
        version = max(live) if live else next_version(name, base) - 1
    if version < 1:
        raise ValueError(f"No registered model named {name!r} in {base}")
    return PipelineModel.load(os.path.join(base, name, f"v{version}"))


def registry_meta(
    name: str, version: Optional[int] = None, base: Optional[str] = None
) -> dict:
    """The full registry record for a model — feature expressions,
    target, metrics, checkpoints — resolved like :func:`registry_load`:
    the latest NON-rolled-back version unless pinned. The registry is
    append-only JSONL: full records carry ``algorithm``; status-only
    records (deploy / rollback) override a version's status. Returns
    ``{}`` when no live record exists."""
    base = base or DEFAULT_MODEL_DIR
    path = _registry_path(base)
    if not os.path.exists(path):
        return {}
    full: dict[int, dict] = {}
    status: dict[int, str] = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("name") != name:
                continue
            ver = rec.get("version") or 1
            if "algorithm" in rec:
                full[ver] = rec
            if rec.get("status"):
                status[ver] = rec["status"]
    if version is not None:
        pick = version if version in full else None
    else:
        live = [
            v for v in full if status.get(v, "registered") != "rolled_back"
        ]
        pick = max(live) if live else None
    if pick is None:
        return {}
    rec = dict(full[pick])
    rec["status"] = status.get(pick, rec.get("status", "registered"))
    return rec


def registry_table(spark: SparkSession, base: Optional[str] = None) -> DataFrame:
    """The model registry as a DataFrame (ml_model analogue)."""
    path = _registry_path(base)
    if not os.path.exists(path):
        from pyspark.sql.types import StringType, StructField, StructType

        return spark.createDataFrame(
            [], StructType([StructField("name", StringType(), True)])
        )
    return spark.read.json(path)
