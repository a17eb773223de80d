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
    spark: SparkSession, trained: "TrainedModel", base: Optional[str] = None
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
        "checkpoints": trained.checkpoints,
        "path": path,
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "status": "registered",
    }
    with open(_registry_path(base), "a") as f:
        f.write(json.dumps(record) + "\n")
    return path


def registry_load(
    spark: SparkSession, name: str, version: Optional[int] = None, base: Optional[str] = None
) -> PipelineModel:
    """Load a model by name (latest version unless pinned)."""
    base = base or DEFAULT_MODEL_DIR
    if version is None:
        version = next_version(name, base) - 1
    if version < 1:
        raise ValueError(f"No registered model named {name!r} in {base}")
    return PipelineModel.load(os.path.join(base, name, f"v{version}"))


def registry_table(spark: SparkSession, base: Optional[str] = None) -> DataFrame:
    """The model registry as a DataFrame (ml_model analogue)."""
    path = _registry_path(base)
    if not os.path.exists(path):
        from pyspark.sql.types import StringType, StructField, StructType

        return spark.createDataFrame(
            [], StructType([StructField("name", StringType(), True)])
        )
    return spark.read.json(path)
