"""declarativeml_spark — a PySpark-native declarative ML / analytics engine.

A ground-up Spark implementation of the capabilities of
seanwevans/DeclarativeML (reference surveyed in SURVEY.md): a
declarative ML DSL (``TRAIN MODEL`` / ``COMPUTE``) compiled to Spark
DataFrame plans and MLlib pipelines, plus the relational surface the
reference delegates to its SQL engine, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Public API mirrors the reference's 4-name surface
(reference: dsl/__init__.py:3-5) and extends it:

    from declarativeml_spark import parse, compile_plan, TrainModel, ComputeKernel
"""

from declarativeml_spark.dsl.ir import (
    BalanceOption,
    CheckpointOption,
    ComputeKernel,
    DataSplit,
    OptimizeOption,
    TrainModel,
    ValidationOption,
)
from declarativeml_spark.compile import compile_plan
from declarativeml_spark.dsl.parser import parse

# Drop-in name parity with the reference's public API (reference:
# dsl/__init__.py:3-5 exports ``compile_sql``): same compile step,
# our executable artifact is a plan description rather than SQL text.
compile_sql = compile_plan

__all__ = [
    "TrainModel",
    "ComputeKernel",
    "DataSplit",
    "ValidationOption",
    "OptimizeOption",
    "BalanceOption",
    "CheckpointOption",
    "parse",
    "compile_plan",
    "compile_sql",
]

__version__ = "0.1.0"
