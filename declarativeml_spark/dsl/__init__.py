from declarativeml_spark.dsl.ir import (
    BalanceOption,
    CheckpointOption,
    ComputeKernel,
    DataSplit,
    OptimizeOption,
    TrainModel,
    ValidationOption,
)
from declarativeml_spark.dsl.parser import DSLSyntaxError, parse

__all__ = [
    "TrainModel",
    "ComputeKernel",
    "DataSplit",
    "ValidationOption",
    "OptimizeOption",
    "BalanceOption",
    "CheckpointOption",
    "parse",
    "DSLSyntaxError",
]
