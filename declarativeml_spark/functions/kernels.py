"""COMPUTE kernel registry and execution.

The reference's COMPUTE statement registers a *named* kernel
computation over input columns into an output column, optionally on a
tick schedule (reference: dsl/parser.py:43-58 grammar; emission
parser.py:848-878 ``ml_register_compute(kernel_name, name, inputs,
output, schedule_ticks, options)``; kernels like ``vector_add`` are
resolved at execution time — README.md:66-72).

Spark mapping: a kernel is a function ``[Column, ...] -> Column``.
Built-ins are pure ``pyspark.sql.functions`` compositions (JVM
codegen — the fast path); custom Python kernels register as
Arrow-vectorized pandas UDFs (the analogue of the reference's GPU
batch kernels — EXTENSIONS.md:99-112 dispatches CUDA/BLAS/CPU by
size; we dispatch JVM-expression vs Arrow-batch by registration
type). BLOCK/GRID/SHARED are validated then recorded as advisory
hints (BLOCK maps to the Arrow batch size at application time).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from declarativeml_spark.dsl.ir import ComputeKernel

KernelFn = Callable[..., Column]


@dataclass
class KernelSpec:
    name: str
    fn: KernelFn
    arity: Optional[int] = None  # None = variadic
    description: str = ""
    vectorized: bool = False  # True when backed by a pandas UDF


KERNELS: Dict[str, KernelSpec] = {}


def register_kernel(
    name: str,
    fn: KernelFn,
    arity: Optional[int] = None,
    description: str = "",
    vectorized: bool = False,
) -> None:
    KERNELS[name] = KernelSpec(name, fn, arity, description, vectorized)


def get_kernel(name: str) -> KernelSpec:
    try:
        return KERNELS[name]
    except KeyError:
        known = ", ".join(sorted(KERNELS))
        raise ValueError(f"Unknown kernel {name!r}; known kernels: {known}") from None


# --- built-in kernels (JVM expressions — whole-stage codegen) --------------
def _vector_add(*cols: Column) -> Column:
    """Elementwise array addition for 2+ array columns, or scalar sum."""
    out = cols[0]
    for c in cols[1:]:
        out = F.zip_with(out, c, lambda a, b: a + b)
    return out


def _scalar_add(*cols: Column) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def _vector_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _vector_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def _cosine_similarity(a: Column, b: Column) -> Column:
    return _vector_dot(a, b) / (_vector_norm(a) * _vector_norm(b))


def _vector_scale(a: Column, k: Column) -> Column:
    return F.transform(a, lambda x: x * k)


def _sigmoid(x: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def _relu(x: Column) -> Column:
    return F.greatest(x, F.lit(0.0))


def _log_scale(x: Column) -> Column:
    return F.log1p(F.abs(x)) * F.signum(x)


register_kernel("vector_add", _vector_add, None, "elementwise array addition")
register_kernel("scalar_add", _scalar_add, None, "scalar column sum")
register_kernel("vector_dot", _vector_dot, 2, "array dot product")
register_kernel("vector_norm", _vector_norm, 1, "array L2 norm")
register_kernel("cosine_similarity", _cosine_similarity, 2, "array cosine similarity")
register_kernel("vector_scale", _vector_scale, 2, "array scalar multiply")
register_kernel("sigmoid", _sigmoid, 1, "logistic sigmoid")
register_kernel("relu", _relu, 1, "rectified linear")
register_kernel("log_scale", _log_scale, 1, "signed log1p compression")


# --- registered computations ------------------------------------------------
@dataclass
class ComputeRegistration:
    """A registered COMPUTE: the reference's ml_register_compute row."""

    name: str
    kernel: str
    inputs: Optional[List[str]]
    output: Optional[str]
    schedule_ticks: Optional[int]
    options: Dict[str, Any] = field(default_factory=dict)


COMPUTATIONS: Dict[str, ComputeRegistration] = {}


def execute_compute(spark: SparkSession, stmt: ComputeKernel) -> ComputeRegistration:
    """Register a COMPUTE statement (validates the kernel AND its
    input arity NOW — deferring an arity mismatch to tick time would
    surface it as a bare IndexError inside the streaming loop)."""
    spec = get_kernel(stmt.kernel)
    n_inputs = len(stmt.inputs or [])
    if spec.arity is not None and n_inputs != spec.arity:
        raise ValueError(
            f"Kernel {spec.name!r} expects {spec.arity} inputs,"
            f" got {n_inputs}"
        )
    if spec.arity is None and n_inputs == 0:
        raise ValueError(
            f"Kernel {spec.name!r} is variadic but needs at least one"
            " input column — add a FROM table(col, ...) clause"
        )
    reg = ComputeRegistration(
        name=stmt.name,
        kernel=stmt.kernel,
        inputs=stmt.inputs,
        output=stmt.output,
        schedule_ticks=stmt.schedule_ticks,
        options=dict(stmt.options or {}),
    )
    COMPUTATIONS[stmt.name] = reg
    return reg


def apply_compute(df: DataFrame, name: str) -> DataFrame:
    """Apply a registered computation to a DataFrame.

    ``BLOCK n`` is honored as the Arrow batch size for vectorized
    kernels via the session conf (advisory, per SURVEY.md §2.10).
    """
    reg = COMPUTATIONS.get(name)
    if reg is None:
        raise ValueError(f"No registered computation named {name!r}")
    spec = get_kernel(reg.kernel)
    inputs = reg.inputs or []
    if spec.arity is not None and len(inputs) != spec.arity:
        raise ValueError(
            f"Kernel {spec.name!r} expects {spec.arity} inputs, got {len(inputs)}"
        )
    block = reg.options.get("BLOCK")
    if block and spec.vectorized:
        df.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(block)
        )
    out_col = reg.output or f"{name}_out"
    return df.withColumn(out_col, spec.fn(*[F.col(c) for c in inputs]))
