"""Plan builder: statement IR → DataFrame plans + pipeline stages.

This is the Spark replacement for the reference's SQL emission
(reference: dsl/parser.py:747-880 emits ``SELECT ml_train_model(...)``
with an embedded ``training_data`` SELECT). Instead of SQL text we
build the actual Catalyst plan:

* identifier sources resolve through the session catalog
  (``spark.table``) — schema errors surface at plan time, which
  implements the reference's spec'd compile-time validation
  (DSL.md:358-368) with Catalyst's analyzer;
* fragment sources (joins/subqueries/WHERE tails) go through the
  injection validator and then ``spark.sql`` — Catalyst parses and
  optimizes the fragment like any other query;
* feature expressions compile to ``F.expr`` columns (JVM codegen, no
  Python boundary); ``TRANSFORM(...)`` / ``DERIVED(...)`` markers
  route to MLlib pipeline stages per DSL.md:89-95.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional

from pyspark.ml import Transformer
from pyspark.ml.feature import OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from declarativeml_spark.dsl.features import (
    Call,
    FeatureExpr,
    Identifier,
    parse_feature_expr,
)
from declarativeml_spark.dsl.source import validate_source_fragment

_TRANSFORM_MARKERS = {"TRANSFORM", "DERIVED"}


def resolve_source(spark: SparkSession, source: str, is_identifier: bool) -> DataFrame:
    """Resolve a FROM clause to a DataFrame.

    Identifier mode hits the catalog directly; fragment mode is
    validated then parsed by Catalyst via ``spark.sql``. Fragments can
    reference any registered temp view or catalog table.
    """
    if is_identifier:
        return spark.table(f"`{source}`")
    validate_source_fragment(source)
    return spark.sql(f"SELECT * FROM {_to_spark_quoting(source)}")


def _to_spark_quoting(fragment: str) -> str:
    """Translate ANSI double-quoted identifiers to Spark backticks.

    The DSL (like the reference's PostgreSQL target) quotes
    identifiers with double quotes; in Spark SQL a double-quoted
    token is a string literal. Single-quoted strings are preserved
    untouched.
    """
    import re

    out: list[str] = []
    i = 0
    n = len(fragment)
    while i < n:
        ch = fragment[i]
        if ch == "'":  # skip single-quoted string ('' escapes)
            j = i + 1
            while j < n:
                if fragment[j] == "'":
                    if j + 1 < n and fragment[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(fragment[i : j + 1])
            i = j + 1
        elif ch == '"':
            m = re.match(r'"((?:[^"]|"")+)"', fragment[i:])
            if m:
                ident = m.group(1).replace('""', '"').replace("`", "``")
                out.append(f"`{ident}`")
                i += m.end()
            else:
                out.append(ch)
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


@dataclass
class FeaturePlan:
    """Resolved feature set: expression columns + pipeline stages.

    ``input_cols`` are the columns the final VectorAssembler consumes
    (expression outputs and/or transformer outputs).
    """

    df: DataFrame
    input_cols: List[str]
    stages: List[Transformer] = field(default_factory=list)


# VectorAssembler-native column types: passed through by NAME (so
# feature-importance labels keep the user's column name); anything
# else (string, date, …) is materialized as a cast-to-double column —
# previously a string-typed numeric column crashed as a bare feature
# while working fine as an expression.
_ASSEMBLABLE = {
    "tinyint", "smallint", "int", "bigint",
    "float", "double", "boolean", "vector",
}


def build_features(df: DataFrame, features: List[str]) -> FeaturePlan:
    """Materialize feature expressions as columns and pipeline stages."""
    input_cols: list[str] = []
    stages: list[Any] = []
    dtypes = dict(df.dtypes)

    for i, feat in enumerate(features):
        ast = parse_feature_expr(feat)
        unwrapped = _unwrap_marker(ast)
        if unwrapped is not None:
            marker, marker_inner = unwrapped
            df, col_name, extra = _build_transformer_feature(
                df, marker, marker_inner, i
            )
            stages.extend(extra)
            input_cols.append(col_name)
            continue
        if isinstance(ast, Identifier) and len(ast.parts) == 1:
            name = ast.parts[0]
            dt = dtypes.get(name)
            if dt is None or dt in _ASSEMBLABLE or dt.startswith("decimal"):
                input_cols.append(name)
                continue
            # fall through: cast the non-assemblable column like any
            # expression feature
            ast_sql = ast.to_spark_sql()
            col_name = f"__feat_{i}"
            df = df.withColumn(col_name, F.expr(ast_sql).cast("double"))
            input_cols.append(col_name)
            continue
        col_name = f"__feat_{i}"
        df = df.withColumn(col_name, F.expr(ast.to_spark_sql()).cast("double"))
        input_cols.append(col_name)

    return FeaturePlan(df=df, input_cols=input_cols, stages=stages)


def _unwrap_marker(ast: FeatureExpr) -> Optional[tuple]:
    """Return ``(marker, inner_expr)`` for TRANSFORM(...)/DERIVED(...),
    else None. The marker name travels along because the two differ in
    dispatch: TRANSFORM names one of the known MLlib transformer
    functions (a typo there must fail loudly), while DERIVED wraps an
    arbitrary expression (``DERIVED log(amt)`` is a computed column,
    not a transformer lookup)."""
    if (
        isinstance(ast, Call)
        and len(ast.func.parts) == 1
        and ast.func.parts[0].upper() in _TRANSFORM_MARKERS
        and len(ast.args) == 1
        and not ast.kwargs
    ):
        return ast.func.parts[0].upper(), ast.args[0]
    return None


def _lag_periods(periods_node) -> list[int]:
    """Validate and normalize the ``periods`` argument: a number or a
    NON-EMPTY list of integer-valued numbers. Degenerate inputs fail
    loudly — an empty list silently trained on lag-1, a negative or
    fractional period either crashed with a raw AttributeError or
    truncated to a different lag than the user wrote."""

    def one(node) -> int:
        v = getattr(node, "value", None)
        if not isinstance(v, (int, float)) or v != int(v):
            raise ValueError(
                "time_series.lag periods must be integer-valued"
                f" numbers, got {getattr(node, 'value', node)!r}"
            )
        p = int(v)
        if p < 1:
            raise ValueError(
                f"time_series.lag period must be >= 1, got {p}"
            )
        return p

    if periods_node is None:
        return [1]
    if hasattr(periods_node, "items"):  # list literal [1, 7, 28]
        if not periods_node.items:
            raise ValueError(
                "time_series.lag periods => [] names no lag at all —"
                " pass at least one period (substituting lag-1 here"
                " would train on a feature the user never wrote)"
            )
        return [one(n) for n in periods_node.items]
    if hasattr(periods_node, "value"):  # scalar: periods => 7
        # silently substituting lag-1 here trained on the wrong
        # feature with no error — a scalar is a one-element list
        return [one(periods_node)]
    raise ValueError(
        "time_series.lag periods must be a number or a list of"
        f" numbers, got {type(periods_node).__name__}"
    )


def _build_transformer_feature(
    df: DataFrame, marker: str, inner: FeatureExpr, idx: int
) -> tuple[DataFrame, str, list]:
    """Map a TRANSFORM(...)/DERIVED(...) inner call to MLlib stages
    (DSL.md:89-95).

    * ``standard_scaler(expr)`` → VectorAssembler + StandardScaler
    * ``one_hot_encoder(col)``  → StringIndexer + OneHotEncoder
    * ``time_series.lag(expr, periods=[..], order_by=col
      [, partition_by=col])`` → F.lag over a window — evaluated
      eagerly as columns.

    Function-name dispatch is case-insensitive (the marker and the
    DSL's other function names already are). Under the DERIVED marker
    an unrecognized call is an ordinary computed column
    (``DERIVED log(amt)``); under TRANSFORM it is an error — the user
    named a transformer that does not exist, and evaluating the typo
    as SQL would silently train a different feature.
    """
    from pyspark.sql import Window as W

    if not isinstance(inner, Call):
        # TRANSFORM(plain_expr): treat as a computed column
        col_name = f"__feat_{idx}"
        return df.withColumn(col_name, F.expr(inner.to_spark_sql()).cast("double")), col_name, []

    fn = ".".join(inner.func.parts).lower()
    if fn == "standard_scaler":
        src_sql = inner.args[0].to_spark_sql()
        raw = f"__feat_{idx}_raw"
        vec = f"__feat_{idx}_vec"
        out = f"__feat_{idx}_scaled"
        # fill NULL/NaN like the lag path: the assembler's 'keep'
        # would only launder NULL into a NaN vector cell, which
        # StandardScaler.fit rejects — so without the fill a single
        # NULL row crashed the fit for scaled features only
        df = df.withColumn(raw, F.expr(src_sql).cast("double")).na.fill(
            0.0, subset=[raw]
        )
        stages = [
            VectorAssembler(inputCols=[raw], outputCol=vec),
            StandardScaler(inputCol=vec, outputCol=out, withMean=True, withStd=True),
        ]
        return df, out, stages
    if fn == "one_hot_encoder":
        src_sql = inner.args[0].to_spark_sql()
        raw = f"__feat_{idx}_raw"
        indexed = f"__feat_{idx}_idx"
        out = f"__feat_{idx}_ohe"
        df = df.withColumn(raw, F.expr(src_sql).cast("string"))
        stages = [
            StringIndexer(inputCol=raw, outputCol=indexed, handleInvalid="keep"),
            OneHotEncoder(inputCol=indexed, outputCol=out),
        ]
        return df, out, stages
    if fn == "time_series.lag":
        kwargs = dict(inner.kwargs)
        if "order_by" not in kwargs:
            raise ValueError(
                "time_series.lag requires an order_by => <time column> argument"
            )
        if df.isStreaming:
            # rebuilding lag features on a stream (serve_model_stream
            # restores features from registry metadata) would fail at
            # query start with Spark's NON_TIME_WINDOW_NOT_SUPPORTED —
            # surface the actionable contract instead
            raise ValueError(
                "time_series.lag features cannot be rebuilt on a"
                " STREAMING source (ordered windows need the full"
                " history): precompute the lag columns upstream and"
                " train on them directly, or serve this model in"
                " batch"
            )
        order_col = kwargs["order_by"].to_spark_sql()
        periods = _lag_periods(kwargs.get("periods"))
        src_sql = inner.args[0].to_spark_sql()
        # partition_by bounds the window per key; WITHOUT it the
        # global orderBy window is a single task holding every row —
        # the documented scale constraint of an unpartitioned ordered
        # lag (correct semantics need a total order; at 100 TB pass
        # partition_by, or precompute with operators/ordered.py's
        # range-partitioned primitives)
        if "partition_by" in kwargs:
            w = W.partitionBy(
                F.expr(kwargs["partition_by"].to_spark_sql())
            ).orderBy(F.expr(order_col))
        else:
            w = W.orderBy(F.expr(order_col))
        col_name = f"__feat_{idx}"
        # multiple periods → one column per lag, assembled later
        cols = []
        for p in periods:
            c = f"{col_name}_lag{p}"
            df = df.withColumn(
                c, F.lag(F.expr(src_sql), p).over(w).cast("double")
            )
            cols.append(c)
        df = df.na.fill(0.0, subset=cols)
        if len(cols) == 1:
            return df, cols[0], []
        vec = f"{col_name}_vec"
        return df, vec, [VectorAssembler(inputCols=cols, outputCol=vec)]
    if marker == "DERIVED":
        # DERIVED wraps arbitrary expressions: an unrecognized call
        # (log(amt), feature_engineering.rfm(...)-style SQL) is a
        # computed column, not a failed transformer lookup
        col_name = f"__feat_{idx}"
        return (
            df.withColumn(
                col_name, F.expr(inner.to_spark_sql()).cast("double")
            ),
            col_name,
            [],
        )
    raise ValueError(f"Unknown TRANSFORM function: {fn}")
