"""Local oracle-parity harness mirroring the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables, then compares row count, schema (column names), and
an order-insensitive value comparison. Used by tests and by
``scripts`` before each round so CORRECTNESS_r{N}.json holds no
surprises.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from declarativeml_spark.sources.catalog import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    notes: list[str] = field(default_factory=list)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        df[col] = df[col].map(_canon)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.10g}"
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(_canon(x)) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def compare_query(
    spark: SparkSession,
    name: str,
    fn,
    oracle_sql: str,
    sf_dir: str,
) -> CompareResult:
    spark_df = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    oracle_df = con.execute(oracle_sql).fetchdf()
    con.close()

    notes: list[str] = []
    ok = True

    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        ok = False
        notes.append(f"schema mismatch: spark={s_cols} oracle={o_cols}")
    if len(spark_df) != len(oracle_df):
        ok = False
        notes.append(f"row count mismatch: spark={len(spark_df)} oracle={len(oracle_df)}")

    if ok:
        s_norm = _normalize(spark_df)
        o_norm = _normalize(oracle_df)
        if not s_norm.equals(o_norm):
            ok = False
            neq = (s_norm != o_norm).any(axis=1)
            diff_idx = list(s_norm.index[neq])[:5]
            for i in diff_idx:
                notes.append(
                    f"row {i}: spark={s_norm.loc[i].to_dict()}"
                    f" oracle={o_norm.loc[i].to_dict()}"
                )
    return CompareResult(
        name=name,
        ok=ok,
        spark_rows=len(spark_df),
        oracle_rows=len(oracle_df),
        notes=notes,
    )


def formatted_plan(df) -> str:
    """Capture ``df.explain('formatted')`` output as a string — the
    one explain-capture helper shared by scripts/plan_audit.py and
    scripts/gen_plans_doc.py (explain prints to stdout; two inline
    copies of the redirect boilerplate drifted independently)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
