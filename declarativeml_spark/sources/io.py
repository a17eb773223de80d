"""File-format readers and sinks beyond the parquet catalog.

The reference has no file connectors at all — every source is a
PostgreSQL relation (SURVEY.md §2.2 'File formats / connectors:
ABSENT'). Spark gives the full surface; these helpers pin the
options that matter at scale:

* explicit schemas (never ``inferSchema`` on a 100 TB path — it
  triggers a full pre-scan);
* partitioned parquet writes (``partitionBy``) for downstream
  partition pruning;
* bucketed saves (``bucketBy``) so repeated joins on the bucket key
  skip their shuffle;
* Delta/Iceberg are import-gated: not in this environment, loud
  error instead of silent fallback.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """CSV with a required explicit schema (no inference pre-scan)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines with a required explicit schema."""
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet, same pushdown/pruning path."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (predicate pushdown + column pruning on re-read)."""
    df.write.mode(mode).orc(path)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake (requires delta jars — not in this environment)."""
    try:
        return spark.read.format("delta").load(path)
    except Exception as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "Delta Lake needs delta-spark jars on the classpath; not available"
            " in this environment"
        ) from e


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet sink: downstream filters on the partition
    columns prune directories instead of scanning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def save_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: "str | list[str]",
    n_buckets: int = 32,
    sort_col: Optional["str | list[str]"] = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggs on ``bucket_col`` between
    tables bucketed the same way run shuffle-free (SURVEY §2.4).

    For a shuffle-free JOIN the bucket columns must be ALL of the join
    keys (Spark's co-partition check,
    ``spark.sql.requireAllClusterKeysForCoPartition`` default true —
    a subset is not accepted), so multi-key joins need the full list.
    """
    bcols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bcols)
    if sort_col:
        scols = [sort_col] if isinstance(sort_col, str) else list(sort_col)
        writer = writer.sortBy(*scols)
    writer.saveAsTable(table)


def append_results_table(df: DataFrame, table: str) -> None:
    """``STORE RESULTS IN t`` sink (DSL.md:71): append to a table."""
    df.write.mode("append").saveAsTable(table)
