"""Parquet catalog over the driver's synthetic tables.

The reference delegates all storage to PostgreSQL relations
(reference: dsl/parser.py:201-220 treats FROM as a table identifier or
SQL fragment). Here the source of truth is a directory of parquet
files; ``register_views`` makes them resolvable by name so both the
DataFrame API and ``spark.sql`` passthrough queries work.

Parquet scans get predicate pushdown + column pruning from Catalyst
for free — at 100 TB this is the difference between scanning a column
slice vs. the whole table, so nothing here materializes or caches
eagerly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily load one table from a scale-factor directory.

    ``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it as a
    nanos-since-epoch long (``spark.sql.legacy.parquet.nanosAsLong``)
    and we convert to a microsecond timestamp here, matching DuckDB's
    ``epoch_us`` truncation of the same values.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Callers (the correctness driver included) may hand us a session
        # built without the nanos conf; set it here so TIMESTAMP(NANOS)
        # parquet is readable regardless of who constructed the session.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception as exc:  # pragma: no cover - conf locked down
            import warnings

            warnings.warn(
                "could not set spark.sql.legacy.parquet.nanosAsLong on this"
                f" session ({exc}); reading events.parquet may fail with a"
                " TIMESTAMP(NANOS) error",
                RuntimeWarning,
                stacklevel=2,
            )
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each parquet table as a temp view named after itself."""
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
