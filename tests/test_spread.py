"""textops.spread: parallelism guard + placement-invariance.

The spread operator re-partitions a single-split scan before a
CPU-heavy per-row pass. Its contract: results of every downstream
key-based plan are IDENTICAL with and without it (placement
independence), and it is a no-op when the scan is already wide.
"""

import pytest
from pyspark.sql import functions as F

from declarativeml_spark.operators.textops import spread


def test_spread_widens_narrow_frame(spark):
    df = spark.range(1000).coalesce(1)
    out = spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_noop_on_wide_frame(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(par + 3)
    out = spread(df)
    # already at/above target: the frame passes through untouched
    assert out is df


def test_spread_preserves_rows_exactly(spark):
    df = spark.range(500).withColumn("v", F.col("id") * 7 % 13).coalesce(1)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, spread(df).collect()))
    assert a == b


@pytest.mark.parametrize("table", ["documents", "embeddings"])
def test_spread_hash_invariant_on_real_query_plane(spark, sf_dir, table):
    """A representative tokenize/fold aggregation returns identical
    results from the spread and unspread scan — the invariance that
    makes spread safe to sprinkle across the query surface."""
    from declarativeml_spark.sources.catalog import load_table

    plain = load_table(spark, sf_dir, table)
    wide = load_table(spark, sf_dir, table, spread=True)
    if table == "documents":
        agg = lambda d: (
            d.select(F.explode(F.expr(r"split(trim(text), '\\s+')")).alias("w"))
            .groupBy("w").count().agg(
                F.sum(F.col("count") * F.col("count")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
    else:
        agg = lambda d: d.select(
            F.expr(
                "aggregate(embedding, CAST(0.0 AS DOUBLE),"
                " (acc, x) -> acc + CAST(x AS DOUBLE) * x)"
            ).alias("ss"),
            "vec_id",
        ).agg(F.sum(F.col("ss").cast("decimal(38,6)")).alias("t"))
    assert agg(plain).collect() == agg(wide).collect()
