"""Bucketed tables eliminate the join shuffle (SURVEY §2.4; the
100 TB co-location strategy: pay the shuffle once at write time,
skip it on every subsequent join/agg on the bucket key).
"""

import pytest
from pyspark.sql import functions as F

from declarativeml_spark.sources.catalog import load_table
from declarativeml_spark.sources.io import save_bucketed_table


def _executed_plan(df) -> str:
    df.count()  # trigger AQE final plan
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force real (shuffle-eligible) joins so the test can't pass by
    broadcasting the small test tables."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, smoke_dir, no_broadcast):
    orders = load_table(spark, smoke_dir, "orders")
    lineitem = load_table(spark, smoke_dir, "lineitem")

    save_bucketed_table(
        orders, "orders_b", "o_orderkey", n_buckets=8, sort_col="o_orderkey"
    )
    save_bucketed_table(
        lineitem, "lineitem_b", "l_orderkey", n_buckets=8, sort_col="l_orderkey"
    )
    try:
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")

        # Baseline: the same join on raw (unbucketed) frames shuffles.
        raw = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        assert "Exchange hashpartitioning" in _executed_plan(raw)

        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_linenumber", "o_totalprice"
        )
        plan = _executed_plan(joined)
        # Both sides report bucket output partitioning: no shuffle.
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == lineitem.count()

        # Aggregation on the bucket key is shuffle-free too.
        agg = ob.groupBy("o_orderkey").agg(F.count("*").alias("n"))
        assert "Exchange hashpartitioning" not in _executed_plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_aqe_splits_skewed_join(spark):
    """Scale evidence for the skew story (docs/SCALING.md): a join
    with one hot key must be re-planned by AQE into a skew-split
    SortMergeJoin — the runtime remedy the relational set relies on
    (structural skew in dedup/ANN is pre-salted instead, skew.py)."""
    from pyspark.sql import functions as F

    s2 = spark.newSession()
    for k, v in {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1024",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1024",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }.items():
        s2.conf.set(k, v)
    # the hot key dominates side a's bytes but has NO match in b, so
    # the join OUTPUT stays small enough to collect() — which executes
    # j's own query execution, the one whose final adaptive plan we
    # then inspect (count() would build a separate execution and leave
    # j's plan un-finalized)
    a = s2.range(0, 60000, 1, 8).select(
        F.when(F.col("id") < 50000, F.lit(0))
        .otherwise(1 + F.col("id") % 96)
        .alias("k"),
        (F.rand(7) * 1e9).cast("long").alias("va"),
    )
    b = s2.range(0, 500, 1, 4).select(
        (1 + F.col("id") % 96).alias("k"), F.col("id").alias("vb")
    )
    j = a.join(b, "k")
    rows = j.collect()
    assert len(rows) > 10_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:2000]
