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
