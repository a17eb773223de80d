"""Stateful streaming sessionization + skew-salting primitives."""

import pytest
from pyspark.sql import functions as F

from declarativeml_spark.operators.skew import replicate_join_skewed, salted_agg
from declarativeml_spark.sources.catalog import load_table
from declarativeml_spark.streaming.stateful import streaming_sessionize


def test_streaming_sessionize_matches_batch(spark, smoke_dir, tmp_path):
    src = str(tmp_path / "sess_src")
    ev = (
        load_table(spark, smoke_dir, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    ev.write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_sessionize(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_sink")
        .trigger(availableNow=True)
        .start()
    )
    # pending processing-time timeouts keep the query alive (open
    # sessions wait for their gap) — bound the wait, then stop
    import time

    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.sql("SELECT count(*) FROM sess_sink").first()[0] > 0:
            prev = -1
            cur = spark.sql("SELECT count(*) FROM sess_sink").first()[0]
            while cur != prev and time.time() < deadline:
                prev = cur
                time.sleep(2)
                cur = spark.sql("SELECT count(*) FROM sess_sink").first()[0]
            break
        time.sleep(1)
    q.stop()
    emitted = spark.sql("SELECT * FROM sess_sink")

    # batch truth: sessions that CLOSED (a later event >gap exists);
    # the final open session per user stays in state — not emitted
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    gaps = ev.withColumn(
        "next_gap_us", F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    )
    closed_batch = gaps.filter(F.col("next_gap_us") > 1_800_000_000).count()
    assert emitted.count() == closed_batch
    # per-session event counts are positive and values aggregate
    row = emitted.orderBy("user_id", "session_start").first()
    assert row.n_events >= 1
    assert row.session_end >= row.session_start


def test_salted_agg_matches_plain(spark, smoke_dir):
    li = load_table(spark, smoke_dir, "lineitem")
    plain = {
        (r.l_returnflag): (r.n, round(r.qty, 6))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("qty"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.n, round(r.qty, 6))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            [
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("qty"),
            ],
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted


def test_replicate_join_matches_plain(spark, smoke_dir):
    li = load_table(spark, smoke_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, smoke_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, "l_orderkey").count()
    salted = replicate_join_skewed(li, orders, "l_orderkey", salt_buckets=4).count()
    assert plain == salted
