"""Unit tests for the two-phase distributed cumulative-sum operator
(operators/ordered.py) — verified against the naive single-partition
global window it replaces, plus frame-sampling plumbing edge cases."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from declarativeml_spark.operators.ordered import global_cumsum


@pytest.mark.parametrize("num_partitions", [2, 5, 32])
def test_global_cumsum_matches_naive_window(spark, num_partitions):
    rows = [(i, (i * 7919) % 101, f"k{i:03d}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long, k string")
    order = [F.col("v").desc(), F.col("k").asc()]

    got = global_cumsum(
        df, order, "v", out_col="cum", rank_col="rnk",
        num_partitions=num_partitions,
    )

    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum", F.sum("v").over(w)).withColumn(
        "rnk", F.row_number().over(Window.orderBy(*order))
    )

    got_rows = {r["id"]: (r["cum"], r["rnk"]) for r in got.collect()}
    want_rows = {r["id"]: (r["cum"], r["rnk"]) for r in want.collect()}
    assert got_rows == want_rows


def test_global_cumsum_single_row(spark):
    df = spark.createDataFrame([(1, 10)], "id long, v long")
    out = global_cumsum(df, [F.col("v").asc()], "v", rank_col="rnk").collect()
    assert out[0]["cum"] == 10 and out[0]["rnk"] == 1


def test_sample_frames_every_n_and_partial_tail(spark):
    from declarativeml_spark.operators.multimodal import sample_frames

    # 40 bytes → 2 full 16-byte frames (frame 2 is a 8-byte partial,
    # dropped); every_n=2 keeps frame 0 only from the full frames 0,1
    payload = bytes(range(40))
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    rows = sample_frames(df, every_n=2, codec="fake").collect()
    assert [(r["media_id"], r["frame_no"]) for r in rows] == [(1, 0)]
    assert rows[0]["frame"] == payload[:16]


def test_sample_frames_rejects_real_codec(spark):
    df = spark.createDataFrame([(1, b"x" * 32)], "media_id long, payload binary")
    with pytest.raises(NotImplementedError):
        sample = __import__(
            "declarativeml_spark.operators.multimodal", fromlist=["sample_frames"]
        )
        sample.sample_frames(df, codec="h264")
