"""Round-11 streaming-twin review regressions: NULL event-time /
NULL value / NULL id handling in the stateful operators (one bad row
used to kill the query or silently poison the state — and a
checkpoint restart replays the same poison batch), plus the
session-timezone independence of the tumbling-rollup buckets.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _run_stream(spark, tmp_path, df, build, name, mode="append"):
    src = tmp_path / f"{name}_src"
    src.mkdir()
    df.coalesce(1).write.parquet(str(src / "a"))
    schema = spark.read.parquet(str(src / "a")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(f"{name}_sink")
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(f"{name}_sink")


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, value double, ts string"
    ).selectExpr(
        "user_id", "event_id", "value", "CAST(ts AS TIMESTAMP_NTZ) AS ts"
    )


def test_twa_null_value_matches_batch_sum_skip(spark, tmp_path):
    """A NULL gauge value mirrors the batch SUM: its segment counts in
    span and n_segments but contributes nothing to the weighted sum —
    Decimal('NaN') used to poison the state forever."""
    from declarativeml_spark.streaming.stateful import (
        streaming_time_weighted_value,
    )

    ev = _events(
        spark,
        [
            (1, 1, 10.0, "2024-01-01 00:00:00"),
            (1, 2, None, "2024-01-01 00:00:10"),
            (1, 3, 20.0, "2024-01-01 00:00:30"),
            (1, 4, 5.0, "2024-01-01 00:00:40"),
        ],
    )
    out = _run_stream(
        spark,
        tmp_path,
        ev,
        streaming_time_weighted_value,
        "twa_nullval",
        mode="update",
    )
    last = out.orderBy(F.desc("n_segments")).first()
    # 3 segments (10s@10.0, 20s@NULL, 10s@20.0), span 40s; the NULL
    # segment is weight-skipped: (10*10e6 + 20*10e6) / 40e6 = 7.5
    assert last.n_segments == 3
    assert last.span_us == 40_000_000
    assert last.twa_raw == pytest.approx(7.5)


def test_twa_and_compact_drop_null_ts_rows(spark, tmp_path):
    """NULL ts rows (NaT -> int64-min sentinel) are dropped before
    state instead of minting 1677-09-21 timestamps or 9.2e18-us
    segments."""
    from declarativeml_spark.streaming.stateful import (
        streaming_latest_per_user,
        streaming_time_weighted_value,
    )

    ev = _events(
        spark,
        [
            (1, 1, 10.0, None),
            (1, 2, 20.0, "2024-01-01 00:00:00"),
            (1, 3, 30.0, "2024-01-01 00:00:10"),
        ],
    )
    twa = _run_stream(
        spark,
        tmp_path,
        ev,
        streaming_time_weighted_value,
        "twa_nullts",
        mode="update",
    )
    last = twa.orderBy(F.desc("n_segments")).first()
    assert last.n_segments == 1 and last.span_us == 10_000_000
    assert last.twa_raw == pytest.approx(20.0)

    ev2 = ev.withColumn("event_type", F.lit("click")).select(
        "user_id", "event_id", "event_type", "ts"
    )
    latest = _run_stream(
        spark,
        tmp_path,
        ev2,
        streaming_latest_per_user,
        "compact_nullts",
        mode="update",
    )
    rows = latest.collect()
    assert all(r.last_ts.year == 2024 for r in rows)
    assert max(r.event_id for r in rows) == 3


def test_new_users_skips_null_ts(spark, tmp_path):
    """int(NaN) in the first-seen MIN killed the query on one NULL-ts
    row from an unseen user; the batch MIN skips NULLs."""
    from declarativeml_spark.streaming.pipeline import streaming_new_users

    ev = _events(
        spark,
        [
            (1, 1, 1.0, None),
            (1, 2, 1.0, "2024-01-02 00:00:01"),
            (2, 3, 1.0, "2024-01-03 12:00:00"),
        ],
    )
    out = _run_stream(
        spark,
        tmp_path,
        ev,
        streaming_new_users,
        "newusers_nullts",
        mode="complete",
    )
    got = {str(r.day): r.n_new for r in out.collect()}
    assert got == {"2024-01-02": 1, "2024-01-03": 1}


def test_streaming_pack_refuses_string_id_and_survives_null_id(
    spark, tmp_path
):
    from declarativeml_spark.operators.corpus import pack_chunks
    from declarativeml_spark.streaming.stateful import streaming_pack

    bad = spark.createDataFrame(
        [("a", "x y")], "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="integer id column"):
        streaming_pack(bad)

    docs = spark.createDataFrame(
        [(1, "a b c"), (None, "d e"), (3, "f g h i")],
        "doc_id long, text string",
    )
    got = _run_stream(
        spark,
        tmp_path,
        docs,
        lambda s: streaming_pack(s, context=4, buckets=1),
        "pack_nullid",
    )
    def _key(t):
        return tuple((v is None, 0 if v is None else v) for v in t)

    want = sorted(
        (tuple(r) for r in pack_chunks(docs, context=4, buckets=1).collect()),
        key=_key,
    )
    assert sorted((tuple(r) for r in got.collect()), key=_key) == want


def test_quota_and_anomaly_drop_null_rows(spark, tmp_path):
    from declarativeml_spark.streaming.stateful import (
        streaming_rate_anomalies,
        streaming_stratified_quota,
    )

    docs = spark.createDataFrame(
        [("en", 1, 100), ("en", None, 50), ("en", 3, None), ("en", 4, 10)],
        "lang string, doc_id long, h long",
    )
    out = _run_stream(
        spark,
        tmp_path,
        docs,
        lambda s: streaming_stratified_quota(s, quota=10),
        "quota_null",
    )
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 4]

    hourly = spark.createDataFrame(
        [
            ("click", "2024-01-01 00:00:00", 5),
            ("click", None, 7),
            ("click", "2024-01-01 01:00:00", None),
            ("click", "2024-01-01 02:00:00", 6),
            ("click", "2024-01-01 03:00:00", 50),
        ],
        "event_type string, hour string, n long",
    ).selectExpr(
        "event_type", "CAST(hour AS TIMESTAMP_NTZ) AS hour", "n"
    )
    out2 = _run_stream(
        spark,
        tmp_path,
        hourly,
        streaming_rate_anomalies,
        "anom_null",
    )
    # the two malformed rows are ignored; real buckets still score
    assert out2.count() >= 1
    assert all(r.n is not None for r in out2.collect())


def test_rollup_buckets_are_session_tz_independent(spark):
    """Tumbling 1-hour buckets must align to the NTZ wall clock in
    ANY session timezone — a bare NTZ->LTZ cast made window() land on
    HH:30 boundaries under Asia/Kolkata (+5:30)."""
    from declarativeml_spark.streaming.pipeline import streaming_rollup

    ev = spark.createDataFrame(
        [(1, 10.0, "2024-01-01 10:45:00"), (2, 20.0, "2024-01-01 10:50:00")],
        "event_id long, value double, ts string",
    ).selectExpr("event_id", "value", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    tz_key = "spark.sql.session.timeZone"
    prev = spark.conf.get(tz_key)
    results = {}
    try:
        for tz in ("UTC", "Asia/Kolkata"):
            spark.conf.set(tz_key, tz)
            rows = (
                streaming_rollup(ev, "ts", None, "value")
                .orderBy("bucket_start")
                .collect()
            )
            results[tz] = [tuple(r) for r in rows]
    finally:
        spark.conf.set(tz_key, prev)
    assert results["UTC"] == results["Asia/Kolkata"]
    assert results["UTC"][0][0] == "2024-01-01 10:00:00"


def test_semantic_decontam_hoisted_norms_match_batch(spark, tmp_path):
    """Precomputed ce_norm/qnorm must leave cosines bit-identical to
    the batch twin (same ops, same order)."""
    from declarativeml_spark.operators.corpus import semantic_overlap
    from declarativeml_spark.streaming.pipeline import (
        streaming_semantic_decontam,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0]), (2, [0.5, 0.5, 0.0]), (3, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(10, [1.0, 0.0, 1.0]), (11, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cols = ["vec_id", "nearest_benchmark", "max_cosine", "contaminated"]
    got = sorted(
        tuple(r)
        for r in _run_stream(
            spark,
            tmp_path,
            corpus,
            lambda s: streaming_semantic_decontam(s, bench),
            "semdec_norms",
        )
        .select(*cols)
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in semantic_overlap(corpus, bench).select(*cols).collect()
    )
    assert got == want
