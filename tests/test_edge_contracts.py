"""Regression net for the review-pass edge contracts: zero-norm
vectors under ANSI mode, constant/all-NULL profiling, non-default
MIX group columns, escaped quotes in scripts, string-valued WHEN
rules, and ragged histogram bins."""

import pytest
from pyspark.sql import functions as F

from declarativeml_spark.dsl.parser import parse, split_statements


def test_temperature_mix_respects_by_col(spark):
    from declarativeml_spark.operators.corpus import temperature_mix

    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, "en")], "doc_id long, lang string"
    )
    out = temperature_mix(df, by_col="lang")
    assert out.columns[0] == "lang"
    rows = {r["lang"]: r["n_docs"] for r in out.collect()}
    assert rows == {"en": 3, "de": 1}


def test_zero_norm_vectors_excluded_not_fatal(spark):
    """A single all-zero embedding must not abort cosine operators
    with ANSI DIVIDE_BY_ZERO; it has no cosine direction and is
    excluded from scoring."""
    from declarativeml_spark.operators.dedup import (
        cosine_topk,
        embedding_pairs,
        ivf_native_topk,
        semdedup,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 0.0]),  # zero-norm
            (2, [1.0, 0.1]),
            (3, [0.9, 0.1]),
        ],
        "vec_id long, embedding array<double>",
    )
    pairs = embedding_pairs(emb, threshold=0.5, dim=2).collect()
    assert pairs is not None
    assert all(1 not in (r["id_a"], r["id_b"]) for r in pairs)

    topk = cosine_topk(emb, k=2, query_mod=2).collect()
    assert all(r["nid"] != 1 and r["qid"] != 1 for r in topk)

    ivf = ivf_native_topk(emb, k=2, query_mod=2, n_cells=2, dim=2).collect()
    assert all(r["nid"] != 1 and r["qid"] != 1 for r in ivf)

    sem = {r["vec_id"]: r["kept"] for r in semdedup(
        emb, threshold=0.5, n_cells=2, dim=2
    ).collect()}
    assert sem[1] is True  # zero vector neither dominates nor is dominated


def test_numeric_profile_constant_and_null_columns(spark):
    from declarativeml_spark.operators.profile import numeric_profile

    df = spark.createDataFrame(
        [(5.0, None), (5.0, None), (5.0, None)],
        "const double, empty double",
    )
    out = {r["col_name"]: r for r in numeric_profile(df, ["const", "empty"]).collect()}
    # constant column: all values in bucket 0, no div-by-zero
    assert out["const"]["hist"] == "3,0,0,0,0,0,0,0,0,0"
    assert out["const"]["n"] == 3
    # all-NULL column: still reported, n=0, NULL mean, zero histogram
    assert out["empty"]["n"] == 0
    assert out["empty"]["avg_val"] is None
    assert out["empty"]["hist"] == "0,0,0,0,0,0,0,0,0,0"


def test_split_statements_honors_escaped_quotes():
    script = 'PUBLISH EVENT e WITH PAYLOAD {msg: "a \\" ; b"}; PUBLISH EVENT f'
    parts = split_statements(script)
    assert len(parts) == 2
    assert parts[0].endswith('b"}')
    assert parts[1] == "PUBLISH EVENT f"


def test_when_rule_string_value_quoted():
    rule = parse('WHEN model_metrics.phase = "prod" THEN PUBLISH EVENT ok')
    assert "'prod'" in rule.payload_predicate
    # numeric form unchanged
    rule_n = parse("WHEN model_metrics.accuracy < 0.8 THEN PUBLISH EVENT bad")
    assert "CAST(" in rule_n.payload_predicate


def test_decode_features_non_divisor_bins_fixed_width(spark):
    from declarativeml_spark.operators.multimodal import decode_features

    df = spark.createDataFrame(
        [(1, bytearray([0, 10, 255, 250])), (2, bytearray([1, 2]))],
        "media_id long, payload binary",
    )
    out = decode_features(df, bins=10).collect()
    assert all(len(r["features"]) == 10 for r in out)
    with pytest.raises(ValueError, match=r"\[1, 256\]"):
        decode_features(df, bins=0)


def test_spread_skips_shuffle_bearing_plans(spark):
    from declarativeml_spark.operators.textops import spread

    a = spark.range(10).withColumnRenamed("id", "k")
    joined = a.join(a.withColumnRenamed("k", "k2"), a.k == F.col("k2"))
    # must return the frame unchanged (no df.rdd probe, no respread)
    assert spread(joined) is joined
    # a narrow scan-shaped frame still respreads
    one = spark.range(100).coalesce(1)
    assert spread(one).rdd.getNumPartitions() > 1
