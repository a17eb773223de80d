"""DECONTAMINATE / PACK DSL statements (SURVEY §2.11 corpus-prep
operators in the reference's grammar family). Statement results are
cross-checked against the oracle-checked registered queries so the
DSL path inherits the DuckDB-verified semantics."""

import pytest

from declarativeml_spark.dsl import ir, parse
from declarativeml_spark.engine import Engine
from declarativeml_spark.queries import QUERIES
from declarativeml_spark.sources.catalog import register_views


@pytest.fixture(scope="module")
def engine(spark, smoke_dir):
    register_views(spark, smoke_dir)
    return Engine(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parse_decontaminate_forms():
    d = parse("DECONTAMINATE documents AGAINST benchmark_docs")
    assert isinstance(d, ir.Decontaminate)
    assert d.source == "documents" and d.benchmark == "benchmark_docs"
    assert d.threshold == 3 and d.column is None

    d = parse(
        "DECONTAMINATE documents AGAINST eval_set ON body THRESHOLD 5"
    )
    assert d.column == "body" and d.threshold == 5


def test_parse_pack_forms():
    p = parse("PACK documents INTO 512 TOKEN CHUNKS")
    assert isinstance(p, ir.PackSequences)
    assert p.context == 512 and p.buckets == 8 and p.column is None

    p = parse("PACK documents INTO 2048 TOKEN CHUNKS BUCKETS 16 ON body")
    assert p.context == 2048 and p.buckets == 16 and p.column == "body"


def test_parse_rejects_bad_inputs():
    # empty benchmark trips the shared source-capture guard
    with pytest.raises(ValueError, match="cannot be empty"):
        parse("DECONTAMINATE documents AGAINST")
    with pytest.raises(ValueError, match="THRESHOLD must be a positive integer"):
        parse("DECONTAMINATE documents AGAINST b THRESHOLD 0")
    with pytest.raises(ValueError, match="INTO must be a positive integer"):
        parse("PACK documents INTO -5 TOKEN CHUNKS")
    with pytest.raises(ValueError, match="BUCKETS must be a positive integer"):
        parse("PACK documents INTO 512 TOKEN CHUNKS BUCKETS 1.5")


def test_decontaminate_matches_query(engine, spark, smoke_dir):
    spark.table("documents").filter("doc_id % 23 = 5").createOrReplaceTempView(
        "bench_docs"
    )
    spark.table("documents").filter("doc_id % 23 <> 5").createOrReplaceTempView(
        "corpus_docs"
    )
    out = engine.execute(
        "DECONTAMINATE corpus_docs AGAINST bench_docs THRESHOLD 3"
    )
    assert out.columns == ["doc_id", "n_grams", "overlap_grams", "contaminated"]
    expected = QUERIES["decontam_benchmark_overlap"](spark, smoke_dir)
    assert _rows(out) == _rows(expected)


def test_pack_matches_query(engine, spark, smoke_dir):
    out = engine.execute("PACK documents INTO 512 TOKEN CHUNKS BUCKETS 8")
    assert out.columns == [
        "doc_id",
        "bucket",
        "n_tokens",
        "chunk_id",
        "chunk_offset",
        "chunks_spanned",
    ]
    expected = QUERIES["pack_concat_chunks"](spark, smoke_dir)
    assert _rows(out) == _rows(expected)


def test_pack_chunk_invariants(engine, spark):
    """Every chunk position is internally consistent: offsets fit the
    window, spans cover the token count."""
    out = engine.execute("PACK documents INTO 128 TOKEN CHUNKS BUCKETS 4")
    bad_offset = out.filter("chunk_offset < 0 OR chunk_offset >= 128").count()
    bad_span = out.filter(
        "chunks_spanned < 1 OR"
        " chunks_spanned < CAST(CEIL((chunk_offset + n_tokens - 128)"
        " / 128.0) AS BIGINT)"
    ).count()
    assert bad_offset == 0 and bad_span == 0


def test_parse_sample_weighted_forms():
    s = parse("SAMPLE documents TOP 100 WEIGHT BY n_chars")
    assert isinstance(s, ir.SampleCorpus)
    assert s.top_n == 100 and s.weight_column == "n_chars" and s.rate is None

    s = parse("SAMPLE documents TOP 50 WEIGHT BY n_chars ON doc_id")
    assert s.top_n == 50 and s.column == "doc_id"

    with pytest.raises(ValueError, match="RATE f or TOP n WEIGHT BY col"):
        parse("SAMPLE documents")
    with pytest.raises(ValueError, match="TOP must be a positive integer"):
        parse("SAMPLE documents TOP 0 WEIGHT BY n_chars")
    with pytest.raises(ValueError, match="WEIGHT"):
        parse("SAMPLE documents TOP 10")


def test_sample_weighted_statement(engine, spark):
    out = engine.execute("SAMPLE documents TOP 100 WEIGHT BY n_chars")
    assert out.count() == 100
    assert out.columns == spark.table("documents").columns
    # deterministic: a second execution picks the identical set
    again = engine.execute("SAMPLE documents TOP 100 WEIGHT BY n_chars")
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
    # the weight column matters: a different weighting changes the draw
    spark.table("documents").withColumn(
        "inv_w", 1_000_000 - spark.table("documents").n_chars
    ).createOrReplaceTempView("documents_inv")
    other = engine.execute("SAMPLE documents_inv TOP 100 WEIGHT BY inv_w")
    assert {r.doc_id for r in out.collect()} != {r.doc_id for r in other.collect()}


def test_redact_statement_masks_and_counts(spark, smoke_dir, engine):
    from declarativeml_spark.sources.catalog import load_table

    load_table(spark, smoke_dir, "documents").createOrReplaceTempView("documents")
    out = engine.execute("REDACT documents ON text")
    assert set(["n_email", "n_ipv4", "n_ssn", "n_phone", "text"]) <= set(out.columns)
    # word-salad corpus has no PII: redaction is the identity there
    assert out.filter(
        (out.n_email > 0) | (out.n_ipv4 > 0) | (out.n_ssn > 0) | (out.n_phone > 0)
    ).count() == 0


def test_chunk_statement_matches_operator(spark, smoke_dir, engine):
    from declarativeml_spark.operators.corpus import chunk_windows
    from declarativeml_spark.sources.catalog import load_table

    docs = load_table(spark, smoke_dir, "documents")
    docs.createOrReplaceTempView("documents")
    out = engine.execute("CHUNK documents INTO 32 TOKEN WINDOWS STRIDE 24")
    direct = chunk_windows(docs, win=32, stride=24)
    assert out.exceptAll(direct).count() == 0
    assert direct.exceptAll(out).count() == 0


def test_semantic_dedup_statement(spark, smoke_dir, engine):
    from declarativeml_spark.sources.catalog import load_table

    load_table(spark, smoke_dir, "embeddings").createOrReplaceTempView("embeddings")
    out = engine.execute("DEDUPLICATE embeddings USING semantic THRESHOLD 0.35")
    assert set(out.columns) == {"vec_id", "cell", "kept"}
    assert out.count() > 0


def test_parse_sessionize_forms():
    s = parse("SESSIONIZE events BY user_id")
    assert isinstance(s, ir.Sessionize)
    assert s.key == "user_id" and s.gap_value == 30 and s.gap_unit == "MINUTES"

    s = parse("SESSIONIZE events BY user_id GAP 2 HOURS ON ts VALUE value")
    assert s.gap_value == 2 and s.gap_unit == "HOURS"
    assert s.ts_column == "ts" and s.value_column == "value"


def test_parse_quantize_forms():
    q = parse("QUANTIZE EMBEDDINGS embeddings")
    assert isinstance(q, ir.QuantizeEmbeddings)
    assert q.column is None and q.id_column is None

    q = parse("QUANTIZE EMBEDDINGS embeddings ON embedding ID vec_id")
    assert q.column == "embedding" and q.id_column == "vec_id"


def test_parse_sessionize_quantize_reject_bad():
    with pytest.raises(ValueError, match="GAP must be a positive integer"):
        parse("SESSIONIZE events BY user_id GAP 0 MINUTES")
    with pytest.raises(ValueError, match="GAP unit"):
        parse("SESSIONIZE events BY user_id GAP 5 FORTNIGHTS")
    with pytest.raises(ValueError, match="cannot be empty"):
        parse("QUANTIZE EMBEDDINGS ON embedding")


def test_sessionize_matches_query(engine, spark, smoke_dir):
    out = engine.execute("SESSIONIZE events BY user_id GAP 2 HOURS")
    want = QUERIES["events_user_sessions"](spark, smoke_dir)
    assert _rows(out) == _rows(want)


def test_quantize_matches_query(engine, spark, smoke_dir):
    out = engine.execute("QUANTIZE EMBEDDINGS embeddings")
    want = QUERIES["embedding_quantize_int8"](spark, smoke_dir)
    assert _rows(out) == _rows(want)


def test_parse_mix_profile_forms():
    m = parse("MIX documents")
    assert isinstance(m, ir.MixCorpus)
    assert m.by == "source" and m.temperature == 2

    m = parse("MIX documents BY lang TEMPERATURE 2")
    assert m.by == "lang"

    p = parse("PROFILE lineitem ON l_quantity, l_extendedprice")
    assert isinstance(p, ir.ProfileTable)
    assert p.columns == ["l_quantity", "l_extendedprice"]


def test_parse_mix_profile_reject_bad():
    with pytest.raises(ValueError, match="TEMPERATURE must be 2"):
        parse("MIX documents TEMPERATURE 3")
    with pytest.raises(ValueError, match="TEMPERATURE must be a positive integer"):
        parse("MIX documents TEMPERATURE zero")
    with pytest.raises(Exception, match="column"):
        parse("PROFILE lineitem ON")
    with pytest.raises(Exception, match="cannot be empty"):
        parse("PROFILE ON x")


def test_mix_matches_query(engine, spark, smoke_dir):
    out = engine.execute("MIX documents BY source")
    want = QUERIES["corpus_temperature_mix"](spark, smoke_dir)
    assert _rows(out) == _rows(want)


def test_profile_matches_query(engine, spark, smoke_dir):
    out = engine.execute(
        "PROFILE lineitem ON l_quantity, l_extendedprice, l_discount"
    )
    want = QUERIES["lineitem_numeric_profile"](spark, smoke_dir)
    assert _rows(out) == _rows(want)


def test_parse_detect_forms():
    d = parse("DETECT ANOMALIES events")
    assert isinstance(d, ir.DetectAnomalies)
    assert d.key == "event_type" and d.window == 24

    d = parse("DETECT ANOMALIES events BY event_type ON ts WINDOW 12")
    assert d.window == 12 and d.ts_column == "ts"

    with pytest.raises(ValueError, match="WINDOW must be a positive integer"):
        parse("DETECT ANOMALIES events WINDOW 0")


def test_detect_anomalies_matches_query(engine, spark, smoke_dir):
    out = engine.execute("DETECT ANOMALIES events")
    want = QUERIES["events_rate_anomalies"](spark, smoke_dir)
    assert _rows(out) == _rows(want)


def test_parse_shard_compact_forms():
    s = parse("SHARD documents INTO 16 SHARDS")
    assert isinstance(s, ir.ShardCorpus)
    assert s.n_shards == 16 and s.id_column == "doc_id"

    s = parse("SHARD embeddings INTO 4 SHARDS BY vec_id")
    assert s.n_shards == 4 and s.id_column == "vec_id"

    c = parse("COMPACT manifest TARGET 262144 BYTES")
    assert isinstance(c, ir.CompactTable)
    assert c.target_bytes == 262144
    assert (c.part_column, c.file_column, c.bytes_column) == (
        "part", "file_id", "bytes",
    )

    c = parse(
        "COMPACT manifest TARGET 1048576 BYTES PARTITION BY dt"
        " FILE BY path SIZE BY sz"
    )
    assert (c.part_column, c.file_column, c.bytes_column) == ("dt", "path", "sz")


def test_parse_shard_compact_reject_bad():
    with pytest.raises(ValueError, match="INTO must be a positive"):
        parse("SHARD documents INTO 0 SHARDS")
    with pytest.raises(ValueError, match="TARGET must be a positive"):
        parse("COMPACT manifest TARGET 0 BYTES")
    with pytest.raises(ValueError, match="cannot be empty"):
        parse("SHARD INTO 4 SHARDS")


def test_shard_statement_balance_and_determinism(engine, spark):
    out = engine.execute("SHARD documents INTO 8 SHARDS").select(
        "doc_id", "shard"
    )
    rows = _rows(out)
    assert rows == _rows(engine.execute("SHARD documents INTO 8 SHARDS")
                         .select("doc_id", "shard"))  # restart-safe
    from collections import Counter

    counts = Counter(shard for _, shard in rows)
    assert set(counts) == set(range(8))
    assert max(counts.values()) - min(counts.values()) <= 1  # exact ±1


def test_compact_statement_matches_query(engine, spark, smoke_dir):
    from pyspark.sql import functions as F

    from declarativeml_spark.operators.layout import simulated_file_manifest
    from declarativeml_spark.sources.catalog import load_table

    manifest = simulated_file_manifest(load_table(spark, smoke_dir, "orders"))
    manifest.createOrReplaceTempView("manifest")
    plan = (
        engine.execute("COMPACT manifest TARGET 262144 BYTES")
        .groupBy("part", "grp_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("grp_bytes"),
        )
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("n_files").cast("long").alias("n_files"),
            F.sum("grp_bytes").cast("long").alias("total_bytes"),
            F.max("grp_bytes").alias("max_group_bytes"),
            F.max("n_files").alias("max_group_files"),
        )
    )
    want = QUERIES["lakehouse_compaction_plan"](spark, smoke_dir)
    assert _rows(plan) == _rows(want)


def test_compact_next_fit_bound(engine, spark, smoke_dir):
    # files are never split, so every group except a partition's last
    # lands within one (partition-max) file size of the target on
    # both sides — the documented next-fit bound
    from pyspark.sql import functions as F

    from declarativeml_spark.operators.layout import simulated_file_manifest
    from declarativeml_spark.sources.catalog import load_table

    manifest = simulated_file_manifest(load_table(spark, smoke_dir, "orders"))
    manifest.createOrReplaceTempView("manifest2")
    out = engine.execute("COMPACT manifest2 TARGET 262144 BYTES")
    g = out.groupBy("part", "grp_id").agg(F.sum("bytes").alias("grp_bytes"))
    pmax = out.groupBy("part").agg(
        F.max("bytes").alias("max_file"), F.max("grp_id").alias("last_grp")
    )
    bad = (
        g.join(pmax, "part")
        .where(
            "grp_id < last_grp AND"
            " (grp_bytes <= 262144 - max_file OR grp_bytes >= 262144 + max_file)"
        )
        .count()
    )
    assert bad == 0


def test_parse_shuffle_forms():
    s = parse("SHUFFLE documents EPOCHS 3")
    assert isinstance(s, ir.ShuffleCorpus)
    assert s.epochs == 3 and s.n_shards == 8 and s.id_column == "doc_id"

    s = parse("SHUFFLE documents EPOCHS 2 SHARDS 4 BY doc_id")
    assert s.epochs == 2 and s.n_shards == 4

    with pytest.raises(ValueError, match="EPOCHS must be a positive"):
        parse("SHUFFLE documents EPOCHS 0")


def test_parse_score_quality_forms():
    s = parse("SCORE QUALITY documents")
    assert isinstance(s, ir.ScoreQuality)
    assert s.buckets == 512 and s.text_column == "text"

    s = parse("SCORE QUALITY documents BUCKETS 64 ON body")
    assert s.buckets == 64 and s.text_column == "body"

    with pytest.raises(ValueError, match="BUCKETS must be a positive"):
        parse("SCORE QUALITY documents BUCKETS 0")


def test_shuffle_statement_matches_audit_query(engine, spark, smoke_dir):
    """The SHUFFLE statement's row-level assignments must aggregate to
    exactly the oracle-checked corpus_epoch_shuffle audit."""
    from pyspark.sql import functions as F

    out = engine.execute("SHUFFLE documents EPOCHS 3 SHARDS 8")
    assert {"epoch", "skey", "shard"} <= set(out.columns)
    got = _rows(
        out.groupBy(
            F.col("epoch").cast("long").alias("epoch"),
            F.col("shard").cast("long").alias("shard"),
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("tot_chars"),
            F.min("skey").cast("long").alias("min_key"),
            F.max("skey").cast("long").alias("max_key"),
        )
    )
    want = _rows(QUERIES["corpus_epoch_shuffle"](spark, smoke_dir))
    assert got == want
    # determinism: a second execution reproduces the permutation
    again = engine.execute("SHUFFLE documents EPOCHS 3 SHARDS 8")
    assert _rows(out.select("doc_id", "epoch", "skey")) == _rows(
        again.select("doc_id", "epoch", "skey")
    )


def test_score_quality_statement_matches_rollup_query(engine, spark, smoke_dir):
    from pyspark.sql import functions as F

    from declarativeml_spark.queries.registry import sround

    out = engine.execute("SCORE QUALITY documents")
    assert {"doc_id", "n_tokens", "margin"} <= set(out.columns)
    got = _rows(
        out.groupBy("source", "lang").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("margin") > 0).cast("long"))
            .cast("long")
            .alias("n_positive"),
            sround(
                F.sum(F.col("margin").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                8,
            ).alias("avg_margin"),
        )
    )
    want = _rows(QUERIES["quality_linear_margin"](spark, smoke_dir))
    assert got == want


def test_shuffle_write_order_materializes(engine, spark, smoke_dir, tmp_path):
    """The documented write pattern for SHUFFLE output —
    repartitionByRange(epoch, shard, skey) + sortWithinPartitions —
    must yield files whose row order IS the per-(epoch, shard)
    hash-shuffled training order, reproducibly."""
    from pyspark.sql import functions as F

    out = engine.execute("SHUFFLE documents EPOCHS 2 SHARDS 4")
    path = str(tmp_path / "epochs")
    (
        out.select("epoch", "shard", "skey", "doc_id")
        # doc_id completes the composite: the 16-bit skey ties above
        # ~65k rows/shard, and range-splitting on a non-unique prefix
        # would leave within-tie placement to shuffle nondeterminism
        .repartitionByRange(8, "epoch", "shard", "skey", "doc_id")
        .sortWithinPartitions("epoch", "shard", "skey", "doc_id")
        .write.partitionBy("epoch", "shard")
        .parquet(path)
    )
    back = spark.read.parquet(path).withColumn(
        "f", F.input_file_name()
    )
    # every written FILE holds its rows in skey order — the order a
    # data loader streaming the file sees is the shuffled order
    files = [r["f"] for r in back.select("f").distinct().collect()]
    assert files
    for f in files:
        rows = [
            tuple(r)
            for r in back.filter(F.col("f") == f)
            .select("skey", "doc_id")
            .collect()
        ]
        assert rows == sorted(rows), f
    # determinism: the full assignment is identical on re-execution
    again = engine.execute("SHUFFLE documents EPOCHS 2 SHARDS 4")
    a = sorted(tuple(r) for r in out.select("doc_id", "epoch", "shard", "skey").collect())
    b = sorted(tuple(r) for r in again.select("doc_id", "epoch", "shard", "skey").collect())
    assert a == b


def test_parse_weigh_forms():
    w = parse("WEIGH documents AGAINST 'src0'")
    assert isinstance(w, ir.WeighCorpus)
    assert w.target_value == "src0" and w.target_column == "source"
    assert w.buckets == 512

    w = parse("WEIGH documents AGAINST 'en' ON lang BUCKETS 64")
    assert w.target_column == "lang" and w.buckets == 64

    with pytest.raises(Exception, match="quoted target value"):
        parse("WEIGH documents AGAINST src0")
    with pytest.raises(ValueError, match="BUCKETS must be a positive"):
        parse("WEIGH documents AGAINST 'x' BUCKETS 0")


def test_weigh_statement_matches_query_topk(engine, spark, smoke_dir):
    """The WEIGH statement's per-document weights, cut to the query's
    top-k ordering, must equal the oracle-checked
    dsir_importance_weights exactly."""
    from pyspark.sql import functions as F

    from declarativeml_spark.operators.textops import stable_round

    out = engine.execute("WEIGH documents AGAINST 'src0' BUCKETS 512")
    assert set(out.columns) == {"doc_id", "n_tokens", "log_weight"}
    top = (
        out.orderBy(F.desc("log_weight"), F.asc("doc_id"))
        .limit(100)
        .select(
            "doc_id",
            "n_tokens",
            F.expr(stable_round("log_weight", 8)).alias("log_weight"),
        )
    )
    got = {(r.doc_id, r.n_tokens, r.log_weight) for r in top.collect()}
    want = {
        (r.doc_id, r.n_tokens, r.log_weight)
        for r in QUERIES["dsir_importance_weights"](spark, smoke_dir).collect()
    }
    assert got == want


# -- AUDIT ANONYMITY / CALIBRATE DEDUP (round 4) --------------------------


def test_parse_audit_forms():
    a = parse("AUDIT ANONYMITY events ON event_type")
    assert isinstance(a, ir.AuditAnonymity)
    assert a.source == "events" and a.columns == ["event_type"]
    assert a.risk == 5

    a = parse("AUDIT ANONYMITY events ON event_type, user_id RISK 10")
    assert a.columns == ["event_type", "user_id"] and a.risk == 10


def test_parse_calibrate_forms():
    c = parse("CALIBRATE DEDUP documents")
    assert isinstance(c, ir.CalibrateDedup)
    assert c.thresholds[0] == 0.05 and len(c.thresholds) == 8
    assert c.text_column == "text"

    c = parse("CALIBRATE DEDUP documents THRESHOLDS 0.1, 0.3 ON body")
    assert c.thresholds == [0.1, 0.3] and c.text_column == "body"


def test_parse_audit_calibrate_rejects():
    from declarativeml_spark.dsl import DSLSyntaxError

    with pytest.raises(ValueError, match="RISK"):
        parse("AUDIT ANONYMITY events ON event_type RISK 0")
    with pytest.raises((DSLSyntaxError, ValueError)):
        parse("AUDIT ANONYMITY events")  # missing ON clause
    with pytest.raises(ValueError, match="THRESHOLDS"):
        parse("CALIBRATE DEDUP documents THRESHOLDS 1.5")
    with pytest.raises(ValueError, match="cannot be empty"):
        parse("CALIBRATE DEDUP THRESHOLDS 0.1")


def test_audit_statement_matches_groupby(engine, spark):
    from pyspark.sql import functions as F

    out = engine.execute("AUDIT ANONYMITY events ON event_type RISK 999")
    assert out.columns == ["event_type", "n_members", "at_risk"]
    want = _rows(
        spark.table("events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            (F.count(F.lit(1)) < 999).alias("at_risk"),
        )
    )
    assert _rows(out) == want
    # every class is below a RISK this large
    assert all(r[-1] for r in _rows(out))


def test_audit_rejects_unknown_column(engine):
    with pytest.raises(ValueError, match="not in"):
        engine.execute("AUDIT ANONYMITY events ON no_such_col")


def test_calibrate_statement_matches_query(engine, spark, smoke_dir):
    out = engine.execute("CALIBRATE DEDUP documents")
    assert out.columns == ["threshold", "n_pairs", "n_docs", "avg_jaccard"]
    expected = QUERIES["dedup_threshold_sweep"](spark, smoke_dir)
    assert _rows(out) == _rows(expected)


def test_calibrate_zero_hit_and_duplicate_thresholds(spark, smoke_dir):
    """A cutoff no pair reaches must still get its curve row
    (n_pairs=0) — dropping it would make 'no pairs' look like 'not
    requested' — and duplicate thresholds must collapse to set
    semantics instead of double-counting every pair through the
    non-equi join."""
    from declarativeml_spark.operators.dedup import threshold_sweep
    from declarativeml_spark.sources.catalog import load_table

    docs = load_table(spark, smoke_dir, "documents")
    out = {
        r["threshold"]: r
        for r in threshold_sweep(docs, [0.2, 1.0]).collect()
    }
    assert set(out) == {0.2, 1.0}
    assert out[0.2]["n_pairs"] > 0
    # jaccard 1.0 pairs may or may not exist; the row must regardless
    assert out[1.0]["n_pairs"] >= 0 and out[1.0]["n_docs"] >= 0
    if out[1.0]["n_pairs"] == 0:
        assert out[1.0]["n_docs"] == 0 and out[1.0]["avg_jaccard"] is None

    dup = {
        r["threshold"]: r["n_pairs"]
        for r in threshold_sweep(docs, [0.2, 0.2]).collect()
    }
    assert dup == {0.2: out[0.2]["n_pairs"]}


def test_pack_chunks_refuses_string_ids(spark):
    """String ids would ANSI-crash or (ANSI off) collapse every row
    into one NULL bucket — the single packing stream this operator
    exists to avoid; refused loudly at plan time (review r11)."""
    import pytest as _pytest

    from declarativeml_spark.operators.corpus import pack_chunks

    df = spark.createDataFrame(
        [("doc-0001", "a b c"), ("doc-0002", "d e")],
        "doc_id string, text string",
    )
    with _pytest.raises(ValueError, match="integer id"):
        pack_chunks(df, context=4)
