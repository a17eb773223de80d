"""PII scrubbing + chunk-window + surprisal + datasheet operators.

The registered queries run over synthetic word-salad documents (with
a planted contact line), so these unit tests supply REAL-shaped PII
strings to prove the pattern machinery itself: detection counts,
masking, ordering between overlapping classes, and the no-PII
identity path. Oracle hash-parity is covered by test_oracle_parity.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from declarativeml_spark.operators.pii import (
    PII_PATTERNS,
    pii_counts,
    pii_redact,
)


def _scrub(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        *pii_counts("text"), pii_redact("text").alias("red")
    ).collect()[0]
    return row


def test_pii_email_detection_and_masking(spark):
    row = _scrub(spark, "mail jane.doe+tag@sub.example.co.uk now")
    assert row.n_email == 1
    assert row.red == "mail <EMAIL> now"


def test_pii_ipv4_and_ssn(spark):
    row = _scrub(spark, "host 192.168.0.17 owner ssn 123-45-6789")
    assert row.n_ipv4 == 1
    assert row.n_ssn == 1
    assert "<IP>" in row.red and "<SSN>" in row.red
    assert "192.168" not in row.red and "123-45-6789" not in row.red


def test_pii_phone_and_card_runs(spark):
    # card-shaped digit runs are caught by the phone-shaped pattern
    row = _scrub(spark, "tel +1 (415) 555-0199 card 4111 1111 1111 1111")
    assert row.n_phone >= 2
    assert "4111" not in row.red and "0199" not in row.red


def test_pii_ssn_masked_before_phone_pass(spark):
    # an SSN also matches the phone-shaped run; the fixed class order
    # (email, ipv4, ssn, phone) must label it <SSN>, not <PHONE>
    row = _scrub(spark, "id 123-45-6789 end")
    assert "<SSN>" in row.red and "<PHONE>" not in row.red


def test_pii_clean_text_is_identity(spark):
    clean = "the quick brown fox jumps over the lazy dog"
    row = _scrub(spark, clean)
    assert row.red == clean
    assert all(row[f"n_{name}"] == 0 for name, _, _ in PII_PATTERNS)


def test_chunk_windows_cover_every_token(spark, smoke_dir):
    from declarativeml_spark.queries.pipeline3 import (
        _STRIDE,
        _WIN,
        text_chunk_windows,
    )

    out = text_chunk_windows(spark, smoke_dir)
    rows = out.groupBy("doc_id").agg(
        F.count("*").alias("n_win"),
        F.max("win_id").alias("max_win"),
        F.sum("n_win_tokens").alias("win_toks"),
    )
    bad = rows.filter(
        (F.col("n_win") != F.col("max_win") + 1) | (F.col("n_win") < 1)
    ).count()
    assert bad == 0
    # every window except a document's last must be exactly _WIN long
    short_nonlast = (
        out.withColumn(
            "is_last",
            F.col("win_id") == F.max("win_id").over(Window.partitionBy("doc_id")),
        )
        .filter(~F.col("is_last") & (F.col("n_win_tokens") != _WIN))
        .count()
    )
    assert short_nonlast == 0
    assert _STRIDE < _WIN  # overlap invariant the operator promises


def test_surprisal_bounds(spark, smoke_dir):
    from declarativeml_spark.queries.pipeline3 import text_unigram_surprisal

    out = text_unigram_surprisal(spark, smoke_dir)
    # -log2 p is in (0, log2(total_tokens)]; average must stay inside
    bad = out.filter(
        (F.col("avg_surprisal") <= 0) | (F.col("avg_surprisal") > 64)
    ).count()
    assert bad == 0


def test_datasheet_one_row_per_source(spark, smoke_dir):
    from declarativeml_spark.queries.pipeline3 import corpus_source_datasheet
    from declarativeml_spark.sources.catalog import load_table

    out = corpus_source_datasheet(spark, smoke_dir)
    n_sources = (
        load_table(spark, smoke_dir, "documents").select("source").distinct().count()
    )
    rows = out.collect()
    assert len(rows) == n_sources
    for r in rows:
        assert r.n_docs >= 1
        assert r.total_tokens >= r.n_docs  # every doc has >= 1 token
        assert 0 <= r.en_docs <= r.n_docs
        assert 0 <= r.dup_docs < r.n_docs


def test_semdedup_keeps_lowest_id_per_duplicate_group(spark, smoke_dir):
    from declarativeml_spark.operators.dedup import semdedup
    from declarativeml_spark.sources.catalog import load_table

    emb = load_table(spark, smoke_dir, "embeddings")
    out = semdedup(emb).collect()
    assert len(out) == emb.filter(F.size("embedding") == 64).count()
    kept = {r.vec_id for r in out if r.kept}
    # the smallest vec_id in every cell can never be dominated
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r.vec_id)
    for ids in by_cell.values():
        assert min(ids) in kept


def test_semdedup_threshold_one_keeps_everything(spark, smoke_dir):
    from declarativeml_spark.operators.dedup import semdedup
    from declarativeml_spark.sources.catalog import load_table

    emb = load_table(spark, smoke_dir, "embeddings")
    out = semdedup(emb, threshold=1.0000001)
    assert out.filter(~F.col("kept")).count() == 0


def test_pii_redaction_is_idempotent(spark):
    # scrubbing already-scrubbed text must be a no-op: replacement
    # tokens must not themselves match any PII pattern
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.lists(
        st.sampled_from(
            [
                "bob@x.io",
                "10.0.0.1",
                "123-45-6789",
                "+1 415 555 0199",
                "plain",
                "word",
                "a.b",
                "4111 1111 1111 1111",
            ]
        ),
        min_size=1,
        max_size=8,
    ).map(" ".join)

    @given(texts)
    @settings(max_examples=20, deadline=None)
    def check(text):
        df = spark.createDataFrame([(text,)], "text string")
        once = df.select(pii_redact("text").alias("text"))
        twice = once.select(pii_redact("text").alias("text"))
        assert once.collect()[0].text == twice.collect()[0].text

    check()


def test_chunk_windows_invariants_random(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from declarativeml_spark.operators.corpus import chunk_windows

    @given(
        n_tokens=st.integers(min_value=1, max_value=200),
        win=st.integers(min_value=2, max_value=64),
        data=st.data(),
    )
    @settings(max_examples=15, deadline=None)
    def check(n_tokens, win, data):
        stride = data.draw(st.integers(min_value=1, max_value=win))
        text = " ".join(f"t{i}" for i in range(n_tokens))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_windows(df, win=win, stride=stride).collect(),
            key=lambda r: r.win_id,
        )
        # window ids are dense from 0; every non-final window is full;
        # stride<=win means every token appears in some window
        assert [r.win_id for r in rows] == list(range(len(rows)))
        assert all(r.n_win_tokens == win for r in rows[:-1])
        covered = set()
        for r in rows:
            start = r.win_id * stride
            covered.update(range(start, start + r.n_win_tokens))
        assert covered == set(range(n_tokens))

    check()
