"""Unicode (UTF-8) behavior of the text-operator family.

The driver-gated unicode queries (`text_unicode_token_stats`,
`text_unicode_pii_redaction`) pin tokenization stats and PII over a
generated UTF-8 slice; these tests extend that coverage to the BPE
tokenizer trainer (which until round 9 split words on ``[^a-z0-9]+``
and silently DISCARDED every non-ASCII character — a multilingual
corpus trained a tokenizer on nothing), the readability expressions,
and the language-ID expression plane, each checked cross-engine
against DuckDB over the same unicode rows.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from declarativeml_spark.operators.bpe import (
    _CASEFOLD,
    _WORD_SPLIT,
    _valid_symbol,
    bpe_merges,
    bpe_merges_oracle_sql,
    bpe_tokenize_map,
    bpe_tokens_expr,
)

UNI_DOCS = [
    (1, "café crème café 模型训练 模型训练 naïve"),
    (2, "模型训练 データ 処理 データ 処理 café"),
    (3, "über naïve über café crème 😀🚀 ---"),
    (4, "한국어 처리 한국어 처리 café crème 42 42"),
    (5, "café crème 模型训练 データ 42 !!!"),
    # uppercase Greek with word-final sigma: Java lower() emits the
    # contextual FINAL sigma ς, utf8proc emits σ — the _CASEFOLD
    # normalization is what keeps the engines' word types identical
    (6, "ΑΣ ΑΣ ΒΣ ΑΣ café ΟΔΟΣ ΟΔΟΣ"),
]


def _duck_with_docs():
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", UNI_DOCS)
    return con


def test_valid_symbol_unicode_alphabet():
    # letters/digits of any script pass
    for ok in ("café", "模型", "データ", "한국어", "ab12", "é", "ß"):
        assert _valid_symbol(ok), ok
    # anything that could break a SQL literal or the fold separator fails
    for bad in ("", "a'b", 'a"b', "a\\b", "a b", "a\x1fb", "😀", "a_b", None, 7):
        assert not _valid_symbol(bad), bad


def test_jvm_split_matches_re2_split(spark):
    """The Java-regex split+casefold (Spark side) and the RE2
    split+casefold (DuckDB oracle side) must produce identical word
    lists — including the Greek final-sigma fold."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(UNI_DOCS, "doc_id long, text string")
    jvm = {
        r.doc_id: [w for w in r.words if w]
        for r in df.select(
            "doc_id",
            F.split(
                F.expr(_CASEFOLD.format(t="text")), _WORD_SPLIT
            ).alias("words"),
        ).collect()
    }
    con = _duck_with_docs()
    duck = dict(con.execute(
        f"SELECT doc_id, list_filter(string_split_regex("
        f"{_CASEFOLD.format(t='text')}, '{_WORD_SPLIT}'), w -> w <> '')"
        " FROM docs"
    ).fetchall())
    assert jvm == duck


def test_bpe_merges_unicode_cross_engine(spark):
    """BPE merge learning over a mixed-script corpus: the Spark
    learner and the DuckDB oracle replay must produce the identical
    merge table (same winners, same counts, same order) — CJK and
    accented symbols included."""
    df = spark.createDataFrame(UNI_DOCS, "doc_id long, text string")
    got = [
        (r.merge_round, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_merges(df, n_merges=4).collect()
    ]
    con = _duck_with_docs()
    want = [tuple(t) for t in con.execute(
        bpe_merges_oracle_sql(4, table="docs")
    ).fetchall()]
    assert got == want
    # the learned alphabet actually contains non-ASCII symbols —
    # the pre-r9 splitter would have discarded them all
    assert any(any(ord(c) > 127 for c in m[3]) for m in got), got


def test_bpe_merges_unicode_deterministic(spark):
    df = spark.createDataFrame(UNI_DOCS, "doc_id long, text string")
    a = bpe_merges(df, n_merges=4).collect()
    b = bpe_merges(df, n_merges=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bpe_tokens_expr_unicode_roundtrip(spark):
    """Encoding unicode text through the codegen fold chain: token
    arrays re-concatenate to the split words (merges only ever join
    adjacent symbols, never drop codepoints)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(UNI_DOCS, "doc_id long, text string")
    rules = [
        (r.lhs, r.rhs) for r in bpe_merges(df, n_merges=4).collect()
    ]
    toks = df.select(
        "text", F.expr(bpe_tokens_expr("text", rules)).alias("tokens")
    ).collect()
    for row in toks:
        joined = "".join(row.tokens)
        words = "".join(
            w
            for w in re.split(r"[\W_]+", row.text.lower().replace("ς", "σ"))
            if w
        )
        assert joined == words, (row.text, row.tokens)


def test_bpe_tokenize_map_equals_expr_path_unicode(spark):
    """The Arrow mapInPandas encode (JVM-side split, Python merge
    fold) and the codegen expression encode must produce identical
    token arrays over the unicode corpus — the two TOKENIZE paths'
    equivalence contract, now including Greek case folding."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(UNI_DOCS, "doc_id long, text string")
    rules = [
        (r.lhs, r.rhs) for r in bpe_merges(df, n_merges=4).collect()
    ]
    via_expr = {
        r.doc_id: r.tokens
        for r in df.select(
            "doc_id", F.expr(bpe_tokens_expr("text", rules)).alias("tokens")
        ).collect()
    }
    via_map = {
        r.doc_id: r.tokens
        for r in bpe_tokenize_map(df, "text", rules).select(
            "doc_id", "tokens"
        ).collect()
    }
    assert via_expr == via_map


def test_readability_exprs_unicode_cross_engine(spark):
    """The shared flesch expression text over unicode docs: identical
    (words, sentences, vowel-groups, score) on both engines."""
    from declarativeml_spark.queries.pipeline10 import _readability_exprs

    flesch, s, d = _readability_exprs()
    df = spark.createDataFrame(UNI_DOCS, "doc_id long, text string")
    df.createOrReplaceTempView("uni_read_docs")
    got = spark.sql(
        f"SELECT doc_id, {s['words']} AS words, {s['sentences']} AS sentences,"
        f" {s['vg']} AS vg FROM uni_read_docs ORDER BY doc_id"
    ).collect()
    con = _duck_with_docs()
    want = con.execute(
        f"SELECT doc_id, {d['words']} AS words, {d['sentences']} AS sentences,"
        f" {d['vg']} AS vg FROM docs ORDER BY doc_id"
    ).fetchall()
    assert [(r.doc_id, r.words, r.sentences, r.vg) for r in got] == [
        tuple(t) for t in want
    ]


def test_language_id_exprs_unicode_cross_engine(spark):
    """Stopword-hit counting and the max-hit CASE over text containing
    CJK/emoji: same hits and same predicted language on both engines
    (non-ASCII tokens simply never match a stopword)."""
    from declarativeml_spark.operators import textops as T

    rows = [
        (1, "the model of the data 模型 is in the set"),
        (2, "el modelo de la 데이터 y el conjunto es 😀"),
        (3, "der hund und die katze ist von 犬 mit zu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("uni_lid_docs")
    toks_s = T.TOKENS_SPARK.format(text="lower(text)")
    toks_d = T.TOKENS_DUCK.format(text="lower(text)")
    hits_s = {
        lang: T.lang_hits_spark(toks_s, lang) for lang in T.LANG_ORDER
    }
    hits_d = {
        lang: T.lang_hits_duck(toks_d, lang) for lang in T.LANG_ORDER
    }
    got = spark.sql(
        "SELECT doc_id, "
        + ", ".join(f"{hits_s[k]} AS h_{k}" for k in T.LANG_ORDER)
        + f", {T.predicted_lang_case({k: hits_s[k] for k in T.LANG_ORDER})} AS lang"
        " FROM uni_lid_docs ORDER BY doc_id"
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = con.execute(
        "SELECT doc_id, "
        + ", ".join(f"{hits_d[k]} AS h_{k}" for k in T.LANG_ORDER)
        + f", {T.predicted_lang_case({k: hits_d[k] for k in T.LANG_ORDER})} AS lang"
        " FROM docs ORDER BY doc_id"
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(t) for t in want]
    assert [r.lang for r in got] == ["en", "es", "de"]


def test_bpe_rejects_symbols_outside_alphabet():
    from declarativeml_spark.operators.bpe import merge_chain_expr

    with pytest.raises(ValueError, match="outside"):
        merge_chain_expr("seq", [("a'; DROP TABLE x; --", "b")])
    with pytest.raises(ValueError, match="outside"):
        merge_chain_expr("seq", [("a", "b\x1f")])
    # unicode letters are inside the alphabet now
    merge_chain_expr("seq", [("模", "型"), ("é", "è")])


def test_bbc_augmentation_null_text_cross_engine(spark):
    """_BBC_AUG pins the NULL convention with coalesce: Spark
    concat(NULL, s) is NULL while DuckDB concat SKIPS NULL args — a
    NULL documents.text row previously hash-diverged the
    tokenizer_bpe_byte_coverage gate between engines."""
    import duckdb

    from declarativeml_spark.queries.pipeline11 import (
        _BBC_AUG_DUCK,
        _BBC_AUG_SPARK,
    )

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, "plain text")], "doc_id int, text string"
    )
    got_spark = [
        r.aug
        for r in df.select(F.expr(_BBC_AUG_SPARK).alias("aug"))
        .orderBy("doc_id")
        .collect()
    ]
    got_duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT "
            + _BBC_AUG_DUCK
            + " AS aug FROM (VALUES (1, NULL), (2, 'plain text'))"
            " t(doc_id, text) ORDER BY doc_id"
        ).fetchall()
    ]
    assert got_spark == got_duck
    assert got_spark[0] is not None  # NULL text still tokenizes
