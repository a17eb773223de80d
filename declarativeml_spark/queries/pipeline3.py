"""Training-data pipeline operators, part 3: PII scrubbing,
overlapping context-window chunking, unigram-LM surprisal scoring,
and per-source dataset cards.

These round out the corpus-hygiene surface (BASELINE.json north
star) with the stages a 100 TB pretraining pipeline runs that parts
1-2 didn't yet cover:

* PII redaction (mask emails / IPs / SSNs / phone-shaped runs before
  tokenization — pure per-row regex, one codegen'd map over the
  corpus);
* overlapping token-window chunking (the RAG/finetuning counterpart
  of pack_concat_chunks' disjoint packing: stride-S windows of W
  tokens per document, explode-only, no shuffle);
* unigram language-model surprisal (the CCNet-style "how surprising
  is this document under a corpus LM" quality signal, with the
  corpus unigram table as a broadcast dimension);
* per-source dataset cards (the datasheet row a corpus curator
  publishes per source: volume, token budget, language mix, exact
  dup rate, quality).

Every query is hash-checked against a DuckDB oracle; float handling
follows registry.py (per-row IEEE + stable_round, DECIMAL(38,6)
aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from declarativeml_spark.operators import textops as T
from declarativeml_spark.operators.pii import (
    pii_counts,
    pii_counts_duck,
    pii_redact,
    pii_redact_duck,
)
from declarativeml_spark.queries.registry import query, sround
from declarativeml_spark.sources.catalog import load_table

_TOKS_S = T.TOKENS_SPARK.format(text="text")
_TOKS_D = T.TOKENS_DUCK.format(text="text")


# ---------------------------------------------------------------------------
# The synthetic corpus contains no real PII, so the scrub query
# plants a deterministic contact line derived from doc_id — both
# engines compute the identical augmented text, and the redactor has
# real matches to find (counts are nonzero, the masked text differs
# from the input). The pattern machinery itself is also covered by
# pure-synthetic unit tests in tests/test_pii_chunks.py.
_AUG_DUCK = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.1 ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' tel +1 415 555 0199'"
)


def _aug_spark() -> F.Column:
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1 ssn 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" tel +1 415 555 0199"),
    )


@query(
    "text_pii_redaction",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_AUG_DUCK} AS aug FROM documents)
    SELECT doc_id,
           {pii_counts_duck('aug')},
           md5({pii_redact_duck('aug')}) AS red_md5,
           CAST(length({pii_redact_duck('aug')}) AS BIGINT) AS red_len
    FROM d
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and mask emails / IPv4s / SSNs / phone-shaped
    digit runs per document (patterns in operators/pii.py, bound via
    F.lit so Spark's string-literal escaping can never corrupt them).

    Scale: shuffle-free per-row regexes inside WholeStageCodegen —
    at 100 TB this is one map over the corpus scan, the cheapest
    possible shape for a scrubbing pass.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn("aug", _aug_spark())
    red = pii_redact("aug")
    return docs.select(
        "doc_id",
        *pii_counts("aug"),
        F.md5(red).alias("red_md5"),
        F.length(red).cast("bigint").alias("red_len"),
    )


# ---------------------------------------------------------------------------
_WIN = 32  # tokens per window
_STRIDE = 24  # window stride (25% overlap)


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS_D} AS toks FROM documents),
    e AS (SELECT doc_id, toks,
                 CAST(unnest(generate_series(0,
                      CAST(greatest(ceil((len(toks) - {_WIN}) / {_STRIDE}.0), 0) AS INT)))
                      AS BIGINT) AS win_id
          FROM d)
    SELECT doc_id, win_id,
           CAST(len(toks[win_id * {_STRIDE} + 1 : win_id * {_STRIDE} + {_WIN}]) AS BIGINT)
             AS n_win_tokens,
           md5(array_to_string(toks[win_id * {_STRIDE} + 1 : win_id * {_STRIDE} + {_WIN}], ' '))
             AS chunk_md5
    FROM e
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: stride-24 windows of 32
    tokens per document — the retrieval/finetuning-side
    counterpart of pack_concat_chunks (which packs disjoint windows
    across documents; this slices overlapping windows within one).

    Scale: sequence+posexplode+slice are all codegen'd per-row ops —
    zero shuffle; output volume is input x (1/stride overlap factor),
    and the slice bounds push no data movement anywhere. The chunk
    content travels as a 32-byte md5, not the token text.
    """
    from declarativeml_spark.operators.corpus import chunk_windows

    out = chunk_windows(
        load_table(spark, sf_dir, "documents"), win=_WIN, stride=_STRIDE
    )
    return out.select(
        "doc_id",
        "win_id",
        "n_win_tokens",
        F.md5("chunk").alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
@query(
    "text_unigram_surprisal",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_D}) AS t FROM documents),
    freq AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT SUM(c) AS n FROM freq),
    per AS (SELECT tok.doc_id,
                   {T.stable_round('log2(tot.n) - log2(freq.c)', 6)} AS surp
            FROM tok JOIN freq ON tok.t = freq.t CROSS JOIN tot)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           {T.stable_round(
               'CAST(SUM(CAST(surp AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)', 6
           )} AS avg_surprisal
    FROM per GROUP BY doc_id
    """,
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal per document: average -log2 p(token)
    under the corpus's own unigram distribution — the CCNet-style
    quality signal (high = gibberish / rare-token soup, low =
    repetitive boilerplate).

    Scale: the unigram table is vocabulary-sized (millions of rows at
    100 TB corpus scale — still broadcastable at a few hundred MB; if
    a tokenizer-normalized vocab is used it's thousands). Token rows
    join map-side against the broadcast, then one groupBy(doc_id) of
    pre-rounded decimals. Per-token surprisal is stable_round'ed
    BEFORE aggregation so engine log() ulp differences cannot reach
    the decimal sum.
    """
    from declarativeml_spark.operators.caching import track_persist

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKS_S).alias("toks")
    )
    # persisted: the exploded token plane feeds BOTH the unigram
    # frequency table (twice, via its total) and the surprisal join —
    # unpersisted the tokenize + explode ran 3x (the
    # dedup_substring_runs emitter pattern)
    tok = track_persist(docs.select("doc_id", F.explode("toks").alias("t")))
    freq = tok.groupBy("t").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").alias("n"))
    per = (
        tok.join(F.broadcast(freq), "t")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            sround(F.log2("n") - F.log2("c"), 6).alias("surp"),
        )
    )
    return per.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        sround(
            F.sum(F.col("surp").cast("decimal(38,6)")).cast("double") / F.count("*"),
            6,
        ).alias("avg_surprisal"),
    )


# ---------------------------------------------------------------------------
def _semdedup_oracle() -> str:
    from declarativeml_spark.operators.dedup import semdedup_oracle_sql

    return semdedup_oracle_sql()


@query("semdedup_embedding_prune", oracle=_semdedup_oracle())
def semdedup_embedding_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic pruning (Abbas et al. 2023): k-means-cell
    the embedding space with the deterministic pinned-Lloyd's
    quantizer, then inside each cell drop every vector that has a
    smaller-id neighbour above the cosine threshold.

    The embedding-space counterpart of the lexical dedup chain: where
    minhash/LSH finds near-verbatim copies, SemDeDup prunes
    *semantic* redundancy that shares no n-grams.

    Scale: the design's point is the cell-blocking — cells are sized
    corpus/n_cells by construction (unlike corpus-linear label
    blocks), so the within-cell pair space is Σ cell² with
    controllable cell size (raise n_cells with corpus size). Cell
    assignment is a broadcast map; pairs exist only as (id, id)
    tuples; the retention decision is one anti-join.
    """
    from declarativeml_spark.operators.dedup import semdedup

    return semdedup(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
def _datasheet_oracle() -> str:
    hits = {
        lang: T.lang_hits_duck("toks", lang) for lang in T.LANG_ORDER
    }
    pred = T.predicted_lang_case(hits)
    qual = T.quality_duck("toks", "text", T.lang_hits_duck("toks", "en"))
    return f"""
    WITH d AS (SELECT doc_id, source, text, {_TOKS_D} AS toks FROM documents),
    s AS (SELECT source, doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 {pred} AS predicted,
                 {qual} AS quality,
                 md5(text) AS fp
          FROM d)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           {T.stable_round('quantile_cont(n_tokens, 0.5)', 4)} AS median_tokens,
           CAST(COUNT(*) FILTER (WHERE predicted = 'en') AS BIGINT) AS en_docs,
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS dup_docs,
           {T.stable_round(
               'CAST(SUM(CAST(quality AS DECIMAL(38,6))) AS DOUBLE) / COUNT(quality)', 6
           )} AS avg_quality
    FROM s GROUP BY source
    """


@query("corpus_source_datasheet", oracle=_datasheet_oracle())
def corpus_source_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: the datasheet row a corpus curator
    publishes for every ingested source — document volume, token
    budget, median document length, language mix, exact-duplicate
    count, mean quality score.

    Scale: one scan computing per-row token/lang/quality/fingerprint
    columns (all codegen'd), then a single groupBy(source) — a
    handful of output rows. COUNT(DISTINCT fp) is the only two-phase
    agg, and it shuffles 32-byte fingerprints, not text. The exact
    interpolated median uses Spark percentile == DuckDB
    quantile_cont (same definition, cf. segment_price_percentiles).
    """
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.expr(_TOKS_S)
    )
    hit_cols = {}
    for lang in T.LANG_ORDER:
        col = f"h_{lang}"
        docs = docs.withColumn(col, F.expr(T.lang_hits_spark("toks", lang)))
        hit_cols[lang] = col
    docs = docs.select(
        "source",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.expr(T.predicted_lang_case(hit_cols)).alias("predicted"),
        F.expr(
            T.quality_spark("toks", "text", T.lang_hits_spark("toks", "en"))
        ).alias("quality"),
        F.md5("text").alias("fp"),
    )
    return docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        sround(F.expr("percentile(n_tokens, 0.5)"), 4).alias("median_tokens"),
        F.count(F.when(F.col("predicted") == "en", 1)).cast("bigint").alias("en_docs"),
        (F.count("*") - F.count_distinct("fp")).cast("bigint").alias("dup_docs"),
        sround(
            F.sum(F.col("quality").cast("decimal(38,6)")).cast("double")
            / F.count("quality"),
            6,
        ).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
def _xsource_oracle() -> str:
    from declarativeml_spark.operators.corpus import fp_sample_duck

    return f"""
    WITH d AS (SELECT source, {fp_sample_duck('text')} AS hs FROM documents),
    g AS (SELECT DISTINCT source, unnest(hs) AS h FROM d)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_grams
    FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
    GROUP BY a.source, b.source
    """


@query("corpus_cross_source_overlap", oracle=_xsource_oracle())
def corpus_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how
    many winnowed word-4-gram fingerprints they share — the audit a
    curator runs before weighting sources independently (mirrors and
    scraped copies show up as heavy off-diagonal cells; double-counted
    content breaks mixing-ratio math).

    Scale: ONE pass — explode winnowed fingerprints, groupBy(h) with
    collect_set(source) (set semantics dedup within-source repeats,
    partials combine map-side), then emit each gram's C(s,2) source
    pairs from the sorted set and count per pair. Compared to the
    self-equi-join form this computes the rolling-hash sample once
    instead of once per join side, and shuffles the gram table once
    instead of three times; a gram's fan-out is bounded by
    n_sources² (handfuls), never corpus size. The source-set arrays
    per gram are n_sources-bounded too, so the agg state stays tiny.
    """
    from declarativeml_spark.operators.corpus import fingerprint_frame

    docs = load_table(spark, sf_dir, "documents", spread=True)
    by_gram = (
        fingerprint_frame(docs, id_col="source", text_col="text")
        .select(F.col("doc_id").alias("source"), F.explode("hs").alias("h"))
        .groupBy("h")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    pairs = by_gram.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (a, i) ->"
                " transform(slice(ss, i + 2, size(ss) - i - 1),"
                " b -> struct(a AS source_a, b AS source_b))))"
            )
        ).alias("p")
    ).select("p.source_a", "p.source_b")
    return pairs.groupBy("source_a", "source_b").agg(
        F.count("*").cast("bigint").alias("shared_grams")
    )
