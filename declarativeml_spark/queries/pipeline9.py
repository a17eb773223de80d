"""Training-data pipeline operators, part 9 (round 5).

* ``tokenizer_bpe_merges`` — BPE-merge tokenizer TRAINING over the
  document corpus (operators/bpe.py): iterative most-frequent-pair
  selection with exact greedy left-to-right application, the missing
  learn-side counterpart of ``tokenizer_fertility``. Also reachable
  as the DSL statement ``TRAIN TOKENIZER <name> FROM <source>
  VOCAB n``.

Float conventions follow registry.py; this module's outputs are
exact integers and strings, so hash parity needs no rounding at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from declarativeml_spark.operators.bpe import (
    bpe_compression_curve,
    bpe_curve_oracle_sql,
    bpe_encode_doc_stats,
    bpe_encode_oracle_sql,
    bpe_merges,
    bpe_merges_oracle_sql,
)
from declarativeml_spark.queries.registry import query
from declarativeml_spark.sources.catalog import load_table

_BPE_ROUNDS = 6


@query("tokenizer_bpe_merges", oracle=bpe_merges_oracle_sql(_BPE_ROUNDS))
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first <_BPE_ROUNDS> BPE merge rules from the document
    corpus: collapse to word types once, then per round count adjacent
    symbol pairs (weighted by word frequency), take the global top
    pair (ties by pair text), and apply it greedily left-to-right.

    Scale: the corpus shuffles ONCE (the word-type count); every
    round after that runs on the vocabulary — a dimension-sized frame
    at any corpus size — with a map-side-combinable pair agg, a
    TakeOrdered top-1, and a codegen'd per-row fold. Rounds
    persist-and-release generation by generation, so storage holds
    one vocabulary frame regardless of round count. Even the learned
    rules are hash-checked against DuckDB running the identical
    greedy fold.
    """
    docs = load_table(spark, sf_dir, "documents")
    return bpe_merges(docs, "text", _BPE_ROUNDS)


@query("tokenizer_bpe_curve", oracle=bpe_curve_oracle_sql(_BPE_ROUNDS))
def tokenizer_bpe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression curve of BPE training: after each learned merge
    (generation 0 = raw characters), the corpus's total token count
    (word types weighted by frequency) and the symbol-vocabulary size
    — the tokens-saved-per-vocab-slot trade a tokenizer budget
    decision reads, produced in-engine next to the learned rules.

    Scale: identical loop shape to tokenizer_bpe_merges (one
    corpus-sized word-type shuffle, then vocabulary-sized rounds);
    the curve adds two bounded aggs per generation (a 1-row total and
    a distinct-symbol count). Exact integers end to end, hash-checked
    against DuckDB replaying the same greedy folds.
    """
    docs = load_table(spark, sf_dir, "documents")
    return bpe_compression_curve(docs, "text", _BPE_ROUNDS)


@query("tokenizer_bpe_encode", oracle=bpe_encode_oracle_sql(_BPE_ROUNDS))
def tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY side of BPE training (round-5 verdict ask): learn
    <_BPE_ROUNDS> merges, then re-score every document with the
    learned tokenizer — word count, encoded token count, fertility
    (tokens per word; the whitespace baseline is 1 token per word
    only when every word fully merges). The DSL twin is
    ``TOKENIZE <source> USING <tokenizer>``.

    Scale: learning is the one word-type shuffle (see
    tokenizer_bpe_merges); encoding composes ALL learned rules into a
    single codegen'd fold chain applied per word occurrence in the
    map task that exploded it — no join, no broadcast, no extra
    corpus pass; the only encode-side movement is the final
    ``groupBy(doc_id)`` partial agg. Hash-checked against DuckDB
    replaying the same learn chain and joining the encoded word types
    back to occurrences (value-identical: every occurrence of a word
    encodes identically).
    """
    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_doc_stats(docs, "doc_id", "text", _BPE_ROUNDS)


# ---------------------------------------------------------------------------
# Cluster-aware (leakage-free) split assignment — the FIX for what
# split_leakage_audit measures: hash the duplicate-group fingerprint,
# not the document, so a whole near-dup cluster lands in one split.

_CS_SPLITS = 5


def _cluster_split_oracle() -> str:
    from declarativeml_spark.operators import textops as T
    from declarativeml_spark.operators.textops import _hex4_int

    fp_d = T.FINGERPRINT_DUCK.format(text="text")
    toks_d = f"len({T.TOKENS_DUCK.format(text='text')})"
    return f"""
    WITH d0 AS MATERIALIZED (
        SELECT {fp_d} AS fp, CAST({toks_d} AS BIGINT) AS n_toks
        FROM documents
    ),
    d AS MATERIALIZED (
        SELECT fp, n_toks,
               CAST(({_hex4_int('fp')}) % {_CS_SPLITS} AS BIGINT) AS split
        FROM d0
    ),
    per AS (
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_clusters,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        FROM d GROUP BY split
    ),
    leak AS (
        SELECT CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS leaky_clusters
        FROM (SELECT fp, COUNT(DISTINCT split) AS k FROM d GROUP BY fp)
    )
    SELECT split, n_docs, n_clusters, n_tokens, leaky_clusters
    FROM per CROSS JOIN leak
    """


@query("corpus_cluster_split", oracle=_cluster_split_oracle())
def corpus_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free split assignment: every document's exact-dup
    FINGERPRINT (not the document) hashes to one of <_CS_SPLITS>
    splits, so a duplicate group can never span train and eval — the
    constructive fix for the hazard ``split_leakage_audit`` measures.
    Reports per-split document/cluster/token mass plus the
    cross-split-cluster count (zero by construction, verified, not
    assumed).

    Scale: the split tag is a per-row codegen map (md5 arithmetic);
    the stats are one 16-byte-fingerprint shuffle; the leakage verdict
    is a 1-row broadcast joined onto the ≤<_CS_SPLITS>-row plane.
    """
    from pyspark.sql import functions as F

    from declarativeml_spark.operators import textops as T
    from declarativeml_spark.operators.textops import _hex4_int

    fp_s = T.FINGERPRINT_SPARK.format(text="text")
    toks_s = f"size({T.TOKENS_SPARK.format(text='text')})"
    docs = load_table(spark, sf_dir, "documents")
    # NOT persisted (r12 revert of the r11 persist): the sf1 A/B
    # measured the persist ~1.7x slower (on 1.28 s / off 0.76 s,
    # consistent across laps) — eagerly materializing the
    # doc-proportional fingerprint plane costs more than letting each
    # consumer evaluate the md5/tokenize inline in its own fused
    # aggregate stage (and the leak branch prunes n_toks, skipping
    # the tokenize entirely); sf0.1 was a wash
    d = (
        docs.select(
            F.expr(fp_s).alias("fp"),
            F.expr(toks_s).cast("long").alias("n_toks"),
        )
        .withColumn(
            "split",
            (F.expr(_hex4_int("fp")) % _CS_SPLITS).cast("long"),
        )
    )
    per = d.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("fp").cast("long").alias("n_clusters"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
    leak = (
        d.groupBy("fp")
        .agg(F.countDistinct("split").alias("k"))
        .agg(
            F.sum((F.col("k") > 1).cast("long"))
            .cast("long")
            .alias("leaky_clusters")
        )
    )
    return per.crossJoin(F.broadcast(leak))


_WAV_ORACLE = """
SELECT doc_id AS media_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(length(text) AS BIGINT) AS n_samples,
       CAST(COALESCE(list_sum(list_transform(
           range(1, length(text) + 1),
           i -> (ascii(substr(text, i, 1)) - 128)
                * (ascii(substr(text, i, 1)) - 128)
       )), 0) * 65536 AS BIGINT) AS energy
FROM documents
"""


@query("multimodal_wav_features", oracle=_WAV_ORACLE)
def multimodal_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first REAL codec through the register_codec boundary
    (round-5 verdict ask): every document's text becomes a genuine
    16-bit PCM RIFF/WAVE container (one sample per character,
    sample = (byte − 128)·256), and the registered pure-Python WAV
    parser (operators/multimodal.py::decode_wav — chunk walking,
    format validation, exact integer energy) decodes it back through
    the Arrow ``mapInPandas`` path. The oracle computes the expected
    decoder output from the text alone, so a parser bug (wrong chunk
    offset, sign error, byte order) hash-fails.

    Scale: synthesis and decode are map-only (payload bytes never
    leave the executor; 4 longs per file cross the Python boundary);
    zero shuffles in the whole plan.

    Fixture contract: the synthetic corpus is printable ASCII (the
    invariant operators/bpe.py documents and the BPE oracles already
    rely on), so the oracle's per-CHARACTER closed form equals the
    codec's per-UTF-8-BYTE arithmetic. Non-ASCII ingest would need a
    byte-level oracle, not a different codec.
    """
    from declarativeml_spark.operators.multimodal import (
        decode_features,
        register_wav_codec,
        synth_wav_from_text,
    )
    from pyspark.sql import functions as F

    register_wav_codec()
    docs = load_table(spark, sf_dir, "documents")
    wav = synth_wav_from_text(docs, "text", "doc_id", sample_rate=8000)
    feats = decode_features(wav, codec="wav")
    return feats.select(
        "media_id",
        F.col("features")[0].alias("sample_rate"),
        F.col("features")[3].alias("n_samples"),
        F.col("features")[4].alias("energy"),
    )


_PPM_ORACLE = """
WITH base AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_raw,
           GREATEST(8, CAST(ceil(length(text) / 8.0) * 8 AS BIGINT))
               AS n_pix,
           CAST(COALESCE(list_sum(list_transform(
               range(1, length(text) + 1),
               i -> ascii(substr(text, i, 1)))), 0) AS BIGINT) AS sum_r,
           CAST(COALESCE(list_sum(list_transform(
               range(1, length(text) + 1),
               i -> (ascii(substr(text, i, 1)) * 7) % 256)), 0)
               AS BIGINT) AS sum_b
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(8 AS BIGINT) AS width,
       CAST(n_pix / 8 AS BIGINT) AS height,
       sum_r,
       CAST(255 * n_pix - sum_r AS BIGINT) AS sum_g,
       sum_b
FROM base
"""


@query("multimodal_ppm_stats", oracle=_PPM_ORACLE)
def multimodal_ppm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image sibling of ``multimodal_wav_features``: every
    document's text bytes become a genuine binary PPM (P6) image —
    channels (b, 255−b, 7b mod 256) per byte, zero-padded to whole
    8-pixel rows, header comment included — and the registered
    pure-Python PPM parser (operators/multimodal.py::decode_ppm —
    comment-aware header scan, 8/16-bit samples, loud truncation
    errors) decodes it back through the Arrow ``mapInPandas`` path.
    The oracle computes the expected per-channel pixel sums from the
    text alone, so a header-offset or interleave bug hash-fails.

    Scale: synthesis and decode are map-only (pixel bytes never leave
    the executor; 6 longs per image cross the Python boundary); zero
    shuffles in the plan. Same ASCII fixture contract as
    multimodal_wav_features (char closed form == byte arithmetic).
    """
    from declarativeml_spark.operators.multimodal import (
        decode_features,
        register_ppm_codec,
        synth_ppm_from_text,
    )
    from pyspark.sql import functions as F

    register_ppm_codec()
    docs = load_table(spark, sf_dir, "documents")
    ppm = synth_ppm_from_text(docs, "text", "doc_id", width=8)
    feats = decode_features(ppm, codec="ppm")
    return feats.select(
        "media_id",
        F.col("features")[0].alias("width"),
        F.col("features")[1].alias("height"),
        F.col("features")[3].alias("sum_r"),
        F.col("features")[4].alias("sum_g"),
        F.col("features")[5].alias("sum_b"),
    )


_Y4M_EVERY_N = 2
# synth geometry (operators/multimodal.py::synth_y4m_from_text):
# 4x2 C420 frames — luma 8 B/frame from the text, chroma constant
# U=16/V=240 (2+2 B/frame => 512 per sampled frame's UV sum)
_Y4M_ORACLE = f"""
WITH base AS (
    SELECT doc_id,
           GREATEST(1, CAST(ceil(length(text) / 8.0) AS BIGINT))
               AS n_frames,
           CAST(COALESCE(list_sum(list_transform(
               range(1, length(text) + 1),
               i -> CASE WHEN ((CAST(i - 1 AS BIGINT) // 8) % {_Y4M_EVERY_N}) = 0
                         THEN ascii(substr(text, i, 1)) ELSE 0 END)), 0)
               AS BIGINT) AS sum_y_sampled
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(4 AS BIGINT) AS width,
       CAST(2 AS BIGINT) AS height,
       n_frames,
       CAST((n_frames + {_Y4M_EVERY_N} - 1) // {_Y4M_EVERY_N} AS BIGINT)
           AS n_sampled,
       sum_y_sampled,
       CAST(((n_frames + {_Y4M_EVERY_N} - 1) // {_Y4M_EVERY_N})
            * (2 * 16 + 2 * 240) AS BIGINT) AS sum_uv_sampled
FROM base
"""


@query("multimodal_y4m_frames", oracle=_Y4M_ORACLE)
def multimodal_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video sibling of ``multimodal_wav_features`` — retires the
    last fake-codec modality: every document's text becomes a genuine
    YUV4MPEG2 container (4×2 C420 frames, luma = consecutive 8-byte
    text slices zero-padded, chroma constants U=16/V=240), and the
    pure-Python Y4M parser (operators/multimodal.py::decode_y4m /
    _iter_y4m_frames — tag-validated header, FRAME-marker walk, loud
    truncation errors) samples every 2nd frame through
    the Arrow ``mapInPandas`` path (y4m_frame_stats: the fused
    sample+aggregate form, raw frames never cross to the JVM). The
    oracle computes expected per-plane sums of exactly the SAMPLED
    frames from the text alone, so a FRAME-boundary or plane-split
    bug hash-fails — a total-sum oracle could not see byte slides
    between frames.

    Scale: synthesis and decode are map-only (container bytes never
    leave the executor; 7 longs per video cross the Python boundary);
    zero shuffles in the plan. Same ASCII fixture contract as the
    WAV/PPM twins (char closed form == byte arithmetic).
    """
    from declarativeml_spark.operators.multimodal import (
        register_y4m_codec,
        synth_y4m_from_text,
        y4m_frame_stats,
    )

    register_y4m_codec()
    # NOT spread: an isolated warm probe showed ~2x from spreading,
    # but two full-bench runs measured 3-4x WORSE (1.1s -> 3.5/3.9s)
    # — under bench-wide cache/worker pressure the extra exchange +
    # 32-task Python fan-out costs more than the single-task walk;
    # the per-row work here (FRAME-marker walk + plane sums) is too
    # light to repay it, unlike the resize+decode chain
    docs = load_table(spark, sf_dir, "documents")
    y4m = synth_y4m_from_text(docs, "text", "doc_id")
    return y4m_frame_stats(y4m, every_n=_Y4M_EVERY_N)


# resample geometry shared by the Spark path and the oracle: resizing
# the 8-wide synth image to 4x2 picks source pixel (ys[i], xs[j]) with
# xs[j] = 2j+1 and ys[i] = ((2i+1)*h0)//4 (nearest neighbor, matching
# operators/multimodal.py::resize_ppm's (i+0.5)*src/dst rule, which
# needs no clamp here since (2i+1)/4 < 1 for i in {0,1})
_PPM_RESIZE_ORACLE = """
WITH base AS (
    SELECT doc_id, text,
           GREATEST(8, CAST(ceil(length(text) / 8.0) * 8 AS BIGINT))
               AS n_pix
    FROM documents
),
px AS (
    SELECT doc_id,
           list_transform(
               range(8),
               k -> CASE WHEN (((2 * (k // 4) + 1) * (n_pix // 8)) // 4) * 8
                              + (2 * (k % 4) + 1) < length(text)
                         THEN ascii(substr(text,
                              CAST((((2 * (k // 4) + 1) * (n_pix // 8)) // 4)
                                   * 8 + (2 * (k % 4) + 1) + 1 AS INT), 1))
                         ELSE 0 END) AS b
    FROM base
)
SELECT doc_id AS media_id,
       CAST(4 AS BIGINT) AS width,
       CAST(2 AS BIGINT) AS height,
       CAST(list_sum(b) AS BIGINT) AS sum_r,
       CAST(255 * 8 - list_sum(b) AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(b, v -> (v * 7) % 256)) AS BIGINT)
           AS sum_b
FROM px
"""


@query("multimodal_ppm_resize_stats", oracle=_PPM_RESIZE_ORACLE)
def multimodal_ppm_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle coverage for the RESIZE path (previously pytest-only):
    every document's synth P6 image (8 px wide, channels
    (b, 255−b, 7b mod 256)) is nearest-neighbor-resampled to 4×2 by
    the real resizer (operators/multimodal.py::resize_ppm — one
    header scan, one numpy fancy-index) and decoded back; the oracle
    computes the 8 surviving source pixels' channel sums from the
    text alone, so an off-by-one in the resample index rule, a
    header re-encode bug, or a channel interleave slip hash-fails.

    Scale: FULLY fused synth+resize+decode — one map-only mapInPandas
    stage, zero shuffles; no container ever crosses the Arrow
    boundary (6 longs per image exit Python).
    """
    from declarativeml_spark.operators.multimodal import (
        register_ppm_codec,
        synth_resize_decode_features,
    )
    from pyspark.sql import functions as F

    register_ppm_codec()
    docs = load_table(spark, sf_dir, "documents")
    # fully fused synth+resize+decode: ONE Python stage, containers
    # never cross the Arrow boundary at all (r11: the chained form
    # shipped every synthesized payload JVM->Python->JVM->Python)
    feats = synth_resize_decode_features(
        docs, "ppm", 4, 2, "text", "doc_id", synth_width=8
    )
    return feats.select(
        "media_id",
        F.col("features")[0].alias("width"),
        F.col("features")[1].alias("height"),
        F.col("features")[3].alias("sum_r"),
        F.col("features")[4].alias("sum_g"),
        F.col("features")[5].alias("sum_b"),
    )


_WW_SIZE = 64  # samples per analysis window
_WAV_WINDOW_ORACLE = f"""
WITH f AS (
    SELECT doc_id, text,
           CAST(ceil(length(text) / {_WW_SIZE}.0) AS BIGINT) AS nw
    FROM documents WHERE length(text) > 0
),
w AS (
    SELECT doc_id, text,
           CAST(unnest(range(nw)) AS BIGINT) AS window_id,
           CAST(length(text) AS BIGINT) AS n
    FROM f
)
SELECT doc_id AS media_id,
       window_id,
       CAST(LEAST({_WW_SIZE}, n - window_id * {_WW_SIZE}) AS BIGINT)
           AS n_samples,
       CAST(65536 * COALESCE(list_sum(list_transform(
           range(1, CAST(LEAST({_WW_SIZE}, n - window_id * {_WW_SIZE})
                         + 1 AS BIGINT)),
           j -> (ascii(substr(text,
                     CAST(window_id * {_WW_SIZE} + j AS INT), 1)) - 128)
                * (ascii(substr(text,
                     CAST(window_id * {_WW_SIZE} + j AS INT), 1)) - 128)
       )), 0) AS BIGINT) AS energy
FROM w
"""


@query("multimodal_wav_window_energy", oracle=_WAV_WINDOW_ORACLE)
def multimodal_wav_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio analysis over DECODED samples (the r7 upgrade of
    ``multimodal_audio_energy``'s byte-level stand-in): each
    document's text becomes a real 16-bit PCM RIFF container, and
    ``window_energy(codec="wav")`` parses it and computes exact
    integer energy per 64-sample window — windowing container
    BYTES would mix header bytes into the first window and split
    16-bit samples, so a container-offset bug hash-fails here in a
    way the whole-file energy query cannot catch.

    Scale: synthesis and windowing are map-only; one slim 4-long row
    per (file, window) crosses the Python boundary; zero shuffles.
    """
    from declarativeml_spark.operators.multimodal import (
        synth_wav_from_text,
        window_energy,
    )

    docs = load_table(spark, sf_dir, "documents")
    wav = synth_wav_from_text(docs, "text", "doc_id")
    return window_energy(wav, codec="wav", window_samples=_WW_SIZE)


# resample geometry: the 4x2 synth resized to 2x2 keeps luma columns
# xs = [1, 3] of each row (operators/multimodal.py::_nn_index), i.e.
# the ODD byte offsets {1,3,5,7} within each 8-byte frame; the 2x1
# chroma planes collapse to one byte each (constants U=16 / V=240)
_Y4M_RESIZE_ORACLE = """
WITH base AS (
    SELECT doc_id,
           GREATEST(1, CAST(ceil(length(text) / 8.0) AS BIGINT))
               AS n_frames,
           CAST(COALESCE(list_sum(list_transform(
               range(1, length(text) + 1),
               i -> CASE WHEN ((CAST(i - 1 AS BIGINT) % 8) % 2) = 1
                         THEN ascii(substr(text, i, 1)) ELSE 0 END)), 0)
               AS BIGINT) AS sum_y
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(2 AS BIGINT) AS width,
       CAST(2 AS BIGINT) AS height,
       n_frames,
       sum_y,
       CAST(16 * n_frames AS BIGINT) AS sum_u,
       CAST(240 * n_frames AS BIGINT) AS sum_v
FROM base
"""


@query("multimodal_y4m_resize_stats", oracle=_Y4M_RESIZE_ORACLE)
def multimodal_y4m_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle coverage for VIDEO resize (the y4m sibling of
    ``multimodal_ppm_resize_stats``): every document's synth Y4M
    container (4×2 C420 frames) is per-frame nearest-neighbor
    resampled to 2×2 by the real resizer
    (operators/multimodal.py::resize_y4m — every plane in its own
    subsampled geometry, container re-encoded) and decoded back; the
    oracle computes the surviving luma samples (the odd byte offsets
    of each frame) and collapsed chroma sums from the text alone, so
    a plane-boundary slip, per-frame offset error, or chroma-geometry
    bug in the resampler hash-fails.

    Scale: FULLY fused synth+resize+decode — one mapInPandas stage
    whose only exchange is the scan re-spread (the single-split
    parquet would otherwise pin the per-row codec CPU to one task);
    no container ever crosses the Arrow boundary (8 longs per video
    exit Python).
    """
    from declarativeml_spark.operators.multimodal import (
        register_y4m_codec,
        synth_resize_decode_features,
    )
    from pyspark.sql import functions as F

    from declarativeml_spark.operators.textops import spread

    register_y4m_codec()
    # spread, CAPPED at 16 tasks: the single-split scan would pin the
    # whole per-row codec chain to ONE task, but full width spawns a
    # simultaneous Python worker per core for ~30 core-seconds of
    # work — r11 cold-session sweep measured width 16 fastest both
    # cold (5.2s vs 7.6s at 32) and warm (1.6s vs 2.1s): worker
    # spawn/coordination beats the extra parallelism past 16. At real
    # scale the scan already splits and spread() is a no-op.
    dp = spark.sparkContext.defaultParallelism
    docs = spread(load_table(spark, sf_dir, "documents"), min(16, dp))
    # fully fused synth+resize+decode: ONE Python stage (r11: the
    # chained form shipped every container across the Arrow boundary
    # twice through two separate Python worker stages)
    feats = synth_resize_decode_features(docs, "y4m", 2, 2, "text", "doc_id")
    return feats.select(
        "media_id",
        F.col("features")[0].alias("width"),
        F.col("features")[1].alias("height"),
        F.col("features")[4].alias("n_frames"),
        F.col("features")[5].alias("sum_y"),
        F.col("features")[6].alias("sum_u"),
        F.col("features")[7].alias("sum_v"),
    )


# ---------------------------------------------------------------------------
# Real-FILE media ingestion (round-8 verdict ask #4): the binaryFile
# on-ramp. Every prior multimodal query synthesized payloads
# in-session; these two prove the missing first step of a real
# pipeline — WAV containers written to DISK, listed and read back via
# sources/io.py::read_media (Spark's binaryFile source), then pushed
# through the same registered codec. The oracle computes the expected
# decoder output from the document text alone, so a bug anywhere in
# the write → list → read → parse chain hash-fails.

_N_MEDIA_FILES = 24


def _media_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a bounded on-disk WAV corpus (one real RIFF file
    per document, lowest <_N_MEDIA_FILES> doc_ids) and return its
    directory — marker-gated via queries/fixtures.py::fixture_dir so
    repeated runs (bench, verify, the determinism double-run) reuse
    the files instead of rewriting them.

    The collect is bounded by construction (a fixture, not a data
    path): real ingest starts from files that already exist on
    distributed storage; this helper only stands in for that storage
    on a single host.
    """
    import os

    from declarativeml_spark.operators.multimodal import synth_wav_from_text
    from declarativeml_spark.queries.fixtures import fixture_dir

    def write(d: str) -> None:
        docs = (
            load_table(spark, sf_dir, "documents")
            .orderBy("doc_id")
            .limit(_N_MEDIA_FILES)
        )
        wav = synth_wav_from_text(docs, "text", "doc_id")
        for r in wav.select("media_id", "payload").collect():
            with open(os.path.join(d, f"m{r.media_id:08d}.wav"), "wb") as f:
                f.write(bytes(r.payload))

    return fixture_dir("media_wav", f"{sf_dir}|wav|{_N_MEDIA_FILES}", write)


_MEDIA_LOAD_ORACLE = f"""
SELECT doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(length(text) AS BIGINT) AS n_samples,
       CAST(COALESCE(list_sum(list_transform(
           range(1, length(text) + 1),
           i -> (ascii(substr(text, i, 1)) - 128)
                * (ascii(substr(text, i, 1)) - 128)
       )), 0) * 65536 AS BIGINT) AS energy
FROM (SELECT doc_id, text FROM documents
      ORDER BY doc_id LIMIT {_N_MEDIA_FILES}) t
"""


@query("media_load_wav_features", oracle=_MEDIA_LOAD_ORACLE)
def media_load_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-ingest round trip: real WAV files on disk → ``read_media``
    (binaryFile listing, pathGlobFilter, standard media frame) →
    registered WAV parser → per-file features, re-keyed to doc_id by
    parsing the filename the fixture wrote. Also the engine path
    behind ``LOAD MEDIA FROM '<dir>' GLOB '*.wav'`` and
    ``DECODE '<dir>/*.wav' USING wav``.

    Scale: the listing packs many small files per task
    (maxPartitionBytes/openCostInBytes); decode is map-only; the
    id-join is a broadcast of the slim (media_id, doc_id) projection.
    Large single files do NOT split — binaryFile reads each file
    whole — so per-file size caps belong at ingest (read_media
    docstring).
    """
    from pyspark.sql import functions as F

    from declarativeml_spark.operators.multimodal import (
        decode_features,
        register_wav_codec,
    )
    from declarativeml_spark.sources.io import read_media

    register_wav_codec()
    d = _media_fixture_dir(spark, sf_dir)
    media = read_media(spark, d, glob="*.wav")
    feats = decode_features(media, codec="wav")
    ids = media.select(
        "media_id",
        F.regexp_extract("media_path", r"m(\d+)\.wav$", 1)
        .cast("long")
        .alias("doc_id"),
    )
    return feats.join(ids, "media_id").select(
        "doc_id",
        F.col("features")[0].alias("sample_rate"),
        F.col("features")[3].alias("n_samples"),
        F.col("features")[4].alias("energy"),
    )


_MEDIA_INVENTORY_ORACLE = f"""
SELECT 'audio/wav' AS format,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(44 + 2 * length(text)) AS BIGINT) AS total_bytes,
       CAST(MIN(44 + 2 * length(text)) AS BIGINT) AS min_bytes,
       CAST(MAX(44 + 2 * length(text)) AS BIGINT) AS max_bytes
FROM (SELECT text FROM documents
      ORDER BY doc_id LIMIT {_N_MEDIA_FILES}) t
"""


@query("media_ingest_inventory", oracle=_MEDIA_INVENTORY_ORACLE)
def media_ingest_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest inventory over the on-disk corpus: per-format file count
    and byte mass from the listing METADATA alone (meta.format from
    the extension, meta.n_bytes from the filesystem length — payloads
    are never decoded). The oracle recomputes every file's exact RIFF
    container size (44-byte header + 2 bytes per sample) from the
    text, so a truncated write, a stray file passing the glob, or a
    wrong length column hash-fails.

    Scale: a pure listing aggregation — the shape of the first query
    any 100 TB media pipeline runs ("what did we actually land?").
    """
    from pyspark.sql import functions as F

    from declarativeml_spark.sources.io import read_media

    d = _media_fixture_dir(spark, sf_dir)
    media = read_media(spark, d, glob="*.wav")
    return media.groupBy(F.col("meta.format").alias("format")).agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("meta.n_bytes").cast("long").alias("total_bytes"),
        F.min("meta.n_bytes").cast("long").alias("min_bytes"),
        F.max("meta.n_bytes").cast("long").alias("max_bytes"),
    )


# ---------------------------------------------------------------------------
# Partitioned media LAKE layout (round-9 verdict ask #8): the same
# WAV corpus written under year=2024/month=<m>/ directories, read
# back via read_media(partitioned=True) so the directory keys become
# prunable columns, and a DECODE over ONE month whose scan must list
# only that month's directory (plan-asserted in
# tests/test_media_ingest.py; the oracle proves no row leaked in
# from other partitions).

_MEDIA_PART_MONTHS = 12
_MEDIA_PART_PICK = 3  # the month the pruned DECODE reads


def _media_part_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """The lowest <_N_MEDIA_FILES> documents as real RIFF files under
    ``year=2024/month=<1 + doc_id % 12>/`` — the Hive layout a
    time-partitioned media lake lands files in."""
    import os

    from declarativeml_spark.operators.multimodal import synth_wav_from_text
    from declarativeml_spark.queries.fixtures import fixture_dir

    def write(d: str) -> None:
        docs = (
            load_table(spark, sf_dir, "documents")
            .orderBy("doc_id")
            .limit(_N_MEDIA_FILES)
        )
        wav = synth_wav_from_text(docs, "text", "doc_id")
        for r in wav.select("media_id", "payload").collect():
            month = 1 + r.media_id % _MEDIA_PART_MONTHS
            sub = os.path.join(d, "year=2024", f"month={month}")
            os.makedirs(sub, exist_ok=True)
            with open(os.path.join(sub, f"m{r.media_id:08d}.wav"), "wb") as f:
                f.write(bytes(r.payload))

    return fixture_dir(
        "media_wav_part",
        f"{sf_dir}|wav|{_N_MEDIA_FILES}|m{_MEDIA_PART_MONTHS}",
        write,
    )


_MEDIA_PART_ORACLE = f"""
SELECT doc_id,
       CAST(1 + doc_id % {_MEDIA_PART_MONTHS} AS BIGINT) AS month,
       CAST(length(text) AS BIGINT) AS n_samples,
       CAST(COALESCE(list_sum(list_transform(
           range(1, length(text) + 1),
           i -> (ascii(substr(text, i, 1)) - 128)
                * (ascii(substr(text, i, 1)) - 128)
       )), 0) * 65536 AS BIGINT) AS energy
FROM (SELECT doc_id, text FROM documents
      ORDER BY doc_id LIMIT {_N_MEDIA_FILES}) t
WHERE 1 + doc_id % {_MEDIA_PART_MONTHS} = {_MEDIA_PART_PICK}
"""


@query("media_partition_pruning_decode", oracle=_MEDIA_PART_ORACLE)
def media_partition_pruning_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DECODE over one partition of a Hive-layout media lake:
    ``read_media(partitioned=True)`` turns ``year=/month=`` into
    columns, the ``month = <_MEDIA_PART_PICK>`` filter prunes the file
    listing to one directory (PartitionFilters in the scan — the
    media sibling of connector_partitioned_sink_pruning), and only
    the surviving files decode. The oracle recomputes the expected
    decoder output for exactly the documents whose doc_id lands in
    that month, so a file read from any OTHER partition — or one
    missing from the right one — hash-fails.

    Scale: at 100 TB the pruned listing is the difference between
    decoding one month and decoding the lake; payloads are never
    touched by the filter (partition keys live in directory names).
    Also the engine path behind ``LOAD MEDIA FROM '<dir>' GLOB
    '*.wav' PARTITIONED``.
    """
    from pyspark.sql import functions as F

    from declarativeml_spark.operators.multimodal import (
        decode_features,
        register_wav_codec,
    )
    from declarativeml_spark.sources.io import read_media

    register_wav_codec()
    d = _media_part_fixture_dir(spark, sf_dir)
    media = read_media(spark, d, glob="*.wav", partitioned=True).filter(
        F.col("month") == _MEDIA_PART_PICK
    )
    feats = decode_features(media, codec="wav")
    ids = media.select(
        "media_id",
        F.regexp_extract("media_path", r"m(\d+)\.wav$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("month").cast("long").alias("month"),
    )
    return feats.join(ids, "media_id").select(
        "doc_id",
        "month",
        F.col("features")[3].alias("n_samples"),
        F.col("features")[4].alias("energy"),
    )
