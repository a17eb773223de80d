"""Training-data pipeline operators, part 4: embedding quantization,
vocabulary coverage, incremental (snapshot-delta) dedup, time-series
gap-fill, and multimodal frame sampling.

Round-3 additions to the corpus-pipeline surface:

* int8 scalar quantization of the embedding column (the storage /
  ANN-speed lever every vector pipeline pulls before indexing);
* tokenizer vocabulary coverage (how many top tokens cover X% of the
  corpus token mass — the curve a tokenizer budget decision reads),
  built on the two-phase distributed cumulative sum in
  ``operators/ordered.py`` instead of a single-partition window;
* incremental dedup of a new document batch against the existing
  corpus (the production shape: the corpus is a static snapshot, the
  delta is small, nothing re-pairs old-vs-old);
* minute-grid gap-fill with forward fill over the events stream (the
  hypertable/continuous-aggregate counterpart of events_hourly_stats);
* video-style frame sampling through the multimodal Arrow path
  (fake codec — frame slicing is real, the pixel decode is the
  documented stub).

Every query is hash-checked against a DuckDB oracle; float handling
follows registry.py (per-row IEEE + stable_round, DECIMAL
aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from declarativeml_spark.operators import textops as T
from declarativeml_spark.operators.caching import track_persist
from declarativeml_spark.queries.registry import query, sql_sround, sround
from declarativeml_spark.sources.catalog import load_table

_TOKS_S = T.TOKENS_SPARK.format(text="text")
_TOKS_D = T.TOKENS_DUCK.format(text="text")
_SHINGLES_S = T.SHINGLES_SPARK.format(toks="toks")
_SHINGLES_D = T.SHINGLES_DUCK.format(toks="toks")


# ---------------------------------------------------------------------------
# int8 scalar quantization: per-dimension global [min, max] → q in
# 0..255 → md5 of the code string + reconstruction MSE per vector.
_QF = "least(255, greatest(0, CAST(floor(({v} - {mn}) / ({mx} - {mn}) * 255.0 + 0.5) AS BIGINT)))"


@query(
    "embedding_quantize_int8",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    mm AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM ex GROUP BY dim),
    q AS (
        SELECT ex.vec_id, ex.dim, ex.v, mm.mn, mm.mx,
               CASE WHEN mm.mx > mm.mn
                    THEN {_QF.format(v='ex.v', mn='mm.mn', mx='mm.mx')}
                    ELSE 0 END AS code
        FROM ex JOIN mm ON ex.dim = mm.dim
    ),
    e AS (
        SELECT vec_id, dim, code,
               {sql_sround('(v - (mn + code / 255.0 * (mx - mn)))'
                           ' * (v - (mn + code / 255.0 * (mx - mn)))', 12)} AS se
        FROM q
    )
    SELECT vec_id,
           md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY dim)) AS q_md5,
           {sql_sround(
               'CAST(SUM(CAST(se AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)', 10
           )} AS mse
    FROM e GROUP BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column: per-dimension
    global [min, max] ranges, each component mapped to an 8-bit code,
    with per-vector reconstruction MSE — 4x storage cut (and the
    precursor to PQ / IVF-PQ indexing) for the similarity-search ops.

    Scale: pass 1 is a dim-keyed partial agg (map-side combined, the
    shuffle carries n_dims × n_partitions tiny rows); the dim→range
    table is dimensionality-sized — broadcast — so pass 2 never
    shuffles the vectors themselves. The per-vector regroup shuffles
    (vec_id, dim, code) triples; at 100 TB you'd fuse pass 2 into a
    zip_with over a broadcast range array to skip that regroup
    entirely — kept exploded here so the quantization error math
    stays hash-checkable per element.
    """
    from declarativeml_spark.operators.dedup import quantize_int8

    return quantize_int8(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
_COVERAGE_THRESHOLDS = (0.5, 0.75, 0.9, 0.99)


@query(
    "token_vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS_D}) AS t FROM documents),
    freq AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT SUM(c) AS total FROM freq),
    cum AS (
        SELECT t, c,
               CAST(SUM(c) OVER (ORDER BY c DESC, t ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum,
               ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk
        FROM freq
    ),
    thr AS (SELECT * FROM (VALUES {', '.join(f'({x})' for x in _COVERAGE_THRESHOLDS)})
            v(threshold))
    SELECT threshold,
           CAST(MIN(rnk) AS BIGINT) AS vocab_tokens,
           {sql_sround('CAST(arg_min(cum, rnk) AS DOUBLE) / MAX(total)', 6)}
             AS covered_mass
    FROM cum CROSS JOIN tot CROSS JOIN thr
    WHERE cum >= threshold * total
    GROUP BY threshold
    """,
)
def token_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the number of most-frequent tokens
    needed to cover 50/75/90/99% of the corpus token mass — the
    readout behind a tokenizer vocab-size budget.

    Scale: the cumulative sum over the frequency-ranked vocabulary is
    the textbook single-partition-window trap (a web-scale vocab is
    millions of rows). This uses operators/ordered.py::global_cumsum —
    range-repartition on (count DESC, token), per-partition totals
    (one row per partition) turned into broadcast prefix offsets, and
    a within-partition window — so no task ever sees more than its
    range slice. The driver-side collect is bounded by the partition
    count, never by vocab or corpus size.
    """
    from declarativeml_spark.operators.ordered import global_cumsum

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.expr(_TOKS_S)).alias("t"))
    freq = tok.groupBy("t").agg(F.count("*").alias("c"))
    cum = global_cumsum(
        freq,
        [F.col("c").desc(), F.col("t").asc()],
        "c",
        out_col="cum",
        rank_col="rnk",
        num_partitions=8,
    )
    tot = freq.agg(F.sum("c").alias("total"))
    thr = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(x,) for x in _COVERAGE_THRESHOLDS], "threshold double"
        )
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(thr)
        .filter(F.col("cum") >= F.col("threshold") * F.col("total"))
        .groupBy("threshold")
        .agg(
            F.min("rnk").cast("bigint").alias("vocab_tokens"),
            sround(
                F.min_by("cum", "rnk").cast("double") / F.max("total"), 6
            ).alias("covered_mass"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new batch = doc_id % 8 == 0 (a deterministic
# stand-in for "today's crawl"), corpus = everything else.
_N_MINHASH = 8
_BANDS = 4
_DELTA_NEW = "(doc_id % 8 = 0)"


def _delta_oracle() -> str:
    mh_select = ", ".join(
        f"{T.minhash_duck('shingles', k)} AS mh{k}" for k in range(_N_MINHASH)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, is_new, {b} AS band_idx,"
        f" concat(mh{2 * b}, mh{2 * b + 1}) AS band_key FROM sigs"
        for b in range(_BANDS)
    )
    fp = T.FINGERPRINT_DUCK.format(text="text")
    jac = sql_sround(
        "CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)"
        " / (len(sa.shingles) + len(sb.shingles)"
        " - len(list_intersect(sa.shingles, sb.shingles)))"
    )
    return f"""
    WITH d AS (SELECT doc_id, text, {_DELTA_NEW} AS is_new, {_TOKS_D} AS toks
               FROM documents),
    f AS (SELECT doc_id, is_new, {fp} AS fp FROM d),
    ex AS (
        SELECT n.doc_id, MIN(o.doc_id) AS match_id
        FROM f n JOIN f o ON n.fp = o.fp AND NOT o.is_new
        WHERE n.is_new GROUP BY n.doc_id
    ),
    sh AS (SELECT doc_id, is_new, {_SHINGLES_D} AS shingles FROM d),
    sigs AS (SELECT doc_id, is_new, shingles, {mh_select} FROM sh),
    bands AS ({band_selects}),
    cand AS (
        SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        FROM bands n JOIN bands o
          ON n.band_idx = o.band_idx AND n.band_key = o.band_key
         AND NOT o.is_new
        WHERE n.is_new
    ),
    nr AS (
        SELECT c.new_id AS doc_id, MIN(c.old_id) AS match_id
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.new_id
        JOIN sh sb ON sb.doc_id = c.old_id
        WHERE {jac} >= 0.5
        GROUP BY c.new_id
    )
    SELECT d.doc_id,
           CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'novel' END AS status,
           CAST(COALESCE(ex.match_id, nr.match_id, -1) AS BIGINT) AS match_id
    FROM d
    LEFT JOIN ex ON ex.doc_id = d.doc_id
    LEFT JOIN nr ON nr.doc_id = d.doc_id
    WHERE d.is_new
    """


@query("dedup_incremental_delta", oracle=_delta_oracle())
def dedup_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: classify each document of a new batch
    against the existing corpus — ``exact_dup`` (fingerprint already
    present), ``near_dup`` (minhash-band candidate verified at
    Jaccard ≥ 0.5), or ``novel`` — with the smallest matching corpus
    id. The production dedup shape: the corpus snapshot is write-once,
    only new-vs-old pairs are generated, old-vs-old never re-pairs.

    Scale: the exact leg shuffles 16-byte fingerprints; the near leg
    joins new-side bands (delta-sized) against corpus bands — at
    100 TB the corpus band table is a bucketed signature table built
    once and re-read per batch, so the recurring cost is proportional
    to the delta, not the corpus. Shingle verify touches only the
    candidate set.
    """
    from declarativeml_spark.operators.skew import spread_partitions

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "is_new", F.expr(_DELTA_NEW)
    )
    # persisted: the fingerprint plane feeds both sides of the
    # exact-dup self-join — unpersisted the scan + per-row md5 ran
    # twice; the cached plane is (id, flag, 16-byte fp)
    fp = track_persist(
        docs.select(
            "doc_id",
            "is_new",
            F.expr(T.FINGERPRINT_SPARK.format(text="text")).alias("fp"),
        )
    )
    ex = (
        fp.filter("is_new")
        .alias("n")
        .join(fp.filter("NOT is_new").alias("o"), F.col("n.fp") == F.col("o.fp"))
        .groupBy(F.col("n.doc_id").alias("doc_id"))
        .agg(F.min("o.doc_id").alias("ex_match"))
    )

    # signatures once for all docs (cache boundary between tokenize
    # and shingle — see pipeline.py::dedup_minhash_lsh)
    sh = (
        spread_partitions(docs.select("doc_id", "is_new", "text"))
        .select("doc_id", "is_new", F.expr(_TOKS_S).alias("toks"))
        .transform(track_persist)
        .select("doc_id", "is_new", F.expr(_SHINGLES_S).alias("shingles"))
        .select(
            "doc_id",
            "is_new",
            "shingles",
            *[
                F.expr(T.minhash_md5_group_spark("shingles", g)).alias(f"mhg{g}")
                for g in range((_N_MINHASH + 3) // 4)
            ],
        )
        .transform(track_persist)
    )
    sigs = sh.select(
        "doc_id",
        "is_new",
        *[
            F.expr(T.minhash_slice_spark(f"mhg{k // 4}", k % 4)).alias(f"mh{k}")
            for k in range(_N_MINHASH)
        ],
    )
    bands = sigs.select(
        "doc_id",
        "is_new",
        F.posexplode(
            F.array(
                *[
                    F.concat(F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))
                    for b in range(_BANDS)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    cand = (
        bands.filter("is_new")
        .alias("n")
        .join(
            bands.filter("NOT is_new").alias("o"),
            (F.col("n.band_idx") == F.col("o.band_idx"))
            & (F.col("n.band_key") == F.col("o.band_key")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_id")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("new_id"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("old_id"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = sround(inter.cast("double") / (F.size("sa") + F.size("sb") - inter))
    nr = (
        cand.join(sa, "new_id")
        .join(sb, "old_id")
        .filter(jac >= 0.5)
        .groupBy(F.col("new_id").alias("doc_id"))
        .agg(F.min("old_id").alias("nr_match"))
    )
    return (
        docs.filter("is_new")
        .select("doc_id")
        .join(ex, "doc_id", "left")
        .join(nr, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("ex_match").isNotNull(), F.lit("exact_dup"))
            .when(F.col("nr_match").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("status"),
            F.coalesce("ex_match", "nr_match", F.lit(-1))
            .cast("bigint")
            .alias("match_id"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "events_minute_gapfill",
    oracle=f"""
    WITH p AS (SELECT date_trunc('minute', ts) AS minute, value
               FROM events WHERE event_type = 'purchase'),
    m AS (SELECT minute, COUNT(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
                   AS avg_value
          FROM p GROUP BY minute),
    b AS (SELECT MIN(minute) AS lo, MAX(minute) AS hi FROM p),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS minute
              FROM b),
    g AS (SELECT s.minute, COALESCE(m.n, 0) AS n_events, m.avg_value
          FROM spine s LEFT JOIN m ON s.minute = m.minute)
    SELECT minute,
           CAST(n_events AS BIGINT) AS n_events,
           {sql_sround('last_value(avg_value IGNORE NULLS) OVER'
                       ' (ORDER BY minute ROWS UNBOUNDED PRECEDING)', 6)}
             AS filled_value,
           avg_value IS NULL AS is_gap
    FROM g
    """,
)
def events_minute_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute-grid gap-fill over the purchase stream: a dense minute
    spine between the first and last purchase, per-minute average
    value, and forward-filled values across gap minutes — the
    hypertable / continuous-aggregate query shape (`time_bucket` +
    `locf`).

    Scale: the spine is generated from one global min/max row
    (sequence + explode — no shuffle), and its size is bounded by the
    time range, not the event volume. The forward fill deliberately
    avoids one global ordered window: fill within (day) partitions,
    then carry the last known value across days via a day-level
    window whose partition count is the calendar size (bounded
    constant), composed with coalesce. Per-minute aggregation is the
    only data-sized shuffle.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_min = ev.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / F.count("*")
        ).alias("avg_value"),
    )
    bounds = ev.agg(
        F.min(F.date_trunc("minute", "ts")).alias("lo"),
        F.max(F.date_trunc("minute", "ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 minute"))).alias("minute")
    )
    # NOT persisted (r12 revert of the r11 persist): the dense minute
    # grid's consumers are identical subtrees whose exchanges
    # ReuseExchange dedupes at execution — the sf1 A/B measured the
    # persist ~1.9x slower (on 0.81 s / off 0.44 s median), sf0.1 a
    # wash
    g = spine.join(per_min, "minute", "left").withColumn(
        "day", F.to_date("minute")
    )

    w_day = (
        Window.partitionBy("day")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_day = F.last("avg_value", ignorenulls=True).over(w_day)

    # last known value per day (non-null minutes only), then carry the
    # most recent earlier day's value with a day-granularity window —
    # ~30 rows here, calendar-bounded always.
    day_last = (
        g.filter(F.col("avg_value").isNotNull())
        .groupBy("day")
        .agg(F.max_by("avg_value", "minute").alias("day_last"))
    )
    days = g.select("day").distinct().join(day_last, "day", "left")
    # constant partition key: this window is single-partition BY
    # DESIGN (calendar-bounded input, ~30 rows) — the explicit lit(0)
    # documents that and keeps WindowExec's all-data-to-one-partition
    # warning out of logs where it would flag a real problem.
    w_days = (
        Window.partitionBy(F.lit(0))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = days.select(
        "day", F.last("day_last", ignorenulls=True).over(w_days).alias("carry")
    )

    return (
        g.join(F.broadcast(carry), "day")
        .select(
            "minute",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            sround(F.coalesce(fill_day, F.col("carry")), 6).alias("filled_value"),
            F.col("avg_value").isNull().alias("is_gap"),
        )
    )


# ---------------------------------------------------------------------------
_FRAME_EVERY_N = 4


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (SELECT doc_id AS media_id, text,
                      CAST(length(text) // 16 AS BIGINT) AS nf
               FROM documents),
    s AS (SELECT media_id, text,
                 unnest(generate_series(0, nf - 1, {_FRAME_EVERY_N})) AS frame_no
          FROM f WHERE nf > 0)
    SELECT media_id,
           CAST(frame_no AS BIGINT) AS frame_no,
           md5(substr(text, CAST(frame_no * 16 + 1 AS INT), 16)) AS frame_md5
    FROM s
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the multimodal binary path: every 4th
    16-byte frame of each payload, as (media_id, frame_no, frame md5)
    rows — the video keyframe-extraction plumbing with the fake codec
    standing in for libav (the payload is the document's UTF-8 bytes,
    so the oracle can slice the same frames in SQL; the text is
    ASCII, making byte and character offsets coincide).

    Scale: mapInPandas emits frames where the blob lives — no
    shuffle, output fan-out bounded by payload_bytes/(16·4). A real
    pipeline chains a per-frame feature step onto the same map stage.
    """
    from declarativeml_spark.operators.multimodal import attach_fake_media, sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    frames = sample_frames(media, every_n=_FRAME_EVERY_N, codec="fake")
    return frames.select(
        "media_id", "frame_no", F.md5("frame").alias("frame_md5")
    )


# ---------------------------------------------------------------------------
_KNN_K = 5


def _knn_cte_prefix() -> str:
    """Shared oracle CTE chain: LSH candidate pairs → directed →
    per-node kNN (used by knn_graph_degrees and
    knn_graph_triangles)."""
    from declarativeml_spark.operators.dedup import lsh_pairs_oracle_sql
    from declarativeml_spark.queries.pipeline import _LSH_PARAMS

    inner = lsh_pairs_oracle_sql(**_LSH_PARAMS)
    return f"""
    WITH pairs AS ({inner}),
    directed AS (
        SELECT id_a AS src, id_b AS dst, euclidean_dist AS d FROM pairs
        UNION ALL
        SELECT id_b, id_a, euclidean_dist FROM pairs
    ),
    knn AS (
        SELECT src, dst, d
        FROM (SELECT src, dst, d,
                     ROW_NUMBER() OVER (PARTITION BY src ORDER BY d, dst)
                       AS rnk
              FROM directed)
        WHERE rnk <= {_KNN_K}
    )"""


def _knn_oracle() -> str:
    return f"""{_knn_cte_prefix()},
    edges AS (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
    outk AS (SELECT src, COUNT(*) AS outk FROM knn GROUP BY src),
    mut AS (SELECT a.src, COUNT(*) AS mutual
            FROM knn a JOIN knn b ON a.src = b.dst AND a.dst = b.src
            GROUP BY a.src)
    SELECT e.src AS vec_id,
           CAST(COUNT(*) AS BIGINT) AS degree,
           CAST(MAX(k.outk) AS BIGINT) AS knn_out,
           CAST(COALESCE(MAX(m.mutual), 0) AS BIGINT) AS mutual_edges
    FROM edges e
    JOIN outk k ON k.src = e.src
    LEFT JOIN mut m ON m.src = e.src
    GROUP BY e.src
    """


def _knn_frame(spark: SparkSession, sf_dir: str):
    """Shared (src, dst, d) kNN plan for the graph queries — ONE
    definition of the LSH-candidate symmetrization and per-node top-k
    (the DuckDB side shares ``_knn_cte_prefix`` the same way; two
    Spark copies had to be edited in lock-step or the queries drifted
    from the common oracle prefix).

    Symmetrizes by exploding both orientations of each pair — one
    evaluation of the LSH candidate join (a unionAll of two
    projections would execute the expensive pair-emitter plan twice);
    the top-k window partitions per node over its LSH-bounded
    candidate list."""
    from declarativeml_spark.operators.dedup import lsh_topk_pairs
    from declarativeml_spark.queries.pipeline import (
        _LSH_PARAMS,
        _no_codegen_session,
    )

    s2 = _no_codegen_session(spark)
    pairs = lsh_topk_pairs(load_table(s2, sf_dir, "embeddings"), **_LSH_PARAMS)
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"), F.col("id_b").alias("dst"),
                    F.col("euclidean_dist").alias("d"),
                ),
                F.struct(
                    F.col("id_b").alias("src"), F.col("id_a").alias("dst"),
                    F.col("euclidean_dist").alias("d"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.d")
    w = Window.partitionBy("src").orderBy(F.col("d").asc(), F.col("dst").asc())
    return (
        directed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KNN_K)
        .select("src", "dst", "d")
    )


@query("knn_graph_degrees", oracle=_knn_oracle())
def knn_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized k-nearest-neighbour graph over the embedding
    corpus: per node, its ≤5 nearest LSH-candidate neighbours, the
    union-symmetrized degree, and how many of its kNN edges are
    mutual — the graph-construction step under SemDeDup-style
    cluster pruning, curriculum ordering, and label propagation.

    Scale: candidates come from the hash-checked LSH bucket join
    (never all pairs); the per-node top-k window partitions by node,
    so its input is that node's candidate list (LSH fan-in bounded),
    not the corpus. Everything after the candidate stage moves only
    (id, id, dist) tuples. The knn frame feeds four plan branches —
    persisted once.
    """
    knn = _knn_frame(spark, sf_dir).transform(track_persist)
    edges = (
        knn.select("src", "dst")
        .union(knn.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    outk = knn.groupBy("src").agg(F.count("*").alias("outk"))
    mut = (
        knn.alias("a")
        .join(
            knn.alias("b"),
            (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")),
        )
        .groupBy(F.col("a.src").alias("src"))
        .agg(F.count("*").alias("mutual"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
    return (
        deg.join(outk, "src")
        .join(mut, "src", "left")
        .select(
            F.col("src").alias("vec_id"),
            F.col("degree").cast("bigint").alias("degree"),
            F.col("outk").cast("bigint").alias("knn_out"),
            F.coalesce("mutual", F.lit(0)).cast("bigint").alias("mutual_edges"),
        )
    )


# ---------------------------------------------------------------------------
# C4/Gopher-style heuristic document filters (Raffel et al. 2020 §2.2,
# Rae et al. 2021 A1.1), adapted to the whitespace tokenizer: word
# count bounds, mean word length band, max-word-length cap, stopword
# evidence, and bad-marker rejection. Each flag is reported so the
# keep decision is auditable per rule.
_C4_MIN_WORDS = 16
_C4_MAX_WORD_LEN = 15


@query(
    "text_heuristic_filters",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, {_TOKS_D} AS toks FROM documents),
    x AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(length(text) - len(toks) + 1 AS DOUBLE)
                 / len(toks) AS mean_wlen,
               CAST(list_max(list_transform(toks, t -> length(t))) AS BIGINT)
                 AS max_wlen,
               CAST({T.lang_hits_duck('toks', 'en')} AS BIGINT) AS en_stop,
               (contains(lower(text), 'lorem ipsum')
                OR contains(text, '{{')) AS bad_marker
        FROM d
    )
    SELECT doc_id, n_words,
           {T.stable_round('mean_wlen', 6)} AS mean_word_len,
           max_wlen,
           en_stop AS stopword_hits,
           bad_marker,
           (n_words >= {_C4_MIN_WORDS}
            AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
            AND max_wlen <= {_C4_MAX_WORD_LEN}
            AND en_stop >= 2
            AND NOT bad_marker) AS keep
    FROM x
    """,
)
def text_heuristic_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style heuristic document gate: word-count floor,
    mean-word-length band [3, 10], max-word-length cap, ≥2 English
    stopword hits, and bad-marker rejection ('lorem ipsum', braces) —
    each rule's evidence emitted alongside the fused keep decision so
    curation can audit which rule dropped a document.

    Complements the scored filters (text_quality_scores,
    text_quality_repetition, text_unigram_surprisal): this is the
    cheap hard gate a pipeline runs FIRST, before anything that
    tokenizes twice or joins.

    Scale: entirely per-row inside WholeStageCodegen — one map over
    the corpus scan, no shuffle, no state. mean word length derives
    from (chars - spaces) / words to avoid a second pass over the
    token array.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.expr(_TOKS_S).alias("toks")
    )
    n_words = F.size("toks").cast("bigint")
    mean_wlen = (F.length("text") - F.size("toks") + 1).cast("double") / F.size(
        "toks"
    )
    max_wlen = F.expr("array_max(transform(toks, t -> length(t)))").cast("bigint")
    en_stop = F.expr(T.lang_hits_spark("toks", "en")).cast("bigint")
    bad = F.lower(F.col("text")).contains("lorem ipsum") | F.col("text").contains(
        "{"
    )
    x = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_wlen"),
        max_wlen.alias("max_wlen"),
        en_stop.alias("en_stop"),
        bad.alias("bad_marker"),
    )
    return x.select(
        "doc_id",
        "n_words",
        sround("mean_wlen", 6).alias("mean_word_len"),
        F.col("max_wlen"),
        F.col("en_stop").alias("stopword_hits"),
        "bad_marker",
        (
            (F.col("n_words") >= _C4_MIN_WORDS)
            & (F.col("mean_wlen") >= 3.0)
            & (F.col("mean_wlen") <= 10.0)
            & (F.col("max_wlen") <= _C4_MAX_WORD_LEN)
            & (F.col("en_stop") >= 2)
            & ~F.col("bad_marker")
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
def _knn_tri_oracle() -> str:
    return f"""{_knn_cte_prefix()},
    und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM knn),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM und e1
        JOIN und e2 ON e2.u = e1.v
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    nodes AS (
        SELECT a AS n FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT n AS vec_id, CAST(COUNT(*) AS BIGINT) AS triangles
    FROM nodes GROUP BY n
    """


@query("knn_graph_triangles", oracle=_knn_tri_oracle())
def knn_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the symmetrized kNN graph — the
    local-density signal under clustering coefficients, community
    seeds, and near-dup neighborhood audits (a node in many triangles
    sits inside a tight duplicate cluster, not a chain of borderline
    matches).

    Scale: the edge list is k-bounded (≤ k·N canonical edges from the
    LSH-candidate kNN, never all pairs), so the standard
    enumerate-by-join plan is safe: each triangle a<b<c is found
    exactly once by joining edges (a,b)⋈(b,c) and closing with
    (a,c); join fan-out per node is its degree ≤ 2k. Only (id, id)
    tuples move. On power-law graphs the refinement is orienting
    edges from low to high DEGREE instead of id — noted, not needed
    for a degree-capped kNN graph.
    """
    knn = _knn_frame(spark, sf_dir).select("src", "dst")
    und = (
        knn.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .transform(track_persist)
    )
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    # one evaluation of the two triangle-closing joins: explode the
    # three corners per triangle (three unionAll'd projections would
    # run the join pipeline three times)
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("n"))
    return nodes.groupBy(F.col("n").alias("vec_id")).agg(
        F.count("*").cast("bigint").alias("triangles")
    )
