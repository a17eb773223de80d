"""Training-data pipeline operators, part 5: temperature-scaled
source mixing, Bloom-filter decontamination, count-min-sketch heavy
hitters, event-rate anomaly detection, and numeric data profiling.

Round-3 additions, each chosen for its 100 TB plan shape:

* temperature mixing (the mT5/multilingual sampling rule p_i^(1/T)):
  the entire computation happens on the per-source aggregate — a
  handful of rows — so the only corpus-scale work is one counting
  scan;
* Bloom-gate decontamination: the benchmark membership structure is a
  FIXED-SIZE bit set (M positions), so the broadcast side is bounded
  by M no matter how large the held-out suite grows — the O(1)-memory
  counterpart of decontam_benchmark_overlap's exact fingerprint
  broadcast;
* count-min-sketch heavy hitters: frequency estimation whose state is
  d*w cells instead of |vocab| rows — the sketch every streaming
  frequency monitor keeps; built here from map-side-combinable
  partial counts and compared against exact counts row by row;
* event-rate anomalies: trailing-window z-scores computed over the
  *aggregated* hourly series (types x hours rows), never over raw
  events — the window cost is independent of event volume;
* numeric profiling: the two-pass (stats, then histogram) column
  profiler; each pass shuffles only (column, bucket) partial counts.

Every query is hash-checked against a DuckDB oracle; float handling
follows registry.py (IEEE per-row ops, DECIMAL aggregation,
stable_round). Integer sums in oracle SQL are CAST to BIGINT per the
HUGEINT convention.
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


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing: w_i ∝ n_i^(1/T) with T = 2, i.e.
# sqrt — chosen over an arbitrary exponent because IEEE-754 sqrt is
# correctly rounded (bit-identical across engines), where pow() is
# not guaranteed to be.
@query(
    "corpus_temperature_mix",
    oracle=f"""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    t AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
               CAST(SUM(CAST(sqrt(CAST(n_docs AS DOUBLE))
                             AS DECIMAL(38,12))) AS DOUBLE) AS total_sqrt
        FROM s
    )
    SELECT s.source, s.n_docs,
           {sql_sround('CAST(s.n_docs AS DOUBLE) / t.total_docs', 6)}
               AS nat_share,
           {sql_sround('sqrt(CAST(s.n_docs AS DOUBLE)) / t.total_sqrt', 6)}
               AS temp_weight,
           {sql_sround(
               '(sqrt(CAST(s.n_docs AS DOUBLE)) / t.total_sqrt)'
               ' / (CAST(s.n_docs AS DOUBLE) / t.total_docs)', 6)}
               AS boost
    FROM s CROSS JOIN t
    """,
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixing weights per source (the multilingual
    /multi-domain sampling rule of mT5: sample source i with
    probability proportional to p_i^(1/T)). T = 2 (sqrt) upweights
    tail sources relative to natural frequency; ``boost`` is the
    oversampling factor each source receives.

    Scale: one counting scan of the corpus; every subsequent op runs
    on the n_sources-row aggregate (a broadcast cross join against a
    single totals row). sqrt instead of a free exponent because IEEE
    sqrt is correctly rounded — pow() may differ across engines in
    the last ulp. The sqrt-sum aggregates through DECIMAL(38,12) so
    shuffle order cannot change it.
    """
    from declarativeml_spark.operators.corpus import temperature_mix

    return temperature_mix(
        load_table(spark, sf_dir, "documents"), by_col="source"
    )


# ---------------------------------------------------------------------------
# Event-rate anomaly detection: z-score of each hourly event count
# against its trailing 24-hour window, per event type.
@query(
    "events_rate_anomalies",
    oracle=f"""
    WITH h AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, hour, n,
               CAST(SUM(n) OVER tw AS BIGINT) AS s,
               CAST(SUM(n * n) OVER tw AS BIGINT) AS sq,
               CAST(COUNT(n) OVER tw AS BIGINT) AS m
        FROM h
        WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    z AS (
        SELECT event_type, hour, n, m,
               CASE WHEN (CAST(sq AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / m)
                         / (m - 1) > 0
                    THEN (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / m)
                         / sqrt((CAST(sq AS DOUBLE)
                                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / m)
                                / (m - 1))
               END AS zv
        FROM w WHERE m >= 2
    )
    SELECT event_type, hour, n,
           {sql_sround('zv', 4)} AS z,
           coalesce(m >= 12 AND abs(zv) > 2.0, FALSE) AS is_anomaly
    FROM z
    """,
)
def events_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window rate anomalies: per (event_type, hour), the
    z-score of the hourly event count against the mean/stddev of the
    preceding 24 hourly buckets; flagged when the window has >= 12
    observations and |z| > 2.

    Scale: the window function runs over the AGGREGATED hourly series
    (event_types x hours rows), never over raw events — raw volume
    only affects the one groupBy that builds the series, and that agg
    is map-side combinable. Variance comes from exact integer
    sum/sum-of-squares (bigint, overflow-safe for realistic hourly
    counts), so both engines divide the same exact integers — no
    float-accumulation drift, no stddev_samp implementation
    dependence.
    """
    from declarativeml_spark.operators.anomaly import rate_anomalies

    return rate_anomalies(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Bloom-filter decontamination gate. M bits, k = 3 hash positions per
# fingerprint taken from non-overlapping 4-hex-char slices of the
# fingerprint itself (it is already an md5 — no extra hashing).
_BLOOM_M = 16384
_BLOOM_OFFS = (1, 9, 17)


def _hexslice_int(expr: str, off: int) -> str:
    """Integer value of the 4 hex chars of ``expr`` at 1-based
    ``off`` — instr-decomposition identical in Spark SQL and DuckDB
    (same trick as textops._hex4_int, without the md5)."""
    parts = [
        f"(instr('0123456789abcdef', substr({expr}, {off + i}, 1)) - 1) * {m}"
        for i, m in enumerate((4096, 256, 16, 1))
    ]
    return "(" + " + ".join(parts) + ")"


def _bloom_pos(expr: str) -> list[str]:
    return [f"({_hexslice_int(expr, o)} % {_BLOOM_M})" for o in _BLOOM_OFFS]


@query(
    "decontam_bloom_gate",
    oracle=(
        lambda fp_duck: f"""
    WITH bfp AS (
        SELECT DISTINCT unnest({fp_duck}) AS fp
        FROM documents WHERE doc_id % 23 = 5
    ),
    bits AS (
        SELECT DISTINCT unnest([{', '.join(_bloom_pos('fp'))}]) AS pos
        FROM bfp
    ),
    cfp AS (
        SELECT DISTINCT doc_id, unnest({fp_duck}) AS fp
        FROM documents WHERE doc_id % 23 <> 5
    ),
    probe AS (
        SELECT doc_id, fp, unnest([{', '.join(_bloom_pos('fp'))}]) AS pos
        FROM cfp
    ),
    fphit AS (
        SELECT p.doc_id, p.fp,
               CAST(MIN(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS all_hit
        FROM probe p LEFT JOIN bits b ON p.pos = b.pos
        GROUP BY p.doc_id, p.fp
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fps,
           CAST(SUM(all_hit) AS BIGINT) AS n_hits
    FROM fphit GROUP BY doc_id HAVING SUM(all_hit) >= 3
    """
    )(
        __import__(
            "declarativeml_spark.operators.corpus", fromlist=["fp_sample_duck"]
        ).fp_sample_duck("text")
    ),
)
def decontam_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination: flag corpus documents
    whose winnowed 4-gram fingerprints score >= 3 Bloom-membership
    hits against the held-out set (pseudo-benchmark doc_id % 23 = 5,
    as in decontam_benchmark_overlap).

    Scale: the exact-fingerprint decontaminator broadcasts the
    benchmark's full fingerprint set — fine for MB-scale suites, but
    the broadcast grows with the benchmark. The Bloom gate's build
    side is a set of bit POSITIONS bounded by M = 16384 rows of one
    int each, REGARDLESS of benchmark size; k = 3 positions per
    fingerprint come from hex slices of the fingerprint itself (no
    extra hashing). The corpus side is map-only against that
    broadcast; only (doc_id, fp, hit) partials shuffle. False
    positives are inherent to Bloom semantics and deterministic —
    the oracle reproduces them bit-for-bit; a production pipeline
    routes flagged docs through the exact overlap check.
    """
    from declarativeml_spark.operators.corpus import fingerprint_frame

    docs = load_table(spark, sf_dir, "documents", spread=True)
    bench = docs.filter(F.col("doc_id") % 23 == 5)
    corpus = docs.filter(F.col("doc_id") % 23 != 5)

    pos_arr = "array(" + ", ".join(_bloom_pos("fp")) + ")"
    bits = (
        fingerprint_frame(bench, id_col="doc_id", text_col="text")
        .select(F.explode("hs").alias("fp"))
        .distinct()
        .select(F.explode(F.expr(pos_arr)).alias("pos"))
        .distinct()
    )
    probe = (
        fingerprint_frame(corpus, id_col="doc_id", text_col="text")
        .select("doc_id", F.explode("hs").alias("fp"))
        .distinct()
        .select("doc_id", "fp", F.explode(F.expr(pos_arr)).alias("pos"))
    )
    fphit = (
        probe.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("doc_id", "fp")
        .agg(F.min(F.coalesce("hit", F.lit(0))).cast("bigint").alias("all_hit"))
    )
    return (
        fphit.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_fps"),
            F.sum("all_hit").cast("bigint").alias("n_hits"),
        )
        .filter(F.col("n_hits") >= 3)
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters: d rows x w columns of counters; the
# estimate for a token is the min over its d cells. Deliberately
# small w so the sketch actually collides at test scale and the
# overcount column is exercised.
_CMS_D = 4
_CMS_W = 64


def _cms_pos(tok_expr: str, j: int) -> str:
    salted = "md5(concat('cms" + str(j) + ":', " + tok_expr + "))"
    return f"({_hexslice_int(salted, 1)} % {_CMS_W})"


@query(
    "token_heavy_hitters_cms",
    oracle=f"""
    WITH occ AS (
        SELECT unnest({_TOKS_D}) AS token FROM documents
    ),
    vocab AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
        FROM occ GROUP BY token
    ),
    cells AS (
        SELECT j, pos, CAST(SUM(exact_cnt) AS BIGINT) AS cell_total
        FROM (
            SELECT exact_cnt, unnest([{
                ', '.join(str(j) for j in range(_CMS_D))
            }]) AS j,
                   unnest([{
                ', '.join(_cms_pos('token', j) for j in range(_CMS_D))
            }]) AS pos
            FROM vocab
        ) GROUP BY j, pos
    ),
    est AS (
        SELECT v.token, v.exact_cnt,
               CAST(MIN(c.cell_total) AS BIGINT) AS est_cnt
        FROM (
            SELECT token, exact_cnt, unnest([{
                ', '.join(str(j) for j in range(_CMS_D))
            }]) AS j,
                   unnest([{
                ', '.join(_cms_pos('token', j) for j in range(_CMS_D))
            }]) AS pos
            FROM vocab
        ) v JOIN cells c ON v.j = c.j AND v.pos = c.pos
        GROUP BY v.token, v.exact_cnt
    )
    SELECT token, exact_cnt, est_cnt,
           CAST(est_cnt - exact_cnt AS BIGINT) AS overcount
    FROM est
    ORDER BY est_cnt DESC, token LIMIT 20
    """,
)
def token_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heavy-hitter tokens by count-min-sketch estimate
    (d = <_CMS_D> rows x w = <_CMS_W> counters), reported against exact counts
    so the sketch's one-sided overcount is visible per token.

    Scale: the sketch state is d*w = <_CMS_D * _CMS_W> cells total — constant,
    vs a |vocab|-sized exact table. Cell updates are built from
    map-side-combinable partial token counts (inserting per
    occurrence and summing partial counts into cells are the same
    arithmetic), so the corpus-scale shuffle carries only (token,
    partial-count) pairs and the cell build runs on the vocab
    aggregate. The d positions per token are salted-md5 slices —
    the same cross-engine hash family as the minhash tables. Top-20
    ties break on token text for deterministic LIMIT.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.expr(_TOKS_S)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("exact_cnt"))
        .transform(track_persist)
    )
    tagged = vocab
    for j in range(_CMS_D):
        tagged = tagged.withColumn(f"p{j}", F.expr(_cms_pos("token", j)))
    placed = tagged.select(
        "token",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), F.col(f"p{j}").alias("pos")
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("jp"),
    ).select("token", "exact_cnt", "jp.j", "jp.pos")
    cells = placed.groupBy("j", "pos").agg(
        F.sum("exact_cnt").cast("bigint").alias("cell_total")
    )
    est = (
        placed.join(F.broadcast(cells), ["j", "pos"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cell_total").cast("bigint").alias("est_cnt"))
    )
    return (
        est.select(
            "token",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt"))
            .cast("bigint")
            .alias("overcount"),
        )
        .orderBy(F.desc("est_cnt"), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Numeric column profiler over lineitem: two passes — global stats,
# then equi-width 10-bucket histograms using the stats.
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def _profile_oracle() -> str:
    stat_sel = []
    for c in _PROFILE_COLS:
        # nullif mirrors operators/profile.py: all-NULL column -> NULL
        # mean, constant column -> single bucket (not div-by-zero)
        avg_expr = sql_sround(
            f"CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE)"
            f" / nullif(COUNT({c}), 0)",
            6,
        )
        stat_sel.append(
            f"SELECT '{c}' AS col_name, CAST(COUNT({c}) AS BIGINT) AS n,"
            f" CAST(MIN({c}) AS DOUBLE) AS mn, CAST(MAX({c}) AS DOUBLE) AS mx,"
            f" {avg_expr} AS avg_val"
            " FROM lineitem"
        )
    stats = " UNION ALL ".join(stat_sel)
    val_sel = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS DOUBLE) AS v FROM lineitem"
        for c in _PROFILE_COLS
    )
    return f"""
    WITH stats AS ({stats}),
    vals AS ({val_sel}),
    bucketed AS (
        SELECT v.col_name,
               CAST(CASE WHEN s.mx > s.mn
                    THEN least(9, greatest(0, CAST(floor((v.v - s.mn)
                        / (s.mx - s.mn) * 10.0) AS BIGINT)))
                    ELSE 0 END AS BIGINT) AS b
        FROM vals v JOIN stats s ON v.col_name = s.col_name
        WHERE v.v IS NOT NULL
    ),
    counts AS (
        SELECT col_name, b, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM bucketed GROUP BY col_name, b
    ),
    hist AS (
        SELECT s.col_name,
               string_agg(CAST(coalesce(c.cnt, 0) AS VARCHAR), ','
                          ORDER BY g.range) AS hist
        FROM stats s
        CROSS JOIN range(0, 10) g
        LEFT JOIN counts c ON c.col_name = s.col_name AND c.b = g.range
        GROUP BY s.col_name
    )
    SELECT s.col_name, s.n, s.mn, s.mx, s.avg_val, h.hist
    FROM stats s JOIN hist h ON s.col_name = h.col_name
    """


@query("lineitem_numeric_profile", oracle=_profile_oracle())
def lineitem_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric column profiler: per column, row count, min/max,
    decimal-exact mean, and a 10-bucket equi-width histogram — the
    data-quality card a pipeline publishes for every numeric feature
    before training consumes it.

    Scale: two inherent passes (bucket edges need global min/max
    first, cf. quality_budget_selection's two-pass percentile). Pass
    1 computes all columns' stats in ONE scan (a single agg row,
    stack()ed into per-column rows). Pass 2 re-scans with the tiny
    stats frame broadcast, posexplodes each row into (column, bucket)
    pairs and counts — map-side combine collapses the shuffle to at
    most columns x 10 rows per partition. The histogram string is
    assembled from a bucket->count map so empty buckets render as
    zeros without a spine join.
    """
    from declarativeml_spark.operators.profile import numeric_profile

    return numeric_profile(load_table(spark, sf_dir, "lineitem"), _PROFILE_COLS)


# ---------------------------------------------------------------------------
# Product quantization: m subspaces, each with its own deterministic
# Lloyd's codebook (native_cells), codes concatenated per vector.
_PQ_M = 4
_PQ_SUBDIM = 16
_PQ_CELLS = 4
_PQ_ITERS = 2

# Integer-scaled squared error: each per-dim term is rounded to an
# exact BIGINT at 1e12 scale before summing, so the subspace error is
# an exact integer in both engines — no float-accumulation-order or
# decimal-cast-rounding dependence in the hash.
# Parameterized once, derived twice: ann_pq_recall (pipeline10) uses
# the same 1e12 fixed-point recipe on different column pairs, and a
# retune here must reach every distance the PQ family hashes.
_SE_SPARK_T = (
    "CAST(aggregate(zip_with({a}, {b}, (x, y) ->"
    " CAST(floor((x - y) * (x - y) * 1e12 + 0.5) AS BIGINT)),"
    " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"
)
_SE_DUCK_T = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}), p ->"
    " CAST(floor((p[1] - p[2]) * (p[1] - p[2]) * 1e12 + 0.5) AS BIGINT)))"
    " AS BIGINT)"
)
_SE_SPARK = _SE_SPARK_T.format(a="vec", b="cvec")
_SE_DUCK = _SE_DUCK_T.format(a="a.vec", b="c.cvec")


def _pq_oracle() -> str:
    from declarativeml_spark.operators.dedup import native_cells_ctes

    ctes: list[str] = []
    for s in range(_PQ_M):
        lo, hi = 1 + _PQ_SUBDIM * s, _PQ_SUBDIM * (s + 1)
        sub_t = (
            f"(SELECT vec_id, embedding[{lo}:{hi}] AS sub FROM embeddings"
            f" WHERE len(embedding) = {_PQ_M * _PQ_SUBDIM}) AS sq{s}"
        )
        chain, _ = native_cells_ctes(
            n_cells=_PQ_CELLS,
            n_iters=_PQ_ITERS,
            dim=_PQ_SUBDIM,
            table=sub_t,
            id_col="vec_id",
            vec_col="sub",
            prefix=f"p{s}_",
        )
        ctes += chain
        ctes.append(
            f"e{s} AS (SELECT a.vec_id, a.cell AS c{s}, {_SE_DUCK} AS se{s}"
            f" FROM p{s}_corpus a JOIN p{s}_c{_PQ_ITERS} c"
            " ON a.cell = c.cell)"
        )
    joined = ",\n    ".join(ctes)
    code = ", ".join(f"CAST(c{s} AS VARCHAR)" for s in range(_PQ_M))
    tot = " + ".join(f"se{s}" for s in range(_PQ_M))
    froms = " JOIN ".join(
        [f"e0"] + [f"e{s} USING (vec_id)" for s in range(1, _PQ_M)]
    )
    denom = float(_PQ_M * _PQ_SUBDIM) * 1e12
    return f"""
    WITH {joined}
    SELECT vec_id, concat_ws('-', {code}) AS pq_code,
           CAST({tot} AS DOUBLE) / {denom!r} AS mse
    FROM {froms}
    """


# appId-keyed memo (same discipline as dedup._NATIVE_CELLS_MEMO): the
# driver window runs embedding_pq_codes AND ann_pq_recall in one
# session; without the memo the identical model trains twice and
# double-persists base/cents.
_PQ_MODEL_MEMO: dict = {}
_PQ_MODEL_MEMO_CAP = 8


def _pq_model(spark: SparkSession, sf_dir: str):
    """Train the joint-Lloyd PQ model once and return
    ``(emb, base, cents, assigned)``:

    * ``emb``   — the dimension-validated embeddings scan;
    * ``base``  — (vec_id, s, vec) exploded sub-vectors (persisted);
    * ``cents`` — (s, cell, cvec) codebooks after <_PQ_ITERS> pinned
      Lloyd iterations (persisted);
    * ``assigned`` — (vec_id, s, cell) final code assignment.

    Shared by ``embedding_pq_codes`` (codes + reconstruction MSE) and
    ``ann_pq_recall`` (pipeline10 — ADC search quality): both must
    audit the SAME model or the two queries would silently describe
    different quantizers.
    """
    from declarativeml_spark.operators.skew import spread_partitions

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    hit = _PQ_MODEL_MEMO.get(memo_key)
    if hit is not None:
        # serve CACHED frames: re-persist lazily if a release dropped
        # the insert-time persist (native_cells memo-hit discipline)
        for frame in (hit[1], hit[2]):
            sl = frame.storageLevel
            if not (sl.useMemory or sl.useDisk):
                frame.persist()
        return hit

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.size("embedding") == _PQ_M * _PQ_SUBDIM
    )
    # All m subspaces train JOINTLY in one keyed Lloyd's loop: the
    # corpus explodes once into (vec_id, s, vec) sub-vector rows, and
    # each iteration is ONE broadcast of all m codebooks + one
    # groupBy(s, cell) decimal agg — versus m independent quantizer
    # runs (m x iters broadcast jobs, m persists of the same scan).
    # The per-subspace arithmetic is unchanged, so the per-subspace
    # oracle CTE chains still match value-for-value.
    subs = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice(
                    F.col("embedding").cast("array<double>"),
                    1 + _PQ_SUBDIM * s,
                    _PQ_SUBDIM,
                ).alias("vec"),
            )
            for s in range(_PQ_M)
        ]
    )
    base = (
        spread_partitions(
            emb.select("vec_id", F.explode(subs).alias("sv")).select(
                "vec_id", "sv.s", "sv.vec"
            )
        )
        .transform(track_persist)
    )
    # init: the n_cells smallest-id vectors of EACH subspace — the
    # same vec_ids for every s, so TakeOrdered on the un-exploded
    # table then a tiny per-s ranking.
    init = (
        emb.orderBy("vec_id")
        .limit(_PQ_CELLS)
        .select("vec_id", F.explode(subs).alias("sv"))
        .select("vec_id", "sv.s", F.col("sv.vec").alias("cvec"))
    )
    w_init = Window.partitionBy("s").orderBy("vec_id")
    cents = init.withColumn("cell", F.row_number().over(w_init) - 1).select(
        "s", "cell", "cvec"
    )
    mean_dims = [
        (
            F.expr(f"CAST(SUM(CAST(vec[{i}] AS DECIMAL(38,12))) AS DOUBLE)")
            / F.count("*")
        ).alias(f"m{i}")
        for i in range(_PQ_SUBDIM)
    ]
    cs = F.collect_list(F.struct("cell", "cvec")).alias("cs")
    assign = (
        "array_min(transform(cs, c -> struct("
        "aggregate(zip_with(vec, c.cvec, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d2,"
        " c.cell AS cell))).cell"
    )
    for _ in range(_PQ_ITERS):
        assigned = base.join(
            F.broadcast(cents.groupBy("s").agg(cs)), "s"
        ).select("vec_id", "s", "vec", F.expr(assign).alias("cell"))
        cents = (
            assigned.groupBy("s", "cell")
            .agg(*mean_dims)
            .select(
                "s",
                "cell",
                F.array(
                    *[F.col(f"m{i}") for i in range(_PQ_SUBDIM)]
                ).alias("cvec"),
            )
        )
    cents = cents.transform(track_persist)
    assigned = base.join(
        F.broadcast(cents.groupBy("s").agg(cs)), "s"
    ).select("vec_id", "s", "vec", F.expr(assign).alias("cell"))
    if len(_PQ_MODEL_MEMO) >= _PQ_MODEL_MEMO_CAP:
        # release the evicted entry's persisted frames (base, cents) —
        # dropping the dict reference alone would leak the cached
        # blocks with no remaining handle, and a later re-train for
        # the same key would stack a second persisted copy.
        evicted = _PQ_MODEL_MEMO.pop(next(iter(_PQ_MODEL_MEMO)))
        for frame in (evicted[1], evicted[2]):
            try:
                frame.unpersist()
            except Exception:
                pass  # a dead session's blocks are already gone
    _PQ_MODEL_MEMO[memo_key] = (emb, base, cents, assigned)
    return emb, base, cents, assigned


@query("embedding_pq_codes", oracle=_pq_oracle())
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: split each embedding into m = <_PQ_M>
    subspaces of <_PQ_SUBDIM> dims, learn a <_PQ_CELLS>-centroid codebook per subspace
    with the pinned deterministic Lloyd's (operators/dedup.py
    ``native_cells`` — DECIMAL means, smallest-id init), and emit
    each vector's concatenated cell code plus reconstruction MSE.
    PQ is the memory lever behind IVFPQ-style billion-vector indexes:
    m log2(k) bits per vector instead of dim floats.

    Scale: each subspace's Lloyd iteration is a broadcast(centroids)
    map over the corpus plus one <_PQ_SUBDIM>-column decimal agg — the corpus
    never shuffles during training; the final code assembly joins m
    slim (vec_id, code, se) frames on vec_id. Reconstruction error
    aggregates as exact integers (per-dim terms rounded to BIGINT at
    1e12 scale) so the hash cannot depend on summation order.
    """
    _emb, _base, cents, assigned = _pq_model(spark, sf_dir)
    final = assigned.join(F.broadcast(cents), ["s", "cell"]).select(
        "vec_id", "s", "cell", F.expr(_SE_SPARK).alias("se")
    )
    # one slim (vec_id, s, cell, se) shuffle assembles codes + MSE
    denom = F.lit(float(_PQ_M * _PQ_SUBDIM) * 1e12)
    return final.groupBy("vec_id").agg(
        F.expr(
            f"concat_ws('-', transform(sequence(0, {_PQ_M - 1}),"
            " i -> CAST(element_at("
            "map_from_entries(collect_list(struct(s, cell))), i) AS STRING)))"
        ).alias("pq_code"),
        (F.sum("se").cast("double") / denom).alias("mse"),
    )


# ---------------------------------------------------------------------------
# Population-stability-index drift: each source's document-length
# distribution vs the whole corpus, over 10 equi-width buckets.
_PSI_EPS = 1e-6


@query(
    "source_length_drift_psi",
    oracle=f"""
    WITH d AS (
        SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents
    ),
    mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM d),
    b AS (
        SELECT d.source,
               least(9, greatest(0, CAST(floor((d.v - mm.mn)
                   / (mm.mx - mm.mn) * 10.0) AS BIGINT))) AS bkt
        FROM d CROSS JOIN mm
    ),
    sc AS (SELECT source, bkt, CAST(COUNT(*) AS BIGINT) AS c
           FROM b GROUP BY source, bkt),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
           FROM sc GROUP BY source),
    gc AS (SELECT bkt, CAST(SUM(c) AS BIGINT) AS g FROM sc GROUP BY bkt),
    gt AS (SELECT CAST(SUM(g) AS BIGINT) AS ng FROM gc),
    spine AS (
        SELECT st.source, st.n, g.range AS bkt
        FROM st CROSS JOIN range(0, 10) g
    ),
    frac AS (
        SELECT s.source, s.bkt,
               CAST(coalesce(sc.c, 0) AS DOUBLE) / s.n + {_PSI_EPS!r} AS p,
               CAST(gc.g AS DOUBLE) / gt.ng + {_PSI_EPS!r} AS q
        FROM spine s
        LEFT JOIN sc ON sc.source = s.source AND sc.bkt = s.bkt
        JOIN gc ON gc.bkt = s.bkt
        CROSS JOIN gt
    )
    SELECT source,
           {sql_sround(
               'CAST(SUM(CAST('
               + sql_sround('(p - q) * ln(p / q)', 12)
               + ' AS DECIMAL(38,12))) AS DOUBLE)', 8)} AS psi
    FROM frac GROUP BY source
    """,
)
def source_length_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of each source's document-length
    distribution against the whole corpus — the drift score a data
    monitor tracks per ingest source (PSI > 0.2 conventionally flags
    a shifted distribution; pairs with MONITOR MODEL's
    feature-drift checks).

    Scale: one scan buckets lengths into 10 equi-width bins (edges
    from a broadcast min/max row); everything after runs on the
    (sources x 10)-row count table — per-source and global fractions,
    epsilon-smoothed PSI terms, a 10-term sum. The per-bucket PSI
    terms round to 12 digits and aggregate through DECIMAL so the
    hash is order-independent; ln() is the same cross-engine IEEE op
    BM25/TF-IDF rely on. Empty (source, bucket) cells enter as
    exact zeros via a sources x 10 spine, not a missing row.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("v")
    )
    mm = docs.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    b = docs.crossJoin(F.broadcast(mm)).select(
        "source",
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("v") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * 10.0
                ).cast("bigint"),
            ),
        ).alias("bkt"),
    )
    # NOT persisted (r12 revert): every consumer of the (source, bkt)
    # count grid sits above the IDENTICAL groupBy exchange, which
    # ReuseExchange/AQE stage reuse executes once per action — the
    # sf1 A/B measured the persist ~27% slower (on 0.48 s / off
    # 0.37 s median); sf0.1 a wash
    sc = b.groupBy("source", "bkt").agg(
        F.count("*").cast("bigint").alias("c")
    )
    st = sc.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    gc = sc.groupBy("bkt").agg(F.sum("c").cast("bigint").alias("g"))
    gt = gc.agg(F.sum("g").cast("bigint").alias("ng"))
    spine = st.crossJoin(F.broadcast(spark.range(10).select(F.col("id").alias("bkt"))))
    frac = (
        spine.join(sc, ["source", "bkt"], "left")
        .join(F.broadcast(gc), "bkt")
        .crossJoin(F.broadcast(gt))
        .select(
            "source",
            "bkt",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col("n")
                + F.lit(_PSI_EPS)
            ).alias("p"),
            (F.col("g").cast("double") / F.col("ng") + F.lit(_PSI_EPS)).alias(
                "q"
            ),
        )
    )
    term = sround(
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 12
    )
    return frac.groupBy("source").agg(
        sround(
            F.sum(term.cast("decimal(38,12)")).cast("double"), 8
        ).alias("psi")
    )


# ---------------------------------------------------------------------------
# CDC shapes: MERGE-style upsert of a change batch into a snapshot,
# and latest-per-key log compaction.
@query(
    "orders_merge_upsert",
    oracle="""
    WITH changes AS (
        SELECT o_orderkey, o_custkey, 'D' AS o_orderstatus,
               CAST(o_totalprice * 1.1 AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey % 31 = 7
    ),
    kept AS (
        SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               FALSE AS updated
        FROM orders o LEFT JOIN changes c ON o.o_orderkey = c.o_orderkey
        WHERE c.o_orderkey IS NULL
    )
    SELECT * FROM kept
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           TRUE AS updated
    FROM changes
    """,
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (WHEN MATCHED UPDATE semantics) without a
    row-level-op table format: apply a change batch (here a derived
    ~3% of orders with repriced rows) onto the snapshot as
    anti-join(snapshot, changes) UNION changes — the upsert shape a
    warehouse runs when Delta/Iceberg MERGE isn't available.

    Scale: one hash join on the primary key (changes are typically a
    small fraction — AQE broadcasts them when they fit, else a keyed
    shuffle co-partitions both sides); the snapshot is read once,
    never sorted globally. With a bucketed snapshot table the join is
    co-located and shuffle-free (tests/test_bucketed_join.py shows
    the layout). The ``updated`` flag makes the written-row
    provenance auditable downstream.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    changes = o.filter(F.col("o_orderkey") % 31 == 7).select(
        "o_orderkey",
        "o_custkey",
        F.lit("D").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).cast("double").alias("o_totalprice"),
    )
    kept = o.join(changes.select("o_orderkey"), "o_orderkey", "left_anti")
    return kept.withColumn("updated", F.lit(False)).unionByName(
        changes.withColumn("updated", F.lit(True))
    )


@query(
    "events_latest_per_user",
    oracle="""
    WITH r AS (
        SELECT user_id, event_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_id, event_type, ts AS last_ts
    FROM r WHERE rn = 1
    """,
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log compaction: the latest event per user (CDC upsert-stream →
    current-state table, the Kafka-compaction / SCD-type-1 shape).

    Scale: one shuffle on the compaction key with map-side partial
    reduction — max_by over struct(ts, event_id, ...) keeps ONE row
    per key per partition before the exchange, so the shuffle carries
    at most n_keys rows per upstream partition (a window + rn = 1
    formulation would shuffle every event and sort each key group).
    Ties break on event_id so both engines pick the same row.
    """
    ev = load_table(spark, sf_dir, "events")
    best = F.max(
        F.struct("ts", "event_id", "event_type")
    ).alias("b")
    return (
        ev.groupBy("user_id")
        .agg(best)
        .select(
            "user_id",
            F.col("b.event_id").alias("event_id"),
            F.col("b.event_type").alias("event_type"),
            F.col("b.ts").alias("last_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance: merge a delta batch's
# partial aggregates into an existing hourly rollup snapshot.
@query(
    "events_rollup_incremental",
    oracle="""
    WITH old AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM events WHERE event_id % 5 <> 0 GROUP BY 1, 2
    ),
    delta AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM events WHERE event_id % 5 = 0 GROUP BY 1, 2
    )
    SELECT coalesce(o.event_type, d.event_type) AS event_type,
           coalesce(o.hour, d.hour) AS hour,
           CAST(coalesce(o.n, 0) + coalesce(d.n, 0) AS BIGINT) AS n,
           CAST(CAST(coalesce(o.total_value, 0.0) AS DECIMAL(38,6))
                + CAST(coalesce(d.total_value, 0.0) AS DECIMAL(38,6))
                AS DOUBLE) AS total_value,
           d.event_type IS NOT NULL AS touched
    FROM old o FULL OUTER JOIN delta d
      ON o.event_type = d.event_type AND o.hour = d.hour
    """,
)
def events_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance (the hypertable
    continuous-aggregate / materialized-view-delta shape): an hourly
    (event_type, hour) rollup SNAPSHOT exists (here events with
    event_id % 5 != 0); a DELTA batch arrives (% 5 = 0); the merged
    rollup is snapshot ⟗ delta-partials with countable/summable
    state added cell-wise — history is NEVER rescanned.

    Scale: the delta aggregates alone (delta-sized work), then joins
    the snapshot on the rollup key — at 100 TB the snapshot is
    orders of magnitude smaller than raw events, and with both sides
    keyed identically AQE plans a co-partitioned join. Sums combine
    in DECIMAL so the merged value equals the from-scratch rollup
    exactly; the ``touched`` flag shows which cells an upsert-style
    writer would rewrite. Equivalent from-scratch semantics =
    events_hourly_stats over the full table.
    """
    ev = load_table(spark, sf_dir, "events")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        ).agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )

    old = rollup(ev.filter(F.col("event_id") % 5 != 0)).alias("o")
    delta = rollup(ev.filter(F.col("event_id") % 5 == 0)).alias("d")
    j = old.join(
        delta,
        (F.col("o.event_type") == F.col("d.event_type"))
        & (F.col("o.hour") == F.col("d.hour")),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("o.event_type"), F.col("d.event_type")).alias(
            "event_type"
        ),
        F.coalesce(F.col("o.hour"), F.col("d.hour")).alias("hour"),
        (
            F.coalesce(F.col("o.n"), F.lit(0))
            + F.coalesce(F.col("d.n"), F.lit(0))
        )
        .cast("bigint")
        .alias("n"),
        (
            F.coalesce(F.col("o.total_value"), F.lit(0.0)).cast(
                "decimal(38,6)"
            )
            + F.coalesce(F.col("d.total_value"), F.lit(0.0)).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("total_value"),
        F.col("d.event_type").isNotNull().alias("touched"),
    )


# ---------------------------------------------------------------------------
# Z-order layout keys: bit-interleave two join/filter dimensions so
# one sort order gives narrow min/max spans on BOTH — the
# data-skipping layout lever (Delta OPTIMIZE ZORDER BY shape). Each
# dimension is first min/max-quantized into the bit budget: raw
# low-bit interleaving is degenerate when the key range is far below
# 2^bits (all rows land in bucket 0) and aliased when it exceeds it
# (keys 2^bits apart collide).
_Z_BITS = 20
_Z_SCALE = 1 << _Z_BITS


def _z_terms(shift_fmt: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(shift_fmt.format(col="qok", i=i, out=2 * i))
        terms.append(shift_fmt.format(col="qpk", i=i, out=2 * i + 1))
    return " + ".join(terms)


_Z_SPARK = _z_terms("shiftleft(shiftright({col}, {i}) & 1, {out})")
_Z_DUCK = _z_terms("((({col} >> {i}) & 1) << {out})")

# quantize key k into [0, 2^bits): IEEE double divide + floor,
# identical in both engines
_ZQ = (
    "CAST(floor(CAST({k} - {mn} AS DOUBLE) / ({mx} - {mn} + 1)"
    f" * {_Z_SCALE}.0) AS BIGINT)"
)


@query(
    "lineitem_zorder_layout",
    oracle=f"""
    WITH mm AS (
        SELECT MIN(l_orderkey) AS ok_mn, MAX(l_orderkey) AS ok_mx,
               MIN(l_partkey) AS pk_mn, MAX(l_partkey) AS pk_mx
        FROM lineitem
    ),
    q AS (
        SELECT l_orderkey, l_partkey,
               {_ZQ.format(k='l_orderkey', mn='mm.ok_mn', mx='mm.ok_mx')} AS qok,
               {_ZQ.format(k='l_partkey', mn='mm.pk_mn', mx='mm.pk_mx')} AS qpk
        FROM lineitem CROSS JOIN mm
    ),
    z AS (
        SELECT l_orderkey, l_partkey, CAST({_Z_DUCK} AS BIGINT) AS zval
        FROM q
    )
    SELECT CAST(zval >> {2 * _Z_BITS - 6} AS BIGINT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS BIGINT) AS ok_min,
           CAST(MAX(l_orderkey) AS BIGINT) AS ok_max,
           CAST(MIN(l_partkey) AS BIGINT) AS pk_min,
           CAST(MAX(l_partkey) AS BIGINT) AS pk_max
    FROM z GROUP BY 1
    """,
)
def lineitem_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys over (l_orderkey, l_partkey):
    min/max-quantize each key into <_Z_BITS> bits, interleave, bucket rows
    by the z-value's top 6 bits (64 would-be files), and report each
    bucket's min/max span on BOTH dimensions — the evidence that one
    z-sorted write gives parquet row-group skipping for predicates
    on either key, where a plain sort helps only its leading column.

    Scale: one stats row (broadcast) quantizes both dims into the bit
    budget at ANY key range — without it the interleave is degenerate
    below 2^<_Z_BITS> and aliased above; the z-value itself is a pure
    per-row bit expression (whole-stage codegen, no shuffle); the
    span audit is one groupBy of 64 groups. The write-side use is
    `sortWithinPartitions(zval)` before the sink — this query is the
    planner's proof the spans are narrow, kept hash-checkable
    instead of writing files.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    mm = li.agg(
        F.min("l_orderkey").alias("ok_mn"),
        F.max("l_orderkey").alias("ok_mx"),
        F.min("l_partkey").alias("pk_mn"),
        F.max("l_partkey").alias("pk_mx"),
    )
    q = li.crossJoin(F.broadcast(mm)).select(
        "l_orderkey",
        "l_partkey",
        F.expr(
            _ZQ.format(k="l_orderkey", mn="ok_mn", mx="ok_mx")
        ).alias("qok"),
        F.expr(_ZQ.format(k="l_partkey", mn="pk_mn", mx="pk_mx")).alias(
            "qpk"
        ),
    )
    z = q.withColumn("zval", F.expr(f"CAST({_Z_SPARK} AS BIGINT)"))
    return (
        z.withColumn(
            "z_bucket",
            F.expr(f"CAST(shiftright(zval, {2 * _Z_BITS - 6}) AS BIGINT)"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("l_orderkey").cast("bigint").alias("ok_min"),
            F.max("l_orderkey").cast("bigint").alias("ok_max"),
            F.min("l_partkey").cast("bigint").alias("pk_min"),
            F.max("l_partkey").cast("bigint").alias("pk_max"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram PMI collocations: which adjacent token pairs stick together
# far more than chance — the collocation extraction step under
# phrase mining / tokenizer-merge analysis.
_PMI_TOPK = 20
_PMI_MIN_N = 5


@query(
    "token_bigram_pmi",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS_D} AS toks FROM documents),
    uni AS (
        SELECT t AS tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM d, unnest(toks) AS u(t) GROUP BY t
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_uni FROM uni),
    big AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM d, unnest(range(1, len(toks))) AS r(i)
        GROUP BY 1, 2
    ),
    btot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_big FROM big),
    scored AS (
        SELECT b.w1, b.w2, b.n,
               ln((CAST(b.n AS DOUBLE) / bt.n_big)
                  / ((CAST(u1.n AS DOUBLE) / t.n_uni)
                     * (CAST(u2.n AS DOUBLE) / t.n_uni))) AS pmi
        FROM big b
        JOIN uni u1 ON b.w1 = u1.tok
        JOIN uni u2 ON b.w2 = u2.tok
        CROSS JOIN tot t CROSS JOIN btot bt
        WHERE b.n >= {_PMI_MIN_N}
    )
    SELECT w1, w2, n, {sql_sround('pmi', 6)} AS pmi,
           CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT)
               AS rnk
    FROM scored
    QUALIFY rnk <= {_PMI_TOPK}
    """,
)
def token_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-<_PMI_TOPK> adjacent-token collocations by pointwise mutual
    information (observed bigram probability over the independence
    expectation), with a minimum-count floor of <_PMI_MIN_N> so rare
    coincidences don't dominate — the phrase-mining/tokenizer-merge
    signal.

    Scale: one (w1, w2) bigram shuffle with map-side combine and one
    unigram shuffle; the unigram table joins back as a broadcast
    dimension and the two totals are single broadcast rows. Top-k is
    TakeOrdered on the scored bigram table; ties break on the pair
    text. ln() is the shared cross-engine IEEE op.
    """
    # persisted: the tokenized plane feeds BOTH the unigram and the
    # bigram explode — unpersisted, each re-ran the scan + tokenize
    # (r11; the text_bigram_logprob shape)
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", F.expr(_TOKS_S).alias("toks")
    ).transform(track_persist)
    uni = (
        docs.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n"))
        .transform(track_persist)
    )
    tot = uni.agg(F.sum("n").cast("bigint").alias("n_uni"))
    big_all = (
        docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("n"))
        .transform(track_persist)
    )
    # the probability denominator counts ALL bigram occurrences; the
    # min-count floor prunes only which pairs get scored
    btot = big_all.agg(F.sum("n").cast("bigint").alias("n_big"))
    big = big_all.filter(F.col("n") >= _PMI_MIN_N)
    u1 = uni.select(F.col("tok").alias("w1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("n").alias("n2"))
    scored = (
        big.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            "n",
            F.log(
                (F.col("n").cast("double") / F.col("n_big"))
                / (
                    (F.col("n1").cast("double") / F.col("n_uni"))
                    * (F.col("n2").cast("double") / F.col("n_uni"))
                )
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(F.desc("pmi"), "w1", "w2").limit(_PMI_TOPK)
    wr = Window.orderBy(F.desc("pmi"), "w1", "w2")
    return top.select(
        "w1",
        "w2",
        "n",
        sround(F.col("pmi"), 6).alias("pmi"),
        F.row_number().over(wr).cast("bigint").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix: the heuristic's prediction against
# the metadata label — the eval every classifier-driven filter needs
# before its output steers retention.
def _lang_conf_oracle() -> str:
    hits = {lang: T.lang_hits_duck("toks", lang) for lang in T.LANG_ORDER}
    pred = T.predicted_lang_case(hits)
    return f"""
    WITH d AS (SELECT lang, {_TOKS_D} AS toks FROM documents),
    p AS (SELECT lang, {pred} AS predicted FROM d)
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY lang, predicted
    """


@query("lang_id_confusion", oracle=_lang_conf_oracle())
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-overlap language-ID heuristic
    against the documents table's metadata ``lang`` label — the
    quality gate for the classifier itself, run before its
    predictions steer corpus retention (mirrors how production
    pipelines audit fastText-style LID per source).

    Scale: per-row prediction is pure codegen; the matrix is one
    groupBy of (langs x langs) cells with map-side combine. The plan
    IS text_language_id's (delegated — a second verbatim copy of the
    prediction pipeline would silently drift from it), re-aliased to
    this query's historical column name.
    """
    from declarativeml_spark.queries.pipeline import text_language_id

    return text_language_id(spark, sf_dir).select(
        "lang",
        "predicted",
        F.col("n_docs").cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction: top-3 terms per document.
_TFIDF_TOPK = 3


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH occ AS (
        SELECT doc_id, unnest({_TOKS_D}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM occ GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf AS DOUBLE) * ln(n.n_docs / df.df) AS score
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rnk
        FROM scored
    )
    SELECT doc_id, term, {sql_sround('score', 6)} AS tfidf,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {_TFIDF_TOPK}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-<_TFIDF_TOPK> TF-IDF terms per document — the per-doc keyword
    extraction that feeds tagging, routing, and cluster labeling
    (complements the corpus-level BM25 retrieval leg).

    Scale: (doc_id, term) term frequencies shuffle once with
    map-side combine; document frequencies aggregate the tf table
    (already vocab x docs-bounded) and broadcast back as a
    vocab-sized dimension join. The per-document top-k window
    partitions by doc_id — embarrassingly parallel, never a global
    sort. ln() is the same cross-engine IEEE op BM25 already relies
    on; ties break on term text.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    tf = (
        docs.select("doc_id", F.explode(F.expr(_TOKS_S)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .transform(track_persist)
    )
    df = tf.groupBy("term").agg(
        F.count_distinct("doc_id").cast("double").alias("df")
    )
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs") / F.col("df"))
            ).alias("score"),
        )
    )
    wr = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _TFIDF_TOPK)
        .select(
            "doc_id",
            "term",
            sround(F.col("score"), 6).alias("tfidf"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source quality percentile calibration: the same raw quality
# score means different things in different domains; percentile
# normalization within source makes one keep-threshold comparable
# across all of them.
def _qpct_oracle() -> str:
    qual = T.quality_duck("toks", "text", T.lang_hits_duck("toks", "en"))
    return f"""
    WITH d AS (SELECT doc_id, source, text, {_TOKS_D} AS toks
               FROM documents),
    q AS (SELECT doc_id, source, {qual} AS quality FROM d),
    p AS (SELECT doc_id, source, quality,
                 percent_rank() OVER (PARTITION BY source
                                      ORDER BY quality, doc_id) AS pctl
          FROM q)
    SELECT doc_id, source, {sql_sround('quality', 6)} AS quality,
           {sql_sround('pctl', 6)} AS pctl,
           pctl >= 0.3 AS keep
    FROM p
    """


@query("quality_source_percentile", oracle=_qpct_oracle())
def quality_source_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality percentile: percent_rank of each document's
    quality score WITHIN its source, plus the keep flag for a
    drop-bottom-30%-per-source gate. Calibrating the threshold per
    domain prevents one verbose source from monopolizing the survivor
    set the way a single global cutoff does.

    Scale: one scan computing the quality score (codegen'd), one
    window partitioned by source. Sources are few and can be large —
    if a single source outgrows a partition's sort budget, the
    two-pass percentile-cutoff shape (quality_budget_selection)
    applied per source is the fallback; percent_rank is kept here
    because the per-document percentile itself is the output, not
    just the cutoff. Ties break on doc_id so ranks are deterministic.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.expr(_TOKS_S)
    )
    q = docs.select(
        "doc_id",
        "source",
        F.expr(
            T.quality_spark("toks", "text", T.lang_hits_spark("toks", "en"))
        ).alias("quality"),
    )
    wp = Window.partitionBy("source").orderBy("quality", "doc_id")
    p = q.withColumn("pctl", F.percent_rank().over(wp))
    return p.select(
        "doc_id",
        "source",
        sround(F.col("quality"), 6).alias("quality"),
        sround(F.col("pctl"), 6).alias("pctl"),
        (F.col("pctl") >= 0.3).alias("keep"),
    )
