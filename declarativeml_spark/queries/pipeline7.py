"""Training-data pipeline operators, part 7 (round 3): in-engine
hash-checked ML.

* ``nb_lang_confusion`` — a multinomial Naive Bayes language
  classifier trained, scored, and evaluated entirely in the engine,
  with the full train→predict→confusion pipeline hash-checked
  against DuckDB: every sufficient statistic is an exact count,
  every log-likelihood is ln() of an exact ratio (the proven
  cross-engine op), and per-document score sums aggregate through
  DECIMAL so shuffle order cannot reorder float additions.

Float conventions follow registry.py; see also
``lineitem_price_ols`` (closed-form OLS) and ``embedding_pca_power``
(power iteration) for the other hash-checked training paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from declarativeml_spark.operators import textops as T
from declarativeml_spark.queries.registry import query, sql_sround, sround
from declarativeml_spark.sources.catalog import load_table

_TOKS_S = T.TOKENS_SPARK.format(text="text")
_TOKS_D = T.TOKENS_DUCK.format(text="text")


@query(
    "nb_lang_confusion",
    oracle=f"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id, lang, unnest({_TOKS_D}) AS w FROM documents
    ),
    cls AS MATERIALIZED (
        SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM tok GROUP BY lang
    ),
    nall AS MATERIALIZED (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM cls),
    tokc AS MATERIALIZED (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY lang, w
    ),
    langtot AS MATERIALIZED (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM tokc GROUP BY lang
    ),
    vocab AS MATERIALIZED (
        SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tok
    ),
    loglik AS MATERIALIZED (
        SELECT t.lang, t.w,
               ln((CAST(t.c AS DOUBLE) + 1.0)
                  / (CAST(lt.tot AS DOUBLE) + vv.v)) AS ll
        FROM tokc t JOIN langtot lt USING (lang) CROSS JOIN vocab vv
    ),
    scored AS MATERIALIZED (
        SELECT d.doc_id, d.lang AS actual_lang, m.lang AS model_lang,
               ln(CAST(c2.n_docs AS DOUBLE) / na.n)
                 + CAST(SUM(CAST(
                       COALESCE(l.ll,
                                ln(1.0 / (CAST(m.tot AS DOUBLE) + vv.v)))
                       AS DECIMAL(38,12))) AS DOUBLE) AS score
        FROM tok d
        CROSS JOIN langtot m
        CROSS JOIN vocab vv
        CROSS JOIN nall na
        JOIN cls c2 ON c2.lang = m.lang
        LEFT JOIN loglik l ON l.lang = m.lang AND l.w = d.w
        GROUP BY d.doc_id, d.lang, m.lang, c2.n_docs, na.n, m.tot, vv.v
    ),
    pred AS MATERIALIZED (
        SELECT doc_id, actual_lang, model_lang AS pred_lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, model_lang) AS rn
        FROM scored
    )
    SELECT actual_lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {sql_sround(
               'CAST(SUM(CASE WHEN actual_lang = pred_lang THEN 1 ELSE 0'
               ' END) AS DOUBLE) / COUNT(*)', 6)} AS hit_rate
    FROM pred WHERE rn = 1
    GROUP BY actual_lang, pred_lang
    """,
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier — trained on the
    corpus's own (text, lang) pairs, scored over every document, and
    reported as a train-set confusion matrix — entirely in-engine
    and hash-checked: the sufficient statistics are exact counts,
    each Laplace-smoothed log-likelihood is ln() of an exact ratio
    (the cross-engine-identical op), and per-document score sums go
    through DECIMAL(38,12) so shuffle order cannot perturb the
    argmax. Ties break on the language name.

    Scale: training is two counting aggregations (class priors,
    per-class token counts). Scoring fans each token occurrence out
    by n_classes (a constant) and joins the class-conditional table
    on (lang, token) — broadcastable while vocab × classes stays
    dimension-sized; per-document partial sums combine map-side.
    The argmax windows within one document only.
    """
    # NOT persisted (r11 measured): the exploded token plane feeds
    # four consumers, but three of them collapse map-side immediately
    # over one or two pruned columns — caching forces the FULL
    # (doc_id, lang, w) plane to materialize, which a clean
    # capture/release A/B at sf0.1 measured ~25% SLOWER than letting
    # each consumer recompute its pruned slice (persist medians
    # 2.9-3.1s vs 2.3-2.4s recompute); the one heavy consumer (the
    # scoring fan-out) reads the plane once either way
    tok = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "lang", F.explode(F.expr(_TOKS_S)).alias("w")
    )
    cls = tok.groupBy("lang").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs")
    )
    tokc = tok.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    langtot = tokc.groupBy("lang").agg(F.sum("c").cast("long").alias("tot"))
    v = tok.agg(F.count_distinct("w").cast("long").alias("v"))
    n_all = cls.agg(F.sum("n_docs").cast("long").alias("n"))

    loglik = (
        tokc.join(F.broadcast(langtot), "lang")
        .crossJoin(F.broadcast(v))
        .select(
            "lang",
            "w",
            F.log(
                (F.col("c").cast("double") + 1.0)
                / (F.col("tot").cast("double") + F.col("v"))
            ).alias("ll"),
        )
    )
    model = (
        langtot.select(F.col("lang").alias("model_lang"), "tot")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(n_all))
        .join(
            F.broadcast(cls.select(F.col("lang").alias("model_lang"),
                                   "n_docs")),
            "model_lang",
        )
    )
    default_ll = F.log(1.0 / (F.col("tot").cast("double") + F.col("v")))
    prior = F.log(F.col("n_docs").cast("double") / F.col("n"))
    scored = (
        tok.select("doc_id", F.col("lang").alias("actual_lang"), "w")
        .crossJoin(F.broadcast(model))
        .join(
            F.broadcast(loglik).withColumnRenamed("lang", "model_lang"),
            ["model_lang", "w"],
            "left",
        )
        .groupBy("doc_id", "actual_lang", "model_lang", "tot", "v",
                 "n_docs", "n")
        .agg(
            F.sum(
                F.coalesce(F.col("ll"), default_ll).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("s")
        )
        .select(
            "doc_id",
            "actual_lang",
            "model_lang",
            (prior + F.col("s")).alias("score"),
        )
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), "model_lang"
    )
    pred = scored.withColumn("rn", F.row_number().over(wd)).where(
        F.col("rn") == 1
    )
    return pred.groupBy(
        "actual_lang", F.col("model_lang").alias("pred_lang")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        sround(
            F.sum(
                F.when(F.col("actual_lang") == F.col("model_lang"), 1)
                .otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("hit_rate"),
    )


# ---------------------------------------------------------------------------
# Decision stump: best single split by Gini impurity reduction.

_GINI = "2.0 * ({p}) * (1.0 - ({p}))"


@query(
    "lineitem_decision_stump",
    oracle=f"""
    WITH lab AS (
        SELECT l_quantity AS q,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ),
    per_q AS (
        SELECT q, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM lab GROUP BY q
    ),
    cum AS (
        SELECT q,
               CAST(SUM(n) OVER w AS BIGINT) AS n_le,
               CAST(SUM(pos) OVER w AS BIGINT) AS pos_le,
               CAST(SUM(n) OVER () AS BIGINT) AS n_all,
               CAST(SUM(pos) OVER () AS BIGINT) AS pos_all
        FROM per_q
        WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    scored AS (
        SELECT q AS threshold, n_le, n_all - n_le AS n_gt,
               (CAST(n_le AS DOUBLE)
                  * ({_GINI.format(p='CAST(pos_le AS DOUBLE)'
                                     ' / CAST(n_le AS DOUBLE)')})
                + CAST(n_all - n_le AS DOUBLE)
                  * ({_GINI.format(
                        p='CAST(pos_all - pos_le AS DOUBLE)'
                          ' / CAST(n_all - n_le AS DOUBLE)')}))
                 / CAST(n_all AS DOUBLE) AS wg,
               {_GINI.format(
                   p='CAST(pos_all AS DOUBLE) / CAST(n_all AS DOUBLE)')}
                 AS g0
        FROM cum WHERE n_le > 0 AND n_all - n_le > 0
    )
    SELECT threshold, n_le, n_gt,
           {sql_sround('wg', 6)} AS weighted_gini,
           {sql_sround('g0 - wg', 6)} AS gain
    FROM scored
    ORDER BY wg, threshold LIMIT 1
    """,
)
def lineitem_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training: the best single split of l_quantity
    for predicting returns, by weighted Gini impurity — tree-style
    model fitting whose chosen threshold, impurity, and gain
    hash-match an independent engine.

    Determinism: candidate statistics are exact integer cumulative
    counts over the ~50-row distinct-value aggregate; each
    candidate's Gini is a fixed IEEE op sequence on those integers;
    the argmin breaks ties on the threshold value.

    Scale: one counting pass collapses the fact table to its
    distinct feature values; the split search runs entirely on that
    value plane (the histogram-split strategy XGBoost/LightGBM use).
    The windows order ~50 rows — value-plane, not data-plane.
    """
    lab = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    per_q = lab.groupBy("q").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    wall = Window.partitionBy()
    cum = per_q.select(
        "q",
        F.sum("n").over(w).cast("long").alias("n_le"),
        F.sum("pos").over(w).cast("long").alias("pos_le"),
        F.sum("n").over(wall).cast("long").alias("n_all"),
        F.sum("pos").over(wall).cast("long").alias("pos_all"),
    )
    scored = cum.where(
        (F.col("n_le") > 0) & (F.col("n_all") - F.col("n_le") > 0)
    ).select(
        F.col("q").alias("threshold"),
        "n_le",
        (F.col("n_all") - F.col("n_le")).alias("n_gt"),
        F.expr(
            "(CAST(n_le AS DOUBLE)"
            f"  * ({_GINI.format(p='CAST(pos_le AS DOUBLE) / CAST(n_le AS DOUBLE)')})"
            " + CAST(n_all - n_le AS DOUBLE)"
            f"  * ({_GINI.format(p='CAST(pos_all - pos_le AS DOUBLE) / CAST(n_all - n_le AS DOUBLE)')}))"
            " / CAST(n_all AS DOUBLE)"
        ).alias("wg"),
        F.expr(
            _GINI.format(p="CAST(pos_all AS DOUBLE) / CAST(n_all AS DOUBLE)")
        ).alias("g0"),
    )
    return (
        scored.select(
            "threshold",
            "n_le",
            "n_gt",
            sround(F.col("wg")).alias("weighted_gini"),
            sround(F.col("g0") - F.col("wg")).alias("gain"),
            F.col("wg").alias("__wg_raw"),
        )
        # argmin on the RAW gini, matching the oracle's ORDER BY wg —
        # ordering on the rounded column could pick a different row
        # than DuckDB when two splits tie within the rounding quantum
        .orderBy(F.col("__wg_raw"), "threshold")
        .limit(1)
        .drop("__wg_raw")
    )


# ---------------------------------------------------------------------------
# Mutual information between a bucketed feature and the label.


@query(
    "lineitem_feature_mi",
    oracle=f"""
    WITH cells AS (
        SELECT CAST(floor(l_quantity / 10.0) AS BIGINT) AS qb,
               l_returnflag AS y,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM cells),
    mx AS (SELECT qb, CAST(SUM(n) AS BIGINT) AS nx FROM cells GROUP BY qb),
    my AS (SELECT y, CAST(SUM(n) AS BIGINT) AS ny FROM cells GROUP BY y),
    terms AS (
        SELECT c.qb, c.y,
               CAST(c.n AS DOUBLE) / tt.nt
                 * ln((CAST(c.n AS DOUBLE) * tt.nt)
                      / (CAST(x.nx AS DOUBLE) * y2.ny)) AS t
        FROM cells c
        JOIN mx x USING (qb) JOIN my y2 USING (y) CROSS JOIN tot tt
    ),
    hy AS (
        SELECT CAST(SUM(CAST(
                 -(CAST(ny AS DOUBLE) / tt.nt)
                   * ln(CAST(ny AS DOUBLE) / tt.nt) AS DECIMAL(38,12)))
               AS DOUBLE) AS h
        FROM my CROSS JOIN tot tt
    )
    SELECT CAST((SELECT nt FROM tot) AS BIGINT) AS n_rows,
           {sql_sround(
               '(SELECT CAST(SUM(CAST(t AS DECIMAL(38,12))) AS DOUBLE)'
               ' FROM terms)', 6)} AS mi_nats,
           {sql_sround(
               '(SELECT CAST(SUM(CAST(t AS DECIMAL(38,12))) AS DOUBLE)'
               ' FROM terms) / (SELECT h FROM hy)', 6)}
             AS mi_over_hy
    """,
)
def lineitem_feature_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the bucketed quantity feature and
    the return flag (plus the H(Y)-normalized form) — the
    model-free feature-relevance score feature selection starts
    from, computed from exact contingency counts.

    Determinism: every probability is a ratio of exact integers;
    each MI term is a fixed IEEE sequence ending in ln(); term sums
    go through DECIMAL(38,12) so shuffle order cannot reorder them.

    Scale: one counting pass collapses the table to the (buckets ×
    classes) contingency plane; margins and the MI sum run there.
    """
    # NOT persisted (r12 revert of the r11 persist): the contingency
    # counts' consumers are identical subtrees whose shuffle
    # ReuseExchange-dedupes at execution — the sf1 A/B measured the
    # persist ~1.3x slower (on 1.00 s / off 0.75 s median), sf0.1 a
    # wash
    cells = (
        load_table(spark, sf_dir, "lineitem").groupBy(
            F.expr("CAST(floor(l_quantity / 10.0) AS BIGINT)").alias("qb"),
            F.col("l_returnflag").alias("y"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = cells.agg(F.sum("n").cast("long").alias("nt"))
    mx = cells.groupBy("qb").agg(F.sum("n").cast("long").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("n").cast("long").alias("ny"))
    terms = (
        cells.join(F.broadcast(mx), "qb")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                F.col("n").cast("double") / F.col("nt")
                * F.log(
                    (F.col("n").cast("double") * F.col("nt"))
                    / (F.col("nx").cast("double") * F.col("ny"))
                )
            ).alias("t")
        )
    )
    mi = terms.agg(
        F.sum(F.col("t").cast("decimal(38,12)")).cast("double").alias("mi")
    )
    py = F.col("ny").cast("double") / F.col("nt")
    hy = (
        my.crossJoin(F.broadcast(tot))
        .select((-py * F.log(py)).alias("t"))
        .agg(
            F.sum(F.col("t").cast("decimal(38,12)"))
            .cast("double")
            .alias("h")
        )
    )
    return (
        mi.crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("nt").alias("n_rows"),
            sround(F.col("mi")).alias("mi_nats"),
            sround(F.col("mi") / F.col("h")).alias("mi_over_hy"),
        )
    )


# ---------------------------------------------------------------------------
# Pairwise Welch t-tests between customer segments.


@query(
    "segment_spend_ttest",
    oracle=f"""
    WITH m AS (
        SELECT c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS s1,
               CAST(SUM(CAST(o_totalprice * o_totalprice
                             AS DECIMAL(38,6))) AS DOUBLE) AS s2
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    ),
    stats AS (
        SELECT seg, n, s1 / n AS mean,
               (s2 - s1 * s1 / n) / (n - 1.0) AS var
        FROM m WHERE n > 1
    )
    SELECT a.seg AS seg_a, b.seg AS seg_b, a.n AS n_a, b.n AS n_b,
           {sql_sround('a.mean - b.mean', 4)} AS mean_diff,
           {sql_sround(
               '(a.mean - b.mean)'
               ' / sqrt(a.var / a.n + b.var / b.n)', 6)} AS welch_t
    FROM stats a JOIN stats b ON a.seg < b.seg
    """,
)
def segment_spend_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Welch t-statistics for mean order value between every
    pair of customer segments — the significance readout an A/B or
    segmentation analysis ends with (the engine's DEPLOY … TRAFFIC
    SPLIT statement is the experiment side; this is the evaluation
    side).

    Determinism: per-segment moments aggregate through DECIMAL; mean,
    variance, and the t-statistic are fixed IEEE sequences on those
    moments. Segments pair by name inequality, so each pair appears
    once with a stable orientation.

    Scale: one broadcast-dim join + counting pass collapses the fact
    table to one moment row per segment; the pairwise join runs on
    the segments² plane.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("s1"),
            F.sum(
                (F.col("o_totalprice") * F.col("o_totalprice")).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("s2"),
        )
    )
    stats = m.where(F.col("n") > 1).select(
        "seg",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1.0)
        ).alias("var"),
    )
    a = stats.select(
        F.col("seg").alias("seg_a"), F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"), F.col("var").alias("var_a"),
    )
    b = stats.select(
        F.col("seg").alias("seg_b"), F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"), F.col("var").alias("var_b"),
    )
    j = a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    return j.select(
        "seg_a",
        "seg_b",
        "n_a",
        "n_b",
        sround(F.col("mean_a") - F.col("mean_b"), 4).alias("mean_diff"),
        sround(t).alias("welch_t"),
    )


# ---------------------------------------------------------------------------
# Change-point detection: best binary segmentation of each hourly
# event-count series.


@query(
    "events_change_points",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, hour, n,
               CAST(SUM(n) OVER w AS BIGINT) AS s_le,
               CAST(SUM(n * n) OVER w AS BIGINT) AS q_le,
               CAST(COUNT(*) OVER w AS BIGINT) AS k_le,
               CAST(SUM(n) OVER p AS BIGINT) AS s_all,
               CAST(SUM(n * n) OVER p AS BIGINT) AS q_all,
               CAST(COUNT(*) OVER p AS BIGINT) AS k_all
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               p AS (PARTITION BY event_type)
    ),
    scored AS (
        SELECT event_type, hour, k_le, k_all,
               CAST(s_le AS DOUBLE) * s_le / k_le
                 + CAST(s_all - s_le AS DOUBLE) * (s_all - s_le)
                   / (k_all - k_le)
                 - CAST(s_all AS DOUBLE) * s_all / k_all AS gain,
               CAST(s_le AS DOUBLE) / k_le AS mean_before,
               CAST(s_all - s_le AS DOUBLE) / (k_all - k_le) AS mean_after
        FROM cum WHERE k_le < k_all
    ),
    best AS (
        SELECT event_type, hour, gain, mean_before, mean_after,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY gain DESC, hour) AS rn
        FROM scored
    )
    SELECT event_type, hour AS change_hour,
           {sql_sround('gain', 4)} AS sse_reduction,
           {sql_sround('mean_before', 6)} AS mean_before,
           {sql_sround('mean_after', 6)} AS mean_after
    FROM best WHERE rn = 1
    """,
)
def events_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection per event type: the hour that
    maximally reduces the hourly-count series' squared error when
    split into two constant segments (binary segmentation, the base
    step of PELT-style detectors) — where did this metric's level
    actually shift.

    Determinism: all cumulative moments are exact integers from the
    hourly plane; the SSE-reduction gain is a fixed IEEE sequence on
    them; the argmax breaks ties on the hour.

    Scale: the raw log collapses to (type, hour) counts in one pass;
    cumulative windows and the argmax partition by event type on
    that aggregate plane.
    """
    hourly = load_table(spark, sf_dir, "events").groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = Window.partitionBy("event_type")
    cum = hourly.select(
        "event_type",
        "hour",
        F.sum("n").over(w).cast("long").alias("s_le"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("long").alias("q_le"),
        F.count(F.lit(1)).over(w).cast("long").alias("k_le"),
        F.sum("n").over(p).cast("long").alias("s_all"),
        F.sum(F.col("n") * F.col("n")).over(p).cast("long").alias("q_all"),
        F.count(F.lit(1)).over(p).cast("long").alias("k_all"),
    )
    s_gt = F.col("s_all") - F.col("s_le")
    k_gt = F.col("k_all") - F.col("k_le")
    gain = (
        F.col("s_le").cast("double") * F.col("s_le") / F.col("k_le")
        + s_gt.cast("double") * s_gt / k_gt
        - F.col("s_all").cast("double") * F.col("s_all") / F.col("k_all")
    )
    scored = cum.where(F.col("k_le") < F.col("k_all")).select(
        "event_type",
        "hour",
        gain.alias("gain"),
        (F.col("s_le").cast("double") / F.col("k_le")).alias("mean_before"),
        (s_gt.cast("double") / k_gt).alias("mean_after"),
    )
    rb = Window.partitionBy("event_type").orderBy(
        F.col("gain").desc(), "hour"
    )
    return (
        scored.withColumn("rn", F.row_number().over(rb))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour").alias("change_hour"),
            sround(F.col("gain"), 4).alias("sse_reduction"),
            sround(F.col("mean_before")).alias("mean_before"),
            sround(F.col("mean_after")).alias("mean_after"),
        )
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer-spend concentration per nation.


@query(
    "nation_revenue_gini",
    oracle=f"""
    WITH spend AS (
        SELECT n_name, c.c_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) * 1000000
                    AS BIGINT) AS v
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT n_name, v,
               ROW_NUMBER() OVER (PARTITION BY n_name
                                  ORDER BY v, c_custkey) AS i,
               COUNT(*) OVER (PARTITION BY n_name) AS k,
               CAST(SUM(v) OVER (PARTITION BY n_name) AS BIGINT) AS tv
        FROM spend
    )
    SELECT n_name,
           CAST(MAX(k) AS BIGINT) AS n_customers,
           {sql_sround(
               '(2.0 * CAST(SUM(i * v) AS DOUBLE)'
               ' / (CAST(MAX(k) AS DOUBLE) * MAX(tv)))'
               ' - (CAST(MAX(k) AS DOUBLE) + 1.0) / MAX(k)', 6)} AS gini
    FROM ranked GROUP BY n_name
    """,
)
def nation_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-spend concentration within each
    nation — how unequal the revenue base is, the concentration-risk
    readout behind account-dependency analysis (a Gini near 1 means
    a few whales fund the nation).

    Determinism: spend is DECIMAL-exact in integer micro-units; the
    rank-weighted sum Σ i·v is exact integer arithmetic; the Gini
    formula is a fixed IEEE sequence on those integers. Ranks order
    by (v, custkey), so ties cannot reorder.

    Scale: one fact aggregation to (nation, customer) rows; ranking
    windows partition by nation on that customer plane (1e8 rows per
    nation before ordered.py's two-phase rank is needed — the same
    documented swap as customer_rfm_segments).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(na), c.c_nationkey == na.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(38,6)")) * 1000000)
            .cast("long")
            .alias("v")
        )
    )
    wn = Window.partitionBy("n_name")
    ranked = spend.select(
        "n_name",
        "v",
        F.row_number().over(wn.orderBy("v", "c_custkey")).alias("i"),
        F.count(F.lit(1)).over(wn).alias("k"),
        F.sum("v").over(wn).cast("long").alias("tv"),
    )
    return ranked.groupBy("n_name").agg(
        F.max("k").cast("long").alias("n_customers"),
        sround(
            # decimal sum: i*v summed over a group overflows int64
            # around TPC-H sf10 (rank x cents both grow with rows)
            2.0
            * F.sum(F.col("i").cast("decimal(38,0)") * F.col("v")).cast(
                "double"
            )
            / (F.max("k").cast("double") * F.max("tv"))
            - (F.max("k").cast("double") + 1.0) / F.max("k")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation of the hourly event-count series (lags 1-3).


@query(
    "events_autocorrelation",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    hours AS (SELECT DISTINCT hour FROM hourly),
    types AS (SELECT DISTINCT event_type FROM hourly),
    grid AS (
        SELECT t.event_type, h.hour, COALESCE(x.n, 0) AS n
        FROM hours h CROSS JOIN types t
        LEFT JOIN hourly x
          ON x.hour = h.hour AND x.event_type = t.event_type
    ),
    led AS (
        SELECT event_type, n,
               LEAD(n, 1) OVER w AS n1,
               LEAD(n, 2) OVER w AS n2,
               LEAD(n, 3) OVER w AS n3
        FROM grid
        WINDOW w AS (PARTITION BY event_type ORDER BY hour)
    ),
    stacked AS (
        SELECT event_type, CAST(1 AS BIGINT) AS lag, n AS x, n1 AS y
        FROM led WHERE n1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2, n, n2 FROM led WHERE n2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3, n, n3 FROM led WHERE n3 IS NOT NULL
    ),
    m AS (
        SELECT event_type, lag,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM stacked GROUP BY 1, 2
    )
    SELECT event_type, lag, k AS n_pairs,
           CASE WHEN k * sxx - sx * sx = 0 OR k * syy - sy * sy = 0
                THEN NULL
                ELSE {sql_sround(
                    'CAST(k * sxy - sx * sy AS DOUBLE)'
                    ' / (sqrt(CAST(k * sxx - sx * sx AS DOUBLE))'
                    ' * sqrt(CAST(k * syy - sy * sy AS DOUBLE)))', 6)}
           END AS acf
    FROM m
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..3 autocorrelation of each event type's zero-filled
    hourly count series — does this metric have short-range memory
    (bursty) or is it hour-to-hour independent; the stationarity
    probe read before picking anomaly/forecast baselines.

    Determinism: exact integer moments over lagged pairs
    (events_hourly_corr's recipe along the time axis); variance-zero
    series yield NULL.

    Scale: the log collapses to the dense hour×type grid; LEAD
    windows within one event type on that plane.
    """
    from declarativeml_spark.operators.caching import track_persist

    # persisted: the hourly aggregate (a full events scan + shuffle)
    # feeds THREE consumers (hour spine, type spine, grid join) —
    # unpersisted it ran 3x; the cached plane is tiny (types x hours)
    hourly = track_persist(
        load_table(spark, sf_dir, "events").groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    hours = hourly.select("hour").distinct()
    types = hourly.select("event_type").distinct()
    grid = (
        hours.crossJoin(F.broadcast(types))
        .join(F.broadcast(hourly), ["hour", "event_type"], "left")
        .select("event_type", "hour", F.coalesce("n", F.lit(0)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    led = grid.select(
        "event_type",
        "n",
        *[F.lead("n", k).over(w).alias(f"n{k}") for k in (1, 2, 3)],
    )
    # one evaluation of the window: explode the three lags per row
    # (three unionByName legs re-ran the grid join + window 3x — the
    # _knn_frame symmetrization pattern; groupBy below is
    # order-insensitive and the sums are exact integers)
    stacked = led.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col("n").alias("x"),
                        F.col(f"n{k}").alias("y"),
                    )
                    for k in (1, 2, 3)
                ]
            )
        ).alias("p"),
    ).select(
        "event_type", "p.lag", "p.x", "p.y"
    ).where(F.col("y").isNotNull())
    m = stacked.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    vx = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")
    acf = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
    return m.select(
        "event_type",
        "lag",
        F.col("k").alias("n_pairs"),
        F.when((vx == 0) | (vy == 0), F.lit(None))
        .otherwise(sround(acf))
        .alias("acf"),
    )


# ---------------------------------------------------------------------------
# Cluster topic labeling: c-TF-IDF top terms per embedding label.


_CT_TOPK = 5


@query(
    "cluster_top_terms",
    oracle=f"""
    WITH joined AS (
        SELECT e.label, unnest({_TOKS_D}) AS w
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    tf AS (
        SELECT label, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM joined GROUP BY 1, 2
    ),
    cls AS (SELECT label, CAST(SUM(c) AS BIGINT) AS tot FROM tf GROUP BY 1),
    corpus AS (
        SELECT w, CAST(SUM(c) AS BIGINT) AS fw FROM tf GROUP BY w
    ),
    atot AS (
        SELECT CAST(SUM(c) AS DOUBLE) / COUNT(DISTINCT label) AS a FROM tf
    ),
    scored AS (
        SELECT t.label, t.w,
               (CAST(t.c AS DOUBLE) / cl.tot)
                 * ln(1.0 + aa.a / co.fw) AS score
        FROM tf t
        JOIN cls cl USING (label)
        JOIN corpus co USING (w)
        CROSS JOIN atot aa
    ),
    ranked AS (
        SELECT label, w, score,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY score DESC, w) AS rn
        FROM scored
    )
    SELECT label, CAST(rn AS BIGINT) AS rank, w AS term,
           {sql_sround('score', 6)} AS ctfidf
    FROM ranked WHERE rn <= {_CT_TOPK}
    """,
)
def cluster_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic labels for embedding clusters: the BERTopic-style
    c-TF-IDF top terms per label, computed over the documents ⋈
    embeddings cross-modal join — the step that turns anonymous
    cluster ids into human-readable topics after semantic dedup or
    SemDeDup cell assignment.

    Determinism: term and class frequencies are exact counts; each
    score is (tf share) × ln(1 + A/f_w) — fixed IEEE ops ending in
    the proven-identical ln(); per-label rank breaks ties on the
    term.

    Scale: one id-equi-join (both sides shuffle-or-broadcast on the
    shared key), one (label, term) counting pass, then everything
    runs on the vocab×labels plane with the corpus margins broadcast.
    """
    d = load_table(spark, sf_dir, "documents", spread=True)
    e = load_table(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id).select(
        "label", F.explode(F.expr(_TOKS_S)).alias("w")
    )
    # NOT persisted (r12 revert of the r11 persist): the (label,
    # term) count consumers are identical subtrees whose shuffle
    # ReuseExchange-dedupes at execution — the sf1 A/B measured the
    # persist ~1.3x slower (on 1.52 s / off 1.21 s median), sf0.1 a
    # wash
    tf = joined.groupBy("label", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cls = tf.groupBy("label").agg(F.sum("c").cast("long").alias("tot"))
    corpus = tf.groupBy("w").agg(F.sum("c").cast("long").alias("fw"))
    atot = tf.agg(
        (
            F.sum("c").cast("double") / F.count_distinct("label")
        ).alias("a")
    )
    scored = (
        tf.join(F.broadcast(cls), "label")
        .join(corpus, "w")
        .crossJoin(F.broadcast(atot))
        .select(
            "label",
            "w",
            (
                (F.col("c").cast("double") / F.col("tot"))
                * F.log(1.0 + F.col("a") / F.col("fw"))
            ).alias("score"),
        )
    )
    wr = Window.partitionBy("label").orderBy(F.col("score").desc(), "w")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= _CT_TOPK)
        .select(
            "label",
            F.col("rn").cast("long").alias("rank"),
            F.col("w").alias("term"),
            sround(F.col("score")).alias("ctfidf"),
        )
    )


# ---------------------------------------------------------------------------
# Retention half-life: log-linear decay fit of the retention curve.


@query(
    "retention_half_life",
    oracle=f"""
    WITH f AS (
        SELECT user_id, CAST(MIN(ts) AS DATE) AS first_day
        FROM events GROUP BY user_id
    ),
    n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
    offs AS (
        SELECT DISTINCT e.user_id,
               CAST(FLOOR(datediff('day', f.first_day, CAST(e.ts AS DATE))
                          / 7.0) AS BIGINT) AS w
        FROM events e JOIN f ON e.user_id = f.user_id
    ),
    curve AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_ret
        FROM offs WHERE w >= 1 GROUP BY w
    ),
    pts AS (
        SELECT CAST(w AS DOUBLE) AS x,
               ln(CAST(n_ret AS DOUBLE) / nn.n) AS y
        FROM curve CROSS JOIN n0 nn
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy
        FROM pts
    )
    SELECT k AS n_points,
           {sql_sround(
               '(k * sxy - sx * sy) / (k * sxx - sx * sx)', 6)} AS slope,
           CASE WHEN (k * sxy - sx * sy) / (k * sxx - sx * sx) >= 0
                THEN NULL
                ELSE {sql_sround(
                    '-ln(2.0) / ((k * sxy - sx * sy)'
                    ' / (k * sxx - sx * sx))', 4)}
           END AS half_life_weeks
    FROM m WHERE k > 1 AND k * sxx - sx * sx <> 0
    """,
)
def retention_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: fit ln(retained share) against the week
    offset with OLS and convert the decay slope to a half-life — the
    single number a growth model wants from the retention triangle
    (NULL if retention doesn't decay).

    Determinism: the curve's points are ln() of exact user-count
    ratios; regression moments aggregate through DECIMAL; the solve
    is a fixed IEEE sequence.

    Scale: one per-user MIN pass (broadcast back), one distinct
    (user, offset) aggregation, then everything runs on the
    ~weeks-row curve.
    """
    from declarativeml_spark.operators.caching import track_persist

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    # persisted: the per-user first-day aggregate (full events scan +
    # shuffle) feeds BOTH the cohort-size count and the offsets join
    # — unpersisted it ran twice; the cached plane is one row per user
    f = track_persist(
        ev.groupBy("user_id").agg(
            F.min("ts").cast("date").alias("first_day")
        )
    )
    n0 = f.agg(F.count(F.lit(1)).cast("long").alias("n"))
    offs = (
        ev.join(f, "user_id")
        .select(
            "user_id",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("first_day"))
                / 7.0
            )
            .cast("long")
            .alias("w"),
        )
        .distinct()
    )
    curve = offs.where(F.col("w") >= 1).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_ret")
    )
    pts = curve.crossJoin(F.broadcast(n0)).select(
        F.col("w").cast("double").alias("x"),
        F.log(F.col("n_ret").cast("double") / F.col("n")).alias("y"),
    )

    def d12(c):
        return F.sum(c.cast("decimal(38,12)")).cast("double")

    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        d12(F.col("x")).alias("sx"),
        d12(F.col("x") * F.col("x")).alias("sxx"),
        d12(F.col("y")).alias("sy"),
        d12(F.col("x") * F.col("y")).alias("sxy"),
    )
    det = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / det
    return m.where((F.col("k") > 1) & (det != 0)).select(
        F.col("k").alias("n_points"),
        sround(slope).alias("slope"),
        F.when(slope >= 0, F.lit(None))
        .otherwise(sround(-F.log(F.lit(2.0)) / slope, 4))
        .alias("half_life_weeks"),
    )


# ---------------------------------------------------------------------------
# Forecast backtest: naive vs seasonal-naive MAE on monthly revenue.


@query(
    "orders_forecast_backtest",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(date_part('year', o_orderdate) * 12
                    + date_part('month', o_orderdate) - 1 AS BIGINT) AS mx,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS rev
        FROM orders GROUP BY 1
    ),
    led AS (
        SELECT mx, rev,
               LAG(rev, 1) OVER (ORDER BY mx) AS prev1,
               LAG(rev, 12) OVER (ORDER BY mx) AS prev12
        FROM monthly
    ),
    scored AS (
        SELECT mx, abs(rev - prev1) AS e1, abs(rev - prev12) AS e12
        FROM led WHERE prev1 IS NOT NULL AND prev12 IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
           {sql_sround(
               'CAST(SUM(CAST(e1 AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)',
               4)} AS mae_naive,
           {sql_sround(
               'CAST(SUM(CAST(e12 AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)',
               4)} AS mae_seasonal_naive,
           {sql_sround(
               '(CAST(SUM(CAST(e12 AS DECIMAL(38,6))) AS DOUBLE)'
               ' / COUNT(*))'
               ' / (CAST(SUM(CAST(e1 AS DECIMAL(38,6))) AS DOUBLE)'
               ' / COUNT(*))', 6)} AS seasonal_vs_naive
    FROM scored
    """,
)
def orders_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest on monthly revenue: mean absolute
    error of the naive (last month) vs seasonal-naive (same month
    last year) forecasters over the months where both apply — the
    sanity benchmark any real forecasting model must beat, and the
    evaluation twin of the TRAIN … FORECAST statement.

    Determinism: monthly revenue is DECIMAL-exact; per-month absolute
    errors are single IEEE ops; error sums aggregate through DECIMAL.

    Scale: the fact table collapses to one row per month; lags and
    MAE run on that bounded series (LAG windows over the months
    plane — metadata-sized forever).
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("mx")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("rev")
    )
    w = Window.orderBy("mx")
    led = monthly.select(
        "mx",
        "rev",
        F.lag("rev", 1).over(w).alias("prev1"),
        F.lag("rev", 12).over(w).alias("prev12"),
    )
    scored = led.where(
        F.col("prev1").isNotNull() & F.col("prev12").isNotNull()
    ).select(
        F.abs(F.col("rev") - F.col("prev1")).alias("e1"),
        F.abs(F.col("rev") - F.col("prev12")).alias("e12"),
    )

    def d6avg(c):
        return F.sum(c.cast("decimal(38,6)")).cast("double") / F.count(
            F.lit(1)
        )

    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        sround(d6avg(F.col("e1")), 4).alias("mae_naive"),
        sround(d6avg(F.col("e12")), 4).alias("mae_seasonal_naive"),
        sround(d6avg(F.col("e12")) / d6avg(F.col("e1"))).alias(
            "seasonal_vs_naive"
        ),
    )


# ---------------------------------------------------------------------------
# Burstiness (Fano factor) of hourly event counts per type.


@query(
    "events_fano_factor",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    hours AS (SELECT DISTINCT hour FROM hourly),
    types AS (SELECT DISTINCT event_type FROM hourly),
    grid AS (
        SELECT t.event_type, COALESCE(x.n, 0) AS n
        FROM hours h CROSS JOIN types t
        LEFT JOIN hourly x
          ON x.hour = h.hour AND x.event_type = t.event_type
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS s,
               CAST(SUM(n * n) AS BIGINT) AS q
        FROM grid GROUP BY event_type
    )
    SELECT event_type, k AS n_hours,
           {sql_sround('CAST(s AS DOUBLE) / k', 6)} AS mean_per_hour,
           CASE WHEN s = 0 THEN NULL
                ELSE {sql_sround(
                    '((CAST(q AS DOUBLE)'
                    ' - CAST(s AS DOUBLE) * s / k) / k)'
                    ' / (CAST(s AS DOUBLE) / k)', 6)}
           END AS fano
    FROM m
    """,
)
def events_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of each event type's hourly arrivals: the Fano
    factor (variance / mean of the zero-filled hourly counts). 1 ≈
    Poisson arrivals; ≫1 means bursts — the dispersion statistic
    capacity planning and anomaly thresholds should be conditioned
    on (a z-score threshold tuned on Poisson traffic misfires on
    bursty traffic).

    Determinism: population variance and mean come from exact integer
    moments on the dense hour×type grid.

    Scale: one counting pass to the grid; moments per type are
    map-side-combinable integer sums.
    """
    # NOT persisted (r12 revert of the r11 persist): the hourly
    # aggregate's consumers are identical subtrees whose shuffle
    # ReuseExchange-dedupes at execution — the sf1 A/B measured the
    # persist ~1.6x slower (on 1.09 s / off 0.67 s median), sf0.1 a
    # wash
    hourly = (
        load_table(spark, sf_dir, "events").groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    hours = hourly.select("hour").distinct()
    types = hourly.select("event_type").distinct()
    grid = (
        hours.crossJoin(F.broadcast(types))
        .join(F.broadcast(hourly), ["hour", "event_type"], "left")
        .select("event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )
    m = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("k")
    var = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("k")
    ) / F.col("k")
    return m.select(
        "event_type",
        F.col("k").alias("n_hours"),
        sround(mean).alias("mean_per_hour"),
        F.when(F.col("s") == 0, F.lit(None))
        .otherwise(sround(var / mean))
        .alias("fano"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman supplier concentration per part type.


@query(
    "parttype_supplier_hhi",
    oracle=f"""
    WITH rev AS (
        SELECT p.p_type AS ptype, l.l_suppkey AS sk,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS v
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT ptype, CAST(SUM(v) AS BIGINT) AS tv,
               CAST(COUNT(*) AS BIGINT) AS n_sup
        FROM rev GROUP BY ptype
    ),
    terms AS (
        SELECT r.ptype,
               (CAST(r.v AS DOUBLE) / t.tv)
                 * (CAST(r.v AS DOUBLE) / t.tv) AS sq
        FROM rev r JOIN tot t USING (ptype)
    )
    SELECT t.ptype AS p_type, t.n_sup AS n_suppliers,
           {sql_sround(
               'CAST(SUM(CAST(x.sq AS DECIMAL(38,12))) AS DOUBLE)', 6)}
             AS hhi
    FROM terms x JOIN tot t USING (ptype)
    GROUP BY t.ptype, t.n_sup
    """,
)
def parttype_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per part type: the Herfindahl-Hirschman
    index (sum of squared revenue shares) — the supply-chain-risk
    twin of nation_revenue_gini (HHI near 1 means a single supplier
    owns the category).

    Determinism: shares are ratios of DECIMAL-exact micro-unit
    integers; each squared share is one IEEE sequence; the HHI sum
    aggregates through DECIMAL(38,12).

    Scale: one fact aggregation to (type, supplier) rows; all index
    math runs on that plane with the per-type totals joined back.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_type").alias("ptype"), F.col("l_suppkey"))
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(38,6)")
                )
                * 1000000
            )
            .cast("long")
            .alias("v")
        )
    )
    tot = rev.groupBy("ptype").agg(
        F.sum("v").cast("long").alias("tv"),
        F.count(F.lit(1)).cast("long").alias("n_sup"),
    )
    share = F.col("v").cast("double") / F.col("tv")
    terms = rev.join(F.broadcast(tot), "ptype").select(
        "ptype", "n_sup", (share * share).alias("sq")
    )
    return terms.groupBy(
        F.col("ptype").alias("p_type"), F.col("n_sup").alias("n_suppliers")
    ).agg(
        sround(
            F.sum(F.col("sq").cast("decimal(38,12)")).cast("double")
        ).alias("hhi")
    )


# ---------------------------------------------------------------------------
# Zipf's-law fit of the token frequency distribution.

_ZIPF_TOPN = 200


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({_TOKS_D}) AS w FROM documents
    ),
    freq AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w
    ),
    ranked AS (
        SELECT w, c,
               ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r
        FROM freq
    ),
    pts AS (
        SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
        FROM ranked WHERE r <= {_ZIPF_TOPN}
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
        FROM pts
    )
    SELECT k AS n_ranks,
           {sql_sround(
               '-(k * sxy - sx * sy) / (k * sxx - sx * sx)', 6)}
             AS zipf_exponent,
           {sql_sround(
               '(k * sxy - sx * sy) * (k * sxy - sx * sy)'
               ' / ((k * sxx - sx * sx) * (k * syy - sy * sy))', 6)}
             AS r_squared
    FROM m WHERE k > 1 AND k * sxx - sx * sx <> 0
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS slope of
    log-frequency against log-rank over the top ranks — natural text
    sits near exponent 1; a flat or broken slope is the signature of
    templated/synthetic text, making this a corpus-authenticity
    check alongside the Benford audit for numbers.

    Determinism: ranks order by (count, token); each point is ln()
    of an exact integer; regression moments aggregate through
    DECIMAL.

    Scale: one token-count aggregation; the rank cut is a TakeOrdered
    over the vocab plane, and the fit runs on ≤{_ZIPF_TOPN} points.
    """
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.expr(_TOKS_S)).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    top = freq.orderBy(F.col("c").desc(), "w").limit(_ZIPF_TOPN)
    wr = Window.orderBy(F.col("c").desc(), "w")
    pts = top.withColumn("r", F.row_number().over(wr)).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )

    def d12(c):
        return F.sum(c.cast("decimal(38,12)")).cast("double")

    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        d12(F.col("x")).alias("sx"),
        d12(F.col("x") * F.col("x")).alias("sxx"),
        d12(F.col("y")).alias("sy"),
        d12(F.col("x") * F.col("y")).alias("sxy"),
        d12(F.col("y") * F.col("y")).alias("syy"),
    )
    det = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    cov = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    vy = F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.where((F.col("k") > 1) & (det != 0)).select(
        F.col("k").alias("n_ranks"),
        sround(-cov / det).alias("zipf_exponent"),
        sround(cov * cov / (det * vy)).alias("r_squared"),
    )


# ---------------------------------------------------------------------------
# Entropy rate of the event-type Markov chain.


@query(
    "events_transition_entropy",
    oracle=f"""
    WITH seq AS (
        SELECT event_type, ts, event_id, user_id,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS a, next_type AS b,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    ma AS (SELECT a, CAST(SUM(n) AS BIGINT) AS na FROM trans GROUP BY a),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM trans),
    hcond AS (
        SELECT CAST(SUM(CAST(
                 -(CAST(t.n AS DOUBLE) / tt.nt)
                   * ln(CAST(t.n AS DOUBLE) / m2.na)
                 AS DECIMAL(38,12))) AS DOUBLE) AS h
        FROM trans t JOIN ma m2 USING (a) CROSS JOIN tot tt
    ),
    hmarg AS (
        SELECT CAST(SUM(CAST(
                 -(CAST(na AS DOUBLE) / tt.nt)
                   * ln(CAST(na AS DOUBLE) / tt.nt)
                 AS DECIMAL(38,12))) AS DOUBLE) AS h
        FROM ma CROSS JOIN tot tt
    )
    SELECT (SELECT nt FROM tot) AS n_transitions,
           {sql_sround('(SELECT h FROM hcond)', 6)} AS entropy_rate_nats,
           {sql_sround('(SELECT h FROM hmarg)', 6)} AS marginal_entropy,
           {sql_sround(
               '(SELECT h FROM hmarg) - (SELECT h FROM hcond)', 6)}
             AS predictability_gain
    """,
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the event-type Markov chain: the conditional
    entropy H(next | current) against the marginal entropy H(next) —
    the information-theoretic ceiling for any next-action predictor
    (the gain is how much knowing the current step helps at all).

    Determinism: all probabilities are ratios of exact transition
    counts; entropy terms end in ln() and sum through
    DECIMAL(38,12).

    Scale: one user_id shuffle for LEAD; everything after runs on
    the types² transition plane.
    """
    from declarativeml_spark.operators.caching import track_persist

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).where(F.col("b").isNotNull())
    # persisted: the transition counts (a full events scan + LEAD
    # window + shuffle) feed ma/tot/hcond and their broadcast copies
    # — unpersisted the whole chain ran 6x; the cached plane is the
    # tiny types^2 matrix
    trans = track_persist(
        seq.groupBy("a", "b").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
    )
    ma = trans.groupBy("a").agg(F.sum("n").cast("long").alias("na"))
    tot = trans.agg(F.sum("n").cast("long").alias("nt"))
    hcond = (
        trans.join(F.broadcast(ma), "a")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                -(F.col("n").cast("double") / F.col("nt"))
                * F.log(F.col("n").cast("double") / F.col("na"))
            ).alias("t")
        )
        .agg(
            F.sum(F.col("t").cast("decimal(38,12)"))
            .cast("double")
            .alias("h")
        )
    )
    pm = F.col("na").cast("double") / F.col("nt")
    hmarg = (
        ma.crossJoin(F.broadcast(tot))
        .select((-pm * F.log(pm)).alias("t"))
        .agg(
            F.sum(F.col("t").cast("decimal(38,12)"))
            .cast("double")
            .alias("h")
        )
    )
    return (
        tot.crossJoin(F.broadcast(hcond.withColumnRenamed("h", "hc")))
        .crossJoin(F.broadcast(hmarg.withColumnRenamed("h", "hm")))
        .select(
            F.col("nt").alias("n_transitions"),
            sround(F.col("hc")).alias("entropy_rate_nats"),
            sround(F.col("hm")).alias("marginal_entropy"),
            sround(F.col("hm") - F.col("hc")).alias("predictability_gain"),
        )
    )


# ---------------------------------------------------------------------------
# Data-freshness / calendar-completeness audit.


@query(
    "orders_calendar_completeness",
    oracle=f"""
    WITH d AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               CAST(o_orderdate AS DATE) AS day
        FROM orders
    ),
    per_m AS (
        SELECT m,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT day) AS BIGINT) AS days_present,
               CAST(datediff('day', m,
                    CAST(m + INTERVAL 1 MONTH AS DATE)) AS BIGINT)
                 AS days_in_month
        FROM d GROUP BY m
    )
    SELECT strftime(m, '%Y-%m') AS month, n_rows, days_present,
           days_in_month,
           {sql_sround(
               'CAST(days_present AS DOUBLE) / days_in_month', 6)}
             AS completeness
    FROM per_m
    """,
)
def orders_calendar_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-completeness audit: per month, how many distinct days
    actually have order rows versus the month's day count — the
    ingestion-gap detector run before trusting any time-series
    aggregate (a 0.8 completeness month silently deflates monthly
    revenue by ~20%).

    Scale: one counting pass collapses the table to (month, day)
    distincts; all calendar math is exact integer date arithmetic on
    the months plane. Months emit as ISO strings for cross-engine
    hashing.
    """
    d = load_table(spark, sf_dir, "orders").select(
        F.trunc("o_orderdate", "MM").alias("m"),
        F.col("o_orderdate").cast("date").alias("day"),
    )
    per_m = d.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("day").cast("long").alias("days_present"),
    ).withColumn(
        "days_in_month",
        F.datediff(F.add_months(F.col("m"), 1), F.col("m")).cast("long"),
    )
    return per_m.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "n_rows",
        "days_present",
        "days_in_month",
        sround(
            F.col("days_present").cast("double") / F.col("days_in_month")
        ).alias("completeness"),
    )
