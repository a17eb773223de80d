"""Sixth relational batch: event-sequence analytics — conversion
funnels and cohort retention over the events table.

The reference delegates all relational work to its SQL engine
(reference: dsl/parser.py:405-410, 633-673 capture FROM fragments
verbatim), so sequence analytics are [ABSENT]-category surface our
engine supplies natively (SURVEY §2.5/§2.6 "free from Spark SQL").
Both queries follow the registry.py float conventions and the
events-table ts canonicalization in sources/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from declarativeml_spark.operators import textops as T
from declarativeml_spark.queries.registry import query, sround
from declarativeml_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
@query(
    "events_conversion_funnel",
    oracle=f"""
    WITH s AS (SELECT user_id, MIN(ts) AS s_ts FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    v AS (SELECT e.user_id, MIN(e.ts) AS v_ts, MIN(s.s_ts) AS s_ts
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'view' AND e.ts > s.s_ts
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS p_ts, MIN(v.v_ts) AS v_ts
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
          GROUP BY e.user_id)
    SELECT 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users,
           0.0 AS avg_gap_s FROM s
    UNION ALL
    SELECT 'view_after_signup', CAST(COUNT(*) AS BIGINT),
           {T.stable_round(
               'CAST(SUM(CAST((epoch_us(v_ts) - epoch_us(s_ts)) / 1000000.0'
               ' AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)', 4
           )} FROM v
    UNION ALL
    SELECT 'purchase_after_view', CAST(COUNT(*) AS BIGINT),
           {T.stable_round(
               'CAST(SUM(CAST((epoch_us(p_ts) - epoch_us(v_ts)) / 1000000.0'
               ' AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)', 4
           )} FROM p
    """,
)
def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel with strict event ordering: users who signed
    up → first view strictly after the signup → first purchase
    strictly after that view, with the average stage-to-stage gap.

    The sequence-analytics shape (MATCH_RECOGNIZE-lite) every
    product-analytics workload needs; ordering is enforced by
    timestamps, not mere event co-occurrence.

    Scale: three per-user min-timestamp aggregations, each shuffling
    only (user_id, ts) pairs; the stage frames are user-cardinality
    (tiny vs. the event log; no hard hint — AQE broadcasts them at
    test scale and shuffles at user counts past the broadcast cap)
    joining into the next stage's filter — the event log itself is
    scanned, never self-joined.
    Gaps are exact integer microseconds before one decimal average.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # NOT persisted (r12 revert of the r11 persists on s and v): the
    # repeated stage-frame subtrees are identical and their exchanges
    # ReuseExchange-dedupe at execution — the sf1 A/B measured the
    # persists ~1.3x slower (on 2.67 s / off 1.99 s median), sf0.1 a
    # wash
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"), F.min("s_ts").alias("s_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v.select("user_id", "v_ts"), "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"), F.min("v_ts").alias("v_ts"))
    )

    def _stage(df: DataFrame, name: str, a: str, b: str) -> DataFrame:
        # ts is TIMESTAMP_NTZ after catalog canonicalization; the
        # session is pinned UTC, so the cast to TIMESTAMP is identity
        gap = (
            (
                F.unix_micros(F.col(a).cast("timestamp"))
                - F.unix_micros(F.col(b).cast("timestamp"))
            )
            / F.lit(1000000.0)
        ).cast("decimal(38,6)")
        return df.agg(
            F.lit(name).alias("stage"),
            F.count("*").cast("bigint").alias("n_users"),
            sround(F.sum(gap).cast("double") / F.count("*"), 4).alias("avg_gap_s"),
        )

    base = s.agg(
        F.lit("signup").alias("stage"),
        F.count("*").cast("bigint").alias("n_users"),
        F.lit(0.0).alias("avg_gap_s"),
    )
    return base.unionAll(_stage(v, "view_after_signup", "v_ts", "s_ts")).unionAll(
        _stage(p, "purchase_after_view", "p_ts", "v_ts")
    )


# ---------------------------------------------------------------------------
@query(
    "events_weekly_retention",
    oracle="""
    WITH f AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS first_day
               FROM events GROUP BY user_id)
    SELECT CAST(FLOOR(datediff('day', DATE '2024-01-01', f.first_day) / 7.0)
                AS BIGINT) AS cohort_week,
           CAST(FLOOR(datediff('day', f.first_day, CAST(e.ts AS DATE)) / 7.0)
                AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week,
    counted distinct in each subsequent week offset — the triangle
    chart behind every retention dashboard.

    Scale: one per-user min aggregation builds the cohort dimension
    (user-cardinality — strategy left to AQE; a hard broadcast hint
    would abort past the cap at real user counts), then one pass over the event
    log computes (cohort_week, week_offset) per event and a distinct
    count per cell. The distinct shuffles (cell, user_id) pairs; the
    cell space is weeks², which is tiny forever. All integer date
    math — engine-exact.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    f = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("first_day"))
    joined = ev.join(f, "user_id")
    cohort = F.floor(
        F.datediff(F.col("first_day"), F.lit("2024-01-01").cast("date")) / 7.0
    ).cast("bigint")
    offset = F.floor(
        F.datediff(F.col("ts").cast("date"), F.col("first_day")) / 7.0
    ).cast("bigint")
    return (
        joined.select(
            cohort.alias("cohort_week"),
            offset.alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


# ---------------------------------------------------------------------------
_SESSION_GAP = "2 hours"


@query(
    "events_user_sessions",
    oracle="""
    WITH x AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 2 HOUR
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM x
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S')
             AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum
    FROM s GROUP BY user_id, sess_id
    """,
)
def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity sessions via Spark's native ``session_window``
    (events merge while gaps stay under 2 h; the session closes 2 h
    after its last event) — the batch twin of
    ``streaming/pipeline.py::session_window_stats``, and the built-in
    complement of the custom ``events_sessionize`` path sequencer.

    The oracle derives identical sessions with the gaps-and-islands
    idiom (lag + cumulative new-session flags), pinning Spark's
    [start, end) merge semantics: a gap of EXACTLY the threshold
    starts a new session on both engines.

    Scale: session_window aggregation shuffles (user_id, ts, value)
    once; merging is per-key in the agg — no global sort, state
    bounded by open sessions per key. The gaps-and-islands form the
    oracle uses would need a per-user ordered window at scale — same
    shuffle, but the window materializes every event per user in one
    task, which is why the session_window form is the 100 TB choice.
    """
    from declarativeml_spark.streaming.pipeline import session_window_stats

    ev = load_table(spark, sf_dir, "events")
    return session_window_stats(
        ev,
        ts_col="ts",
        key_col="user_id",
        value_col="value",
        gap=_SESSION_GAP,
        streaming=False,
    )
