"""Third relational batch: grouping sets, regression aggregates,
winnowing fingerprints, approx variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from declarativeml_spark.queries.registry import dsum, query, sql_dsum, sql_sround, sround
from declarativeml_spark.sources.catalog import load_table


@query(
    "grouping_sets_revenue",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
           COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice', 'revenue')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((o_orderpriority), (c_mktsegment),
                            (o_orderpriority, c_mktsegment))
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY §2.5 'free from Spark SQL').

    Expressed via the SQL API — Catalyst expands to a single Expand +
    hash-agg (one scan covers all three groupings).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        f"""
        SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
               COUNT(*) AS n,
               {sql_dsum('o_totalprice', 'revenue')}
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((o_orderpriority), (c_mktsegment),
                                (o_orderpriority, c_mktsegment))
        """
    )


@query(
    "events_type_hour_cube",
    oracle=f"""
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(hour(ts) AS INT), -1) AS hour_of_day,
           COUNT(*) AS n,
           {sql_dsum('value', 'total_value')}
    FROM events
    GROUP BY CUBE (event_type, hour(ts))
    """,
)
def events_type_hour_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, hour-of-day) — the remaining grouping
    variant (SURVEY §2.5: ROLLUP/GROUPING SETS/CUBE 'free from Spark
    SQL'). All four groupings come out of one Expand + hash-agg pass;
    NULL grouping slots are disambiguated from data NULLs by COALESCE
    sentinels on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.hour("ts").alias("hod"), "value")
        .cube("event_type", "hod")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("hod").cast("int"), F.lit(-1)).alias("hour_of_day"),
            "n",
            "total_value",
        )
    )


@query(
    "nation_price_trend",
    oracle=f"""
    WITH j AS (
        SELECT n_name,
               CAST(epoch(o_orderdate) / 86400 AS BIGINT) AS day_x,
               o_totalprice AS y
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    ),
    s AS (
        SELECT n_name, COUNT(*) AS n,
               CAST(SUM(CAST(day_x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(day_x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(day_x * day_x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
        FROM j GROUP BY n_name
    )
    SELECT n_name, n AS n_orders,
           {sql_sround('(n * sxy - sx * sy) / (n * sxx - sx * sx)')} AS slope_per_day
    FROM s
    """,
)
def nation_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS slope as a pure hash-agg (distributed regression
    without a UDAF): closed-form slope from Σx, Σy, Σxy, Σx² —
    aggregated through exact decimals so the result is
    order-independent (double covar_pop would not hash-match).

    Scale: single-pass partial aggregates; no sort, no per-group
    collection. The applyInPandas alternative is tested against this
    result in tests/test_udaf.py.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    day = (F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("day_x")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", day, F.col("o_totalprice").alias("y"))
    )

    def dec(col):
        return F.sum(col.cast("decimal(38,6)")).cast("double")

    s = joined.groupBy("n_name").agg(
        F.count("*").alias("n"),
        dec(F.col("day_x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("day_x") * F.col("y")).alias("sxy"),
        dec(F.col("day_x") * F.col("day_x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "n_name",
        F.col("n").alias("n_orders"),
        sround(slope).alias("slope_per_day"),
    )


@query(
    "text_winnow_fingerprints",
    oracle=r"""
    WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id,
                  CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
                       ELSE list_transform(range(1, len(toks) - 2),
                            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3]))
                  END AS grams
           FROM d),
    hashed AS (SELECT doc_id, list_transform(grams, g -> md5(g)) AS hs FROM sh)
    SELECT doc_id,
           -- DuckDB folds empty lists to NULL through sort/distinct;
           -- Spark's array_join gives '' — normalize to ''
           COALESCE(array_to_string(
               list_sort(list_distinct(list_filter(hs, h -> h < '2'))), ','),
               '') AS winnowed
    FROM hashed
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprints: hash rolling word
    4-grams, keep the deterministic low-hash sample (hex < '2' ≈ 1/8
    of grams). Shared fingerprints across docs ⇒ copied passages.

    Scale: per-row expression (no shuffle); the downstream
    copy-detection join explodes only the sampled fingerprints —
    ~1/8th of the gram volume — on a hash key.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = r"split(trim(text), '\\s+')"
    grams = (
        f"CASE WHEN size({toks}) < 4 THEN array(concat_ws(' ', {toks})) "
        f"ELSE transform(sequence(1, size({toks}) - 3), "
        f"i -> concat_ws(' ', element_at({toks}, i), element_at({toks}, i + 1),"
        f" element_at({toks}, i + 2), element_at({toks}, i + 3))) END"
    )
    winnowed = (
        f"array_join(array_sort(array_distinct(filter(transform({grams}, g -> md5(g)),"
        f" h -> h < '2'))), ',')"
    )
    return docs.select("doc_id", F.expr(winnowed).alias("winnowed"))


@query(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_within_tol,
           TRUE AS pct_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch surface: approx_count_distinct (HLL++) and
    approx_percentile (Greenwald-Khanna) — THE 100 TB forms of
    distinct counting and quantiles.

    Raw sketch estimates are engine-specific, so the query emits the
    exact values plus in-engine tolerance assertions: HLL++ within 15%
    of the exact distinct count (default rsd is 5%, so 3σ of margin)
    and the approximate median within 15% of the exact median. The
    oracle asserts TRUE — a sketch regression flips the hash. Sketch
    merge is commutative (HLL register max / GK summary merge), so the
    booleans are partitioning-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("approx_median"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.15 * F.col("exact_parts")
        ).alias("hll_within_tol"),
        (
            F.abs(F.col("approx_median") - F.col("exact_median"))
            <= 0.15 * F.col("exact_median")
        ).alias("pct_within_tol"),
    )
