"""Second relational batch: set ops, percentiles, scalar functions,
CTEs, semi joins, as-of and range joins.

Everything here is surface the reference delegates to its SQL engine
(SURVEY.md §2.7 set ops, §2.8 scalar functions — 'free from Spark
SQL') plus the join extensions (§2.4 as-of/range: ABSENT in the
reference, first-class here because training-data pipelines need
them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from declarativeml_spark.queries.registry import sql_sround, sround, dsum, query, sql_dsum
from declarativeml_spark.sources.catalog import epoch_us, load_table


@query(
    "customer_year_setops",
    oracle="""
    WITH c96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate < TIMESTAMP '1997-01-01'),
         c97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                   AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT 'both' AS cohort, COUNT(*) AS n FROM (SELECT * FROM c96 INTERSECT SELECT * FROM c97) t
    UNION ALL
    SELECT 'only_1996', COUNT(*) FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c97) t
    UNION ALL
    SELECT 'only_1997', COUNT(*) FROM (SELECT * FROM c97 EXCEPT SELECT * FROM c96) t
    """,
)
def customer_year_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over customer-year cohorts.

    Scale: cohorts are distinct keys (small); set ops shuffle keys
    only. The pre-distinct keeps the set-op input minimal.
    """
    orders = load_table(spark, sf_dir, "orders")

    def cohort(y: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    from declarativeml_spark.operators.caching import track_persist

    # persisted: each cohort (scan + filter + distinct shuffle) feeds
    # two set-op legs — unpersisted both ran twice (6 orders scans);
    # the cached planes are distinct-custkey sized
    c96, c97 = track_persist(cohort(1996)), track_persist(cohort(1997))
    rows = [
        ("both", c96.intersect(c97)),
        ("only_1996", c96.exceptAll(c97)),
        ("only_1997", c97.exceptAll(c96)),
    ]
    out = None
    for name, df in rows:
        part = df.agg(F.count("*").alias("n")).select(
            F.lit(name).alias("cohort"), "n"
        )
        out = part if out is None else out.unionAll(part)
    return out


@query(
    "segment_price_percentiles",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_sround('quantile_cont(o_totalprice, 0.5)', 4)} AS median_price,
           {sql_sround('quantile_cont(o_totalprice, 0.9)', 4)} AS p90_price,
           {sql_sround('min(o_totalprice)', 4)} AS min_price,
           {sql_sround('max(o_totalprice)', 4)} AS max_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def segment_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile``
    == DuckDB ``quantile_cont`` definition).

    Scale note: exact percentiles sort within groups; the 100 TB path
    is ``approx_percentile`` (t-digest) — offered by the engine, but
    the oracle-checked query uses the exact form.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            sround(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            sround(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            sround(F.min("o_totalprice"), 4).alias("min_price"),
            sround(F.max("o_totalprice"), 4).alias("max_price"),
        )
    )


@query(
    "part_name_analysis",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(COUNT(CASE WHEN lower(p_name) LIKE '%green%' THEN 1 END) AS BIGINT) AS green_parts,
           CAST(SUM(length(p_name)) AS BIGINT) AS total_name_len,
           MIN(upper(substr(p_type, 1, 5))) AS first_type_prefix,
           {sql_dsum('p_retailprice', 'brand_value')}
    FROM part GROUP BY p_brand
    """,
)
def part_name_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: lower/upper/substr/length/LIKE."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.count(
            F.when(F.lower("p_name").like("%green%"), 1)
        ).cast("long").alias("green_parts"),
        F.sum(F.length("p_name")).cast("long").alias("total_name_len"),
        F.min(F.upper(F.substring("p_type", 1, 5))).alias("first_type_prefix"),
        dsum("p_retailprice", "brand_value"),
    )


@query(
    "orders_by_quarter",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'revenue')}
    FROM orders GROUP BY 1, 2
    """,
)
def orders_by_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction (year/quarter) aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    ).agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))


@query(
    "price_bucket_distribution",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                WHEN o_totalprice < 300000 THEN 'high'
                ELSE 'very_high' END AS bucket,
           COUNT(*) AS n,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY 1
    """,
)
def price_bucket_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (DSL.md:404-405 surface) + distinct count."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .when(F.col("o_totalprice") < 300000, "high")
        .otherwise("very_high")
    )
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


_CTE_SQL = """
WITH customer_orders AS (
    SELECT c.c_custkey, c.c_nationkey,
           count(*) AS order_count,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spent
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_nationkey
),
nation_stats AS (
    SELECT n.n_name,
           count(*) AS n_customers,
           CAST(SUM(CAST(total_spent AS DECIMAL(38,6))) AS DOUBLE) AS nation_revenue
    FROM customer_orders co JOIN nation n ON co.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
)
SELECT n_name, n_customers, nation_revenue
FROM nation_stats
WHERE n_customers > 1
"""


@query("cte_nation_revenue", oracle=_CTE_SQL)
def cte_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE passthrough (DSL.md:392-408 surface): identical SQL text
    runs on Spark SQL and DuckDB — the engine's raw-SQL path."""
    for t in ("customer", "orders", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_CTE_SQL)


@query(
    "urgent_customers_by_nation",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
)
def urgent_customers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS) — left_semi keeps build side keys-only."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "asof_last_view_before_purchase",
    oracle="""
    WITH seq AS (
        SELECT event_id, user_id, ts, event_type,
               MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_us
        FROM events
    )
    SELECT event_id, user_id, last_view_us
    FROM seq WHERE event_type = 'purchase'
    """,
)
def asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as a single window scan: each purchase
    event picks the most recent prior 'view' of the same user.

    Scale: this is the merge-scan as-of join — one shuffle on user_id,
    one ordered pass per partition; no pairwise join blowup. The
    generic two-table as-of uses the same shape after a union.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", epoch_us("ts"))
    ).over(w)
    return (
        ev.withColumn("last_view_us", last_view)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "last_view_us")
    )


@query(
    "events_value_range_join",
    oracle=f"""
    WITH tiers(tier, lo, hi) AS (
        VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 50.0),
               ('medium', 50.0, 200.0), ('large', 200.0, 1e18)
    )
    SELECT t.tier, COUNT(*) AS n, {sql_dsum('e.value', 'total_value')}
    FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
)
def events_value_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a small tier dimension.

    Scale: the tier table broadcasts, so the non-equi condition is
    evaluated in a BroadcastNestedLoopJoin — rows never shuffle. A
    big-big range join would bucketize first (SURVEY §2.4).
    """
    ev = load_table(spark, sf_dir, "events")
    tiers = ev.sparkSession.createDataFrame(
        [
            ("tiny", 0.0, 10.0),
            ("small", 10.0, 50.0),
            ("medium", 50.0, 200.0),
            ("large", 200.0, 1e18),
        ],
        ["tier", "lo", "hi"],
    )
    return (
        ev.join(
            F.broadcast(tiers),
            (ev.value >= tiers.lo) & (ev.value < tiers.hi),
        )
        .groupBy("tier")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )
