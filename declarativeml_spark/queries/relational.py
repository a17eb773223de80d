"""Core relational operator coverage on the TPC-H-ish star schema.

The reference admits this entire surface as validated SQL passthrough
in the training-source clause (reference: dsl/parser.py:657-669 —
joins, WHERE, GROUP BY, HAVING, ORDER BY, LIMIT; subqueries
parser.py:646-655) and delegates execution to PostgreSQL. Here each
shape is a first-class Catalyst plan: scans prune columns + push
filters to parquet, small dimensions broadcast, aggregates run
partial/final map-side, windows partition by key.

Scale notes per query are in the docstrings — the plans are written
for a 1000-executor / 100 TB cluster, tested at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from declarativeml_spark.queries.registry import (
    davg,
    dsum,
    query,
    sql_davg,
    sql_dsum,
    sql_sround,
    sround,
)
from declarativeml_spark.sources.catalog import epoch_us, load_table


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): scan → filter → hash-agg.

    Scale: the shipdate filter pushes to the parquet scan; the agg has
    6 grouping keys' worth of cardinality so partial aggregation
    collapses ~everything map-side — shuffle traffic is O(groups), not
    O(rows), at any scale factor.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): 3-way join → agg → top-k.

    Scale: customer is ~1.5% of lineitem rows and pre-filtered on
    segment → broadcast to both fact-side joins; lineitem⋈orders is
    the only shuffle. Top-k via ORDER+LIMIT lets Spark run
    TakeOrderedAndProject (no full sort).
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape): 6-way star join.

    Scale: region/nation/supplier/filtered-customer are all dimension
    scale → broadcast; the only big shuffle is lineitem⋈orders on
    orderkey. Catalyst reorders the broadcast joins under AQE.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (cust.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-change forecast (TPC-H Q6 shape): pure scan-filter-agg.

    Scale: all four predicates push down to parquet row-group pruning;
    single global agg is one partial per partition + one final row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item report (TPC-H Q10 shape): join + agg + top-20."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "monthly_revenue",
    oracle=f"""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           {sql_dsum('o_totalprice', 'revenue')},
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function rollup: month bucketing + agg (DSL.md:81-86 shape)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(
                F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd"
            ).alias("order_month")
        ).agg(dsum("o_totalprice", "revenue"), F.count("*").alias("n_orders"))
    )


@query(
    "top3_customers_per_nation",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal, rnk
    FROM (
        SELECT n_name, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey
               ) AS rnk
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) t
    WHERE rnk <= 3
    """,
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (SURVEY §2.6 window surface).

    Scale: one shuffle on the partition key; rank+filter avoids a
    global sort. Tie-broken by custkey for determinism.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS) — SURVEY §2.4 semi/anti surface.

    Scale: left-anti over a hash relation; at 100 TB the orders side
    would be pre-aggregated to distinct keys (done here) so the build
    side is keys-only.
    """
    cust = load_table(spark, sf_dir, "customer")
    order_keys = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    return (
        cust.join(order_keys, cust.c_custkey == order_keys.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "order_priority_rollup",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
           COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'total_revenue')}
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (SURVEY §2.5 'free from Spark SQL' row)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_revenue"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            "n_orders",
            "total_revenue",
        )
    )


@query(
    "mktsegment_order_pivot",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END
                AS DECIMAL(38,6))) AS DOUBLE) AS open_revenue,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END
                AS DECIMAL(38,6))) AS DOUBLE) AS finished_revenue,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END
                AS DECIMAL(38,6))) AS DOUBLE) AS pending_revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def mktsegment_order_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot by conditional aggregation (CASE WHEN surface, DSL.md:404-405).

    Expressed as conditional aggs rather than .pivot() so the plan is a
    single hash-agg pass — .pivot() would be equivalent post-Catalyst
    but this form keeps the oracle SQL trivially parallel.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    def rev(status: str, alias: str):
        return dsum(
            F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")).otherwise(
                F.lit(0.0)
            ),
            alias,
        )

    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            rev("O", "open_revenue"),
            rev("F", "finished_revenue"),
            rev("P", "pending_revenue"),
        )
    )


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>30min cumulative flag (SURVEY §2.9).

    Scale: one shuffle on user_id; the session assignment is a linear
    pass per user partition — the standard distributed sessionize.
    """
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", epoch_us("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.col("ts_us") - F.lag("ts_us").over(w)
    return (
        ev.withColumn(
            "new_session",
            F.when(gap_us > 1_800_000_000, 1)
            .when(F.lag("ts_us").over(w).isNull(), 1)
            .otherwise(0),
        )
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "events_hourly_stats",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value', 'total_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour aggregation over the event table (batch view of
    the streaming windowed-agg operator, SURVEY §2.9)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        ).agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )


@query(
    "events_json_extract",
    oracle=f"""
    SELECT CAST(props->>'$.k' AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           {sql_dsum('value', 'total_value')}
    FROM events
    GROUP BY 1
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload access (DSL.md:133-134 ``payload->>'model_name'``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_bucket",
            (F.get_json_object("props", "$.k").cast("int") % 10),
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )


@query(
    "part_type_shares",
    oracle=f"""
    SELECT p_type, p_brand, n_parts, brand_parts,
           {sql_sround('CAST(n_parts AS DOUBLE) / brand_parts')} AS share
    FROM (
        SELECT p_type, p_brand,
               COUNT(*) AS n_parts,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY p_brand) AS BIGINT)
                   AS brand_parts
        FROM part
        GROUP BY p_type, p_brand
    ) t
    """,
)
def part_type_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + analytic window over aggregate (share-of-total).

    DuckDB's SUM over BIGINT is HUGEINT — cast back to BIGINT in the
    oracle so both engines emit int64; the ratio goes through
    ``sround`` on both sides (repo-wide double convention).
    """
    part = load_table(spark, sf_dir, "part")
    agg = part.groupBy("p_type", "p_brand").agg(F.count("*").alias("n_parts"))
    w = W.partitionBy("p_brand")
    return (
        agg.withColumn("brand_parts", F.sum("n_parts").over(w))
        .withColumn(
            "share",
            sround(F.col("n_parts").cast("double") / F.col("brand_parts")),
        )
    )
