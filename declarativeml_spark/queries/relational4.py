"""Fourth relational batch: TPC-H-classic shapes adapted to the
driver's star schema — correlated subqueries, EXISTS semi-joins,
multi-dimension joins, conditional aggregation, disjunctive
broadcast-join predicates (SURVEY.md §2.3-§2.7).

The reference delegates all of these to PostgreSQL (parser.py:657-669
validated passthrough); here each is a native Catalyst plan. Oracle
SQL follows the decimal-sum / date-string conventions in
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from declarativeml_spark.queries.registry import dsum, query, sql_dsum, sql_sround, sround
from declarativeml_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
@query(
    "q2_cheapest_part_per_type",
    oracle="""
    SELECT p.p_type, p.p_partkey, p.p_name, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (
        SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
    )
    """,
)
def q2_cheapest_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: correlated scalar subquery (min price per
    group) decorrelated into agg + join.

    Scale: the per-type minimum is a 6-row aggregate — broadcast it
    back instead of re-scanning part per outer row (what a naive
    correlated plan would do). One scan, one broadcast, no shuffle of
    the fact side.
    """
    part = load_table(spark, sf_dir, "part")
    mins = (
        part.groupBy(F.col("p_type").alias("min_type"))
        .agg(F.min("p_retailprice").alias("min_price"))
    )
    return (
        part.join(
            broadcast(mins),
            (F.col("p_type") == F.col("min_type"))
            & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
    )


# ---------------------------------------------------------------------------
@query(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: EXISTS → left-semi join, then count by
    priority.

    Scale: left_semi never materializes matched lineitem rows —
    each order emits at most once from the join, so the agg input is
    bounded by |orders| regardless of lineitem fan-out. The compound
    (equi + theta) condition keeps the equi part as the shuffle key.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        lineitem,
        (orders.o_orderkey == lineitem.l_orderkey)
        & (lineitem.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


# ---------------------------------------------------------------------------
@query(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY cust_nation, supp_nation, l_year
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: revenue flow between customer and supplier
    nations per ship year.

    Scale: the ship-date filter is pushed to the parquet scan; the
    two nation joins (25 rows each) and supplier broadcast; the only
    real shuffle is lineitem⋈orders on orderkey, then the final
    3-column hash-agg with map-side partials.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(broadcast(cn), customer.c_nationkey == F.col("cn_key"))
        .join(broadcast(sn), supplier.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .select(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").alias("l_year"),
            rev,
        )
        .groupBy("cust_nation", "supp_nation", "l_year")
        .agg(dsum("rev", "revenue"))
    )


# ---------------------------------------------------------------------------
@query(
    "q12_priority_shipping_stats",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_linestatus
    """,
)
def q12_priority_shipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape: conditional (CASE) aggregation of late-shipped
    lines by status.

    Scale: CASE folds two logical aggregations into one pass — no
    second scan, no union. The theta predicate rides on the equi-join
    shuffle; integer counts hash-match exactly.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           {sql_sround(
               "100.0"
               " * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'"
               " THEN l_extendedprice * (1 - l_discount)"
               " ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)"
               " / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
               " AS DECIMAL(38,6))) AS DOUBLE)"
           )} AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ship_month
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: percentage of revenue from PROMO parts per
    ship month.

    Scale: part (the dim) broadcasts; both the promo and total sums
    come out of one hash-agg pass with exact decimal accumulation, so
    the ratio is order-independent.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .select(
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
            rev.alias("rev"),
            promo.alias("promo_rev"),
        )
        .groupBy("ship_month")
        .agg(
            sround(
                100.0
                * F.sum(F.col("promo_rev").cast("decimal(38,6)")).cast("double")
                / F.sum(F.col("rev").cast("decimal(38,6)")).cast("double")
            ).alias("promo_share")
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q18_large_volume_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, {sql_dsum('l_quantity', 'total_qty')}
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 300
    )
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: orders whose total quantity exceeds 300,
    top-100 by price.

    Scale: the HAVING agg runs on lineitem alone (partial sums
    map-side), and only the tiny survivor set joins orders/customer —
    never the full fact-fact join. Tie broken by o_orderkey so the
    LIMIT is deterministic (oracle-parity convention).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "q19_brand_quantity_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2'  AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: disjunctive multi-column predicates across
    both join sides, single-row revenue total.

    Scale: part broadcasts, so the OR-of-ANDs evaluates inside the
    broadcast-hash-join stage with no shuffle at all before the final
    single-group agg. The p_brand/p_size conjuncts that only touch
    part could additionally pre-filter the broadcast side; Catalyst
    derives that filter itself (constraint propagation).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & sz.between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#13") & sz.between(20, 50) & q.between(20, 50))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .filter(cond)
        .select(rev)
        .agg(dsum("rev", "revenue"), F.count("*").alias("n_lines"))
    )


# ---------------------------------------------------------------------------
@query(
    "revenue_moving_avg_7d",
    oracle="""
    WITH daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day,
               SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS day_rev
        FROM orders GROUP BY order_day
    )
    SELECT order_day,
           CAST(day_rev AS DOUBLE) AS day_revenue,
           CAST(SUM(day_rev) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS ma7
    FROM daily
    WINDOW w AS (ORDER BY order_day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def revenue_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame spec (SURVEY §2.6 'free from Spark'): 7-day moving
    average of daily order revenue via ROWS BETWEEN 6 PRECEDING.

    The frame sum runs over exact decimals on both engines so the
    average is order-independent. Scale: the window is over the
    *daily* aggregate (≤ a few thousand rows after a full map-side
    partial agg of orders), so the single-partition sort the
    unpartitioned window implies is on a tiny input; at 100 TB the
    window would be partitioned by month/region first.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("day_rev"))
    w = Window.orderBy("order_day").rowsBetween(-6, 0)
    return daily.select(
        "order_day",
        F.col("day_rev").cast("double").alias("day_revenue"),
        (F.sum("day_rev").over(w).cast("double") / F.count("*").over(w)).alias("ma7"),
    )


# ---------------------------------------------------------------------------
@query(
    "embedding_array_stats",
    oracle=f"""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(len(embedding)) AS BIGINT) AS min_dim,
           CAST(max(len(embedding)) AS BIGINT) AS max_dim,
           {sql_sround("min(list_min(list_transform(embedding,"
                       " x -> CAST(x AS DOUBLE))))")} AS min_elem,
           {sql_sround("max(list_max(list_transform(embedding,"
                       " x -> CAST(x AS DOUBLE))))")} AS max_elem,
           CAST(SUM(CAST(len(list_filter(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), x -> x > 0)) AS BIGINT)) AS BIGINT)
             AS n_positive
    FROM embeddings GROUP BY label
    """,
)
def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (SURVEY §2.8 'free from Spark'):
    per-label element stats over array<float> columns via
    transform/filter/array_min/array_max — all JVM-side, no UDF.

    min/max are exact (no float accumulation); the positive-element
    count is integral. Scale: one scan of the embeddings table, pure
    hash-agg; the array lambdas run inside codegen.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = "transform(embedding, x -> CAST(x AS DOUBLE))"
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.min(F.size("embedding")).cast("long").alias("min_dim"),
        F.max(F.size("embedding")).cast("long").alias("max_dim"),
        sround(F.min(F.expr(f"array_min({dbl})"))).alias("min_elem"),
        sround(F.max(F.expr(f"array_max({dbl})"))).alias("max_elem"),
        F.sum(F.expr(f"size(filter({dbl}, x -> x > 0))").cast("long"))
        .cast("long")
        .alias("n_positive"),
    )


# ---------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH srev AS (
        SELECT l_suppkey, {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_rev')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN srev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM srev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape: scalar subquery over a derived revenue view
    (top supplier in a quarter).

    Scale: revenue per supplier is one hash-agg of the date-pruned
    lineitem scan; the global max is a 1-row aggregate broadcast back
    (never a sort of the whole view). Revenue equality is safe
    because both sides aggregate through exact decimals.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    srev = li.select("l_suppkey", rev).groupBy("l_suppkey").agg(
        dsum("rev", "total_rev")
    )
    mx = srev.agg(F.max("total_rev").alias("max_rev"))
    return (
        srev.join(broadcast(mx), srev.total_rev == mx.max_rev)
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


# ---------------------------------------------------------------------------
@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*) AS ab
        FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name,
           count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n_name
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: global-average threshold (uncorrelated scalar
    subquery) + NOT EXISTS anti-join (no *recent* orders), grouped by
    nation.

    Scale: the average is a 1-row broadcast; the anti-join's date
    predicate is pushed to the orders scan before the shuffle;
    nation broadcasts. No correlated re-scan per row anywhere.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
                / F.count("*")
            ).alias("ab")
        )
    )
    return (
        customer.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
