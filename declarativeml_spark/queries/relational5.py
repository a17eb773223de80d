"""Fifth relational batch: the remaining TPC-H-classic shapes (q8,
q9, q11, q13, q16, q17, q20, q21) adapted to the driver's star schema
(SURVEY.md §2.4-§2.7).

The driver's schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns, so the partsupp-backed
queries keep their *plan shape* but swap the relation: lineitem
serves as the part↔supplier bridge (q11/q16/q20) and ship-vs-order
date lateness replaces receipt-vs-commit lateness (q21). The
reference delegates all of these to PostgreSQL (reference:
dsl/parser.py:657-669 validated passthrough); each is a native
Catalyst plan here. Oracle SQL follows the decimal-sum / date-string
/ tie-break conventions in ``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from declarativeml_spark.queries.registry import dsum, query, sql_dsum, sql_sround, sround
from declarativeml_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
@query(
    "q8_nation_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           {sql_sround(
               "CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_5'"
               " THEN l_extendedprice * (1 - l_discount)"
               " ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)"
               " / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
               " AS DECIMAL(38,6))) AS DOUBLE)"
           )} AS mkt_share
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region    ON cn.n_regionkey = r_regionkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY o_year
    """,
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: one supplier nation's share of revenue among
    orders placed by customers of one region, per order year.

    Scale: every dimension (customer, supplier, nation×2, region)
    broadcasts, so the only shuffle is lineitem⋈orders on orderkey.
    The numerator rides as a CASE inside the same hash-agg as the
    denominator — one pass, exact decimal accumulation on both sides
    of the ratio.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(broadcast(cn), customer.c_nationkey == F.col("cn_key"))
        .join(broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(broadcast(sn), supplier.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev"),
            nat_rev.alias("nat_rev"),
        )
        .groupBy("o_year")
        .agg(
            sround(
                F.sum(F.col("nat_rev").cast("decimal(38,6)")).cast("double")
                / F.sum(F.col("rev").cast("decimal(38,6)")).cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q6_discount_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6: forecast-revenue-change — single filtered scan,
    single-row aggregate (completes the full set of 22 classic TPC-H
    query shapes).

    Scale: all three predicates push down to the parquet scan
    (min/max row-group skipping on l_shipdate); the agg is a
    map-side partial + 1-row final. Nothing shuffles but partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .select((F.col("l_extendedprice") * F.col("l_discount")).alias("rev"))
        .agg(dsum("rev", "revenue"), F.count("*").alias("n_lines"))
    )


# ---------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS supp_nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)'
                     ' - 0.5 * p_retailprice * l_quantity', 'profit')}
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY supp_nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: profit by supplier nation and order year for
    parts matching a name pattern. The schema has no partsupp, so
    supply cost is modeled as ``0.5 * p_retailprice`` per unit
    (same expression tree shape: rev minus cost×quantity).

    Scale: the p_name LIKE filter cuts part before it broadcasts, and
    that join prunes lineitem *before* the orderkey shuffle — filter
    the fact side early via the selective dimension.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("profit_amt"),
        )
        .groupBy("supp_nation", "o_year")
        .agg(dsum("profit_amt", "profit"))
    )


# ---------------------------------------------------------------------------
@query(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
        SELECT l_partkey, {sql_dsum('l_extendedprice * (1 - l_discount)', 'value')}
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, value
    FROM pv
    WHERE value > (SELECT 0.001 * CAST(SUM(CAST(value AS DECIMAL(38,6)))
                                       AS DOUBLE) FROM pv)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: per-group value compared against a fraction of
    the global total (uncorrelated scalar subquery). partsupp value is
    replaced by realized lineitem revenue per part.

    Scale: one hash-agg of lineitem by partkey; the global total is a
    1-row re-agg of that (tiny) result broadcast back — the fact table
    is scanned exactly once and never sorted.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    pv = (
        li.select("l_partkey", rev)
        .groupBy("l_partkey")
        .agg(dsum("rev", "value"))
    )
    total = pv.agg((0.001 * F.sum(F.col("value").cast("decimal(38,6)")).cast("double")).alias("threshold"))
    return (
        pv.join(broadcast(total), pv.value > total.threshold)
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


# ---------------------------------------------------------------------------
@query(
    "q13_order_count_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: distribution of per-customer order counts,
    with a join-condition filter (not a WHERE — customers with zero
    qualifying orders must survive with count 0).

    Scale: two cascaded aggs; the first shuffles orders by custkey
    (same key as the join, one exchange reused), the second is over
    ≤|customer| rows. The filter lives in the join condition so the
    left join preserves order-less customers.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c_orders = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .select(F.col("c_count").cast("long").alias("c_count"), "custdist")
    )


# ---------------------------------------------------------------------------
@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: distinct suppliers able to supply parts per
    (brand, type, size), with NOT-equal and IN-list dimension filters.
    lineitem stands in for partsupp as the part↔supplier bridge.

    Scale: the filters cut part *before* broadcast; count(DISTINCT)
    expands to a two-phase agg (partial distinct on the group+supp
    key, then final count) — no row ever carries a set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
        SELECT l_partkey AS pq_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pq   ON l_partkey = pq_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape: revenue from small-quantity lines, where
    "small" is relative to each part's average order quantity
    (correlated aggregate decorrelated into agg + self-join).

    Scale: the per-part average is a hash-agg of lineitem on partkey;
    joining it back is partkey⋈partkey so AQE can reuse the exchange.
    The Brand filter broadcasts through part and prunes the outer
    scan before the shuffle. avg is exact-decimal-sum / count on both
    engines, so the 0.2× threshold compares bit-identically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    pq = (
        li.groupBy(F.col("l_partkey").alias("pq_partkey"))
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
                / F.count("l_quantity")
            ).alias("avg_qty")
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pq, li.l_partkey == pq.pq_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q20_heavy_shippers",
    oracle=f"""
    WITH shipped AS (
        SELECT l_suppkey, {sql_dsum('l_quantity', 'total_qty')}
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%green%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 100
    )
    SELECT s_suppkey, s_name, n_name, total_qty
    FROM shipped
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    """,
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: suppliers whose shipped volume of a part
    family in one year clears a threshold (partsupp availability →
    realized shipped quantity), decorated with nation.

    Scale: name-filtered part broadcasts into the date-pruned
    lineitem scan; the HAVING agg shrinks to ≤|supplier| rows before
    the (broadcast) dimension joins — the fact table never joins a
    fact table.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%green%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    shipped = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 100)
    )
    return (
        shipped.join(supplier, shipped.l_suppkey == supplier.s_suppkey)
        .join(broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "total_qty")
    )


# ---------------------------------------------------------------------------
@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH lines AS (
        SELECT l_orderkey, l_suppkey,
               CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END AS is_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late
        FROM lines GROUP BY l_orderkey
    ),
    blamed AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lines l JOIN per_order p ON l.l_orderkey = p.l_orderkey
        WHERE p.n_supp > 1 AND p.n_late = 1 AND l.is_late = 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM blamed JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape: suppliers who were the *sole* late shipper on
    a multi-supplier finished order (EXISTS + NOT EXISTS double
    correlation, decorrelated). Lateness is ship-vs-order date (the
    schema has no commit/receipt dates).

    Scale: the two correlated EXISTS become window aggregates over
    one orderkey shuffle — count of distinct suppliers and of
    distinct *late* suppliers per order computed side by side, then
    filtered. No per-row re-scan, no second join of lineitem against
    itself.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    lines = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ).alias("is_late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = lines.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late"),
    )
    blamed = (
        flagged.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1) & F.col("is_late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blamed.join(supplier, blamed.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
