"""Headline analytical queries in classic TPC-H shapes over the testdata —
these exercise the engine's multi-join + aggregate paths (J5-style chained
dimension joins with broadcasts, map-side-combinable rollups, pinned top-k)
and double as the bench workload at sf0.1.

Monetary aggregates use order-independent cents-exact summation
(wsspark.queries.exactsum) so the driver's value hash is stable across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.queries import Query
from wsspark.queries import exactsum as ex

PRICING_CUTOFF = "2001-09-01 00:00:00"
UNSHIPPED_DATE = "1998-06-30 00:00:00"
VOLUME_REGION = "ASIA"
VOLUME_DATE_LO = "1996-01-01 00:00:00"
VOLUME_DATE_HI = "1998-01-01 00:00:00"

_DISC = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped pricing rollup over the big fact. One
    map-side-combinable shuffle; filter pushed into the parquet scan."""
    li = read_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(PRICING_CUTOFF))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact
            ex.money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            ex.money_sum(disc).alias("sum_disc_price"),
            ex.money_sum(charge).alias("sum_charge"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (ex.money_sum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (ex.scaled_sum(F.col("l_discount"), 1_000_000) / F.count("*")).alias(
                "avg_disc"
            ),
            n.alias("count_order"),
        )
    )


PRICING_SQL = f"""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       {ex.money_sum_sql("l_extendedprice")} AS sum_base_price,
       {ex.money_sum_sql(_DISC)} AS sum_disc_price,
       {ex.money_sum_sql(_CHARGE)} AS sum_charge,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       {ex.money_sum_sql("l_extendedprice")} / COUNT(*) AS avg_price,
       {ex.scaled_sum_sql("l_discount", 1_000_000)} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter (broadcast), fact join,
    top-k with pinned tie-break."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(UNSHIPPED_DATE)
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(UNSHIPPED_DATE)
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(ex.money_sum(disc).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


UNSHIPPED_SQL = f"""
SELECT l.l_orderkey, o.o_orderdate::DATE AS o_orderdate,
       {ex.money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{UNSHIPPED_DATE}'
  AND l.l_shipdate > TIMESTAMP '{UNSHIPPED_DATE}'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
"""


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five-table join chain; all dimensions broadcast, the
    only shuffle is the final per-nation rollup."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == VOLUME_REGION)
    nation = read_table(spark, sf_dir, "nation")
    supplier = read_table(spark, sf_dir, "supplier")
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(VOLUME_DATE_LO))
        & (F.col("o_orderdate") < F.lit(VOLUME_DATE_HI))
    )
    li = read_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            ex.money_sum(disc).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


VOLUME_SQL = f"""
SELECT n.n_name,
       {ex.money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{VOLUME_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{VOLUME_DATE_LO}'
  AND o.o_orderdate < TIMESTAMP '{VOLUME_DATE_HI}'
GROUP BY n.n_name
"""


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left_semi join (SURVEY.md §2.6 notes the
    reference only has implicit semi/anti via set difference,
    gen/generate_data.py:179). The semi join ships only the distinct order
    keys of matching lineitems — no fact columns cross the shuffle."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(VOLUME_DATE_LO))
        & (F.col("o_orderdate") < F.lit(VOLUME_DATE_HI))
    )
    returned_li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(returned_li, orders.o_orderkey == returned_li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORDER_PRIORITY_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{VOLUME_DATE_LO}'
  AND o.o_orderdate < TIMESTAMP '{VOLUME_DATE_HI}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast dim join —
    promo revenue as a share of total, cents-exact on both sides of the
    division."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(VOLUME_DATE_LO))
        & (F.col("l_shipdate") < F.lit(VOLUME_DATE_HI))
    )
    part = read_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * ex.money_sum(promo) / ex.money_sum(disc), 4
            ).alias("promo_revenue_pct"),
            ex.money_sum(promo).alias("promo_revenue"),
            ex.money_sum(disc).alias("total_revenue"),
        )
    )


PROMO_SQL = f"""
SELECT ROUND(100.0 * {ex.money_sum_sql(
    "CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END"
)} / {ex.money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")}, 4)
           AS promo_revenue_pct,
       {ex.money_sum_sql(
    "CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END"
)} AS promo_revenue,
       {ex.money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS total_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{VOLUME_DATE_LO}'
  AND l.l_shipdate < TIMESTAMP '{VOLUME_DATE_HI}'
"""


def q_parts_never_sold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join coverage (§2.6: the reference's hot/cold set difference,
    gen/generate_data.py:179,248 -> left_anti in Spark): parts with no
    lineitem at all, counted per brand."""
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_unsold_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("unsold_retail_value"),
        )
    )


PARTS_NEVER_SOLD_SQL = """
SELECT p_brand, COUNT(*) AS n_unsold_parts,
       ROUND(SUM(p_retailprice), 2) AS unsold_retail_value
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
GROUP BY p_brand
"""


RETURNED_TOP_K = 20


def q_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer. The fact filter
    (l_returnflag = 'R') pushes into the parquet scan; the orderkey join is
    the one fact-sized shuffle; customer and nation are broadcast so the
    dimension lookups never shuffle. Top-k pinned by (revenue desc,
    c_custkey asc) with cents-exact revenue so the cut is engine-stable."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(ex.money_sum(disc).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(RETURNED_TOP_K)
    )


RETURNED_SQL = f"""
SELECT c_custkey, c_name, n_name,
       {ex.money_sum_sql(_DISC)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT {RETURNED_TOP_K}
"""


SMALL_QTY_FRACTION = 0.5  # of the per-part average quantity


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in orders below half the part's
    average quantity. The classic formulation is a correlated scalar
    subquery per part; the Spark-first rewrite is ONE window average over
    the partkey partition — a single shuffle of the fact, no second scan,
    no join. The per-part mean is exact across engines (integral quantities
    sum exactly in doubles), so the threshold comparison can't flip."""
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    avg_qty = F.avg("l_quantity").over(w)
    return (
        li.withColumn("_avg_qty", avg_qty)
        .filter(F.col("l_quantity") < SMALL_QTY_FRACTION * F.col("_avg_qty"))
        .agg(
            F.round(ex.money_sum(F.col("l_extendedprice")) / 7, 2).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lineitems"),
        )
    )


SMALL_QTY_SQL = f"""
WITH t AS (
    SELECT l_extendedprice, l_quantity,
           AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
    FROM lineitem
)
SELECT ROUND({ex.money_sum_sql("l_extendedprice")} / 7, 2) AS avg_yearly,
       COUNT(*) AS n_lineitems
FROM t
WHERE l_quantity < {SMALL_QTY_FRACTION} * avg_qty
"""


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders.
    The left outer join keeps never-ordered customers (count = 0 bucket);
    both aggregations are map-side combinable, and the second one runs over
    at most |distinct order counts| rows, so the only fact-sized shuffle is
    the custkey join. At 100 TB the orders side shuffles on o_custkey —
    bounded per-customer fan-in, no skew beyond the busiest account."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUSTDIST_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


IDLE_SINCE = "1998-01-01 00:00:00"  # lapsed = no orders on/after this date


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balances who
    have LAPSED (no orders in the recent window — the testdata gives every
    customer at least one order ever, so the classic never-ordered predicate
    is vacuous), rolled up by market segment. The classic form has a scalar
    subquery (global avg) + NOT EXISTS; Spark-first that is a 1-row
    conditional aggregate cross-joined in (broadcast, no recompute per row)
    + a left_anti join against the recent orders. The date filter pushes
    into the orders scan, so the anti-join build side shrinks before it
    moves. Balances are cents-quantized before comparison so the avg
    threshold is engine-exact."""
    cust = read_table(spark, sf_dir, "customer")
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(IDLE_SINCE).cast("timestamp"))
        .select("o_custkey")
    )
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("long")
    cust = cust.withColumn("_bal_cents", bal_cents)
    # global avg of positive balances, in exact cents; floor keeps it a long
    thresh = cust.agg(
        F.floor(
            F.sum(F.when(F.col("_bal_cents") > 0, F.col("_bal_cents")))
            / F.count(F.when(F.col("_bal_cents") > 0, True))
        ).alias("_avg_cents")
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("_bal_cents") > F.col("_avg_cents"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("_bal_cents") / 100.0, 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


IDLE_RICH_SQL = f"""
WITH c AS (
    SELECT c_custkey, c_mktsegment,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
), t AS (
    SELECT FLOOR(SUM(CASE WHEN bal_cents > 0 THEN bal_cents END)
                 / COUNT(CASE WHEN bal_cents > 0 THEN TRUE END)) AS avg_cents
    FROM c
)
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       ROUND(SUM(bal_cents) / 100.0, 2) AS totacctbal
FROM c CROSS JOIN t
WHERE bal_cents > avg_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{IDLE_SINCE}')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between (supplier nation, customer
    nation) pairs per ship year. Six-table chain where every dimension
    (customer, supplier, nation twice) broadcasts — the only shuffle is
    the final (nation, nation, year) rollup, which map-side combines. The
    same nation table is broadcast under two aliases; Catalyst plans it as
    two independent builds, so no ambiguity and no self-join shuffle."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("_sn_key"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("_cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            ex.money_sum(disc).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


NATION_TRADE_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
       {ex.money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
GROUP BY 1, 2, 3
"""


def q_nation_year_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: gross margin by supplier nation and order year
    (testdata has no partsupp, so the cost leg is the part's retail price x
    quantity — same join/agg skeleton, deterministic data). Revenue and
    cost are summed as independent exact cent longs and differenced, so
    the margin is order-independent to the cent across engines."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    part = read_table(spark, sf_dir, "part")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cost = F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            (ex.money_sum(disc) - ex.money_sum(cost)).alias("gross_margin"),
            ex.money_sum(disc).alias("revenue"),
        )
    )


NATION_MARGIN_SQL = f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS order_year,
       {ex.money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")}
           - {ex.money_sum_sql("p.p_retailprice * l.l_quantity")} AS gross_margin,
       {ex.money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


LARGE_ORDER_MIN_QTY = 150


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with their customer. Pinned (total_qty DESC, o_orderkey)
    top-100.

    Scale shape (the HAVING set is ~20% of orders — measured on the
    testdata — so NEITHER it nor any base table is broadcastable at
    100 TB): the fact collapses through one l_orderkey groupBy, shuffle-
    joins orders on the same key (the aggregate's partitioning is reused;
    only orders exchanges), the top-100 is taken DISTRIBUTED
    (TakeOrderedAndProject — each partition keeps 100, driver merges),
    and only that 100-row frame is broadcast into customer. Taking the
    limit before the customer join is exact because o_custkey → customer
    is FK-intact (verified 0 orphans on the testdata; TPC-H guarantees
    referential integrity)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))  # integral doubles: exact
        .filter(F.col("total_qty") > LARGE_ORDER_MIN_QTY)
    )
    top = (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
                "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )
    return (
        customer.join(F.broadcast(top), top.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
    )


LARGE_ORDERS_SQL = f"""
WITH big AS (
    SELECT l_orderkey, SUM(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(l_quantity) > {LARGE_ORDER_MIN_QTY}
)
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       big.total_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY big.total_qty DESC, o.o_orderkey
LIMIT 100
"""


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum shipped revenue. The
    classic form computes the max in a scalar subquery over a view; the
    Spark-first shape is ONE aggregate pass + a max window over the empty
    partition (broadcast-size frame, no second fact scan), then an exact
    equality filter — safe because revenue is a cents-exact double."""
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(ex.money_sum(disc).alias("total_revenue"))
    top = (
        rev.withColumn(
            "_max", F.max("total_revenue").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue") == F.col("_max"))
        .drop("_max")
    )
    return (
        top.join(F.broadcast(supplier), top.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_SQL = f"""
WITH rev AS (
    SELECT l_suppkey,
           {ex.money_sum_sql("l_extendedprice * (1 - l_discount)")}
               AS total_revenue
    FROM lineitem GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s.s_suppkey
"""


def q_bracketed_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate over part
    attributes x quantity brackets. One broadcast part join; the
    disjunction stays a single native predicate (Catalyst factors the
    common conjuncts), no union-of-three-scans."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    q, sz = F.col("l_quantity"), F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11) & sz.between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20) & sz.between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & q.between(20, 30) & sz.between(1, 15))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            ex.money_sum(disc).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("p_brand")
    )


BRACKETED_SQL = f"""
SELECT p.p_brand,
       {ex.money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
       AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
       AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
       AND p.p_size BETWEEN 1 AND 15)
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


MKT_SHARE_REGION = "ASIA"
MKT_SHARE_NATION = "NATION_4"


def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's shipped revenue
    per order year. Share = conditional cents sum / total cents sum in a
    single aggregate pass (no second scan, no join-back); both sums are
    exact longs so the 6dp share is engine-stable."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == MKT_SHARE_REGION
    )
    disc_cents = ex.cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    sn = nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("_sn_name")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_regionkey").alias("_cr_key")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cn), customer.c_nationkey == F.col("_cn_key"))
        .join(F.broadcast(region), F.col("_cr_key") == region.r_regionkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(sn), supplier.s_nationkey == F.col("_sn_key"))
    )
    in_nation = F.when(
        F.col("_sn_name") == MKT_SHARE_NATION, disc_cents
    ).otherwise(F.lit(0))
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            (F.sum(in_nation).cast("double") / 100).alias("nation_revenue"),
            (F.sum(disc_cents).cast("double") / 100).alias("region_revenue"),
            F.round(F.sum(in_nation) / F.sum(disc_cents), 6).alias("mkt_share"),
        )
        .orderBy("order_year")
    )


MKT_SHARE_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CASE WHEN n1.n_name = '{MKT_SHARE_NATION}'
                THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                          AS BIGINT) ELSE 0 END) AS DOUBLE) / 100
           AS nation_revenue,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                AS BIGINT)) AS DOUBLE) / 100 AS region_revenue,
       ROUND(CAST(SUM(CASE WHEN n1.n_name = '{MKT_SHARE_NATION}'
                      THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                      * 100, 0) AS BIGINT) ELSE 0 END) AS DOUBLE)
             / SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                        AS BIGINT)), 6) AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
JOIN region r ON n2.n_regionkey = r.r_regionkey AND r.r_name = '{MKT_SHARE_REGION}'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
GROUP BY 1
ORDER BY 1
"""


QUANTILE_PS = (0.25, 0.5, 0.9, 0.99)


def q_brand_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand exact price quantiles (linear interpolation, the
    percentile_cont definition both engines share — verified 4dp-identical
    to DuckDB quantile_cont on this data).

    Scale note: EXACT percentile buffers each group's values (Spark's
    Percentile aggregate holds a per-group counts-map), which is fine at
    dimension-bounded group counts like 25 brands but is the wrong tool
    for billion-row groups; the 100 TB path is approx_percentile — a
    mergeable, map-side-combinable GK sketch whose rank error is bounded
    by 1/accuracy. tests/test_oracle_parity.py pins the sketch's error
    against this exact query so the scale path's accuracy contract is
    itself tested."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey"), "p_brand"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return (
        j.groupBy("p_brand")
        .agg(
            *[
                F.round(F.percentile("l_extendedprice", F.lit(p)), 4).alias(
                    f"p{int(p * 100)}"
                )
                for p in QUANTILE_PS
            ],
            F.count("*").cast("long").alias("n_items"),
        )
        .orderBy("p_brand")
    )


BRAND_QUANTILES_SQL = """
SELECT p_brand,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
ORDER BY 1
"""


FUZZY_MAX_DIST = 4


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match join (entity-resolution / fuzzy dedup): candidate
    part-name pairs within Levenshtein distance ``FUZZY_MAX_DIST``, blocked
    on the trailing word so the quadratic comparison runs only inside small
    same-noun blocks — the standard blocking strategy that makes edit-
    distance joins tractable at scale (all-pairs is O(n^2); blocked pairs
    are O(sum b_i^2) with b_i bounded by the name vocabulary).

    Scale shape for 100 TB: the fact-sized part table first collapses
    through a groupBy to its DISTINCT name vocabulary (the only full
    shuffle, map-side combinable, output is vocabulary-sized not
    fact-sized); the self-join then shuffles that tiny frame on the block
    key; per-name part counts ride along from the same aggregate so no
    join back to the fact is needed. The reference has no fuzzy matching;
    this extends its dedup family (cf. normalized_dedup_groups) the way a
    catalog-cleanup pipeline needs."""
    from wsspark.llmops.dedup import blocked_fuzzy_pairs

    part = read_table(spark, sf_dir, "part")
    names = (
        part.groupBy("p_name")
        .agg(F.count("*").alias("n_parts"))
        .withColumn("block", F.regexp_extract(F.col("p_name"), r"([^ ]+)$", 1))
    )
    return (
        blocked_fuzzy_pairs(names, FUZZY_MAX_DIST, name_col="p_name")
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
        .orderBy("name_a", "name_b")
    )


FUZZY_SQL = f"""
WITH names AS (
    SELECT p_name, COUNT(*) AS n_parts,
           regexp_extract(p_name, '([^ ]+)$', 1) AS block
    FROM part GROUP BY 1
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
ORDER BY name_a, name_b
"""


APPROX_RSD = 0.05
APPROX_TOL = 3 * APPROX_RSD


def q_approx_distinct_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch accuracy certification, in the ann_recall_at_k style:
    for each high-cardinality key column, compute the exact distinct count
    AND ``approx_count_distinct`` (rsd=``APPROX_RSD``) in one aggregate
    pass PER TABLE (all of a table's columns certify off a single scan —
    lineitem's three go through one Expand-based multi-distinct aggregate,
    plan-asserted), and emit whether the sketch landed within 3*rsd. The
    driver hash-checks (column_name, exact, within_tol) against an oracle
    asserting within_tol=TRUE — if Spark's sketch ever drifts outside the
    published bound on this data, the row goes red.

    Determinism: HLL++ hashes values with a fixed seed and merges registers
    by max — commutative and order/partitioning-insensitive — so the approx
    estimate is stable across shuffle layouts (pinned by the partition-
    invariance suite pattern). Scale story: at 100 TB the exact
    countDistinct side (a full shuffle of the key space) is what you CANNOT
    afford per-query; the sketch is one map-side pass with a
    constant-size merge. This query is the certification you run once at a
    verifiable scale so the sketch can be trusted alone at full scale."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    ev = read_table(spark, sf_dir, "events")

    def check(df: DataFrame, cols: list[str]) -> DataFrame:
        # ALL of a table's columns certify in ONE aggregate pass (one scan
        # per table, 3 total — not one per column), then the single result
        # row unpivots to per-column rows via an explode of structs.
        aggs = []
        for c in cols:
            aggs.append(F.countDistinct(c).alias(f"_exact_{c}"))
            aggs.append(
                F.approx_count_distinct(c, APPROX_RSD).alias(f"_approx_{c}")
            )
        per_col = [
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"_exact_{c}").cast("long").alias("exact_distinct"),
                (
                    F.abs(F.col(f"_approx_{c}") - F.col(f"_exact_{c}"))
                    <= F.lit(APPROX_TOL) * F.col(f"_exact_{c}")
                ).alias("within_tol"),
            )
            for c in cols
        ]
        return (
            df.agg(*aggs)
            .select(F.explode(F.array(*per_col)).alias("_s"))
            .select("_s.*")
        )

    frames = [
        check(li, ["l_orderkey", "l_partkey", "l_suppkey"]),
        check(orders, ["o_custkey"]),
        check(ev, ["user_id"]),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("column_name")


APPROX_DISTINCT_SQL = """
SELECT column_name, exact_distinct, TRUE AS within_tol FROM (
    SELECT 'l_orderkey' AS column_name,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
    FROM lineitem
    UNION ALL
    SELECT 'l_partkey', CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_suppkey', CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'user_id', CAST(COUNT(DISTINCT user_id) AS BIGINT)
    FROM events
)
ORDER BY column_name
"""


QUERIES = [
    Query("fuzzy_name_pairs", q_fuzzy_name_pairs, FUZZY_SQL,
          "blocked Levenshtein fuzzy-match join over the name vocabulary"),
    Query("approx_distinct_accuracy", q_approx_distinct_accuracy,
          APPROX_DISTINCT_SQL,
          "HLL++ approx-distinct certified within 3*rsd of exact"),
    # pricing_summary retired to the folded tier in r16 (slot swap —
    # see llm.py FOLDED_QUERIES); implementation + SQL stay here.
    Query("brand_price_quantiles", q_brand_price_quantiles,
          BRAND_QUANTILES_SQL,
          "exact per-brand price quantiles (percentile_cont semantics)"),
    # top_unshipped_orders retired to the folded tier in r16 (slot swap).
    # local_supplier_volume retired to the folded tier in r16 (slot swap).
    # order_priority_counts retired to the folded tier in r15 (slot swap —
    # see llm.py FOLDED_QUERIES); implementation + SQL stay here.
    Query("promo_revenue_share", q_promo_revenue_share, PROMO_SQL,
          "TPC-H Q14-shape conditional agg over broadcast join"),
    Query("parts_never_sold", q_parts_never_sold, PARTS_NEVER_SOLD_SQL,
          "left_anti set-difference rollup"),
    # returned_top_customers retired to the folded tier in r15 (slot swap).
    # small_quantity_revenue retired to the folded tier in r15 (slot swap).
    Query("customer_order_distribution", q_customer_order_distribution,
          CUSTDIST_SQL,
          "TPC-H Q13-shape outer-join order-count distribution"),
    Query("idle_rich_customers", q_idle_rich_customers, IDLE_RICH_SQL,
          "TPC-H Q22-shape broadcast scalar threshold + anti-join rollup"),
    # nation_trade_volume retired to the folded tier in r13 (slot swap —
    # see llm.py FOLDED_QUERIES); implementation + SQL stay here.
    Query("nation_year_margin", q_nation_year_margin, NATION_MARGIN_SQL,
          "TPC-H Q9-shape margin rollup, cents-exact sum difference"),
    # large_orders retired to the folded tier in r15 (slot swap).
    Query("top_supplier_revenue", q_top_supplier_revenue, TOP_SUPPLIER_SQL,
          "TPC-H Q15-shape argmax via window over one aggregate pass"),
    Query("bracketed_part_revenue", q_bracketed_part_revenue, BRACKETED_SQL,
          "TPC-H Q19-shape OR-of-ANDs bracket predicate revenue"),
    # nation_market_share retired to the folded tier in r15 (slot swap).
]


LATE_DAYS = 90
WAIT_TOPK = 20


def q_late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting) adapted to this
    schema: testdata lineitem has no commit/receipt dates, so "late" is
    l_shipdate > o_orderdate + 90 days. A supplier is blamed for an order
    iff the order used >1 distinct supplier, the supplier shipped a late
    line, and NO other supplier shipped late — the classic
    EXISTS/NOT-EXISTS pair (ref: the reference engine has no such query;
    this extends the §2.6 semi/anti family to its hardest shape).

    Rewrite: instead of two correlated self-joins on the fact (the naive
    Q21 plan — three lineitem scans), ONE li ⨝ orders pass derives a
    per-(order, supplier) late flag, and the per-order supplier /
    late-supplier counts come from a WINDOW over the same frame — no
    second aggregate branch, no self-join, so the fact subtree appears
    exactly once in the plan. Partitioning chains: hash(orderkey) from
    the join satisfies the (orderkey, suppkey) grouping clustering AND
    the orderkey window, so the whole per-order pipeline rides one
    exchange; supplier is a broadcast and the top-k is a single
    TakeOrderedAndProject pass."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supplier = read_table(spark, sf_dir, "supplier")
    flags = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        ).alias("_late"),
    )
    per_so = flags.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("_late").alias("_supp_late")
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        per_so.withColumn("_n_supp", F.count("*").over(w))
        .withColumn("_n_late", F.sum(F.col("_supp_late").cast("int")).over(w))
        .filter(
            F.col("_supp_late")
            & (F.col("_n_supp") > 1)
            & (F.col("_n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("numwait"))
    )
    return (
        blamed.join(
            F.broadcast(
                supplier.select(
                    F.col("s_suppkey").alias("l_suppkey"), "s_name"
                )
            ),
            "l_suppkey",
        )
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(WAIT_TOPK)
    )


LATE_SOLE_SQL = f"""
WITH flags AS (
    SELECT l.l_orderkey, l.l_suppkey,
           l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY AS late
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_so AS (
    SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
    FROM flags GROUP BY 1, 2
),
per_o AS (
    SELECT l_orderkey, COUNT(*) AS n_supp,
           SUM(CASE WHEN supp_late THEN 1 ELSE 0 END) AS n_late
    FROM per_so GROUP BY 1
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_so ps
JOIN per_o po ON ps.l_orderkey = po.l_orderkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE ps.supp_late AND po.n_supp > 1 AND po.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT {WAIT_TOPK}
"""

QUERIES.append(
    Query("late_sole_supplier", q_late_sole_supplier, LATE_SOLE_SQL,
          "TPC-H Q21-shape sole-late-supplier blame: EXISTS/NOT-EXISTS "
          "pair rewritten as stacked same-key aggregations")
)


# ---------------------------------------------------------------------------
# r11 folded additions: the three classic decorrelation shapes the set
# lacked (TPC-H Q2/Q11/Q20). The testdata has no partsupp table, so each
# shape is expressed over lineitem's (part, supplier) relationships —
# the SHAPE (correlated min, HAVING-vs-global-scalar, nested semi-joins)
# is what's being covered, not the exact TPC-H text.
# ---------------------------------------------------------------------------


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — correlated MIN decorrelated as one window: for
    every small part (p_size <= 10), the supplier that achieved the
    minimum unit price on it. The correlated scalar subquery
    ("= (SELECT MIN(...) WHERE same part)") becomes a row_number window
    per part with a TOTAL deterministic tie-break (unit price, suppkey,
    orderkey, linenumber) — one pass, no re-scan per part, broadcast
    dims. Unit price is an IEEE double division both engines compute
    bit-identically from the same parquet doubles, so the rank order
    (and therefore the hash) agrees by construction."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("_unit")
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("_unit"), F.asc("l_suppkey"), F.asc("l_orderkey"),
        F.asc("l_linenumber"),
    )
    best = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(
            "p_partkey",
            "p_brand",
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            unit,
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
    )
    return (
        best.join(F.broadcast(supp), best["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("nation"),
            F.round("_unit", 6).alias("min_unit_price"),
        )
        .orderBy("p_partkey")
    )


MIN_COST_SQL = """
WITH ranked AS (
    SELECT p.p_partkey, p.p_brand, l.l_suppkey,
           l.l_extendedprice / l.l_quantity AS unit,
           ROW_NUMBER() OVER (
               PARTITION BY p.p_partkey
               ORDER BY l.l_extendedprice / l.l_quantity,
                        l.l_suppkey, l.l_orderkey, l.l_linenumber
           ) AS rk
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
)
SELECT r.p_partkey, r.p_brand, s.s_name, n.n_name AS nation,
       ROUND(r.unit, 6) AS min_unit_price
FROM ranked r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE r.rk = 1
ORDER BY r.p_partkey
"""

IMPORTANT_SHARE = 0.001


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — HAVING against a GLOBAL scalar: per-part revenue
    (integer-cents exact) kept only where its share of TOTAL revenue
    exceeds a fraction. The global total rides a whole-frame window over
    the already-aggregated per-part rows (no second fact scan, no
    driver round-trip), and the share division happens once on exact
    longs — the exactsum discipline."""
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(ex.cents(F.col("l_extendedprice"))).alias("_cents")
    )
    w = Window.partitionBy()
    return (
        per_part.withColumn("_total", F.sum("_cents").over(w))
        .filter(
            F.col("_cents").cast("double")
            > F.lit(IMPORTANT_SHARE) * F.col("_total").cast("double")
        )
        .select(
            "l_partkey",
            (F.col("_cents").cast("double") / 100).alias("revenue"),
            F.round(
                F.col("_cents").cast("double") / F.col("_total").cast("double"),
                9,
            ).alias("share"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_partkey"))
    )


IMPORTANT_PARTS_SQL = f"""
WITH per_part AS (
    SELECT l_partkey,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS c
    FROM lineitem GROUP BY 1
), tot AS (SELECT SUM(c) AS t FROM per_part)
SELECT l_partkey,
       CAST(c AS DOUBLE) / 100 AS revenue,
       ROUND(CAST(c AS DOUBLE) / CAST(t AS DOUBLE), 9) AS share
FROM per_part, tot
WHERE CAST(c AS DOUBLE) > {IMPORTANT_SHARE} * CAST(t AS DOUBLE)
ORDER BY revenue DESC, l_partkey
"""


def q_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — nested semi-joins: suppliers who shipped MORE
    THAN HALF of some 'small'-named part's total 1996+ quantity. Inner
    aggregate per (part, supplier), middle aggregate per part, the
    comparison joins them (broadcast part side), and the outer DISTINCT
    semi-joins back to the supplier dimension — every level an
    aggregation or semi-join, never a correlated re-scan. Quantities are
    integral doubles, so the 2x comparison is exact."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    small_li = li.join(
        F.broadcast(part.select("p_partkey")),
        li["l_partkey"] == F.col("p_partkey"),
    )
    per_supp = small_li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_part = small_li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("l_quantity").alias("part_qty")
    )
    qualified = (
        per_supp.join(per_part, per_supp["l_partkey"] == per_part["_pk"])
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(
            qualified, supp["s_suppkey"] == qualified["l_suppkey"], "left_semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


BULK_SUPPLIERS_SQL = """
WITH small_li AS (
    SELECT l.l_partkey, l.l_suppkey, l.l_quantity
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE 'small%'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
), per_supp AS (
    SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
    FROM small_li GROUP BY 1, 2
), per_part AS (
    SELECT l_partkey, SUM(l_quantity) AS part_qty FROM small_li GROUP BY 1
)
SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name AS nation
FROM per_supp ps
JOIN per_part pp ON ps.l_partkey = pp.l_partkey
JOIN supplier s ON ps.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE ps.supp_qty * 2 > pp.part_qty
ORDER BY s.s_suppkey
"""
